"""Training-path parity vs the reference PyTorch implementation.

Forward parity (test_torch_parity.py) proves the inference graph; this
file proves the TRAINING path — for each of the 7 DL methods:

1. gradient parity: transplant reference weights, run one batch through
   the reference ``train_iter``'s loss (reference
   models/base/base_model.py:206-226 default L1; models/SFIIN.py:359-408
   frequency losses; models/MutInf.py:470-505 clipped+ramped MI) and
   through this framework's ``Method.losses``, and assert
   d loss / d params agree leaf-by-leaf (grads mapped through the same
   rule-based converter the weights use — every transform is a
   transpose/reshape, so it is gradient-valid).
2. trajectory parity: run N Adam steps in both frameworks on identical
   batches (per-module optimisers with the shipped lrs) and assert the
   parameter trajectories stay together.

Since no released weights or real data ship in this environment, this
is the strongest available proof that *retraining* here reproduces the
reference's training behaviour (the 0.05 dB north-star).

Measured gradient agreement (f32, CPU): global max-rel err 1e-6..1e-4
for the plain-L1 methods; the L1 subgradient at |out - target| ~ 0 is
the only instability, removed here by targets offset to [2, 3] so
sign(out - target) is the same in both frameworks (the chain rule
through the network is what's under test, not the tie-break).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from reference_shim import load_reference, reference_config  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_models():
    return load_reference()


# ---------------------------------------------------------------- helpers

def _to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _sd_numpy(module):
    # copy=True: .numpy() returns a VIEW of the live torch storage;
    # identity-transform converter leaves would otherwise alias it into
    # the jax tree (CPU jnp.asarray can be zero-copy), so torch
    # optimiser steps would silently mutate the jax params
    return {k: np.array(v.detach().cpu().numpy(), copy=True)
            for k, v in module.state_dict().items()}


def _grad_sd(module):
    """state_dict-keyed gradients; zeros for buffers / unused params.
    Duplicate-registered tensors (MDCUN's ResnetBlock aliases,
    reference MDCUN.py:297-302) carry the same grad under every alias —
    the converter drops the aliases, so this is converter-safe."""
    out = {}
    for k, t in module.state_dict(keep_vars=True).items():
        g = t.grad if t.requires_grad else None
        out[k] = ((g if g is not None else torch.zeros_like(t))
                  .detach().cpu().numpy())
    return out


def _l1(a, b):
    return torch.mean(torch.abs(a - b))


def _flat_with_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flat_with_paths(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def _assert_tree_close(got, want, rel_tol, label):
    """max |got - want| over all leaves <= rel_tol * max |want|."""
    got_l = dict(_flat_with_paths(got))
    want_l = dict(_flat_with_paths(want))
    assert got_l.keys() == want_l.keys(), (
        f"{label}: leaf mismatch {set(got_l) ^ set(want_l)}")
    scale = max(float(np.max(np.abs(w))) for w in want_l.values())
    worst, worst_path = 0.0, ""
    for path, w in want_l.items():
        err = float(np.max(np.abs(got_l[path] - w))) if w.size else 0.0
        if err > worst:
            worst, worst_path = err, path
    assert worst <= rel_tol * scale, (
        f"{label}: max |err| {worst:.3e} at {worst_path} "
        f"> {rel_tol:.0e} * scale {scale:.3e}")


def _batch(rng, c, b=1, ms=32, pan=128):
    """Targets offset to [2, 3]: keeps sign(out - target) identical in
    both frameworks (see module docstring)."""
    return {
        "input_lr": rng.uniform(0, 1, (b, ms, ms, c)).astype(np.float32),
        "input_pan": rng.uniform(0, 1, (b, pan, pan, 1)).astype(np.float32),
        "target": rng.uniform(2, 3, (b, pan, pan, c)).astype(np.float32),
    }


def _mi_eps(rng_key, b, latent=4):
    """The exact reparameterisation noise MutualInfoReg draws from
    ``rng_key`` (lgteun_tpu/losses.py): split -> normal(ka), normal(kb).
    Fed to the patched torch module so both frameworks see one noise."""
    import jax

    ka, kb = jax.random.split(rng_key)
    return (np.asarray(jax.random.normal(ka, (b, latent)),
                       np.float32),
            np.asarray(jax.random.normal(kb, (b, latent)), np.float32))


def _patch_mi_noise(ref_mi, eps_list):
    """Replace the reference's CUDA-hard-coded ``reparametrize``
    (reference MutInf.py reparametrize: torch.cuda.FloatTensor) with a
    CPU version drawing from a fixed noise sequence."""
    it = iter(eps_list)

    def rep(mu, logvar):
        std = logvar.mul(0.5).exp()
        return torch.from_numpy(next(it)).mul(std).add(mu)

    ref_mi.reparametrize = rep


# ------------------------------------------------------------ method specs

def _make_spec(name, c):
    """-> (ref_modules: {mod: torch module}, method, params, loss_fn)
    where loss_fn(batch_t, iter_id) -> torch scalar replicating the
    reference train_iter's loss for `name`."""
    import jax.numpy as jnp

    from lgteun_tpu.config import Config, LossCfg, OptimCfg
    from lgteun_tpu.convert import AUX_CONVERTERS, convert_state_dict
    from lgteun_tpu.registry import build_model

    l1 = LossCfg(type="l1", w=1.0)

    if name == "UnlgFormer":
        from models.unlg_former import Pansharpening

        torch.manual_seed(7)
        # .eval() + drop_rate=0: LGT's proj Dropout(0.1) (reference
        # LGT.py:198) draws from incomparable RNGs across frameworks,
        # so training parity is proven on the deterministic path; the
        # dropout mask itself is the one train-time difference that
        # cannot be cross-checked. No BN anywhere, so eval() changes
        # nothing else.
        ref = Pansharpening(cfg=reference_config(ms_chans=c), logger=None,
                            stage=2).eval()
        cfg = Config(model_type=name, ms_chans=c,
                     loss_cfg={"rec_loss": l1},
                     optim_cfg={"core_module": OptimCfg(lr=1.5e-3)},
                     model_cfg={"core_module": {"stage": 2,
                                                "drop_rate": 0.0}})

        def loss_fn(bt, iter_id):
            return _l1(ref(bt["ms"], bt["pan"]), bt["target"])

    elif name == "lightnet":
        from models.lightnet import LightNet

        torch.manual_seed(11)
        ref = LightNet(cfg=reference_config(ms_chans=c), logger=None).train()
        cfg = Config(model_type=name, ms_chans=c,
                     loss_cfg={"rec_loss": l1},
                     optim_cfg={"core_module": OptimCfg(lr=2.5e-3)})

        def loss_fn(bt, iter_id):
            return _l1(ref(bt["ms"], bt["pan"]), bt["target"])

    elif name == "PanFormer":
        from models.panformer import CrossSwinTransformer as RefCST

        torch.manual_seed(3)
        hp = dict(n_feats=64, n_heads=8, head_dim=8, win_size=4, n_blocks=3)
        ref = RefCST(cfg=reference_config(ms_chans=c, norm_input=True,
                                          bit_depth=11),
                     logger=None, **hp).train()
        cfg = Config(model_type=name, ms_chans=c, norm_input=True,
                     loss_cfg={"rec_loss": l1},
                     optim_cfg={"core_module": OptimCfg(lr=1e-4)},
                     model_cfg={"core_module": hp})

        def loss_fn(bt, iter_id):
            # reference panformer.py:134 calls G(pan, ms)
            return _l1(ref(bt["pan"], bt["ms"]), bt["target"])

    elif name == "INNT":
        from models.INNT import GPPNN

        torch.manual_seed(17)
        np.random.seed(17)
        ref = GPPNN(cfg=reference_config(ms_chans=c), logger=None).train()
        cfg = Config(model_type=name, ms_chans=c,
                     loss_cfg={"rec_loss": l1},
                     optim_cfg={"core_module": OptimCfg(lr=8e-4)})

        def loss_fn(bt, iter_id):
            return _l1(ref(bt["ms"], bt["pan"]), bt["target"])

    elif name == "MDCUN":
        from models.MDCUN import pan_unfolding

        torch.manual_seed(23)
        ref = pan_unfolding(cfg=reference_config(ms_chans=c),
                            logger=None).train()
        cfg = Config(model_type=name, ms_chans=c,
                     loss_cfg={"rec_loss": l1},
                     optim_cfg={"core_module": OptimCfg(lr=5e-4)})

        def loss_fn(bt, iter_id):
            return _l1(ref(bt["ms"], bt["pan"]), bt["target"])

    elif name == "SFIIN":
        from models.SFIIN import Net

        torch.manual_seed(5)
        np.random.seed(5)
        ref = Net(cfg=reference_config(ms_chans=c), logger=None).train()
        cfg = Config(model_type=name, ms_chans=c,
                     loss_cfg={"rec_loss": l1,
                               "fre_amp_rec_loss": LossCfg(type="l1", w=0.1),
                               "fre_pha_rec_loss": LossCfg(type="l1", w=0.1)},
                     optim_cfg={"core_module": OptimCfg(lr=8e-4)})

        def loss_fn(bt, iter_id):
            # reference SFIIN.py:359-408: L1 + 0.1 * (amp L1 + pha L1)
            # on rfft2(norm='backward') of output vs target
            out = ref(bt["ms"], bt["pan"])
            of = torch.fft.rfft2(out, norm="backward")
            tf_ = torch.fft.rfft2(bt["target"], norm="backward")
            return (_l1(out, bt["target"])
                    + 0.1 * _l1(torch.abs(of), torch.abs(tf_))
                    + 0.1 * _l1(torch.angle(of), torch.angle(tf_)))

    elif name == "MutInf":
        from models.MutInf import GPPNN, Mutual_info_reg

        torch.manual_seed(13)
        np.random.seed(13)
        ref = GPPNN(cfg=reference_config(ms_chans=c), logger=None).train()
        torch.manual_seed(14)
        ref_mi = Mutual_info_reg(cfg=reference_config(ms_chans=c),
                                 logger=None).train()
        cfg = Config(model_type=name, ms_chans=c, max_iter=1000,
                     loss_cfg={"rec_loss": l1,
                               "MI_rec_loss": LossCfg(type="l1", w=0.1)},
                     optim_cfg={"core_module": OptimCfg(lr=8e-4),
                                "mi": OptimCfg(lr=1e-4)})

        def loss_fn(bt, iter_id):
            # reference MutInf.py:470-505: L1 + 0.1 * ramp * |clip(mi)|
            out, panf, mhrf = ref(bt["ms"], bt["pan"])
            # .contiguous(): torch-CPU convs here hand back a layout
            # the reference's hard `view` (MutInf.py:426) rejects;
            # value/grad-neutral
            mi = torch.clip(ref_mi(panf.contiguous(), mhrf.contiguous()),
                            -1, 1)
            ramp = min(iter_id / 1000.0, 1.0)
            return (_l1(out, bt["target"])
                    + 0.1 * ramp * _l1(mi, 2.0 * mi))

        method = build_model(cfg.model_type, cfg)
        params = {"core_module": jnp_tree(convert_state_dict(name,
                                                             _sd_numpy(ref))),
                  "mi": jnp_tree(AUX_CONVERTERS[(name, "mi")](
                      _sd_numpy(ref_mi)))}
        return {"core_module": ref, "mi": ref_mi}, method, params, loss_fn
    else:
        raise KeyError(name)

    method = build_model(cfg.model_type, cfg)
    params = {"core_module": jnp_tree(convert_state_dict(name,
                                                         _sd_numpy(ref)))}
    return {"core_module": ref}, method, params, loss_fn


def jnp_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


METHODS = ["UnlgFormer", "lightnet", "PanFormer", "INNT", "MDCUN",
           "SFIIN", "MutInf"]

# Measured headroom over f32 accumulation noise. SFIIN's looser bound
# comes from the phase-loss term: d angle/d (re, im) is 1/amp-scaled,
# so low-amplitude bins amplify the forward's ~1e-6 spectrum noise.
GRAD_TOL = {"UnlgFormer": 1e-3, "lightnet": 1e-3, "PanFormer": 1e-3,
            "INNT": 1e-3, "MDCUN": 1e-3, "SFIIN": 5e-3, "MutInf": 1e-3}


@pytest.mark.parametrize("name", METHODS)
def test_gradient_parity(ref_models, rng, name):
    """d loss / d params matches torch autograd leaf-by-leaf."""
    import jax

    c = 4
    refs, method, params, torch_loss = _make_spec(name, c)
    b = _batch(rng, c)
    bt = {"ms": _to_nchw(b["input_lr"]), "pan": _to_nchw(b["input_pan"]),
          "target": _to_nchw(b["target"])}

    iter_id = 100
    rng_key = jax.random.PRNGKey(42)
    if name == "MutInf":
        _patch_mi_noise(refs["mi"], list(_mi_eps(rng_key, b=1)))

    loss_t = torch_loss(bt, iter_id)
    for m in refs.values():
        m.zero_grad(set_to_none=True)
    loss_t.backward()

    from lgteun_tpu.convert import AUX_CONVERTERS, convert_state_dict

    want = {"core_module": convert_state_dict(name,
                                              _grad_sd(refs["core_module"]))}
    if "mi" in refs:
        want["mi"] = AUX_CONVERTERS[(name, "mi")](_grad_sd(refs["mi"]))

    batch = {k: jnp_tree(v) for k, v in b.items()}

    def f(p):
        total, _ = method.losses(p, batch, rng=rng_key,
                                 iter_id=float(iter_id))
        return total

    loss_j, got = jax.value_and_grad(f)(params)
    # the losses themselves must agree too (3e-4: f32 forward noise
    # accumulated over the 128x128 mean)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=3e-4)
    _assert_tree_close(got, want, GRAD_TOL[name], f"{name} grads")


# Adam trajectories drift by accumulated g/sqrt(v) noise; 1% of the
# total parameter movement after 5 steps is far below anything that
# could change training behaviour.
#
# eps: at Adam's default 1e-8, the first-step update is lr*sign(g) for
# EVERY element — an element whose true gradient is ~0 (where the two
# frameworks' f32 noise legitimately disagrees on the sign) moves a
# full +-lr per step in opposite directions, a 2*lr*N worst-case
# deviation that says nothing about parity. eps=1e-3 (identical in
# both frameworks) makes near-zero-gradient updates proportionally
# near-zero while leaving moments, bias correction and lr mechanics
# fully exercised.
TRAJ_TOL = {"UnlgFormer": 0.01, "lightnet": 0.01, "PanFormer": 0.01,
            "INNT": 0.01, "MDCUN": 0.01, "SFIIN": 0.02, "MutInf": 0.01}
N_STEPS = 5
ADAM_EPS = 1e-3


@pytest.mark.parametrize("name", METHODS)
def test_trajectory_parity(ref_models, rng, name):
    """N Adam steps on identical batches: parameter trajectories match
    (per-module optimisers with the shipped lrs, reference
    configs/*.py optim_cfg; torch.optim.Adam vs optax.adam)."""
    import jax
    import optax

    from lgteun_tpu.convert import AUX_CONVERTERS, convert_state_dict
    from lgteun_tpu.runner import _frozen_mask

    c = 4
    refs, method, params, torch_loss = _make_spec(name, c)
    init_params = jax.tree.map(np.asarray, params)

    batches = [_batch(rng, c) for _ in range(2)]  # alternate 2 batches
    base_key = jax.random.PRNGKey(77)
    step_keys = [jax.random.fold_in(base_key, s) for s in range(N_STEPS)]

    # --- torch side ------------------------------------------------------
    opts = {m: torch.optim.Adam(mod.parameters(),
                                lr=method.cfg.optim_cfg[m].lr,
                                betas=(0.9, 0.999), eps=ADAM_EPS)
            for m, mod in refs.items()}
    for s in range(N_STEPS):
        b = batches[s % 2]
        bt = {"ms": _to_nchw(b["input_lr"]),
              "pan": _to_nchw(b["input_pan"]),
              "target": _to_nchw(b["target"])}
        if name == "MutInf":
            _patch_mi_noise(refs["mi"], list(_mi_eps(step_keys[s], b=1)))
        loss = torch_loss(bt, s)
        for o in opts.values():
            o.zero_grad(set_to_none=True)
        loss.backward()
        for o in opts.values():
            o.step()

    want = {"core_module": convert_state_dict(
        name, _sd_numpy(refs["core_module"]))}
    if "mi" in refs:
        want["mi"] = AUX_CONVERTERS[(name, "mi")](_sd_numpy(refs["mi"]))

    # --- jax side: same Adam (incl. the frozen-LU mask the Runner's
    # optimiser factory applies) --------------------------------------
    txs = {m: optax.chain(
        optax.adam(method.cfg.optim_cfg[m].lr, b1=0.9, b2=0.999,
                   eps=ADAM_EPS),
        optax.masked(optax.set_to_zero(), _frozen_mask))
           for m in params}
    opt_states = {m: txs[m].init(params[m]) for m in params}

    @jax.jit
    def step(p, o, batch, key, iter_id):
        def f(pp):
            total, _ = method.losses(pp, batch, rng=key, iter_id=iter_id)
            return total

        grads = jax.grad(f)(p)
        new_p, new_o = {}, {}
        for m in p:
            upd, new_o[m] = txs[m].update(grads[m], o[m], p[m])
            new_p[m] = optax.apply_updates(p[m], upd)
        return new_p, new_o

    for s in range(N_STEPS):
        batch = {k: jnp_tree(v) for k, v in batches[s % 2].items()}
        params, opt_states = step(params, opt_states, batch, step_keys[s],
                                  float(s))

    # tolerance is relative to how far the parameters actually moved
    movement = max(
        float(np.max(np.abs(w - i0))) for (pw, w), (pi, i0) in zip(
            _flat_with_paths(want), _flat_with_paths(init_params)))
    got_l = dict(_flat_with_paths(jax.tree.map(np.asarray, params)))
    want_l = dict(_flat_with_paths(want))
    worst, worst_path = 0.0, ""
    devs = []
    for path, w in want_l.items():
        if not w.size:
            continue
        dev = np.abs(got_l[path] - w)
        devs.append(dev.ravel())
        err = float(np.max(dev))
        if err > worst:
            worst, worst_path = err, path
    if worst > TRAJ_TOL[name] * movement:
        # Fallback distribution check: isolated elements may exceed the
        # max-err bound where Adam's 1/(sqrt(v)+eps) amplifies f32
        # gradient noise (MutInf's INN exp-couplings, measured: 0.4% of
        # elements, worst 1.9e-4 on 4e-3 movement). A real training
        # divergence moves the DISTRIBUTION: mean deviation on the
        # movement scale and a large deviating fraction — both asserted
        # tight here.
        dev = np.concatenate(devs)
        mean_ratio = float(np.mean(dev)) / movement
        frac_bad = float(np.mean(dev > TRAJ_TOL[name] * movement))
        assert mean_ratio <= 1e-3 and frac_bad <= 0.005, (
            f"{name} trajectory diverged: max |err| {worst:.3e} at "
            f"{worst_path} (movement {movement:.3e}), mean ratio "
            f"{mean_ratio:.1e}, {frac_bad:.2%} of elements past the "
            f"max-err bound")
