"""Reference (PyTorch) state_dict -> flax param PyTree converters.

One rule-based translator per method: each torch key is mapped to a
flax tree path plus an array transform. Layout conventions:

- torch Conv2d weight [out, in/groups, kh, kw] -> flax NHWC kernel
  [kh, kw, in/groups, out] (transpose (2, 3, 1, 0))
- torch Linear weight [out, in] -> flax Dense kernel [in, out]
- torch LayerNorm weight/bias -> flax scale/bias
- this framework's `PointConv`/`DepConv`/`Conv` wrappers nest the
  underlying flax Conv as `Conv_0` (and `PointConv` one deeper:
  `Conv_0/Conv_0`)

The converters take `{key: np.ndarray}` (no torch import — call
`.numpy()` on the torch side, see scripts/convert_torch_ckpt.py) and
return the exact tree `Method.init_params` produces, so transplanted
weights drop into the Runner / orbax checkpoints unchanged.

Reference checkpoint format: models/base/base_model.py:354-369 pickles
whole nn.Modules under module names ('core_module', ...) plus
'iter_num'.
"""

from __future__ import annotations

import re
from typing import Callable, Dict

import numpy as np

__all__ = ["CONVERTERS", "convert_state_dict"]

Array = np.ndarray
SD = Dict[str, Array]


def _conv(w: Array) -> Array:
    """torch conv [out, in/g, kh, kw] -> flax [kh, kw, in/g, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path: str, value: Array) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


def _point(prefix: str) -> dict[str, tuple[str, Callable]]:
    """PointConv wrapper: weight/bias live under Conv_0/Conv_0."""
    return {"weight": (f"{prefix}/Conv_0/Conv_0/kernel", _conv),
            "bias": (f"{prefix}/Conv_0/Conv_0/bias", lambda x: x)}


def _dep(prefix: str) -> dict[str, tuple[str, Callable]]:
    """DepConv wrapper: weight/bias live under Conv_0/Conv_0."""
    return _point(prefix)


def _raw_conv(prefix: str) -> dict[str, tuple[str, Callable]]:
    """Bare Conv wrapper: weight/bias live under Conv_0."""
    return {"weight": (f"{prefix}/Conv_0/kernel", _conv),
            "bias": (f"{prefix}/Conv_0/bias", lambda x: x)}


# --------------------------------------------------------------- LGTEUN

def _lgteun_lgb(t_prefix: str, f_prefix: str, key: str, val: Array,
                out: dict) -> bool:
    """Translate one key inside a reference LGB (reference
    LGT.py:222-248) to the flax LGB tree (models/common/lgt.py)."""
    m = re.match(rf"{re.escape(t_prefix)}\.blocks\.(\d+)\.([01])\.fn\.(.+)",
                 key)
    if not m:
        return False
    blk, half, rest = int(m.group(1)), m.group(2), m.group(3)
    if half == "0":  # residual(pre_norm(LGMixer))
        if rest == "norm.weight":
            _set(out, f"{f_prefix}/norm_mix_{blk}/scale", val)
        elif rest == "norm.bias":
            _set(out, f"{f_prefix}/norm_mix_{blk}/bias", val)
        elif rest == "fn.local_mixer.pos_emb":
            _set(out, f"{f_prefix}/mixer_{blk}/local/pos_emb", val[0])
        elif rest == "fn.local_mixer.to_qkv.weight":
            _set(out, f"{f_prefix}/mixer_{blk}/local/to_qkv_kernel",
                 _conv(val))
        elif rest == "fn.local_mixer.to_qkv.bias":
            _set(out, f"{f_prefix}/mixer_{blk}/local/to_qkv_bias", val)
        elif rest == "fn.global_mixer.conv_amp.0.weight":
            _set(out, f"{f_prefix}/mixer_{blk}/global/amp_scale", _conv(val))
        elif rest == "fn.global_mixer.conv_amp.0.bias":
            _set(out, f"{f_prefix}/mixer_{blk}/global/amp_bias", val)
        elif rest == "fn.global_mixer.conv_pha.0.weight":
            _set(out, f"{f_prefix}/mixer_{blk}/global/pha_scale", _conv(val))
        elif rest == "fn.global_mixer.conv_pha.0.bias":
            _set(out, f"{f_prefix}/mixer_{blk}/global/pha_bias", val)
        elif rest == "fn.proj.weight":
            _set(out, f"{f_prefix}/mixer_{blk}/proj/Conv_0/Conv_0/kernel",
                 _conv(val))
        elif rest == "fn.proj.bias":
            _set(out, f"{f_prefix}/mixer_{blk}/proj/Conv_0/Conv_0/bias", val)
        else:
            raise KeyError(f"unmapped LGB mixer key: {key}")
    else:  # residual(pre_norm(feed_forward)) -> fused-FFN raw params
        ffn = f"{f_prefix}/ffn_{blk}"
        table = {
            "norm.weight": (f"{ffn}/ln_gamma", lambda x: x),
            "norm.bias": (f"{ffn}/ln_beta", lambda x: x),
            "fn.net.0.weight": (f"{ffn}/w1", _conv),
            "fn.net.0.bias": (f"{ffn}/b1", lambda x: x),
            "fn.net.2.point_conv.weight": (f"{ffn}/w2", _conv),
            "fn.net.2.point_conv.bias": (f"{ffn}/b2", lambda x: x),
            "fn.net.2.depth_conv.weight": (f"{ffn}/dw", _conv),
            "fn.net.2.depth_conv.bias": (f"{ffn}/bdw", lambda x: x),
            "fn.net.4.weight": (f"{ffn}/w3", _conv),
            "fn.net.4.bias": (f"{ffn}/b3", lambda x: x),
        }
        if rest not in table:
            raise KeyError(f"unmapped LGB ffn key: {key}")
        path, tf = table[rest]
        _set(out, path, tf(val))
    return True


def _lgteun_lgt(t_prefix: str, f_prefix: str, key: str, val: Array,
                out: dict) -> bool:
    """Translate one key inside a reference LGT (reference
    LGT.py:251-344) to the flax LGT tree."""
    if not key.startswith(t_prefix + "."):
        return False
    rest = key[len(t_prefix) + 1:]
    simple = {
        "patch_embed.proj.0.weight": ("patch_dw/Conv_0/kernel", _conv),
        "patch_embed.proj.0.bias": ("patch_dw/Conv_0/bias", lambda x: x),
        "patch_embed.proj.1.weight": ("patch_pw/Conv_0/Conv_0/kernel", _conv),
        "patch_embed.proj.1.bias": ("patch_pw/Conv_0/Conv_0/bias",
                                    lambda x: x),
        "patch_embed.norm.weight": ("patch_norm_ln/scale", lambda x: x),
        "patch_embed.norm.bias": ("patch_norm_ln/bias", lambda x: x),
        "tail.1.weight": ("tail/Conv_0/Conv_0/kernel", _conv),
        "tail.1.bias": ("tail/Conv_0/Conv_0/bias", lambda x: x),
    }
    if rest in simple:
        path, tf = simple[rest]
        _set(out, f"{f_prefix}/{path}", tf(val))
        return True
    m = re.match(r"encoder_layers\.(\d+)\.1\.1\.(weight|bias)", rest)
    if m:
        i, wb = m.group(1), m.group(2)
        tf = _conv if wb == "weight" else (lambda x: x)
        _set(out, f"{f_prefix}/enc_down_{i}/Conv_0/Conv_0/"
             f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
        return True
    m = re.match(r"decoder_layers\.(\d+)\.([01])\.(?:1\.)?(weight|bias)",
                 rest)
    if m:
        i, which, wb = m.group(1), m.group(2), m.group(3)
        name = f"dec_up_{i}" if which == "0" else f"dec_fuse_{i}"
        tf = _conv if wb == "weight" else (lambda x: x)
        _set(out, f"{f_prefix}/{name}/Conv_0/Conv_0/"
             f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
        return True
    m = re.match(r"encoder_layers\.(\d+)\.0\.", rest)
    if m:
        return _lgteun_lgb(f"{t_prefix}.encoder_layers.{m.group(1)}.0",
                           f"{f_prefix}/enc_lgb_{m.group(1)}", key, val, out)
    if rest.startswith("bottleneck."):
        return _lgteun_lgb(f"{t_prefix}.bottleneck",
                           f"{f_prefix}/bottleneck", key, val, out)
    m = re.match(r"decoder_layers\.(\d+)\.2\.", rest)
    if m:
        return _lgteun_lgb(f"{t_prefix}.decoder_layers.{m.group(1)}.2",
                           f"{f_prefix}/dec_lgb_{m.group(1)}", key, val, out)
    raise KeyError(f"unmapped LGT key: {key}")


def convert_lgteun(sd: SD) -> dict:
    """Reference `Pansharpening` state_dict (reference
    unlg_former.py:21-67) -> flax LGTEUN params."""
    out: dict = {}
    for key, val in sd.items():
        m = re.match(r"(D|DT)\.([13])\.(weight|bias)", key)
        if m:
            grp, idx, wb = m.groups()
            name = "dw0" if idx == "1" else "dw1"
            tf = _conv if wb == "weight" else (lambda x: x)
            _set(out, f"{grp}/{name}/Conv_0/Conv_0/"
                 f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
            continue
        m = re.match(r"(R|RT)\.(weight|bias)", key)
        if m:
            grp, wb = m.groups()
            tf = _conv if wb == "weight" else (lambda x: x)
            _set(out, f"{grp}/Conv_0/Conv_0/"
                 f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
            continue
        m = re.match(r"eta\.(\d+)", key)
        if m:
            _set(out, f"eta_{m.group(1)}", val)
            continue
        m = re.match(r"prior_module\.(\d+)\.", key)
        if m:
            i = m.group(1)
            if _lgteun_lgt(f"prior_module.{i}", f"prior_{i}", key, val, out):
                continue
        raise KeyError(f"unmapped LGTEUN key: {key}")
    return out


# ----------------------------------------------------- shared inv-net parts

def _invconv(t_prefix: str, f_prefix: str) -> dict[str, tuple[str, Callable]]:
    """InvertibleConv1x1 (LU): torch buffers/params (reference
    SFIIN.py:26-50) -> the single `lu` pytree param
    (common/inv_blocks.py)."""
    ident = lambda x: x
    return {
        f"{t_prefix}.p": (f"{f_prefix}/lu/frozen_p", ident),
        f"{t_prefix}.sign_s": (f"{f_prefix}/lu/frozen_sign_s", ident),
        f"{t_prefix}.l": (f"{f_prefix}/lu/l", ident),
        f"{t_prefix}.log_s": (f"{f_prefix}/lu/log_s", ident),
        f"{t_prefix}.u": (f"{f_prefix}/lu/u", ident),
    }


def _dense_block(t_prefix: str, f_prefix: str) -> dict:
    """DenseBlock = 2 UNetConvBlocks + conv3 (reference
    SFIIN.py:137-173). flax: conv{1,2}/{identity,conv_1,conv_2}/Conv_0
    and conv3/Conv_0."""
    out = {}
    for blk in ("conv1", "conv2"):
        for leaf in ("identity", "conv_1", "conv_2"):
            out.update({
                f"{t_prefix}.{blk}.{leaf}.weight":
                    (f"{f_prefix}/{blk}/{leaf}/Conv_0/kernel", _conv),
                f"{t_prefix}.{blk}.{leaf}.bias":
                    (f"{f_prefix}/{blk}/{leaf}/Conv_0/bias", lambda x: x),
            })
    out.update({
        f"{t_prefix}.conv3.weight": (f"{f_prefix}/conv3/Conv_0/kernel", _conv),
        f"{t_prefix}.conv3.bias": (f"{f_prefix}/conv3/Conv_0/bias",
                                   lambda x: x),
    })
    return out


def _inv_block(t_prefix: str, f_prefix: str) -> dict:
    """InvBlock: invconv + F/G/H DenseBlocks (reference SFIIN.py:176-207)."""
    out = _invconv(f"{t_prefix}.invconv", f"{f_prefix}/invconv")
    for sub in ("F", "G", "H"):
        out.update(_dense_block(f"{t_prefix}.{sub}", f"{f_prefix}/{sub}"))
    return out


def _refine(t_prefix: str, f_prefix: str, n_ca: int = 1) -> dict:
    """Refine/Refine1/Refine2 tails (reference mz_refine.py:59-117)."""
    out = {}
    for t_leaf, f_leaf in (("conv_in", "conv_in"), ("conv_last", "conv_last")):
        out.update({
            f"{t_prefix}.{t_leaf}.weight":
                (f"{f_prefix}/{f_leaf}/Conv_0/kernel", _conv),
            f"{t_prefix}.{t_leaf}.bias":
                (f"{f_prefix}/{f_leaf}/Conv_0/bias", lambda x: x),
        })
    for i in range(n_ca):
        ca_t = f"{t_prefix}.process.{i}"
        ca_f = f"{f_prefix}/ca_{i}"
        for t_leaf, f_leaf in (("process.0", "process0"),
                               ("process.2", "process1"),
                               ("conv_du.0", "du0"), ("conv_du.2", "du1")):
            out.update({
                f"{ca_t}.{t_leaf}.weight":
                    (f"{ca_f}/{f_leaf}/Conv_0/kernel", _conv),
                f"{ca_t}.{t_leaf}.bias":
                    (f"{ca_f}/{f_leaf}/Conv_0/bias", lambda x: x),
            })
    return out


def _apply_table(sd: SD, table: dict, out: dict, label: str) -> None:
    for key, val in sd.items():
        if key not in table:
            raise KeyError(f"unmapped {label} key: {key}")
        path, tf = table[key]
        _set(out, path, tf(val))


# ------------------------------------------------------------------ SFIIN

def _sfiin_spafre(t_prefix: str, f_prefix: str) -> dict:
    """SpaFre block (reference SFIIN.py:240-258)."""
    table = {}
    for t_leaf, f_leaf in (("panprocess", "panprocess"), ("panpre", "panpre"),
                           ("spa_process.1", "spa_out"),
                           ("spa_att.0", "spa_att0"), ("spa_att.2", "spa_att1"),
                           ("cha_att.0", "cha_att0"), ("cha_att.2", "cha_att1"),
                           ("post", "post"),
                           ("fre_process.pre1", "fre_process/pre1"),
                           ("fre_process.pre2", "fre_process/pre2"),
                           ("fre_process.amp_fuse.0", "fre_process/amp_fuse0"),
                           ("fre_process.amp_fuse.2", "fre_process/amp_fuse1"),
                           ("fre_process.pha_fuse.0", "fre_process/pha_fuse0"),
                           ("fre_process.pha_fuse.2", "fre_process/pha_fuse1"),
                           ("fre_process.post", "fre_process/post")):
        table.update({
            f"{t_prefix}.{t_leaf}.weight":
                (f"{f_prefix}/{f_leaf}/Conv_0/kernel", _conv),
            f"{t_prefix}.{t_leaf}.bias":
                (f"{f_prefix}/{f_leaf}/Conv_0/bias", lambda x: x),
        })
    table.update(_inv_block(f"{t_prefix}.spa_process.0",
                            f"{f_prefix}/spa_inv"))
    return table


def convert_sfiin(sd: SD) -> dict:
    """Reference SFIIN `Net` state_dict (reference SFIIN.py:317-340)
    -> flax SFIINNet params."""
    table = {}
    for t_leaf, f_leaf in (("process.conv_p", "conv_p"),
                           ("process.conv_p1", "conv_p1"),
                           ("process.fuse", "fuse")):
        table.update({
            f"{t_leaf}.weight": (f"{f_leaf}/Conv_0/kernel", _conv),
            f"{t_leaf}.bias": (f"{f_leaf}/Conv_0/bias", lambda x: x),
        })
    blocks = ["block", "block1", "block2", "block3", "block4"]
    for i, t_blk in enumerate(blocks):
        table.update(_sfiin_spafre(f"process.{t_blk}", f"block{i}"))
    table.update(_refine("refine", "refine", n_ca=1))
    out: dict = {}
    _apply_table(sd, table, out, "SFIIN")
    return out


# ---------------------------------------------------------------- VGG feat

def convert_vgg_feat(features_sd: SD) -> dict:
    """torchvision `vgg19().features.state_dict()` -> flax VGGFeat
    params (reference modules.py:182-223 uses features[0:12]; only the
    five convs at indices 0/2/5/7/10 carry weights)."""
    out: dict = {}
    for idx in (0, 2, 5, 7, 10):
        _set(out, f"conv{idx}/Conv_0/kernel", _conv(features_sd[f"{idx}.weight"]))
        _set(out, f"conv{idx}/Conv_0/bias", features_sd[f"{idx}.bias"])
    return out


# ------------------------------------------------------------------ MutInf

def _hin_block(t_prefix: str, f_prefix: str) -> dict:
    """MutInf's UNetConvBlock with half-instance-norm (reference
    MutInf.py:137-160) -> _HINConvBlock."""
    table = {}
    for leaf in ("identity", "conv_1", "conv_2"):
        table.update({
            f"{t_prefix}.{leaf}.weight":
                (f"{f_prefix}/{leaf}/Conv_0/kernel", _conv),
            f"{t_prefix}.{leaf}.bias":
                (f"{f_prefix}/{leaf}/Conv_0/bias", lambda x: x),
        })
    table[f"{t_prefix}.norm.weight"] = (f"{f_prefix}/in_gamma", lambda x: x)
    table[f"{t_prefix}.norm.bias"] = (f"{f_prefix}/in_beta", lambda x: x)
    return table


def _dense_mscale(t_prefix: str, f_prefix: str) -> dict:
    """DenseBlockMscale (reference MutInf.py:184-211): shared HIN dense
    block + SE-style per-scale gates."""
    table = {}
    table.update(_hin_block(f"{t_prefix}.ops.conv1", f"{f_prefix}/ops/conv1"))
    table.update(_hin_block(f"{t_prefix}.ops.conv2", f"{f_prefix}/ops/conv2"))
    for t_leaf, f_leaf in (("ops.conv3", "ops/conv3"),
                           ("fusepool.1", "fusepool"), ("fc1.0", "fc1"),
                           ("fc2.0", "fc2"), ("fc3.0", "fc3"),
                           ("fuse", "fuse")):
        table.update({
            f"{t_prefix}.{t_leaf}.weight":
                (f"{f_prefix}/{f_leaf}/Conv_0/kernel", _conv),
            f"{t_prefix}.{t_leaf}.bias":
                (f"{f_prefix}/{f_leaf}/Conv_0/bias", lambda x: x),
        })
    return table


def _edge_block(t_prefix: str, f_prefix: str) -> dict:
    """EdgeBlock: conv + residual stack + gated CDC (reference
    MutInf.py:356-368, CDC.py:77-93). CDC (1,5) tap kernels keep the
    torch->HWIO transpose; HP_branch maps to hp_branch."""
    table = {}
    for t_leaf, f_leaf in (("process", "process"), ("Res.0", "res0"),
                           ("Res.2", "res1")):
        table.update({
            f"{t_prefix}.{t_leaf}.weight":
                (f"{f_prefix}/{f_leaf}/Conv_0/kernel", _conv),
            f"{t_prefix}.{t_leaf}.bias":
                (f"{f_prefix}/{f_leaf}/Conv_0/bias", lambda x: x),
        })
    for br in ("h_conv", "d_conv"):
        table[f"{t_prefix}.CDC.{br}.conv.weight"] = (
            f"{f_prefix}/cdc/{br}/taps", _conv)
    table[f"{t_prefix}.CDC.HP_branch"] = (f"{f_prefix}/cdc/hp_branch",
                                          lambda x: x)
    return table


def convert_mutinf(sd: SD) -> dict:
    """Reference MutInf `GPPNN` state_dict (reference MutInf.py:313-345)
    -> flax GPPNNMutInf params."""
    table = {}
    for grp in ("extract_pan", "extract_ms"):
        table.update({
            f"{grp}.conv.weight": (f"{grp}/conv/Conv_0/kernel", _conv),
            f"{grp}.conv.bias": (f"{grp}/conv/Conv_0/bias", lambda x: x),
        })
        for blk in ("block1", "block2"):
            table.update(_edge_block(f"{grp}.{blk}", f"{grp}/{blk}"))
    for i in range(4):
        t_op = f"interact.operations.{i}"
        f_op = f"inv_{i}"
        table.update(_invconv(f"{t_op}.invconv", f"{f_op}/invconv"))
        for sub in ("F", "G", "H"):
            table.update(_dense_mscale(f"{t_op}.{sub}", f"{f_op}/{sub}"))
    table.update({
        "interact.fuse.weight": ("interact_fuse/Conv_0/kernel", _conv),
        "interact.fuse.bias": ("interact_fuse/Conv_0/bias", lambda x: x),
    })
    table.update(_refine("refine", "refine", n_ca=2))
    out: dict = {}
    _apply_table(sd, table, out, "MutInf")
    return out


def convert_mutual_info(sd: SD) -> dict:
    """Reference `Mutual_info_reg` state_dict (the MutInf runner's
    second module, reference MutInf.py:452-462 / base/losses.py:162-219)
    -> flax MutualInfoReg params (lgteun_tpu/losses.py)."""
    table: dict = {}
    for name in ("layer1", "layer2", "layer3", "layer4"):
        table.update({
            f"{name}.weight": (f"{name}/kernel", _conv),
            f"{name}.bias": (f"{name}/bias", lambda x: x),
        })
    for name in ("fc1_rgb3", "fc2_rgb3", "fc1_depth3", "fc2_depth3"):
        table.update({
            f"{name}.weight": (f"{name}/kernel", _linear),
            f"{name}.bias": (f"{name}/bias", lambda x: x),
        })
    out: dict = {}
    _apply_table(sd, table, out, "MutInf.mi")
    return out


# -------------------------------------------------------------------- INNT

def convert_innt(sd: SD) -> dict:
    """Reference INNT `GPPNN` state_dict (reference INNT.py:370-404)
    -> flax GPPNNINNT params. DenseBlocks here are the 2-HIN-block
    variant (reference INNT.py:235-253)."""
    table = {}
    for t_leaf, f_leaf in (("conv_process.convms", "convms"),
                           ("conv_process.convpan", "convpan"),
                           ("conv_fusion.conv", "conv_fusion"),
                           ("transform_fusion.fuse.conv_trans.0",
                            "transform_fusion/fuse/trans0"),
                           ("transform_fusion.fuse.conv_trans.2",
                            "transform_fusion/fuse/trans1")):
        table.update({
            f"{t_leaf}.weight": (f"{f_leaf}/Conv_0/kernel", _conv),
            f"{t_leaf}.bias": (f"{f_leaf}/Conv_0/bias", lambda x: x),
        })
    for i in range(3):
        t_op = f"extract.operations.{i}"
        f_op = f"inv_{i}"
        table.update(_invconv(f"{t_op}.invconv", f"{f_op}/invconv"))
        for sub in ("F", "G", "H"):
            table.update(_hin_block(f"{t_op}.{sub}.conv1",
                                    f"{f_op}/{sub}/conv1"))
            table.update(_hin_block(f"{t_op}.{sub}.conv2",
                                    f"{f_op}/{sub}/conv2"))
    table.update({
        "extract.fuse.weight": ("extract_fuse/Conv_0/kernel", _conv),
        "extract.fuse.bias": ("extract_fuse/Conv_0/bias", lambda x: x),
    })
    table.update(_refine("refine", "refine", n_ca=1))
    out: dict = {}
    _apply_table(sd, table, out, "INNT")
    return out


# ------------------------------------------------------------------- MDCUN

def _prelu(val: Array) -> Array:
    """torch nn.PReLU weight (1,) -> scalar alpha."""
    return np.asarray(val).reshape(())


def convert_mdcun(sd: SD) -> dict:
    """Reference `pan_unfolding` state_dict (reference MDCUN.py:311-419)
    -> flax PanUnfolding params. The reference always creates `conv1x1`
    but only uses it for >4-band inputs (MDCUN.py:385-388); for 4-band
    models its keys are dropped (no flax counterpart)."""
    ms_chans = sd["conv1x1.weight"].shape[0]
    table = {}
    for t_leaf, f_leaf in (("conv_up.body.0", "conv_up/body"),
                           ("conv_up.tail.1", "conv_up/tail0"),
                           ("conv_up.tail.2", "conv_up/tail1"),
                           ("conv_down.body.0", "conv_down/body"),
                           ("conv_down.tail.1", "conv_down/tail0"),
                           ("conv_down.tail.2", "conv_down/tail1"),
                           ("hf_pan", "hf_pan")):
        table.update({
            f"{t_leaf}.weight": (f"{f_leaf}/Conv_0/kernel", _conv),
            f"{t_leaf}.bias": (f"{f_leaf}/Conv_0/bias", lambda x: x),
        })
    if ms_chans > 4:
        table.update({
            "conv1x1.weight": ("conv1x1/Conv_0/kernel", _conv),
            "conv1x1.bias": ("conv1x1/Conv_0/bias", lambda x: x),
        })
    else:
        table["conv1x1.weight"] = (None, None)
        table["conv1x1.bias"] = (None, None)
    # stage memory convs + scalars
    for i in range(4):
        for j in range(2):
            table.update({
                f"conv_u.{i}.{j}.weight":
                    (f"conv_u_{i}_{j}/Conv_0/kernel", _conv),
                f"conv_u.{i}.{j}.bias":
                    (f"conv_u_{i}_{j}/Conv_0/bias", lambda x: x),
            })
        for nm in ("u", "eta", "gama", "delta"):
            table[f"{nm}.{i}"] = (f"{nm}_{i}", _prelu)
    # att_spatial: block.0 = ConvBlock(bias=False) head, block.1..3 =
    # ResnetBlocks (biased convs — see models/mdcun.py _ResnetBlock note)
    table["rm1.block.0.conv.weight"] = ("rm1/head/Conv_0/kernel", _conv)
    table["rm1.block.0.act.weight"] = ("rm1/head_act/alpha", _prelu)
    for i in range(3):
        t_res = f"rm1.block.{i + 1}"
        f_res = f"rm1/res_{i}"
        table.update({
            f"{t_res}.conv1.weight": (f"{f_res}/conv1/Conv_0/kernel", _conv),
            f"{t_res}.conv1.bias": (f"{f_res}/conv1/Conv_0/bias", lambda x: x),
            f"{t_res}.conv2.weight": (f"{f_res}/conv2/Conv_0/kernel", _conv),
            f"{t_res}.conv2.bias": (f"{f_res}/conv2/Conv_0/bias", lambda x: x),
            f"{t_res}.act.weight": (f"{f_res}/act/alpha", _prelu),
        })
        # the reference ResnetBlock registers the same conv/act tensors
        # a second time inside its `layers` Sequential
        # (MDCUN.py:297-302) — aliased keys, skip
        for alias in ("layers.0.weight", "layers.0.bias", "layers.1.weight",
                      "layers.2.weight", "layers.2.bias", "layers.3.weight"):
            table[f"{t_res}.{alias}"] = (None, None)
    table["rm1.spatial.conv.weight"] = ("rm1/spatial/Conv_0/kernel", _conv)
    table["rm1.spatial.act.weight"] = ("rm1/spatial_act/alpha", _prelu)
    # non-local 1x1 projections: raw [1,1,C,C] params
    for nm in ("t", "p", "g", "w"):
        table[f"NLBlock.{nm}.weight"] = (f"nl/{nm}", _conv)
    out: dict = {}
    for key, val in sd.items():
        if key not in table:
            raise KeyError(f"unmapped MDCUN key: {key}")
        path, tf = table[key]
        if path is None:
            continue
        _set(out, path, tf(val))
    return out


# --------------------------------------------------------------- PanFormer

def _linear(w: Array) -> Array:
    """torch Linear [out, in] -> flax Dense [in, out]."""
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _swin_module(t_prefix: str, f_prefix: str, key: str, val: Array,
                 out: dict) -> bool:
    """Translate one key inside a reference SwinModule (reference
    modules.py:458-502) to the flax SwinModule tree (common/swin.py).

    torch structure: patch_partition.linear; layers.{i}.{0|1} with
    0=regular/1=shifted SwinBlock; block = attention_block
    (Residual(PreNorm(WindowAttention))) + mlp_block
    (Residual(PreNorm(FeedForward))) -> keys *.fn.norm / *.fn.fn.
    The shifted blocks' upper_lower_mask/left_right_mask are frozen
    constants (reference modules.py:358-362) recomputed on the flax
    side — skipped here."""
    if not key.startswith(t_prefix + "."):
        return False
    rest = key[len(t_prefix) + 1:]
    m = re.match(r"patch_partition\.linear\.(weight|bias)", rest)
    if m:
        wb = m.group(1)
        tf = _linear if wb == "weight" else (lambda x: x)
        _set(out, f"{f_prefix}/patch_partition/linear/Dense_0/"
             f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
        return True
    m = re.match(r"layers\.(\d+)\.([01])\.(.+)", rest)
    if not m:
        raise KeyError(f"unmapped SwinModule key: {key}")
    i, which, sub = int(m.group(1)), m.group(2), m.group(3)
    blk = f"{f_prefix}/{'regular' if which == '0' else 'shifted'}_{i}"
    if sub.endswith(("upper_lower_mask", "left_right_mask")):
        return True  # recomputed, not parameters
    table = {
        "attention_block.fn.norm.weight": (f"{blk}/attn_norm/scale", None),
        "attention_block.fn.norm.bias": (f"{blk}/attn_norm/bias", None),
        "attention_block.fn.fn.pos_embedding": (f"{blk}/attn/pos_embedding",
                                                None),
        "attention_block.fn.fn.to_qkv.weight":
            (f"{blk}/attn/to_qkv/Dense_0/kernel", _linear),
        "attention_block.fn.fn.to_kv.weight":
            (f"{blk}/attn/to_kv/Dense_0/kernel", _linear),
        "attention_block.fn.fn.to_q.weight":
            (f"{blk}/attn/to_q/Dense_0/kernel", _linear),
        "attention_block.fn.fn.to_out.weight":
            (f"{blk}/attn/to_out/Dense_0/kernel", _linear),
        "attention_block.fn.fn.to_out.bias":
            (f"{blk}/attn/to_out/Dense_0/bias", None),
        "mlp_block.fn.norm.weight": (f"{blk}/mlp_norm/scale", None),
        "mlp_block.fn.norm.bias": (f"{blk}/mlp_norm/bias", None),
        "mlp_block.fn.fn.net.0.weight": (f"{blk}/mlp_fc1/Dense_0/kernel",
                                         _linear),
        "mlp_block.fn.fn.net.0.bias": (f"{blk}/mlp_fc1/Dense_0/bias", None),
        "mlp_block.fn.fn.net.2.weight": (f"{blk}/mlp_fc2/Dense_0/kernel",
                                         _linear),
        "mlp_block.fn.fn.net.2.bias": (f"{blk}/mlp_fc2/Dense_0/bias", None),
    }
    if sub not in table:
        raise KeyError(f"unmapped SwinBlock key: {key}")
    path, tf = table[sub]
    _set(out, path, tf(val) if tf else val)
    return True


def convert_panformer(sd: SD) -> dict:
    """Reference `CrossSwinTransformer` state_dict (reference
    panformer.py:21-108) -> flax CrossSwinTransformer params."""
    out: dict = {}
    tail = {"0": "tail_conv0", "3": "tail_conv1", "6": "tail_conv2",
            "8": "tail_conv3"}
    for key, val in sd.items():
        m = re.match(r"HR_tail\.(\d+)\.(weight|bias)", key)
        if m:
            idx, wb = m.groups()
            tf = _conv if wb == "weight" else (lambda x: x)
            _set(out, f"{tail[idx]}/Conv_0/"
                 f"{'kernel' if wb == 'weight' else 'bias'}", tf(val))
            continue
        m = re.match(r"(pan_encoder|ms_encoder)\.(\d+)\.", key)
        if m:
            grp = "pan_enc" if m.group(1) == "pan_encoder" else "ms_enc"
            if _swin_module(f"{m.group(1)}.{m.group(2)}",
                            f"{grp}_{m.group(2)}", key, val, out):
                continue
        m = re.match(r"(pan_cross_ms|ms_cross_pan)\.(\d+)\.", key)
        if m:
            if _swin_module(f"{m.group(1)}.{m.group(2)}",
                            f"{m.group(1)}_{m.group(2)}", key, val, out):
                continue
        raise KeyError(f"unmapped PanFormer key: {key}")
    return out


# --------------------------------------------------------------- lightnet

def convert_lightnet(sd: SD) -> dict:
    """Reference `LightNet` state_dict (reference lightnet.py:85-135)
    -> flax LightNetModule params. SpanConv branches map point_wise_n /
    depth_wise_n -> pwN / dwN raw nn.Conv leaves."""
    seq = {"head_conv.0": "head0", "head_conv.1": "head1",
           "head_conv.2": "head2",
           "belly_conv.0.conv1": "belly0/conv1",
           "belly_conv.0.conv2": "belly0/conv2",
           "belly_conv.1.conv1": "belly1/conv1",
           "belly_conv.1.conv2": "belly1/conv2",
           "tail_conv.0": "tail0", "tail_conv.1": "tail1",
           "tail_conv.2": "tail2"}
    branch = {"point_wise_1": "pw1", "depth_wise_1": "dw1",
              "point_wise_2": "pw2", "depth_wise_2": "dw2"}
    out: dict = {}
    for key, val in sd.items():
        m = re.match(r"(.+)\.(point_wise_[12]|depth_wise_[12])\.(weight|bias)",
                     key)
        if not m or m.group(1) not in seq:
            raise KeyError(f"unmapped lightnet key: {key}")
        prefix, leaf, wb = seq[m.group(1)], branch[m.group(2)], m.group(3)
        tf = _conv if wb == "weight" else (lambda x: x)
        _set(out, f"{prefix}/{leaf}/{'kernel' if wb == 'weight' else 'bias'}",
             tf(val))
    return out


CONVERTERS: Dict[str, Callable[[SD], dict]] = {
    "UnlgFormer": convert_lgteun,
    "lightnet": convert_lightnet,
    "PanFormer": convert_panformer,
    "SFIIN": convert_sfiin,
    "MutInf": convert_mutinf,
    "INNT": convert_innt,
    "MDCUN": convert_mdcun,
}

# Auxiliary (non-core) modules the reference runner also optimises and
# checkpoints (reference base_model.py:354-369 pickles every entry of
# module_dict): {(model_type, module_name): converter}.
AUX_CONVERTERS: Dict[tuple, Callable[[SD], dict]] = {
    ("MutInf", "mi"): convert_mutual_info,
}


def convert_state_dict(model_type: str, sd: SD) -> dict:
    """Dispatch on the registry name (reference cfg.model_type)."""
    if model_type not in CONVERTERS:
        raise KeyError(
            f"no torch converter for {model_type!r}; "
            f"available: {sorted(CONVERTERS)}")
    return CONVERTERS[model_type](sd)
