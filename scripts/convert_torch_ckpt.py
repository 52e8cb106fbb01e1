"""Convert a reference PyTorch checkpoint to this framework's format.

The reference saves checkpoints as a pickle of WHOLE nn.Modules keyed
by module name plus 'iter_num' (reference models/base/base_model.py:
354-369); released weights on the authors' Google Drive use the same
format. This script extracts each module's state_dict, maps it through
lgteun_tpu.convert (rule-based per-method translators, the same code
the torch-parity tests exercise) and writes an orbax checkpoint that
`Runner.load_checkpoint` / `load_pretrained` and the shipped
`only_test` configs consume directly.

Usage:
    python scripts/convert_torch_ckpt.py \
        --model-type UnlgFormer \
        --torch-ckpt weight_results/model_iter_35000.pth \
        --out data/ckpt/UnlgFormer/WV-3/model_iter_35000

Requires torch (CPU is fine) only at conversion time — the framework
itself never imports it.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_state_dicts(path: str) -> tuple[dict, int]:
    """-> ({module_name: {key: np.ndarray}}, iter_num). Handles both
    whole-module pickles (reference format) and plain state_dict
    checkpoints."""
    import torch

    # the reference format pickles whole nn.Modules, so unpickling
    # needs the reference `models` package importable; the shim stubs
    # its unavailable deps (mmcv/gdal/...) and adds /root/reference (or
    # $LGTEUN_REFERENCE_ROOT) to sys.path
    try:
        from lgteun_tpu.convert.reference_shim import install_stubs

        install_stubs()
    except Exception:
        pass  # plain state_dict checkpoints don't need it

    payload = torch.load(path, map_location="cpu", weights_only=False)
    iter_num = int(payload.pop("iter_num", 0))
    out = {}
    for name, mod in payload.items():
        if hasattr(mod, "state_dict"):  # pickled nn.Module
            sd = mod.state_dict()
        else:  # already a state_dict
            sd = mod
        out[name] = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return out, iter_num


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-type", required=True,
                    help="registry name, e.g. UnlgFormer / PanFormer / "
                         "INNT / SFIIN / MutInf / MDCUN / lightnet")
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True,
                    help="orbax checkpoint directory to create")
    args = ap.parse_args()

    import jax  # noqa: F401  (orbax needs an initialised backend)

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from lgteun_tpu.convert import AUX_CONVERTERS, convert_state_dict

    sds, iter_num = load_torch_state_dicts(args.torch_ckpt)
    params = {}
    for name, sd in sds.items():
        if name == "core_module":
            params[name] = convert_state_dict(args.model_type, sd)
        elif (args.model_type, name) in AUX_CONVERTERS:
            # e.g. MutInf's 'mi' module (reference MutInf.py:452-462)
            params[name] = AUX_CONVERTERS[(args.model_type, name)](sd)
        else:
            raise SystemExit(
                f"no converter wired for auxiliary module {name!r} "
                f"of {args.model_type!r}")

    path = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "iter_num": iter_num}, force=True)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"wrote {path} ({n:,} params, iter {iter_num})")


if __name__ == "__main__":
    main()
