"""Whole-scene pan-sharpening CLI (production serving entry point).

The reference has no scene-level entry — its `main.py` only scores
pre-cropped 128x128 benchmark tiles (reference main.py:61-143,
dataset/ps_dataset.py:44-66). This CLI fuses one full-size scene:

    python -m lgteun_tpu.fuse --lr scene_lr.tif --pan scene_pan.tif \
        -o fused.tif [--method UnlgFormer] [--checkpoint DIR] \
        [--tile 128 --halo 16 --batch 32] [--bit-depth 11] [--geo ref]

- inputs: LrMS [h/4, w/4, C] and PAN [h, w] TIFFs (any size; the
  reference's 11-bit uint16 convention, normalised by 2^bit_depth-0.5
  exactly like the benchmark pipeline, reference dataset/utils.py:232)
- the scene runs through `parallel.scene.fuse_scene`: overlapping
  tiles at the model's native size, batched through the fused TPU
  path, cosine-blended seams
- classical methods (GSA/SFIM/Wavelet) are training-free — no
  checkpoint needed; DL methods load an orbax checkpoint (converted
  reference checkpoints work via scripts/convert_torch_ckpt.py)
- output: uint16 TIFF; `--geo ref` stamps the reference's GeoTIFF tags
  (reference dataset/utils.py:42-72), `--geo none` writes bare TIFF.
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m lgteun_tpu.fuse",
        description="Fuse one large LrMS+PAN scene into HrMS")
    p.add_argument("--lr", required=True, help="LrMS TIFF [h/4, w/4, C]")
    p.add_argument("--pan", required=True, help="PAN TIFF [h, w]")
    p.add_argument("-o", "--out", required=True, help="output TIFF path")
    p.add_argument("--method", default="UnlgFormer",
                   help="registry name (default UnlgFormer)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (omit for classical "
                        "methods; DL methods warn and run fresh-init)")
    p.add_argument("--tile", type=int, default=128,
                   help="0 = fuse the whole scene in ONE forward (no "
                        "tiling) — right for the classical methods, "
                        "whose statistics are global (GSA regression, "
                        "SFIM histogram match); DL methods should keep "
                        "their native training tile")
    p.add_argument("--halo", type=int, default=16)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--bit-depth", type=int, default=11,
                   help="input bit depth; normalisation divides by "
                        "2^bit_depth - 0.5 (reference dataset/utils"
                        ".py:232)")
    p.add_argument("--stage", type=int, default=2,
                   help="unfolding stages for UnlgFormer (reference "
                        "configs/unlg_former.py:93)")
    p.add_argument("--geo", choices=["ref", "none"], default="ref")
    return p


def fuse_scene_files(args, logger=None) -> str:
    logger = logger or logging.getLogger("lgteun.fuse")
    import lgteun_tpu.models  # noqa: F401  (register methods)
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.data.tiff import REFERENCE_GEO, read_tiff, write_tiff
    from lgteun_tpu.parallel.scene import fuse_scene
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    lr = read_tiff(args.lr).astype(np.float32)
    pan = read_tiff(args.pan).astype(np.float32)
    if lr.ndim == 2:
        lr = lr[:, :, None]
    pan = pan[..., :1] if pan.ndim == 3 else pan[:, :, None]
    chans = lr.shape[-1]
    scale = float(2 ** args.bit_depth - 0.5)

    cfg = Config(model_type=args.method, ms_chans=chans,
                 loss_cfg={"rec_loss": LossCfg()},
                 model_cfg={"core_module": {"stage": args.stage}}
                 if args.method == "UnlgFormer" else {})
    method = build_model(args.method, cfg)
    runner = Runner(cfg, method, logger=logger)
    runner.init()
    if args.checkpoint:
        runner.load_checkpoint(args.checkpoint)
    elif method.trainable:
        logger.warning("trainable method %s without --checkpoint: "
                       "fusing with fresh-init weights", args.method)

    t0 = time.perf_counter()
    if args.tile == 0:
        out = method.apply(runner.params,
                           {"input_lr": (lr / scale)[None],
                            "input_pan": (pan / scale)[None]})[0]
    else:
        out = fuse_scene(method, runner.params, lr / scale, pan / scale,
                         tile=args.tile, halo=args.halo, batch=args.batch)
    out = np.asarray(out)
    dt = time.perf_counter() - t0
    h, w = out.shape[:2]
    logger.info("fused %dx%dx%d in %.2fs (%.2f MP/s)", h, w, chans, dt,
                h * w / dt / 1e6)

    dn = np.clip(np.round(out * scale), 0, 2 ** args.bit_depth - 1)
    geo = REFERENCE_GEO if args.geo == "ref" else None
    write_tiff(args.out, dn.astype(np.uint16), geo=geo)
    logger.info("wrote %s", args.out)
    return args.out


def cli(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_argparser().parse_args(argv)
    fuse_scene_files(args)


if __name__ == "__main__":
    cli()
