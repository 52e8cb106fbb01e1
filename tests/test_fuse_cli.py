"""Whole-scene fusion CLI (`python -m lgteun_tpu.fuse`)."""

import numpy as np
import pytest

from lgteun_tpu.data.tiff import read_tiff, write_tiff
from lgteun_tpu.fuse import build_argparser, fuse_scene_files


def _write_scene(tmp_path, rng, h, w, c):
    lr = rng.integers(0, 2047, (h // 4, w // 4, c)).astype(np.uint16)
    pan = rng.integers(0, 2047, (h, w)).astype(np.uint16)
    write_tiff(str(tmp_path / "lr.tif"), lr)
    write_tiff(str(tmp_path / "pan.tif"), pan)
    return lr, pan


@pytest.fixture
def np_rng():
    return np.random.default_rng(7)


def test_fuse_cli_classical(tmp_path, np_rng):
    _write_scene(tmp_path, np_rng, 128, 96, 4)
    out_path = str(tmp_path / "fused.tif")
    args = build_argparser().parse_args([
        "--lr", str(tmp_path / "lr.tif"), "--pan", str(tmp_path / "pan.tif"),
        "-o", out_path, "--method", "SFIM", "--tile", "64", "--halo", "16",
        "--batch", "2"])
    assert fuse_scene_files(args) == out_path
    fused = read_tiff(out_path)
    assert fused.shape == (128, 96, 4)
    assert fused.dtype == np.uint16
    assert fused.max() <= 2047
    assert fused.std() > 0


def test_fuse_cli_classical_matches_direct(tmp_path, np_rng):
    """CLI output equals a direct `fuse_scene` call with identical
    tiling (pins the normalise/denormalise round trip; note classical
    methods use per-tile global statistics — SFIM histogram-matches
    with tile-level mean/std — so only the tiled engine itself is the
    comparison point, not a whole-scene fuse)."""
    import jax.numpy as jnp

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.parallel.scene import fuse_scene
    from lgteun_tpu.registry import build_model

    lr, pan = _write_scene(tmp_path, np_rng, 128, 128, 4)
    out_path = str(tmp_path / "fused.tif")
    args = build_argparser().parse_args([
        "--lr", str(tmp_path / "lr.tif"), "--pan", str(tmp_path / "pan.tif"),
        "-o", out_path, "--method", "SFIM", "--tile", "64", "--halo", "8",
        "--batch", "2"])
    fuse_scene_files(args)
    got = read_tiff(out_path).astype(np.float64)

    scale = 2 ** 11 - 0.5
    cfg = Config(model_type="SFIM", ms_chans=4,
                 loss_cfg={"rec_loss": LossCfg()})
    method = build_model("SFIM", cfg)
    want = fuse_scene(method, {}, jnp.asarray(lr / scale),
                      jnp.asarray(pan[:, :, None] / scale),
                      tile=64, halo=8, batch=2)
    want = np.clip(np.round(np.asarray(want) * scale), 0, 2047)
    np.testing.assert_allclose(got, want, atol=1.0)


def test_fuse_cli_dl_fresh_init_warns(tmp_path, np_rng, caplog):
    _write_scene(tmp_path, np_rng, 64, 64, 4)
    out_path = str(tmp_path / "fused.tif")
    args = build_argparser().parse_args([
        "--lr", str(tmp_path / "lr.tif"), "--pan", str(tmp_path / "pan.tif"),
        "-o", out_path, "--method", "lightnet", "--tile", "32", "--halo",
        "8", "--batch", "2"])
    import logging

    with caplog.at_level(logging.WARNING):
        fuse_scene_files(args)
    assert any("fresh-init" in r.message for r in caplog.records)
    assert read_tiff(out_path).shape == (64, 64, 4)


def test_fuse_cli_checkpoint_roundtrip(tmp_path, np_rng):
    """Fusing with a saved checkpoint reproduces fusing with the live
    runner's params."""
    import jax

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.parallel.scene import fuse_scene
    from lgteun_tpu.registry import build_model
    from lgteun_tpu.runner import Runner

    lr, pan = _write_scene(tmp_path, np_rng, 64, 64, 4)
    cfg = Config(model_type="lightnet", ms_chans=4,
                 loss_cfg={"rec_loss": LossCfg()},
                 work_dir=str(tmp_path / "work"))
    method = build_model("lightnet", cfg)
    runner = Runner(cfg, method)
    runner.init()
    ckpt = runner.save(0)

    out_path = str(tmp_path / "fused.tif")
    args = build_argparser().parse_args([
        "--lr", str(tmp_path / "lr.tif"), "--pan", str(tmp_path / "pan.tif"),
        "-o", out_path, "--method", "lightnet", "--tile", "32", "--halo",
        "8", "--batch", "2", "--checkpoint", ckpt])
    fuse_scene_files(args)
    got = read_tiff(out_path).astype(np.float64)

    scale = 2 ** 11 - 0.5
    want = fuse_scene(method, runner.params,
                      jax.numpy.asarray(lr / scale),
                      jax.numpy.asarray(pan[:, :, None] / scale),
                      tile=32, halo=8, batch=2)
    want = np.clip(np.round(np.asarray(want) * scale), 0, 2047)
    np.testing.assert_allclose(got, want, atol=1.0)


def test_fuse_cli_whole_scene_mode(tmp_path, np_rng):
    """--tile 0: one whole-scene forward, global statistics intact."""
    import jax.numpy as jnp

    import lgteun_tpu.models  # noqa: F401
    from lgteun_tpu.config import Config, LossCfg
    from lgteun_tpu.models.classical import sfim_fuse
    from lgteun_tpu.registry import build_model  # noqa: F401

    lr, pan = _write_scene(tmp_path, np_rng, 96, 96, 4)
    out_path = str(tmp_path / "fused.tif")
    args = build_argparser().parse_args([
        "--lr", str(tmp_path / "lr.tif"), "--pan", str(tmp_path / "pan.tif"),
        "-o", out_path, "--method", "SFIM", "--tile", "0"])
    fuse_scene_files(args)
    got = read_tiff(out_path).astype(np.float64)

    scale = 2 ** 11 - 0.5
    want = np.asarray(sfim_fuse(jnp.asarray(lr[None] / scale),
                                jnp.asarray(pan[None, :, :, None] / scale))
                      )[0] * scale
    np.testing.assert_allclose(got, np.clip(np.round(want), 0, 2047),
                               atol=1.0)
