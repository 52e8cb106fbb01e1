"""Tiled-batched whole-scene fusion (production large-strip inference).

The reference only ever fuses pre-cropped 128x128 tiles one at a time
(reference dataset/ps_dataset.py:44-66; every paper number is measured
at that size). Real satellite products are strips thousands of pixels
on a side. Two large-scene engines exist in this repo:

- whole-image inference through the channel-major trunk (plain-XLA
  fuse level; `scripts/bench_large_tile.py`) — exact single-program
  semantics, but the Pallas kernels are sized for <=128px tiles, so a
  2048^2 scene runs at ~6.7 MP/s on one v5e chip;
- THIS module: cover the scene with overlapping tiles at the model's
  native (training) tile size, fuse the tiles as one large batch
  through the fully fused Pallas engine (26+ MP/s at 128px), and blend
  the seams with a partition-of-unity cosine ramp.

Tiled fusion is also the *faithful* deployment mode: the networks were
trained on 128px context (windows, FFT mixers, attention spans all saw
128px statistics), so fusing a 2048px scene in one forward silently
changes the global-branch context, while tiling reproduces exactly the
context the checkpoint was trained for.

Geometry. PAN tiles are T x T with stride S = T - 2*halo; the scene is
reflect-padded bottom/right to a regular grid ((H'-T) % S == 0), so the
last row/col of tiles needs no clamping and blend weights sum to
exactly 1 everywhere (boundary tiles get flat-edged ramps). LrMS tiles
are (T/4) x (T/4) at stride S/4 — T, S, halo and the scene size must be
multiples of 4 so the two grids stay aligned. halo <= T/4 keeps the
overlap factor at 2 per axis, which lets the overlap-add run as two
group reshapes per axis instead of scatters.

The whole scene — tile extraction (`lax.map` of dynamic slices),
chunked batched fusion (`lax.map` over fixed-size tile batches),
ramp weighting, and the reshape overlap-add — compiles to ONE jitted
program per (method, scene-shape, tile, halo, batch) so a tunneled TPU
pays one dispatch per scene. Optionally the tile batch is sharded over
a mesh axis (data-parallel tiles; composes with `parallel.mesh`).

Cost model: tiling recomputes the halo overlap, a factor of (T/S)^2 —
1.78x for halo=16 at T=128, 1.31x for halo=8 — so the expected
large-scene throughput is (batched-tile MP/s) / (T/S)^2. Measured
(v5e, 8-band, fuse level 2, batch 96, `scripts/bench_scene.py`,
committed in `benchmarks/scene.json`): 2048^2 halo=8 16.95 MP/s /
halo=16 13.6 MP/s; 4096^2 halo=8 18.04 MP/s / halo=16 13.56 MP/s —
i.e. 2.0-2.7x the 6.7 MP/s whole-image path
(`benchmarks/large_tile.json`) and right on the cost model
(26.25 / 1.31 = 20 minus grid-padding waste).
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fuse_scene", "cosine_ramp_weights"]

SCALE = 4  # PAN/LrMS resolution ratio (reference contract)


def cosine_ramp_weights(n_tiles: int, tile: int, stride: int) -> np.ndarray:
    """Per-tile 1-D blend profiles, [n_tiles, tile] float32.

    Interior weight 1; over the `o = tile - stride` overlapped samples
    at each end a sin^2 ramp — adjacent tiles' ramps satisfy
    sin^2 + cos^2 = 1, so stacked weights sum to exactly 1. The first
    tile's leading edge and the last tile's trailing edge face the
    scene border (no partner), so those ramps are flattened to 1."""
    o = tile - stride
    w = np.ones(tile, np.float32)
    if o > 0:
        i = np.arange(o, dtype=np.float64) + 0.5
        ramp = np.sin(np.pi * i / (2 * o)) ** 2
        w[:o] = ramp
        w[tile - o:] = ramp[::-1]
    ws = np.tile(w, (n_tiles, 1))
    ws[0, :o] = 1.0
    ws[-1, tile - o:] = 1.0
    return ws


def _overlap_add_x(tiles, stride: int, out_w: int):
    """[ny, nx, T, T, C] -> [ny, T, out_w, C] overlap-add along x.

    Tiles within one parity group (x-index even / odd) are >= T apart
    (2*stride >= T), so each group lays out contiguously with a
    pad-to-2S reshape; the two groups are summed shifted by `stride`."""
    ny, nx, t, _, c = tiles.shape
    acc = None
    for r in range(min(2, nx)):
        sub = tiles[:, r::2]  # [ny, nr, T, T, C]
        nr = sub.shape[1]
        sub = jnp.pad(sub, ((0, 0), (0, 0), (0, 0), (0, 2 * stride - t),
                            (0, 0)))
        strip = sub.transpose(0, 2, 1, 3, 4).reshape(ny, t, nr * 2 * stride,
                                                     c)
        strip = jnp.pad(strip, ((0, 0), (0, 0), (r * stride, 0), (0, 0)))
        if strip.shape[2] < out_w:
            strip = jnp.pad(strip,
                            ((0, 0), (0, 0), (0, out_w - strip.shape[2]),
                             (0, 0)))
        else:
            strip = strip[:, :, :out_w]
        acc = strip if acc is None else acc + strip
    return acc


def _overlap_add_y(strips, stride: int, out_h: int):
    """[ny, T, W, C] -> [out_h, W, C] overlap-add along y."""
    ny, t, w, c = strips.shape
    acc = None
    for r in range(min(2, ny)):
        sub = strips[r::2]  # [nr, T, W, C]
        nr = sub.shape[0]
        sub = jnp.pad(sub, ((0, 0), (0, 2 * stride - t), (0, 0), (0, 0)))
        col = sub.reshape(nr * 2 * stride, w, c)
        col = jnp.pad(col, ((r * stride, 0), (0, 0), (0, 0)))
        if col.shape[0] < out_h:
            col = jnp.pad(col, ((0, out_h - col.shape[0]), (0, 0), (0, 0)))
        else:
            col = col[:out_h]
        acc = col if acc is None else acc + col
    return acc


def _extract(img, t: int, s: int, ny: int, nx: int):
    """[H, W, C] -> [ny*nx, t, t, C] strided tile extraction."""
    c = img.shape[-1]

    def get(i):
        y = (i // nx) * s
        x = (i % nx) * s
        return lax.dynamic_slice(img, (y, x, 0), (t, t, c))

    return lax.map(get, jnp.arange(ny * nx))


def _build_scene_fn(method, hw, chans, tile, halo, batch, mesh_axes):
    """One jitted PAN+LrMS -> HrMS program for a fixed scene geometry."""
    h, w = hw
    t_lr, stride = tile // SCALE, tile - 2 * halo
    ny = max(1, -(-(h - tile) // stride) + 1)
    nx = max(1, -(-(w - tile) // stride) + 1)
    hp, wp = (ny - 1) * stride + tile, (nx - 1) * stride + tile
    n = ny * nx
    n_pad = (-n) % batch
    wy = jnp.asarray(cosine_ramp_weights(ny, tile, stride))
    wx = jnp.asarray(cosine_ramp_weights(nx, tile, stride))

    def scene_fn(params, ms, pan):
        pan_p = jnp.pad(pan, ((0, hp - h), (0, wp - w), (0, 0)),
                        mode="reflect")
        ms_p = jnp.pad(ms, ((0, (hp - h) // SCALE), (0, (wp - w) // SCALE),
                            (0, 0)), mode="reflect")
        pan_t = _extract(pan_p, tile, stride, ny, nx)
        ms_t = _extract(ms_p, t_lr, stride // SCALE, ny, nx)
        if n_pad:
            pan_t = jnp.concatenate([pan_t, pan_t[:n_pad]], 0)
            ms_t = jnp.concatenate([ms_t, ms_t[:n_pad]], 0)
        pan_t = pan_t.reshape(-1, batch, tile, tile, 1)
        ms_t = ms_t.reshape(-1, batch, t_lr, t_lr, chans)

        def chunk(args):
            ms_c, pan_c = args
            if mesh_axes is not None:
                mesh, axis = mesh_axes
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(mesh, P(axis))
                ms_c = lax.with_sharding_constraint(ms_c, sh)
                pan_c = lax.with_sharding_constraint(pan_c, sh)
            return method.apply(params, {"input_lr": ms_c,
                                         "input_pan": pan_c})

        out = lax.map(chunk, (ms_t, pan_t)).reshape(-1, tile, tile, chans)
        out = out[:n].reshape(ny, nx, tile, tile, chans)
        out = out * wy[:, None, :, None, None] * wx[None, :, None, :, None]
        strips = _overlap_add_x(out, stride, wp)
        full = _overlap_add_y(strips, stride, hp)
        return full[:h, :w]

    return jax.jit(scene_fn)


_CACHE: "weakref.WeakKeyDictionary[object, dict]" = (
    weakref.WeakKeyDictionary())


def fuse_scene(method, params, ms, pan, *, tile: int = 128, halo: int = 16,
               batch: int = 32, mesh=None, mesh_axis: str = "data"):
    """Fuse one large scene: LrMS [h/4, w/4, C] + PAN [h, w, 1] ->
    HrMS [h, w, C], tiled through `method`'s batched fast path.

    tile/halo/batch: PAN-grid tile size, per-side blend halo
    (stride = tile - 2*halo), and tile batch per device dispatch.
    All of tile, halo and the scene size must be multiples of 4 (PAN to
    LrMS alignment), halo <= tile/4. `mesh` (optional) shards each tile
    batch over `mesh_axis` — data-parallel tiles over ICI."""
    ms = jnp.asarray(ms)
    pan = jnp.asarray(pan)
    if pan.ndim == 2:
        pan = pan[..., None]
    h, w = pan.shape[:2]
    if h % SCALE or w % SCALE or tile % SCALE or halo % SCALE:
        raise ValueError("scene, tile and halo must be multiples of 4")
    if not 0 <= halo <= tile // 4:
        raise ValueError("need 0 <= halo <= tile/4")
    if h < tile or w < tile:
        raise ValueError(f"scene {h}x{w} smaller than tile {tile}")
    if ms.shape[:2] != (h // SCALE, w // SCALE):
        raise ValueError(f"LrMS {ms.shape[:2]} does not match PAN/"
                         f"{SCALE} = {(h // SCALE, w // SCALE)}")
    if mesh is not None and batch % mesh.shape[mesh_axis]:
        raise ValueError("batch must divide by the mesh axis size")

    key = (h, w, int(ms.shape[-1]), tile, halo, batch,
           None if mesh is None else (id(mesh), mesh_axis))
    per_method = _CACHE.setdefault(method, {})
    fn = per_method.get(key)
    if fn is None:
        fn = _build_scene_fn(method, (h, w), int(ms.shape[-1]), tile, halo,
                             batch, None if mesh is None else (mesh,
                                                               mesh_axis))
        per_method[key] = fn
    return fn(params, ms, pan)
