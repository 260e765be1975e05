"""Sliding-window full-scene inference with overlap blending.

A capability the reference does NOT have (SURVEY.md §5 long-context: the
reference pre-tiles scenes offline and its ScriptModel handles single
patches) — BASELINE.json's north star adds it: tile a full scene on
device, run the model over tiles, and blend overlapping logits back into
a seamless scene-sized map, then stitch to a georeferenced raster.

TPU-native design:
- The scene lives in HBM once; tiles are gathered with
  ``lax.dynamic_slice`` inside a ``lax.scan`` — no host round-trips per
  tile, one compiled program for the whole scene.
- Tiles are batched (``batch_size``) so the model forward keeps the MXU
  busy; the tile grid is padded to a whole number of batches and the pad
  tiles' contributions are masked out.
- Overlap blending uses a separable cosine (Hann-window) taper, the
  standard seam-suppression weighting (PAPERS.md: "Tiling and Stitching
  Segmentation Output for Remote Sensing").
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SlidingWindowConfig:
    tile_size: int = 512
    overlap: int = 128
    batch_size: int = 8
    blend: str = "hann"  # "hann" | "uniform" | "crop"


def _tile_origins(size: int, tile: int, stride: int) -> np.ndarray:
    """1-D tile start offsets; the last tile is clamped to the edge."""
    if size <= tile:
        return np.array([0])
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return np.array(starts)


def _blend_window(tile: int, kind: str, overlap: int = 0) -> np.ndarray:
    if kind == "uniform":
        return np.ones((tile, tile), dtype=np.float32)
    if kind == "crop":
        # Receptive-field-aware core cropping (ROADMAP halo-exchange item):
        # a pixel in a tile's outer margin saw context truncated at the
        # tile edge, so its prediction is unreliable for models whose
        # receptive field exceeds the overlap. Weight the core
        # [m, tile-m) at 1.0 and the margin at a 1e-3 floor: with
        # m = overlap // 2 and stride = tile - overlap, the cores tile
        # the scene interior exactly (every interior pixel gets >= 1
        # full-context prediction and margin contributions vanish by
        # 3 orders of magnitude), while scene-border pixels — which no
        # core can cover — still receive the floored margin predictions.
        m = overlap // 2
        w = np.full(tile, 1e-3, dtype=np.float32)
        w[m : tile - m] = 1.0
        return np.outer(w, w).astype(np.float32)
    # Hann taper, floored so edge tiles still contribute at scene borders
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
    w2 = np.outer(w, w).astype(np.float32)
    return np.maximum(w2, 1e-3)


def _accumulate_tiles(
    forward: Callable,
    scene: jnp.ndarray,
    coords: jnp.ndarray,  # [N_pad, 2] (row, col) origins; pad rows = (0, 0)
    valid: jnp.ndarray,  # [N_pad] 1.0 for real tiles
    window: jnp.ndarray,  # [tile, tile]
    tile: int,
    batch_size: int,
    num_classes: int,
):
    """Accumulate weighted logits + weights over a tile list (one device)."""
    h, w = scene.shape[0], scene.shape[1]
    acc = jnp.zeros((h, w, num_classes), dtype=jnp.float32)
    wsum = jnp.zeros((h, w, 1), dtype=jnp.float32)
    n_batches = coords.shape[0] // batch_size
    coords_b = coords.reshape(n_batches, batch_size, 2)
    valid_b = valid.reshape(n_batches, batch_size)

    def gather_tile(rc):
        return jax.lax.dynamic_slice(
            scene, (rc[0], rc[1], 0), (tile, tile, scene.shape[2])
        )

    def body(carry, inputs):
        acc, wsum = carry
        rcs, vs = inputs
        tiles = jax.vmap(gather_tile)(rcs)  # [B, t, t, C]
        logits = forward(tiles).astype(jnp.float32)  # [B, t, t, K]
        wtile = window[None, :, :, None] * vs[:, None, None, None]
        contrib = logits * wtile

        def scatter(i, carry):
            acc, wsum = carry
            r, c = rcs[i, 0], rcs[i, 1]
            cur = jax.lax.dynamic_slice(acc, (r, c, 0), (tile, tile, num_classes))
            acc = jax.lax.dynamic_update_slice(acc, cur + contrib[i], (r, c, 0))
            curw = jax.lax.dynamic_slice(wsum, (r, c, 0), (tile, tile, 1))
            wsum = jax.lax.dynamic_update_slice(
                wsum, curw + wtile[i, :, :, :1], (r, c, 0)
            )
            return acc, wsum

        acc, wsum = jax.lax.fori_loop(0, batch_size, scatter, (acc, wsum))
        return (acc, wsum), None

    (acc, wsum), _ = jax.lax.scan(body, (acc, wsum), (coords_b, valid_b))
    return acc, wsum


@partial(jax.jit, static_argnames=("forward", "tile", "batch_size", "num_classes"))
def _scan_tiles(
    forward: Callable,
    scene: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    window: jnp.ndarray,
    tile: int,
    batch_size: int,
    num_classes: int,
):
    acc, wsum = _accumulate_tiles(
        forward, scene, coords, valid, window, tile, batch_size, num_classes
    )
    return acc / jnp.maximum(wsum, 1e-8)


@partial(jax.jit, static_argnames=("forward", "tile", "batch_size", "num_classes"))
def _scan_tiles_with_params(
    forward: Callable,
    params,
    scene: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    window: jnp.ndarray,
    tile: int,
    batch_size: int,
    num_classes: int,
):
    """Params-threading variant: ``params`` is a traced pytree ARGUMENT,
    not a closure constant. Closing model weights over ``forward`` inlines
    them as HLO literals — at DOFA-base size (~440 MB f32) that overflows
    compile-RPC limits and bloats every compile; passing them here keeps
    the program small and the weights in HBM."""
    acc, wsum = _accumulate_tiles(
        lambda tiles: forward(params, tiles),
        scene, coords, valid, window, tile, batch_size, num_classes,
    )
    return acc / jnp.maximum(wsum, 1e-8)


def _plan_tiles(scene, cfg: SlidingWindowConfig, multiple: int):
    """Pad the scene to ≥1 tile, build the tile-origin list padded to a
    multiple of ``multiple`` with a validity mask."""
    tile = cfg.tile_size
    h, w = scene.shape[0], scene.shape[1]
    pad_h = max(tile - h, 0)
    pad_w = max(tile - w, 0)
    if pad_h or pad_w:
        scene = jnp.pad(
            jnp.asarray(scene), ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect"
        )
    hp, wp = scene.shape[0], scene.shape[1]
    stride = tile - cfg.overlap
    rows = _tile_origins(hp, tile, stride)
    cols = _tile_origins(wp, tile, stride)
    coords = np.array([(r, c) for r in rows for c in cols], dtype=np.int32)
    n = len(coords)
    n_pad = -(-n // multiple) * multiple - n
    if n_pad:
        coords = np.concatenate([coords, np.zeros((n_pad, 2), np.int32)])
    valid = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    window = jnp.asarray(_blend_window(tile, cfg.blend, cfg.overlap))
    return scene, coords, valid, window, h, w


def sliding_window_logits(
    forward: Callable,
    scene: np.ndarray | jnp.ndarray,
    num_classes: int,
    config: SlidingWindowConfig | None = None,
    params=None,
) -> jnp.ndarray:
    """Blend model logits over a full scene.

    ``forward`` maps a tile batch [B, t, t, C] → logits [B, t, t, K]
    (normalization should be folded inside). ``scene`` is HWC. Returns
    blended logits [H, W, K].

    For real model weights, pass them via ``params`` and make ``forward``
    take ``(params, tiles)`` — weights closed over ``forward`` are inlined
    into the compiled program as constants (440 MB of HLO literals for
    DOFA-base, enough to overflow compile-service request limits).
    """
    cfg = config or SlidingWindowConfig()
    scene, coords, valid, window, h, w = _plan_tiles(scene, cfg, cfg.batch_size)
    args = (
        jnp.asarray(scene),
        jnp.asarray(coords),
        jnp.asarray(valid),
        window,
        cfg.tile_size,
        cfg.batch_size,
        num_classes,
    )
    if params is None:
        out = _scan_tiles(forward, *args)
    else:
        out = _scan_tiles_with_params(forward, params, *args)
    return out[:h, :w]


def sliding_window_logits_sharded(
    forward: Callable,
    scene: np.ndarray | jnp.ndarray,
    num_classes: int,
    mesh,
    config: SlidingWindowConfig | None = None,
    params=None,
) -> jnp.ndarray:
    """Data-parallel scene inference over a device mesh.

    BASELINE.json config #5 ("full-scene sliding-window tiled inference,
    data-parallel over a v5e mesh"): the tile list is striped across the
    mesh's data axis; each device accumulates a local weighted canvas from
    its tiles (the scene is replicated in HBM), and one ``psum`` over ICI
    merges the canvases before blending. The model forward — the
    expensive part — runs fully parallel. Pass model weights via
    ``params`` (forward then takes ``(params, tiles)``) to keep them out
    of the compiled program — see :func:`sliding_window_logits`.
    """
    from geo_deep_learning_tpu.core.mesh import DATA_AXIS

    cfg = config or SlidingWindowConfig()
    n_data = mesh.shape[DATA_AXIS]
    scene, coords, valid, window, h, w = _plan_tiles(
        scene, cfg, cfg.batch_size * n_data
    )
    # stripe tiles over devices: device d gets coords[d::n_data] so work
    # stays balanced even when the tail is padding
    order = np.arange(len(coords)).reshape(-1, n_data).T.reshape(-1)
    coords = coords[order]
    valid = valid[order]

    out = _sharded_run(
        forward,
        {} if params is None else params,
        jnp.asarray(scene),
        jnp.asarray(coords),
        jnp.asarray(valid),
        window,
        cfg.tile_size,
        cfg.batch_size,
        num_classes,
        mesh,
        params is not None,
    )
    return out[:h, :w]


@partial(
    jax.jit,
    static_argnames=(
        "forward", "tile", "batch_size", "num_classes", "mesh", "use_params"
    ),
)
def _sharded_run(
    forward, params, scene, coords, valid, window,
    tile, batch_size, num_classes, mesh, use_params,
):
    """Module-level jit (stable cache across calls) with the weights as a
    traced, mesh-replicated argument — see ``_scan_tiles_with_params``."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from geo_deep_learning_tpu.core.mesh import DATA_AXIS

    def body(params_l, scene_l, coords_l, valid_l, window_l):
        fwd = (lambda t: forward(params_l, t)) if use_params else forward
        acc, wsum = _accumulate_tiles(
            fwd, scene_l, coords_l, valid_l, window_l,
            tile, batch_size, num_classes,
        )
        acc = jax.lax.psum(acc, DATA_AXIS)
        wsum = jax.lax.psum(wsum, DATA_AXIS)
        return acc / jnp.maximum(wsum, 1e-8)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )(params, scene, coords, valid, window)


def predict_scene(
    forward: Callable,
    scene_path: str,
    output_path: str,
    num_classes: int,
    config: SlidingWindowConfig | None = None,
    mean: np.ndarray | None = None,
    std: np.ndarray | None = None,
    threshold: float = 0.5,
    params=None,
) -> str:
    """Read a georeferenced scene, run tiled inference, write the class map
    back as a GeoTIFF with the source's transform/CRS."""
    from geo_deep_learning_tpu.data.geotiff import GeoInfo, read_geotiff, write_geotiff

    scene, geo = read_geotiff(scene_path)
    x = scene.astype(np.float32) / 255.0
    if mean is not None:
        x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    logits = sliding_window_logits(forward, x, num_classes, config, params=params)
    if num_classes == 1:
        preds = (jax.nn.sigmoid(logits[..., 0]) > threshold).astype(jnp.uint8)
    else:
        preds = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    write_geotiff(
        output_path,
        np.asarray(preds),
        GeoInfo(transform=geo.transform, epsg=geo.epsg),
    )
    return output_path
