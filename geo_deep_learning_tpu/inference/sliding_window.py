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


def _plan_bands(scene, cfg: SlidingWindowConfig, n_data: int):
    """Host-side planning for the halo-exchange banded path.

    Partitions the crop-blend tile grid's ROWS into contiguous blocks
    (one per device) so per-device tile sets are disjoint, and derives
    the uniform band/strip geometry the shard_map body needs. Returns
    None in the rare clamped-last-row geometry where a tile row overlaps
    a NON-adjacent row (adjacent-neighbor exchange could not be exact;
    callers fall back to the replicated-scene psum path).
    """
    tile = cfg.tile_size
    stride = tile - cfg.overlap
    m = cfg.overlap // 2
    h, w = scene.shape[0], scene.shape[1]
    pad_h = max(tile - h, 0)
    pad_w = max(tile - w, 0)
    if pad_h or pad_w:
        scene = jnp.pad(
            jnp.asarray(scene), ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect"
        )
    hp, wp = scene.shape[0], scene.shape[1]
    rows = _tile_origins(hp, tile, stride)
    cols = _tile_origins(wp, tile, stride)
    nrows = len(rows)
    # Rows whose tiles TRIPLE-overlap (the edge-clamped last row commonly
    # does) must share a block: a boundary through a 3-cover region would
    # regroup that pixel's f32 sum and break bit-identity.
    join = [False] * max(nrows - 1, 0)
    for i in range(nrows - 2):
        if rows[i + 2] - rows[i] < tile:
            join[i] = join[i + 1] = True
    units: list[int] = []  # row count per indivisible unit
    run = 1
    for i in range(nrows - 1):
        if join[i]:
            run += 1
        else:
            units.append(run)
            run = 1
    if nrows:
        units.append(run)
    # contiguous unit groups, one per device, balanced by row count
    counts = [0] * n_data
    d, acc_rows = 0, 0
    remaining = nrows
    for j, u in enumerate(units):
        # move to the next device when this one reached its fair share
        # (always keep at least one unit per started device)
        fair = -(-remaining // (n_data - d))
        if counts[d] and acc_rows + u > fair and d < n_data - 1:
            remaining -= acc_rows
            d, acc_rows = d + 1, 0
        counts[d] += u
        acc_rows += u
    starts = np.cumsum([0] + counts[:-1])
    # ownership boundaries: block d starts owning at rows[first_d] + m
    # (crop cores tile the interior exactly at stride = tile - overlap)
    bounds = [0]
    for d in range(1, n_data):
        if counts[d] > 0:
            bounds.append(int(rows[starts[d]]) + m)
        else:
            bounds.append(hp)
    bounds.append(hp)
    # uniform band height; per-device start clamped into the scene
    lo, hi = [], []
    for d in range(n_data):
        if counts[d] > 0:
            lo.append(int(rows[starts[d]]))
            hi.append(int(rows[starts[d] + counts[d] - 1]) + tile)
        else:
            lo.append(0)
            hi.append(tile)
    # adjacent-only exchange feasibility: a block's tiles must not reach
    # beyond its immediate neighbors' own spans (can only trip in exotic
    # clamped geometries the unit merge didn't co-locate)
    for d in range(n_data):
        if counts[d] == 0:
            continue
        if d + 2 < len(bounds) and hi[d] > bounds[d + 2]:
            return None
        if d >= 1 and lo[d] < bounds[d - 1]:
            return None
    band_h = max(b - a for a, b in zip(lo, hi))
    lo = [min(a, hp - band_h) for a in lo]
    # strip height: how far any block's tiles reach beyond its own span
    s_up = max(
        (bounds[d] - lo[d]) if counts[d] else 0 for d in range(n_data)
    )
    s_dn = max(
        (hi[d] - bounds[d + 1]) if counts[d] else 0 for d in range(n_data)
    )
    strip = max(int(s_up), int(s_dn), 1)
    # per-device local tile coords, padded to a uniform count
    per_dev = []
    for d in range(n_data):
        rcs = [
            (int(r) - lo[d], int(c))
            for r in rows[starts[d] : starts[d] + counts[d]]
            for c in cols
        ]
        per_dev.append(rcs)
    n_loc = max(len(p) for p in per_dev)
    n_loc = -(-n_loc // cfg.batch_size) * cfg.batch_size
    coords = np.zeros((n_data, n_loc, 2), np.int32)
    valid = np.zeros((n_data, n_loc), np.float32)
    for d, rcs in enumerate(per_dev):
        if rcs:
            coords[d, : len(rcs)] = np.asarray(rcs, np.int32)
            valid[d, : len(rcs)] = 1.0
    own_h = np.asarray(
        [bounds[d + 1] - bounds[d] for d in range(n_data)], np.int32
    )
    own_start = np.where(
        own_h > 0,
        np.asarray(bounds[:-1], np.int32) - np.asarray(lo, np.int32),
        0,
    ).astype(np.int32)
    meta = {
        "lo": np.asarray(lo, np.int32),
        "own_start": own_start,
        "own_h": own_h,
        "own_h_max": int(own_h.max()),
        "band_h": int(band_h),
        "strip": strip,
        "hp": hp,
        "wp": wp,
    }
    window = jnp.asarray(_blend_window(tile, "crop", cfg.overlap))
    return scene, coords, valid, window, meta, h, w


def sliding_window_logits_halo(
    forward: Callable,
    scene: np.ndarray | jnp.ndarray,
    num_classes: int,
    mesh,
    config: SlidingWindowConfig | None = None,
    params=None,
) -> jnp.ndarray:
    """Banded scene inference with ICI halo exchange (``blend='crop'``).

    :func:`sliding_window_logits_sharded` replicates the scene on every
    device and psums a full-resolution canvas. Here the scene lives
    SHARDED: each device holds only its horizontal band of tiles (core
    rows + the crop halo), the per-device tile sets are disjoint
    (contiguous blocks of the global tile-row grid), and only
    fixed-height boundary strips of accumulated (logits, weights) move
    between neighbors via ``ppermute`` over ICI. Per-device HBM scales
    as H/n_data instead of H. Exactness contract: every output pixel
    receives exactly the same f32 terms as the single-device
    ``blend='crop'`` path; pixels outside the exchanged boundary strips
    are BIT-IDENTICAL (their full addition chain is local), and strip
    pixels regroup the chain as (lower-block partial) + (upper-block
    partial) — bit-identical too when one side holds a single term
    (e.g. single-column overlap), otherwise equal to f32 reassociation
    (~1e-7 relative). Tile rows whose tiles triple-overlap (the
    edge-clamped last row) are co-located in one block so no boundary
    ever splits a 3-cover region.

    Scaling analog of the reference's DP inference (BASELINE.json #5)
    redesigned for larger-than-HBM scenes over a mesh.
    """
    from geo_deep_learning_tpu.core.mesh import DATA_AXIS

    cfg = config or SlidingWindowConfig()
    if cfg.blend != "crop":
        raise ValueError("halo-exchange path requires blend='crop'")
    n_data = mesh.shape[DATA_AXIS]
    plan = _plan_bands(scene, cfg, n_data)
    if plan is None:
        return sliding_window_logits_sharded(
            forward, scene, num_classes, mesh, config=cfg, params=params
        )
    scene_p, coords, valid, window, meta, h, w = plan
    # stack per-device bands host-side; each device receives ONLY its band
    bands = np.stack(
        [np.asarray(scene_p[a : a + meta["band_h"]]) for a in meta["lo"]]
    )
    out = _halo_run(
        forward,
        {} if params is None else params,
        jnp.asarray(bands.reshape(-1, *bands.shape[2:])),  # [n*Bh, W, C]
        jnp.asarray(coords.reshape(-1, 2)),
        jnp.asarray(valid.reshape(-1)),
        window,
        jnp.asarray(meta["own_start"]),  # own start, band-local
        jnp.asarray(meta["own_h"]),
        cfg.tile_size,
        cfg.batch_size,
        num_classes,
        mesh,
        params is not None,
        meta["band_h"],
        meta["strip"],
        meta["own_h_max"],
    )
    # reassemble: device d contributed rows [0, own_h[d]) of its chunk
    pieces = []
    out = np.asarray(out)
    for d in range(n_data):
        pieces.append(out[d * meta["own_h_max"] :][: meta["own_h"][d]])
    stitched = np.concatenate(pieces, axis=0)
    return jnp.asarray(stitched[:h, :w])


@partial(
    jax.jit,
    static_argnames=(
        "forward", "tile", "batch_size", "num_classes", "mesh",
        "use_params", "band_h", "strip", "own_h_max",
    ),
)
def _halo_run(
    forward, params, bands, coords, valid, window, own_start, own_h,
    tile, batch_size, num_classes, mesh, use_params, band_h, strip,
    own_h_max,
):
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from geo_deep_learning_tpu.core.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    up = [(d, d - 1) for d in range(1, n_data)]
    dn = [(d, d + 1) for d in range(n_data - 1)]

    def body(params_l, band, coords_l, valid_l, window_l, ostart, oh):
        fwd = (lambda t: forward(params_l, t)) if use_params else forward
        acc, wsum = _accumulate_tiles(
            fwd, band[0], coords_l[0], valid_l[0], window_l,
            tile, batch_size, num_classes,
        )
        ostart = ostart[0, 0]
        oh = oh[0, 0]
        aw = jnp.concatenate([acc, wsum], axis=-1)  # [band_h, W, K+1]
        # pad the canvas so every strip slice below is in bounds without
        # clamping (clamped dynamic_slice would silently misalign strips);
        # padded-local row p  ==  band-local row p - strip
        awp = jnp.pad(
            aw, ((strip, strip + own_h_max), (0, 0), (0, 0))
        )
        # rows [B_d - strip, B_d) of my canvas belong to the UPPER
        # neighbor (my tiles' top margin); rows [B_{d+1}, B_{d+1}+strip)
        # to the LOWER one. Padded-local starts: ostart and
        # ostart + oh + 2*strip - strip = ostart + oh + strip.
        send_up = jax.lax.dynamic_slice_in_dim(awp, ostart, strip, axis=0)
        send_dn = jax.lax.dynamic_slice_in_dim(
            awp, ostart + oh + strip, strip, axis=0
        )
        recv_dn = jax.lax.ppermute(send_up, DATA_AXIS, up)  # from below
        recv_up = jax.lax.ppermute(send_dn, DATA_AXIS, dn)  # from above
        # recv_up covers my first `strip` owned rows (padded-local
        # ostart + strip); recv_dn my last `strip` (padded-local
        # ostart + oh). Adding the neighbor's partial sum to mine is a
        # 2-term IEEE addition — commutative, so the result is
        # bit-identical to the global row-major scan's grouping.
        cur = jax.lax.dynamic_slice_in_dim(
            awp, ostart + strip, strip, axis=0
        )
        awp = jax.lax.dynamic_update_slice_in_dim(
            awp, cur + recv_up, ostart + strip, axis=0
        )
        cur = jax.lax.dynamic_slice_in_dim(awp, ostart + oh, strip, axis=0)
        awp = jax.lax.dynamic_update_slice_in_dim(
            awp, cur + recv_dn, ostart + oh, axis=0
        )
        out = awp[..., :num_classes] / jnp.maximum(
            awp[..., num_classes:], 1e-8
        )
        own = jax.lax.dynamic_slice_in_dim(
            out, ostart + strip, own_h_max, axis=0
        )
        return own[None]

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(),
            P(DATA_AXIS), P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(
        params,
        bands.reshape(-1, band_h, bands.shape[-2], bands.shape[-1]),
        coords.reshape(-1, coords.shape[-1]).reshape(
            mesh.shape[DATA_AXIS], -1, 2
        ),
        valid.reshape(mesh.shape[DATA_AXIS], -1),
        window,
        own_start.reshape(-1, 1),
        own_h.reshape(-1, 1),
    ).reshape(-1, bands.shape[-2], num_classes)


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
