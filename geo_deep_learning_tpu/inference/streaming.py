"""Streamed full-scene inference for scenes larger than host memory.

Extends the on-device sliding-window engine (inference/sliding_window.py —
a capability the reference lacks entirely; its workflows pre-tile scenes
offline, SURVEY.md §5) with banded streaming: the scene is processed in
horizontal bands of tile rows read through
``data/geotiff_stream.GeoTiffWindowReader``, and finished rows are
written incrementally through ``GeoTiffStripWriter``. Peak host memory is
one band (+ the overlap carry), independent of scene height.

Seam-exactness across bands: blending accumulators (weighted-logit and
weight canvases) for the rows shared between consecutive bands are
CARRIED — the final blend at any pixel sums exactly the same tile
contributions as the monolithic path, so outputs are bit-identical to
``predict_scene`` up to float summation order.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.inference.sliding_window import (
    SlidingWindowConfig,
    _accumulate_tiles,
    _blend_window,
    _tile_origins,
)


@partial(jax.jit, static_argnames=("forward", "tile", "batch_size", "num_classes"))
def _band_acc(
    forward, params, scene, coords, valid, window, tile, batch_size, num_classes
):
    fwd = forward if params is None else (lambda tiles: forward(params, tiles))
    return _accumulate_tiles(
        fwd, scene, coords, valid, window, tile, batch_size, num_classes
    )


@partial(
    jax.jit,
    static_argnames=(
        "forward", "tile", "batch_size", "num_classes", "mesh", "use_params"
    ),
)
def _band_acc_sharded(
    forward, params, scene, coords, valid, window,
    tile, batch_size, num_classes, mesh, use_params,
):
    """Data-parallel band accumulation: the band's tiles are striped over
    the mesh's data axis (scene replicated), local canvases are psummed
    over ICI, and the UNBLENDED (acc, wsum) pair is returned so the
    caller can carry the cross-band overlap rows."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from geo_deep_learning_tpu.core.mesh import DATA_AXIS

    def body(params_l, scene_l, coords_l, valid_l, window_l):
        fwd = (lambda t: forward(params_l, t)) if use_params else forward
        acc, wsum = _accumulate_tiles(
            fwd, scene_l, coords_l, valid_l, window_l,
            tile, batch_size, num_classes,
        )
        return (
            jax.lax.psum(acc, DATA_AXIS),
            jax.lax.psum(wsum, DATA_AXIS),
        )

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(params, scene, coords, valid, window)


def streamed_scene_logits_writer(
    forward: Callable,
    reader,
    writer_fn: Callable[[int, np.ndarray], None],
    num_classes: int,
    config: SlidingWindowConfig | None = None,
    params=None,
    band_tile_rows: int = 4,
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
    mesh=None,
) -> None:
    """Core band streamer.

    Args:
        reader: object with ``height``/``width`` attributes and
            ``read_rows(row0, nrows) -> [nrows, W, C]``.
        writer_fn: called as ``writer_fn(row0, blended_logits_rows)`` with
            finished (fully blended) f32 logit rows, in order.
        band_tile_rows: tile rows per band; band memory ~=
            ``(tile + (band_tile_rows-1)*stride) * W``.
        mesh: optional device mesh — each band's tiles are striped over
            the data axis (BASELINE.json config #5 combined with banded
            streaming: scene size bounded by neither HBM nor host memory).
    """
    cfg = config or SlidingWindowConfig()
    tile, overlap, bs = cfg.tile_size, cfg.overlap, cfg.batch_size
    stride = tile - overlap
    h, w = reader.height, reader.width
    pad_w = max(tile - w, 0)
    wp = w + pad_w
    rows = _tile_origins(h, tile, stride)          # global tile-row origins
    cols = _tile_origins(wp, tile, stride)
    window = jnp.asarray(_blend_window(tile, cfg.blend, cfg.overlap))
    band_h = tile + (band_tile_rows - 1) * stride  # fixed → one compiled program
    max_tiles = band_tile_rows * len(cols)
    n_data = 1
    if mesh is not None:
        from geo_deep_learning_tpu.core.mesh import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
    n_pad_to = -(-max_tiles // (bs * n_data)) * (bs * n_data)

    carry_acc = np.zeros((0, wp, num_classes), np.float32)
    carry_w = np.zeros((0, wp, 1), np.float32)
    done = 0
    for g0 in range(0, len(rows), band_tile_rows):
        group = rows[g0 : g0 + band_tile_rows]
        r0 = int(group[0])
        # rows this band's tiles cover; read (clamped) and zero-pad to band_h
        nrows = min(band_h, h - r0)
        block = reader.read_rows(r0, nrows).astype(np.float32)
        if preprocess is not None:
            block = preprocess(block)
        if pad_w:
            # reflect, matching the monolithic _plan_tiles small-scene pad
            block = np.pad(
                block, ((0, 0), (0, pad_w), (0, 0)), mode="reflect"
            )
        if nrows < band_h:
            # scenes shorter than one tile: the single clamped tile DOES
            # cover padded rows, so reflect exactly like the monolithic
            # _plan_tiles (bit-identity); rows beyond the tile are
            # touched by no valid tile and the fill mode is irrelevant
            reflect_rows = min(max(tile - nrows, 0), band_h - nrows)
            if reflect_rows:
                block = np.pad(
                    block, ((0, reflect_rows), (0, 0), (0, 0)), mode="reflect"
                )
            rest = band_h - nrows - reflect_rows
            if rest:
                block = np.pad(
                    block, ((0, rest), (0, 0), (0, 0)), mode="edge"
                )
        coords = np.array(
            [(int(r) - r0, int(c)) for r in group for c in cols], np.int32
        )
        n = len(coords)
        if n < n_pad_to:
            coords = np.concatenate(
                [coords, np.zeros((n_pad_to - n, 2), np.int32)]
            )
        valid = np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad_to - n, np.float32)]
        )
        if mesh is not None:
            # stripe tiles over devices so work stays balanced even when
            # the tail is padding
            order = np.arange(n_pad_to).reshape(-1, n_data).T.reshape(-1)
            acc, wsum = _band_acc_sharded(
                forward,
                {} if params is None else params,
                jnp.asarray(block),
                jnp.asarray(coords[order]),
                jnp.asarray(valid[order]),
                window,
                tile,
                bs,
                num_classes,
                mesh,
                params is not None,
            )
        else:
            acc, wsum = _band_acc(
                forward,
                params,
                jnp.asarray(block),
                jnp.asarray(coords),
                jnp.asarray(valid),
                window,
                tile,
                bs,
                num_classes,
            )
        acc = np.array(acc)   # np.array (not asarray): device buffers are
        wsum = np.array(wsum)  # read-only views; the carry merge mutates
        # merge the carried overlap rows (rows [r0, done_prev_end))
        if carry_acc.shape[0]:
            k = carry_acc.shape[0]
            acc[:k] += carry_acc
            wsum[:k] += carry_w
        # rows no later tile can touch are final
        last_band = g0 + band_tile_rows >= len(rows)
        final_upto = h if last_band else int(rows[g0 + band_tile_rows])
        blended = (
            acc[done - r0 : final_upto - r0]
            / np.maximum(wsum[done - r0 : final_upto - r0], 1e-8)
        )
        writer_fn(done, blended[:, :w])
        if not last_band:
            keep0 = final_upto - r0
            kept = min(r0 + band_h, h) - final_upto
            carry_acc = acc[keep0 : keep0 + kept].copy()
            carry_w = wsum[keep0 : keep0 + kept].copy()
        done = final_upto
    assert done == h, (done, h)


def predict_scene_streamed(
    forward: Callable,
    scene_path: str,
    output_path: str,
    num_classes: int,
    config: SlidingWindowConfig | None = None,
    mean: np.ndarray | None = None,
    std: np.ndarray | None = None,
    threshold: float = 0.5,
    params=None,
    band_tile_rows: int = 4,
    compress: str | None = "deflate",
    mesh=None,
) -> str:
    """Streamed twin of ``sliding_window.predict_scene``: same per-pixel
    result, but scene reads, inference, and class-map writes proceed in
    bands so arbitrarily tall scenes fit in host memory."""
    from geo_deep_learning_tpu.data.geotiff import GeoInfo
    from geo_deep_learning_tpu.data.geotiff_stream import (
        GeoTiffStripWriter,
        GeoTiffWindowReader,
    )

    mean_a = None if mean is None else np.asarray(mean, np.float32)
    std_a = None if std is None else np.asarray(std, np.float32)

    def preprocess(block: np.ndarray) -> np.ndarray:
        x = block / 255.0
        if mean_a is not None:
            x = (x - mean_a) / std_a
        return x

    with GeoTiffWindowReader(scene_path) as reader:
        geo = reader.geo
        writer = GeoTiffStripWriter(
            output_path,
            reader.width,
            1,
            np.uint8,
            geo=GeoInfo(transform=geo.transform, epsg=geo.epsg),
            compress=compress,
        )

        def write_rows(row0: int, logits: np.ndarray) -> None:
            if num_classes == 1:
                pred = (
                    1.0 / (1.0 + np.exp(-logits[..., 0])) > threshold
                ).astype(np.uint8)
            else:
                pred = np.argmax(logits, axis=-1).astype(np.uint8)
            writer.write_rows(pred)

        try:
            streamed_scene_logits_writer(
                forward,
                reader,
                write_rows,
                num_classes,
                config,
                params=params,
                band_tile_rows=band_tile_rows,
                preprocess=preprocess,
                mesh=mesh,
            )
        finally:
            writer.close()
    return output_path
