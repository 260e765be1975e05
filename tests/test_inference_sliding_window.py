"""Sliding-window inference tests: blending correctness + geo stitching."""

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.data.geotiff import Affine, GeoInfo, read_geotiff, write_geotiff
from geo_deep_learning_tpu.inference import (
    SlidingWindowConfig,
    predict_scene,
    sliding_window_logits,
)


def test_identity_model_reconstructs_scene():
    """With a per-pixel identity 'model', blending must reproduce the scene
    exactly regardless of tiling/overlap — the core blending invariant."""
    rng = np.random.default_rng(0)
    scene = rng.normal(size=(70, 90, 3)).astype(np.float32)

    def forward(tiles):
        return tiles  # logits = input channels

    out = sliding_window_logits(
        forward,
        scene,
        num_classes=3,
        config=SlidingWindowConfig(tile_size=32, overlap=16, batch_size=4),
    )
    np.testing.assert_allclose(np.asarray(out), scene, atol=1e-4)


def test_uniform_blend_and_small_scene():
    scene = np.ones((20, 20, 1), dtype=np.float32)

    def forward(tiles):
        return tiles * 2.0

    out = sliding_window_logits(
        forward,
        scene,
        num_classes=1,
        config=SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2, blend="uniform"),
    )
    assert out.shape == (20, 20, 1)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_seam_consistency_with_nonlinear_model():
    """A conv-like model sees different context per tile; blended output
    must still be smooth (no hard seams): check against large-overlap run."""
    rng = np.random.default_rng(1)
    scene = rng.normal(size=(64, 64, 2)).astype(np.float32)

    def forward(tiles):
        k = jnp.ones((5, 5, 2, 2)) / 50.0
        return jax.lax.conv_general_dilated(
            tiles, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    a = sliding_window_logits(
        forward, scene, 2, SlidingWindowConfig(tile_size=32, overlap=16, batch_size=2)
    )
    b = sliding_window_logits(
        forward, scene, 2, SlidingWindowConfig(tile_size=64, overlap=0, batch_size=1)
    )
    # interior agreement (borders differ due to conv padding context)
    np.testing.assert_allclose(
        np.asarray(a)[8:-8, 8:-8], np.asarray(b)[8:-8, 8:-8], atol=0.05
    )


def test_predict_scene_writes_georeferenced_output(tmp_path):
    rng = np.random.default_rng(2)
    scene = rng.integers(0, 255, (48, 40, 3)).astype(np.uint8)
    geo = GeoInfo(Affine(0.5, 0, 500.0, 0, -0.5, 900.0), epsg=32617)
    sp = tmp_path / "scene.tif"
    write_geotiff(sp, scene, geo)

    def forward(tiles):
        # 2-class "model": class 1 where mean channel is positive after norm
        score = tiles.mean(axis=-1, keepdims=True)
        return jnp.concatenate([-score, score], axis=-1)

    out = predict_scene(
        forward,
        str(sp),
        str(tmp_path / "pred.tif"),
        num_classes=2,
        config=SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2),
        mean=np.array([0.5, 0.5, 0.5]),
        std=np.array([0.25, 0.25, 0.25]),
    )
    pred, pgeo = read_geotiff(out)
    assert pred.shape == (48, 40, 1)
    assert pgeo.epsg == 32617
    np.testing.assert_allclose(pgeo.transform.to_tuple(), geo.transform.to_tuple())
    assert set(np.unique(pred)).issubset({0, 1})


def test_sharded_matches_single_device():
    """Mesh-parallel tiled inference must equal the single-device result."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import sliding_window_logits_sharded

    rng = np.random.default_rng(5)
    scene = rng.normal(size=(70, 90, 3)).astype(np.float32)

    def forward(tiles):
        k = jnp.ones((3, 3, 3, 2)) / 27.0
        return jax.lax.conv_general_dilated(
            tiles, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    cfg = SlidingWindowConfig(tile_size=32, overlap=16, batch_size=2)
    single = sliding_window_logits(forward, scene, 2, cfg)
    mesh = create_mesh(MeshConfig())
    sharded = sliding_window_logits_sharded(forward, scene, 2, mesh, cfg)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-4)


def test_params_threading_matches_closure():
    """params= variant must equal the closure variant (and keeps weights
    out of the compiled program as constants)."""
    import jax

    from geo_deep_learning_tpu.inference.sliding_window import (
        SlidingWindowConfig,
        sliding_window_logits,
    )

    w = jax.random.normal(jax.random.PRNGKey(3), (3, 4), jnp.float32)

    def fwd_closure(tiles):
        return jnp.einsum("bhwc,ck->bhwk", tiles, w)

    def fwd_params(params, tiles):
        return jnp.einsum("bhwc,ck->bhwk", tiles, params["w"])

    scene = np.random.default_rng(0).normal(size=(70, 90, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2)
    a = sliding_window_logits(fwd_closure, scene, 4, cfg)
    b = sliding_window_logits(fwd_params, scene, 4, cfg, params={"w": w})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_params_threading_matches():
    """Sharded variant with params= equals the closure form."""
    import jax

    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import sliding_window_logits_sharded

    w = jax.random.normal(jax.random.PRNGKey(9), (3, 5), jnp.float32)

    def fwd_closure(tiles):
        return jnp.einsum("bhwc,ck->bhwk", tiles, w)

    def fwd_params(params, tiles):
        return jnp.einsum("bhwc,ck->bhwk", tiles, params["w"])

    scene = np.random.default_rng(1).normal(size=(60, 80, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2)
    mesh = create_mesh(MeshConfig())
    a = sliding_window_logits_sharded(fwd_closure, scene, 5, mesh, cfg)
    b = sliding_window_logits_sharded(
        fwd_params, scene, 5, mesh, cfg, params={"w": w}
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_crop_blend_rejects_margin_artifacts():
    """blend="crop": tile-margin predictions (truncated receptive field)
    must not bleed into the interior. A 'model' that corrupts each tile's
    outer overlap//2 ring by +100 should leave the crop-blended interior
    within the 1e-3 floor's leakage, while the Hann blend visibly leaks."""
    rng = np.random.default_rng(3)
    scene = rng.normal(size=(70, 90, 2)).astype(np.float32)
    tile, overlap = 32, 16
    m = overlap // 2

    def forward(tiles):
        bad = jnp.full_like(tiles, 100.0)
        core = jnp.zeros((tile, tile, 1), tiles.dtype)
        core = core.at[m : tile - m, m : tile - m].set(1.0)
        return tiles * core + bad * (1.0 - core)

    crop = sliding_window_logits(
        forward, scene, 2,
        SlidingWindowConfig(tile_size=tile, overlap=overlap, batch_size=4, blend="crop"),
    )
    hann = sliding_window_logits(
        forward, scene, 2,
        SlidingWindowConfig(tile_size=tile, overlap=overlap, batch_size=4, blend="hann"),
    )
    interior = np.s_[m:-m, m:-m]
    err_crop = np.abs(np.asarray(crop)[interior] - scene[interior]).max()
    err_hann = np.abs(np.asarray(hann)[interior] - scene[interior]).max()
    assert err_crop < 0.5, err_crop  # <= ~3 floored margins vs 1 core
    assert err_hann > 5.0, err_hann  # the taper alone cannot reject them


def test_crop_blend_full_coverage_identity():
    """Every pixel (incl. scene borders, where only margins contribute)
    still gets a prediction: identity model reconstructs the scene."""
    rng = np.random.default_rng(4)
    scene = rng.normal(size=(50, 44, 3)).astype(np.float32)

    def forward(tiles):
        return tiles

    out = sliding_window_logits(
        forward, scene, 3,
        SlidingWindowConfig(tile_size=32, overlap=16, batch_size=4, blend="crop"),
    )
    np.testing.assert_allclose(np.asarray(out), scene, atol=1e-4)


def _conv_forward(tiles):
    k = jnp.ones((5, 5, 3, 2)) / 75.0
    k = k.at[2, 2, :, 1].set(0.3)  # break symmetry
    return jax.lax.conv_general_dilated(
        tiles, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _assert_halo_matches(scene, cfg, n_classes=2):
    """Exactness contract of the halo path (see its docstring): pixels
    outside the exchanged boundary strips are BIT-identical; strip
    pixels regroup one f32 addition (partial + partial) and must agree
    to reassociation level."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import sliding_window_logits_halo
    from geo_deep_learning_tpu.inference.sliding_window import _plan_bands

    single = np.asarray(
        sliding_window_logits(_conv_forward, scene, n_classes, cfg)
    )
    mesh = create_mesh(MeshConfig())
    halo = np.asarray(
        sliding_window_logits_halo(_conv_forward, scene, n_classes, mesh, cfg)
    )
    assert halo.shape == single.shape
    plan = _plan_bands(scene, cfg, 8)
    assert plan is not None
    _, _, _, _, meta, h, _ = plan
    strip = meta["strip"]
    in_strip = np.zeros(h, bool)
    ends = np.cumsum(meta["own_h"])
    for b in ends[:-1]:
        if 0 < b < h:
            in_strip[max(b - strip, 0) : min(b + strip, h)] = True
    np.testing.assert_array_equal(halo[~in_strip], single[~in_strip])
    np.testing.assert_allclose(
        halo[in_strip], single[in_strip], atol=5e-6, rtol=1e-5
    )
    return halo, single


def test_halo_matches_single_device_crop():
    """Halo-exchange banded inference (scene SHARDED in bands, boundary
    strips exchanged via ppermute) matches the single-device
    blend='crop' path: bit-identical outside the strips, f32
    reassociation inside them."""
    rng = np.random.default_rng(7)
    scene = rng.normal(size=(150, 70, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(
        tile_size=32, overlap=16, batch_size=2, blend="crop"
    )
    _assert_halo_matches(scene, cfg)


def test_halo_single_column_is_bitexact_everywhere():
    """With one tile column a strip pixel's cross-boundary sum has a
    single term per side — IEEE addition is commutative, so the WHOLE
    output is bit-identical."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import sliding_window_logits_halo

    rng = np.random.default_rng(10)
    scene = rng.normal(size=(144, 32, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(
        tile_size=32, overlap=16, batch_size=2, blend="crop"
    )
    single = np.asarray(sliding_window_logits(_conv_forward, scene, 2, cfg))
    mesh = create_mesh(MeshConfig())
    halo = np.asarray(
        sliding_window_logits_halo(_conv_forward, scene, 2, mesh, cfg)
    )
    np.testing.assert_array_equal(halo, single)


def test_halo_more_devices_than_tile_rows():
    """Trailing devices with no tile rows contribute nothing and the
    stitched output still matches."""
    rng = np.random.default_rng(8)
    scene = rng.normal(size=(48, 90, 3)).astype(np.float32)  # 2 tile rows
    cfg = SlidingWindowConfig(
        tile_size=32, overlap=16, batch_size=2, blend="crop"
    )
    _assert_halo_matches(scene, cfg)


def test_halo_per_device_tiles_are_disjoint():
    """The banded planner assigns every global tile to EXACTLY one device
    (disjoint contiguous row blocks) — no redundant overlap compute."""
    from geo_deep_learning_tpu.inference.sliding_window import (
        _plan_bands,
        _plan_tiles,
    )

    rng = np.random.default_rng(9)
    scene = rng.normal(size=(150, 70, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(
        tile_size=32, overlap=16, batch_size=2, blend="crop"
    )
    plan = _plan_bands(scene, cfg, 8)
    assert plan is not None
    _, coords, valid, _, meta, _, _ = plan
    seen = []
    for d in range(coords.shape[0]):
        for i in range(coords.shape[1]):
            if valid[d, i] > 0:
                seen.append(
                    (int(coords[d, i, 0]) + int(meta["lo"][d]),
                     int(coords[d, i, 1]))
                )
    assert len(seen) == len(set(seen)), "tile assigned to two devices"
    _, gcoords, gvalid, _, _, _ = _plan_tiles(scene, cfg, cfg.batch_size)
    expect = {
        (int(r), int(c))
        for (r, c), v in zip(np.asarray(gcoords), np.asarray(gvalid))
        if v > 0
    }
    assert set(seen) == expect, "banded tiles != global tile grid"


def test_halo_requires_crop_blend():
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import sliding_window_logits_halo

    mesh = create_mesh(MeshConfig())
    with np.testing.assert_raises(ValueError):
        sliding_window_logits_halo(
            _conv_forward,
            np.zeros((64, 64, 3), np.float32),
            2,
            mesh,
            SlidingWindowConfig(tile_size=32, overlap=16, blend="hann"),
        )
