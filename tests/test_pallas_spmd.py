"""Pallas kernels under GSPMD: shard_map wrapping on multi-device meshes.

Pallas custom calls are opaque to XLA's SPMD partitioner; on multi-chip
meshes the kernel wrappers shard_map themselves over their
embarrassingly-parallel dims via the trace-time compute-mesh context
(core/mesh.use_compute_mesh + ops/pallas/spmd.maybe_shard_map). These
tests validate the wrapping semantics on the 8-device CPU mesh — the
fused-MHA case runs the REAL kernel in pallas interpreter mode, so the
full path (context → spec pruning → shard_map → pallas_call → custom_vjp
grad) is exercised without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import geo_deep_learning_tpu.ops.pallas.mha as mha
from geo_deep_learning_tpu.core.mesh import (
    MeshConfig,
    compute_mesh,
    create_mesh,
    use_compute_mesh,
)
from geo_deep_learning_tpu.ops.pallas.spmd import _prune_specs, maybe_shard_map


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _attn_ref(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_context_nesting():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    assert compute_mesh() is None
    with use_compute_mesh(mesh):
        assert compute_mesh() is mesh
        with use_compute_mesh(None):
            assert compute_mesh() is None
        assert compute_mesh() is mesh
    assert compute_mesh() is None


def test_no_mesh_is_direct_call():
    q, k, v = (_rand((2, 2, 16, 8), i) for i in range(3))
    out = maybe_shard_map(_attn_ref, (q, k, v), (P("data"),) * 3, P("data"))
    np.testing.assert_allclose(out, _attn_ref(q, k, v), atol=1e-6)


def test_prune_drops_non_divisible_axes():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    spec = P("data", "model")
    # batch 8 divides data=4; heads 3 does NOT divide model=2
    args = [jnp.zeros((8, 3, 16, 8))] * 3
    pruned = _prune_specs(mesh, args, [spec] * 3 + [spec])
    assert pruned is not None
    assert all(s == P("data", None) for s in pruned)
    # nothing divides -> None (caller falls back to the direct call)
    args = [jnp.zeros((5, 3, 16, 8))] * 3
    assert _prune_specs(mesh, args, [spec] * 3 + [spec]) is None


def test_shard_mapped_matches_direct():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, l, d = 8, 4, 32, 16
    q, k, v = (_rand((b, h, l, d), i) for i in range(3))
    sharding = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    spec = P("data", "model")

    @jax.jit
    def run(q, k, v):
        with use_compute_mesh(mesh):
            return maybe_shard_map(_attn_ref, (q, k, v), (spec,) * 3, spec)

    out = run(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), _attn_ref(q, k, v), atol=1e-5)
    # output stays sharded over both axes (no implicit replication)
    assert out.sharding.spec[:2] == ("data", "model")


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(mha, "_INTERPRET", True)
    # _supported rejects non-TPU platforms; force the kernel path so the
    # CPU mesh runs it in interpreter mode under shard_map
    monkeypatch.setattr(mha, "_supported", lambda q, k: True)
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_fused_attention_shard_mapped_interpret(interpret_kernel):
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, l, d = 8, 2, 40, 16
    q, k, v = (_rand((b, h, l, d), i) for i in range(3))
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    @jax.jit
    def run(q, k, v):
        with use_compute_mesh(mesh):
            return mha.fused_attention(q, k, v, scale)

    out = run(qs, ks, vs)
    ref = mha._einsum_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_shard_mapped_grad(interpret_kernel):
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, l, d = 4, 2, 24, 16
    q, k, v, g = (_rand((b, h, l, d), i) for i in range(4))
    scale = 1.0 / np.sqrt(d)

    def loss_kernel(q, k, v):
        with use_compute_mesh(mesh):
            return (mha.fused_attention(q, k, v, scale) * g).sum()

    def loss_ref(q, k, v):
        return (mha._einsum_attention(q, k, v, scale) * g).sum()

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


# ---------------------------------------------------------------------------
# VERDICT r2 #3: the SR-attention and preprocess kernels under shard_map
# in interpreter mode, plus a partition-proof that FAILS if the wrapper
# ever bypasses shard_map (the multichip dryrun used to exercise only the
# einsum fallbacks).

import geo_deep_learning_tpu.ops.pallas.preprocess as preprocess
import geo_deep_learning_tpu.ops.pallas.sr_attention as sra


@pytest.fixture
def interpret_sr(monkeypatch):
    monkeypatch.setattr(sra, "_INTERPRET", True)
    monkeypatch.setattr(sra, "_TQ", 8)
    monkeypatch.setattr(sra, "_supported", lambda q, k: True)
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_sr_attention_shard_mapped_interpret(interpret_sr):
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, lq, lk, d = 8, 2, 16, 8, 16
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P("data", "model"))
    qs = jax.device_put(q, sharding)
    ks = jax.device_put(k, sharding)
    vs = jax.device_put(v, sharding)

    # record the shapes the kernel is actually traced with: under
    # shard_map they must be the PER-DEVICE shards — this assertion is
    # what fails if maybe_shard_map ever silently bypasses the mesh
    seen = []
    orig = sra._pallas_attention

    def spy(q, k, v, scale):
        seen.append(tuple(q.shape))
        return orig(q, k, v, scale)

    sra._pallas_attention = spy
    try:
        @jax.jit
        def run(q, k, v):
            with use_compute_mesh(mesh):
                return sra.sr_attention(q, k, v, scale)

        out = run(qs, ks, vs)
        ref = sra._einsum_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    finally:
        sra._pallas_attention = orig
    assert seen, "pallas path not taken"
    assert all(s == (b // 4, h // 2, lq, d) for s in seen), (
        f"kernel saw {seen}, expected per-device shards "
        f"{(b // 4, h // 2, lq, d)} — shard_map was bypassed"
    )
    assert out.sharding.spec[:2] == ("data", "model")


def test_sr_attention_shard_mapped_grad(interpret_sr):
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, lq, lk, d = 4, 2, 16, 8, 16
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    g = _rand((b, h, lq, d), 3)
    scale = 1.0 / np.sqrt(d)

    def loss_kernel(q, k, v):
        with use_compute_mesh(mesh):
            return (sra.sr_attention(q, k, v, scale) * g).sum()

    def loss_ref(q, k, v):
        return (sra._einsum_attention(q, k, v, scale) * g).sum()

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


@pytest.fixture
def interpret_preprocess(monkeypatch):
    monkeypatch.setattr(preprocess, "_INTERPRET", True)
    monkeypatch.setattr(preprocess, "_is_axon", lambda: True)
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_preprocess_shard_mapped_interpret(interpret_preprocess):
    mesh = create_mesh(MeshConfig(data=4, model=2))
    b, h, w, c = 8, 16, 32, 3
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, size=(b, h, w, c)), jnp.uint8)
    mean = jnp.asarray([0.4, 0.45, 0.5], jnp.float32)
    std = jnp.asarray([0.2, 0.25, 0.3], jnp.float32)
    sharding = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, sharding)

    @jax.jit
    def run(img):
        with use_compute_mesh(mesh):
            return preprocess.fused_normalize_standardize(img, mean, std)

    out = run(img_s)
    ref = preprocess._jnp_reference(
        img, jnp.broadcast_to(mean[None], (b, c)),
        jnp.broadcast_to(std[None], (b, c)), jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.spec[0] == "data"
