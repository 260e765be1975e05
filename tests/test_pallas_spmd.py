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
