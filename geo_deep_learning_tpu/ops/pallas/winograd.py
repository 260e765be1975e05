"""Fused Winograd F(2x2,3x3) stride-1 SAME conv (fwd + bwd) for TPU.

Motivation (BASELINE.md speed-of-light): the UNet++ decoder's 3x3 convs
at 16-64 output channels are hard-capped at 25-50% MXU utilization by
lane occupancy; direct conv already runs at ~80% of that ceiling, so the
only remaining lever is cutting MXU FLOPs. Winograd F(2x2,3x3) does the
same conv with 16/36 = 0.44x the multiplies at unchanged lane occupancy.
A naive XLA composition would materialize the 16-point transform-domain
tensor in HBM (4x the input size — pure bandwidth loss); here the input
transform, the 16 per-point GEMMs, and the output inverse transform run
in one VMEM pass per (batch, tile-row-block) grid step, so transform-
domain data never touches HBM.

Layout trick: inputs arrive as the 4 even/odd phase arrays of the padded
input (ops/winograd.py:pad_and_phase_split), which turns the overlapping
4x4-tile extraction into differences of ADJACENT rows/cols — unit-stride
VPU adds, no stride-2 gathers. The B/A transforms are all 0/±1 so the
kernel numerics match direct conv; only the weight transform G (halves)
runs in f32, outside the kernel.

Backward:
  dx = same kernel applied to dy with the rotated/transposed kernel.
  dw: per-point dU[p] = V[p]^T @ dM[p] accumulated over the grid, then
      dw = G^T dU G outside (ops/winograd.py:transform_kernel_grad).

Falls back to ``lax.conv_general_dilated`` (identical math) on non-TPU
backends or ineligible shapes. Reference workload: the smp-delegated
UNet++ of reference tasks_with_models/segmentation_unetplus.py:126-131.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from geo_deep_learning_tpu.ops.winograd import (
    quad_in_phases,
    rotate_kernel,
    transform_kernel,
    transform_kernel_grad,
)

_INTERPRET = False  # tests flip this to run kernels on CPU

# Output-phase accumulation coefficients: Y[a,b] = sum_{u,v} AT[a,u] AT[v,b] M[u,v]
# with AT = [[1,1,1,0],[0,1,-1,-1]]  (all 0/±1).
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))
# dM combination: dM[u,v] = sum_{a,b} A[u,a] A[v,b] dY[a,b], A = AT^T.
_A = tuple(zip(*_AT))


def _row_tf(e, o, axis):
    """B^T along one axis via adjacent-slice adds (all coefficients ±1)."""
    n = e.shape[axis]
    lo = [slice(None)] * e.ndim
    hi = [slice(None)] * e.ndim
    lo[axis] = slice(0, n - 1)
    hi[axis] = slice(1, n)
    e0, e1 = e[tuple(lo)], e[tuple(hi)]
    o0, o1 = o[tuple(lo)], o[tuple(hi)]
    return (e0 - e1, o0 + e1, e1 - o0, o0 - o1)


def _input_transform(ee, eo, oe, oo):
    """Phase blocks [TH+1, Q+1, C] -> generator of 16 V tiles [TH, Q, C]."""
    re = _row_tf(ee, oe, 0)
    ro = _row_tf(eo, oo, 0)
    for u in range(4):
        yield from _row_tf(re[u], ro[u], 1)


def _fwd_kernel(
    ee_m, eo_m, oe_m, oo_m, ee_h, eo_h, oe_h, oo_h, u_ref,
    yee, yeo, yoe, yoo,
    *, th, q, cout,
):
    cat = lambda m, h: jnp.concatenate([m[0], h[0]], axis=0)
    phases = (
        cat(ee_m, ee_h),
        cat(eo_m, eo_h),
        cat(oe_m, oe_h),
        cat(oo_m, oo_h),
    )
    acc = [None] * 4  # yee, yeo, yoe, yoo accumulators [TH*Q, Cout] f32
    for p, v in enumerate(_input_transform(*phases)):
        uu, vv = divmod(p, 4)
        m = jax.lax.dot_general(
            v.reshape(th * q, v.shape[-1]),
            u_ref[p],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for out_i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            c = _AT[a][uu] * _AT[b][vv]
            if c == 0:
                continue
            t = m if c == 1 else -m
            acc[out_i] = t if acc[out_i] is None else acc[out_i] + t
    outs = (yee, yeo, yoe, yoo)
    for i in range(4):
        outs[i][0] = acc[i].reshape(th, q, cout).astype(outs[i].dtype)


def _dw_kernel(
    ee_m, eo_m, oe_m, oo_m, ee_h, eo_h, oe_h, oo_h,
    gee, geo, goe, goo,
    du_ref,
    *, th, q, cin,
):
    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _init():
        du_ref[...] = jnp.zeros_like(du_ref)

    cat = lambda m, h: jnp.concatenate([m[0], h[0]], axis=0)
    phases = (
        cat(ee_m, ee_h),
        cat(eo_m, eo_h),
        cat(oe_m, oe_h),
        cat(oo_m, oo_h),
    )
    dy = (gee[0], geo[0], goe[0], goo[0])  # [TH, Q, N] each
    n = dy[0].shape[-1]
    # dM[u,v] = sum_{a,b} A[u,a] A[v,b] dY[a,b]; build row combos first
    rows = []  # index a -> combo over u? build dMu[u][b] = sum_a A[u,a] dY[a,b]
    for u in range(4):
        for_b = []
        for b in range(2):
            t = None
            for a in range(2):
                c = _A[u][a]
                if c == 0:
                    continue
                term = dy[2 * a + b] if c == 1 else -dy[2 * a + b]
                t = term if t is None else t + term
            for_b.append(
                t if t is not None else jnp.zeros_like(dy[0])
            )
        rows.append(for_b)
    for p, v in enumerate(_input_transform(*phases)):
        uu, vv = divmod(p, 4)
        dm = None
        for b in range(2):
            c = _A[vv][b]
            if c == 0:
                continue
            term = rows[uu][b] if c == 1 else -rows[uu][b]
            dm = term if dm is None else dm + term
        if dm is None:
            continue
        contrib = jax.lax.dot_general(
            v.reshape(th * q, cin),
            dm.reshape(th * q, n),
            (((0,), (0,)), ((), ())),  # [Cin, N]
            preferred_element_type=jnp.float32,
        )
        du_ref[p] += contrib


def _phase_specs(th, q, c):
    """(main, halo) BlockSpecs: main covers TH rows of a phase array
    [B, P+1, Q+1, C]; halo covers one row of the pre-sliced halo array
    [B, P/TH, Q+1, C] (see :func:`_halo_rows`)."""
    from jax.experimental.pallas import tpu as pltpu

    main = pl.BlockSpec(
        (1, th, q + 1, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (1, 1, q + 1, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    return main, halo_spec


# Mosaic's default scoped-vmem cap is 16MB; the 320-channel decoder
# shapes need ~19MB at th=8 (compiler-reported). Keep the cap WELL below
# physical VMEM: inside a large jitted step XLA overlaps its own async
# prefetch copies (which stage through VMEM) with the custom call, and a
# greedy cap was observed to crash the TPU worker mid-step (kernel fault)
# while the same kernels ran clean standalone.
_VMEM_LIMIT = 32 * 1024 * 1024


def _pick_th(p: int, q: int, cin: int, cout: int) -> int | None:
    """Largest tile-row count that divides P and fits VMEM comfortably.

    The estimate is calibrated against the compiler's scoped-vmem report
    (~2.2x this formula at the 320-channel UNet++ shapes); the budget
    keeps per-program footprint small enough to double-buffer.
    """
    for th in (8, 4, 2, 1):
        if p % th:
            continue
        vmem = (
            8 * (th + 1) * (q + 1) * cin * 2      # phase rows (bf16, x2 slack)
            + 16 * cin * cout * 2                 # U
            + 4 * th * q * cout * 4               # accumulators f32
            + th * q * cin * 4                    # transient V tiles
        )
        if 2.2 * vmem <= 30 * 1024 * 1024:
            return th
    return None


def _halo_rows(phases, th):
    """Pre-slice the per-block halo rows (row th*r+th of each phase) into
    their own [B, R, Q+1, C] arrays, so the kernel's halo operand is a
    distinct buffer with a plain blocked spec — the same array fetched
    through two different BlockSpecs is the pattern suspected in a
    TPU-worker fault seen only inside large optimizer steps."""
    return tuple(ph[:, th::th] for ph in phases)


@functools.partial(jax.jit, static_argnames=("th",))
def _fwd_call(phases, u_flat, th):
    from jax.experimental.pallas import tpu as pltpu

    b, p1, q1, cin = phases[0].shape
    p, q = p1 - 1, q1 - 1
    cout = u_flat.shape[-1]
    grid = (b, p // th)
    main, halo = _phase_specs(th, q, cin)
    u_spec = pl.BlockSpec(
        (16, cin, cout), lambda bi, r: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, th, q, cout), lambda bi, r: (bi, r, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, p, q, cout), phases[0].dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, q=q, cout=cout),
        grid=grid,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        in_specs=[main] * 4 + [halo] * 4 + [u_spec],
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
    )(*phases, *_halo_rows(phases, th), u_flat)


@functools.partial(jax.jit, static_argnames=("th",))
def _dw_call(phases, dy_phases, th):
    from jax.experimental.pallas import tpu as pltpu

    b, p1, q1, cin = phases[0].shape
    p, q = p1 - 1, q1 - 1
    n = dy_phases[0].shape[-1]
    grid = (b, p // th)
    main, halo = _phase_specs(th, q, cin)
    g_spec = pl.BlockSpec(
        (1, th, q, n), lambda bi, r: (bi, r, 0, 0), memory_space=pltpu.VMEM
    )
    du_spec = pl.BlockSpec(
        (16, cin, n), lambda bi, r: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, th=th, q=q, cin=cin),
        grid=grid,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        in_specs=[main] * 4 + [halo] * 4 + [g_spec] * 4,
        out_specs=du_spec,
        out_shape=jax.ShapeDtypeStruct((16, cin, n), jnp.float32),
    )(*phases, *_halo_rows(phases, th), *dy_phases)


# ---------------------------------------------------------------------------
# v2: multi-part "concat-conv" kernel on unpadded quads.
#
# The UNet++ dense nodes concatenate several feature maps before each 3x3
# conv. XLA fuses that concat (and the SAME pad) into its conv read, but a
# custom call cannot consume fused producers — the v1 quad path therefore
# materialized every concat and pad in HBM, which cost more than the
# kernel saved (measured 161 vs 67 ms/step). Here the kernel takes each
# concat part as FOUR UNPADDED quad arrays plus two pre-sliced halo-row
# arrays, builds the padded phase blocks in VMEM (boundary rows/cols are
# zeros supplied by tiny host-side pad+stride slices), and accumulates the
# per-part transform-domain GEMMs into shared output accumulators — so
# neither the concatenated input nor its padding ever exists in HBM.


def _part_slots(m_ee, m_eo, m_oe, m_oo, h_top_oo, h_top_oe, h_bot_ee, h_bot_eo):
    """Assemble the four padded-phase blocks [TH+1, Q+1, C] of one part
    from its unpadded quad blocks (VMEM concats only).

    Padded-phase identities (xp = pad(x,1); X* = quads of x):
        Ee[t,s] = Xoo[t-1, s-1]   Eo[t,s] = Xoe[t-1, s]
        Oe[t,s] = Xeo[t,  s-1]   Oo[t,s] = Xee[t,  s]
    Rows t-1 / t+th come from the halo operands (zero at the array edge);
    the ±1 column shift is a zero-column concat.
    """
    rows_ee = jnp.concatenate([h_top_oo[0, 0][None], m_oo[0]], axis=0)
    rows_eo = jnp.concatenate([h_top_oe[0, 0][None], m_oe[0]], axis=0)
    rows_oe = jnp.concatenate([m_eo[0], h_bot_eo[0, 0][None]], axis=0)
    rows_oo = jnp.concatenate([m_ee[0], h_bot_ee[0, 0][None]], axis=0)
    zcol = jnp.zeros((rows_ee.shape[0], 1, rows_ee.shape[2]), rows_ee.dtype)
    return (
        jnp.concatenate([zcol, rows_ee], axis=1),  # Ee: col s-1
        jnp.concatenate([rows_eo, zcol], axis=1),  # Eo: col s
        jnp.concatenate([zcol, rows_oe], axis=1),  # Oe: col s-1
        jnp.concatenate([rows_oo, zcol], axis=1),  # Oo: col s
    )


def _fwd_kernel_v2(*refs, th, q, cout, n_parts):
    # operands: per part 8 quad refs, then per part 1 U ref; outputs 4
    outs = refs[-4:]
    u_refs = refs[n_parts * 8 : n_parts * 8 + n_parts]
    acc = [None] * 4
    for p_i in range(n_parts):
        phases = _part_slots(*refs[p_i * 8 : p_i * 8 + 8])
        u_ref = u_refs[p_i]
        for p, v in enumerate(_input_transform(*phases)):
            uu, vv = divmod(p, 4)
            m = jax.lax.dot_general(
                v.reshape(th * q, v.shape[-1]),
                u_ref[p],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for out_i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                c = _AT[a][uu] * _AT[b][vv]
                if c == 0:
                    continue
                t = m if c == 1 else -m
                acc[out_i] = t if acc[out_i] is None else acc[out_i] + t
    for i in range(4):
        outs[i][0] = acc[i].reshape(th, q, cout).astype(outs[i].dtype)


def _dw_kernel_v2(*refs, th, q, n_parts, part_ch):
    # operands: per part 8 quad refs, then 4 dy quad refs; outputs: per
    # part one dU accumulator [16, C_p, N]
    du_refs = refs[-n_parts:]
    dy_refs = refs[n_parts * 8 : n_parts * 8 + 4]

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _init():
        for r in du_refs:
            r[...] = jnp.zeros_like(r)

    dy = tuple(r[0] for r in dy_refs)  # quads of dy [TH, Q, N]
    n = dy[0].shape[-1]
    rows = []
    for u in range(4):
        for_b = []
        for b in range(2):
            t = None
            for a in range(2):
                c = _A[u][a]
                if c == 0:
                    continue
                term = dy[2 * a + b] if c == 1 else -dy[2 * a + b]
                t = term if t is None else t + term
            for_b.append(t if t is not None else jnp.zeros_like(dy[0]))
        rows.append(for_b)
    dms = []
    for p in range(16):
        uu, vv = divmod(p, 4)
        dm = None
        for b in range(2):
            c = _A[vv][b]
            if c == 0:
                continue
            term = rows[uu][b] if c == 1 else -rows[uu][b]
            dm = term if dm is None else dm + term
        dms.append(
            None if dm is None else dm.reshape(th * q, n)
        )
    for p_i in range(n_parts):
        phases = _part_slots(*refs[p_i * 8 : p_i * 8 + 8])
        cp = part_ch[p_i]
        for p, v in enumerate(_input_transform(*phases)):
            if dms[p] is None:
                continue
            contrib = jax.lax.dot_general(
                v.reshape(th * q, cp),
                dms[p],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            du_refs[p_i][p] += contrib


def _top_halo(x, th):
    """[B,P,Q,C] -> [B, P//th, Q, C]; entry r holds row th*r - 1 (zero
    row for r = 0)."""
    b, p, q, c = x.shape
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, ::th][:, : p // th]


def _bottom_halo(x, th):
    """[B,P,Q,C] -> [B, P//th, Q, C]; entry r holds row th*(r+1) (zero
    row for the last r)."""
    b, p, q, c = x.shape
    return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, th::th][:, : p // th]


def _part_operands(xq, th):
    """Quad 4-tuple -> the 8 kernel operands for one part."""
    ee, eo, oe, oo = xq
    return (
        ee, eo, oe, oo,
        _top_halo(oo, th), _top_halo(oe, th),
        _bottom_halo(ee, th), _bottom_halo(eo, th),
    )


def _part_specs(th, q, c):
    """BlockSpecs for the 8 operands of one part."""
    from jax.experimental.pallas import tpu as pltpu

    main = pl.BlockSpec(
        (1, th, q, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    halo = pl.BlockSpec(
        (1, 1, q, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    return [main] * 4 + [halo] * 4


@functools.partial(jax.jit, static_argnames=("th", "part_ch"))
def _fwd_call_v2(part_ops, u_parts, th, part_ch):
    from jax.experimental.pallas import tpu as pltpu

    b, p, q, _ = part_ops[0].shape
    cout = u_parts[0].shape[-1]
    n_parts = len(part_ch)
    grid = (b, p // th)
    in_specs = []
    for cp in part_ch:
        in_specs += _part_specs(th, q, cp)
    for cp in part_ch:
        in_specs.append(
            pl.BlockSpec(
                (16, cp, cout), lambda bi, r: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
    out_spec = pl.BlockSpec(
        (1, th, q, cout), lambda bi, r: (bi, r, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, p, q, cout), part_ops[0].dtype)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_v2, th=th, q=q, cout=cout, n_parts=n_parts
        ),
        grid=grid,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
    )(*part_ops, *u_parts)


@functools.partial(jax.jit, static_argnames=("th", "part_ch"))
def _dw_call_v2(part_ops, dy_quads, th, part_ch):
    from jax.experimental.pallas import tpu as pltpu

    b, p, q, _ = part_ops[0].shape
    n = dy_quads[0].shape[-1]
    n_parts = len(part_ch)
    grid = (b, p // th)
    in_specs = []
    for cp in part_ch:
        in_specs += _part_specs(th, q, cp)
    in_specs += [
        pl.BlockSpec(
            (1, th, q, n), lambda bi, r: (bi, r, 0, 0), memory_space=pltpu.VMEM
        )
    ] * 4
    du_specs = tuple(
        pl.BlockSpec(
            (16, cp, n), lambda bi, r: (0, 0, 0), memory_space=pltpu.VMEM
        )
        for cp in part_ch
    )
    return pl.pallas_call(
        functools.partial(
            _dw_kernel_v2, th=th, q=q, n_parts=n_parts, part_ch=part_ch
        ),
        grid=grid,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        in_specs=in_specs,
        out_specs=du_specs,
        out_shape=tuple(
            jax.ShapeDtypeStruct((16, cp, n), jnp.float32) for cp in part_ch
        ),
    )(*part_ops, *dy_quads)


def _run_fwd_parts(parts, w, th, part_ch):
    dtype = parts[0][0].dtype
    u = transform_kernel(w).astype(dtype).reshape(16, w.shape[2], w.shape[3])
    u_parts, c0 = [], 0
    for cp in part_ch:
        u_parts.append(u[:, c0 : c0 + cp])
        c0 += cp
    ops = []
    for xq in parts:
        ops += list(_part_operands(xq, th))
    return _fwd_call_v2(tuple(ops), tuple(u_parts), th, part_ch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _winograd_conv_parts(parts, w, th, part_ch):
    return _run_fwd_parts(parts, w, th, part_ch)


def _winograd_parts_fwd(parts, w, th, part_ch):
    return _run_fwd_parts(parts, w, th, part_ch), (parts, w)


def _winograd_parts_bwd(th, part_ch, res, dyq):
    parts, w = res
    dtype = parts[0][0].dtype
    dyq = tuple(g.astype(dtype) for g in dyq)
    # dx over the FULL (concatenated) channel dim via the single-part
    # forward kernel with the rotated kernel, then split per part.
    # The dx kernel's channel dims are SWAPPED vs the forward (cin=Cout,
    # cout=sum(part_ch)), so the forward's tile-row count may blow the
    # VMEM budget for wide concats — re-pick th for the swapped shape and
    # fall back to the XLA conv when nothing fits (advisor r2).
    ctot = sum(part_ch)
    cout = w.shape[-1]
    p_rows, q_cols = dyq[0].shape[1], dyq[0].shape[2]
    th_dx = _pick_th(p_rows, q_cols, cout, ctot)
    if th_dx is not None:
        dx_full = _run_fwd_parts([dyq], rotate_kernel(w), th_dx, (cout,))
    else:
        from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split

        dx_merged = jax.lax.conv_general_dilated(
            quad_merge(dyq), rotate_kernel(w).astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dx_full = quad_split(dx_merged)
    dparts, c0 = [], 0
    for cp in part_ch:
        dparts.append(tuple(a[..., c0 : c0 + cp] for a in dx_full))
        c0 += cp
    # dw: per-part transform-domain correlation
    ops = []
    for xq in parts:
        ops += list(_part_operands(xq, th))
    du_parts = _dw_call_v2(tuple(ops), dyq, th, part_ch)
    du = jnp.concatenate(du_parts, axis=1).reshape(4, 4, ctot, w.shape[-1])
    dw = transform_kernel_grad(du)
    return list(dparts), dw.astype(w.dtype)


_winograd_conv_parts.defvjp(_winograd_parts_fwd, _winograd_parts_bwd)


def winograd_conv3x3_parts(parts, w: jnp.ndarray):
    """Stride-1 SAME 3x3 conv over a CHANNEL-CONCATENATION of parts, each
    given as unpadded quads — the concat never exists in memory.

    ``parts``: list of 4-tuples (quads of each part, see quad_split).
    ``w``: [3, 3, sum(Cp), Cout]. Returns the output's quads.
    """
    from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split

    part_ch = tuple(int(xq[0].shape[-1]) for xq in parts)
    b, p, q, _ = parts[0][0].shape
    th = eligible((b, 2 * p, 2 * q, sum(part_ch)), w.shape)
    if th is None:
        x = jnp.concatenate(
            [quad_merge(xq) for xq in parts], axis=-1
        )
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return quad_split(y)
    parts = [tuple(xq) for xq in parts]
    return _winograd_conv_parts(parts, w, th, part_ch)


def _split_phases(x):
    """[B,H,W,C] -> padded even/odd phase arrays (see ops/winograd.py)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return (
        xp[:, 0::2, 0::2],
        xp[:, 0::2, 1::2],
        xp[:, 1::2, 0::2],
        xp[:, 1::2, 1::2],
    )


def _out_phases(y4):
    yee, yeo, yoe, yoo = y4
    b, p, q, c = yee.shape
    top = jnp.stack([yee, yeo], axis=3)
    bot = jnp.stack([yoe, yoo], axis=3)
    return jnp.stack([top, bot], axis=2).reshape(b, 2 * p, 2 * q, c)


def _y_to_phases(dy):
    b, h, w, c = dy.shape
    r = dy.reshape(b, h // 2, 2, w // 2, 2, c)
    return (
        r[:, :, 0, :, 0],
        r[:, :, 0, :, 1],
        r[:, :, 1, :, 0],
        r[:, :, 1, :, 1],
    )


def _run_fwd(x, w, th):
    u = transform_kernel(w).astype(x.dtype).reshape(16, *w.shape[2:])
    y4 = _fwd_call(_split_phases(x), u, th)
    return _out_phases(y4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _winograd_conv(x, w, th):
    return _run_fwd(x, w, th)


def _winograd_fwd(x, w, th):
    return _run_fwd(x, w, th), (x, w)


# Debug ablations (set from tests/experiments): route the input- or
# weight-gradient through XLA's direct conv instead of the Pallas kernels.
_DX_XLA = False
_DW_XLA = False


def _dx_xla(dy, w):
    return lax.conv_general_dilated(
        dy, rotate_kernel(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dw_xla(x, dy):
    # dw[kh,kw,ci,co] = correlation of x with dy over the batch+space dims
    return lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),
        jnp.transpose(dy, (1, 2, 0, 3)),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)


def _winograd_bwd(th, res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    # dx: same Winograd conv of dy with the rotated/transposed kernel
    dx = _dx_xla(dy, w) if _DX_XLA else _run_fwd(dy, rotate_kernel(w), th)
    if _DW_XLA:
        dw = _dw_xla(x, dy)
    else:
        # dw: transform-domain correlation, accumulated across the grid
        du = _dw_call(_split_phases(x), _y_to_phases(dy), th)
        dw = transform_kernel_grad(du.reshape(4, 4, *w.shape[2:]))
    return dx, dw.astype(w.dtype)


_winograd_conv.defvjp(_winograd_fwd, _winograd_bwd)


def eligible(x_shape, w_shape) -> int | None:
    """Return the tile-row block size if the fused kernel applies."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    b, h, w_, cin = x_shape
    kh, kw, wcin, cout = w_shape
    if (kh, kw) != (3, 3) or wcin != cin:
        return None
    if h % 2 or w_ % 2 or h < 8 or w_ < 8:
        return None
    if cin < 48 or cout < 16:  # direct conv wins at tiny K; no lane gain
        return None
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return None
    if platform not in ("tpu", "axon") and not _INTERPRET:
        return None
    return _pick_th(h // 2, w_ // 2, cin, cout)


def _run_fwd_quads(xq, w, th):
    u = transform_kernel(w).astype(xq[0].dtype).reshape(16, *w.shape[2:])
    return _fwd_call(quad_in_phases(xq), u, th)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _winograd_conv_quads(xq, w, th):
    return _run_fwd_quads(xq, w, th)


def _winograd_quads_fwd(xq, w, th):
    return _run_fwd_quads(xq, w, th), (xq, w)


def _winograd_quads_bwd(th, res, dyq):
    xq, w = res
    dyq = tuple(g.astype(xq[0].dtype) for g in dyq)
    dxq = _run_fwd_quads(dyq, rotate_kernel(w), th)
    du = _dw_call(quad_in_phases(xq), dyq, th)
    dw = transform_kernel_grad(du.reshape(4, 4, *w.shape[2:]))
    return tuple(dxq), dw.astype(w.dtype)


_winograd_conv_quads.defvjp(_winograd_quads_fwd, _winograd_quads_bwd)


def quad_eligible(quad_shape, w_shape) -> int | None:
    """Eligibility for the quad-resident API (quads are [B,P,Q,C])."""
    b, p, q, cin = quad_shape
    return eligible((b, 2 * p, 2 * q, cin), w_shape)


def winograd_conv3x3_quads(xq, w: jnp.ndarray):
    """Stride-1 SAME 3x3 conv on the quad-resident representation.

    ``xq`` is the 4-tuple from ops/winograd.py:quad_split; returns the
    output's quads. On non-TPU backends (or ineligible shapes) falls back
    to merge -> lax.conv -> split, which is numerically identical.
    """
    from geo_deep_learning_tpu.ops.winograd import quad_merge, quad_split

    th = quad_eligible(xq[0].shape, w.shape)
    if th is None:
        y = lax.conv_general_dilated(
            quad_merge(xq), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return quad_split(y)
    return _winograd_conv_quads(tuple(xq), w, th)


def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv, fused Winograd on TPU, lax.conv elsewhere.

    Drop-in replacement for ``lax.conv_general_dilated(x, w, (1,1),
    "SAME")`` with NHWC/HWIO layouts; numerics match direct conv (the
    on-chip transforms are all 0/±1 adds).
    """
    th = eligible(x.shape, w.shape)
    if th is None:
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    return _winograd_conv(x, w, th)
