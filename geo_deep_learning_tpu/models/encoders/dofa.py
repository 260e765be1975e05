"""DOFA v2 encoder: wavelength-conditioned dynamic patch embedding + ViT.

Reference equivalent: ``models/encoders/dofa_v2.py`` (567 LoC). The patch
embedding's conv kernel is *generated at runtime* from the spectral
wavelengths of the input bands: 1-D sincos embedding of λ×1000 (ref :9-35)
→ FC residual layer (ref :38-56) → a 1-layer post-norm transformer over
[128 learnable weight tokens | wave tokens | bias token] whose outputs are
projected to a [C·k·k·D] kernel and [D] bias, scaled by 0.01 (ref :59-106,
:148-181) → strided conv (stride=14, padding=1). Then a standard ViT
(timm Block semantics incl. LayerScale ``init_values=1e-5``) with fixed
2-D sincos positional embeddings and multi-layer feature taps
(ref :435-487). Variants: base d768/12L/taps[4,6,10,11], large
d1024/24L/taps[5,9,15,21] (ref :504-567).

TPU notes:
- The weight generator depends only on λ (batch-constant, checked by the
  reference at :437-442). Its cost is negligible (a 128-token transformer)
  but under jit it still executes per step — XLA does NOT constant-fold
  it even with λ closed over as a constant. For static-λ deployments,
  pre-bake the generated (kernel, bias) once via
  ``inference.export.bake_dofa_embedding`` and pass ``baked_embed=`` —
  the generator is then skipped entirely.
- Feature taps return NHWC maps directly; the reference's per-tap
  [B,L,D]→[B,D,√L,√L] permutes vanish in channel-last layout.
- Matching the reference quirk: taps are NOT LayerNormed (the reference's
  final-norm branch at :482-487 is unreachable for its configs); the
  ``norm`` parameters still exist for checkpoint-conversion parity.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    DropPath,
    torch_default_bias_init,
    torch_default_kernel_init,
    xavier_uniform_flat,
)

Dtype = Any


def sincos_1d(embed_dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    """1-D sin/cos embedding, reference ``position_embedding`` (:9-35)."""
    if embed_dim % 2 != 0:
        msg = "embed_dim must be even"
        raise ValueError(msg)
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Fixed 2-D sin/cos positional embedding, reference :394-433."""
    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000.0**omega
        out = pos.reshape(-1)[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gh, gw, indexing="ij")  # grid[0]=h idx, grid[1]=w idx
    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # [H*W, D]


class FCResLayer(nn.Module):
    """x + MLP(x) with two ReLU-activated linears (reference :38-56)."""

    size: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference DOFAv2Embedding._init_weights (:140-146): every Linear
        # under it gets xavier_uniform weights + 0.01-filled biases
        init = dict(
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.constant(0.01),
        )
        y = nn.Dense(self.size, dtype=self.dtype, param_dtype=self.param_dtype, name="w1", **init)(x)
        y = nn.relu(y)
        y = nn.Dense(self.size, dtype=self.dtype, param_dtype=self.param_dtype, name="w2", **init)(y)
        y = nn.relu(y)
        return x + y


class _PostNormEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer(norm_first=False)`` semantics:
    x = norm1(x + attn(x)); x = norm2(x + ffn(x)). d_ff=2048, GELU."""

    num_heads: int = 4
    d_ff: int = 2048
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        # torch MHA _reset_parameters: in_proj xavier_uniform over the
        # FLAT [3D, D] matrix (fans D/3D — flax's per-head shape would
        # derive different fans), in_proj_bias zeros; out_proj is an
        # nn.Linear so the reference's xavier+0.01 sweep re-inits it
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            kernel_init=xavier_uniform_flat(d, 3 * d),
            bias_init=nn.initializers.zeros_init(),
            out_kernel_init=xavier_uniform_flat(d, d),
            out_bias_init=nn.initializers.constant(0.01),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(x, x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(
            x + attn
        )
        ffn_init = dict(
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.constant(0.01),
        )
        y = nn.Dense(self.d_ff, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1", **ffn_init)(x)
        y = nn.gelu(y)
        y = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2", **ffn_init)(y)
        return nn.LayerNorm(
            dtype=self.dtype, param_dtype=self.param_dtype, name="norm2"
        )(x + y)


class TransformerWeightGenerator(nn.Module):
    """Dynamic conv-kernel generator (reference :59-106)."""

    output_dim: int  # C-agnostic: kernel entries per wave token (k*k*D)
    embed_dim: int  # conv bias size (D)
    input_dim: int = 128
    num_tokens: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, waves: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        weight_tokens = self.param(
            "weight_tokens",
            nn.initializers.normal(0.02),
            (self.num_tokens, self.input_dim),
            self.param_dtype,
        )
        bias_token = self.param(
            "bias_token",
            nn.initializers.normal(0.02),
            (1, self.input_dim),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [weight_tokens.astype(waves.dtype), waves, bias_token.astype(waves.dtype)],
            axis=0,
        )
        x = _PostNormEncoderLayer(
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder_layer"
        )(x[None])[0]
        n_waves = waves.shape[0]
        wave_out = x[self.num_tokens : self.num_tokens + n_waves]
        gen_init = dict(
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.constant(0.01),
        )  # reference _init_weights sweep (:140-146)
        weights = nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc_weight", **gen_init,
        )(wave_out + waves)
        bias = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc_bias", **gen_init,
        )(x[-1])
        return weights, bias


class DOFAv2Embedding(nn.Module):
    """Wavelength-conditioned dynamic patch embedding (reference :109-181).

    Returns the NHWC token grid [B, H', W', D].

    ``generate`` exposes the λ→(kernel, bias) path on its own so static-λ
    deployments can PRE-BAKE the conv weights once (XLA does NOT
    constant-fold the generator even with constant λ — measured: the
    static-λ compile keeps all 554 fusions). ``__call__`` accepts the
    baked pair via ``baked=`` and skips the generator entirely.
    """

    embed_dim: int = 768
    kernel_size: int = 14
    dynamic_embed_dim: int = 128
    convert_to_16: bool = False
    scaler: float = 0.01
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.fclayer = FCResLayer(
            self.dynamic_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.weight_generator = TransformerWeightGenerator(
            output_dim=self.kernel_size * self.kernel_size * self.embed_dim,
            embed_dim=self.embed_dim,
            input_dim=self.dynamic_embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def generate(
        self, in_channels: int, wavelengths: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """λ → (HWIO conv kernel, bias), incl. scaling and 14→16 resize."""
        k = self.kernel_size
        waves = sincos_1d(self.dynamic_embed_dim, wavelengths * 1000.0)
        waves = self.fclayer(waves.astype(self.dtype))
        weight, bias = self.weight_generator(waves)
        # [C, k, k, D] → HWIO [k, k, C, D] for lax conv
        kernel = weight.reshape(in_channels, k, k, self.embed_dim)
        kernel = kernel.transpose(1, 2, 0, 3) * self.scaler
        bias = bias * self.scaler
        if self.convert_to_16:
            # bicubic kernel resize 14→16 (reference :167-177). Torch's
            # interpolate(mode="bicubic") uses the a=-0.75 cubic kernel;
            # jax.image.resize("cubic") uses Keys a=-0.5 and visibly
            # diverges — apply the exact torch matrix (golden-matched in
            # tests/test_fetch_weights.py) as two thin einsums.
            from geo_deep_learning_tpu.models.convert import _bicubic_matrix

            m = jnp.asarray(_bicubic_matrix(16, k), self.dtype)
            kernel = jnp.einsum("oh,hwcd->owcd", m, kernel)
            kernel = jnp.einsum("pw,owcd->opcd", m, kernel)
        return kernel, bias

    def __call__(
        self,
        x: jnp.ndarray,
        wavelengths: jnp.ndarray | None = None,
        baked: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        if baked is not None:
            kernel, bias = baked
        else:
            kernel, bias = self.generate(x.shape[-1], wavelengths)
        stride = 16 if self.convert_to_16 else self.kernel_size
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class _ProjParams(nn.Module):
    """Parameter shell matching ``nn.DenseGeneral(features=(H, hd))``:
    declares ``kernel`` [D, H, hd] (lecun-normal) + ``bias`` [H, hd]
    (zeros) under this module's scope without executing a GEMM — the
    caller fuses q/k/v into one projection."""

    d: int
    heads: int
    head_dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        # the reference's timm Blocks are built raw (no init sweep), so
        # the qkv Linear carries torch defaults: kaiming_uniform(a=√5)
        # over the [3D, D] weight (fan_in = D) + bias U(±1/√D)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform", in_axis=0, out_axis=(1, 2)
            ),
            (self.d, self.heads, self.head_dim),
            self.param_dtype,
        )
        bias = self.param(
            "bias",
            torch_default_bias_init(self.d),
            (self.heads, self.head_dim),
            self.param_dtype,
        )
        return kernel, bias


class _OutParams(nn.Module):
    """Parameter shell matching ``nn.DenseGeneral(features=D, axis=(-2,-1))``:
    ``kernel`` [H, hd, D] + ``bias`` [D] under this module's scope; the
    caller executes the GEMM (optionally with LayerScale folded in)."""

    heads: int
    head_dim: int
    d: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        # timm Attention.proj is a raw torch Linear(D, D): torch defaults
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform", in_axis=(0, 1), out_axis=2
            ),
            (self.heads, self.head_dim, self.d),
            self.param_dtype,
        )
        bias = self.param(
            "bias",
            torch_default_bias_init(self.heads * self.head_dim),
            (self.d,),
            self.param_dtype,
        )
        return kernel, bias


class _ScaledDense(nn.Module):
    """``nn.Dense`` twin (same ``kernel``/``bias`` param paths) that can
    fold a LayerScale gamma into the weight: x@(W*g) + b*g == (x@W + b)*g
    exactly, keeping the elementwise multiply (and its big backward
    reduction) weight-sized instead of activation-sized."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, scale: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        # twin of a raw torch Linear: torch default init
        kernel = self.param(
            "kernel",
            torch_default_kernel_init(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", torch_default_bias_init(x.shape[-1]), (self.features,),
            self.param_dtype,
        )
        if scale is not None:
            kernel = kernel * scale
            bias = bias * scale
        return x.astype(self.dtype) @ kernel.astype(self.dtype) + bias.astype(
            self.dtype
        )


class FusedSelfAttention(nn.Module):
    """Self-attention with the Pallas fused kernel on the score path.

    Parameter tree is IDENTICAL to ``nn.MultiHeadDotProductAttention``
    (query/key/value DenseGeneral [D, H, hd] + out DenseGeneral), so
    checkpoints and the torch converter are unaffected; on non-TPU
    backends the kernel falls back to the same einsum composition flax
    uses, keeping golden parity exact.
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, out_scale: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        from geo_deep_learning_tpu.ops.pallas.mha import fused_attention_packed

        d = x.shape[-1]
        hd = d // self.num_heads
        # declare q/k/v params under the SAME paths DenseGeneral would
        # (query/kernel [D,H,hd] + query/bias [H,hd], ...) for checkpoint
        # and torch-converter parity, but EXECUTE them as one fused
        # [D, 3D] GEMM — one MXU pass with 3x-wider N instead of three
        ps = [
            _ProjParams(
                d, self.num_heads, hd, self.param_dtype, name=nm
            )()
            for nm in ("query", "key", "value")
        ]
        w = jnp.concatenate(
            [p[0].reshape(d, d) for p in ps], axis=-1
        ).astype(self.dtype)  # [D, 3D]
        b = jnp.concatenate([p[1].reshape(d) for p in ps]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ w + b  # [B, L, 3D]
        bsz, ln, _ = qkv.shape
        # the kernel consumes the packed GEMM output directly (per-head
        # slices via BlockSpec column maps) — no [B,L,H,hd]->[B,H,L,hd]
        # transposes or tile pads ever hit HBM
        o = fused_attention_packed(
            qkv, self.num_heads, scale=1.0 / float(np.sqrt(hd))
        )  # [B, L, D]
        # out projection under DenseGeneral's exact param paths
        # (out/kernel [H, hd, D] + out/bias [D]); ``out_scale`` folds the
        # caller's LayerScale gamma into the WEIGHT — (o@W + b)*g ==
        # o@(W*g) + b*g exactly, which moves the elementwise multiply and
        # its [B, L, D]-sized backward reduction off the activation path
        # (profiled at ~14 ms/step of multiply_reduce fusions at bs16)
        ok, ob = _OutParams(
            self.num_heads, hd, d, self.param_dtype, name="out"
        )()
        if out_scale is not None:
            ok = ok * out_scale
            ob = ob * out_scale
        y = jax.lax.dot_general(
            o.astype(self.dtype),
            ok.reshape(d, d).astype(self.dtype),
            (((2,), (0,)), ((), ())),
        )
        return y + ob.astype(self.dtype)


class FusedLayerNorm(nn.Module):
    """``nn.LayerNorm`` twin (same ``scale``/``bias`` param paths) backed
    by the Pallas fused kernel (ops/pallas/layernorm.py) on TPU: lane
    reductions run as MXU matvecs and the backward emits dx + dgamma/
    dbeta partials in one pass. Off-TPU it is the identical-math XLA
    composition (f32 stats, fast-variance), keeping golden parity."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from geo_deep_learning_tpu.ops.pallas.layernorm import fused_layernorm

        d = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (d,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (d,), self.param_dtype
        )
        y = fused_layernorm(x, scale, bias, self.epsilon)
        return y.astype(self.dtype)


class FusedLayerNormResidual(nn.Module):
    """``s = x + branch; y = LayerNorm(s)`` with the add fused into the
    LN kernel (and its gradient fan-in fused into the LN backward) —
    recovers the elementwise fusion XLA loses at custom-call boundaries.
    Same ``scale``/``bias`` param paths as ``nn.LayerNorm``."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, branch: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        from geo_deep_learning_tpu.ops.pallas.layernorm import (
            fused_layernorm_residual,
        )

        d = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (d,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (d,), self.param_dtype
        )
        s, y = fused_layernorm_residual(x, branch, scale, bias, self.epsilon)
        return s, y.astype(self.dtype)


class ViTBlock(nn.Module):
    """timm ViT block with LayerScale (``init_values``), qkv_bias=True.

    ``remat_mlp=True`` rematerializes ONLY the MLP branch (fc1→gelu→fc2)
    in the backward pass — exact math, same param tree. Unlike wrapping
    the whole block in ``nn.remat`` (``DOFAv2(remat=True,
    remat_mode="block")``), the fused attention kernel stays OUTSIDE the
    remat region: its custom-VJP residuals (q/k/v/o/lse) are stored, so
    the Pallas forward is never re-run in the backward. Recomputed: the
    two big MLP dots; saved vs block remat: one attention forward per
    block (the most expensive-per-byte compute in the ViT, ~25% MXU at
    D=64 heads) plus the LayerNorms.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    drop: float = 0.0
    drop_path: float = 0.0
    remat_mlp: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _mlp(self, y: jnp.ndarray, train: bool) -> jnp.ndarray:
        """MLP branch (params stay at block scope: mlp_fc1/mlp_fc2/dp2)."""
        d = y.shape[-1]
        y = nn.Dense(
            int(d * self.mlp_ratio),
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(d),
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="mlp_fc1",
        )(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        ls2 = self.param(
            "ls2_gamma",
            nn.initializers.constant(self.init_values),
            (d,),
            self.param_dtype,
        )
        y = _ScaledDense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp_fc2"
        )(y, scale=ls2)
        return DropPath(self.drop_path, name="dp2")(y, train=train)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pending: jnp.ndarray | None = None,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Residual-lazy block: takes the residual stream ``x`` plus the
        previous block's not-yet-added branch ``pending``, and returns
        ``(s, branch)`` where the true post-block stream is ``s + branch``.
        Deferring each add lets it fuse into the NEXT LayerNorm kernel
        (FusedLayerNormResidual) instead of running as its own HBM pass.
        The caller materializes ``s + branch`` only where the raw stream
        is needed (feature taps)."""
        d = x.shape[-1]
        # LayerScale gammas are FOLDED into the adjacent projection
        # weights ((x@W + b)*g == x@(W*g) + b*g, exact): the per-token
        # [B, L, D] multiply and its backward sum-over-tokens reduction
        # become weight-sized, and the residual stream stays in compute
        # dtype instead of being promoted to f32 by the gamma multiply.
        # DropPath commutes with the fold (it scales by a per-sample
        # mask, so DropPath(y*g) == DropPath(y)*g for the same rng).
        ls1 = self.param(
            "ls1_gamma",
            nn.initializers.constant(self.init_values),
            (d,),
            self.param_dtype,
        )
        if pending is None:
            s1 = x
            y = FusedLayerNorm(
                epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
                name="norm1",
            )(x)
        else:
            s1, y = FusedLayerNormResidual(
                epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
                name="norm1",
            )(x, pending)
        y = FusedSelfAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(y, out_scale=ls1)
        a = DropPath(self.drop_path, name="dp1")(y, train=train)
        s2, y = FusedLayerNormResidual(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm2",
        )(s1, a)
        mlp = (
            nn.remat(type(self)._mlp, static_argnums=(2,))
            if self.remat_mlp
            else type(self)._mlp
        )
        return s2, mlp(self, y, train)


@dataclass(frozen=True)
class DOFAConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_indices: tuple[int, ...] = (4, 6, 10, 11)
    patch_size: int = 14
    mlp_ratio: float = 4.0
    init_values: float = 1e-5


dofa_configs: dict[str, DOFAConfig] = {
    "dofa_base": DOFAConfig(),
    "dofa_large": DOFAConfig(
        embed_dim=1024, depth=24, num_heads=16, out_indices=(5, 9, 15, 21)
    ),
}


class DOFAv2(nn.Module):
    """DOFA v2 ViT with multi-layer NHWC feature taps (reference :184-501)."""

    variant: str = "dofa_base"
    out_indices: tuple[int, ...] | None = None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    convert_patch_to_16: bool = False
    remat: bool = False  # rematerialize ViT compute in the backward
    # "mlp" (default): remat only each block's MLP branch — the fused
    # attention kernel's residuals are stored so its Pallas forward is
    # never re-run (see ViTBlock.remat_mlp). "block": jax.checkpoint the
    # whole block (minimum memory, recomputes attention too).
    remat_mode: str = "mlp"
    # optional checkpoint positional table [1, 1 + g², D] (numpy). When
    # given, it replaces the recomputed sincos grid, bicubic-resized to
    # the current grid exactly as the reference does at checkpoint load
    # (dofa_v2.py:349-392) — preserving the TRAINED positional range
    # instead of extrapolating fresh sincos positions. Produced by
    # models/convert.convert_dofa (side entry "pos_embed").
    pos_embed_table: Any = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def embed_dim(self) -> int:
        return dofa_configs[self.variant].embed_dim

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        wavelengths: jnp.ndarray | None = None,
        train: bool = False,
        baked_embed: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> list[jnp.ndarray]:
        cfg = dofa_configs[self.variant]
        taps = tuple(self.out_indices) if self.out_indices else cfg.out_indices
        if wavelengths is not None and wavelengths.ndim == 2:
            # reference asserts batch-constant wavelengths (:437-442); under
            # jit we take row 0 — the data pipeline guarantees constancy.
            wavelengths = wavelengths[0]
        tokens = DOFAv2Embedding(
            embed_dim=cfg.embed_dim,
            kernel_size=cfg.patch_size,
            convert_to_16=self.convert_patch_to_16,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x, wavelengths, baked=baked_embed)
        b, gh, gw, d = tokens.shape
        if self.pos_embed_table is not None:
            from geo_deep_learning_tpu.models.convert import resize_pos_embed

            table = resize_pos_embed(self.pos_embed_table, gh * gw)
            # reference applies the grid rows only; the cls row is unused
            # (dofa_v2.py:448-453 adds pos BEFORE prepending cls)
            pos = jnp.asarray(table[0, 1:, :], dtype=self.dtype)
        else:
            pos = jnp.asarray(sincos_2d(d, gh, gw), dtype=self.dtype)
        seq = tokens.reshape(b, gh * gw, d) + pos[None]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, d), self.param_dtype
        )
        seq = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(seq.dtype), (b, 1, d)), seq], axis=1
        )
        seq = nn.Dropout(self.drop_rate, deterministic=not train)(seq)
        dpr = np.linspace(0.0, self.drop_path_rate, cfg.depth)
        block_remat = self.remat and self.remat_mode == "block"
        mlp_remat = self.remat and self.remat_mode == "mlp"
        block_cls = (
            nn.remat(ViTBlock, static_argnums=(3,)) if block_remat else ViTBlock
        )
        features = []
        # residual-lazy threading: each block returns (stream, branch) with
        # the add deferred so it fuses into the next block's LN kernel; the
        # sum is materialized only at TAP blocks, where the raw stream is
        # consumed (and the next block then starts with pending=None, so
        # nothing is computed twice)
        pending = None
        for i in range(cfg.depth):
            seq, pending = block_cls(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
                drop=self.drop_rate,
                drop_path=float(dpr[i]),
                remat_mlp=mlp_remat,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block{i}",
            )(seq, pending, train)
            if i in taps:
                seq = seq + pending
                pending = None
                features.append(seq[:, 1:, :].reshape(b, gh, gw, d))
        if pending is not None:
            seq = seq + pending
        # `norm` exists for checkpoint parity but is not applied to taps
        # (matches the reference's unreachable final-norm branch, :482-487)
        nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
        )(seq)
        return features


def create_dofa_base(**kwargs) -> DOFAv2:
    """Reference ``create_dofa_base`` (:504-534)."""
    return DOFAv2(variant="dofa_base", **kwargs)


def create_dofa_large(**kwargs) -> DOFAv2:
    """Reference ``create_dofa_large`` (:537-567)."""
    return DOFAv2(variant="dofa_large", **kwargs)
