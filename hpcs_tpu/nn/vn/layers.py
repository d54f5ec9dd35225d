"""Vector-Neuron layer library (SO(3)-equivariant point features) in flax.

Two feature layouts, selected per layer via `layout`:

- "cv" (channel-major): [..., C, 3] — vector components last.
- "vc" (lane-major):    [..., 3, C] — channels last.  On TPU the last axis
  maps to the 128 vector lanes; with C = 21..682 this lifts the lane
  utilization of every elementwise op in the hot path from 3/128 to C/128,
  which is the dominant cost of the VN-DGCNN forward (the backbone is
  HBM/VPU-bound, not FLOP-bound).

Parameters are layout-independent ([C_in, C_out] mixing matrices, [C] norms),
so one checkpoint serves both layouts.  Every layer is equivariant:
f(x R) = f(x) R applied to the vector axis.  VNStdFeature produces
rotation-*invariant* scalars by contracting against a learned equivariant
frame.

Behavioral reference: /root/reference/hpcs/nn/dgcnn/utils/vn_layers.py:13-204
(VNLinear :13-23, VNLeakyReLU :26-45, VNLinearLeakyReLU :48-77, VNBatchNorm
:112-132, VNMaxPool :135-149, mean_pool :152-153, VNStdFeature :156-204).
Redesigned for XLA: channel mixing is an einsum over C with the other axes
folded into MXU rows; BatchNorm statistics are computed on vector norms
(rotation-invariant, so equivariance is exact); norm math stays in fp32.
"""
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

EPS = 1e-6

# fp32 matmul emulation depth on the MXU (bf16 passes): "highest" = 6-pass
# (~fp32-accurate, different rounding realization from fused-fma); "high" =
# 3-pass (~1e-6 relative); "default" = single-pass bf16 (~1e-3).  Measured
# on v5e with the rotation-application fix (round 3, B=4/N=512): end-to-end
# SO(3) max deviation 2.2e-4 at highest vs 2.9-4e-4 at high, kNN graph 100%
# stable under rotation either way; the residual is fp32 cross-product
# cancellation at the input lift + head amplification, not graph flips
# (benchmarks/so3_residual_probe.py).  high is ~6% faster; default: high.
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("HPCS_TPU_MATMUL_PRECISION", "high")]


def _caxis(layout):
    """Channel axis for a layout."""
    return -2 if layout == "cv" else -1


def _vaxis(layout):
    """Vector-component axis for a layout."""
    return -1 if layout == "cv" else -2


def _channel_mix(x, kernel, layout="cv"):
    """Apply a [C_in, C_out] mixing matrix over the channel axis.

    Precision: TPU fp32 matmuls default to single-pass bf16 on the MXU, which
    breaks the exact SO(3) invariance this architecture is built around
    (~1e-3 deviations).  fp32 features therefore force HIGHEST precision;
    bf16 features (opt-in --bf16) keep the fast path."""
    precision = None if x.dtype == jnp.bfloat16 else _PRECISION
    eq = "...cv,cd->...dv" if layout == "cv" else "...vc,cd->...vd"
    return jnp.einsum(
        eq, x, kernel.astype(x.dtype),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(x.dtype)


class VNLinear(nn.Module):
    """Bias-free linear map over vector channels — exactly equivariant."""

    out_channels: int
    layout: str = "cv"

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[_caxis(self.layout)]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_channels, self.out_channels)
        )
        return _channel_mix(x, kernel, self.layout)


def _vn_leaky_relu(p, d, negative_slope, layout="cv"):
    """Direction-gated leaky ReLU: keep p where <p, d> >= 0, else reflect the
    component of p along d out (half-space projection), then blend by slope.
    The dot/norm math runs in fp32 even for bf16 features (divisions by
    near-zero norms are precision-critical); the result keeps p's dtype."""
    va = _vaxis(layout)
    pf = p.astype(jnp.float32)
    df = d.astype(jnp.float32)
    dotprod = jnp.sum(pf * df, axis=va, keepdims=True)
    d_norm_sq = jnp.sum(df * df, axis=va, keepdims=True)
    mask = (dotprod >= 0).astype(jnp.float32)
    projected = pf - (dotprod / (d_norm_sq + EPS)) * df
    out = negative_slope * pf + (1 - negative_slope) * (
        mask * pf + (1 - mask) * projected
    )
    return out.astype(p.dtype)


class VNLeakyReLU(nn.Module):
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    layout: str = "cv"

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[_caxis(self.layout)]
        dir_channels = 1 if self.share_nonlinearity else in_channels
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, dir_channels)
        )
        d = _channel_mix(x, kernel, self.layout)
        return _vn_leaky_relu(x, d, self.negative_slope, self.layout)


class VNBatchNorm(nn.Module):
    """BatchNorm on vector *norms*: rescales each vector by bn(|v|)/|v|.

    Norms are rotation-invariant, so equivariance is preserved exactly.
    Uses running statistics at eval time like the reference's torch BN.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    layout: str = "cv"

    @nn.compact
    def __call__(self, x, train: bool = True):
        va = _vaxis(self.layout)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=va) + EPS * EPS) + EPS  # [..., C]
        norm_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="bn",
        )(norm)
        ratio = norm_bn / norm
        ratio = jnp.expand_dims(ratio, axis=va)
        return (xf * ratio).astype(x.dtype)


class VNLinearLeakyReLU(nn.Module):
    """Fused linear -> norm-BatchNorm -> direction-gated leaky ReLU."""

    out_channels: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    use_batchnorm: bool = True
    layout: str = "cv"

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_channels = x.shape[_caxis(self.layout)]
        p = VNLinear(self.out_channels, layout=self.layout, name="linear")(x)
        if self.use_batchnorm:
            p = VNBatchNorm(layout=self.layout, name="batchnorm")(p, train=train)
        dir_channels = 1 if self.share_nonlinearity else self.out_channels
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, dir_channels)
        )
        d = _channel_mix(x, kernel, self.layout)
        return _vn_leaky_relu(p, d, self.negative_slope, self.layout)


class VNMaxPool(nn.Module):
    """Max pool over the neighbor axis by argmax of <x, d> with a learned
    direction d per channel.  Input [..., K, C, 3] ("cv") or [..., K, 3, C]
    ("vc") -> output without the K axis."""

    layout: str = "cv"

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[_caxis(self.layout)]
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, in_channels)
        )
        d = _channel_mix(x, kernel, self.layout)
        dotprod = jnp.sum(x * d, axis=_vaxis(self.layout))  # [..., K, C]
        idx = jnp.argmax(dotprod, axis=-2)  # [..., C]
        if self.layout == "cv":
            return jnp.take_along_axis(x, idx[..., None, :, None], axis=-3)[..., 0, :, :]
        return jnp.take_along_axis(x, idx[..., None, None, :], axis=-3)[..., 0, :, :]


def mean_pool(x, axis=-3):
    """Mean pool over the neighbor axis (K is at -3 in both layouts)."""
    return jnp.mean(x, axis=axis)


class VNStdFeature(nn.Module):
    """Invariantization: learn an equivariant 3-frame z0 and contract x onto it.

    Both layouts return (x_std [..., C, F], z0 [..., F, 3]) — x_std comes out
    channel-major and z0 in row-vector form in BOTH layouts, so the scalar
    head sees the same feature ordering (and the same Dense kernels)
    regardless of layout.  x_std is rotation-invariant, z0 rotates with the
    input.
    """

    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    layout: str = "cv"

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_channels = x.shape[_caxis(self.layout)]
        z0 = VNLinearLeakyReLU(
            in_channels // 2,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            layout=self.layout,
            name="vn1",
        )(x, train=train)
        z0 = VNLinearLeakyReLU(
            in_channels // 4,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            layout=self.layout,
            name="vn2",
        )(z0, train=train)
        frame_channels = 2 if self.normalize_frame else 3
        kernel = self.param(
            "frame_kernel", nn.initializers.lecun_normal(), (in_channels // 4, frame_channels)
        )
        z0 = _channel_mix(z0, kernel, self.layout)
        # canonicalize the frame to [..., F, 3] rows
        z0_rows = z0 if self.layout == "cv" else jnp.swapaxes(z0, -1, -2)

        if self.normalize_frame:
            v1 = z0_rows[..., 0, :]
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0_rows[..., 1, :]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            z0_rows = jnp.stack([u1, u2, u3], axis=-2)  # [..., 3, 3]

        x_std = invariant_project(x, z0_rows, layout=self.layout)
        return x_std, z0_rows


def _inv_precision(x):
    return None if x.dtype == jnp.bfloat16 else _PRECISION


def invariant_project(x, z0_rows, layout="cv"):
    """Project equivariant features through a frame z0 [..., F, 3] (row
    vectors) into invariant scalars [..., C, F] — the skip-connection path of
    VN-DGCNN (/root/reference/hpcs/nn/dgcnn/vn_dgcnn_partseg.py:85).  The
    output is channel-major in both layouts."""
    eq = "...cj,...kj->...ck" if layout == "cv" else "...jc,...kj->...ck"
    return jnp.einsum(eq, x, z0_rows, precision=_inv_precision(x))
