"""Vector-Neuron layer library (SO(3)-equivariant point features) in flax.

Feature layout: [..., C, 3] — channels, then the 3-vector components last
(point features [B, N, C, 3]; edge features [B, N, K, C, 3]).  Every layer is
equivariant: f(x @ R^T) = f(x) @ R^T applied to the last axis.  VNStdFeature
produces rotation-*invariant* scalars by contracting against a learned
equivariant frame.

Behavioral reference: /root/reference/hpcs/nn/dgcnn/utils/vn_layers.py:13-204
(VNLinear :13-23, VNLeakyReLU :26-45, VNLinearLeakyReLU :48-77, VNBatchNorm
:112-132, VNMaxPool :135-149, mean_pool :152-153, VNStdFeature :156-204).
Redesigned for XLA: channel mixing is an einsum over C with the 3-vector axis
folded into the batch; BatchNorm statistics are computed on vector norms
(rotation-invariant, so equivariance is exact); norm math stays in fp32.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

EPS = 1e-6


def _channel_mix(x, kernel):
    """Apply a [C_in, C_out] mixing matrix over the channel axis of [..., C, 3].

    Precision: TPU fp32 matmuls default to single-pass bf16 on the MXU, which
    breaks the exact SO(3) invariance this architecture is built around
    (~1e-3 deviations).  fp32 features therefore force HIGHEST precision;
    bf16 features (opt-in --bf16) keep the fast path."""
    precision = None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jnp.einsum(
        "...cv,cd->...dv", x, kernel.astype(x.dtype),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(x.dtype)


class VNLinear(nn.Module):
    """Bias-free linear map over vector channels — exactly equivariant."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_channels, self.out_channels)
        )
        return _channel_mix(x, kernel)


def _vn_leaky_relu(p, d, negative_slope):
    """Direction-gated leaky ReLU: keep p where <p, d> >= 0, else reflect the
    component of p along d out (half-space projection), then blend by slope.
    The dot/norm math runs in fp32 even for bf16 features (divisions by
    near-zero norms are precision-critical); the result keeps p's dtype."""
    pf = p.astype(jnp.float32)
    df = d.astype(jnp.float32)
    dotprod = jnp.sum(pf * df, axis=-1, keepdims=True)
    d_norm_sq = jnp.sum(df * df, axis=-1, keepdims=True)
    mask = (dotprod >= 0).astype(jnp.float32)
    projected = pf - (dotprod / (d_norm_sq + EPS)) * df
    out = negative_slope * pf + (1 - negative_slope) * (
        mask * pf + (1 - mask) * projected
    )
    return out.astype(p.dtype)


class VNLeakyReLU(nn.Module):
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-2]
        dir_channels = 1 if self.share_nonlinearity else in_channels
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, dir_channels)
        )
        d = _channel_mix(x, kernel)
        return _vn_leaky_relu(x, d, self.negative_slope)


class VNBatchNorm(nn.Module):
    """BatchNorm on vector *norms*: rescales each vector by bn(|v|)/|v|.

    Norms are rotation-invariant, so equivariance is preserved exactly.
    Uses running statistics at eval time like the reference's torch BN.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1) + EPS * EPS) + EPS
        norm_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="bn",
        )(norm)
        return (xf / norm[..., None] * norm_bn[..., None]).astype(x.dtype)


class VNLinearLeakyReLU(nn.Module):
    """Fused linear -> norm-BatchNorm -> direction-gated leaky ReLU."""

    out_channels: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_channels = x.shape[-2]
        p = VNLinear(self.out_channels, name="linear")(x)
        if self.use_batchnorm:
            p = VNBatchNorm(name="batchnorm")(p, train=train)
        dir_channels = 1 if self.share_nonlinearity else self.out_channels
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, dir_channels)
        )
        d = _channel_mix(x, kernel)
        return _vn_leaky_relu(p, d, self.negative_slope)


class VNMaxPool(nn.Module):
    """Max pool over the neighbor axis by argmax of <x, d> with a learned
    direction d per channel.  Input [..., K, C, 3] -> output [..., C, 3]."""

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-2]
        kernel = self.param(
            "dir_kernel", nn.initializers.lecun_normal(), (in_channels, in_channels)
        )
        d = _channel_mix(x, kernel)
        dotprod = jnp.sum(x * d, axis=-1)  # [..., K, C]
        idx = jnp.argmax(dotprod, axis=-2)  # [..., C]
        return jnp.take_along_axis(x, idx[..., None, :, None], axis=-3)[..., 0, :, :]


def mean_pool(x, axis=-3):
    """Mean pool over the neighbor axis of [..., K, C, 3]."""
    return jnp.mean(x, axis=axis)


class VNStdFeature(nn.Module):
    """Invariantization: learn an equivariant 3-frame z0 and contract x onto it.

    Input [..., C, 3] -> (x_std [..., C, 3], z0 [..., 3, 3]); x_std is
    rotation-invariant, z0 rotates with the input (z0(xR) = z0(x) R).
    """

    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_channels = x.shape[-2]
        z0 = VNLinearLeakyReLU(
            in_channels // 2,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            name="vn1",
        )(x, train=train)
        z0 = VNLinearLeakyReLU(
            in_channels // 4,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            name="vn2",
        )(z0, train=train)
        frame_channels = 2 if self.normalize_frame else 3
        kernel = self.param(
            "frame_kernel", nn.initializers.lecun_normal(), (in_channels // 4, frame_channels)
        )
        z0 = _channel_mix(z0, kernel)  # [..., frame_channels, 3]

        if self.normalize_frame:
            v1 = z0[..., 0, :]
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0[..., 1, :]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            z0 = jnp.stack([u1, u2, u3], axis=-2)  # [..., 3, 3]

        # x_std[..., c, k] = sum_j x[..., c, j] * z0[..., k, j]
        x_std = jnp.einsum("...cj,...kj->...ck", x, z0,
                           precision=_inv_precision(x))
        return x_std, z0


def _inv_precision(x):
    return None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def invariant_project(x, z0):
    """Project equivariant features x [..., C, 3] through a frame z0 [..., 3, 3]
    into invariant scalars [..., C, 3(frame)] — the skip-connection path of
    VN-DGCNN (/root/reference/hpcs/nn/dgcnn/vn_dgcnn_partseg.py:85)."""
    return jnp.einsum("...cj,...kj->...ck", x, z0, precision=_inv_precision(x))
