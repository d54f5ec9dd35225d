"""VN-DGCNN part-segmentation backbone (the flagship model).

Behavioral reference: /root/reference/hpcs/nn/dgcnn/vn_dgcnn_partseg.py:7-104.
Channel geometry is preserved exactly (64//3 = 21 vector channels per
EdgeConv stage, 1024//3 = 341 global channels, 2299-channel fused head) so
that embeddings/metrics are comparable.  Differences by design:

- two layouts (see hpcs_tpu.nn.vn.layers): "cv" [B, N, C, 3] and lane-major
  "vc" [B, N, 3, C].  "vc" puts the channel axis in the 128 TPU vector lanes,
  lifting the lane utilization of the elementwise hot path from 3/128 to
  C/128 (C = 21..682); parameters are layout-independent;
- the kNN graph + gather runs through hpcs_tpu.ops (XLA or Pallas path);
- dropout/batchnorm are explicit flax collections instead of torch modules.
"""
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from ...ops.edgeconv import graph_feature_vn
from ..vn.layers import (
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
    invariant_project,
    mean_pool,
)


class _ScalarConvBNRelu(nn.Module):
    """1x1 conv head block: Dense (no bias) + BatchNorm + LeakyReLU."""

    features: int
    negative_slope: float = 0.2
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32)(x)
        if self.use_relu:
            x = nn.leaky_relu(x, self.negative_slope)
        return x.astype(self.dtype)


class VNDGCNNPartSeg(nn.Module):
    """Rotation-equivariant DGCNN returning per-point embeddings [B, N, F]."""

    out_features: int
    k: int = 20
    dropout: float = 0.5
    pooling: str = "mean"  # 'mean' | 'max'
    num_categories: int = 16
    compute_dtype: Any = jnp.float32  # bf16 halves HBM traffic of the edge
    # tensors and doubles MXU rate; norm math stays fp32 (see nn.vn.layers)
    layout: str = "cv"  # "cv" [.., C, 3] | "vc" lane-major [.., 3, C]

    def _pool(self, name):
        if self.pooling == "max":
            return VNMaxPool(layout=self.layout, name=name)
        return lambda x: mean_pool(x)

    @nn.compact
    def __call__(self, points, label, train: bool = True):
        """points: [B, N, 3]; label: [B, num_categories] one-hot (or part-presence
        vector); returns per-point features [B, N, out_features]."""
        B, N, _ = points.shape
        lo = self.layout
        caxis = -2 if lo == "cv" else -1
        pts = points.astype(self.compute_dtype)
        x = pts[:, :, None, :] if lo == "cv" else pts[:, :, :, None]

        def _vnllr(ch, name, share=False):
            return VNLinearLeakyReLU(ch, share_nonlinearity=share, layout=lo, name=name)

        # --- EdgeConv stage 1 (lift from coordinates) ---
        e, _ = graph_feature_vn(x, self.k, layout=lo)  # [B, N, K, {2,3}, {3,2}]
        e = _vnllr(64 // 3, "conv1")(e, train=train)
        e = _vnllr(64 // 3, "conv2")(e, train=train)
        x1 = self._pool("pool1")(e)  # 21 vector channels

        # --- EdgeConv stage 2 ---
        e, _ = graph_feature_vn(x1, self.k, layout=lo)
        e = _vnllr(64 // 3, "conv3")(e, train=train)
        e = _vnllr(64 // 3, "conv4")(e, train=train)
        x2 = self._pool("pool2")(e)

        # --- EdgeConv stage 3 ---
        e, _ = graph_feature_vn(x2, self.k, layout=lo)
        e = _vnllr(64 // 3, "conv5")(e, train=train)
        x3 = self._pool("pool3")(e)

        x123 = jnp.concatenate([x1, x2, x3], axis=caxis)  # 63 vector channels

        x = _vnllr(1024 // 3, "conv6", share=True)(x123, train=train)  # 341 ch
        x_mean = jnp.broadcast_to(x.mean(axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=caxis)  # 682 ch

        # x_std/x123_inv come out channel-major in both layouts (see layers)
        x_std, z0 = VNStdFeature(normalize_frame=False, layout=lo,
                                 name="std_feature")(x, train=train)
        x123_inv = invariant_project(x123, z0, layout=lo).reshape(B, N, -1)  # [B, N, 189]
        x_std = x_std.reshape(B, N, -1)  # [B, N, 2046]

        x_global = x_std.max(axis=1)  # [B, 2046]

        l = _ScalarConvBNRelu(64, name="conv7", dtype=self.compute_dtype)(
            label.astype(self.compute_dtype), train=train
        )  # [B, 64]

        fused = jnp.concatenate([x_global, l], axis=-1)  # [B, 2110]
        fused = jnp.broadcast_to(fused[:, None, :], (B, N, fused.shape[-1]))
        h = jnp.concatenate([fused, x123_inv], axis=-1)  # [B, N, 2299]

        h = _ScalarConvBNRelu(256, name="conv8", dtype=self.compute_dtype)(h, train=train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _ScalarConvBNRelu(256, name="conv9", dtype=self.compute_dtype)(h, train=train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _ScalarConvBNRelu(128, name="conv10", dtype=self.compute_dtype)(h, train=train)
        h = _ScalarConvBNRelu(self.out_features, use_relu=False, name="conv11")(h, train=train)
        return h.astype(jnp.float32)
