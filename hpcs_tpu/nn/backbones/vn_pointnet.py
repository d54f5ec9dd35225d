"""Vector-Neuron PointNet part-segmentation backbone.

Behavioral reference: /root/reference/hpcs/nn/pointnet/vn_pointnet_partseg.py
:11-91 with the VN STNkd of vn_pointnet.py:12-43.  Cross-product graph
lifting, slope-0 VN ReLUs, 9025-channel invariant head, log_softmax output.
Layout: [B, N, C, 3] vector features.
"""
import jax.numpy as jnp
from flax import linen as nn

from ...ops.edgeconv import graph_feature_cross_vn
from ..vn.layers import (
    VNBatchNorm,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
    invariant_project,
    mean_pool,
)
from .pointnet import _ConvBNRelu


class VNSTNkd(nn.Module):
    """Equivariant feature transform: emits a global [B, d, 3] vector frame."""

    d: int
    pooling: str = "mean"

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: [B, N, d, 3]
        h = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(x, train=train)
        h = VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv2")(h, train=train)
        h = VNLinearLeakyReLU(1024 // 3, negative_slope=0.0, name="conv3")(h, train=train)
        if self.pooling == "max":
            h = VNMaxPool(name="pool")(h)  # pool over N -> [B, C, 3]
        else:
            h = mean_pool(h)
        h = VNLinearLeakyReLU(512 // 3, negative_slope=0.0, name="fc1")(h, train=train)
        h = VNLinearLeakyReLU(256 // 3, negative_slope=0.0, name="fc2")(h, train=train)
        return VNLinear(self.d, name="fc3")(h)  # [B, d, 3]


class VNPointNetPartSeg(nn.Module):
    """Returns per-point log-softmax scores [B, N, num_part]."""

    num_part: int
    k: int = 20
    pooling: str = "mean"
    num_categories: int = 16

    @nn.compact
    def __call__(self, points, label, train: bool = True):
        B, N, _ = points.shape
        x = points[:, :, None, :]  # [B, N, 1, 3]
        feat, _ = graph_feature_cross_vn(x, self.k)  # [B, N, K, 3, 3]
        x = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv_pos")(
            feat, train=train
        )
        if self.pooling == "max":
            x = VNMaxPool(name="pool")(x)
        else:
            x = mean_pool(x)  # [B, N, 21, 3]

        out1 = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(x, train=train)
        out2 = VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv2")(out1, train=train)
        out3 = VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv3")(out2, train=train)

        net_global = VNSTNkd(d=128 // 3, pooling=self.pooling, name="fstn")(
            out3, train=train
        )  # [B, 42, 3]
        net_global = jnp.broadcast_to(net_global[:, None], (B, N) + net_global.shape[1:])
        net_transformed = jnp.concatenate([out3, net_global], axis=-2)  # [B, N, 84, 3]

        out4 = VNLinearLeakyReLU(512 // 3, negative_slope=0.0, name="conv4")(
            net_transformed, train=train
        )
        out5 = VNBatchNorm(name="bn5")(VNLinear(2048 // 3, name="conv5")(out4), train=train)

        out5_mean = jnp.broadcast_to(out5.mean(axis=1, keepdims=True), out5.shape)
        out5 = jnp.concatenate([out5, out5_mean], axis=-2)  # [B, N, 1364, 3]
        out5, trans = VNStdFeature(normalize_frame=False, negative_slope=0.0,
                                   name="std_feature")(out5, train=train)
        out5 = out5.reshape(B, N, -1)  # [B, N, 4092]

        out_max = out5.max(axis=1)  # [B, 4092]
        out_max = jnp.concatenate([out_max, label], axis=-1)
        expand = jnp.broadcast_to(out_max[:, None, :], (B, N, out_max.shape[-1]))

        out1234 = jnp.concatenate([out1, out2, out3, out4], axis=-2)  # [B, N, 275, 3]
        out1234 = invariant_project(out1234, trans).reshape(B, N, -1)  # [B, N, 825]

        concat = jnp.concatenate([expand, out1234, out5], axis=-1)  # [B, N, 9025]

        net = _ConvBNRelu(256, name="convs1")(concat, train=train)
        net = _ConvBNRelu(256, name="convs2")(net, train=train)
        net = _ConvBNRelu(128, name="convs3")(net, train=train)
        net = nn.Dense(self.num_part, name="convs4")(net)
        return nn.log_softmax(net, axis=-1)
