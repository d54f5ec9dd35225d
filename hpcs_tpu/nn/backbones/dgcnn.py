"""Plain (scalar) DGCNN part-segmentation backbone.

Behavioral reference: /root/reference/hpcs/nn/dgcnn/dgcnn_partseg.py:9-108 and
the input-alignment Transform_Net (utils/transform_net.py:6-50, identity-init
3x3).  Scalar edge features, max pooling over neighbors, 1280-channel fused
head.  Layout: [B, N, C] point features, [B, N, K, C] edge features.
"""
import jax.numpy as jnp
from flax import linen as nn

from ...ops.edgeconv import graph_feature_scalar
from .vn_dgcnn import _ScalarConvBNRelu


class TransformNet(nn.Module):
    """Learned 3x3 input alignment, initialized to the identity."""

    @nn.compact
    def __call__(self, edge_feat, train: bool = True):
        # edge_feat: [B, N, K, 6]
        x = _ScalarConvBNRelu(64, name="conv1")(edge_feat, train=train)
        x = _ScalarConvBNRelu(128, name="conv2")(x, train=train)
        x = x.max(axis=2)  # over K -> [B, N, 128]
        x = _ScalarConvBNRelu(1024, name="conv3")(x, train=train)
        x = x.max(axis=1)  # over N -> [B, 1024]
        x = _ScalarConvBNRelu(512, name="linear1")(x, train=train)
        x = _ScalarConvBNRelu(256, name="linear2")(x, train=train)
        t = nn.Dense(
            9,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, d=jnp.float32: jnp.eye(3, dtype=d).reshape(9),
            name="transform",
        )(x)
        return t.reshape(-1, 3, 3)


class DGCNNPartSeg(nn.Module):
    """Scalar DGCNN returning per-point features [B, N, out_features]."""

    out_features: int
    k: int = 20
    dropout: float = 0.5
    num_categories: int = 16

    @nn.compact
    def __call__(self, points, label, train: bool = True):
        B, N, _ = points.shape

        e0, _ = graph_feature_scalar(points, self.k)  # [B, N, K, 6]
        t = TransformNet(name="transform_net")(e0, train=train)
        x = jnp.einsum("bnc,bcd->bnd", points, t)

        e, _ = graph_feature_scalar(x, self.k)
        e = _ScalarConvBNRelu(64, name="conv1")(e, train=train)
        e = _ScalarConvBNRelu(64, name="conv2")(e, train=train)
        x1 = e.max(axis=2)  # [B, N, 64]

        e, _ = graph_feature_scalar(x1, self.k)
        e = _ScalarConvBNRelu(64, name="conv3")(e, train=train)
        e = _ScalarConvBNRelu(64, name="conv4")(e, train=train)
        x2 = e.max(axis=2)

        e, _ = graph_feature_scalar(x2, self.k)
        e = _ScalarConvBNRelu(64, name="conv5")(e, train=train)
        x3 = e.max(axis=2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 192]
        x = _ScalarConvBNRelu(1024, name="conv6")(x, train=train)
        x_global = x.max(axis=1)  # [B, 1024]

        l = _ScalarConvBNRelu(64, name="conv7")(label, train=train)
        fused = jnp.concatenate([x_global, l], axis=-1)  # [B, 1088]
        fused = jnp.broadcast_to(fused[:, None, :], (B, N, fused.shape[-1]))
        h = jnp.concatenate([fused, x1, x2, x3], axis=-1)  # [B, N, 1280]

        h = _ScalarConvBNRelu(256, name="conv8")(h, train=train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _ScalarConvBNRelu(256, name="conv9")(h, train=train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _ScalarConvBNRelu(128, name="conv10")(h, train=train)
        h = nn.Dense(self.out_features, use_bias=False, name="conv11")(h)
        return h
