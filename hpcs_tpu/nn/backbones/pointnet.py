"""Classic PointNet part-segmentation backbone.

Behavioral reference: /root/reference/hpcs/nn/pointnet/pointnet_partseg.py:9-74
with STN3d/STNkd from pointnet.py:10-85 (identity-added learned transforms)
and the 4944-channel fused head.  Layout [B, N, C]; 1x1 convs become Dense.
Note: like the reference, the final activation is log_softmax over num_part —
this backbone's "embedding" is a log-probability vector.
"""
import jax.numpy as jnp
from flax import linen as nn


class _ConvBNRelu(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class STNkd(nn.Module):
    """Learned k x k feature transform, identity-added."""

    k: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: [B, N, k]
        h = _ConvBNRelu(64)(x, train=train)
        h = _ConvBNRelu(128)(h, train=train)
        h = _ConvBNRelu(1024)(h, train=train)
        h = h.max(axis=1)  # [B, 1024]
        h = _ConvBNRelu(512)(h, train=train)
        h = _ConvBNRelu(256)(h, train=train)
        t = nn.Dense(self.k * self.k)(h)
        eye = jnp.eye(self.k, dtype=t.dtype).reshape(1, -1)
        return (t + eye).reshape(-1, self.k, self.k)


class PointNetPartSeg(nn.Module):
    """Returns per-point log-softmax scores [B, N, num_part]."""

    num_part: int = 50
    num_categories: int = 16

    @nn.compact
    def __call__(self, points, label, train: bool = True):
        B, N, _ = points.shape
        trans = STNkd(k=3, name="stn")(points, train=train)
        x = jnp.einsum("bnc,bcd->bnd", points, trans)

        out1 = _ConvBNRelu(64, name="conv1")(x, train=train)
        out2 = _ConvBNRelu(128, name="conv2")(out1, train=train)
        out3 = _ConvBNRelu(128, name="conv3")(out2, train=train)

        trans_feat = STNkd(k=128, name="fstn")(out3, train=train)
        net_transformed = jnp.einsum("bnc,bcd->bnd", out3, trans_feat)

        out4 = _ConvBNRelu(512, name="conv4")(net_transformed, train=train)
        out5 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn5")(
            nn.Dense(2048, name="conv5")(out4)
        )
        out_max = out5.max(axis=1)  # [B, 2048]

        out_max = jnp.concatenate([out_max, label], axis=-1)
        expand = jnp.broadcast_to(out_max[:, None, :], (B, N, out_max.shape[-1]))
        concat = jnp.concatenate([expand, out1, out2, out3, out4, out5], axis=-1)

        net = _ConvBNRelu(256, name="convs1")(concat, train=train)
        net = _ConvBNRelu(256, name="convs2")(net, train=train)
        net = _ConvBNRelu(128, name="convs3")(net, train=train)
        net = nn.Dense(self.num_part, name="convs4")(net)
        return nn.log_softmax(net, axis=-1)
