"""Fused EdgeConv inference kernel for TPU.

One VN-DGCNN EdgeConv stage is: gather k neighbors -> edge features
[neighbor - center || center] -> VNLinearLeakyReLU x2 (channel-mix matmul,
BatchNorm on vector norms, direction-gated leaky ReLU) -> mean pool over k.
The XLA path materializes every intermediate of the edge tensor in HBM
(gather, concat, both conv outputs, both direction tensors, gate results —
several ~0.7 GB round trips at B=64/N=1024/K=20).  Here XLA produces the
edge tensor once (gather+sub+concat+transpose fuse into a single write) and
a Pallas kernel runs conv -> norm-BN -> gated ReLU -> conv -> pool entirely
in VMEM, writing only the pooled result: one read + one small write instead
of ~5 round trips.

Kernel design (v2 — the round-1 version hung the Mosaic compiler >20 min):
component-major blocks [3, rows, C].  The three vector components are
statically indexed into three independent 2-D [rows, C] arrays, so every
in-kernel op is a plain 2-D matmul or elementwise op — no reshapes, no
sublane splits, nothing for Mosaic to relayout.  The mean-pool over k runs
as one MXU matmul against an iota-built block-diagonal averaging matrix.

Inference-only: BatchNorm uses running statistics (per-channel affine on
vector norms), so no cross-tile reduction is needed.  Training stays on XLA.

Behavioral reference: /root/reference/hpcs/nn/dgcnn/utils/vn_dgcnn_util.py:13-41
(get_graph_feature) + vn_layers.py:48-77 (VNLinearLeakyReLU) + :152 (mean_pool).
"""
import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

EPS = 1e-6  # matches hpcs_tpu.nn.vn.layers.EPS


def _affine_from_bn(scale, bias, mean, var, epsilon=1e-5):
    """Collapse inference BatchNorm to y = a * x + b."""
    a = scale / jnp.sqrt(var + epsilon)
    return a, bias - mean * a


def _gated3(e, W, Wd, a, b, slope):
    """One VNLinearLeakyReLU with folded BN on component-separated features.

    e: 3-tuple of [rows, C_in]; returns a 3-tuple of [rows, C_out].
    HIGHEST matmul precision: single-pass bf16 would break the SO(3)
    invariance discipline (see nn.vn.layers._channel_mix).
    """
    hi = jax.lax.Precision.HIGHEST
    p = [jnp.dot(ev, W, preferred_element_type=jnp.float32, precision=hi)
         for ev in e]
    d = [jnp.dot(ev, Wd, preferred_element_type=jnp.float32, precision=hi)
         for ev in e]
    norm = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2] + EPS * EPS) + EPS
    aff = (a * norm + b) / norm
    p = [pv * aff for pv in p]
    dot = p[0] * d[0] + p[1] * d[1] + p[2] * d[2]
    dsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    coeff = (dot / (dsq + EPS)) * (dot < 0).astype(jnp.float32)
    return tuple(slope * pv + (1.0 - slope) * (pv - coeff * dv)
                 for pv, dv in zip(p, d))


def _edgeconv_kernel(e_ref, w1_ref, wd1_ref, ab1_ref, w2_ref, wd2_ref, ab2_ref,
                     out_ref, *, k, slope, n_convs):
    rows = e_ref.shape[2]  # tn * k
    tn = rows // k
    e = (e_ref[0, 0], e_ref[0, 1], e_ref[0, 2])
    h = _gated3(e, w1_ref[:], wd1_ref[:], ab1_ref[0], ab1_ref[1], slope)
    if n_convs == 2:
        h = _gated3(h, w2_ref[:], wd2_ref[:], ab2_ref[0], ab2_ref[1], slope)
    # mean over k as an MXU matmul: P[i, j] = (j // k == i) / k
    src = jax.lax.broadcasted_iota(jnp.int32, (tn, rows), 1) // k
    tgt = jax.lax.broadcasted_iota(jnp.int32, (tn, rows), 0)
    P = (src == tgt).astype(jnp.float32) * (1.0 / k)
    out_ref[0, 0] = jnp.dot(P, h[0], preferred_element_type=jnp.float32)
    out_ref[0, 1] = jnp.dot(P, h[1], preferred_element_type=jnp.float32)
    out_ref[0, 2] = jnp.dot(P, h[2], preferred_element_type=jnp.float32)


def _pick_row_tile(n, k, c):
    # scoped VMEM ~20x the edge block (double buffering + conv/gate
    # intermediates + the pooling matrix); keep the block small enough that
    # the whole scope fits the 32M limit requested below
    budget = 1024 * 1024
    for tn in (128, 64, 32, 16, 8):
        if n % tn == 0 and 3 * tn * k * c * 4 <= budget:
            return tn
    return None


@functools.partial(jax.jit, static_argnames=("slope", "interpret", "n_convs"))
def fused_edgeconv_infer(x, idx, W1, Wd1, bn1, W2=None, Wd2=None, bn2=None,
                         slope=0.2, interpret=False, n_convs=2):
    """One full EdgeConv stage (eval-mode BN), mean-pooled over neighbors.

    x: [B, N, C, 3]; idx: [B, N, K] neighbor indices;
    W*: [2C_in, C_out] / [C1, C2] channel mixers; Wd*: direction mixers;
    bn*: dicts with scale/bias/mean/var arrays.  Returns [B, N, C_out, 3].
    """
    from ..knn import gather_neighbors

    B, N, C, _ = x.shape
    K = idx.shape[-1]
    a1, b1 = _affine_from_bn(bn1["scale"], bn1["bias"], bn1["mean"], bn1["var"])
    ab1 = jnp.stack([a1, b1])
    if n_convs == 2:
        a2, b2 = _affine_from_bn(bn2["scale"], bn2["bias"], bn2["mean"], bn2["var"])
        ab2 = jnp.stack([a2, b2])
        C_out = W2.shape[1]
    else:
        W2 = jnp.zeros((1, 1), jnp.float32)
        Wd2 = jnp.zeros((1, 1), jnp.float32)
        ab2 = jnp.zeros((2, 1), jnp.float32)
        C_out = W1.shape[1]

    tn = _pick_row_tile(N, K, 2 * C)
    import os

    off = os.environ.get("HPCS_TPU_FUSED_EDGECONV") == "0"
    on_tpu = jax.default_backend() == "tpu" and not off
    if not HAVE_PALLAS or tn is None or not (on_tpu or interpret):
        return _edgeconv_xla(x, idx, W1, Wd1, ab1, W2, Wd2, ab2, slope, n_convs)

    x = x.astype(jnp.float32)
    # component-major gather: transpose the SMALL per-point tensor first so
    # the big edge tensor is born in kernel order — no [B,N,K,C,3] ->
    # [B,3,N*K,2C] relayout of ~165 MB
    x_cm = x.transpose(0, 3, 1, 2)  # [B, 3, N, C]
    nbr = jax.vmap(lambda xc, ib: xc[:, ib])(x_cm, idx)  # [B, 3, N, K, C]
    center = jnp.broadcast_to(x_cm[:, :, :, None], nbr.shape)
    e = jnp.concatenate([nbr - center, center], axis=-1)  # [B, 3, N, K, 2C]
    e = e.reshape(B, 3, N * K, 2 * C)

    kernel = functools.partial(_edgeconv_kernel, k=K, slope=slope, n_convs=n_convs)
    grid = (B, N // tn)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tn * K, 2 * C), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tn, C_out), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, N, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(e, W1, Wd1, ab1, W2, Wd2, ab2)
    return out.transpose(0, 2, 3, 1)  # -> [B, N, C_out, 3]


def _vn_llr_block(e, W, Wd, a, b, slope):
    """VNLinearLeakyReLU on [R, C_in, 3] with BN folded to (a, b) — XLA path
    shared with the fused inference engine for pooled (non-edge) tensors."""
    p = jnp.einsum("rcv,cd->rdv", e, W, preferred_element_type=jnp.float32)
    norm = jnp.sqrt(jnp.sum(p * p, axis=-1) + EPS * EPS) + EPS
    p = p / norm[..., None] * (a * norm + b)[..., None]
    d = jnp.einsum("rcv,cd->rdv", e, Wd, preferred_element_type=jnp.float32)
    dot = jnp.sum(p * d, axis=-1, keepdims=True)
    dsq = jnp.sum(d * d, axis=-1, keepdims=True)
    mask = (dot >= 0).astype(p.dtype)
    proj = p - (dot / (dsq + EPS)) * d
    return slope * p + (1 - slope) * (mask * p + (1 - mask) * proj)


def _edgeconv_xla(x, idx, W1, Wd1, ab1, W2, Wd2, ab2, slope, n_convs=2):
    """Reference XLA path with identical (BN-folded) math for fallback/tests."""
    from ..knn import gather_neighbors

    nbr = gather_neighbors(x, idx)  # [B, N, K, C, 3]
    center = jnp.broadcast_to(x[:, :, None], nbr.shape)
    e = jnp.concatenate([nbr - center, center], axis=-2)
    B, N, K = e.shape[:3]
    e = e.reshape(B * N * K, e.shape[-2], 3)
    h = _vn_llr_block(e, W1, Wd1, ab1[0], ab1[1], slope)
    if n_convs == 2:
        h = _vn_llr_block(h, W2, Wd2, ab2[0], ab2[1], slope)
    return h.reshape(B, N, K, -1, 3).mean(axis=2)
