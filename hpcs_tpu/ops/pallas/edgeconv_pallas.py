"""Fused EdgeConv inference kernel for TPU.

One VN-DGCNN EdgeConv stage is: gather k neighbors -> edge features
[neighbor - center || center] -> VNLinearLeakyReLU x2 (channel-mix matmul,
BatchNorm on vector norms, direction-gated leaky ReLU) -> mean pool over k.
The XLA path materializes every intermediate of the [B, N, K, 2C, 3] edge
tensor in HBM (gather, concat, both conv outputs, both direction tensors,
gate results — several ~0.7 GB round trips at B=64/N=1024/K=20).  Here XLA
produces the edge tensor once (gather+sub+concat fuse into a single write)
and a Pallas kernel runs conv -> norm-BN -> gated ReLU -> conv -> pool
entirely in VMEM, writing only the pooled [B, N, C_out, 3] result: one read
+ one small write instead of ~5 round trips.

Layout: channels live on the *lane* axis — [rows*3, C] — so every channel
mix is a plain MXU matmul and every in-kernel reshape only merges/splits
sublane dimensions (Mosaic cannot relayout lanes).

Inference-only: BatchNorm uses running statistics (per-channel affine on
vector norms), so no cross-tile reduction is needed.  Training stays on XLA.
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


def _gated_block(e, W, Wd, a, b, slope, rows):
    """One VNLinearLeakyReLU with folded BN.

    e: [rows*3, C_in] (vector components interleaved in sublanes);
    returns [rows*3, C_out].
    """
    p = jnp.dot(e, W, preferred_element_type=jnp.float32)
    d = jnp.dot(e, Wd, preferred_element_type=jnp.float32)
    c = p.shape[-1]
    p3 = p.reshape(rows, 3, c)
    d3 = d.reshape(rows, 3, c)
    norm = jnp.sqrt(jnp.sum(p3 * p3, axis=1) + EPS * EPS) + EPS  # [rows, c]
    p3 = p3 * ((a * norm + b) / norm)[:, None, :]
    dot = jnp.sum(p3 * d3, axis=1)  # [rows, c]
    dsq = jnp.sum(d3 * d3, axis=1)
    mask = (dot >= 0).astype(p3.dtype)
    coeff = (dot / (dsq + EPS)) * (1.0 - mask)
    out = slope * p3 + (1 - slope) * (p3 - coeff[:, None, :] * d3)
    return out.reshape(rows * 3, c)


def _edgeconv_kernel(e_ref, w1_ref, wd1_ref, ab1_ref, w2_ref, wd2_ref, ab2_ref,
                     out_ref, *, k, slope, n_convs):
    rows3 = e_ref.shape[1]  # tn * k * 3
    rows = rows3 // 3
    tn = rows // k
    e = e_ref[0]  # [tn*k*3, 2C] — already lane-major, no reshape needed

    h = _gated_block(e, w1_ref[:], wd1_ref[:], ab1_ref[0], ab1_ref[1], slope, rows)
    if n_convs == 2:
        h = _gated_block(h, w2_ref[:], wd2_ref[:], ab2_ref[0], ab2_ref[1], slope, rows)

    c_out = h.shape[-1]
    out_ref[0] = jnp.mean(h.reshape(tn, k, 3, c_out), axis=1).reshape(tn * 3, c_out)


def _pick_row_tile(n, k, c):
    budget = 6 * 1024 * 1024  # VMEM bytes for the edge block
    for tn in (128, 64, 32, 16, 8):
        if n % tn == 0 and tn * k * 3 * c * 4 <= budget:
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
    # The Mosaic compile of this kernel is currently pathologically slow on
    # the v5e AOT toolchain (>20 min; suspected interaction of tiny lane dims
    # with the sublane-split reshapes), so the kernel is opt-in via
    # HPCS_TPU_FUSED_EDGECONV=1 until that is resolved; the XLA fallback
    # below is numerically identical.
    import os

    on_tpu = (jax.default_backend() == "tpu"
              and os.environ.get("HPCS_TPU_FUSED_EDGECONV") == "1")
    if not HAVE_PALLAS or tn is None or not (on_tpu or interpret):
        return _edgeconv_xla(x, idx, W1, Wd1, ab1, W2, Wd2, ab2, slope, n_convs)

    x = x.astype(jnp.float32)
    nbr = gather_neighbors(x, idx)  # [B, N, K, C, 3]
    center = jnp.broadcast_to(x[:, :, None], nbr.shape)
    # single fused XLA producer, flattened lane-major: [B, N*K*3, 2C]
    e = jnp.concatenate([nbr - center, center], axis=-2).transpose(0, 1, 2, 4, 3)
    e = e.reshape(B, N * K * 3, 2 * C)

    kernel = functools.partial(_edgeconv_kernel, k=K, slope=slope, n_convs=n_convs)
    grid = (B, N // tn)
    rows3 = tn * K * 3
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows3, 2 * C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn * 3, C_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N * 3, C_out), jnp.float32),
        interpret=interpret,
    )(e, W1, Wd1, ab1, W2, Wd2, ab2)
    return out.reshape(B, N, 3, C_out).transpose(0, 1, 3, 2)  # -> [B, N, C_out, 3]


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
