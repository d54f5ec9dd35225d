"""Fused EdgeConv inference kernel for TPU.

One VN-DGCNN EdgeConv stage is: gather k neighbors -> edge features
[neighbor - center || center] -> VNLinearLeakyReLU x2 (channel-mix matmul,
BatchNorm on vector norms, direction-gated leaky ReLU) -> mean pool over k.

The XLA path materializes the [B, N, K, 2C, 3] edge tensor in HBM and — the
dominant cost — runs the neighbor gather through XLA's scalar-ish dynamic
gather (~7 ms alone at B=16/N=1024/K=20/C=21, measured).  This kernel never
builds the edge tensor at all: the whole (component-major) cloud sits in
VMEM and each neighbor set is selected by a ONE-HOT MATMUL on the MXU
(selection by a 0/1 matrix is exact in fp32 at HIGHEST precision), then
conv -> folded-BN -> gated ReLU -> conv -> mean-pool run in registers and
only the pooled [B, N, C_out, 3] result is written.

Kernel design notes (the round-1 version hung the Mosaic compiler; the fix
is structural): everything is a plain 2-D matmul or elementwise op — the
three vector components are statically indexed into separate [rows, C]
arrays, the k-loop is a fori_loop carrying three [tn, C_out] accumulators,
and there are NO in-kernel reshapes or transposes (the one-hot is built
transposed so the selection contracts over its leading axis).

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


def _gate(p, d, a, b, slope):
    """Folded-BN + direction-gated leaky ReLU on component triples.

    p, d: 3-tuples of [rows, C]; a, b: [1, C] affines. Matches
    nn.vn.layers._vn_leaky_relu + VNBatchNorm exactly (eval mode).
    """
    norm = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2] + EPS * EPS) + EPS
    aff = (a * norm + b) / norm
    p = tuple(pv * aff for pv in p)
    dot = p[0] * d[0] + p[1] * d[1] + p[2] * d[2]
    dsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    coeff = (dot / (dsq + EPS)) * (dot < 0).astype(jnp.float32)
    return tuple(slope * pv + (1.0 - slope) * (pv - coeff * dv)
                 for pv, dv in zip(p, d))


def _edgeconv_gather_kernel(x_ref, idxT_ref, w1a_ref, w1b_ref, wd1a_ref,
                            wd1b_ref, ab1_ref, w2_ref, wd2_ref, ab2_ref,
                            out_ref, *, k, tn, n_points, slope, n_convs):
    hi = jax.lax.Precision.HIGHEST
    i = pl.program_id(1)
    base = pl.multiple_of(i * tn, tn)
    x = (x_ref[0, 0], x_ref[0, 1], x_ref[0, 2])  # [N, C] per component
    # centers: dynamic-slice the REF (Mosaic lowers pl.ds on refs, not on values)
    c = tuple(x_ref[0, v, pl.ds(base, tn), :] for v in range(3))  # [tn, C]
    # center half of conv1 is k-independent: precompute
    w1b, wd1b = w1b_ref[:], wd1b_ref[:]
    p_c = tuple(jnp.dot(cv, w1b, preferred_element_type=jnp.float32,
                        precision=hi) for cv in c)
    d_c = tuple(jnp.dot(cv, wd1b, preferred_element_type=jnp.float32,
                        precision=hi) for cv in c)
    w1a, wd1a = w1a_ref[:], wd1a_ref[:]
    a1, b1 = ab1_ref[0:1, :], ab1_ref[1:2, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_points, tn), 0)

    c2 = out_ref.shape[-1]
    acc0 = jnp.zeros((tn, c2), jnp.float32)

    def body(kk, acc):
        idx_k = idxT_ref[0, pl.ds(kk, 1), :]  # [1, tn]
        # transposed one-hot: Gt[m, r] = (m == idx[r]); selection contracts
        # over the cloud axis -> nbr[r] = x[idx[r]] EXACTLY (0/1 matrix at
        # HIGHEST precision)
        Gt = (row_ids == idx_k).astype(jnp.float32)  # [N, tn]

        def sel(xv):
            return jax.lax.dot_general(
                Gt, xv, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)

        nbr = tuple(sel(xv) for xv in x)  # [tn, C]
        diff = tuple(nv - cv for nv, cv in zip(nbr, c))
        # conv1 on [diff || center] without a lane concat: split weights
        p = tuple(jnp.dot(dv, w1a, preferred_element_type=jnp.float32,
                          precision=hi) + pc for dv, pc in zip(diff, p_c))
        d = tuple(jnp.dot(dv, wd1a, preferred_element_type=jnp.float32,
                          precision=hi) + dc for dv, dc in zip(diff, d_c))
        h = _gate(p, d, a1, b1, slope)
        if n_convs == 2:
            p2 = tuple(jnp.dot(hv, w2_ref[:], preferred_element_type=jnp.float32,
                               precision=hi) for hv in h)
            d2 = tuple(jnp.dot(hv, wd2_ref[:], preferred_element_type=jnp.float32,
                               precision=hi) for hv in h)
            h = _gate(p2, d2, ab2_ref[0:1, :], ab2_ref[1:2, :], slope)
        return (acc[0] + h[0], acc[1] + h[1], acc[2] + h[2])

    acc = jax.lax.fori_loop(0, k, body, (acc0, acc0, acc0))
    inv_k = 1.0 / k
    out_ref[0, 0] = acc[0] * inv_k
    out_ref[0, 1] = acc[1] * inv_k
    out_ref[0, 2] = acc[2] * inv_k


def _pick_row_tile(n, k, c):
    # VMEM scope: x block (3*N*C), one-hot (N*tn), per-k intermediates
    for tn in (128, 64, 32, 16, 8):
        if n % tn == 0 and n * tn * 4 + 3 * n * c * 4 <= 3 * 1024 * 1024:
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

    x_cm = x.astype(jnp.float32).transpose(0, 3, 1, 2)  # [B, 3, N, C] (small)
    idxT = idx.astype(jnp.int32).transpose(0, 2, 1)  # [B, K, N] (small)
    # edge features are [neighbor - center || center]: split each [2C, C_out]
    # mixer into its difference/center halves so the kernel never concats
    W1a, W1b = W1[:C], W1[C:]
    Wd1a, Wd1b = Wd1[:C], Wd1[C:]

    kernel = functools.partial(_edgeconv_gather_kernel, k=K, tn=tn,
                               n_points=N, slope=slope, n_convs=n_convs)
    grid = (B, N // tn)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, N, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, tn), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            vmem_full, vmem_full, vmem_full, vmem_full, vmem_full,
            vmem_full, vmem_full, vmem_full,
        ],
        out_specs=pl.BlockSpec((1, 3, tn, C_out), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, N, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(x_cm, idxT, W1a, W1b, Wd1a, Wd1b, ab1, W2, Wd2, ab2)
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
