"""k-nearest-neighbor graph construction (XLA reference path).

Behavioral reference: /root/reference/hpcs/nn/dgcnn/utils/vn_dgcnn_util.py:4-10
(dense Gram matrix of negative squared distances + top-k; neighbors include
the point itself since d(i, i) = 0 is maximal).

TPU notes: the Gram matrix is a single MXU matmul; `jax.lax.top_k` keeps the
[B, N, N] score matrix in fp32.  For large N a fused Pallas kernel that never
materializes the N x N matrix in HBM lives in hpcs_tpu.ops.pallas.
"""
import jax
import jax.numpy as jnp


def pairwise_neg_sqdist(x, y=None):
    """Negative squared Euclidean distances.  x: [B, N, D], y: [B, M, D] ->
    [B, N, M].  Computed as -(|x|^2 - 2 x.y + |y|^2) with the inner product on
    the MXU in fp32."""
    if y is None:
        y = x
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    # HIGHEST precision: the TPU default (single-pass bf16) perturbs scores
    # enough to flip ~12% of neighbor entries under rotation, destroying the
    # SO(3) invariance of everything downstream
    inner = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return 2.0 * inner - x2[..., :, None] - y2[..., None, :]


def knn(x, k):
    """Indices of the k nearest neighbors (self included) for each point.

    x: [B, N, D] -> idx [B, N, k], nearest-first (matches torch.topk order on
    the negative-distance matrix).
    """
    scores = pairwise_neg_sqdist(x)
    _, idx = jax.lax.top_k(scores, k)
    return idx


import contextlib
import contextvars

# trace-scoped (and thread-local) pin to the XLA kNN path — used by GSPMD
# forwards whose graphs must be partitionable (pallas_call is not); a
# contextvar instead of an env var so a long compile in one thread cannot
# flip the dispatch of unrelated traces
_FORCE_XLA_KNN = contextvars.ContextVar("hpcs_tpu_force_xla_knn", default=False)


@contextlib.contextmanager
def force_xla_knn():
    token = _FORCE_XLA_KNN.set(True)
    try:
        yield
    finally:
        _FORCE_XLA_KNN.reset(token)


def knn_auto(x, k):
    """Dispatch to the fused Pallas kernel on TPU (HBM-traffic-free scores),
    the XLA path elsewhere.  Set HPCS_TPU_DISABLE_PALLAS=1 (or enter
    force_xla_knn()) to force XLA."""
    import os

    forced = _FORCE_XLA_KNN.get() or os.environ.get("HPCS_TPU_DISABLE_PALLAS") == "1"
    if not forced and jax.default_backend() == "tpu":
        from .pallas.knn_pallas import knn_pallas

        return knn_pallas(x, k)
    return knn(x, k)


def gather_neighbors(x, idx):
    """Gather per-point neighbor features.  x: [B, N, ...], idx: [B, N, K] ->
    [B, N, K, ...].

    On TPU the gather is a ONE-HOT MATMUL on the MXU: selection by a 0/1
    matrix is numerically EXACT (one nonzero product per output row; fp32
    needs HIGHEST so the 0/1 entries multiply full-precision values) and
    measured ~2x faster than XLA's dynamic row gather at the flagship shape
    (bf16: 1.7 vs 4.0 ms, fp32: 2.2 vs 4.4 ms at B=16/N=1024/K=20/C=21 —
    the EdgeConv stages' dominant cost).  Elsewhere (CPU tests) the plain
    indexed gather is faster.  HPCS_TPU_GATHER=auto|onehot|index overrides
    (auto = one-hot on TPU only).
    """
    import os

    mode = os.environ.get("HPCS_TPU_GATHER", "auto")
    if mode == "onehot" or (mode == "auto" and jax.default_backend() == "tpu"):
        N = x.shape[1]
        oh = jax.nn.one_hot(idx, N, dtype=x.dtype)  # [B, N, K, N]
        # emit the [B, N, K, ...] result directly from the contraction — a
        # flat [B, N*K, C] einsum + reshape costs a 2.5 ms layout copy at
        # the flagship shape, the 5-D form none
        return jnp.einsum("bnkm,bm...->bnk...", oh, x,
                          precision=jax.lax.Precision.HIGHEST)
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)
