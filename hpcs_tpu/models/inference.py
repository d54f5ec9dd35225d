"""Fused inference engine for the flagship VN-DGCNN — KERNEL HARNESS ONLY.

RETIRED from serving (round-3 decision, VERDICT r2 #2: "win or retire").
Measured verdict on v5e, flagship shapes (B=16, N=1024, k=20):

- this engine: 340-356 clouds/s at every batch size vs the flax graph's
  826 (fp32) / 1328 (bf16) — 3.9x SLOWER end-to-end (BENCH_r02);
- the fused EdgeConv kernel beat its own XLA stage by only ~1.1x, while
  pinning fp32-HIGHEST with no bf16 path and no batch scaling;
- the structural reason it cannot win: Mosaic does not lower jnp.take /
  int-array indexing / take_along_axis inside kernels (tested on v5e,
  PLAN.md round-2), so in-kernel neighbor selection must be the same
  one-hot MXU matmuls XLA already emits for gather_neighbors — a kernel
  can only fuse the elementwise glue, which XLA's own fusions already
  cover (the forward trace's residue is a long tail of ~0.3 ms fusions).

What DOES serve from the Pallas work: the kNN score/top-k kernel (47 vs
100 ms at N=4096/B=8) via knn_auto inside the flax graph.

This module stays as the parity harness proving the kernels compute the
right thing (tests/test_inference_engine.py) and as the BN-folding
reference; bench.py no longer reports it as a serving path.
"""
import jax
import jax.numpy as jnp

from ..geometry import expmap0
from ..ops.knn import knn_auto
from ..ops.pallas.edgeconv_pallas import _vn_llr_block, fused_edgeconv_infer


def _bn_params(p, s):
    return dict(scale=p["scale"], bias=p["bias"], mean=s["mean"], var=s["var"])


def _fold(p, s, epsilon=1e-5):
    a = p["scale"] / jnp.sqrt(s["var"] + epsilon)
    return a, p["bias"] - s["mean"] * a


def _vn_stage_params(bp, bs, name):
    return dict(
        W=bp[name]["linear"]["kernel"],
        Wd=bp[name]["dir_kernel"],
        bn=_bn_params(bp[name]["batchnorm"]["bn"], bs[name]["batchnorm"]["bn"]),
    )


def _vn_llr_full(x, bp, bs, name, slope=0.2):
    """VNLinearLeakyReLU on [B, N, C, 3] with folded BN (XLA; pooled shapes)."""
    p = _vn_stage_params(bp, bs, name)
    B, N = x.shape[:2]
    out = _vn_llr_block(
        x.reshape(B * N, x.shape[2], 3), p["W"], p["Wd"],
        *_fold({"scale": p["bn"]["scale"], "bias": p["bn"]["bias"]},
               {"mean": p["bn"]["mean"], "var": p["bn"]["var"]}),
        slope,
    )
    return out.reshape(B, N, -1, 3)


def _scalar_head(x, p, s, relu=True, slope=0.2):
    a, b = _fold(p["BatchNorm_0"], s["BatchNorm_0"])
    y = x @ p["Dense_0"]["kernel"] * a + b
    return jax.nn.leaky_relu(y, slope) if relu else y


def vn_dgcnn_fast_forward(params, batch_stats, points, decode_vector, k):
    """Eval-mode forward of VNDGCNNPartSeg + embedder, fused for TPU.

    MEAN-pooling models only: the fused EdgeConv kernel mean-pools over
    neighbors.  A pooling='max' checkpoint carries VNMaxPool dir_kernel
    params — refuse loudly instead of silently mean-pooling a max model.

    Returns (x_euclidean [B, N, F], x_poincare [B, N, H]).
    """
    bp, bs = params["backbone"], batch_stats["backbone"]
    # pooling='max' checkpoints carry VNMaxPool modules named pool1..pool3
    # (vn_dgcnn.py:60-62, only instantiated for max pooling)
    if any(k.startswith("pool") for k in bp):
        raise NotImplementedError(
            "vn_dgcnn_fast_forward only supports pooling='mean'; these params "
            "carry VNMaxPool layers (pool1..pool3) — use the flax graph "
            "(system.net.apply) for max-pooling checkpoints")
    B, N, _ = points.shape

    # --- EdgeConv stages (fused Pallas kernels) ---
    idx = knn_auto(points, k)
    c1, c2 = _vn_stage_params(bp, bs, "conv1"), _vn_stage_params(bp, bs, "conv2")
    x1 = fused_edgeconv_infer(points[:, :, None, :], idx, c1["W"], c1["Wd"], c1["bn"],
                              c2["W"], c2["Wd"], c2["bn"])

    idx = knn_auto(x1.reshape(B, N, -1), k)
    c3, c4 = _vn_stage_params(bp, bs, "conv3"), _vn_stage_params(bp, bs, "conv4")
    x2 = fused_edgeconv_infer(x1, idx, c3["W"], c3["Wd"], c3["bn"],
                              c4["W"], c4["Wd"], c4["bn"])

    idx = knn_auto(x2.reshape(B, N, -1), k)
    c5 = _vn_stage_params(bp, bs, "conv5")
    x3 = fused_edgeconv_infer(x2, idx, c5["W"], c5["Wd"], c5["bn"], n_convs=1)

    x123 = jnp.concatenate([x1, x2, x3], axis=-2)  # [B, N, 63, 3]

    x = _vn_llr_full(x123, bp, bs, "conv6")  # [B, N, 341, 3]
    x_mean = jnp.broadcast_to(x.mean(axis=1, keepdims=True), x.shape)
    x = jnp.concatenate([x, x_mean], axis=-2)  # [B, N, 682, 3]

    # --- VNStdFeature (folded) ---
    sp, ss = bp["std_feature"], bs["std_feature"]
    z0 = _vn_llr_full(x, sp, ss, "vn1")
    z0 = _vn_llr_full(z0, sp, ss, "vn2")
    z0 = jnp.einsum("bncv,cd->bndv", z0, sp["frame_kernel"])  # [B, N, 3, 3]
    x_std = jnp.einsum("bncj,bnkj->bnck", x, z0)
    x123_inv = jnp.einsum("bncj,bnkj->bnck", x123, z0).reshape(B, N, -1)
    x_std = x_std.reshape(B, N, -1)

    x_global = x_std.max(axis=1)  # [B, 2046]
    l = _scalar_head(decode_vector, bp["conv7"], bs["conv7"])  # [B, 64]

    fused = jnp.concatenate([x_global, l], axis=-1)
    fused = jnp.broadcast_to(fused[:, None, :], (B, N, fused.shape[-1]))
    h = jnp.concatenate([fused, x123_inv], axis=-1)  # [B, N, 2299]

    h = _scalar_head(h, bp["conv8"], bs["conv8"])
    h = _scalar_head(h, bp["conv9"], bs["conv9"])
    h = _scalar_head(h, bp["conv10"], bs["conv10"])
    x_euclidean = _scalar_head(h, bp["conv11"], bs["conv11"], relu=False)

    # --- embedder ---
    emb = params.get("embedder", {})
    if "Dense_0" in emb:
        x_poincare = expmap0(x_euclidean @ emb["Dense_0"]["kernel"])
    else:
        x_poincare = expmap0(x_euclidean)
    return x_euclidean, x_poincare
