from .vn_dgcnn import VNDGCNNPartSeg


def make_backbone(cfg):
    """Backbone dispatch mirroring configure_feature_extractor
    (/root/reference/train.py:64-97)."""
    if cfg.model_name == "vn_dgcnn_partseg":
        import jax.numpy as jnp

        return VNDGCNNPartSeg(
            out_features=cfg.eucl_dim,
            k=cfg.k,
            dropout=cfg.dropout,
            pooling=cfg.pooling,
            num_categories=cfg.num_categories,
            compute_dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
            layout=cfg.layout,
        )
    if cfg.model_name in ("dgcnn_partseg", "pointnet_partseg", "vn_pointnet_partseg") \
            and cfg.eucl_dim != cfg.num_class:
        # the reference wires these backbones' output width to NUM_CLASS, not
        # out_features (train.py:66,70-72), while the embedder/CosFace expect
        # eucl_embedding-wide features (train.py:200) — any other combination
        # crashes deep inside a matmul there too.  Fail with the fix instead.
        raise ValueError(
            f"{cfg.model_name} outputs num_class={cfg.num_class}-wide features "
            f"(reference train.py:66: out_features=num_class) but "
            f"--eucl_embedding is {cfg.eucl_dim}; set --eucl_embedding "
            f"{cfg.num_class} (and --hyp_embedding accordingly) for this model")
    if cfg.model_name == "dgcnn_partseg":
        from .dgcnn import DGCNNPartSeg

        return DGCNNPartSeg(
            out_features=cfg.num_class,
            k=cfg.k,
            dropout=cfg.dropout,
            num_categories=cfg.num_categories,
        )
    if cfg.model_name == "pointnet_partseg":
        from .pointnet import PointNetPartSeg

        return PointNetPartSeg(num_part=cfg.num_class, num_categories=cfg.num_categories)
    if cfg.model_name == "vn_pointnet_partseg":
        from .vn_pointnet import VNPointNetPartSeg

        return VNPointNetPartSeg(
            num_part=cfg.num_class, k=cfg.k, pooling=cfg.pooling,
            num_categories=cfg.num_categories,
        )
    raise ValueError(f"Not implemented for model_name {cfg.model_name}")


__all__ = ["VNDGCNNPartSeg", "make_backbone"]
