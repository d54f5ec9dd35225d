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
