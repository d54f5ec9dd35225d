"""Import reference (torch/Lightning) checkpoints into hpcs_tpu params.

Gives users of the reference a direct migration path: load a Lightning
`model.ckpt` (or a raw torch state_dict of VN_DGCNN_partseg) and map every
tensor onto the flax parameter tree of HypHCNet.  Orientation notes:

- torch Linear/Conv1d(k=1) weight is [out, in(, 1)]; flax Dense kernel is
  [in, out] -> transpose;
- VN layers: map_to_feat/map_to_dir/vn_lin weights -> (dir_)kernel transposed;
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats;
- Lightning prefixes: nn_feat.* (backbone), nn_emb.mlp.0.0.weight (embedder),
  scale, metric_hyp_loss.loss_cosface.W (same [emb, classes] orientation).

Tensors are consumed from a {name: np.ndarray} dict, so torch is only needed
by the caller that reads the file (see load_torch_state_dict).
"""
import numpy as np


def load_torch_state_dict(path):
    """Read a torch/Lightning checkpoint into {name: np.ndarray}."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv1d(w):
    # [out, in, 1] -> [in, out]
    w = np.asarray(w)
    if w.ndim == 3:
        w = w[..., 0]
    return _t(w)


def _vn_llr(sd, prefix):
    """VNLinearLeakyReLU torch -> flax subtree (params, batch_stats)."""
    params = {
        "linear": {"kernel": _t(sd[f"{prefix}.map_to_feat.weight"])},
        "dir_kernel": _t(sd[f"{prefix}.map_to_dir.weight"]),
        "batchnorm": {"bn": {
            "scale": np.asarray(sd[f"{prefix}.batchnorm.bn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.batchnorm.bn.bias"]),
        }},
    }
    stats = {"batchnorm": {"bn": {
        "mean": np.asarray(sd[f"{prefix}.batchnorm.bn.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.batchnorm.bn.running_var"]),
    }}}
    return params, stats


def _scalar_conv(sd, conv_key, bn_key):
    """Conv1d+BatchNorm1d sequential -> _ScalarConvBNRelu subtree."""
    params = {
        "Dense_0": {"kernel": _conv1d(sd[conv_key])},
        "BatchNorm_0": {
            "scale": np.asarray(sd[f"{bn_key}.weight"]),
            "bias": np.asarray(sd[f"{bn_key}.bias"]),
        },
    }
    stats = {"BatchNorm_0": {
        "mean": np.asarray(sd[f"{bn_key}.running_mean"]),
        "var": np.asarray(sd[f"{bn_key}.running_var"]),
    }}
    return params, stats


def convert_vn_dgcnn(sd, prefix=""):
    """Map a reference VN_DGCNN_partseg state_dict onto VNDGCNNPartSeg.

    Returns (params, batch_stats) nested dicts.  `prefix` is '' for a raw
    backbone state_dict or 'nn_feat.' inside a Lightning checkpoint.
    """
    p, s = {}, {}
    for name in ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]:
        p[name], s[name] = _vn_llr(sd, prefix + name)

    # VNStdFeature: vn1, vn2 + frame kernel
    std_p, std_s = {}, {}
    std_p["vn1"], std_s["vn1"] = _vn_llr(sd, prefix + "std_feature.vn1")
    std_p["vn2"], std_s["vn2"] = _vn_llr(sd, prefix + "std_feature.vn2")
    std_p["frame_kernel"] = _t(sd[prefix + "std_feature.vn_lin.weight"])
    p["std_feature"], s["std_feature"] = std_p, std_s

    # scalar head: conv7..conv10 are Sequential(Conv1d, BN, LeakyReLU);
    # conv11 is Sequential(Conv1d, BN) whose BN is the model-level bn11
    for i in range(7, 12):
        name = f"conv{i}"
        p[name], s[name] = _scalar_conv(sd, f"{prefix}{name}.0.weight", f"{prefix}{name}.1")
    return p, s


def convert_lightning_checkpoint(sd, flax_params, flax_stats, model_name="vn_dgcnn_partseg"):
    """Full Lightning model.ckpt -> (params, batch_stats) for HypHCNet.

    Unmapped modern-side leaves keep their current values (e.g. when the
    checkpoint lacks cosface weights).
    """
    import copy

    params = copy.deepcopy(flax_params)
    stats = copy.deepcopy(flax_stats)
    if model_name != "vn_dgcnn_partseg":
        raise NotImplementedError(
            f"checkpoint import implemented for vn_dgcnn_partseg, got {model_name}"
        )
    bp, bs = convert_vn_dgcnn(sd, prefix="nn_feat.")
    params["backbone"] = bp
    stats["backbone"] = bs
    if "scale" in sd:
        params["scale"] = np.asarray(sd["scale"]).reshape(1)
    if "metric_hyp_loss.loss_cosface.W" in sd:
        params["cosface_W"] = np.asarray(sd["metric_hyp_loss.loss_cosface.W"])
    emb_key = "nn_emb.mlp.0.0.weight"
    if emb_key in sd and "embedder" in params:
        params["embedder"] = {"Dense_0": {"kernel": _t(sd[emb_key])}}
    return params, stats
