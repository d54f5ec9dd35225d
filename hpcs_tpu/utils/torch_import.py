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


def load_raw_backbone_state_dict(path):
    """Read a raw pretrained VN-DGCNN backbone checkpoint in either format
    the reference's surgery consumes (/root/reference/train.py:76-96):

    - `model.partseg.vn_dgcnn.aligned.t7`: a torch-saved state_dict from
      DataParallel training — keys carry a 'module.' prefix to strip;
    - `best_model.pth`: a dict with a 'model_state_dict' entry.

    Returns {name: np.ndarray} with prefixes normalized.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state_dict" in payload:
        payload = payload["model_state_dict"]
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    out = {}
    for k, v in payload.items():
        if hasattr(v, "detach"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
        else:
            out[k.replace("module.", "")] = np.asarray(v)
    return out


def graft_pretrained_backbone(sd, params, batch_stats, out_features):
    """The reference's pretrained-weight surgery (train.py:76-96) on flax
    trees: graft every backbone tensor present in `sd` onto params/stats;
    when the checkpoint's conv11 width differs from `out_features`, keep the
    freshly initialized conv11 instead (the reference's head swap, which
    overwrites the checkpoint's conv11.* with the new module's tensors).
    Missing tensors keep current values (reference: load_state_dict
    strict=False).  Returns new (params, batch_stats).
    """
    import copy

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    new_p, new_s = convert_vn_dgcnn_partial(sd)

    head_w = sd.get("conv11.0.weight")
    swap_head = head_w is not None and int(np.asarray(head_w).shape[0]) != int(out_features)
    if swap_head:
        new_p.pop("conv11", None)
        new_s.pop("conv11", None)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst.setdefault(k, {}), v)
            else:
                if k in dst and tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    raise ValueError(
                        f"pretrained tensor {k} has shape {np.shape(v)}, "
                        f"model expects {np.shape(dst[k])}")
                dst[k] = v

    merge(params["backbone"], new_p)
    merge(batch_stats.setdefault("backbone", {}), new_s)
    return params, batch_stats, swap_head


def convert_vn_dgcnn_partial(sd, prefix=""):
    """Like convert_vn_dgcnn but tolerant of missing modules (strict=False
    semantics): converts only the subtrees whose tensors are all present."""
    p, s = {}, {}
    for name in ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]:
        if f"{prefix}{name}.map_to_feat.weight" in sd:
            p[name], s[name] = _vn_llr(sd, prefix + name)
    std_p, std_s = {}, {}
    if f"{prefix}std_feature.vn1.map_to_feat.weight" in sd:
        std_p["vn1"], std_s["vn1"] = _vn_llr(sd, prefix + "std_feature.vn1")
    if f"{prefix}std_feature.vn2.map_to_feat.weight" in sd:
        std_p["vn2"], std_s["vn2"] = _vn_llr(sd, prefix + "std_feature.vn2")
    if f"{prefix}std_feature.vn_lin.weight" in sd:
        std_p["frame_kernel"] = _t(sd[prefix + "std_feature.vn_lin.weight"])
    if std_p:
        p["std_feature"], s["std_feature"] = std_p, std_s
    for i in range(7, 12):
        name = f"conv{i}"
        if f"{prefix}{name}.0.weight" in sd and f"{prefix}{name}.1.weight" in sd:
            p[name], s[name] = _scalar_conv(sd, f"{prefix}{name}.0.weight",
                                            f"{prefix}{name}.1")
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
