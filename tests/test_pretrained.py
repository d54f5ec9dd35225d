"""Pretrained-backbone surgery tests (reference train.py:76-96 semantics):
.t7 (DataParallel 'module.' prefixes) and best_model.pth ('model_state_dict')
round-trips, plus the conv11 head swap on width mismatch."""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))


def _reference_backbone(out_features, k=8):
    from reference_baseline import load_reference_backbone

    return load_reference_backbone(out_features=out_features, k=k)


def _fresh_state(out_features, k=8):
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=16,
                      fixed_points=64, eucl_dim=out_features,
                      hyp_dim=out_features, k=k)
    system = HypHCSystem(cfg)
    batch = {"points": np.random.RandomState(0).randn(2, 64, 3).astype(np.float32),
             "labels": np.zeros((2, 64), np.int32),
             "category": np.zeros((2,), np.int32)}
    return system, system.init(jax.random.PRNGKey(0), batch), batch


def _forward(system, state, batch):
    import jax.nn

    dv = jax.nn.one_hot(jnp.asarray(batch["category"]), 16)
    x_e, _ = system.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["points"]), dv, train=False)
    return np.asarray(x_e)


@pytest.mark.parametrize("fmt", ["t7", "best_model"])
def test_raw_backbone_roundtrip(fmt, tmp_path):
    from hpcs_tpu.utils.torch_import import (graft_pretrained_backbone,
                                             load_raw_backbone_state_dict)

    torch.manual_seed(0)
    ref = _reference_backbone(out_features=16).eval()
    sd = ref.state_dict()
    if fmt == "t7":
        path = tmp_path / "model.partseg.vn_dgcnn.aligned.t7"
        torch.save({f"module.{k}": v for k, v in sd.items()}, str(path))
    else:
        path = tmp_path / "best_model.pth"
        torch.save({"model_state_dict": sd, "epoch": 3}, str(path))

    system, state, batch = _fresh_state(out_features=16)
    loaded = load_raw_backbone_state_dict(str(path))
    params, stats, swapped = graft_pretrained_backbone(
        loaded, state.params, state.batch_stats, out_features=16)
    assert not swapped
    state = state.replace(params=params, batch_stats=stats)

    ours = _forward(system, state, batch)
    with torch.no_grad():
        pts_t = torch.from_numpy(batch["points"]).transpose(2, 1).float()
        label_t = torch.eye(16)[torch.zeros(2, dtype=torch.long)]
        theirs = ref(pts_t, label_t).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_head_swap_on_width_mismatch(tmp_path):
    """Checkpoint head is 50-wide, model wants 16 -> conv11 must stay fresh,
    everything else must come from the checkpoint."""
    from hpcs_tpu.utils.torch_import import (graft_pretrained_backbone,
                                             load_raw_backbone_state_dict)

    torch.manual_seed(1)
    ref = _reference_backbone(out_features=50)
    path = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": ref.state_dict()}, str(path))

    system, state, batch = _fresh_state(out_features=16)
    fresh_conv11 = jax.tree_util.tree_map(np.asarray,
                                          state.params["backbone"]["conv11"])
    loaded = load_raw_backbone_state_dict(str(path))
    params, stats, swapped = graft_pretrained_backbone(
        loaded, state.params, state.batch_stats, out_features=16)
    assert swapped
    # conv11 untouched
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(fresh_conv11),
        jax.tree_util.tree_leaves_with_path(params["backbone"]["conv11"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))
    # conv1 grafted from the checkpoint (differs from fresh init)
    got = np.asarray(params["backbone"]["conv1"]["linear"]["kernel"])
    want = ref.state_dict()["conv1.map_to_feat.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # grafted state still runs
    state = state.replace(params=params, batch_stats=stats)
    out = _forward(system, state, batch)
    assert np.all(np.isfinite(out))


def test_pretrained_cli_errors_loudly_without_file(tmp_path, monkeypatch):
    """--pretrained with no checkpoint on disk must fail fast, not silently
    no-op (the round-1 dead-flag bug)."""
    monkeypatch.chdir(tmp_path)
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"), "--dataset", "synthetic",
         "--epochs", "1", "--batch", "2", "--fixed_points", "32", "--pretrained"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode != 0
    assert "pretrained" in (r.stderr + r.stdout).lower()
