"""Numerical parity: our VN-DGCNN vs the reference torch implementation.

Random-initializes the reference backbone (imported read-only from
/root/reference), ports its weights through the torch->flax converter, and
compares forward outputs on identical inputs.  This validates every layer's
algebra, layout transposition, and BN semantics in one shot.

Skipped when torch or the reference tree is unavailable.
"""
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


def _load_reference(out_features, k, num_categories=16):
    from reference_baseline import load_reference_backbone

    return load_reference_backbone(out_features=out_features, k=k,
                                   num_categories=num_categories)


@pytest.fixture(scope="module")
def pair():
    from hpcs_tpu.nn.backbones import VNDGCNNPartSeg
    from hpcs_tpu.utils.torch_import import convert_vn_dgcnn

    torch.manual_seed(0)
    ref = _load_reference(out_features=16, k=8).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = VNDGCNNPartSeg(out_features=16, k=8, num_categories=16)
    pts = np.random.RandomState(0).randn(2, 64, 3).astype(np.float32)
    label = np.eye(16, dtype=np.float32)[np.zeros(2, np.int64)]
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts), jnp.asarray(label), train=False)
    params, stats = convert_vn_dgcnn(sd)
    # converted trees must structurally match what flax created
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes
    return ref, model, {"params": params, "batch_stats": stats}, pts, label


def test_converted_tree_shapes(pair):
    pass  # the fixture asserts structural equality


def test_forward_parity_eval_mode(pair):
    ref, model, variables, pts, label = pair
    with torch.no_grad():
        want = ref(torch.from_numpy(pts).transpose(2, 1),
                   torch.from_numpy(label)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(pts), jnp.asarray(label),
                                 train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)


def test_forward_parity_other_input(pair):
    ref, model, variables, pts, label = pair
    pts2 = np.random.RandomState(7).randn(1, 128, 3).astype(np.float32) * 0.5
    label2 = np.eye(16, dtype=np.float32)[np.array([3])]
    with torch.no_grad():
        want = ref(torch.from_numpy(pts2).transpose(2, 1),
                   torch.from_numpy(label2)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(pts2), jnp.asarray(label2),
                                 train=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)


def test_lightning_checkpoint_conversion(pair):
    """Full Lightning-prefixed state_dict (backbone + scale + cosface W +
    embedder) maps onto the HypHCNet tree and preserves forward parity."""
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.utils.torch_import import convert_lightning_checkpoint

    ref, _, _, pts, label = pair
    sd = {f"nn_feat.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    rng = np.random.RandomState(3)
    sd["scale"] = np.array([0.5], np.float32)
    sd["metric_hyp_loss.loss_cosface.W"] = rng.randn(8, 6).astype(np.float32)
    sd["nn_emb.mlp.0.0.weight"] = rng.randn(8, 16).astype(np.float32)  # [hyp, eucl]

    cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=16,
                      fixed_points=64, eucl_dim=16, hyp_dim=8, k=8)
    system = HypHCSystem(cfg)
    batch = {"points": pts, "labels": np.zeros((2, 64), np.int32),
             "category": np.zeros((2,), np.int32)}
    state = system.init(jax.random.PRNGKey(0), batch)
    params, stats = convert_lightning_checkpoint(sd, state.params, state.batch_stats)
    assert float(np.asarray(params["scale"])[0]) == pytest.approx(0.5)
    np.testing.assert_allclose(np.asarray(params["cosface_W"]),
                               sd["metric_hyp_loss.loss_cosface.W"])
    # embedder kernel transposed to [eucl, hyp]
    np.testing.assert_allclose(np.asarray(params["embedder"]["Dense_0"]["kernel"]),
                               sd["nn_emb.mlp.0.0.weight"].T)
    # forward through the full net with imported weights: parity vs torch ref
    x_e, x_p = system.net.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(pts), jnp.asarray(label), train=False)
    with torch.no_grad():
        want = ref(torch.from_numpy(pts).transpose(2, 1),
                   torch.from_numpy(label)).numpy()
    np.testing.assert_allclose(np.asarray(x_e), want, atol=2e-3, rtol=1e-2)
    assert np.all(np.linalg.norm(np.asarray(x_p), axis=-1) < 1.0)


def test_import_checkpoint_rehydrates_hparams(tmp_path):
    """VERDICT r3 #2 done-criterion: a synthetic Lightning checkpoint with
    the PartNet Bottle geometry (euclidean/hyp 4/4, num_class 9 —
    /root/reference/checkpoints/partnet/Bottle/config.yaml) imports with
    ZERO dim flags: dims/model/k/num_class are rehydrated from the ckpt's
    own hyper_parameters (save_hyperparameters payload, base_hyp_hc.py:76),
    including attrs read off the pickled nn_feat module object whose CLASS
    is unimportable at load time (the stub-unpickler path).  Forward parity
    of the imported weights is then checked against the torch reference."""
    import importlib.util

    ref = _load_reference(out_features=4, k=12, num_categories=1).eval()

    # an nn_feat whose class will NOT be importable when the importer loads
    # the file (simulates a user without the reference hpcs package)
    import types

    fake_mod = types.ModuleType("hpcs_fake_for_test")
    # type() keeps the qualname module-level so pickle-by-reference works
    VN_DGCNN_partseg = type(
        "VN_DGCNN_partseg", (),
        {"__module__": "hpcs_fake_for_test",
         "__qualname__": "VN_DGCNN_partseg"})
    fake_mod.VN_DGCNN_partseg = VN_DGCNN_partseg
    fake_feat = VN_DGCNN_partseg()
    fake_feat.k = 12
    fake_feat.out_features = 4
    fake_feat.num_categories = 1
    fake_feat.dropout = 0.5
    fake_feat.pooling = "mean"

    rng = np.random.RandomState(5)
    sd = {f"nn_feat.{k}": v for k, v in ref.state_dict().items()}
    sd["scale"] = torch.tensor([0.02], dtype=torch.float32)
    sd["metric_hyp_loss.loss_cosface.W"] = torch.from_numpy(
        rng.randn(4, 9).astype(np.float32))
    payload = {
        "state_dict": sd,
        "hyper_parameters": {
            "euclidean_size": 4, "hyp_size": 4, "num_class": 9,
            "lr": 0.05, "margin": 0.35, "t_per_anchor": 50, "fraction": 1.2,
            "temperature": 0.1, "anneal_factor": 0.5, "anneal_step": 0,
            "trade_off": 0.1, "miner": True, "cosface": True,
            "hierarchical": False, "level": 3, "nn_feat": fake_feat,
            "nn_emb": None,
        },
    }
    ckpt_path = tmp_path / "model.ckpt"
    sys.modules["hpcs_fake_for_test"] = fake_mod
    try:
        torch.save(payload, str(ckpt_path))
    finally:
        del sys.modules["hpcs_fake_for_test"]

    out_dir = tmp_path / "imported"
    spec = importlib.util.spec_from_file_location(
        "import_checkpoint_under_test",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "import_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    # zero dim/model flags — only a small fixed_points for CPU compile speed
    sys.argv = ["import_checkpoint.py", str(ckpt_path), str(out_dir),
                "--fixed_points", "96"]
    try:
        mod.main()
    finally:
        sys.argv = argv

    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.utils.checkpoint import load_config, restore_checkpoint

    cfg_dict = load_config(str(out_dir))
    assert cfg_dict["eucl_dim"] == 4
    assert cfg_dict["hyp_dim"] == 4
    assert cfg_dict["num_class"] == 9
    assert cfg_dict["k"] == 12
    assert cfg_dict["num_categories"] == 1
    assert cfg_dict["dataset"] == "partnet"
    assert cfg_dict["model_name"] == "vn_dgcnn_partseg"

    cfg_dict["hierarchy_list"] = ()
    cfg = ModelConfig(**cfg_dict)
    system = HypHCSystem(cfg)
    pts = np.random.RandomState(1).randn(2, 96, 3).astype(np.float32)
    batch = {"points": pts, "labels": np.zeros((2, 96), np.int32),
             "category": np.zeros((2,), np.int32)}
    state = system.init(jax.random.PRNGKey(0), batch)
    state, _, _ = restore_checkpoint(str(out_dir), state)
    label = np.eye(1, dtype=np.float32)[np.zeros(2, np.int64)]
    x_e, _ = system.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(pts), jnp.asarray(label), train=False)
    with torch.no_grad():
        want = ref(torch.from_numpy(pts).transpose(2, 1),
                   torch.from_numpy(label)).numpy()
    np.testing.assert_allclose(np.asarray(x_e), want, atol=2e-3, rtol=1e-2)


def test_hparams_mapping_edge_cases():
    """reference_hparams_to_config_kwargs: raw state dicts (no
    hyper_parameters) yield {}, partial hparams map only what exists, and
    ShapeNet-style payloads (no hierarchy keys) stay dataset-agnostic."""
    from hpcs_tpu.utils.torch_import import reference_hparams_to_config_kwargs

    assert reference_hparams_to_config_kwargs({}) == {}
    assert reference_hparams_to_config_kwargs({"state_dict": {}}) == {}
    out = reference_hparams_to_config_kwargs(
        {"hyper_parameters": {"euclidean_size": 50, "hyp_size": 50,
                              "num_class": 50, "lr": 0.001,
                              "class_vector": False}})
    assert out["eucl_dim"] == 50 and out["hyp_dim"] == 50
    assert out["num_class"] == 50 and out["lr"] == 0.001
    assert "dataset" not in out  # no hierarchy keys -> not forced to partnet
    # partnet markers force dataset + dummy category
    out = reference_hparams_to_config_kwargs(
        {"hyper_parameters": {"euclidean_size": 4, "hyp_size": 4,
                              "hierarchical": True, "level": 3}})
    assert out["dataset"] == "partnet" and out["num_categories"] == 1
