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


def _load_reference(out_features, k):
    from reference_baseline import load_reference_backbone

    return load_reference_backbone(out_features=out_features, k=k)


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
