"""Cross-validation of the tools/ref_compat PML shim against hpcs_tpu.

The quality-parity experiment (tools/parity_experiment.py) is only as good
as the shim's math: here the shim's CosFaceLoss (torch) and hpcs_tpu's
cosface (jax) are pinned to each other on identical weights/inputs, and the
shim's distance/reducer/weights utilities to their definitions.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SHIM_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tools", "ref_compat"))
sys.path.insert(0, _SHIM_DIR)

@pytest.fixture(autouse=True)
def _use_real_shims():
    """benchmarks/reference_baseline.py installs attribute-less _Dummy
    stand-ins for these packages (enough for the reference backbone import);
    evict anything that is not the real ref_compat shim so imports inside
    the tests resolve to the shim regardless of test order."""
    for _name in list(sys.modules):
        if _name.split(".")[0] in ("pytorch_metric_learning", "geoopt"):
            _file = getattr(sys.modules[_name], "__file__", None)
            if not (isinstance(_file, str) and _file.startswith(_SHIM_DIR)):
                del sys.modules[_name]
    yield

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_shim_cosface_matches_jax_cosface():
    from pytorch_metric_learning.losses import CosFaceLoss

    from hpcs_tpu.loss.cosface import cosface_loss

    rng = np.random.RandomState(0)
    n, d, c = 64, 8, 5
    emb = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, c, n)
    W = rng.randn(d, c).astype(np.float32)

    loss_t = CosFaceLoss(num_classes=c, embedding_size=d, margin=0.35, scale=2)
    with torch.no_grad():
        loss_t.W.copy_(torch.from_numpy(W))
    out_torch = float(loss_t(torch.from_numpy(emb), torch.from_numpy(labels)))

    out_jax = float(cosface_loss(jnp.asarray(W), jnp.asarray(emb),
                                 jnp.asarray(labels), margin=0.35, scale=2.0))
    assert out_torch == pytest.approx(out_jax, rel=1e-5)


def test_shim_cosface_hand_value():
    """Tiny case checked against the closed form:
    logits = scale * (cos - margin*onehot); mean CE."""
    from pytorch_metric_learning.losses import CosFaceLoss

    emb = torch.tensor([[1.0, 0.0], [0.0, 1.0]])
    W = torch.tensor([[1.0, 0.0], [0.0, 1.0]])
    labels = torch.tensor([0, 1])
    loss = CosFaceLoss(num_classes=2, embedding_size=2, margin=0.35, scale=2)
    with torch.no_grad():
        loss.W.copy_(W)
    got = float(loss(emb, labels))
    # cos matrix = I; target logit 2*(1-0.35)=1.3, other 0
    import math

    want = -math.log(math.exp(1.3) / (math.exp(1.3) + 1.0))
    assert got == pytest.approx(want, rel=1e-6)


def test_shim_convert_to_weights():
    from pytorch_metric_learning.utils import loss_and_miner_utils as lmu

    labels = torch.arange(6)
    # occurrence counts: 0 -> 3 (max), 1 -> 1, 5 -> 2
    tup = (torch.tensor([0, 0, 1]), torch.tensor([0, 2, 3]), torch.tensor([4, 5, 5]))
    w = lmu.convert_to_weights(tup, labels, dtype=torch.float32)
    assert w.shape == (6,)
    assert float(w[0]) == pytest.approx(1.0)  # most frequent -> 1
    assert float(w[1]) == pytest.approx(1.0 / 3.0)
    assert float(w[5]) == pytest.approx(2.0 / 3.0)
    assert float(lmu.convert_to_weights(None, labels, torch.float32).min()) == 1.0


def test_shim_avg_nonzero_reducer():
    from pytorch_metric_learning.reducers import AvgNonZeroReducer

    r = AvgNonZeroReducer()
    emb = torch.zeros(4, 2)
    losses = torch.tensor([0.0, 2.0, 0.0, 4.0])
    out = r({"loss": {"losses": losses, "indices": None,
                      "reduction_type": "element"}}, emb, None)
    assert float(out) == pytest.approx(3.0)


def test_shim_rotate_is_rotation():
    from pytorch3d.transforms import Rotate, random_rotations

    torch.manual_seed(0)
    R = random_rotations(5)
    # orthonormal, det +1
    eye = torch.einsum("bij,bkj->bik", R, R)
    assert torch.allclose(eye, torch.eye(3).expand(5, 3, 3), atol=1e-5)
    assert torch.allclose(torch.linalg.det(R), torch.ones(5), atol=1e-5)
    pts = torch.randn(5, 16, 3)
    out = Rotate(R=R).transform_points(pts)
    # norms preserved per point
    assert torch.allclose(pts.norm(dim=-1), out.norm(dim=-1), atol=1e-5)
