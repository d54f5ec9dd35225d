"""Measure the reference implementation's CPU inference throughput.

Imports the reference VN-DGCNN backbone from /root/reference (read-only) and
times its forward pass on synthetic clouds — the "CPU reference" denominator
of BASELINE.md.  geoopt (used only by the reference's dead-code modules that
its package __init__ still imports) is stubbed out.
"""
import sys
import time
import types


def _stub_geoopt():
    class _AnyAttr(type):
        def __getattr__(cls, name):
            def _f(*a, **k):
                return None

            _f.__name__ = name
            return _f

    class PoincareBall(metaclass=_AnyAttr):
        __scaling__ = {}

        def __init__(self, *a, **k):
            pass

    for name in [
        "geoopt", "geoopt.manifolds", "geoopt.manifolds.stereographic",
        "geoopt.manifolds.stereographic.math",
    ]:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    g = sys.modules["geoopt"]
    g.manifolds = sys.modules["geoopt.manifolds"]
    g.manifolds.stereographic = sys.modules["geoopt.manifolds.stereographic"]
    g.manifolds.stereographic.math = sys.modules["geoopt.manifolds.stereographic.math"]
    g.manifolds.PoincareBall = PoincareBall
    g.PoincareBall = PoincareBall
    g.ManifoldParameter = object
    mm = g.manifolds.stereographic.math
    mm._lambda_x = lambda *a, **k: None
    mm.arsinh = lambda x: x
    mm.tanh = lambda x: x


def _stub_pml():
    """Stub pytorch_metric_learning (pulled in transitively through the
    reference package __init__ chain; unused by the backbone forward).

    No-op when a pytorch_metric_learning is already importable (e.g. the
    full tools/ref_compat shim): overwriting it with these empty dummies
    would break later shim users in the same process (test-order bug)."""
    if "pytorch_metric_learning" in sys.modules:
        return

    class _Dummy:
        def __init__(self, *a, **k):
            pass

    def _make(name):
        m = types.ModuleType(name)
        m.__path__ = []

        def _getattr(attr, _m=m):
            return _Dummy

        m.__getattr__ = _getattr
        sys.modules[name] = m
        return m

    root = _make("pytorch_metric_learning")
    for sub in ["distances", "losses", "miners", "utils", "reducers"]:
        mod = _make(f"pytorch_metric_learning.{sub}")
        setattr(root, sub, mod)
    for sub in ["common_functions", "loss_and_miner_utils"]:
        mod = _make(f"pytorch_metric_learning.utils.{sub}")
        setattr(sys.modules["pytorch_metric_learning.utils"], sub, mod)


def load_reference_backbone(out_features=32, k=20, num_categories=16):
    _stub_geoopt()
    _stub_pml()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from hpcs.nn.dgcnn.vn_dgcnn_partseg import VN_DGCNN_partseg

    return VN_DGCNN_partseg(
        in_channels=3, out_features=out_features, k=k, dropout=0.5,
        pooling="mean", num_categories=num_categories,
    ).eval()


def measure_reference_cpu(batch=4, npoints=1024, k=20, out_features=32,
                          warmup=1, iters=3, max_seconds=120.0):
    """Returns clouds/sec of the reference backbone forward on CPU."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = load_reference_backbone(out_features=out_features, k=k)
    x = torch.randn(batch, 3, npoints)
    l = torch.eye(16)[torch.zeros(batch, dtype=torch.long)]
    with torch.no_grad():
        for _ in range(warmup):
            model(x, l)
        times = []
        t_total = time.perf_counter()
        for _ in range(iters):
            t0 = time.perf_counter()
            model(x, l)
            times.append(time.perf_counter() - t0)
            if time.perf_counter() - t_total > max_seconds:
                break
    return batch / min(times)


if __name__ == "__main__":
    cps = measure_reference_cpu()
    print(f"reference CPU: {cps:.3f} clouds/sec (1024 pts, k=20, batch 4)")
