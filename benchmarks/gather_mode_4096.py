#!/usr/bin/env python
"""A/B the neighbor-gather implementation at large N on the real TPU.

The one-hot MXU gather (ops/knn.py::gather_neighbors) does O(N^2 * K * C)
MAC work; the dynamic row gather moves O(N * K * C) bytes.  The one-hot
form wins ~2x at the flagship N=1024, but the FLOP side scales with N^2
while the byte side scales with N — somewhere above N=1024 the ranking
must flip.  Measures the full flagship forward per mode/dtype.

Usage: python benchmarks/gather_mode_4096.py [--n 4096] [--batch 8]
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(mode, n, batch, bf16):
    code = f"""
import sys, time
sys.path.insert(0, {REPO!r})
import jax, jax.numpy as jnp
from hpcs_tpu.models import HypHCSystem, ModelConfig
cfg = ModelConfig(dataset="shapenet", num_class=50, num_categories=16,
                  fixed_points={n}, eucl_dim=16, hyp_dim=16, k=20,
                  t_per_anchor=20, num_triplets=4096, bf16={bf16})
system = HypHCSystem(cfg)
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, ({batch}, {n}, 3), jnp.float32)
onehot = jax.nn.one_hot(jax.random.randint(key, ({batch},), 0, 16), 16)
state = system.init(jax.random.PRNGKey(1),
                    {{"points": x, "category": jnp.zeros(({batch},), jnp.int32)}})

@jax.jit
def fwd(params, batch_stats, x, onehot):
    e, h, _ = system._apply(params, batch_stats, x, onehot, train=False)
    return jnp.sum(h.astype(jnp.float32)) + jnp.sum(e.astype(jnp.float32))

def call():
    return float(fwd(state.params, state.batch_stats, x, onehot))

float(call())  # compile
# warm through the post-compile dispatch spike
for _ in range(20):
    call()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        call()
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"RESULT {{best * 1e3:.2f}}")
"""
    env = dict(os.environ, HPCS_TPU_GATHER=mode)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1500)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"mode={mode}: no RESULT\n{out.stdout[-500:]}\n"
                       f"{out.stderr[-1000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    for bf16 in (False, True):
        for mode in ("onehot", "index"):
            ms = run_child(mode, args.n, args.batch, bf16)
            tag = "bf16" if bf16 else "fp32"
            print(f"N={args.n} B={args.batch} {tag} gather={mode}: "
                  f"{ms:.2f} ms/forward "
                  f"({args.batch / ms * 1e3:.1f} clouds/s)")


if __name__ == "__main__":
    main()
