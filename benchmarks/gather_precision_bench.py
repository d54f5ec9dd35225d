#!/usr/bin/env python
"""Per-operand DotGeneral precision for the one-hot gather: exactness + speed.

The one-hot neighbor gather runs its einsum at HIGHEST (6 bf16 limb passes)
because fp32 selection must be exact.  But DotGeneral precision is
PER-OPERAND: the 0/1 one-hot matrix is bf16-exact, so (DEFAULT, HIGHEST)
should give exact selection from 3 passes (one-hot limb x 3 value limbs).
This probe checks on real TPU:
  1. forward bit-exactness vs indexed gather,
  2. gradient bit-exactness (the VJP's transposed dot must keep the pair
     aligned with its operands),
  3. speed vs the HIGHEST-HIGHEST form at flagship shapes.

Usage: python benchmarks/gather_precision_bench.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

B, N, K, C = 16, 1024, 20, 21


def make_inputs(key):
    kx, ki = jax.random.split(key)
    x = jax.random.normal(kx, (B, N, C, 3), jnp.float32)
    idx = jax.random.randint(ki, (B, N, K), 0, N)
    return x, idx


def gather(x, idx, precision):
    oh = jax.nn.one_hot(idx, N, dtype=x.dtype)
    return jnp.einsum("bnkm,bm...->bnk...", oh, x, precision=precision)


def main():
    key = jax.random.PRNGKey(0)
    x, idx = make_inputs(key)
    P = jax.lax.Precision

    ref = jnp.take_along_axis(
        x[:, None], idx[..., None, None], axis=2
    )  # awkward; use vmap take instead
    ref = jax.vmap(lambda xb, ib: xb[ib])(x, idx)

    for name, prec in (("HIGHEST", P.HIGHEST),
                       ("(DEFAULT,HIGHEST)", (P.DEFAULT, P.HIGHEST))):
        out = jax.jit(lambda x, i: gather(x, i, prec))(x, idx)
        exact = bool(jnp.all(out == ref))
        print(f"{name}: forward bit-exact vs indexed gather: {exact}")

    # gradient exactness: d/dx sum(gather(x) * w) = scatter of w — compare
    # the pair form against HIGHEST-everywhere (itself exact)
    w = jax.random.normal(jax.random.fold_in(key, 7), (B, N, K, C, 3))

    def loss(prec):
        return jax.jit(jax.grad(lambda xx: jnp.vdot(gather(xx, idx, prec), w)))

    g_ref = loss(P.HIGHEST)(x)
    g_pair = loss((P.DEFAULT, P.HIGHEST))(x)
    print("grad bit-exact (pair vs HIGHEST):", bool(jnp.all(g_ref == g_pair)))
    print("grad max abs diff:", float(jnp.max(jnp.abs(g_ref - g_pair))))

    # speed: chained on-device loops
    def timed(prec, label, iters=16):
        @jax.jit
        def chained(key):
            def body(i, acc):
                xi = x + jax.random.uniform(jax.random.fold_in(key, i), (1,)) * 0
                return acc + jnp.sum(gather(xi + acc * 1e-20, idx, prec))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        float(chained(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        float(chained(jax.random.PRNGKey(1)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.2f} ms/gather (B={B} N={N} K={K} C={C})")
        return dt

    t_hi = timed(P.HIGHEST, "HIGHEST       ")
    t_pair = timed((P.DEFAULT, P.HIGHEST), "(DEF, HIGHEST)")
    print(f"speedup: {t_hi / t_pair:.2f}x")


if __name__ == "__main__":
    main()
