"""Tracing/profiling and numerical-debug hooks.

The reference has no profiling at all (SURVEY §5); TPU-native equivalents:
- `trace(dir)`: jax.profiler trace context (view in TensorBoard / Perfetto);
- `StepTimer`: wall-clock per-step timing with a completion barrier that
  works on backends where block_until_ready is a no-op (axon tunnel) by
  forcing a scalar readback;
- `enable_nan_debugging()`: jax_debug_nans — jit re-runs op-by-op and
  pinpoints the first NaN-producing primitive;
- `check_finite(tree)`: host-side assert over a pytree.
"""
import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir):
    """Profiler trace context; writes a TensorBoard-compatible trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def barrier(tree):
    """Completion barrier: forces a scalar readback of one leaf (reliable on
    the axon backend where block_until_ready does not synchronize)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        x = leaves[0]
        if hasattr(x, "ravel") and x.size:
            float(jnp.asarray(x).ravel()[0])
    return tree


class StepTimer:
    """Rolling per-step timing: `with timer.step(): ...` then timer.summary()."""

    def __init__(self, warmup=1):
        self.warmup = warmup
        self.times = []
        self._count = 0

    @contextlib.contextmanager
    def step(self, result_tree=None):
        t0 = time.perf_counter()
        yield
        if result_tree is not None:
            barrier(result_tree)
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_timed": len(arr),
        }


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)


def check_finite(tree, name="tree"):
    """Host-side finite check over a pytree; raises with the offending path."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}: "
                f"{np.isnan(arr).sum()} NaN / {np.isinf(arr).sum()} inf"
            )
