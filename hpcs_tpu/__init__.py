"""hpcs_tpu — TPU-native hierarchical point-cloud segmentation on the Poincare ball.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TheCrossProduct/HPCS: rotation-equivariant vector-neuron backbones, hyperbolic
metric learning (CosFace + HypHC LCA triplets), Riemannian optimization, and
on-device hierarchical decode — built for TPU meshes via pjit/shard_map.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """XLA compiles of the train/test steps take 30-500 s through a remote
    TPU tunnel; the persistent cache makes every relaunch sub-second.  Safe
    at import: config updates don't initialize a backend."""
    import os

    import jax

    cache_dir = os.environ.get(
        "HPCS_TPU_CACHE_DIR", os.path.expanduser("~/.cache/hpcs_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
