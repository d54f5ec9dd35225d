"""hpcs_tpu — TPU-native hierarchical point-cloud segmentation on the Poincare ball.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TheCrossProduct/HPCS: rotation-equivariant vector-neuron backbones, hyperbolic
metric learning (CosFace + HypHC LCA triplets), Riemannian optimization, and
on-device hierarchical decode — built for TPU meshes via pjit/shard_map.
"""

__version__ = "0.1.0"


def _host_fingerprint():
    """Short hash of the host CPU feature set + jax/jaxlib versions.

    XLA:CPU caches AOT machine code; loading an entry compiled on a host
    with different features logs 'could lead to execution errors such as
    SIGILL' and can miscompute, so CPU cache entries must never cross
    machines (TPU entries are keyed by the device kind and are safe either
    way).  The jaxlib version and the CPU *model* line are included too:
    LLVM derives tuning preferences (+prefer-no-gather etc.) from the CPU
    model, not the feature flags, so two machines with identical cpuinfo
    `flags` but different models — or the same machine under a different
    jaxlib build — still trip the target-machine mismatch (both observed
    2026-08-18 under a round-4 cache).

    Known-benign noise: even on SAME-machine cache hits, cpu_aot_loader
    logs 'Target machine feature +prefer-no-gather is not supported on the
    host machine ... could lead to execution errors such as SIGILL'.  That
    validator compares the compile-time LLVM target (which embeds tuning
    *preferences* like +prefer-no-gather/+prefer-no-scatter derived from
    the CPU model) against runtime-DETECTED hardware features, which never
    include tuning flags — so every legitimate self-compiled hit warns.
    The fingerprint directory guarantees the entry really was compiled on
    this host+jaxlib, so the E-line is cosmetic here; genuinely foreign
    entries can't be looked up at all."""
    import hashlib
    import platform

    import jax

    feat = platform.machine() + jax.__version__
    try:
        import jaxlib

        feat += getattr(jaxlib, "__version__", "")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            got = set()
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("flags", "Features", "model name", "model",
                           "stepping", "cpu family") and key not in got:
                    got.add(key)
                    feat += line
                if len(got) == 5:
                    break
    except OSError:
        pass
    return hashlib.sha1(feat.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache():
    """XLA compiles of the train/test steps take 30-500 s through a remote
    TPU tunnel; the persistent cache makes every relaunch sub-second.  Safe
    at import: config updates don't initialize a backend.  The directory is
    suffixed with a host-CPU fingerprint (see _host_fingerprint)."""
    import os

    import jax

    cache_dir = os.environ.get(
        "HPCS_TPU_CACHE_DIR", os.path.expanduser("~/.cache/hpcs_tpu_xla")
    )
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
