"""hpcs_tpu — TPU-native hierarchical point-cloud segmentation on the Poincare ball.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TheCrossProduct/HPCS: rotation-equivariant vector-neuron backbones, hyperbolic
metric learning (CosFace + HypHC LCA triplets), Riemannian optimization, and
on-device hierarchical decode — built for TPU meshes via pjit/shard_map.
"""

__version__ = "0.1.0"
