"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU (the real TPU chip is reserved for benchmarks);
multi-device sharding tests use the 8 virtual host devices.

NOTE: the environment sets JAX_PLATFORMS=axon and a sitecustomize may import
jax before this file runs, so the env var alone is not enough — we also flip
the platform via jax.config, which takes effect as long as no backend has
been initialized yet (conftest runs before any test touches devices).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


# Long-running (jit-compile-heavy) tests, deselected by default via pytest.ini
# addopts so the default `pytest tests/` stays fast. Run EVERYTHING with:
#   python -m pytest tests/ -q -m "slow or not slow"
SLOW_TESTS = {
    "tests/test_parallel.py::test_dp_training_reduces_loss",
    "tests/test_parallel.py::test_dp_params_stay_replicated",
    "tests/test_parallel.py::test_dp_loss_comparable_to_single_device",
    "tests/test_parallel.py::test_dp_step_runs_on_8_devices",
    "tests/test_inference_engine.py::test_fast_forward_with_mlp_embedder",
    "tests/test_inference_engine.py::test_fast_forward_matches_flax_graph",
    "tests/test_inference_engine.py::test_fused_edgeconv_matches_xla",
    "tests/test_backbones.py::test_vn_dgcnn_grads_finite",
    "tests/test_backbones.py::test_vn_dgcnn_output_shape",
    "tests/test_system.py::test_train_step_runs_and_decreases_loss",
    "tests/test_system.py::test_train_step_updates_scale_param",
    "tests/test_system.py::test_partnet_variant_with_hierarchy",
    "tests/test_system.py::test_triplet_sim_variant",
    "tests/test_trainer.py::test_test_loop_limit_batches",
    "tests/test_trainer.py::test_fit_writes_checkpoints_and_metrics",
    "tests/test_trainer.py::test_fit_early_stopping",
    "tests/test_loss.py::test_compute_losses_grads_finite",
    "tests/test_loss.py::test_hyphc_loss_prefers_correct_hierarchy",
    "tests/test_loss.py::test_hierarchical_cosface_reduces_to_plain_nll_of_branch",
    "tests/test_loss.py::test_compute_losses_all_configs_finite_and_jittable",
    "tests/test_backbones_alt.py::test_system_with_alt_backbones",
    "tests/test_backbones_alt.py::test_vn_pointnet_shape_and_head_channels",
    "tests/test_backbones_alt.py::test_dgcnn_shape_and_head_channels",
    "tests/test_reference_parity.py::test_forward_parity_other_input",
    "tests/test_vn_layers.py::test_vn_std_feature_invariant",
    "tests/test_vn_layers.py::test_vn_linear_leaky_relu_equivariant",
    "tests/test_vn_layers.py::test_vn_batchnorm_rescales_norms_only",
    "tests/test_viz.py::test_test_loop_with_plot_dir",
    "tests/test_geometry.py::test_hyp_lca_differentiable",
    "tests/test_geometry.py::test_hyp_lca_mat_matches_complex_construction_2d",
    # perf floor — median-based + generous (3x) so contention can't flip it;
    # kept out of the default fast run because it spends ~1 s timing
    "tests/test_fast_txt.py::test_speedup_over_numpy",
    # >8 s each on this throttled CPU (pytest --durations, 2026-08-17);
    # each subsystem keeps at least one fast-path test
    "tests/test_layout.py::test_backbone_layouts_match",
    "tests/test_layout.py::test_backbone_vc_so3_invariant_output",
    "tests/test_layout.py::test_vn_std_feature_layouts_match",
    "tests/test_layout.py::test_vn_llr_layouts_match",
    "tests/test_layout.py::test_vn_llr_vc_equivariant",
    "tests/test_checkpoint.py::test_msgpack_roundtrip",
    "tests/test_checkpoint.py::test_orbax_roundtrip",
    "tests/test_optim.py::test_fused_radam_matches_per_leaf",
    "tests/test_trainer.py::test_fused_epoch_matches_per_step",
    "tests/test_miner.py::test_triplet_validity_laws",
    "tests/test_miner.py::test_triplet_singleton_label_masked",
    "tests/test_miner.py::test_triplet_single_class_all_masked",
    "tests/test_pretrained.py::test_pretrained_cli_errors_loudly_without_file",
    "tests/test_pretrained.py::test_raw_backbone_roundtrip",
    "tests/test_backbones_alt.py::test_vn_pointnet_so3_invariance",
    "tests/test_backbones_alt.py::test_pointnet_shape_and_logprobs",
    "tests/test_backbones.py::test_vn_dgcnn_channel_geometry",
    "tests/test_profiling.py::test_trace_writes_files",
    "tests/test_reference_parity.py::test_lightning_checkpoint_conversion",
    "tests/test_reference_parity.py::test_import_checkpoint_rehydrates_hparams",
    "tests/test_system.py::test_test_step_decodes",
    "tests/test_system.py::test_eval_step",
    "tests/test_geometry.py::test_hyp_lca_matches_reference_inversion_construction",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
