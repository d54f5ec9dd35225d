"""Host trainer-loop tests: early stopping, checkpointing, metric logging."""
import json
import os

import jax
import numpy as np
import pytest

from hpcs_tpu.data import DataLoader, SyntheticPartDataset
from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.trainer import fit
from hpcs_tpu.trainer import test as run_decode_test
from hpcs_tpu.utils.logging import MetricLogger


def _tiny_system():
    return HypHCSystem(ModelConfig(
        dataset="shapenet", num_class=6, num_categories=2, fixed_points=32,
        eucl_dim=4, hyp_dim=4, k=6, t_per_anchor=3, num_triplets=128,
        temperature=0.1, lr=0.01,
    ))


def _loaders(n=4, b=2):
    ds = SyntheticPartDataset(num_objects=n, npoints=32, num_categories=2,
                              parts_per_object=3)
    return (DataLoader(ds, b, shuffle=True, drop_last=True),
            DataLoader(ds, b, drop_last=True))


def test_fit_writes_checkpoints_and_metrics(tmp_path):
    system = _tiny_system()
    tr, va = _loaders()
    logger = MetricLogger(str(tmp_path), "run")
    state, best = fit(system, tr, va, epochs=2, patience=5, logger=logger,
                      ckpt_dir=str(tmp_path / "ck"), log_dir=str(tmp_path))
    logger.close()
    assert np.isfinite(best)
    assert (tmp_path / "ck" / "best" / "model.ckpt").exists()
    assert (tmp_path / "ck" / "last" / "config.json").exists()
    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert len(lines) == 2
    assert "val_loss" in lines[0] and "epoch_time_s" in lines[0]
    assert (tmp_path / "run" / "metrics.csv").exists()


def test_fit_early_stopping(tmp_path):
    system = _tiny_system()
    tr, va = _loaders()
    # patience 1: stop as soon as val fails to improve twice
    state, best = fit(system, tr, va, epochs=50, patience=1,
                      log_dir=str(tmp_path), run_name="es")
    lines = open(tmp_path / "es" / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) < 50  # stopped early


def test_test_loop_limit_batches(tmp_path):
    system = _tiny_system()
    tr, va = _loaders(n=8, b=2)
    state, _ = fit(system, tr, va, epochs=1, log_dir=str(tmp_path), run_name="t")
    out = run_decode_test(system, state, va, limit_batches=2)
    assert "score" in out and 0 <= out["score"] <= 1


def test_stack_epoch_never_loses_consumed_batches():
    """_stack_epoch hands already-consumed batches back to the per-step loop
    when the fuse is rejected: a one-shot iterator must not be silently
    exhausted (zero training steps) and a sized loader must not be read
    twice."""
    from hpcs_tpu.trainer import _stack_epoch

    def batches(n, pts=32):
        for i in range(n):
            yield {"points": np.zeros((2, pts, 3), np.float32),
                   "labels": np.zeros((2, pts), np.int32),
                   "category": np.zeros((2,), np.int32)}

    # one-shot generator over the byte cap: every batch comes back via rest
    stacked, rest = _stack_epoch(batches(5), max_bytes=1)
    assert stacked is None
    assert len(list(rest)) == 5
    # one-shot generator, fusable: all batches land in the stack
    stacked, rest = _stack_epoch(batches(4))
    assert stacked is not None and stacked["points"].shape[0] == 4
    assert len(list(rest)) == 0
    # single-batch epoch: not fusable, batch still delivered
    stacked, rest = _stack_epoch(batches(1))
    assert stacked is None and len(list(rest)) == 1
    # sized loader over the cap: nothing consumed twice, nothing lost
    sized = list(batches(3))
    stacked, rest = _stack_epoch(sized, max_bytes=1)
    assert stacked is None and len(list(rest)) == 3


def test_fused_epoch_matches_per_step(tmp_path, monkeypatch):
    """The one-dispatch scanned epoch trains step-for-step identically to the
    host loop (same key folding, same batch order)."""
    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("HPCS_TPU_FUSED_EPOCH", mode)
        system = _tiny_system()
        train_loader, valid_loader = _loaders(n=6, b=2)
        logger = MetricLogger(str(tmp_path), f"fused_{mode}")
        state, best = fit(system, train_loader, valid_loader, epochs=2,
                          seed=3, log_dir=str(tmp_path), run_name=f"fused_{mode}",
                          logger=logger)
        results[mode] = (jax.tree.map(np.asarray, state.params), best)
    p0, b0 = results["0"]
    p1, b1 = results["1"]
    assert b0 == pytest.approx(b1, rel=1e-5)
    flat0 = jax.tree.leaves(p0)
    flat1 = jax.tree.leaves(p1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, atol=1e-5)
