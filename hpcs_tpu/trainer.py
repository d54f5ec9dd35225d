"""Host training loop: epochs, validation, early stopping, schedules, ckpt.

The jax/TPU analogue of the Lightning Trainer usage in the reference
(/root/reference/train.py:247-288): fit -> save checkpoint -> test, with
EarlyStopping(val_loss, patience), ReduceLROnPlateau, LR monitoring, and
per-epoch metric logging.  All device work happens inside the jitted step
functions of HypHCSystem; this loop only moves batches and scalars.
"""
import itertools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .models import HypHCSystem
from .utils.checkpoint import restore_checkpoint, save_checkpoint
from .utils.logging import MetricLogger


def _mean_logs(logs_list):
    if not logs_list:
        return {}
    keys = logs_list[0].keys()
    return {k: float(np.mean([float(l[k]) for l in logs_list])) for k in keys}


def _stack_epoch(train_loader, max_bytes=1 << 30):
    """Collate a whole epoch of equal-shaped batches into one [S, ...] pytree
    (plus a per-step remainder for a ragged tail).  Returns (stacked, rest)
    where `rest` is an iterable of per-step batches; (None, rest) means the
    epoch could not be fused, and `rest` re-yields every batch already
    consumed followed by the remainder of the loader — so a one-shot
    iterator is never silently exhausted and a sized loader is never read
    twice (no wasted shuffle/prefetch spin-up, no full-epoch RAM spike)."""
    it = iter(train_loader)
    try:
        n_batches = len(train_loader)
    except TypeError:
        n_batches = None
    if n_batches is not None and n_batches < 2:
        return None, it
    first = next(it, None)
    if first is None:
        return None, ()
    first_bytes = sum(np.asarray(v).nbytes for v in first.values())
    if n_batches is not None and first_bytes * n_batches > max_bytes:
        return None, itertools.chain([first], it)
    # materialize incrementally under the byte cap (covers unsized loaders
    # and sized loaders whose later batches are bigger than the first)
    batches, total = [first], first_bytes
    for b in it:
        total += sum(np.asarray(v).nbytes for v in b.values())
        batches.append(b)
        if total > max_bytes:
            return None, itertools.chain(batches, it)
    if len(batches) < 2:
        return None, batches
    lead = batches[0]["points"].shape
    full = [b for b in batches if b["points"].shape == lead]
    rest = [b for b in batches if b["points"].shape != lead]
    if len(full) < 2:
        return None, batches
    stacked = {k: np.stack([np.asarray(b[k]) for b in full]) for k in full[0]}
    return stacked, rest


def _make_fused_epoch(system, step_fn=None):
    """One-dispatch epoch: lax.scan of a train step over a stacked epoch.

    The per-step path pays a host->device round trip per batch, which on a
    tunneled TPU (~7-10 ms RTT) dwarfs the ~24 ms device step; scanning the
    epoch on device runs at device speed.  The (state, key) carry folds the
    key exactly like the host loop (fold_in(key, global_step + 1)), so the
    trained state is step-for-step identical to the unfused path.

    `step_fn(state, batch, key, temperature) -> (state, logs)` defaults to
    the single-device system.train_step; parallel.make_data_parallel_epoch_fn
    passes its shard_map step so the key walk lives in exactly one place."""
    step = step_fn or system.train_step

    @jax.jit
    def epoch_fn(state, key, stacked, gs0, temperature):
        steps = stacked["points"].shape[0]

        def body(carry, xs):
            state, key = carry
            gs, batch = xs
            key = jax.random.fold_in(key, gs + 1)
            state, logs = step(state, batch, key, temperature)
            return (state, key), logs

        gs_arr = gs0 + jnp.arange(steps)
        (state, key), logs = jax.lax.scan(body, (state, key), (gs_arr, stacked))
        return state, key, logs

    return epoch_fn


def fit(system: HypHCSystem, train_loader, valid_loader, *, epochs, patience=50,
        seed=0, log_dir="logs", run_name="run", logger: MetricLogger = None,
        ckpt_dir=None, resume=None, train_step_fn=None, epoch_fn=None,
        state=None):
    """Train with early stopping; returns (state, best_val_loss).

    `epoch_fn(state, key, stacked, gs0, temperature) -> (state, key, logs)`
    fuses a whole stacked epoch in one dispatch.  Pass the one built by
    parallel.make_data_parallel_epoch_fn alongside a data-parallel
    `train_step_fn` (which still handles ragged tails and un-stackable
    epochs); when neither is given the single-device fused epoch is built
    automatically."""
    key = jax.random.PRNGKey(seed)
    own_logger = logger is None
    if logger is None:
        logger = MetricLogger(log_dir, run_name)

    if state is None:
        sample = next(iter(train_loader))
        state = system.init(key, sample)
    start_epoch = 0
    if resume:
        state, start_epoch, _ = restore_checkpoint(resume, state)

    step_fn = train_step_fn or system.train_step
    ever_improved = False  # without a finite val_loss, return the LAST
    # trained state — returning the initial `best_state` would silently save
    # untrained weights (empty valid loader via drop_last, or NaN val_loss)
    # fused (one-dispatch) epochs: built automatically for the plain
    # single-device step; a DP caller passes the matching shard_map epoch fn
    # (parallel.make_data_parallel_epoch_fn).  HPCS_TPU_FUSED_EPOCH=0 disables.
    if os.environ.get("HPCS_TPU_FUSED_EPOCH", "1") == "0":
        epoch_fn = None
    elif epoch_fn is None and train_step_fn is None:
        epoch_fn = _make_fused_epoch(system)
    fused_epoch = epoch_fn is not None
    best_val = float("inf")
    best_state = state
    bad_epochs = 0
    global_step = int(state.step)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        train_logs = []
        stacked, rest = _stack_epoch(train_loader) if fused_epoch else (None, train_loader)
        epoch_batches = rest
        if stacked is not None:
            state, key, slogs = epoch_fn(
                state, key, stacked, jnp.int32(global_step),
                jnp.float32(system.temperature))
            global_step += stacked["points"].shape[0]
            slogs = {k: np.asarray(v) for k, v in slogs.items()}
            train_logs.extend(
                {k: v[i] for k, v in slogs.items()}
                for i in range(stacked["points"].shape[0]))
        for batch in epoch_batches:
            key = jax.random.fold_in(key, global_step + 1)
            state, logs = step_fn(state, batch, key, jnp.float32(system.temperature))
            train_logs.append(logs)
            global_step += 1
        val_logs = []
        val_key = jax.random.fold_in(key, 1_000_003 + epoch)
        for vi, batch in enumerate(valid_loader):
            vk = jax.random.fold_in(val_key, vi)
            val_logs.append(system.eval_step(state, batch, vk, jnp.float32(system.temperature)))

        tl = _mean_logs(train_logs)
        vl = _mean_logs(val_logs)
        val_loss = vl.get("val_loss", float("inf"))
        lr = system.epoch_end(epoch, val_loss)
        state = system.set_learning_rate(state, lr)
        logger.log(
            {
                "epoch": epoch,
                **{f"train_{k}" if not k.startswith("loss") and k not in ("scale",) else k: v
                   for k, v in tl.items()},
                **vl,
                "lr": lr,
                "temperature": system.temperature,
                "epoch_time_s": time.time() - t0,
            },
            step=global_step,
        )

        print(
            f"epoch {epoch}: train_loss={tl.get('total_loss', float('nan')):.4f} "
            f"val_loss={val_loss:.4f} lr={lr:.2e} ({time.time() - t0:.1f}s)",
            flush=True,
        )

        if val_loss < best_val:
            best_val = val_loss
            best_state = state
            ever_improved = True
            bad_epochs = 0
            if ckpt_dir:
                save_checkpoint(os.path.join(ckpt_dir, "best"), state, system.cfg, epoch)
        else:
            bad_epochs += 1
            if bad_epochs >= patience:
                break
        if ckpt_dir:
            save_checkpoint(os.path.join(ckpt_dir, "last"), state, system.cfg, epoch)

    if own_logger:
        logger.close()
    if not ever_improved:
        print("warning: no finite val_loss was observed (empty valid loader "
              "or NaN); returning the last trained state", flush=True)
        best_state = state
    return best_state, best_val


def test(system: HypHCSystem, state, test_loader, *, seed=0, limit_batches=None,
         logger: MetricLogger = None, plot_dir=None):
    """Run the decode/test pass; returns mean metrics
    (reference trainer.test with limit_test_batches, train.py:258).
    With plot_dir, saves the 5-panel evaluation figure per object
    (reference plot_inference path, base_hyp_hc.py:200-232)."""
    key = jax.random.PRNGKey(seed + 777)
    logs_list = []
    for i, batch in enumerate(test_loader):
        if limit_batches is not None and i >= limit_batches:
            break
        key = jax.random.fold_in(key, i)
        logs, extras = system.test_step(state, batch, key, jnp.float32(system.temperature))
        logs_list.append(logs)
        if plot_dir:
            _plot_batch(system, state, batch, extras, plot_dir, batch_index=i)
    out = _mean_logs(logs_list)
    if logger is not None and out:
        logger.log({f"{k}": v for k, v in out.items()})
    return out


def _plot_batch(system, state, batch, extras, plot_dir, batch_index):
    from .loss.hyphc import normalize_to_radius
    from .utils.viz import plot_hyperbolic_eval

    os.makedirs(plot_dir, exist_ok=True)
    scale = np.asarray(state.params["scale"])[0]
    x_p = np.asarray(extras["x_poincare"])
    x_e = np.asarray(extras["x_euclidean"])
    preds = np.asarray(extras["pred"])
    ks = np.asarray(extras["best_k"])
    scores = np.asarray(extras["best_score"])
    Zs = np.asarray(extras["linkage"])
    B = preds.shape[0]
    for b in range(B):
        emb = np.asarray(normalize_to_radius(jnp.asarray(x_p[b]), jnp.float32(scale)))
        plot_hyperbolic_eval(
            x=batch["points"][b], y=batch["labels"][b], y_pred=preds[b],
            emb_hidden=x_e[b], emb_poincare=emb, linkage_matrix=Zs[b],
            k=ks[b], score=scores[b],
            screenshot=os.path.join(plot_dir, f"{batch_index * B + b}.png"),
        )
