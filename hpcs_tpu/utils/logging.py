"""Metric logging: CSV + JSONL, with optional wandb passthrough.

The reference logs everything to Weights & Biases (train.py:247,294).  Here
metrics always land in run-local csv/jsonl files (greppable, offline-safe);
wandb is used when importable *and* explicitly enabled.
"""
import csv
import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir, run_name="run", use_wandb=False, wandb_mode="offline",
                 config=None):
        self.log_dir = os.path.join(log_dir, run_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        # schema tuple -> (file, DictWriter): records that alternate between
        # field sets (train-only vs train+val) reuse their schema's file
        # instead of allocating a new metrics_N.csv on every flip
        self._csv = {}
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project="HPCS", mode=wandb_mode, config=config or {})
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log(self, metrics, step=None):
        rec = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        rec["_time"] = time.time()
        if step is not None:
            rec["step"] = int(step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        fields = tuple(sorted(rec))
        if fields not in self._csv:
            # one schema per file: appending a second header + different-width
            # rows to the same metrics.csv (e.g. the test pass after training)
            # made the file unparseable for pandas.read_csv
            idx = len(self._csv)
            name = "metrics.csv" if idx == 0 else f"metrics_{idx}.csv"
            f = open(os.path.join(self.log_dir, name), "a", newline="")
            w = csv.DictWriter(f, fieldnames=list(fields))
            w.writeheader()
            self._csv[fields] = (f, w)
        f, w = self._csv[fields]
        w.writerow(rec)
        f.flush()
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def close(self):
        self.jsonl.close()
        for f, _ in self._csv.values():
            f.close()
        self._csv = {}
        if self.wandb is not None:
            self.wandb.finish()
