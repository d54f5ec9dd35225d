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
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        self._csv_schema_idx = 0
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
        fields = sorted(rec)
        if self._csv_writer is None or fields != self._csv_fields:
            # one schema per file: appending a second header + different-width
            # rows to the same metrics.csv (e.g. the test pass after training)
            # made the file unparseable for pandas.read_csv
            if self._csv_file:
                self._csv_file.close()
                self._csv_schema_idx += 1
            self._csv_fields = fields
            name = ("metrics.csv" if self._csv_schema_idx == 0
                    else f"metrics_{self._csv_schema_idx}.csv")
            self._csv_file = open(os.path.join(self.log_dir, name), "a", newline="")
            self._csv_writer = csv.DictWriter(self._csv_file, fieldnames=fields)
            self._csv_writer.writeheader()
        self._csv_writer.writerow(rec)
        self._csv_file.flush()
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def close(self):
        self.jsonl.close()
        if self._csv_file:
            self._csv_file.close()
        if self.wandb is not None:
            self.wandb.finish()
