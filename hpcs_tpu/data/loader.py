"""Minimal epoch-based batch loader producing jit-ready numpy batches.

Replaces the torch DataLoader usage (/root/reference/train.py:187-189).
Batches are dicts of stacked numpy arrays: points [B, N, 3], labels [B, N],
category [B] (ShapeNet-style datasets).  PartNet items have no category; a
zero is substituted (the reference uses a dummy single category there).
"""
import numpy as np


def _collate(items):
    if len(items[0]) == 3:
        pts, cls, seg = zip(*items)
        return {
            "points": np.stack(pts)[..., :3].astype(np.float32),
            "category": np.asarray(cls, np.int32),
            "labels": np.stack(seg).astype(np.int32),
        }
    pts, seg = zip(*items)
    return {
        "points": np.stack(pts)[..., :3].astype(np.float32),
        "category": np.zeros(len(pts), np.int32),
        "labels": np.stack(seg).astype(np.int32),
    }


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield _collate([self.dataset[int(i)] for i in idx])
