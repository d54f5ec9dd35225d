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
    """Epoch iterator over a map-style dataset.

    With num_workers > 0, batches are assembled by a thread pool and staged
    in a bounded prefetch queue so disk IO / parsing (the native C++ txt
    parser releases the GIL) overlaps device compute — the role of the
    reference's torch DataLoader worker processes (train.py:187-189) without
    process-spawn overhead.
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 seed=0, num_workers=0, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(2, prefetch)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield idx

    def __iter__(self):
        if self.num_workers <= 0:
            for idx in self._batch_indices():
                yield _collate([self.dataset[int(i)] for i in idx])
            return
        yield from self._iter_prefetch()

    def _iter_prefetch(self):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        batches = list(self._batch_indices())
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _DONE = object()

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce(pool):
            def load_one(i):
                return self.dataset[int(i)]

            try:
                for idx in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(load_one, idx))
                    if not _put(_collate(items)):
                        return
                _put(_DONE)
            except BaseException as e:  # surface in the consumer, never hang it
                _put(("__error__", e))

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool, \
                ThreadPoolExecutor(max_workers=1) as driver:
            driver.submit(produce, pool)
            try:
                while True:
                    batch = q.get()
                    if batch is _DONE:
                        break
                    if isinstance(batch, tuple) and len(batch) == 2 \
                            and batch[0] == "__error__":
                        raise batch[1]
                    yield batch
            finally:
                stop.set()
