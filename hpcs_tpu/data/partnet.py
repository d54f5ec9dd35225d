"""PartNet sem-seg h5 dataset reader.

Behavioral reference: /root/reference/hpcs/data/partnet.py:8-38 — loads all
h5 files from `{split}_files.txt` into RAM (keys data/data_num/label_seg),
normalizes and randomly resamples per access.
"""
import os

import numpy as np

from .transforms import pc_normalize, resample

try:
    import h5py

    HAVE_H5PY = True
except Exception:  # pragma: no cover
    HAVE_H5PY = False


class PartNetDataset:
    def __init__(self, filelist, npoints):
        points, point_nums, labels_seg = [], [], []
        folder = os.path.dirname(filelist)
        with open(filelist) as f:
            for line in f:
                with h5py.File(os.path.join(folder, line.strip()), "r") as data:
                    points.append(data["data"][...].astype(np.float32))
                    point_nums.append(data["data_num"][...].astype(np.int32))
                    labels_seg.append(data["label_seg"][...].astype(np.int64))
        self.points = np.concatenate(points, axis=0)
        self.data_num = np.concatenate(point_nums, axis=0)
        self.label_seg = np.concatenate(labels_seg, axis=0)
        self.npoints = npoints
        self._seed = 0  # per-item rng; see shapenet.py note

    def __len__(self):
        return self.points.shape[0]

    def __getitem__(self, index):
        points = self.points[index]
        label_seg = self.label_seg[index]
        points = np.concatenate([pc_normalize(points[:, 0:3]), points[:, 3:]], axis=1)
        rng = np.random.default_rng((self._seed, index))
        points, label_seg = resample(rng, points, label_seg, self.npoints)
        return points.astype(np.float32), label_seg
