"""Host-side point-cloud transforms.

Behavioral reference: /root/reference/hpcs/utils/data.py:24-42 (pc_normalize,
to_categorical) and the __getitem__ resampling of the datasets
(shapenet.py:108-112, partnet.py:31-33).

The reference's ShapeNet loader normalizes its cached array in place, so the
cache holds double-normalized points after the first epoch
(shapenet.py:104-106) — we normalize a copy (documented fix; pc_normalize is
idempotent only for already-centered clouds).
"""
import numpy as np


def pc_normalize(pc):
    """Center to the centroid, scale to the unit max-radius sphere."""
    pc = np.asarray(pc, np.float32)
    centroid = pc.mean(axis=0)
    pc = pc - centroid
    m = np.max(np.sqrt((pc**2).sum(axis=1)))
    return pc / max(m, 1e-12)


def resample(rng: np.random.Generator, points, labels, npoints):
    """Random resample with replacement to a fixed point count."""
    choice = rng.integers(0, len(labels), size=npoints)
    return points[choice], labels[choice]


def to_categorical(y, num_classes):
    return np.eye(num_classes, dtype=np.float32)[np.asarray(y, np.int64)]
