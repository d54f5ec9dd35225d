"""Real-reader tests on fabricated mini datasets (no downloads).

Covers ShapeNetDataset split membership / category filtering / seg label
ranges / cache behavior (reference semantics shapenet.py:17-118) and
PartNetDataset h5 loading (partnet.py:8-38).
"""
import json
import os

import numpy as np
import pytest

from hpcs_tpu.data import DataLoader
from hpcs_tpu.data.shapenet import ShapeNetDataset

h5py = pytest.importorskip("h5py")


# ------------------------------------------------------------ mini ShapeNet
SYNSETS = {"Airplane": "02691156", "Chair": "03001627", "Mug": "03797390"}
SEG_BASE = {"Airplane": 0, "Chair": 12, "Mug": 36}


def _write_cloud(path, n, seg_labels, rng):
    xyz = rng.normal(size=(n, 3)) * 3.0 + 5.0  # deliberately un-normalized
    normals = rng.normal(size=(n, 3))
    seg = rng.choice(seg_labels, size=n)
    np.savetxt(path, np.column_stack([xyz, normals, seg]), fmt="%.6f")
    return seg


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_shapenet")
    rng = np.random.default_rng(0)
    with open(root / "synsetoffset2category.txt", "w") as f:
        for name, synset in SYNSETS.items():
            f.write(f"{name}\t{synset}\n")
    split_dir = root / "train_test_split"
    split_dir.mkdir()
    splits = {"train": [], "val": [], "test": []}
    truth = {}
    for name, synset in SYNSETS.items():
        d = root / synset
        d.mkdir()
        for i, split in enumerate(["train", "train", "val", "test"]):
            token = f"{name.lower()}_{i:04d}"
            seg = _write_cloud(d / f"{token}.txt", 40 + 10 * i,
                               [SEG_BASE[name], SEG_BASE[name] + 1], rng)
            splits[split].append(f"shape_data/{synset}/{token}")
            truth[token] = (name, set(seg.tolist()))
    for split, items in splits.items():
        with open(split_dir / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump(items, f)
    return root, truth


def test_split_membership(shapenet_root):
    root, _ = shapenet_root
    counts = {s: len(ShapeNetDataset(str(root), npoints=16, split=s))
              for s in ("train", "val", "test", "trainval")}
    assert counts == {"train": 6, "val": 3, "test": 3, "trainval": 9}


def test_category_filter_and_class_ids(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=16, split="train", class_choice="Chair")
    assert len(ds) == 2
    # class ids keep the GLOBAL category numbering even under filtering
    # (reference classes_original, shapenet.py:33-36)
    for i in range(len(ds)):
        _, cls, _ = ds[i]
        assert int(cls) == list(SYNSETS).index("Chair")


def test_seg_labels_and_normalization(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=64, split="train")
    for i in range(len(ds)):
        pts, cls, seg = ds[i]
        assert pts.shape == (64, 3) and seg.shape == (64,)
        name = list(SYNSETS)[int(cls)]
        assert set(np.unique(seg)) <= {SEG_BASE[name], SEG_BASE[name] + 1}
        # pc_normalize: centered, max radius 1 (cloud was offset by +5)
        assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5


def test_cache_not_renormalized(shapenet_root):
    """The reference re-normalizes its cached cloud in place every epoch
    (shapenet.py:104-106, a documented bug); ours must return identical
    underlying data on repeated access."""
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=0, split="val")
    first, _, _ = ds[0]
    again, _, _ = ds[0]
    np.testing.assert_array_equal(first, again)


def test_resample_with_replacement(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=500, split="test")
    pts, _, seg = ds[0]
    assert pts.shape == (500, 3)  # more than source points -> replacement


def test_normal_channel(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=16, split="train", normal_channel=True)
    pts, _, _ = ds[0]
    assert pts.shape == (16, 6)


def test_dataloader_collate(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=32, split="train")
    batch = next(iter(DataLoader(ds, 4)))
    assert batch["points"].shape == (4, 32, 3)
    assert batch["labels"].shape == (4, 32)
    assert batch["category"].shape == (4,)


# ------------------------------------------------------------- mini PartNet
@pytest.fixture(scope="module")
def partnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_partnet")
    rng = np.random.default_rng(1)
    names = []
    for fi in range(2):
        name = f"chunk{fi}.h5"
        with h5py.File(root / name, "w") as f:
            n_obj = 3 + fi
            f["data"] = rng.normal(size=(n_obj, 50, 3)).astype(np.float32) + 2.0
            f["data_num"] = np.full((n_obj,), 50, np.int32)
            f["label_seg"] = rng.integers(0, 5, size=(n_obj, 50)).astype(np.int64)
        names.append(name)
    with open(root / "train_files.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return root


def test_partnet_loads_all_h5(partnet_root):
    from hpcs_tpu.data.partnet import PartNetDataset

    ds = PartNetDataset(str(partnet_root / "train_files.txt"), npoints=32)
    assert len(ds) == 7  # 3 + 4 objects across the two files
    pts, seg = ds[0]
    assert pts.shape == (32, 3) and seg.shape == (32,)
    assert seg.max() < 5
    assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5


def test_partnet_dataloader_dummy_category(partnet_root):
    from hpcs_tpu.data.partnet import PartNetDataset

    ds = PartNetDataset(str(partnet_root / "train_files.txt"), npoints=16)
    batch = next(iter(DataLoader(ds, 2)))
    assert batch["category"].tolist() == [0, 0]  # dummy single category
    assert batch["points"].shape == (2, 16, 3)


# -------------------------------------------------------- prefetching loader
def test_prefetch_loader_matches_sync():
    from hpcs_tpu.data import SyntheticPartDataset

    ds = SyntheticPartDataset(num_objects=10, npoints=32, num_categories=2,
                              parts_per_object=3)  # deterministic per index
    sync = list(DataLoader(ds, 2))
    pre = list(DataLoader(ds, 2, num_workers=3))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["category"], b["category"])
        np.testing.assert_allclose(a["points"], b["points"])


def test_prefetch_loader_early_break_does_not_hang(shapenet_root):
    root, _ = shapenet_root
    ds = ShapeNetDataset(str(root), npoints=16, split="train")
    it = iter(DataLoader(ds, 1, num_workers=2, prefetch=2))
    next(it)
    it.close()  # generator close must not deadlock the producer


def test_prefetch_loader_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("boom")
            pts = np.zeros((8, 3), np.float32)
            return pts, np.int64(0), np.zeros(8, np.int64)

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Boom(), 2, num_workers=2))


def test_mini_dataset_generator_roundtrip(tmp_path):
    """tools/make_mini_datasets.py writes layouts the real readers load:
    ShapeNet txt tree (synset dirs, split jsons, 7-col rows) and PartNet h5 +
    after_merging_label_ids (num_class = level lines + 1 like the CLI)."""
    import subprocess
    import sys

    import numpy as np

    import os.path as osp

    root = tmp_path / "data"
    tool = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "tools", "make_mini_datasets.py")
    subprocess.run([sys.executable, tool, str(root)],
                   check=True, capture_output=True)

    from hpcs_tpu.data.hierarchy import get_hierarchy_list
    from hpcs_tpu.data.partnet import PartNetDataset
    from hpcs_tpu.data.shapenet import ShapeNetDataset

    sn = ShapeNetDataset(str(root / "ShapeNet" / "raw"), npoints=256,
                         split="train")
    assert len(sn) == 6  # 3 per category x 2 categories
    pts, cls, seg = sn[0]
    assert pts.shape == (256, 3) and seg.shape == (256,)
    # labels must come from the category's global seg-class table
    cap = ShapeNetDataset(str(root / "ShapeNet" / "raw"), npoints=256,
                          split="test", class_choice="Cap")
    _, _, seg_cap = cap[0]
    assert set(np.unique(seg_cap)) <= {6, 7}

    pn = PartNetDataset(
        str(root / "PartNet" / "sem_seg_h5" / "Bottle-3" / "train_files.txt"),
        npoints=256)
    assert len(pn) == 4
    p, ls = pn[0]
    assert p.shape == (256, 3) and set(np.unique(ls)) <= set(range(1, 9))

    with open(root / "PartNet" / "after_merging_label_ids"
              / "Bottle-level-3.txt") as f:
        assert len(f.readlines()) + 1 == 9  # reference Bottle num_class

    hl = get_hierarchy_list(
        str(root / "PartNet" / "after_merging_label_ids"), "Bottle", [1, 3])
    assert len(hl) == 2 and len(hl[1]) == 8  # level 3: one branch per leaf
