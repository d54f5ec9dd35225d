"""CLI surface parity tests against the reference's argparse definition."""
import argparse
import os
import re

import pytest

from hpcs_tpu.cli import add_train_args

REF_TRAIN = "/root/reference/train.py"


def _our_parser():
    return add_train_args(argparse.ArgumentParser())


def test_all_reference_flags_exist():
    """Every --flag the reference defines must parse here too."""
    if not os.path.exists(REF_TRAIN):
        pytest.skip("reference tree absent")
    src = open(REF_TRAIN).read()
    ref_flags = set(re.findall(r"add_argument\('(--[\w-]+)'", src))
    assert len(ref_flags) >= 29
    parser = _our_parser()
    ours = set()
    for action in parser._actions:
        ours.update(o for o in action.option_strings if o.startswith("--"))
    missing = ref_flags - ours
    assert not missing, f"missing reference flags: {missing}"


def test_store_false_traps_preserved():
    """--miner and --hierarchical are ON by default (store_false), and
    CosFace is the default loss (reference train.py:50-53,135)."""
    args = _our_parser().parse_args([])
    assert args.miner is True
    assert args.hierarchical is True
    assert args.triplet_sim is False  # cosface = not triplet_sim -> True
    args2 = _our_parser().parse_args(["--miner", "--hierarchical", "--triplet-sim"])
    assert args2.miner is False
    assert args2.hierarchical is False
    assert args2.triplet_sim is True


def test_reference_default_values_match():
    """Spot-check defaults the reference documents."""
    args = _our_parser().parse_args([])
    assert args.dataset == "shapenet"
    assert args.model == "vn_dgcnn_partseg"
    assert args.fixed_points == 512
    assert args.level == 3
    assert args.k == 10
    assert args.margin == 0.05
    assert args.t_per_anchor == 50
    assert args.fraction == 1.2
    assert args.epochs == 50
    assert args.batch == 6
    assert args.lr == 0.005
    assert args.patience == 50
    assert args.trade_off == 1.0
    assert args.dropout == 0.5
    assert args.anneal_step == 0


def test_short_option_aliases():
    """The reference exposes single-dash aliases (-dataset etc.)."""
    args = _our_parser().parse_args(["-dataset", "partnet", "-k", "20", "-lr", "0.05"])
    assert args.dataset == "partnet"
    assert args.k == 20
    assert args.lr == 0.05


def test_canonical_recipe_parses():
    """The run_train.sh recipe must parse cleanly."""
    argv = ("--dataset partnet --category Dishwasher --level 3 --fixed_points 1024 "
            "--model vn_dgcnn_partseg --eucl_embedding 4 --hyp_embedding 4 --k 20 "
            "--margin 0.35 --t_per_anchor 50 --fraction 1.2 --temperature 0.10 "
            "--epochs 40 --batch 2 --lr 0.05 --accelerator tpu --trade_off 0.10").split()
    args = _our_parser().parse_args(argv)
    assert args.category == "Dishwasher"
    assert args.temperature == 0.10
