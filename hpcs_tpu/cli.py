"""Shared CLI configuration: dataset/model/system assembly.

Flag surface mirrors the reference exactly — names, defaults, and the
store_false traps (--miner and --hierarchical are ON by default, CosFace is
the default unless --triplet-sim): /root/reference/train.py:23-61.
One extension: `--dataset synthetic` runs the full pipeline on procedural
clouds (no download needed) — used by benchmarks and smoke tests.
The reference's `--hierarchy_list type=list` argparse foot-gun (train.py:54)
is fixed to a JSON string.
"""
import argparse
import json
import os
import os.path as osp

from .data import DataLoader, PartNetDataset, ShapeNetDataset, SyntheticPartDataset
from .data.hierarchy import get_hierarchy_list
from .models import HypHCSystem, ModelConfig


def add_train_args(parser):
    parser.add_argument('--log', default='logs', type=str, help='dirname for logs')
    parser.add_argument('--dataset', '-dataset', default='shapenet', type=str,
                        help='name of dataset to use (shapenet | partnet | synthetic)')
    parser.add_argument('--category', '-category', default=None, type=str, help='category from dataset')
    parser.add_argument('--level', '-level', default=3, type=int, help='granularity level of partnet object')
    parser.add_argument('--fixed_points', '-fixed_points', default=512, type=int, help='points retained from point cloud')
    parser.add_argument('--model', '-model', default='vn_dgcnn_partseg', type=str, help='model to use to extract features')
    parser.add_argument('--train_rotation', '-train_rotation', default='so3', type=str, help='type of rotation augmentation for train')
    parser.add_argument('--test_rotation', '-test_rotation', default='so3', type=str, help='type of rotation augmentation for test')
    parser.add_argument('--eucl_embedding', '-eucl_embedding', default=2, type=int, help='dimension of euclidean space')
    parser.add_argument('--hyp_embedding', '-hyp_embedding', default=2, type=int, help='dimension of poincare space')
    parser.add_argument('--k', '-k', default=10, type=int, help='if model dgcnn, k is the number of neigh to take into account')
    parser.add_argument('--margin', '-margin', default=0.05, type=float, help='margin value to use in miner loss')
    parser.add_argument('--t_per_anchor', '-t_per_anchor', default=50, type=int, help='triplets per anchor')
    parser.add_argument('--fraction', '-fraction', default=1.2, type=float, help='number of triplets for underrepresented classes')
    parser.add_argument('--temperature', '-temperature', default=1, type=float, help='rescale softmax value used in the hyphc loss')
    parser.add_argument('--epochs', '-epochs', default=50, type=int, help='number of epochs')
    parser.add_argument('--batch', '-batch', default=6, type=int, help='batch size')
    parser.add_argument('--lr', '-lr', default=0.005, type=float, help='learning rate')
    parser.add_argument('--accelerator', '-accelerator', default='tpu', type=str, help='tpu | cpu (jax platform)')
    parser.add_argument('--num_workers', '-num_workers', default=0, type=int,
                        help='data-loader prefetch threads (0 = synchronous)')
    parser.add_argument('--dropout', '-dropout', default=0.5, type=float, help='dropout in the feature extractor')
    parser.add_argument('--anneal_factor', '-anneal_factor', default=2, type=float, help='annealing factor')
    parser.add_argument('--anneal_step', '-anneal_step', default=0, type=int, help='use annealing each n step')
    parser.add_argument('--patience', '-patience', default=50, type=int, help='patience value for early stopping')
    parser.add_argument('--trade_off', '-trade_off', default=1.0, type=float, help='control trade-off between two losses')
    parser.add_argument('--miner', action='store_false', help='triplet miner for hyperbolic loss (default ON)')
    parser.add_argument('--triplet-sim', dest='triplet_sim', action='store_true', help='cosface / triplet loss')
    parser.add_argument('--class_vector', action='store_true', help='class vector to decode')
    parser.add_argument('--hierarchical', action='store_false', help='hierarchical loss (default ON for partnet)')
    parser.add_argument('--hierarchy_list', '-hierarchy_list', default='[]', type=str, help='precomputed hierarchy list as JSON')
    parser.add_argument('--plot_inference', action='store_true', help='plot visualizations during testing')
    parser.add_argument('--pretrained', action='store_true', help='load pretrained model')
    parser.add_argument('--pretrained_path', type=str, default='',
                        help='explicit path to a raw backbone checkpoint (.t7/.pth); '
                             'default follows the reference (train.py:76-96): '
                             'model.partseg.vn_dgcnn.aligned.t7 for PartNet, '
                             'checkpoints/vndgcnn_backbone/best_model.pth otherwise')
    parser.add_argument('--infer', action='store_true', help='set this flag if you want only infer')
    parser.add_argument('--resume', type=str, default='', help='path to checkpoint dir to resume')
    parser.add_argument('--wandb', '-wandb', default='offline', type=str, help='online/offline/disabled wandb mode')
    parser.add_argument('--seed', type=int, default=0, help='prng seed')
    parser.add_argument('--num_triplets', type=int, default=0,
                        help='static triplet budget per step (0 = t_per_anchor * points)')
    parser.add_argument('--data_parallel', type=int, default=0,
                        help='shard the batch over this many devices (0 = all available)')
    parser.add_argument('--profile', type=str, default='',
                        help='write a jax.profiler trace to this directory')
    parser.add_argument('--debug_nans', action='store_true',
                        help='enable jax_debug_nans (pinpoints first NaN op)')
    parser.add_argument('--bf16', action='store_true',
                        help='bf16 backbone compute (fp32 norm math); measured +32%% '
                             'inference throughput on v5e, invariance noise grows '
                             'from tie-dominated ~4e-2 (see PLAN.md)')
    parser.add_argument('--layout', default='cv', choices=['cv', 'vc'],
                        help='VN feature layout (vc is inference-only intent: '
                             'its TRAINING backward is ~2.7x slower on TPU; '
                             'see models/config.py notes)')
    return parser


def select_platform(accelerator: str):
    """Switch the jax platform before any backend initialization, and enable
    the persistent XLA compilation cache (first compiles of the train/test
    steps cost 30-500 s over a remote-TPU link; cached relaunches are
    sub-second)."""
    import jax

    if accelerator in ("cpu", "gpu", "tpu"):
        if accelerator == "cpu":
            jax.config.update("jax_platforms", "cpu")
        # tpu/gpu: leave the default plugin in charge
    # single source of truth for the cache-dir keying (host fingerprint etc.)
    from hpcs_tpu import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()


def configure_data(args):
    """Datasets + class counts (reference configure, train.py:145-189)."""
    dataset = args.dataset
    if dataset == 'shapenet':
        data_folder = 'data/ShapeNet/raw'
        train_ds = ShapeNetDataset(root=data_folder, npoints=args.fixed_points, split='train', class_choice=args.category)
        valid_ds = ShapeNetDataset(root=data_folder, npoints=args.fixed_points, split='val', class_choice=args.category)
        test_ds = ShapeNetDataset(root=data_folder, npoints=args.fixed_points, split='test', class_choice=args.category)
        num_categories = 16
        num_class = 50 if args.category is None else len(train_ds.seg_classes[args.category])
        hierarchy_list = []
    elif dataset == 'partnet':
        data_folder = 'data/PartNet/sem_seg_h5/'
        hierarchy_list = []
        if args.hierarchical:
            levels = [
                i + 1 for i in range(3)
                if osp.exists(osp.join(data_folder, f'{args.category}-{i + 1}', 'train_files.txt'))
            ]
            hierarchy_list = get_hierarchy_list(
                'data/PartNet/after_merging_label_ids', args.category, levels
            )
        base = osp.join(data_folder, f'{args.category}-{args.level}')
        train_ds = PartNetDataset(osp.join(base, 'train_files.txt'), args.fixed_points)
        valid_ds = PartNetDataset(osp.join(base, 'val_files.txt'), args.fixed_points)
        test_ds = PartNetDataset(osp.join(base, 'test_files.txt'), args.fixed_points)
        with open(f'data/PartNet/after_merging_label_ids/{args.category}-level-{args.level}.txt') as fin:
            num_class = len(fin.readlines()) + 1
        num_categories = 1
    elif dataset == 'synthetic':
        num_categories = 4
        parts = 3
        num_class = num_categories * parts
        train_ds = SyntheticPartDataset(num_objects=64, npoints=args.fixed_points,
                                        num_categories=num_categories, parts_per_object=parts, seed=1)
        valid_ds = SyntheticPartDataset(num_objects=16, npoints=args.fixed_points,
                                        num_categories=num_categories, parts_per_object=parts, seed=2)
        test_ds = SyntheticPartDataset(num_objects=16, npoints=args.fixed_points,
                                       num_categories=num_categories, parts_per_object=parts, seed=3)
        hierarchy_list = []
    else:
        raise KeyError(f"Not available implementation for dataset: {dataset}")
    return train_ds, valid_ds, test_ds, num_class, num_categories, hierarchy_list


def configure(args):
    """Build (system, loaders) from parsed args."""
    train_ds, valid_ds, test_ds, num_class, num_categories, hierarchy_list = configure_data(args)

    if args.hierarchy_list and args.hierarchy_list != '[]':
        hierarchy_list = json.loads(args.hierarchy_list)

    def _freeze(h):
        return tuple(tuple(tuple(ch) for ch in lvl) for lvl in h)

    cfg = ModelConfig(
        dataset='partnet' if args.dataset == 'partnet' else 'shapenet',
        model_name=args.model,
        num_class=num_class,
        num_categories=num_categories,
        fixed_points=args.fixed_points,
        eucl_dim=args.eucl_embedding,
        hyp_dim=args.hyp_embedding,
        k=args.k,
        dropout=args.dropout,
        margin=args.margin,
        t_per_anchor=args.t_per_anchor,
        fraction=args.fraction,
        temperature=args.temperature,
        anneal_factor=args.anneal_factor,
        anneal_step=args.anneal_step,
        trade_off=args.trade_off,
        miner=args.miner,
        cosface=not args.triplet_sim,
        hierarchical=args.hierarchical and args.dataset == 'partnet',
        class_vector=args.class_vector,
        train_rotation=args.train_rotation,
        test_rotation=args.test_rotation,
        lr=args.lr,
        bf16=args.bf16,
        layout=getattr(args, 'layout', 'cv'),
        num_triplets=args.num_triplets or None,
        hierarchy_list=_freeze(hierarchy_list),
    )
    system = HypHCSystem(cfg)

    workers = getattr(args, 'num_workers', 0)
    train_loader = DataLoader(train_ds, args.batch, shuffle=True, drop_last=True,
                              seed=args.seed, num_workers=workers)
    valid_loader = DataLoader(valid_ds, args.batch, shuffle=False, drop_last=True,
                              num_workers=workers)
    # reference train.py:189: the TEST loader keeps the ragged tail
    test_loader = DataLoader(test_ds, args.batch, shuffle=False, drop_last=False,
                             num_workers=workers)
    return system, train_loader, valid_loader, test_loader
