"""Main train+eval driver (ref: point_vs.py).

Usage:
    python point_vs_tpu.py <model> <save_path> \
        --train_types_pose data/small_chembl_test.types \
        --train_data_root_pose data/small_chembl_test -ep 1 --layers 3

Sequential pose -> affinity training with the multitask model is selected
with --model_task both (ref point_vs.py:40-43, :256-271).
"""
from __future__ import annotations

import os
import socket
from pathlib import Path

import jax

from pointvs_tpu.config import model_kwargs_from_args, parse_args
from pointvs_tpu.data.dataset import SynthPharmDataset
from pointvs_tpu.data.loader import get_data_loader
from pointvs_tpu.logging import get_logger
from pointvs_tpu.training.engine import Trainer
from pointvs_tpu.utils import load_yaml, mkdir, save_yaml


def build_loaders(args, num_devices: int):
    """Pose/affinity x train/test dataloaders from the flag set
    (ref point_vs.py:108-185)."""
    from pointvs_tpu.models.registry import model_input_kind
    regression_task = ('multi_regression'
                       if (args.multi_target_affinity
                           or args.model_task == 'multi_regression')
                       else 'regression')
    dataset_class = (SynthPharmDataset if args.synthpharm else None)
    input_kind = model_input_kind(args.model)
    import jax as _jax
    n_proc = _jax.process_count()
    if args.batch_size % max(1, n_proc * max(1, args.graph_shard)):
        raise SystemExit(
            f'--batch_size {args.batch_size} must be divisible by '
            f'process_count ({n_proc}) x graph_shard')
    dl_kwargs = {
        # Model input kind decides collation: 'pair' builds bp-filtered
        # receptor/ligand tower datasets (ref siamese.py zipped loaders),
        # 'dense' builds zero-padded (p, v, m) batches (ref vanilla).
        'layout': {'pair': 'pair', 'dense': 'dense'}.get(input_kind,
                                                         'graph'),
        # Multi-host (--multihost): each process draws a disjoint stripe
        # of the SAME seeded index stream and collates only its OWN
        # device rows ([D_local, ...], 1/n_proc of the global batch);
        # mesh.shard_batch concatenates the rows in process order into
        # the global batch, so the union of stripes at step k is exactly
        # the single-process batch k (SURVEY.md section 5.8).
        'shard_index': _jax.process_index(),
        'num_shards': n_proc,
        'batch_size': args.batch_size // n_proc,
        'compact': args.compact,
        'radius': args.radius,
        'use_atomic_numbers': args.use_atomic_numbers,
        'rot': False,
        'polar_hydrogens': args.hydrogens,
        'fname_suffix': args.input_suffix,
        'edge_radius': args.edge_radius,
        'estimate_bonds': args.estimate_bonds,
        'prune': args.prune,
        'extended_atom_types': args.extended_atom_types,
        'include_strain_info': args.include_strain_info,
        # Loader num_devices counts THIS process's data-parallel rows:
        # with --graph_shard the full mesh is (dp rows) x (gp edge
        # shards), and with --multihost the global rows split evenly
        # over processes.
        'num_devices': num_devices // max(1, args.graph_shard) // n_proc,
        'graph_shard': args.graph_shard,
        'prefetch': args.prefetch,
        'seed': args.seed,
        'cache_dir': args.cache_dir,
    }
    if args.node_bucket:
        dl_kwargs['node_buckets'] = (args.node_bucket,)
    if args.edge_bucket:
        dl_kwargs['edge_buckets'] = (args.edge_bucket,)
    if getattr(args, 'scatter_cap', None):
        dl_kwargs['scatter_cap'] = args.scatter_cap
    if n_proc > 1 and not (args.node_bucket and args.edge_bucket):
        raise SystemExit('--multihost requires --node_bucket and '
                         '--edge_bucket: processes pad independently and '
                         'must agree on static shapes')
    if dataset_class is not None:
        dl_kwargs['dataset_class'] = dataset_class

    train_pose = train_affinity = test_pose = test_affinity = None
    if args.model_task != 'regression' and args.train_types_pose:
        train_pose = get_data_loader(
            args.train_data_root_pose,
            augmented_actives=args.augmented_actives,
            min_aug_angle=args.min_aug_angle,
            max_active_rms_distance=args.max_active_rmsd,
            min_inactive_rms_distance=args.min_inactive_rmsd,
            max_inactive_rms_distance=args.max_inactive_rmsd,
            types_fname=args.train_types_pose, mode='train',
            p_noise=args.p_noise, p_remove_entity=args.p_remove_entity,
            model_task='classification', **dl_kwargs)
    if args.model_task in ('both', 'regression', 'multi_regression') \
            and args.train_types_affinity:
        train_affinity = get_data_loader(
            args.train_data_root_affinity,
            augmented_actives=args.augmented_actives,
            min_aug_angle=args.min_aug_angle,
            types_fname=args.train_types_affinity, mode='train',
            p_noise=args.p_noise, p_remove_entity=args.p_remove_entity,
            model_task=regression_task, **dl_kwargs)
    if 'regression' not in args.model_task and args.test_data_root_pose:
        test_pose = get_data_loader(
            args.test_data_root_pose, types_fname=args.test_types_pose,
            mode='val', model_task='classification', **dl_kwargs)
    if args.model_task != 'classification' and args.test_data_root_affinity:
        test_affinity = get_data_loader(
            args.test_data_root_affinity,
            types_fname=args.test_types_affinity, mode='val',
            model_task=regression_task, **dl_kwargs)
    return train_pose, train_affinity, test_pose, test_affinity, \
        regression_task


def main(argv=None):
    args = parse_args(argv)
    log = get_logger('PointVS-TPU')

    from pointvs_tpu.models.registry import MODEL_REGISTRY
    if args.model not in MODEL_REGISTRY:
        raise SystemExit(
            f'model must be one of {sorted(MODEL_REGISTRY)}, '
            f'got {args.model!r}')
    if args.model_task == 'both' and args.model != 'multitask':
        raise RuntimeError(
            'Sequential pose -> affinity training is only compatible with '
            'the multitask architecture')
    for types_arg, root_arg in (
            ('train_types_pose', 'train_data_root_pose'),
            ('train_types_affinity', 'train_data_root_affinity'),
            ('test_types_pose', 'test_data_root_pose'),
            ('test_types_affinity', 'test_data_root_affinity')):
        if getattr(args, types_arg) and not getattr(args, root_arg):
            raise SystemExit(
                f'--{types_arg} requires --{root_arg} to be set')

    if args.double:
        # Reference --double == torch.set_default_dtype(float64)
        # (ref point_vs.py:46-51): real f64 params + compute. TPUs have
        # no f64 unit, so this is a CPU-only numerical-debugging mode —
        # hard error rather than a silent wrong-dtype path (VERDICT r3).
        if jax.default_backend() != 'cpu':
            raise SystemExit(
                '--double requires the CPU backend (TPU has no float64 '
                'hardware); run with JAX_PLATFORMS=cpu for f64 '
                'numerical debugging, or drop --double')
        jax.config.update('jax_enable_x64', True)
    if args.debug_nans:
        jax.config.update('jax_debug_nans', True)
    if args.multihost:
        # Multi-slice/multi-host: coordinator etc. from the standard env
        # (SURVEY.md section 5.8: grads all-reduce over ICI within a
        # slice and DCN across; data sharded per process below).
        jax.distributed.initialize()

    if args.load_args is not None:
        for key, value in load_yaml(args.load_args).items():
            if hasattr(args, key):
                setattr(args, key, value)

    if args.wandb_project is None:
        save_path = Path(args.save_path).expanduser()
    elif args.wandb_run is None:
        raise SystemExit(
            'wandb_run must be specified if wandb_project is specified.')
    else:
        save_path = Path(args.save_path, args.wandb_project,
                         args.wandb_run).expanduser()
    mkdir(save_path)
    log = get_logger('PointVS-TPU', save_path)

    num_devices = args.num_devices or len(jax.devices())
    if args.graph_shard > 1:
        if num_devices % args.graph_shard:
            raise SystemExit(
                f'--num_devices {num_devices} must be divisible by '
                f'--graph_shard {args.graph_shard}')
        if args.model not in ('egnn', 'lucid', 'en_transformer',
                              'multitask'):
            raise SystemExit('--graph_shard supports the egnn, lucid, '
                             'en_transformer and multitask models')
        # --graph_shard composes with --multihost: the Trainer's 2-D
        # (dp x gp) mesh spans all global devices (process-major device
        # order puts each process's rows contiguous on the dp axis), the
        # loader collates only this process's dp rows, and
        # mesh.shard_batch assembles the global [dp, gp, ...] batch.
        # Pinned against single-process training by tests/test_multihost
        # (2 procs x 2 dp x 2 gp == 1 proc x 4 dp x 2 gp).

    args.hostname = socket.gethostname()
    args.slurm_jobid = os.getenv('SLURM_JOBID')
    save_yaml(vars(args), save_path / 'cmd_args.yaml')

    (train_pose, train_affinity, test_pose, test_affinity,
     regression_task) = build_loaders(args, num_devices)

    for dl in (train_pose, train_affinity, test_pose, test_affinity):
        if dl is not None:
            dim_input = dl.dataset.feature_dim
            break
    else:
        raise SystemExit('No datasets specified — nothing to do.')

    model_kwargs = model_kwargs_from_args(args, dim_input)
    if args.model_task == 'both':
        model_kwargs['model_task'] = 'classification'

    trainer = Trainer(
        args.model, save_path, args.learning_rate, args.weight_decay,
        wandb_project=args.wandb_project, wandb_run=args.wandb_run,
        wandb_dir=args.wandb_dir, use_1cycle=args.use_1cycle,
        warm_restarts=args.warm_restarts,
        only_save_best_models=args.only_save_best_models,
        regression_loss=args.regression_loss, optimiser=args.optimiser,
        num_devices=num_devices, seed=args.seed, profile=args.profile,
        graph_shard=args.graph_shard, device_cache=args.device_cache,
        double=args.double, **model_kwargs)

    if args.load_weights is not None:
        trainer.load_weights(args.load_weights)
    if getattr(args, 'import_torch_weights', None):
        trainer.import_torch_weights(args.import_torch_weights)

    if args.epochs_pose and train_pose is not None:
        trainer.set_task('classification')
        trainer.train_model(
            train_pose, epochs=args.epochs_pose, top1_on_end=args.top1,
            epoch_end_validation_set=(test_pose if args.val_on_epoch_end
                                      else None))
    if test_pose is not None:
        trainer.set_task('classification')
        trainer.val(test_pose, top1_on_end=args.top1)
    if args.epochs_affinity and train_affinity is not None:
        trainer.set_task(regression_task)
        trainer.train_model(
            train_affinity, epochs=args.epochs_affinity,
            top1_on_end=args.top1,
            epoch_end_validation_set=(test_affinity if args.val_on_epoch_end
                                      else None))
    if test_affinity is not None:
        trainer.set_task(regression_task)
        trainer.val(test_affinity, top1_on_end=args.top1)

    if args.end_flag:
        (save_path / '_FINISHED').write_text('')
    log.info('Done.')
    return trainer


if __name__ == '__main__':
    main()
