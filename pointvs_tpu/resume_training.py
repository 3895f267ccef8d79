"""Crash-resume: reload the latest checkpoint + saved args and continue.

Ref parity: point_vs/resume_training.py — rebuild all four dataloaders from
cmd_args.yaml, restore params/optimiser/epoch counters, then continue the
pose and/or affinity phases from the saved p_epoch/a_epoch.

Usage: python -m pointvs_tpu.resume_training <run_dir>
"""
from __future__ import annotations

import argparse
from types import SimpleNamespace

from pointvs_tpu.logging import get_logger
from pointvs_tpu.main import build_loaders
from pointvs_tpu.models.load_model import load_model

LOG = get_logger('PointVS-TPU')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('base_path', help='Run directory to resume')
    parser.add_argument('--num_devices', type=int, default=None)
    args = parser.parse_args(argv)

    trainer, model_kwargs, cmd_args = load_model(
        args.base_path, init_path=True, num_devices=args.num_devices)
    saved = SimpleNamespace(**cmd_args)
    saved.num_devices = args.num_devices or getattr(
        saved, 'num_devices', None) or trainer.num_devices
    for attr, default in (('prefetch', 2), ('seed', 2),
                          ('cache_dir', None), ('p_noise', -1),
                          ('p_remove_entity', 0), ('graph_shard', 1),
                          ('node_bucket', None), ('edge_bucket', None),
                          ('scatter_cap', None)):
        if not hasattr(saved, attr):
            setattr(saved, attr, default)

    (train_pose, train_affinity, test_pose, test_affinity,
     regression_task) = build_loaders(saved, trainer.num_devices)

    epochs_pose = getattr(saved, 'epochs_pose', 0)
    epochs_affinity = getattr(saved, 'epochs_affinity', 0)
    LOG.info(f'Resuming from pose epoch {trainer.p_epoch}, affinity epoch '
             f'{trainer.a_epoch}')

    if epochs_pose and train_pose is not None \
            and trainer.p_epoch < epochs_pose:
        trainer.set_task('classification')
        trainer.train_model(
            train_pose, epochs=epochs_pose,
            top1_on_end=getattr(saved, 'top1', False),
            epoch_end_validation_set=(
                test_pose if getattr(saved, 'val_on_epoch_end', False)
                else None))
    if test_pose is not None:
        trainer.set_task('classification')
        trainer.val(test_pose, top1_on_end=getattr(saved, 'top1', False))
    if epochs_affinity and train_affinity is not None \
            and trainer.a_epoch < epochs_affinity:
        trainer.set_task(regression_task)
        trainer.train_model(
            train_affinity, epochs=epochs_affinity,
            top1_on_end=getattr(saved, 'top1', False),
            epoch_end_validation_set=(
                test_affinity if getattr(saved, 'val_on_epoch_end', False)
                else None))
    if test_affinity is not None:
        trainer.set_task(regression_task)
        trainer.val(test_affinity, top1_on_end=getattr(saved, 'top1', False))

    if getattr(saved, 'end_flag', False):
        (trainer.save_path / '_FINISHED').write_text('')
    LOG.info('Resume complete.')
    return trainer


if __name__ == '__main__':
    main()
