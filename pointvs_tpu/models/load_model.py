"""Rebuild a Trainer from a saved run directory or checkpoint.

Ref parity: point_vs/models/load_model.py — locate the latest checkpoint,
read model_kwargs.yaml + cmd_args.yaml sidecars, reconstruct the model and
restore weights + optimiser state + epoch counters.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, find_latest_checkpoint, load_yaml

LOG = get_logger('PointVS-TPU')


def _resolve(weights_path) -> Tuple[Path, Path]:
    """(checkpoint_path, run_root) from a run dir or checkpoint path."""
    weights_path = expand_path(weights_path)
    if weights_path.is_file():
        # Direct checkpoint file (e.g. a reference-trained .pt).
        ckpt = weights_path
        root = ckpt.parent
        if root.name == 'checkpoints':
            root = root.parent
        return ckpt, root
    if (weights_path / 'checkpoints').is_dir() or not (
            weights_path / '_CHECKPOINT_METADATA').exists():
        try:
            ckpt = find_latest_checkpoint(weights_path)
        except FileNotFoundError:
            if (weights_path / '_CHECKPOINT_METADATA').exists():
                ckpt = weights_path
            else:
                raise
    else:
        ckpt = weights_path
    # Run root holds model_kwargs.yaml: ckpt is <root>/checkpoints/<name>.
    root = ckpt.parent
    if root.name == 'checkpoints':
        root = root.parent
    return ckpt, root


def load_model(weights_path, silent: bool = False,
               init_path: bool = False, num_devices: Optional[int] = None):
    """Returns (trainer, model_kwargs, cmd_args).

    init_path=True re-opens the original run directory for continued
    training (resume); otherwise the trainer is silent (no new sidecars).
    """
    from pointvs_tpu.training.engine import Trainer  # local: avoid cycle

    ckpt, root = _resolve(weights_path)
    model_kwargs = load_yaml(root / 'model_kwargs.yaml') or {}
    cmd_args_path = root / 'cmd_args.yaml'
    cmd_args = load_yaml(cmd_args_path) if cmd_args_path.exists() else {}

    if ckpt.suffix in ('.pt', '.pth'):
        # Reference-trained PointVS run dir: its sidecars use the same
        # schema (ref point_vs/models/load_model.py:49-57 incl. the
        # node_attention/egnn_attention back-compat), and the torch
        # state_dict is imported by Trainer.load_weights. Two fixups:
        # the reference's 'act' kwarg never reaches its layers (SiLU is
        # hardcoded, egnn_satorras.py build_net swallows it), and torch
        # checkpoints are per-layer so the scan-stacked layout is off.
        if 'node_attention' not in cmd_args:
            cmd_args['node_attention'] = False
        if 'edge_attention' not in cmd_args:
            cmd_args['edge_attention'] = cmd_args.get(
                'egnn_attention', False)
            model_kwargs['edge_attention'] = cmd_args['edge_attention']
        model_kwargs.pop('act', None)
        model_kwargs.setdefault('scan_layers', False)

    model_name = cmd_args.get('model', 'egnn')
    if cmd_args.get('double', False):
        # f64 checkpoints (--double) need x64 enabled before any jax
        # array is created, or restore silently downcasts to f32.
        import jax
        if jax.default_backend() != 'cpu':
            raise ValueError('this model was trained with --double '
                             '(float64); load it on the CPU backend')
        jax.config.update('jax_enable_x64', True)
    trainer = Trainer(
        model_name,
        root if init_path else root,
        cmd_args.get('learning_rate', 1e-3),
        cmd_args.get('weight_decay', 1e-4),
        use_1cycle=cmd_args.get('use_1cycle', False),
        warm_restarts=cmd_args.get('warm_restarts', False),
        only_save_best_models=cmd_args.get('only_save_best_models', False),
        optimiser=cmd_args.get('optimiser', 'adam'),
        regression_loss=cmd_args.get('regression_loss', 'mse'),
        silent=not init_path,
        num_devices=num_devices,
        # Edge sharding only matters for continued training (resume):
        # params are sharding-independent, so plain inference loads the
        # checkpoint on an ordinary dp mesh.
        graph_shard=(cmd_args.get('graph_shard', 1) if init_path else 1),
        device_cache=cmd_args.get('device_cache', 'auto'),
        double=cmd_args.get('double', False),
        **model_kwargs)
    trainer.load_weights(ckpt, silent=silent)
    return trainer, model_kwargs, cmd_args
