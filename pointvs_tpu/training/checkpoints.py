"""Orbax checkpointing with the reference's layout and sidecar files.

Layout (ref point_neural_network_base.py:501-517):

    <save_path>/model_kwargs.yaml          # architecture config
    <save_path>/cmd_args.yaml              # full flag snapshot (CLI writes)
    <save_path>/checkpoints/<task>_ckpt_epoch_<n>/   # orbax dir per epoch

Each checkpoint holds params, optimiser state, both epoch counters and the
lr/weight decay, so crash-resume restores exactly (resume_training parity).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from pointvs_tpu.utils import expand_path, find_latest_checkpoint


def save_checkpoint(path, params, opt_state, p_epoch: int, a_epoch: int,
                    lr: float, weight_decay: Optional[float]) -> Path:
    """Write one checkpoint directory (overwrites an existing one)."""
    path = expand_path(path)
    state = {
        'params': jax.tree.map(np.asarray, params),
        'opt_state': jax.tree.map(np.asarray, opt_state),
        'meta': {
            'p_epoch': p_epoch,
            'a_epoch': a_epoch,
            'learning_rate': float(lr),
            'weight_decay': float(weight_decay or 0.0),
        },
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(path, params_like, opt_state_like
                       ) -> Dict[str, Any]:
    """Restore against abstract targets (shape/dtype templates)."""
    path = expand_path(path)
    if path.is_dir() and not (path / '_CHECKPOINT_METADATA').exists():
        # A run directory rather than a checkpoint: find the latest.
        path = find_latest_checkpoint(path)
    abstract = {
        'params': jax.tree.map(ocp.utils.to_shape_dtype_struct, params_like),
        'opt_state': jax.tree.map(
            ocp.utils.to_shape_dtype_struct, opt_state_like),
        'meta': {
            'p_epoch': 0,
            'a_epoch': 0,
            'learning_rate': 0.0,
            'weight_decay': 0.0,
        },
    }
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
