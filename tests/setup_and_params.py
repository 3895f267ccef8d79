"""Shared fixtures for the parity test suite.

Mirrors the reference's test/setup_and_params.py: a batch-of-1 and
batch-of-2 graph built from the checked-in 7zzp-derived parquet fixtures,
one uniformly rotated copy, and the reference model config (k=32, 6 layers,
graphnorm + node attention + softmax edge attention).
"""
from pathlib import Path

import numpy as np

from pointvs_tpu.data import get_data_loader
from pointvs_tpu.data.preprocessing import uniform_random_rotation

RESOURCES = Path(__file__).parent / 'resources'

np.random.seed(2)

_loader_kwargs = dict(
    data_root=RESOURCES, compact=True, radius=4, use_atomic_numbers=False,
    rot=False, augmented_actives=0, min_aug_angle=0, polar_hydrogens=False,
    mode='val', types_fname=RESOURCES / 'test.types', fname_suffix='parquet',
    edge_radius=4, estimate_bonds=True, prefetch=0)

_dl_one = get_data_loader(batch_size=1, **_loader_kwargs)
_dl_two = get_data_loader(batch_size=2, **_loader_kwargs)

def _single_device(batch):
    """Strip the loader's leading [D=1, ...] device axis for direct
    model.apply use."""
    return type(batch)(*[np.asarray(a)[0] for a in batch])


ORIGINAL_GRAPH = _single_device(next(iter(_dl_one))[0])
ORIGINAL_GRAPH_TWO_ITEMS = _single_device(next(iter(_dl_two))[0])


def _rotated(batch):
    n_real = int(batch.node_mask.sum())
    coords = np.array(batch.coords)
    coords[:n_real] = uniform_random_rotation(coords[:n_real])
    return batch._replace(coords=coords.astype(np.float32))


ROTATED_GRAPH = _rotated(ORIGINAL_GRAPH)

EGNN_EPS = 3e-5
N_SAMPLES = 10

MODEL_KWARGS = {
    'k': 32,
    'num_layers': 6,
    'dropout': 0,
    'dim_input': 12,
    'dim_output': 1,
    'graphnorm': True,
    'update_coords': True,
    'node_attention': True,
    'residual': True,
    'edge_attention': True,
    'softmax_attention': True,
}

# Same architecture at 3 layers: for parity/mechanism tests whose property
# does not depend on depth — 6-layer unrolled CPU compiles dominated the
# suite wall time. The reference-ported tolerance gates (invariance,
# consistency, attention) keep the full 6-layer MODEL_KWARGS.
FAST_MODEL_KWARGS = dict(MODEL_KWARGS, num_layers=3)

DATALOADER_KWARGS = {
    'compact': True,
    'augmented_active_count': 0,
    'augmented_active_min_angle': 0,
    'polar_hydrogens': False,
    'max_active_rms_distance': None,
    'min_inactive_rms_distance': None,
    'use_atomic_numbers': False,
    'fname_suffix': 'parquet',
    'types_fname': str(RESOURCES / 'test.types'),
    'edge_radius': 6,
    'estimate_bonds': True,
    'prune': True,
}
