"""Instantiation smoke tests (ported from test/test_class_instantiation.py)."""
import numpy as np

from pointvs_tpu.data.dataset import PointCloudDataset
from pointvs_tpu.models import build_model

from .setup_and_params import DATALOADER_KWARGS, MODEL_KWARGS, RESOURCES

np.random.seed(2)


def test_models_instantiate():
    for name in ('egnn', 'lucid', 'multitask'):
        model = build_model(name, **MODEL_KWARGS)
        assert model.k == 32


def test_dataset_instantiation():
    ds = PointCloudDataset(RESOURCES, **DATALOADER_KWARGS)
    assert len(ds) == 2
    sample = ds[0]
    assert sample.node_feats.shape[1] == 12
    assert sample.coords.shape[1] == 3
    assert sample.num_edges > 0
