"""Tests for the siamese two-tower and dense (p, v, m) model families."""
import jax
import numpy as np
import pytest

from pointvs_tpu.data.preprocessing import uniform_random_rotation
from pointvs_tpu.models.siamese import SiameseEGNN
from pointvs_tpu.models.vanilla import DenseEGNN, dense_collate

from .setup_and_params import EGNN_EPS, ORIGINAL_GRAPH

np.random.seed(2)


def test_siamese_forward():
    model = SiameseEGNN(dim_input=12, k=16, num_layers=2)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH,
                        ORIGINAL_GRAPH)
    out = model.apply(params, ORIGINAL_GRAPH, ORIGINAL_GRAPH)
    assert out.shape == (1, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dense_egnn_invariance():
    """The dense family preserves the E(3)-invariance gate."""
    from pointvs_tpu.data.dataset import PointCloudDataset
    from .setup_and_params import RESOURCES
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    p, v, m, y = dense_collate([ds[0], ds[1]])

    model = DenseEGNN(dim_input=12, k=16, num_layers=3, cutoff=4.0)
    params = model.init(jax.random.PRNGKey(2), p, v, m)
    out = model.apply(params, p, v, m)
    assert out.shape == (2, 1)

    p_rot = np.stack([uniform_random_rotation(p[i]) for i in range(2)])
    out_rot = model.apply(params, p_rot.astype(np.float32), v, m)
    np.testing.assert_allclose(
        jax.nn.sigmoid(out), jax.nn.sigmoid(out_rot), atol=EGNN_EPS)


def test_dense_collate_shapes():
    from pointvs_tpu.data.dataset import PointCloudDataset
    from .setup_and_params import RESOURCES
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    p, v, m, y = dense_collate([ds[0], ds[1]])
    assert p.shape[0] == 2 and p.shape[2] == 3
    assert v.shape[:2] == p.shape[:2]
    assert (m.sum(axis=1) > 0).all()
