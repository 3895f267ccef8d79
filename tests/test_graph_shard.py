"""Graph-sharded (edge-parallel) inference parity: splitting one graph's
edges over a 4-device mesh must reproduce the single-device forward."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model
from pointvs_tpu.parallel.graph_shard import (
    make_sharded_forward,
    shard_graph_batch,
)
from pointvs_tpu.parallel.mesh import get_mesh, replicate, shard_batch

from .setup_and_params import MODEL_KWARGS, RESOURCES

np.random.seed(2)


def _sample():
    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    return ds[0]


def test_edge_parallel_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    sample = _sample()

    # Single-device truth
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    full_batch = pad_graphs_to_batch([sample], num_graphs=1)
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), full_batch)
    expected = np.asarray(model.apply(params, full_batch))

    # Edge-parallel over 4 devices
    sharded_model = build_model('egnn', edge_shard_axis='gp',
                                **MODEL_KWARGS)
    mesh = get_mesh(4, axis_name='gp')
    batch = shard_graph_batch(sample, 4)
    fwd = make_sharded_forward(sharded_model, mesh)
    got = np.asarray(fwd(replicate(params, mesh),
                         shard_batch(batch, mesh, axis_name='gp')))
    np.testing.assert_allclose(got, expected, atol=2e-5)
