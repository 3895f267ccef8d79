"""Edge cases through the static-shape machinery: graphs with no real
edges, single-node graphs, all-padding batches slots."""
import jax
import numpy as np
import pytest

from pointvs_tpu.data.buckets import GraphSample, pad_graphs_to_batch
from pointvs_tpu.models import build_model

from .setup_and_params import MODEL_KWARGS


def _sample(n_nodes, edges=None):
    rng = np.random.RandomState(0)
    if edges is None:
        senders = receivers = np.zeros(0, np.int32)
        attr = np.zeros((0, 3), np.float32)
    else:
        senders, receivers = edges
        attr = np.eye(3, dtype=np.float32)[
            rng.randint(0, 3, len(senders))]
    return GraphSample(
        node_feats=rng.rand(n_nodes, 12).astype(np.float32),
        coords=rng.rand(n_nodes, 3).astype(np.float32) * 5,
        senders=np.asarray(senders, np.int32),
        receivers=np.asarray(receivers, np.int32),
        edge_attr=attr, y=np.float32(1))


def test_edgeless_graph_forward():
    batch = pad_graphs_to_batch([_sample(10)], num_graphs=1)
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert np.isfinite(out).all()


def test_single_node_graph_forward():
    batch = pad_graphs_to_batch([_sample(1)], num_graphs=1)
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(0), batch)
    assert np.isfinite(np.asarray(model.apply(params, batch))).all()


def test_mixed_batch_with_edgeless_graph():
    rng = np.random.RandomState(1)
    n = 20
    senders = rng.randint(0, n, 60)
    receivers = rng.randint(0, n, 60)
    keep = senders != receivers
    full = _sample(n, (senders[keep], receivers[keep]))
    empty = _sample(5)
    batch = pad_graphs_to_batch([full, empty, full], num_graphs=4)
    model = build_model('lucid', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert out.shape[0] == 4
    assert np.isfinite(out[:3]).all()
    # identical graphs in the same batch produce identical outputs
    assert out[0, 0] == pytest.approx(out[2, 0], abs=3e-5)


def test_deep_graphnorm_padding_stability():
    """Regression: GraphNorm broadcast zero stats onto PADDING rows and
    amplified them ~1/sqrt(eps) per layer — finite until ~12 layers, inf
    at 13+, then NaN in real rows via 0*inf in masked aggregation. A
    16-layer graphnorm model on a padded batch must stay finite (and the
    fix zeroes padding rows, which every consumer masks anyway)."""
    import jax
    import numpy as np
    from pointvs_tpu.models import build_model
    from .setup_and_params import ORIGINAL_GRAPH

    assert float(np.sum(np.asarray(ORIGINAL_GRAPH.node_mask) == 0)) > 0, \
        'fixture must contain padding rows for this regression test'
    model = build_model('egnn', dim_input=12, k=16, dim_output=1,
                        num_layers=16, edge_attention=True,
                        softmax_attention=True, graphnorm=True,
                        residual=True, normalize=True, tanh=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    out = np.asarray(model.apply(params, ORIGINAL_GRAPH))
    assert np.isfinite(out).all(), out
