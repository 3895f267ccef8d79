"""Softmax edge-attention normalisation gate (ported from
test/test_attention.py): per destination node, attention over incoming real
edges sums to 1 (+-1e-6); padded edges contribute exactly 0."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import MODEL_KWARGS, ORIGINAL_GRAPH_TWO_ITEMS

np.random.seed(2)


def test_satorras_egnn_attention():
    graph = ORIGINAL_GRAPH_TWO_ITEMS
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), graph)
    _, aux = model.apply(params, graph, capture_aux=True)

    senders = np.asarray(graph.senders)
    edge_mask = np.asarray(graph.edge_mask)
    real = edge_mask > 0
    n_real_nodes = int(graph.node_mask.sum())

    checked = False
    for layer_aux in aux['layers']:
        if 'att_val' not in layer_aux:
            continue
        checked = True
        att = np.asarray(layer_aux['att_val']).squeeze(-1)
        # Padded edges carry exactly zero attention.
        np.testing.assert_allclose(att[~real], 0.0, atol=0)
        sums = np.zeros(n_real_nodes)
        np.add.at(sums, senders[real], att[real])
        np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-6)
    if not checked:
        pytest.fail('No attention layers found in aux outputs')


def test_fused_softmax_aggregation_matches_explicit():
    """The capture_aux path materialises per-edge softmax attention; the
    training path folds the normalisation into the aggregation scatter
    (sum softmax*m == sum(expd*m)/sum(expd)). Same params, same batch:
    outputs must agree to fp-reassociation tolerance."""
    import jax
    import numpy as np
    from pointvs_tpu.models import build_model
    from .setup_and_params import MODEL_KWARGS, ORIGINAL_GRAPH

    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    fused = np.asarray(model.apply(params, ORIGINAL_GRAPH))
    explicit, _aux = model.apply(params, ORIGINAL_GRAPH, capture_aux=True)
    np.testing.assert_allclose(fused, np.asarray(explicit), atol=1e-5)
