"""Fused inference engine parity: fused_forward (Pallas kernels in
interpret mode on CPU) must match model.apply for trained-checkpoint
param trees across model variants."""
import jax
import numpy as np
import pytest

from pointvs_tpu.inference_engine import fused_forward, supports_fusion
from pointvs_tpu.models import build_model

from .setup_and_params import MODEL_KWARGS, ORIGINAL_GRAPH

np.random.seed(2)


def _pad_nodes(batch, n_pad=256):
    """Grow node padding so the engine's 2-window minimum holds."""
    import numpy as np
    from pointvs_tpu.data.buckets import GraphBatch
    cur = batch.node_feats.shape[0]
    if cur >= n_pad:
        return batch
    extra = n_pad - cur
    grow = lambda a: np.concatenate(
        [np.asarray(a), np.zeros((extra,) + a.shape[1:], a.dtype)])
    senders = np.where(np.asarray(batch.senders) >= cur, n_pad,
                       batch.senders).astype(np.int32)
    receivers = np.where(np.asarray(batch.receivers) >= cur, n_pad,
                         batch.receivers).astype(np.int32)
    graph_id = np.where(np.asarray(batch.node_mask) > 0,
                        batch.graph_id, batch.num_graphs)
    return batch._replace(
        node_feats=grow(batch.node_feats), coords=grow(batch.coords),
        node_mask=grow(batch.node_mask),
        graph_id=grow(graph_id).astype(np.int32),
        senders=senders, receivers=receivers)


VARIANTS = {
    'softmax_attention': MODEL_KWARGS,
    'sigmoid_attention': {**MODEL_KWARGS, 'softmax_attention': False},
    'no_attention': {**MODEL_KWARGS, 'edge_attention': False,
                     'node_attention': False, 'softmax_attention': False},
    'edge_residual': {**MODEL_KWARGS, 'edge_residual': True},
    'no_graphnorm': {**MODEL_KWARGS, 'graphnorm': False,
                     'normalize': False, 'tanh': False},
}


@pytest.mark.parametrize('variant', sorted(VARIANTS))
def test_fused_engine_parity(variant):
    kwargs = VARIANTS[variant]
    model = build_model('egnn', **kwargs)
    batch = _pad_nodes(ORIGINAL_GRAPH)
    params = model.init(jax.random.PRNGKey(2), batch)
    assert supports_fusion(model)
    expected = np.asarray(model.apply(params, batch))
    got = np.asarray(fused_forward(model, params, batch, interpret=True))
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_fused_engine_multitask():
    model = build_model('multitask', **{
        **MODEL_KWARGS, 'edge_attention_final_only': True})
    batch = _pad_nodes(ORIGINAL_GRAPH)
    params = model.init(jax.random.PRNGKey(2), batch)
    for task in ('classification', 'multi_regression'):
        expected = np.asarray(model.apply(params, batch, task=task))
        got = np.asarray(fused_forward(model, params, batch, task=task,
                                       interpret=True))
        np.testing.assert_allclose(got, expected, atol=3e-5)
