"""Loss semantics pinned against torch's reference behaviour
(point_neural_network_base.py:362-370): BCE-with-logits, MSE, Huber
(delta 1), and the masked x3 multi-target loss."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.training.losses import loss_fn

np.random.seed(2)


def _batch(y, graph_mask):
    y = np.asarray(y, np.float32)
    b = y.shape[0]
    return GraphBatch(
        node_feats=np.zeros((8, 4), np.float32),
        coords=np.zeros((8, 3), np.float32),
        node_mask=np.ones(8, np.float32),
        graph_id=np.zeros(8, np.int32),
        senders=np.zeros(4, np.int32), receivers=np.zeros(4, np.int32),
        edge_attr=np.zeros((4, 3), np.float32),
        edge_mask=np.ones(4, np.float32),
        y=y, graph_mask=np.asarray(graph_mask, np.float32),
        strain=np.zeros((b, 2), np.float32),
        recv_perm=np.arange(4, dtype=np.int32))


def _mean(loss_sum, weight):
    return float(loss_sum) / max(float(weight), 1.0)


def test_bce_matches_torch():
    logits = np.random.randn(6).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 0], np.float32)
    batch = _batch(labels, np.ones(6))
    s, w = loss_fn(jnp.array(logits[:, None]), batch, 'classification')
    expected = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(labels)).item()
    assert _mean(s, w) == pytest.approx(expected, abs=1e-6)


def test_bce_ignores_padded_graphs():
    logits = np.random.randn(6).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 0], np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], np.float32)
    batch = _batch(labels, mask)
    s, w = loss_fn(jnp.array(logits[:, None]), batch, 'classification')
    expected = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits[:4]), torch.tensor(labels[:4])).item()
    assert _mean(s, w) == pytest.approx(expected, abs=1e-6)


@pytest.mark.parametrize('kind', ['mse', 'huber'])
def test_regression_matches_torch(kind):
    preds = (np.random.randn(5) * 2).astype(np.float32)
    targets = np.random.randn(5).astype(np.float32)
    batch = _batch(targets, np.ones(5))
    s, w = loss_fn(jnp.array(preds[:, None]), batch, 'regression',
                   regression_loss=kind)
    torch_loss = (torch.nn.MSELoss() if kind == 'mse'
                  else torch.nn.HuberLoss())
    expected = torch_loss(torch.tensor(preds),
                          torch.tensor(targets)).item()
    assert _mean(s, w) == pytest.approx(expected, abs=1e-5)


def test_multi_regression_masked_x3():
    """Reference: preds forced to -1 where target == -1, then 3 * MSE over
    all B x 3 entries — equivalent to zeroing missing terms and dividing
    by B."""
    preds = np.array([[4.0, 3.5, 2.0], [1.0, 6.0, 5.5]], np.float32)
    targets = np.array([[4.2, -1.0, -1.0], [-1.0, 5.0, 5.0]], np.float32)
    batch = _batch(targets, np.ones(2))
    s, w = loss_fn(jnp.array(preds), batch, 'multi_regression')
    # torch reference semantics
    tp = torch.tensor(preds.copy())
    tt = torch.tensor(targets)
    tp[tt == -1] = -1
    expected = 3 * torch.nn.MSELoss()(tp, tt).item()
    assert float(s) / max(float(w), 1.0) == pytest.approx(expected,
                                                          abs=1e-5)
