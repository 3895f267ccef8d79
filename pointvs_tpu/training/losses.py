"""Loss functions with padded-graph masking.

Reference semantics (point_neural_network_base.py:362-370):

- classification: mean BCE-with-logits over graphs;
- regression: mean MSE or Huber (delta=1);
- multi_regression: targets are (pKi, pKd, pIC50) with -1 marking a missing
  value; predictions are forced to -1 where the target is -1 (zeroing both
  the loss term and its gradient) and the mean is rescaled x3 so each
  example contributes its one real target at full weight.

All variants return (weighted_loss_sum, weight) so data-parallel callers can
psum both and divide globally (a mean of per-device means would be wrong
when real-graph counts differ across devices).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def bce_with_logits_sum(logits, labels, graph_mask):
    per_graph = optax.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.sum(per_graph * graph_mask), jnp.sum(graph_mask)


def regression_sum(preds, targets, graph_mask, kind: str = 'mse'):
    if kind == 'huber':
        per = optax.huber_loss(preds, targets, delta=1.0)
    else:
        per = jnp.square(preds - targets)
    return jnp.sum(per * graph_mask), jnp.sum(graph_mask)


def multi_regression_sum(preds, targets, graph_mask, kind: str = 'mse'):
    """Masked 3-target loss: missing targets (== -1) contribute zero, and
    the normaliser counts all 3 slots (then x3), matching the reference's
    `3 * mse(pred_masked, target)` exactly."""
    valid = (targets > -0.5).astype(preds.dtype)
    if kind == 'huber':
        per = optax.huber_loss(preds, targets, delta=1.0)
    else:
        per = jnp.square(preds - targets)
    per = per * valid * graph_mask[:, None]
    # Reference divides by B*3 then multiplies by 3 => divide by B.
    return jnp.sum(per), jnp.sum(graph_mask)


def loss_fn(logits, batch, model_task: str, regression_loss: str = 'mse'):
    """Dispatch on task; returns (loss_sum, weight)."""
    if model_task == 'classification':
        return bce_with_logits_sum(
            logits.reshape(-1), batch.y.reshape(-1), batch.graph_mask)
    if model_task == 'regression':
        return regression_sum(
            logits.reshape(-1), batch.y.reshape(-1), batch.graph_mask,
            kind=regression_loss)
    if model_task == 'multi_regression':
        return multi_regression_sum(
            logits.reshape(-1, 3), batch.y.reshape(-1, 3), batch.graph_mask,
            kind=regression_loss)
    raise ValueError(f'Unknown model_task {model_task!r}')
