"""Masked segment operations over padded node/edge lists.

TPU-native replacement for torch_scatter's scatter_add / scatter_softmax and
pyg's global_mean_pool (ref egnn_satorras.py:332-347, :139-143;
pnn_geometric_base.py:33). All ops take explicit masks and are safe for the
padding conventions of pointvs_tpu.data.buckets:

- padding edges have out-of-range indices (== num_nodes); we clamp indices
  and rely on the mask (never on XLA out-of-bounds drop semantics);
- padding nodes have graph_id == num_graphs; same treatment.

Everything lowers to ``jax.lax.scatter-add`` / gathers, which XLA fuses with
the surrounding elementwise work. A Pallas fused edge-MLP+aggregate kernel
(ops/pallas) can replace the gather/scatter pair on the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _clamp(segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jnp.minimum(segment_ids, num_segments - 1)


def gather_nodes(node_values: jnp.ndarray, indices: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """node_values[indices] with out-of-range indices clamped and masked."""
    num_nodes = node_values.shape[0]
    gathered = node_values[_clamp(indices, num_nodes)]
    if mask is not None:
        gathered = gathered * mask[..., None]
    return gathered


def masked_segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum `data` rows into `num_segments` buckets; masked rows contribute 0.

    Matches reference `unsorted_segment_sum` (egnn_satorras.py:332-337) on
    real rows.
    """
    if mask is not None:
        data = data * mask[..., None] if data.ndim > 1 else data * mask
    return jax.ops.segment_sum(
        data, _clamp(segment_ids, num_segments), num_segments=num_segments)


def masked_segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                        num_segments: int,
                        mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean with per-segment count clamped to >= 1.

    Matches reference `unsorted_segment_mean` (egnn_satorras.py:340-347):
    empty segments yield 0 (0 / clamp(count, 1)).
    """
    ids = _clamp(segment_ids, num_segments)
    if mask is None:
        counts = jax.ops.segment_sum(
            jnp.ones(data.shape[:1], data.dtype), ids,
            num_segments=num_segments)
    else:
        counts = jax.ops.segment_sum(
            mask.astype(data.dtype), ids, num_segments=num_segments)
        data = data * mask[..., None] if data.ndim > 1 else data * mask
    total = jax.ops.segment_sum(data, ids, num_segments=num_segments)
    denom = jnp.maximum(counts, 1.0)
    return total / (denom[..., None] if data.ndim > 1 else denom)


def masked_segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                           num_segments: int,
                           mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Numerically stable softmax over rows sharing a segment id.

    Per destination node, the attention weights of its incoming (real) edges
    sum to 1 — the reference property pinned by test_attention.py. Masked
    rows get weight 0. `logits` may be [E] or [E, 1].
    """
    squeeze = logits.ndim == 2 and logits.shape[-1] == 1
    flat = logits[:, 0] if squeeze else logits
    ids = _clamp(segment_ids, num_segments)
    if mask is not None:
        flat = jnp.where(mask > 0, flat, _NEG_INF)
    seg_max = jax.ops.segment_max(flat, ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = flat - seg_max[ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = expd * mask
    denom = jax.ops.segment_sum(expd, ids, num_segments=num_segments)
    out = expd / jnp.maximum(denom[ids], 1e-16)
    return out[:, None] if squeeze else out


def masked_graph_mean_pool(node_values: jnp.ndarray, graph_id: jnp.ndarray,
                           num_graphs: int,
                           node_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-graph mean over real nodes (pyg global_mean_pool equivalent).

    Dense one-hot matmul: the graph axis is a batch size, so [N, B]^T @
    [N, K] runs on the MXU and its transpose under grad is another matmul
    (no XLA scatter on the training hot path).
    """
    from pointvs_tpu.ops.sorted_segment import dense_graph_segment_sum
    total = dense_graph_segment_sum(node_values, graph_id, num_graphs,
                                    mask=node_mask)
    counts = dense_graph_segment_sum(node_mask, graph_id, num_graphs)
    return total / jnp.maximum(counts, 1.0)[:, None]
