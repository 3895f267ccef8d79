"""Masked GraphNorm (Cai et al. 2021), matching pyg's GraphNorm numerics.

pyg GraphNorm (used by the reference inside node MLPs,
egnn_satorras.py:84): per graph g,

    out = weight * (x - alpha * mean_g) / sqrt(var_g + eps) + bias
    var_g = mean_g[(x - alpha * mean_g)^2],  eps = 1e-5

with learnable per-channel weight, bias and mean-scale alpha. Statistics
are computed over *real* nodes only (mask-weighted) — required under
static-shape padding — via dense one-hot matmuls (the graph axis is small,
so this is MXU work with a matmul transpose; no XLA scatter).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.ops.sorted_segment import dense_graph_segment_sum


def _masked_graph_mean(x, graph_id, num_graphs, node_mask):
    total = dense_graph_segment_sum(x, graph_id, num_graphs, mask=node_mask)
    counts = dense_graph_segment_sum(node_mask, graph_id, num_graphs)
    return total / jnp.maximum(counts, 1.0)[:, None]


def broadcast_per_graph(per_graph, graph_id, num_graphs):
    """per_graph[graph_id] as a one-hot matmul.

    A plain [G, K] gather by graph_id transposes to an XLA scatter of N
    rows — serialized on this TPU compiler (measured: 2 such scatters per
    GraphNorm layer dominated the backward). The [N, G] one-hot matmul
    transposes to another matmul."""
    onehot = (graph_id[:, None] ==
              jnp.arange(num_graphs, dtype=graph_id.dtype)[None, :]
              ).astype(per_graph.dtype)
    return onehot @ per_graph


class GraphNorm(nn.Module):
    """``whole_batch=False`` (default): per-graph masked statistics — the
    norm's published semantics. ``whole_batch=True``: reference-exact
    strict mode — the reference wraps pyg GraphNorm in ``nn.Sequential``
    (egnn_satorras.py:84), so it always runs with ``batch=None`` and
    normalises over the WHOLE concatenated node batch, making its
    predictions depend on batch composition. Statistics are mask-weighted
    over real nodes either way (static-shape padding must not dilute
    them)."""
    features: int
    eps: float = 1e-5
    whole_batch: bool = False
    # Mesh axis the BATCH is sharded over (data parallelism). Only
    # meaningful with whole_batch=True: the reference normalises over
    # its whole (global) batch, so under DP the masked sums/counts must
    # psum across the dp axis or statistics would cover only
    # batch_size/num_devices graphs (ADVICE r4). None = local shard.
    batch_axis: 'str | None' = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph_id: jnp.ndarray,
                 num_graphs: int, node_mask: jnp.ndarray) -> jnp.ndarray:
        import jax

        weight = self.param('weight', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean_scale = self.param('mean_scale', nn.initializers.ones,
                                (self.features,))

        def _psum(v):
            return (v if self.batch_axis is None
                    else jax.lax.psum(v, self.batch_axis))

        if self.whole_batch:
            count = jnp.maximum(_psum(jnp.sum(node_mask)), 1.0)
            mean = _psum(jnp.sum(x * node_mask[:, None], axis=0)) / count
            out = x - mean[None, :] * mean_scale
            # Variance over real rows only: padding rows of ``out`` are
            # -mean*mean_scale (non-zero), so they must be masked out.
            var = _psum(jnp.sum((out * out) * node_mask[:, None],
                                axis=0)) / count
            std = jnp.sqrt(var + self.eps)[None, :]
        else:
            mean = _masked_graph_mean(x, graph_id, num_graphs, node_mask)
            out = x - broadcast_per_graph(mean, graph_id,
                                          num_graphs) * mean_scale
            var = _masked_graph_mean(out * out, graph_id, num_graphs,
                                     node_mask)
            std = jnp.sqrt(
                broadcast_per_graph(var, graph_id, num_graphs) + self.eps)
        # Padding rows (graph_id == num_graphs) broadcast all-zero stats,
        # so x/sqrt(eps) would AMPLIFY them ~300x per layer — at 13+
        # layers they overflow to inf and poison real rows through the
        # masked (0 * inf = NaN) aggregation multiplies. Zero them: they
        # carry no information and every consumer masks them anyway.
        return jnp.where(node_mask[:, None] > 0,
                         weight * out / std + bias, 0.0)
