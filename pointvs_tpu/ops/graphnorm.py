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


class GraphNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph_id: jnp.ndarray,
                 num_graphs: int, node_mask: jnp.ndarray) -> jnp.ndarray:
        weight = self.param('weight', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean_scale = self.param('mean_scale', nn.initializers.ones,
                                (self.features,))

        ids = jnp.minimum(graph_id, num_graphs - 1)
        mean = _masked_graph_mean(x, graph_id, num_graphs, node_mask)
        out = x - mean[ids] * mean_scale
        var = _masked_graph_mean(out * out, graph_id, num_graphs, node_mask)
        std = jnp.sqrt(var[ids] + self.eps)
        return weight * out / std + bias
