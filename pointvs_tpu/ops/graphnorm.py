"""Masked GraphNorm (Cai et al. 2021), matching pyg's GraphNorm numerics.

pyg GraphNorm (used by the reference inside node MLPs,
egnn_satorras.py:84): per graph g,

    out = weight * (x - alpha * mean_g) / sqrt(var_g + eps) + bias
    var_g = mean_g[(x - alpha * mean_g)^2],  eps = 1e-5

with learnable per-channel weight, bias and mean-scale alpha. This version
computes the statistics over *real* nodes only (mask-weighted), which is
required for correctness under static-shape padding.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.ops.segment import masked_segment_mean


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

        mean = masked_segment_mean(x, graph_id, num_graphs, mask=node_mask)
        out = x - mean[jnp.minimum(graph_id, num_graphs - 1)] * mean_scale
        var = masked_segment_mean(out * out, graph_id, num_graphs,
                                  mask=node_mask)
        std = jnp.sqrt(var[jnp.minimum(graph_id, num_graphs - 1)] + self.eps)
        return weight * out / std + bias
