"""E(n)-equivariant transformer ("en_transformer", registry alias
"lie_transformer").

Fills the reference's SE(3)-transformer niche (point_vs/models/geometric/
lie_transformer.py and models/vanilla/lie_transformer.py, which wrapped the
external eqv_transformer/lie_conv libraries): attention-based equivariant
message passing. Rather than lifting to the group, this uses the
En-Transformer formulation (invariant attention logits from features +
squared distances; equivariant coordinate updates), which is exactly
expressible with this codebase's masked segment machinery and is the
TPU-friendly way to get an equivariant transformer:

    q_i, k_j, v_j : per-head projections of node features
    logit_e = (q_dst . k_src) / sqrt(d) + mlp(radial, edge_attr)
    a_e     = softmax over incoming edges of the destination node
    h_i    += W_o [ sum_e a_e v_e ]           (pre-LN residual)
    x_i    += mean_e a_e-weighted phi(m_e) (x_i - x_j)

Invariance is gated by the same 3e-5 tests as the EGNN families.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.models.layers import MLP, TorchLinear, xavier_uniform_gain
from pointvs_tpu.ops.aggregate import EdgeAggregator
from pointvs_tpu.ops.segment import masked_graph_mean_pool


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param('weight', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return weight * (x - mean) / jnp.sqrt(var + self.eps) + bias


class EnTransformerLayer(nn.Module):
    k: int
    heads: int = 4
    edges_in_d: int = 3
    update_coords: bool = True
    tanh: bool = True

    def setup(self):
        assert self.k % self.heads == 0
        self.head_dim = self.k // self.heads
        self.norm = LayerNorm(self.k)
        self.q_proj = TorchLinear(self.k, name='q_proj')
        self.k_proj = TorchLinear(self.k, name='k_proj')
        self.v_proj = TorchLinear(self.k, name='v_proj')
        self.o_proj = TorchLinear(self.k, name='o_proj')
        # Invariant edge bias per head from (radial, edge class).
        self.edge_bias = MLP(features=(self.k, self.heads),
                             acts=('silu', 'identity'), name='edge_bias')
        self.ff = MLP(features=(2 * self.k, self.k),
                      acts=('silu', 'identity'), name='ff')
        self.ff_norm = LayerNorm(self.k)
        self.coord_mlp = MLP(
            features=(self.k, self.heads),
            acts=('silu', 'tanh' if self.tanh else 'identity'),
            final_kernel_init=xavier_uniform_gain(0.001),
            final_bias=False, name='coord_mlp')

    def __call__(self, h, coord, agg: EdgeAggregator, edge_attr, edge_mask,
                 capture_aux: bool = False):
        aux: Dict[str, Any] = {}
        normed = self.norm(h)
        q = self.q_proj(normed)
        k = self.k_proj(normed)
        v = self.v_proj(normed)

        coord_s = agg.gather_src(coord)
        coord_r = agg.gather_dst(coord)
        coord_diff = coord_s - coord_r
        radial = jnp.sum(coord_diff ** 2, axis=1, keepdims=True)

        q_dst = agg.gather_src(q).reshape(-1, self.heads, self.head_dim)
        k_src = agg.gather_dst(k).reshape(-1, self.heads, self.head_dim)
        v_src = agg.gather_dst(v).reshape(-1, self.heads, self.head_dim)

        bias_in = jnp.concatenate([radial, edge_attr], axis=1)
        bias = self.edge_bias(bias_in)                    # [E, H]
        logits = (jnp.sum(q_dst * k_src, axis=-1)
                  / jnp.sqrt(float(self.head_dim)) + bias)  # [E, H]

        # Per-head softmax over each destination node's incoming edges.
        att_cols = [agg.softmax_src(logits[:, hh:hh + 1], mask=edge_mask)
                    for hh in range(self.heads)]
        att = jnp.concatenate(att_cols, axis=1)          # [E, H]
        if capture_aux:
            aux['att_val'] = jnp.mean(att, axis=1, keepdims=True)

        weighted = (att[:, :, None] * v_src).reshape(-1, self.k)
        agg_v = agg.sum_to_src(weighted, mask=edge_mask)
        h = h + self.o_proj(agg_v)
        h = h + self.ff(self.ff_norm(h))

        if self.update_coords:
            # Equivariant update: per-head scalar gates on x_i - x_j.
            edge_feat = (att[:, :, None] * v_src).reshape(-1, self.k)
            gates = self.coord_mlp(edge_feat)             # [E, H]
            gate = jnp.mean(gates, axis=1, keepdims=True)
            coord = coord + agg.mean_to_src(coord_diff * gate,
                                            mask=edge_mask)
        if capture_aux:
            aux['intermediate_coords'] = coord
        return h, coord, aux


class _TfScanBody(EnTransformerLayer):
    """EnTransformerLayer with nn.scan's (carry, *xs) signature (the carry
    is (h, coord); the rest broadcasts)."""

    def __call__(self, carry, agg, edge_attr, edge_mask, capture_aux):
        h, coord = carry
        h, coord, aux = EnTransformerLayer.__call__(
            self, h, coord, agg, edge_attr, edge_mask,
            capture_aux=capture_aux)
        return (h, coord), aux


class EnTransformer(nn.Module):
    """Equivariant transformer over padded graph batches."""
    dim_input: int
    k: int = 32
    dim_output: int = 1
    num_layers: int = 6
    heads: int = 4
    update_coords: bool = True
    tanh: bool = True
    model_task: str = 'classification'
    final_softplus: bool = False
    # Mesh axis the edge arrays are sharded over (edge-parallel
    # 'graph sharding'); aggregations psum partial node sums over it.
    edge_shard_axis: 'str | None' = None
    # nn.scan layer stacking with full unroll ([L, ...] param leaves; see
    # SartorrasEGNN.scan_layers — 14x full-step win at 12 layers on v5e).
    scan_layers: bool = False

    def setup(self):
        self.input_embed = TorchLinear(self.k, name='input_embed')
        if self.scan_layers:
            cls = nn.scan(
                _TfScanBody, variable_axes={'params': 0},
                split_rngs={'params': True, 'dropout': True},
                length=self.num_layers,
                in_axes=(nn.broadcast,) * 4,
                out_axes=0, unroll=self.num_layers)
            self.tf_scan = cls(
                k=self.k, heads=self.heads,
                update_coords=self.update_coords, tanh=self.tanh,
                name='tf_scan')
            self.tf_layers = ()
        else:
            self.tf_layers = [EnTransformerLayer(
                k=self.k, heads=self.heads,
                update_coords=self.update_coords,
                tanh=self.tanh, name=f'tf_layer_{i}')
                for i in range(self.num_layers)]
        acts = ('softplus',) if self.final_softplus else ('identity',)
        self.head = MLP(features=(self.dim_output,), acts=acts, name='head')

    def __call__(self, batch: GraphBatch, train: bool = False,
                 capture_aux: bool = False):
        h = self.input_embed(batch.node_feats)
        coord = batch.coords
        agg = EdgeAggregator(batch.senders, batch.receivers,
                             batch.recv_perm, batch.edge_mask,
                             num_nodes=h.shape[0],
                             axis_name=self.edge_shard_axis)
        aux_layers = []
        if self.scan_layers:
            (h, coord), aux_stack = self.tf_scan(
                (h, coord), agg, batch.edge_attr, batch.edge_mask,
                capture_aux)
            if capture_aux:
                aux_layers = [jax.tree.map(lambda a, i=i: a[i], aux_stack)
                              for i in range(self.num_layers)]
        else:
            for layer in self.tf_layers:
                h, coord, aux = layer(h, coord, agg, batch.edge_attr,
                                      batch.edge_mask,
                                      capture_aux=capture_aux)
                if capture_aux:
                    aux_layers.append(aux)
        pooled = masked_graph_mean_pool(
            h, batch.graph_id, batch.num_graphs, batch.node_mask)
        out = self.head(pooled, train=train)
        if capture_aux:
            return out, {'layers': aux_layers, 'node_embeddings': h,
                         'pooled': pooled}
        return out
