"""Satorras-style E(n)-equivariant GNN over padded graph batches.

Numerical spec pinned to the reference (point_vs/models/geometric/
egnn_satorras.py, cited per-method below) and verified by the ported
invariance/consistency/attention test suite:

- radial feature is the *squared* distance (ref :181);
- optional coord_diff normalisation by the *detached* norm + 1e-8 (ref
  :183-185 — reproduced with stop_gradient so backward matches too);
- feature aggregation is a segment **sum** over incoming edges at the edge's
  first index ("row" == senders here, ref :145-148);
- coordinate update is a segment **mean** with count clamped >= 1 (ref
  :168-176, :340-347);
- softmax edge attention normalises per destination node (ref :139-143);
- coord-MLP output layer is bias-free with xavier-uniform gain 0.001
  (ref :88-89);
- residual variants: plain / ReZero (gate init 0) / gated (gate init 0.5,
  relu-clamped convex combination) for both nodes and edge messages
  (ref :108-121, :158-165, :194-202).

All ops run over static shapes; padding is handled by masks (see
pointvs_tpu/data/buckets.py conventions).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.models.layers import (
    MLP,
    TorchLinear,
    activation,
    xavier_uniform_gain,
)
from pointvs_tpu.ops.aggregate import EdgeAggregator
from pointvs_tpu.ops.edge_dropout import undirected_edge_dropout
from pointvs_tpu.ops.graphnorm import GraphNorm
from pointvs_tpu.ops.segment import masked_graph_mean_pool


class EGNNLayer(nn.Module):
    """One E(n)-GNN message-passing layer (ref EGNNLayer)."""
    input_nf: int
    output_nf: int
    hidden_nf: int
    edges_in_d: int = 0
    act: str = 'silu'
    residual: bool = True
    edge_residual: bool = False
    edge_attention: bool = False
    normalize: bool = False
    tanh: bool = False
    graphnorm: bool = False
    # Reference-exact strict mode: whole-batch GraphNorm statistics
    # (the reference always calls pyg GraphNorm with batch=None,
    # egnn_satorras.py:84). Default stays per-graph masked stats.
    graphnorm_whole_batch: bool = False
    # DP mesh axis for whole-batch GraphNorm statistics (psum across it
    # so strict mode normalises over the GLOBAL batch, matching the
    # reference's batch=None semantics under data parallelism).
    batch_shard_axis: Optional[str] = None
    update_coords: bool = True
    permutation_invariance: bool = False
    node_attention: bool = False
    attention_activation_fn: str = 'sigmoid'
    gated_residual: bool = False
    rezero: bool = False
    softmax_attention: bool = False
    epsilon: float = 1e-8
    # Mixed precision: feature-path MLPs compute in this dtype (params
    # stay f32); geometry (coords, radial) always stays f32.
    dtype: Optional[type] = None

    def setup(self):
        assert not (self.gated_residual and self.rezero), \
            'gated_residual and rezero are incompatible'
        self.edge_mlp = MLP(
            features=(self.hidden_nf, self.hidden_nf),
            acts=(self.act, self.act), dtype=self.dtype, name='edge_mlp')
        self.node_lin1 = TorchLinear(self.hidden_nf, dtype=self.dtype,
                                     name='node_lin1')
        if self.graphnorm:
            self.node_graphnorm = GraphNorm(
                self.hidden_nf, whole_batch=self.graphnorm_whole_batch,
                batch_axis=(self.batch_shard_axis
                            if self.graphnorm_whole_batch else None),
                name='node_graphnorm')
        self.node_lin2 = TorchLinear(self.output_nf, dtype=self.dtype,
                                     name='node_lin2')
        self.coord_mlp = MLP(
            features=(self.hidden_nf, 1),
            acts=(self.act, 'tanh' if self.tanh else 'identity'),
            final_kernel_init=xavier_uniform_gain(0.001),
            final_bias=False, dtype=self.dtype, name='coord_mlp')
        if self.edge_attention:
            self.att_mlp = TorchLinear(1, dtype=self.dtype,
                                       name='att_mlp')
        if self.node_attention:
            self.node_att_mlp = TorchLinear(1, dtype=self.dtype,
                                            name='node_att_mlp')
        if self.rezero:
            if self.edge_residual:
                self.edge_gate = self.param(
                    'edge_gate', nn.initializers.zeros, (1,))
            if self.residual:
                self.node_gate = self.param(
                    'node_gate', nn.initializers.zeros, (1,))
        elif self.gated_residual:
            if self.edge_residual:
                self.edge_gate = self.param(
                    'edge_gate', lambda k, s: 0.5 * jnp.ones(s), (1,))
            if self.residual:
                self.node_gate = self.param(
                    'node_gate', lambda k, s: 0.5 * jnp.ones(s), (1,))

    def _attention_activation(self, logits, agg: EdgeAggregator, edge_mask):
        if self.softmax_attention:
            return agg.softmax_src(logits, mask=edge_mask)
        return activation(self.attention_activation_fn)(logits)

    def __call__(self, h, coord, edge_messages, agg: EdgeAggregator,
                 edge_attr, edge_mask, node_mask, graph_id, num_graphs,
                 train: bool = False, capture_aux: bool = False,
                 has_prev=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            Dict[str, Any]]:
        # ``has_prev`` (scan_layers mode): a traced bool selecting whether
        # the edge-message residual applies — under nn.scan the first
        # iteration carries zeros instead of None, and the gated/rezero
        # variants are NOT identity on zeros.
        aux: Dict[str, Any] = {}

        # Fused gathers: h and coord ride one [N, K+3+pad] gather per
        # direction (padded so the gathers' scatter-VJPs stay on the
        # 8-lane-aligned Pallas path) — halves the per-layer gather and
        # backward-scatter launches. bf16 mode packs the bf16 features
        # two-lanes-per-f32 (bitcast) so it keeps the same fused path;
        # its aggregations upcast to f32 at the scatter boundary (better
        # accumulation AND the fast kernels, which are f32-only).
        fuse_ops = self.dtype is None and h.dtype == coord.dtype
        mixed_fuse = (not fuse_ops and h.dtype == jnp.bfloat16
                      and coord.dtype == jnp.float32)
        sym = agg.inv_recv_perm is not None
        if fuse_ops:
            k = h.shape[1]
            pad = (-(k + 3)) % 8
            hc = jnp.concatenate(
                [h, coord] + ([jnp.zeros((h.shape[0], pad), h.dtype)]
                              if pad else []), axis=1)
            if sym:
                # Collator-verified symmetric edges: both endpoints from
                # one gather, ONE backward scatter (agg.gather_pair).
                hc_s, hc_r = agg.gather_pair(hc)
            else:
                hc_s = agg.gather_src(hc)
                hc_r = agg.gather_dst(hc)
            h_s, coord_s = hc_s[:, :k], hc_s[:, k:k + 3]
            h_r, coord_r = hc_r[:, :k], hc_r[:, k:k + 3]
        elif mixed_fuse:
            if sym:
                h_s, coord_s, h_r, coord_r = agg.gather_hc_pair(h, coord)
            else:
                h_s, coord_s = agg.gather_hc_src(h, coord)
                h_r, coord_r = agg.gather_hc_dst(h, coord)
        else:
            coord_s = agg.gather_src(coord)
            coord_r = agg.gather_dst(coord)
            h_s = agg.gather_src(h)
            h_r = agg.gather_dst(h)

        # --- coord2radial (ref :178-187) ---
        coord_diff = coord_s - coord_r
        radial = jnp.sum(coord_diff ** 2, axis=1, keepdims=True)
        if self.normalize:
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + self.epsilon
            coord_diff = coord_diff / norm

        # --- edge model (ref :123-132) ---
        radial_c = radial if self.dtype is None \
            else radial.astype(self.dtype)
        if self.permutation_invariance:
            edge_in = [h_s + h_r, radial_c]
        else:
            edge_in = [h_s, h_r, radial_c]
        if edge_attr is not None and self.edges_in_d:
            edge_in.append(edge_attr if self.dtype is None
                           else edge_attr.astype(self.dtype))
        edge_feat = self.edge_mlp(jnp.concatenate(edge_in, axis=1),
                                  train=train)

        # --- edge-message residual (ref :194-202) ---
        if self.edge_residual and edge_messages is not None:
            if self.rezero:
                res = edge_messages + \
                    self.edge_gate.astype(edge_feat.dtype) * edge_feat
            elif self.gated_residual:
                gate = nn.relu(self.edge_gate).astype(edge_feat.dtype)
                res = gate * edge_feat + (1 - gate) * edge_messages
            else:
                res = edge_feat + edge_messages
            edge_feat = res if has_prev is None else \
                jnp.where(has_prev, res, edge_feat)

        # --- coord model (ref :168-176) + node aggregation, fused ---
        # The coord segment-mean (trans + counts) and the feature
        # segment-sum scatter over the SAME senders: pack them into one
        # windowed scatter (and one psum when edge-sharded).
        fuse_softmax = (self.edge_attention and self.softmax_attention
                        and (fuse_ops or mixed_fuse) and self.update_coords
                        and not capture_aux)
        if fuse_softmax:
            # Softmax weighting folded into the aggregation: the
            # normalised per-edge attention is never materialised
            # (sum softmax*m == sum(expd*m)/sum(expd)); one windowed
            # scatter instead of three.
            att_logits = self.att_mlp(edge_feat)
            trans = coord_diff * self.coord_mlp(edge_feat, train=train)
            agg_feats, coord_delta = agg.fused_softmax_aggregate(
                edge_feat.astype(coord.dtype),
                att_logits.astype(coord.dtype), trans, mask=edge_mask,
                train=train)
            agg_feats = agg_feats.astype(h.dtype)
            coord = coord + coord_delta
        elif (self.edge_attention and not self.softmax_attention
              and self.attention_activation_fn == 'sigmoid'
              and (fuse_ops or mixed_fuse) and self.update_coords
              and not capture_aux):
            # Sigmoid edge attention: fold the attention weighting into
            # the aggregation kernel too (no per-edge att*feat product
            # materialised in HBM).
            att_logits = self.att_mlp(edge_feat)
            trans = coord_diff * self.coord_mlp(edge_feat, train=train)
            agg_feats, coord_delta = agg.fused_sigmoid_aggregate(
                edge_feat.astype(coord.dtype),
                att_logits.astype(coord.dtype), trans, mask=edge_mask,
                train=train)
            agg_feats = agg_feats.astype(h.dtype)
            coord = coord + coord_delta
        else:
            if self.edge_attention:
                att_logits = self.att_mlp(edge_feat)
                att_val = self._attention_activation(att_logits, agg,
                                                     edge_mask)
                if capture_aux:
                    aux['att_val'] = att_val
                messages = att_val * edge_feat
            else:
                messages = edge_feat

            if self.update_coords:
                trans = coord_diff * self.coord_mlp(edge_feat, train=train)
                if fuse_ops or mixed_fuse:
                    agg_feats, coord_delta = agg.fused_sum_mean_to_src(
                        messages.astype(coord.dtype), trans,
                        mask=edge_mask)
                    agg_feats = agg_feats.astype(h.dtype)
                else:
                    agg_feats = agg.sum_to_src(messages, mask=edge_mask)
                    coord_delta = agg.mean_to_src(trans, mask=edge_mask)
                coord = coord + coord_delta
            else:
                agg_feats = agg.sum_to_src(messages, mask=edge_mask)
        if capture_aux:
            aux['intermediate_coords'] = coord

        # --- node model (ref :134-166) ---
        combined = jnp.concatenate([h, agg_feats], axis=1)
        out = self.node_lin1(combined)
        if self.graphnorm:
            out = self.node_graphnorm(out, graph_id, num_graphs, node_mask)
        out = activation(self.act)(out)
        out = self.node_lin2(out)
        if self.node_attention:
            node_att = activation(self.attention_activation_fn)(
                self.node_att_mlp(out))
            out = out * node_att
            if capture_aux:
                aux['node_att_val'] = node_att
        if self.residual:
            if self.rezero:
                out = h + self.node_gate.astype(out.dtype) * out
            elif self.gated_residual:
                gate = nn.relu(self.node_gate).astype(out.dtype)
                out = gate * out + (1 - gate) * h
            else:
                out = h + out

        return out, coord, edge_feat, aux


class _EGNNScanBody(EGNNLayer):
    """EGNNLayer adapted to nn.scan's (carry, *xs) calling convention.

    The carry is (h, coord, edge_messages); has_prev is the only
    per-layer scan input (it disables the edge-message residual on the
    first iteration); everything else rides along as nn.broadcast —
    including the Python statics (num_graphs, train, capture_aux), which
    broadcast passes through unsliced.
    """

    def __call__(self, carry, has_prev, agg, edge_attr, edge_mask,
                 node_mask, graph_id, num_graphs, train, capture_aux):
        h, coord, prev = carry
        h, coord, edge_feat, aux = EGNNLayer.__call__(
            self, h, coord, prev, agg, edge_attr, edge_mask, node_mask,
            graph_id, num_graphs, train, capture_aux, has_prev=has_prev)
        return (h, coord, edge_feat), aux


class SartorrasEGNN(nn.Module):
    """Full network: input embedding + N EGNN layers + pooled FC head
    (ref SartorrasEGNN.build_net, egnn_satorras.py:209-329)."""
    dim_input: int
    k: int
    dim_output: int
    num_layers: int = 4
    act: str = 'silu'
    residual: bool = True
    edge_residual: bool = False
    edge_attention: bool = False
    normalize: bool = True
    tanh: bool = True
    dropout: float = 0.0
    graphnorm: bool = True
    # --strict_graphnorm: reference-exact whole-batch statistics (see
    # EGNNLayer.graphnorm_whole_batch). Makes predictions depend on
    # batch composition, exactly as the reference's do.
    graphnorm_whole_batch: bool = False
    # DP mesh axis for strict (whole-batch) GraphNorm stats — set by the
    # Trainer when num_devices > 1 so --strict_graphnorm stays
    # reference-exact over the global batch (init clones it to None).
    batch_shard_axis: Optional[str] = None
    multi_fc: bool = False
    update_coords: bool = True
    permutation_invariance: bool = False
    attention_activation_fn: str = 'sigmoid'
    node_attention: bool = False
    gated_residual: bool = False
    rezero: bool = False
    model_task: str = 'classification'
    include_strain_info: bool = False
    final_softplus: bool = False
    softmax_attention: bool = False
    # Graph-sharded (edge-parallel) mode: name of the mesh axis the edge
    # list is sharded over; aggregations psum partial node sums across it.
    edge_shard_axis: Optional[str] = None
    # Rematerialise each layer in backward (jax.checkpoint): trades ~1
    # extra forward for O(depth) activation memory — needed for
    # author-scale 48-layer configs on dense pockets.
    remat: bool = False
    # Mixed precision: run feature-path MLPs/attention in bfloat16
    # (params and geometry stay f32, head and loss stay f32). Doubles
    # MXU throughput at the cost of ~1e-2 relative activation error —
    # the 3e-5 invariance gates apply to f32 mode only.
    bf16: bool = False
    # Stack the (identical) layers' params along a leading [L, ...] axis
    # and run them with nn.scan: L-times fewer param leaves (so L-times
    # fewer tiny optimiser kernels — per-leaf launch overhead measured at
    # ~7 us/leaf on v5e) and one traced layer instead of L at compile
    # time. Param tree differs from the unrolled layout, so checkpoints
    # are not interchangeable between modes.
    scan_layers: bool = False

    def _make_layers(self):
        layer_cls = EGNNLayer
        if self.remat:
            # __call__ args with self at 0: num_graphs=9, train=10,
            # capture_aux=11 are static; the EdgeAggregator (4) is a
            # registered pytree and passes through as data.
            layer_cls = nn.remat(EGNNLayer, static_argnums=(9, 10, 11))
        return [layer_cls(**self._layer_kwargs(),
                          name=f'egnn_layer_{i}')
                for i in range(self.num_layers)]

    def _layer_kwargs(self):
        return dict(
            input_nf=self.k, output_nf=self.k, hidden_nf=self.k,
            dtype=jnp.bfloat16 if self.bf16 else None,
            edges_in_d=3, act=self.act, residual=self.residual,
            edge_attention=self.edge_attention, normalize=self.normalize,
            graphnorm=self.graphnorm,
            graphnorm_whole_batch=self.graphnorm_whole_batch,
            batch_shard_axis=self.batch_shard_axis,
            tanh=self.tanh,
            update_coords=self.update_coords,
            permutation_invariance=self.permutation_invariance,
            attention_activation_fn=self.attention_activation_fn,
            node_attention=self.node_attention,
            edge_residual=self.edge_residual,
            gated_residual=self.gated_residual, rezero=self.rezero,
            softmax_attention=self.softmax_attention)

    def _make_scanned(self):
        body = _EGNNScanBody
        if self.remat:
            # (self=0, carry=1, has_prev=2, agg..graph_id=3..7,
            #  num_graphs=8, train=9, capture_aux=10 are static)
            body = nn.remat(body, static_argnums=(8, 9, 10))
        cls = nn.scan(
            body, variable_axes={'params': 0},
            split_rngs={'params': True, 'dropout': True},
            length=self.num_layers,
            in_axes=(0,) + (nn.broadcast,) * 8,
            out_axes=0,
            # Full unroll: params stay stacked [L, ...] (the optimiser
            # win) but XLA sees straight-line compute — a rolled
            # lax.scan measured 65x slower per step on v5e (per-
            # iteration launch overhead on the windowed-scatter ops).
            unroll=self.num_layers)
        return cls(**self._layer_kwargs(), name='egnn_scan')

    def _setup_layers(self):
        if self.scan_layers:
            self.egnn_scan = self._make_scanned()
            self.egnn_layers = ()
        else:
            self.egnn_layers = self._make_layers()

    def setup(self):
        self.input_embed = TorchLinear(
            self.k, dtype=jnp.bfloat16 if self.bf16 else None,
            name='input_embed')
        self._setup_layers()
        head_in = self.k + (1 if self.include_strain_info else 0)
        if self.multi_fc:
            dims, acts = ((32, 16, self.dim_output),
                          (self.act, self.act, 'identity'))
        else:
            dims, acts = (self.dim_output,), ('identity',)
        if self.final_softplus:
            acts = acts[:-1] + ('softplus',)
        del head_in  # head input dim inferred by flax
        self.head = MLP(features=dims, acts=acts, name='head')

    def embed(self, batch: GraphBatch, train: bool = False,
              capture_aux: bool = False):
        """Input linear + message-passing stack -> node embeddings.

        Equivalent of the reference's get_embeddings (ref :319-329),
        including optional undirected edge dropout.
        """
        h = self.input_embed(batch.node_feats)
        coord = batch.coords
        if h.dtype == jnp.float64:
            # --double mode: params are f64, so h promotes at the embed;
            # coords must follow or the layer-scan carry would flip dtype
            # mid-scan. (bf16 mode deliberately keeps coords f32.)
            coord = coord.astype(jnp.float64)
        edge_attr = batch.edge_attr
        edge_mask = batch.edge_mask
        if self.dropout > 0 and train:
            seed = jax.random.randint(
                self.make_rng('dropout'), (), 0, jnp.iinfo(jnp.int32).max)
            edge_mask = undirected_edge_dropout(
                batch.senders, batch.receivers, edge_mask, self.dropout,
                seed.astype(jnp.uint32))
        agg = EdgeAggregator(batch.senders, batch.receivers,
                             batch.recv_perm, edge_mask,
                             num_nodes=batch.node_feats.shape[0],
                             axis_name=self.edge_shard_axis,
                             inv_recv_perm=getattr(
                                 batch, 'inv_recv_perm', None))
        if self.scan_layers:
            prev0 = jnp.zeros((batch.senders.shape[0], self.k), h.dtype)
            has_prev = jnp.arange(self.num_layers) > 0
            (h, coord, edge_messages), aux_stack = self.egnn_scan(
                (h, coord, prev0), has_prev, agg, edge_attr, edge_mask,
                batch.node_mask, batch.graph_id, batch.num_graphs, train,
                capture_aux)
            aux_layers = ([jax.tree.map(lambda a, i=i: a[i], aux_stack)
                           for i in range(self.num_layers)]
                          if capture_aux else [])
            return h, edge_messages, aux_layers
        edge_messages = None
        aux_layers = []
        for layer in self.egnn_layers:
            h, coord, edge_messages, aux = layer(
                h, coord, edge_messages, agg,
                edge_attr, edge_mask, batch.node_mask, batch.graph_id,
                batch.num_graphs, train, capture_aux)
            if capture_aux:
                aux_layers.append(aux)
        return h, edge_messages, aux_layers

    def pool(self, h: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
        pooled = masked_graph_mean_pool(
            h.astype(jnp.float32), batch.graph_id, batch.num_graphs,
            batch.node_mask)
        if self.include_strain_info:
            # dE appended to pooled features (the reference sized its head
            # for this, egnn_satorras.py:302-303, but never wired the value
            # through forward; here it is functional).
            pooled = jnp.concatenate([pooled, batch.strain[:, :1]], axis=1)
        return pooled

    def __call__(self, batch: GraphBatch, train: bool = False,
                 capture_aux: bool = False):
        h, _, aux_layers = self.embed(batch, train=train,
                                      capture_aux=capture_aux)
        pooled = self.pool(h, batch)
        out = self.head(pooled, train=train)
        if capture_aux:
            return out, {'layers': aux_layers, 'node_embeddings': h,
                         'pooled': pooled}
        return out
