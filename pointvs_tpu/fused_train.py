"""Differentiable fused forward for TRAINING: the Pallas fused edge kernel
(with its flash-style fused backward, ops/pallas/fused_egnn_bwd.py) plus
plain-JAX node updates whose VJPs are all scatter-free.

Mirrors inference_engine.fused_forward (same param-tree walk, same layer
math — parity pinned by tests/test_fused_train.py) with the differences
training requires:

- coord/feature gathers go through EdgeAggregator (custom VJPs transpose
  to windowed one-hot matmuls — a raw ``coord[senders]`` gather would
  transpose to the pathological XLA scatter);
- the detached-norm semantics of coord2radial use stop_gradient (ref
  egnn_satorras.py:183-185), matching the module's training dynamics;
- GraphNorm statistics broadcast back per graph via one-hot matmuls
  (ops/graphnorm.broadcast_per_graph), not a gather.

Gradient path: loss -> head/pool/node MLPs (XLA) -> fused_edge_pass
custom_vjp (windowed recompute kernel) -> coord/feature inputs.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.inference_engine import (
    _dense_w,
    _layer_attention,
    _layer_node_attention,
    _mlp_layers,
    supports_fusion,
)
from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
from pointvs_tpu.ops.aggregate import EdgeAggregator
from pointvs_tpu.ops.graphnorm import _masked_graph_mean, broadcast_per_graph
from pointvs_tpu.ops.pallas.fused_egnn import fused_edge_pass
from pointvs_tpu.ops.segment import masked_graph_mean_pool
from pointvs_tpu.ops.sorted_segment import WINDOW, derive_max_eb

_HI = jax.lax.Precision.HIGHEST


def supports_fused_training(model, batch: GraphBatch) -> bool:
    n_pad = batch.node_feats.shape[0]
    e_real = batch.senders.shape[0]
    max_eb = derive_max_eb(e_real, n_pad) + 128
    k = getattr(model, 'k', 32)
    # Backward recomputes + cotangent temps: ~2x the forward kernel's
    # VMEM per edge; gate to half the forward budget.
    vmem_ok = max_eb * (5 * 1024 + 16 * k) < 40 * 1024 * 1024
    return (supports_fusion(model) and not (n_pad % WINDOW)
            and n_pad >= 2 * WINDOW and vmem_ok)


def fused_apply(model, params, batch: GraphBatch,
                task: Optional[str] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Training-path forward equivalent to model.apply(params, batch,
    train=True) for fused-supported configs (dropout==0, f32)."""
    p = params['params']
    n_pad = batch.node_feats.shape[0]
    e_real = batch.senders.shape[0]
    max_eb = derive_max_eb(e_real, n_pad) + 128
    e_pad = e_real + max_eb
    num_graphs = batch.num_graphs
    k = model.k

    w, b = _dense_w(p['input_embed']['Dense_0'])
    h = jnp.matmul(batch.node_feats, w.T, precision=_HI) + b[:, 0]
    coord = batch.coords
    edge_mask = batch.edge_mask

    agg = EdgeAggregator(batch.senders, batch.receivers, batch.recv_perm,
                         edge_mask, num_nodes=n_pad)

    pad_cols = jnp.zeros((max_eb,), jnp.float32)
    senders_row = jnp.concatenate(
        [batch.senders.astype(jnp.float32),
         jnp.full((max_eb,), n_pad, jnp.float32)])
    attr_rows = [jnp.concatenate([batch.edge_attr[:, a], pad_cols])
                 for a in range(3)]
    mask_row = jnp.concatenate([edge_mask, pad_cols])
    zrow = jnp.zeros((e_pad,), jnp.float32)

    def to_fm(x_e):  # [E, K] -> feature-major padded [K, e_pad]
        return jnp.concatenate(
            [x_e, jnp.zeros((max_eb, x_e.shape[1]), x_e.dtype)]).T

    prev_t = jnp.zeros((k, e_pad), jnp.float32)
    ids = jnp.minimum(batch.graph_id, num_graphs - 1)

    for i in range(model.num_layers):
        attention = _layer_attention(model, i)
        lp = (jax.tree.map(lambda x, i=i: x[i], p['egnn_scan'])
              if model.scan_layers else p[f'egnn_layer_{i}'])

        # h_dst and coord_dst ride one padded gather (its scatter-VJP
        # stays on the 8-lane Pallas path), as the module forward does.
        pad = (-(k + 3)) % 8
        hc = jnp.concatenate(
            [h, coord] + ([jnp.zeros((n_pad, pad), h.dtype)]
                          if pad else []), axis=1)
        hc_r = agg.gather_dst(hc)
        coord_s = agg.gather_src(coord)
        coord_r = hc_r[:, k:k + 3]
        h_dst = hc_r[:, :k]
        coord_diff = coord_s - coord_r
        radial = jnp.sum(coord_diff ** 2, axis=1)
        if model.normalize:
            # detached norm (ref :183-185): forward divides, backward
            # treats the norm as a constant.
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + 1e-8
            coord_diff = coord_diff / norm[:, None]

        em = _mlp_layers(lp['edge_mlp'])
        cm = _mlp_layers(lp['coord_mlp'])
        kparams = {'w1': em[0][0], 'b1': em[0][1],
                   'w2': em[1][0], 'b2': em[1][1],
                   'cw1': cm[0][0], 'cb1': cm[0][1], 'cw2': cm[1][0]}
        if attention != 'none':
            aw, ab = _dense_w(lp['att_mlp']['Dense_0'])
            kparams['attw'], kparams['attb'] = aw, ab
        else:
            kparams['attw'] = jnp.zeros((1, k), jnp.float32)
            kparams['attb'] = jnp.zeros((1, 1), jnp.float32)

        extras_rows = jnp.stack([
            jnp.concatenate([radial, pad_cols]),
            attr_rows[0], attr_rows[1], attr_rows[2],
            mask_row, senders_row, zrow, zrow])
        h_dst_t = to_fm(h_dst)

        agg_feats, phi_t, _att_t, msg_t = fused_edge_pass(
            h, h_dst_t, extras_rows, prev_t, kparams,
            n_pad, WINDOW, max_eb, attention, model.tanh,
            model.edge_residual, interpret)
        if model.edge_residual:
            prev_t = msg_t

        if model.update_coords:
            phi = jnp.where(edge_mask > 0, phi_t[0, :e_real], 0.0)
            trans = coord_diff * phi[:, None]
            coord = coord + agg.mean_to_src(trans, mask=edge_mask)

        combined = jnp.concatenate([h, agg_feats], axis=1)
        w1, b1 = _dense_w(lp['node_lin1']['Dense_0'])
        out = jnp.matmul(combined, w1.T, precision=_HI) + b1[:, 0]
        if model.graphnorm:
            gn = lp['node_graphnorm']
            mean = _masked_graph_mean(out, batch.graph_id, num_graphs,
                                      batch.node_mask)
            centred = out - broadcast_per_graph(
                mean, batch.graph_id, num_graphs) * gn['mean_scale']
            var = _masked_graph_mean(centred * centred, batch.graph_id,
                                     num_graphs, batch.node_mask)
            std = jnp.sqrt(broadcast_per_graph(
                var, batch.graph_id, num_graphs) + 1e-5)
            out = gn['weight'] * centred / std + gn['bias']
            # Padding rows would be amplified by 1/sqrt(eps) per layer
            # (see ops/graphnorm.py) — zero them.
            out = jnp.where(batch.node_mask[:, None] > 0, out, 0.0)
        out = jax.nn.silu(out)
        w2, b2 = _dense_w(lp['node_lin2']['Dense_0'])
        out = jnp.matmul(out, w2.T, precision=_HI) + b2[:, 0]
        if _layer_node_attention(model, i):
            naw, nab = _dense_w(lp['node_att_mlp']['Dense_0'])
            logits = jnp.matmul(out, naw.T, precision=_HI) + nab[:, 0]
            acts = {'sigmoid': jax.nn.sigmoid, 'tanh': jnp.tanh,
                    'relu': jax.nn.relu, 'silu': jax.nn.silu}
            out = out * acts[model.attention_activation_fn](logits)
        if model.residual:
            if model.rezero:
                out = h + lp['node_gate'] * out
            elif model.gated_residual:
                gate = jax.nn.relu(lp['node_gate'])
                out = gate * out + (1 - gate) * h
            else:
                out = h + out
        h = out

    pooled = masked_graph_mean_pool(h, batch.graph_id, num_graphs,
                                    batch.node_mask)
    if model.include_strain_info:
        pooled = jnp.concatenate([pooled, batch.strain[:, :1]], axis=1)

    if isinstance(model, MultitaskSatorrasEGNN):
        head_name = ('head_pose' if 'classification' in
                     (task or 'classification') else 'head_affinity')
        layers = _mlp_layers(p[head_name])
    else:
        layers = _mlp_layers(p['head'])
    out = pooled
    n_layers = len(layers)
    for li, (w_h, b_h) in enumerate(layers):
        out = jnp.matmul(out, w_h.T, precision=_HI) + b_h[:, 0]
        if li < n_layers - 1:
            out = jax.nn.silu(out)
    if getattr(model, 'final_softplus', False):
        out = jax.nn.softplus(out)
    return out
