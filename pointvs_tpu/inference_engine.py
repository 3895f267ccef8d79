"""Fused inference engine: run a trained SartorrasEGNN checkpoint through
the Pallas fused edge kernel.

Reads the flax param pytree directly (no module re-entry) and executes the
network as plain JAX + ops/pallas/fused_egnn per layer: the edge MLP,
attention, coordinate weights and feature aggregation never round-trip
their [E, *] intermediates through HBM. Numerics match model.apply at
HIGHEST precision (parity test in tests/test_fused_engine.py).

Used for screening/eval throughput (forward only). Training keeps the
autodiff-friendly unfused path. Unsupported configurations
(permutation_invariance, lucid models) raise so callers can fall back.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.models.egnn import SartorrasEGNN
from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
from pointvs_tpu.ops.pallas.fused_egnn import fused_edge_forward
from pointvs_tpu.ops.sorted_segment import WINDOW, derive_max_eb
from pointvs_tpu.ops.aggregate import EdgeAggregator

_HI = jax.lax.Precision.HIGHEST


def _dense_w(p):
    """flax Dense params -> (W [out, in], b [out, 1] or None)."""
    kernel = p['kernel'].T
    bias = p.get('bias')
    return kernel, (bias[:, None] if bias is not None else None)


def _mlp_layers(p):
    out = []
    i = 0
    while f'TorchLinear_{i}' in p:
        out.append(_dense_w(p[f'TorchLinear_{i}']['Dense_0']))
        i += 1
    return out


def supports_fusion(model) -> bool:
    return (isinstance(model, (SartorrasEGNN, MultitaskSatorrasEGNN))
            and not model.permutation_invariance
            and model.dropout == 0
            # The fused kernel is f32; bf16 models fall back to the
            # module forward so train/eval numerics agree.
            and not model.bf16
            and not (model.edge_residual
                     and (model.rezero or model.gated_residual)))


def _layer_attention(model, i: int) -> str:
    """Per-layer attention mode (multitask first/final-only switches)."""
    enabled = model.edge_attention
    if isinstance(model, MultitaskSatorrasEGNN):
        from pointvs_tpu.models.multitask import _apply_switch
        enabled = _apply_switch(
            model.edge_attention, model.edge_attention_first_only,
            model.edge_attention_final_only, i, model.num_layers)
    if not enabled:
        return 'none'
    return ('softmax' if model.softmax_attention
            else model.attention_activation_fn)


def _layer_node_attention(model, i: int) -> bool:
    if not isinstance(model, MultitaskSatorrasEGNN):
        return model.node_attention
    from pointvs_tpu.models.multitask import _apply_switch
    return _apply_switch(
        model.node_attention, model.node_attention_first_only,
        model.node_attention_final_only, i, model.num_layers)


def fused_forward(model, params, batch: GraphBatch,
                  task: Optional[str] = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Forward pass equivalent to model.apply(params, batch) using the
    fused kernel for every EGNN layer."""
    apply_kwargs = ({'task': task}
                    if isinstance(model, MultitaskSatorrasEGNN) and task
                    else {})
    n_pad = batch.node_feats.shape[0]
    e_real = batch.senders.shape[0]
    max_eb_probe = derive_max_eb(e_real, n_pad) + 128
    k_probe = getattr(model, 'k', 32)
    # Fused-kernel VMEM footprint per window: the [2W, max_eb] one-hot and
    # iota temporaries (~2KB/edge at W=128) dominate, plus ~3 K-row
    # scratches and the [2K+4, max_eb] edge-MLP input. The kernel requests
    # a 100M scoped-vmem limit; gate conservatively at 80M.
    vmem_ok = max_eb_probe * (5 * 1024 + 16 * k_probe) < 80 * 1024 * 1024
    if (not supports_fusion(model) or n_pad % WINDOW
            or n_pad < 2 * WINDOW or not vmem_ok):
        # Static-shape/config fallback: plain module forward.
        return model.apply(params, batch, **apply_kwargs)
    p = params['params']
    max_eb = max_eb_probe
    e_pad = e_real + max_eb
    num_graphs = batch.num_graphs

    # Input embedding.
    w, b = _dense_w(p['input_embed']['Dense_0'])
    h = jnp.matmul(batch.node_feats, w.T, precision=_HI) + b[:, 0]
    coord = batch.coords
    edge_mask = batch.edge_mask

    senders_c = jnp.minimum(batch.senders, n_pad - 1)
    receivers_c = jnp.minimum(batch.receivers, n_pad - 1)
    valid_e = (batch.senders < n_pad).astype(jnp.float32)

    pad_cols = jnp.zeros((max_eb,), jnp.float32)

    def to_fm(x_e):  # [E(,K)] -> feature-major padded [K, e_pad]
        if x_e.ndim == 1:
            x_e = x_e[:, None]
        return jnp.concatenate(
            [x_e, jnp.zeros((max_eb, x_e.shape[1]), x_e.dtype)]).T

    senders_row = jnp.concatenate(
        [batch.senders.astype(jnp.float32),
         jnp.full((max_eb,), n_pad, jnp.float32)])

    agg_helper = EdgeAggregator(batch.senders, batch.receivers,
                                batch.recv_perm, edge_mask,
                                num_nodes=n_pad)

    edge_messages_t = None
    for i in range(model.num_layers):
        attention = _layer_attention(model, i)
        # scan_layers stacks each leaf [L, ...]; slice layer i out.
        lp = (jax.tree.map(lambda x, i=i: x[i], p['egnn_scan'])
              if model.scan_layers else p[f'egnn_layer_{i}'])
        # coord2radial
        coord_s = coord[senders_c] * valid_e[:, None]
        coord_r = coord[receivers_c] * valid_e[:, None]
        coord_diff = coord_s - coord_r
        radial = jnp.sum(coord_diff ** 2, axis=1)
        if model.normalize:
            norm = jnp.sqrt(radial) + 1e-8
            coord_diff = coord_diff / norm[:, None]

        em = _mlp_layers(lp['edge_mlp'])
        cm = _mlp_layers(lp['coord_mlp'])
        kparams = {
            'w1': em[0][0], 'b1': em[0][1],
            'w2': em[1][0], 'b2': em[1][1],
            'cw1': cm[0][0], 'cb1': cm[0][1],
            'cw2': cm[1][0],
        }
        if attention != 'none':
            aw, ab = _dense_w(lp['att_mlp']['Dense_0'])
            kparams['attw'], kparams['attb'] = aw, ab
        else:
            k = h.shape[1]
            kparams['attw'] = jnp.zeros((1, k), jnp.float32)
            kparams['attb'] = jnp.zeros((1, 1), jnp.float32)

        extras_rows = jnp.stack([
            jnp.concatenate([radial, pad_cols]),
            jnp.concatenate([batch.edge_attr[:, 0], pad_cols]),
            jnp.concatenate([batch.edge_attr[:, 1], pad_cols]),
            jnp.concatenate([batch.edge_attr[:, 2], pad_cols]),
            jnp.concatenate([edge_mask, pad_cols]),
            senders_row,
            jnp.zeros((e_pad,), jnp.float32),
            jnp.zeros((e_pad,), jnp.float32),
        ])
        h_dst_t = to_fm(h[receivers_c] * valid_e[:, None])

        agg, phi_t, att_t, msg_t = fused_edge_forward(
            h, h_dst_t, extras_rows, edge_messages_t, kparams,
            num_nodes=n_pad, window=WINDOW, max_eb=max_eb,
            attention=attention, tanh=model.tanh,
            emit_messages=model.edge_residual, interpret=interpret)
        if model.edge_residual:
            edge_messages_t = msg_t

        # coordinate update (mean over incident edges). phi positions never
        # blended by any window (pure padding) hold garbage from the
        # uninitialised output buffer — mask before use (0 * NaN = NaN).
        if model.update_coords:
            phi = jnp.where(edge_mask > 0, phi_t[0, :e_real], 0.0)
            trans = coord_diff * phi[:, None]
            coord = coord + agg_helper.mean_to_src(trans, mask=edge_mask)

        # node update
        combined = jnp.concatenate([h, agg], axis=1)
        w1, b1 = _dense_w(lp['node_lin1']['Dense_0'])
        out = jnp.matmul(combined, w1.T, precision=_HI) + b1[:, 0]
        if model.graphnorm:
            gn = lp['node_graphnorm']
            from pointvs_tpu.ops.graphnorm import _masked_graph_mean
            ids = jnp.minimum(batch.graph_id, num_graphs - 1)
            mean = _masked_graph_mean(out, batch.graph_id, num_graphs,
                                      batch.node_mask)
            centred = out - mean[ids] * gn['mean_scale']
            var = _masked_graph_mean(centred * centred, batch.graph_id,
                                     num_graphs, batch.node_mask)
            out = gn['weight'] * centred / jnp.sqrt(
                var[ids] + 1e-5) + gn['bias']
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

    # pool + head
    from pointvs_tpu.ops.segment import masked_graph_mean_pool
    pooled = masked_graph_mean_pool(h, batch.graph_id, num_graphs,
                                    batch.node_mask)
    if model.include_strain_info:
        pooled = jnp.concatenate([pooled, batch.strain[:, :1]], axis=1)

    if isinstance(model, MultitaskSatorrasEGNN):
        head_name = ('head_pose' if 'classification' in
                     (task or 'classification') else 'head_affinity')
        head_p = p[head_name]
        layers = _mlp_layers(head_p)
        out = pooled
        for li, (w_h, b_h) in enumerate(layers):
            out = jnp.matmul(out, w_h.T, precision=_HI) + b_h[:, 0]
        if head_name == 'head_affinity':
            out = (jax.nn.softplus(out) if model.final_softplus
                   else jax.nn.relu(out))
        return out

    layers = _mlp_layers(p['head'])
    out = pooled
    for li, (w_h, b_h) in enumerate(layers):
        out = jnp.matmul(out, w_h.T, precision=_HI) + b_h[:, 0]
        if li < len(layers) - 1:
            out = jax.nn.silu(out)
    if model.final_softplus:
        out = jax.nn.softplus(out)
    return out
