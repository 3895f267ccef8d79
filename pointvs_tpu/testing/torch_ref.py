"""Torch reimplementation of the reference EGNN math (host-only).

Faithful to /root/reference/point_vs/models/geometric/egnn_satorras.py
(line-cited below) with dynamic shapes and index_add scatter aggregation —
i.e. how jscant/PointVS actually executes. Two jobs, neither on the device
path:

1. CPU throughput baseline for ``bench.py`` (the reference publishes no
   numbers, so the denominator is measured with identical math);
2. cross-framework forward-parity testing: ``load_flax_params`` copies a
   flax ``SartorrasEGNN`` parameter tree into this net so tests can assert
   the two frameworks produce the same outputs from the same weights.

Reference GraphNorm caveat: the reference wraps pyg ``GraphNorm`` inside an
``nn.Sequential`` (egnn_satorras.py:84), so it is always called without a
batch vector — statistics are computed over the WHOLE concatenated node
batch, making reference predictions depend on batch composition. The
rebuild deliberately uses per-graph masked statistics instead
(pointvs_tpu/ops/graphnorm.py); the two agree exactly on single-graph
batches, which is what the parity test pins.
"""
from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn


def _segment_sum(values: torch.Tensor, index: torch.Tensor,
                 num_segments: int) -> torch.Tensor:
    out = torch.zeros(num_segments, values.shape[1], dtype=values.dtype)
    return out.index_add_(0, index, values)


def _segment_mean(values, index, num_segments):
    """unsorted_segment_mean with count clamp >= 1 (ref :340-347)."""
    total = _segment_sum(values, index, num_segments)
    count = _segment_sum(torch.ones(len(index), 1), index, num_segments)
    return total / count.clamp(min=1)


def _scatter_softmax(logits: torch.Tensor, index: torch.Tensor,
                     num_segments: int) -> torch.Tensor:
    """torch_scatter.composite.scatter_softmax (per-destination, ref
    :139-143) without the torch_scatter dependency."""
    seg_max = torch.full((num_segments, 1), -torch.inf).index_reduce_(
        0, index, logits, 'amax', include_self=False)
    shifted = torch.exp(logits - seg_max[index])
    denom = _segment_sum(shifted, index, num_segments)
    return shifted / denom[index]


class RefGraphNorm(nn.Module):
    """pyg GraphNorm as the reference runs it: batch=None -> whole-batch
    statistics (egnn_satorras.py:84 wraps it in nn.Sequential)."""

    def __init__(self, k: int, eps: float = 1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(k))
        self.bias = nn.Parameter(torch.zeros(k))
        self.mean_scale = nn.Parameter(torch.ones(k))
        self.eps = eps

    def forward(self, x):
        out = x - x.mean(0) * self.mean_scale
        var = (out * out).mean(0)
        return self.weight * out / torch.sqrt(var + self.eps) + self.bias


class RefEGNNLayer(nn.Module):
    """One reference EGNN layer (egnn_satorras.py:23-206)."""

    def __init__(self, k: int, edges_in_d: int = 3,
                 residual: bool = True, edge_attention: bool = False,
                 softmax_attention: bool = False, normalize: bool = True,
                 tanh: bool = True, graphnorm: bool = True,
                 node_attention: bool = False,
                 attention_activation_fn: str = 'sigmoid'):
        super().__init__()
        self.residual = residual
        self.edge_attention = edge_attention
        self.softmax_attention = softmax_attention
        self.normalize = normalize
        self.node_attention = node_attention
        self.epsilon = 1e-8  # ref :58
        act = {'sigmoid': nn.Sigmoid, 'tanh': nn.Tanh, 'relu': nn.ReLU,
               'silu': nn.SiLU}[attention_activation_fn]
        self.edge_mlp = nn.Sequential(
            nn.Linear(2 * k + 1 + edges_in_d, k), nn.SiLU(),
            nn.Linear(k, k), nn.SiLU())
        node_norm = RefGraphNorm(k) if graphnorm else nn.Identity()
        self.node_mlp = nn.Sequential(
            nn.Linear(2 * k, k), node_norm, nn.SiLU(), nn.Linear(k, k))
        coord_out = nn.Linear(k, 1, bias=False)
        nn.init.xavier_uniform_(coord_out.weight, gain=0.001)  # ref :88-89
        self.coord_mlp = nn.Sequential(
            nn.Linear(k, k), nn.SiLU(), coord_out,
            nn.Tanh() if tanh else nn.Identity())
        if edge_attention:
            self.att_mlp = nn.Sequential(
                nn.Linear(k, 1),
                nn.Identity() if softmax_attention else act())
        if node_attention:
            self.node_att_mlp = nn.Sequential(nn.Linear(k, 1), act())

    def forward(self, h, coord, rows, cols, eattr):
        n = h.shape[0]
        # coord2radial (ref :178-187)
        diff = coord[rows] - coord[cols]
        radial = (diff ** 2).sum(1, keepdim=True)
        if self.normalize:
            diff = diff / (radial.sqrt().detach() + self.epsilon)
        # edge model (ref :123-132)
        m = self.edge_mlp(torch.cat([h[rows], h[cols], radial, eattr], 1))
        # coord model (ref :168-176): segment-MEAN of diff * phi_x(m)
        coord = coord + _segment_mean(diff * self.coord_mlp(m), rows, n)
        # node model (ref :134-166): segment-SUM aggregation at rows
        if self.edge_attention:
            att = self.att_mlp(m)
            if self.softmax_attention:
                att = _scatter_softmax(att, rows, n)
            agg = _segment_sum(att * m, rows, n)
        else:
            agg = _segment_sum(m, rows, n)
        out = self.node_mlp(torch.cat([h, agg], 1))
        if self.node_attention:
            out = out * self.node_att_mlp(out)
        if self.residual:
            out = h + out
        return out, coord


class RefEGNN(nn.Module):
    """Reference SartorrasEGNN (egnn_satorras.py:212-329): input Linear +
    N layers + global mean pool + FC head."""

    def __init__(self, dim_input: int, k: int, dim_output: int,
                 num_layers: int, **layer_kwargs):
        super().__init__()
        self.embed = nn.Linear(dim_input, k)
        self.layers = nn.ModuleList(
            [RefEGNNLayer(k, **layer_kwargs) for _ in range(num_layers)])
        self.head = nn.Linear(k, dim_output)
        self.k = k

    def forward(self, feats, coords, rows, cols, eattr, graph_id, n_graphs):
        h = self.embed(feats)
        c = coords
        for layer in self.layers:
            h, c = layer(h, c, rows, cols, eattr)
        pooled = _segment_mean(h, graph_id, n_graphs)  # global_mean_pool
        return self.head(pooled).reshape(-1, self.head.out_features)


def _copy_linear(torch_lin: nn.Linear, flax_dense: dict):
    with torch.no_grad():
        torch_lin.weight.copy_(torch.tensor(
            np.asarray(flax_dense['kernel']).T))
        if 'bias' in flax_dense:
            torch_lin.bias.copy_(torch.tensor(
                np.asarray(flax_dense['bias'])))


def load_flax_params(net: RefEGNN, flax_params: dict) -> RefEGNN:
    """Copy a flax SartorrasEGNN param tree (scan_layers=False layout)
    into a RefEGNN with the same architecture flags."""
    p = flax_params['params']
    _copy_linear(net.embed, p['input_embed']['Dense_0'])
    _copy_linear(net.head, p['head']['TorchLinear_0']['Dense_0'])
    for i, layer in enumerate(net.layers):
        lp = p[f'egnn_layer_{i}']
        _copy_linear(layer.edge_mlp[0],
                     lp['edge_mlp']['TorchLinear_0']['Dense_0'])
        _copy_linear(layer.edge_mlp[2],
                     lp['edge_mlp']['TorchLinear_1']['Dense_0'])
        _copy_linear(layer.node_mlp[0], lp['node_lin1']['Dense_0'])
        _copy_linear(layer.node_mlp[3], lp['node_lin2']['Dense_0'])
        _copy_linear(layer.coord_mlp[0],
                     lp['coord_mlp']['TorchLinear_0']['Dense_0'])
        _copy_linear(layer.coord_mlp[2],
                     lp['coord_mlp']['TorchLinear_1']['Dense_0'])
        if isinstance(layer.node_mlp[1], RefGraphNorm):
            gn = lp['node_graphnorm']
            with torch.no_grad():
                layer.node_mlp[1].weight.copy_(
                    torch.tensor(np.asarray(gn['weight'])))
                layer.node_mlp[1].bias.copy_(
                    torch.tensor(np.asarray(gn['bias'])))
                layer.node_mlp[1].mean_scale.copy_(
                    torch.tensor(np.asarray(gn['mean_scale'])))
        if layer.edge_attention:
            _copy_linear(layer.att_mlp[0], lp['att_mlp']['Dense_0'])
        if layer.node_attention:
            _copy_linear(layer.node_att_mlp[0],
                         lp['node_att_mlp']['Dense_0'])
    return net


def samples_to_torch_batch(samples):
    """Concatenate GraphSamples into one dynamic pyg-style batch."""
    feats, coords, rows, cols, eattr, gid, ys = [], [], [], [], [], [], []
    off = 0
    for i, s in enumerate(samples):
        feats.append(s.node_feats)
        coords.append(s.coords)
        rows.append(s.senders + off)
        cols.append(s.receivers + off)
        eattr.append(s.edge_attr)
        gid.append(np.full(s.num_nodes, i))
        ys.append(float(s.y))
        off += s.num_nodes
    return (torch.tensor(np.concatenate(feats)),
            torch.tensor(np.concatenate(coords)),
            torch.tensor(np.concatenate(rows), dtype=torch.long),
            torch.tensor(np.concatenate(cols), dtype=torch.long),
            torch.tensor(np.concatenate(eattr)),
            torch.tensor(np.concatenate(gid), dtype=torch.long),
            torch.tensor(ys))
