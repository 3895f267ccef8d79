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
    _copy_satorras_layers(net.layers, p)
    return net


def _copy_satorras_layers(layers, p: dict):
    """Copy flax egnn_layer_{i} trees into RefEGNNLayer modules."""
    for i, layer in enumerate(layers):
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


# --------------------------------------------------------------------- #
# Lucid ("EGNN_Sparse"/PygLucidEGNN) reference math.
# Faithful to /root/reference/point_vs/models/geometric/egnn_lucid.py
# (EGNN_Sparse :17-205, PygLucidEGNN.build_net rewiring :211-288) plus the
# two third-party kernels it imports from egnn_pytorch (fourier_encode_dist,
# CoorsNorm) and torch_geometric (LayerNorm in its batched "graph" mode).
# pyg MessagePassing flow is source_to_target: x_i/aggregation index is
# edge_index[1] (targets), x_j is edge_index[0]; aggr='mean' (ref :233).
# --------------------------------------------------------------------- #


def _fourier_encode_dist(x: torch.Tensor, num_encodings: int) -> torch.Tensor:
    """egnn_pytorch.fourier_encode_dist with include_self=True:
    [E, 1] -> [E, 2*num_encodings + 1] = [sin(x/2^i), cos(x/2^i), x]."""
    scales = 2.0 ** torch.arange(num_encodings, dtype=x.dtype)
    scaled = x / scales  # [E, F] via broadcast of [E, 1]
    return torch.cat([scaled.sin(), scaled.cos(), x], dim=-1)


class RefCoorsNorm(nn.Module):
    """egnn_pytorch.CoorsNorm: unit vectors * learnable scale
    (scale_init=1e-2 per PygLucidEGNN.build_net, ref egnn_lucid.py:230)."""

    def __init__(self, scale_init: float = 1e-2, eps: float = 1e-8):
        super().__init__()
        self.scale = nn.Parameter(torch.full((1,), scale_init))
        self.eps = eps

    def forward(self, coors):
        norm = coors.norm(dim=-1, keepdim=True).clamp(min=self.eps)
        return coors / norm * self.scale


class RefPygGraphLayerNorm(nn.Module):
    """torch_geometric.nn.norm.LayerNorm as the lucid layer calls it —
    WITH the batch vector (ref egnn_lucid.py:194-195): scalar mean/var per
    graph over nodes x channels, then per-channel affine."""

    def __init__(self, k: int, eps: float = 1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(k))
        self.bias = nn.Parameter(torch.zeros(k))
        self.eps = eps

    def forward(self, x, batch, n_graphs):
        count = _segment_sum(torch.ones(len(batch), 1), batch, n_graphs)
        norm = (count.clamp(min=1) * x.size(-1))
        mean = _segment_sum(x.sum(-1, keepdim=True), batch, n_graphs) / norm
        x = x - mean[batch]
        var = _segment_sum((x * x).sum(-1, keepdim=True), batch,
                           n_graphs) / norm
        out = x / (var + self.eps).sqrt()[batch]
        return out * self.weight + self.bias


class RefLucidLayer(nn.Module):
    """One EGNN_Sparse layer after PygLucidEGNN.build_net rewiring (ref
    egnn_lucid.py:211-288; eval mode, so the shared Dropout is identity).
    The ctor's coor_weights_clamp_value=2.0 is dead code — EGNN_Sparse
    overwrites it with None (ref :58) — so no clamp is applied."""

    def __init__(self, k: int, edge_attr_dim: int = 3,
                 fourier_features: int = 0, soft_edge: bool = False,
                 thick_attention: bool = False, norm_feats: bool = False,
                 norm_coors: bool = False, tanh: bool = True,
                 thin_mlps: bool = False, graphnorm: bool = False,
                 node_final_act: bool = False):
        super().__init__()
        self.fourier_features = fourier_features
        self.soft_edge = soft_edge
        self.norm_feats = norm_feats
        self.norm_coors = norm_coors
        eid = (fourier_features * 2) + edge_attr_dim + 1 + k * 2
        self.edge_mlp = nn.Sequential(
            nn.Linear(eid, eid * 2), nn.SiLU(), nn.Linear(eid * 2, k),
            nn.SiLU())
        if soft_edge:
            if thick_attention:   # ref :244-250
                self.edge_weight = nn.Sequential(
                    nn.Linear(k, k), nn.SiLU(), nn.Linear(k, 1),
                    nn.Sigmoid())
            else:                 # ref :75-77
                self.edge_weight = nn.Sequential(
                    nn.Linear(k, 1), nn.Sigmoid())
        if norm_feats:
            self.node_norm = RefPygGraphLayerNorm(k)
        if norm_coors:
            self.coors_norm = RefCoorsNorm()
        gn_dim = k if thin_mlps else k * 2
        node_gn = RefGraphNorm(gn_dim) if graphnorm else nn.Identity()
        if thin_mlps:             # ref :252-263
            self.node_mlp = nn.Sequential(
                nn.Linear(2 * k, k), node_gn,
                nn.SiLU() if node_final_act else nn.Identity())
            self.coors_mlp = nn.Sequential(
                nn.Linear(k, 1), nn.Tanh() if tanh else nn.Identity())
        else:                     # ref :264-283
            self.node_mlp = nn.Sequential(
                nn.Linear(2 * k, 2 * k), node_gn, nn.SiLU(),
                nn.Linear(2 * k, k),
                nn.SiLU() if node_final_act else nn.Identity())
            self.coors_mlp = nn.Sequential(
                nn.Linear(k, 4 * k), nn.SiLU(), nn.Linear(4 * k, 1),
                nn.Tanh() if tanh else nn.Identity())

    def forward(self, h, e0, e1, eattr, batch, n_graphs):
        coors, feats = h[:, :3], h[:, 3:]
        n = feats.shape[0]
        rel_coors = coors[e0] - coors[e1]          # ref :126
        rel_dist = (rel_coors ** 2).sum(-1, keepdim=True)
        if self.fourier_features > 0:
            rel_dist = _fourier_encode_dist(rel_dist, self.fourier_features)
        ea = torch.cat([eattr, rel_dist], dim=-1)
        # message (ref :144-146): [x_i (targets e1), x_j (sources e0), ea]
        m_ij = self.edge_mlp(torch.cat([feats[e1], feats[e0], ea], dim=-1))
        # coords update BEFORE soft-edge weighting (ref :168-184)
        coor_wij = self.coors_mlp(m_ij)
        if self.norm_coors:
            rel_coors = self.coors_norm(rel_coors)
        coors_out = coors + _segment_mean(coor_wij * rel_coors, e1, n)
        if self.soft_edge:         # ref :189-191
            m_ij = m_ij * self.edge_weight(m_ij)
        m_i = _segment_mean(m_ij, e1, n)           # aggr='mean', ref :233
        hidden = (self.node_norm(feats, batch, n_graphs)
                  if self.norm_feats else feats)
        hidden_out = feats + self.node_mlp(torch.cat([hidden, m_i], dim=-1))
        return torch.cat([coors_out, hidden_out], dim=-1)


class RefLucidEGNN(nn.Module):
    """Reference PygLucidEGNN (ref egnn_lucid.py:211-294): PygLinearPass
    embedding on features (coords carried in the first 3 columns), N
    rewired EGNN_Sparse layers, global mean pool + linear head."""

    def __init__(self, dim_input: int, k: int, dim_output: int,
                 num_layers: int, **layer_kwargs):
        super().__init__()
        self.embed = nn.Linear(dim_input, k)
        self.layers = nn.ModuleList(
            [RefLucidLayer(k, **layer_kwargs) for _ in range(num_layers)])
        self.head = nn.Linear(k, dim_output)

    def forward(self, feats, coords, e0, e1, eattr, graph_id, n_graphs):
        h = torch.cat([coords, self.embed(feats)], dim=-1)
        for layer in self.layers:
            h = layer(h, e0, e1, eattr, graph_id, n_graphs)
        pooled = _segment_mean(h[:, 3:], graph_id, n_graphs)
        return self.head(pooled)


def load_flax_lucid_params(net: RefLucidEGNN, flax_params: dict
                           ) -> RefLucidEGNN:
    """Copy a flax LucidEGNN param tree (scan_layers=False layout) into a
    RefLucidEGNN with the same architecture flags."""
    p = flax_params['params']
    _copy_linear(net.embed, p['input_embed'])
    _copy_linear(net.head, p['head'])
    for i, layer in enumerate(net.layers):
        lp = p[f'lucid_layer_{i}']
        _copy_linear(layer.edge_mlp[0],
                     lp['edge_mlp']['TorchLinear_0']['Dense_0'])
        _copy_linear(layer.edge_mlp[2],
                     lp['edge_mlp']['TorchLinear_1']['Dense_0'])
        if layer.soft_edge:
            wp = lp['edge_weight']
            if isinstance(layer.edge_weight[1], nn.SiLU):  # thick
                _copy_linear(layer.edge_weight[0],
                             wp['TorchLinear_0']['Dense_0'])
                _copy_linear(layer.edge_weight[2],
                             wp['TorchLinear_1']['Dense_0'])
            else:
                _copy_linear(layer.edge_weight[0],
                             wp['TorchLinear_0']['Dense_0'])
        if layer.norm_feats:
            with torch.no_grad():
                layer.node_norm.weight.copy_(torch.tensor(
                    np.asarray(lp['node_norm']['weight'])))
                layer.node_norm.bias.copy_(torch.tensor(
                    np.asarray(lp['node_norm']['bias'])))
        if layer.norm_coors:
            with torch.no_grad():
                layer.coors_norm.scale.copy_(torch.tensor(
                    np.asarray(lp['coors_norm']['scale'])))
        _copy_linear(layer.node_mlp[0], lp['node_lin1'])
        if isinstance(layer.node_mlp[1], RefGraphNorm):
            gn = lp['node_graphnorm']
            with torch.no_grad():
                layer.node_mlp[1].weight.copy_(
                    torch.tensor(np.asarray(gn['weight'])))
                layer.node_mlp[1].bias.copy_(
                    torch.tensor(np.asarray(gn['bias'])))
                layer.node_mlp[1].mean_scale.copy_(
                    torch.tensor(np.asarray(gn['mean_scale'])))
        if len(layer.node_mlp) > 3:   # thick: second linear at index 3
            _copy_linear(layer.node_mlp[3], lp['node_lin2'])
        cp = lp['coors_mlp']
        _copy_linear(layer.coors_mlp[0], cp['TorchLinear_0']['Dense_0'])
        if len(layer.coors_mlp) > 2:  # thick: 2-linear coors MLP
            _copy_linear(layer.coors_mlp[2],
                         cp['TorchLinear_1']['Dense_0'])
    return net


# --------------------------------------------------------------------- #
# Multitask reference math (egnn_multitask.py:11-166): satorras trunk with
# per-layer first/final-only attention switches + two heads selected by
# model_task at forward time.
# --------------------------------------------------------------------- #


class RefMultitaskEGNN(nn.Module):
    def __init__(self, dim_input: int, k: int, dim_output: int,
                 num_layers: int, edge_attention: bool = False,
                 node_attention: bool = False,
                 edge_attention_first_only: bool = False,
                 edge_attention_final_only: bool = False,
                 node_attention_first_only: bool = False,
                 node_attention_final_only: bool = False,
                 final_softplus: bool = False, **layer_kwargs):
        super().__init__()

        def switch(enabled, first_only, final_only, i):
            if not enabled:
                return False
            if not first_only and not final_only:
                return True
            return ((first_only and i == 0)
                    or (final_only and i == num_layers - 1))

        self.embed = nn.Linear(dim_input, k)
        self.layers = nn.ModuleList([
            RefEGNNLayer(
                k,
                edge_attention=switch(edge_attention,
                                      edge_attention_first_only,
                                      edge_attention_final_only, i),
                node_attention=switch(node_attention,
                                      node_attention_first_only,
                                      node_attention_final_only, i),
                **layer_kwargs)
            for i in range(num_layers)])
        # ref :141-146: pose head Linear(k, 1); affinity head
        # Linear(k, dim_output) + Softplus/ReLU.
        self.head_pose = nn.Linear(k, 1)
        self.head_affinity = nn.Sequential(
            nn.Linear(k, dim_output),
            nn.Softplus() if final_softplus else nn.ReLU())

    def forward(self, feats, coords, rows, cols, eattr, graph_id, n_graphs,
                task: str = 'classification'):
        h = self.embed(feats)
        c = coords
        for layer in self.layers:
            h, c = layer(h, c, rows, cols, eattr)
        pooled = _segment_mean(h, graph_id, n_graphs)
        if 'classification' in task:
            return self.head_pose(pooled)
        return self.head_affinity(pooled)


def load_flax_multitask_params(net: RefMultitaskEGNN, flax_params: dict
                               ) -> RefMultitaskEGNN:
    p = flax_params['params']
    _copy_linear(net.embed, p['input_embed']['Dense_0'])
    _copy_linear(net.head_pose,
                 p['head_pose']['TorchLinear_0']['Dense_0'])
    _copy_linear(net.head_affinity[0],
                 p['head_affinity']['TorchLinear_0']['Dense_0'])
    _copy_satorras_layers(net.layers, p)
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
