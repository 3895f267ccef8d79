"""EdgeAggregator: all per-edge gather/aggregate ops for one graph batch,
routed through the MXU windowed-scatter path (ops/sorted_segment.py).

Every operation here has BOTH a fast forward and a fast backward on TPU:
gathers use custom VJPs whose transposes are windowed one-hot matmuls, and
segment sums are windowed matmuls whose transposes are gathers. Nothing on
the hot path emits an XLA scatter.

Conventions as in data/buckets.py: `senders` sorted ascending with padding
rows == num_nodes; `recv_perm` sorts `receivers`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointvs_tpu.ops.sorted_segment import (
    WINDOW,
    derive_max_eb,
    gather_by_sorted_ids,
    windowed_segment_max,
    windowed_segment_sum,
)


def _gather_node_scalar(vec_n, ids, num_segments):
    """vec_n[ids] for a per-NODE [N] vector and per-edge ids, routed
    through an 8-lane ROW gather: XLA lowers the plain 1-D [N] -> [E]
    gather to a scalar-memory-space op measured at ~1.04 ms per 156k
    edges on v5e (7x the equivalent [N, K] row gather); broadcasting to
    [N, 8] first puts it back on the fast row-gather path."""
    clamped = jnp.minimum(ids, num_segments - 1)
    rows = jnp.broadcast_to(vec_n[:, None], (vec_n.shape[0], 8))
    return rows[clamped][:, 0]


def _max_grad_factor(x, c):
    """Gradient of jnp.maximum(x, c) wrt x — including the 0.5 tie split
    (counts hit the tie at degree-1 destinations, so matching autodiff
    of the unfused formulation needs it)."""
    return jnp.where(x > c, 1.0, jnp.where(x == c, 0.5, 0.0))


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_softmax_pallas(feat, logits, trans, mask, senders,
                          num_segments, window, max_eb, interpret=False):
    """(feat_agg, coord_mean) via the single-pass Pallas kernel (masked
    segment max + exp-shift weighting + one-hot contraction in VMEM).
    Parity with the unfused formulation is pinned by
    tests/test_pallas_kernels.py; gradients below replicate autodiff of
    the unfused path exactly (incl. maximum-tie subgradients)."""
    out, _ = _fsp_fwd(feat, logits, trans, mask, senders, num_segments,
                      window, max_eb, interpret)
    return out


def _fsp_fwd(feat, logits, trans, mask, senders, num_segments, window,
             max_eb, interpret=False):
    from pointvs_tpu.ops.pallas.segment_kernels import \
        pallas_fused_softmax_aggregate
    k = feat.shape[1]
    out, seg_max = pallas_fused_softmax_aggregate(
        feat, logits, trans, mask, senders, num_segments, window, max_eb,
        interpret=interpret)
    denom_raw = out[:, k + 4]
    counts_raw = out[:, k + 5]
    denom_c = jnp.maximum(denom_raw, 1e-16)
    counts_c = jnp.maximum(counts_raw, 1.0)
    feat_agg = out[:, :k] / denom_c[:, None]
    coord_mean = out[:, k:k + 3] / counts_c[:, None]
    res = (feat, logits, trans, mask, senders, seg_max,
           denom_raw, counts_raw, feat_agg, coord_mean)
    return (feat_agg, coord_mean), res


def _fsp_bwd(num_segments, window, max_eb, interpret, res, cts):
    (feat, logits, trans, mask, senders, seg_max,
     denom_raw, counts_raw, feat_agg, coord_mean) = res
    g_f, g_c = cts
    denom_c = jnp.maximum(denom_raw, 1e-16)
    counts_c = jnp.maximum(counts_raw, 1.0)

    dS_f = g_f / denom_c[:, None]
    d_denom = (-(g_f * feat_agg).sum(-1) / denom_c
               * _max_grad_factor(denom_raw, 1e-16))
    dS_t = g_c / counts_c[:, None]

    clamped = jnp.minimum(senders, num_segments - 1)
    valid = (senders < num_segments).astype(feat.dtype)
    # All [N] -> [E] reads ride ONE row gather ([N, K+3+2] -> [E, ...]):
    # per-lane 1-D gathers lower to the ~1 ms scalar-space op (see
    # _gather_node_scalar); batched rows stay on the fast path.
    packed_n = jnp.concatenate(
        [dS_f, dS_t, seg_max[:, None], d_denom[:, None]], axis=1)
    packed_e = packed_n[clamped] * valid[:, None]
    k = feat.shape[1]
    gfe = packed_e[:, :k]
    shift = packed_e[:, k + 3]
    expd = jnp.exp(logits - shift) * mask.astype(logits.dtype) * valid

    d_feat = gfe * expd[:, None]
    d_expd = (gfe * feat).sum(-1) + packed_e[:, k + 4]
    d_logits = d_expd * expd
    d_trans = packed_e[:, k:k + 3] * mask[:, None].astype(trans.dtype)
    return d_feat, d_logits, d_trans, None, None


_fused_softmax_pallas.defvjp(_fsp_fwd, _fsp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_sigmoid_pallas(feat, logits, trans, mask, senders,
                          num_segments, window, max_eb, interpret=False):
    """(sum sigmoid(logits)*feat, mean trans) in one kernel pass — the
    sigmoid-edge-attention analogue of _fused_softmax_pallas (no
    normalisation, so no max pass). Replaces the HBM-materialised
    att*feat product + packed scatter of the composable path."""
    out, _ = _fsg_fwd(feat, logits, trans, mask, senders, num_segments,
                      window, max_eb, interpret)
    return out


def _fsg_fwd(feat, logits, trans, mask, senders, num_segments, window,
             max_eb, interpret=False):
    from pointvs_tpu.ops.pallas.segment_kernels import \
        pallas_fused_softmax_aggregate
    k = feat.shape[1]
    out, _ = pallas_fused_softmax_aggregate(
        feat, logits, trans, mask, senders, num_segments, window, max_eb,
        interpret=interpret, mode='sigmoid')
    counts_raw = out[:, k + 5]
    counts_c = jnp.maximum(counts_raw, 1.0)
    feat_agg = out[:, :k]
    coord_mean = out[:, k:k + 3] / counts_c[:, None]
    res = (feat, logits, mask, senders, counts_c)
    return (feat_agg, coord_mean), res


def _fsg_bwd(num_segments, window, max_eb, interpret, res, cts):
    feat, logits, mask, senders, counts_c = res
    g_f, g_c = cts
    clamped = jnp.minimum(senders, num_segments - 1)
    valid = (senders < num_segments).astype(feat.dtype)
    sig = jax.nn.sigmoid(logits)
    w = sig * mask.astype(logits.dtype) * valid
    # One row gather for both node-indexed reads (narrow [N, 3] gathers
    # risk the slow scalar-space lowering — see _gather_node_scalar).
    packed_n = jnp.concatenate([g_f, g_c / counts_c[:, None]], axis=1)
    packed_e = packed_n[clamped] * valid[:, None]
    k = feat.shape[1]
    gfe = packed_e[:, :k]
    d_feat = gfe * w[:, None]
    d_logits = (gfe * feat).sum(-1) * w * (1.0 - sig)
    d_trans = packed_e[:, k:k + 3] * mask[:, None].astype(feat.dtype)
    return d_feat, d_logits, d_trans, None, None


_fused_sigmoid_pallas.defvjp(_fsg_fwd, _fsg_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_unsorted(node_values, ids, ids_sorted_with_perm, num_segments):
    """node_values[ids] for UNSORTED ids; backward scatters via the
    provided (perm, sorted_ids) pair instead of XLA's gather transpose."""
    del ids_sorted_with_perm
    clamped = jnp.minimum(ids, num_segments - 1)
    valid = ids < num_segments
    out = node_values[clamped]
    return out * (valid[:, None] if out.ndim > 1 else valid).astype(
        out.dtype)


def _gu_fwd(node_values, ids, ids_sorted_with_perm, num_segments):
    return _gather_unsorted(node_values, ids, ids_sorted_with_perm,
                            num_segments), ids_sorted_with_perm


def _gu_bwd(num_segments, res, g):
    perm, sorted_ids = res
    d_nodes = windowed_segment_sum(g[perm], sorted_ids, num_segments)
    return d_nodes, None, None


_gather_unsorted.defvjp(_gu_fwd, _gu_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_hc_mixed(h, coord, ids, ids_sorted_with_perm, num_segments):
    """Fused gather of bf16 features + f32 coords through ONE f32 gather.

    The bf16 [N, K] block is bitcast-packed two-lanes-per-f32 into the
    same array as the f32 coords, so mixed-precision mode keeps the
    halved gather/backward-scatter launch count of the fused f32 path.
    Masking uses a bitwise SELECT (never arithmetic) — packed lanes can
    hold bit patterns that a multiply would canonicalise."""
    out = _gather_hc_fwd_impl(h, coord, ids, num_segments)
    return out


def _pack_hc(h, coord):
    n, kh = h.shape
    if kh % 2:
        h = jnp.concatenate([h, jnp.zeros((n, 1), h.dtype)], axis=1)
        kh += 1
    hp = jax.lax.bitcast_convert_type(
        h.reshape(n, kh // 2, 2), jnp.float32)
    packed = jnp.concatenate([hp, coord.astype(jnp.float32)], axis=1)
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((n, pad), jnp.float32)], axis=1)
    return packed, kh


def _gather_hc_fwd_impl(h, coord, ids, num_segments):
    kh_orig = h.shape[1]
    packed, kh = _pack_hc(h, coord)
    clamped = jnp.minimum(ids, num_segments - 1)
    valid = ids < num_segments
    out = jnp.where(valid[:, None], packed[clamped], 0.0)
    h_out = jax.lax.bitcast_convert_type(
        out[:, :kh // 2], h.dtype).reshape(out.shape[0], kh)[:, :kh_orig]
    coord_out = out[:, kh // 2:kh // 2 + 3].astype(coord.dtype)
    return h_out, coord_out


def _ghc_fwd(h, coord, ids, ids_sorted_with_perm, num_segments):
    return _gather_hc_fwd_impl(h, coord, ids, num_segments), \
        (ids, ids_sorted_with_perm)


def _ghc_bwd(num_segments, res, cts):
    ids, ids_sorted_with_perm = res
    g_h, g_coord = cts
    # Feature dtype/width come off the cotangent itself (the primal h
    # has the same shape/dtype as its gathered output's feature block).
    h_dtype, kh = g_h.dtype, g_h.shape[1]
    # Cotangents are ordinary values: cast to f32 and ride ONE windowed
    # scatter (f32 accumulation is also strictly better than a bf16
    # scatter would be).
    g = jnp.concatenate(
        [g_h.astype(jnp.float32), g_coord.astype(jnp.float32)], axis=1)
    pad = (-g.shape[1]) % 8
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros((g.shape[0], pad), jnp.float32)], axis=1)
    if ids_sorted_with_perm is None:
        d = windowed_segment_sum(g, ids, num_segments)
    else:
        perm, sorted_ids = ids_sorted_with_perm
        d = windowed_segment_sum(g[perm], sorted_ids, num_segments)
    d_h = d[:, :kh].astype(h_dtype)
    d_coord = d[:, kh:kh + 3]
    return d_h, d_coord, None, None


_gather_hc_mixed.defvjp(_ghc_fwd, _ghc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_pair(hc, senders, recv_perm, inv_recv_perm, num_segments):
    """(hc[senders], hc[receivers]) for a SYMMETRIC edge list in one node
    gather: receivers[recv_perm] == senders elementwise (per-node
    in-degree == out-degree, the collator-verified GraphBatch
    .inv_recv_perm contract), so hc[receivers] == hc[senders][inv].

    The win is the backward: both cotangents ride ONE windowed scatter
    over the (sorted) senders — the destination side contributes via the
    recv_perm PERMUTATION instead of its own scatter, removing one
    windowed-scatter launch per layer."""
    out, _ = _gp_fwd(hc, senders, recv_perm, inv_recv_perm, num_segments)
    return out


def _gp_fwd(hc, senders, recv_perm, inv_recv_perm, num_segments):
    clamped = jnp.minimum(senders, num_segments - 1)
    valid = (senders < num_segments).astype(hc.dtype)
    hc_s = hc[clamped] * valid[:, None]
    hc_r = hc_s[inv_recv_perm]
    return (hc_s, hc_r), (senders, recv_perm)


def _gp_bwd(num_segments, res, cts):
    senders, recv_perm = res
    g_s, g_r = cts
    # VJP of hc_r = hc_s[inv]: d_hc_s = g_r[recv_perm] (inverse of the
    # inverse); then one scatter carries both sides' cotangents.
    g = g_s + g_r[recv_perm]
    d_hc = windowed_segment_sum(g, senders, num_segments)
    return d_hc, None, None, None


_gather_pair.defvjp(_gp_fwd, _gp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_hc_pair_mixed(h, coord, senders, recv_perm, inv_recv_perm,
                          num_segments):
    """Symmetric-edge pair version of _gather_hc_mixed: bf16 features +
    f32 coords bitcast-packed through ONE f32 node gather for BOTH edge
    endpoints, with the single-scatter backward of _gather_pair."""
    out, _ = _ghp_fwd(h, coord, senders, recv_perm, inv_recv_perm,
                      num_segments)
    return out


def _ghp_fwd(h, coord, senders, recv_perm, inv_recv_perm, num_segments):
    kh_orig = h.shape[1]
    packed, kh = _pack_hc(h, coord)
    clamped = jnp.minimum(senders, num_segments - 1)
    valid = senders < num_segments
    out_s = jnp.where(valid[:, None], packed[clamped], 0.0)
    out_r = out_s[inv_recv_perm]

    def split(out):
        h_out = jax.lax.bitcast_convert_type(
            out[:, :kh // 2], h.dtype).reshape(out.shape[0], kh)[:, :kh_orig]
        coord_out = out[:, kh // 2:kh // 2 + 3].astype(coord.dtype)
        return h_out, coord_out

    return (*split(out_s), *split(out_r)), (senders, recv_perm)


def _ghp_bwd(num_segments, res, cts):
    senders, recv_perm = res
    g_h_s, g_c_s, g_h_r, g_c_r = cts
    h_dtype, kh = g_h_s.dtype, g_h_s.shape[1]
    g_h = g_h_s.astype(jnp.float32) + g_h_r[recv_perm].astype(jnp.float32)
    g_c = g_c_s.astype(jnp.float32) + g_c_r[recv_perm].astype(jnp.float32)
    g = jnp.concatenate([g_h, g_c], axis=1)
    pad = (-g.shape[1]) % 8
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros((g.shape[0], pad), jnp.float32)], axis=1)
    d = windowed_segment_sum(g, senders, num_segments)
    return d[:, :kh].astype(h_dtype), d[:, kh:kh + 3], None, None, None


_gather_hc_pair_mixed.defvjp(_ghp_fwd, _ghp_bwd)


class EdgeAggregator:
    """Bound to one batch's edge layout; stateless wrt model params.

    With ``axis_name`` set, the edge list is assumed sharded across that
    mesh axis (node arrays replicated): every aggregation psums its
    partial node sums over ICI — edge-parallel ("graph-sharded") message
    passing for complexes too large for one device, the analogue of
    sequence/context parallelism for ~10^3+-node graphs.
    """

    def __init__(self, senders, receivers, recv_perm, edge_mask,
                 num_nodes: int, axis_name: str | None = None,
                 inv_recv_perm=None):
        self.senders = senders
        self.receivers = receivers
        self.recv_perm = recv_perm
        self.edge_mask = edge_mask
        self.num_nodes = num_nodes
        self.axis_name = axis_name
        # Inverse receiver permutation: present only for collator-verified
        # SYMMETRIC edge lists (GraphBatch.inv_recv_perm contract) —
        # enables the single-scatter gather_pair path. Ignored when
        # edge-sharded (shards break the symmetry).
        self.inv_recv_perm = None if axis_name is not None \
            else inv_recv_perm
        # receivers in sorted order (gather: cheap, done once per step)
        self.receivers_sorted = jnp.sort(receivers) if recv_perm is None \
            else receivers[recv_perm]

    def _psum(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.psum(x, self.axis_name)

    def _pmax(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.pmax(x, self.axis_name)

    # -- gathers ------------------------------------------------------- #
    def gather_src(self, h):
        return gather_by_sorted_ids(h, self.senders, self.num_nodes)

    def gather_dst(self, h):
        return _gather_unsorted(
            h, self.receivers, (self.recv_perm, self.receivers_sorted),
            self.num_nodes)

    # Mixed-precision fused gathers: bf16 features + f32 coords through
    # one f32 gather (bitcast-packed; see _gather_hc_mixed).
    def gather_hc_src(self, h, coord):
        return _gather_hc_mixed(h, coord, self.senders, None,
                                self.num_nodes)

    def gather_hc_dst(self, h, coord):
        return _gather_hc_mixed(
            h, coord, self.receivers,
            (self.recv_perm, self.receivers_sorted), self.num_nodes)

    # Symmetric-edge fast path (inv_recv_perm is not None): both edge
    # endpoints from one node gather; backward is ONE windowed scatter.
    def gather_pair(self, hc):
        return _gather_pair(hc, self.senders, self.recv_perm,
                            self.inv_recv_perm, self.num_nodes)

    def gather_hc_pair(self, h, coord):
        return _gather_hc_pair_mixed(
            h, coord, self.senders, self.recv_perm, self.inv_recv_perm,
            self.num_nodes)

    # -- aggregations to the SOURCE index (satorras convention) -------- #
    def _masked(self, data, mask):
        if mask is None:
            mask = self.edge_mask
        if mask is None:
            return data
        # Cast the (f32) mask to the data dtype: in bf16 mode a f32 mask
        # would silently promote the whole aggregation back to f32.
        mask = mask.astype(data.dtype)
        return data * (mask[:, None] if data.ndim > 1 else mask)

    def sum_to_src(self, data, mask=None):
        return self._psum(windowed_segment_sum(
            self._masked(data, mask), self.senders, self.num_nodes))

    def fused_softmax_aggregate(self, edge_feat, logits, trans, mask=None,
                                train=False):
        """Softmax-attention aggregation + coordinate mean in ONE scatter.

        Per-destination softmax(logits) weighting of edge_feat, aggregated
        without materialising normalised per-edge attention:
        sum_e softmax_e * m_e == (sum_e expd_e * m_e) / (sum_e expd_e),
        so [expd*m (K) | trans (3) | expd (1) | mask (1)] ride one
        windowed scatter instead of softmax's sum + gather plus two more
        aggregations (ref per-edge semantics preserved exactly up to fp
        summation order; the capture_aux path keeps the explicit per-edge
        attention for the attribution tools and the sums-to-1 gate).
        """
        mask = self.edge_mask if mask is None else mask
        squeeze = logits.ndim == 2 and logits.shape[-1] == 1
        flat = logits[:, 0] if squeeze else logits

        # Single-pass Pallas kernel (masked segment max + exp weighting +
        # contraction in VMEM) when unsharded f32 on TPU — in BOTH train
        # and eval since round 5: the stash-VJP (seg-max saved in the
        # forward, expd rebuilt elementwise, one row gather — no
        # recompute pass, no scatter) now WINS the 12L train A/B at HEAD
        # shapes (35.0 vs 41.8 ms/step D2H-fenced, dynamic-cap era;
        # BASELINE.md r5 — the r3 kernel-loses measurement predated
        # dynamic caps, which shrank the kernel's per-window slices
        # 4.4x). The edge-sharded path stays composable (it needs a
        # cross-device pmax BETWEEN max and exp).
        import os
        from pointvs_tpu.ops.sorted_segment import _use_pallas
        k = edge_feat.shape[1]
        env = os.environ.get('POINTVS_FUSED_SOFTMAX', '1')
        # env: '0' = kernel off (A/B without losing the scatter kernel),
        # 'eval' = the pre-r5 eval-only gating, anything else = train +
        # eval (default).
        allowed = env != '0' and not (env == 'eval' and train)
        if (allowed and self.axis_name is None and mask is not None
                and edge_feat.dtype == jnp.float32
                and flat.dtype == jnp.float32
                and edge_feat.shape[0] >= 4 * WINDOW):
            max_eb = derive_max_eb(edge_feat.shape[0], self.num_nodes)
            kp = k + 6 + (-(k + 6)) % 8
            vmem_ok = max_eb * (1024 + 4 * kp + 64) < 80 * 1024 * 1024
            if _use_pallas() and vmem_ok:
                return _fused_softmax_pallas(
                    edge_feat, flat, trans.astype(edge_feat.dtype),
                    mask.astype(edge_feat.dtype), self.senders,
                    self.num_nodes, WINDOW, max_eb, False)

        guarded = jnp.where(mask > 0, flat,
                            jnp.asarray(-1e30, flat.dtype)) \
            if mask is not None else flat
        seg_max = self._pmax(windowed_segment_max(
            guarded, self.senders, self.num_nodes))
        seg_max = jnp.where(seg_max > -1e29, seg_max, 0.0)
        shift = jax.lax.stop_gradient(
            _gather_node_scalar(seg_max, self.senders, self.num_nodes))
        expd = jnp.exp(flat - shift)
        if mask is not None:
            expd = expd * mask.astype(expd.dtype)

        ones = (jnp.ones((edge_feat.shape[0], 1), edge_feat.dtype)
                if mask is None else
                mask[:, None].astype(edge_feat.dtype))
        packed = jnp.concatenate(
            [edge_feat * expd[:, None],
             self._masked(trans.astype(edge_feat.dtype), mask),
             expd[:, None], ones], axis=1)
        pad = (-packed.shape[1]) % 8
        if pad:
            packed = jnp.concatenate(
                [packed, jnp.zeros((packed.shape[0], pad),
                                   packed.dtype)], axis=1)
        out = self._psum(windowed_segment_sum(
            packed, self.senders, self.num_nodes))
        denom = jnp.maximum(out[:, k + 3:k + 4], 1e-16)
        feat_agg = out[:, :k] / denom
        counts = jnp.maximum(out[:, k + 4:k + 5], 1.0)
        return feat_agg, out[:, k:k + 3] / counts

    def fused_sigmoid_aggregate(self, edge_feat, logits, trans,
                                mask=None, train=False):
        """(sum sigmoid(logits)*feat, mean trans) per destination — the
        sigmoid-edge-attention aggregation in ONE kernel pass on TPU
        (falls back to the composable ops elsewhere). Train + eval like
        the softmax kernel since round 5 (same stash-VJP structure,
        minus the max pass; same A/B gate)."""
        import os
        mask = self.edge_mask if mask is None else mask
        flat = logits[:, 0] if (logits.ndim == 2
                                and logits.shape[-1] == 1) else logits
        from pointvs_tpu.ops.sorted_segment import _use_pallas
        k = edge_feat.shape[1]
        env = os.environ.get('POINTVS_FUSED_SOFTMAX', '1')
        if (env != '0' and not (env == 'eval' and train)
                and self.axis_name is None and mask is not None
                and edge_feat.dtype == jnp.float32
                and flat.dtype == jnp.float32
                and edge_feat.shape[0] >= 4 * WINDOW):
            max_eb = derive_max_eb(edge_feat.shape[0], self.num_nodes)
            kp = k + 6 + (-(k + 6)) % 8
            vmem_ok = max_eb * (1024 + 4 * kp + 64) < 80 * 1024 * 1024
            if _use_pallas() and vmem_ok:
                return _fused_sigmoid_pallas(
                    edge_feat, flat, trans.astype(edge_feat.dtype),
                    mask.astype(edge_feat.dtype), self.senders,
                    self.num_nodes, WINDOW, max_eb, False)
        att = jax.nn.sigmoid(flat)[:, None]
        return self.fused_sum_mean_to_src(att * edge_feat, trans,
                                          mask=mask)

    def fused_sum_mean_to_src(self, messages, trans, mask=None):
        """(segment_sum(messages), segment_mean(trans)) in ONE windowed
        scatter: messages [E, K], trans [E, 3] and the count column share
        the one-hot matmul (and, when edge-sharded, one psum) instead of
        three separate scatter launches per layer."""
        mask = self.edge_mask if mask is None else mask
        ones = (jnp.ones((messages.shape[0], 1), messages.dtype)
                if mask is None else mask[:, None].astype(messages.dtype))
        k = messages.shape[1]
        packed = jnp.concatenate(
            [self._masked(messages, mask),
             self._masked(trans.astype(messages.dtype), mask),
             ones], axis=1)
        pad = (-packed.shape[1]) % 8   # pallas path needs lanes % 8 == 0
        if pad:
            packed = jnp.concatenate(
                [packed, jnp.zeros((packed.shape[0], pad),
                                   packed.dtype)], axis=1)
        out = self._psum(windowed_segment_sum(
            packed, self.senders, self.num_nodes))
        feat_sum = out[:, :k]
        trans_sum = out[:, k:k + 3]
        counts = jnp.maximum(out[:, k + 3:k + 4], 1.0)
        return feat_sum, trans_sum / counts

    def mean_to_src(self, data, mask=None):
        mask = self.edge_mask if mask is None else mask
        total = self.sum_to_src(data, mask)
        counts = self._psum(windowed_segment_sum(
            mask, self.senders, self.num_nodes))
        denom = jnp.maximum(counts, 1.0)
        return total / (denom[:, None] if data.ndim > 1 else denom)

    def softmax_src(self, logits, mask=None):
        """Softmax per destination node over incoming edges; masked edges
        get exactly 0 (test_attention gate)."""
        mask = self.edge_mask if mask is None else mask
        squeeze = logits.ndim == 2 and logits.shape[-1] == 1
        flat = logits[:, 0] if squeeze else logits
        guarded = jnp.where(mask > 0, flat,
                            jnp.asarray(-1e30, flat.dtype)) \
            if mask is not None else flat
        seg_max = self._pmax(windowed_segment_max(
            guarded, self.senders, self.num_nodes))
        seg_max = jnp.where(seg_max > -1e29, seg_max, 0.0)
        # stop_gradient on the gathered shift: the max is a constant offset
        # for softmax, and killing its cotangent here avoids a scatter.
        shift = jax.lax.stop_gradient(
            _gather_node_scalar(seg_max, self.senders, self.num_nodes))
        expd = jnp.exp(flat - shift)
        if mask is not None:
            expd = expd * mask.astype(expd.dtype)
        denom = self._psum(windowed_segment_sum(
            expd, self.senders, self.num_nodes))
        # 8-lane row gather (see _gather_node_scalar) with the windowed-
        # scatter VJP: the broadcast's transpose sums the lanes back.
        denom_e = gather_by_sorted_ids(
            jnp.broadcast_to(jnp.maximum(denom, 1e-16)[:, None],
                             (self.num_nodes, 8)),
            self.senders, self.num_nodes)[:, 0]
        # padding edges gathered a masked 0/0 guard; their expd is 0 anyway
        out = expd / jnp.where(denom_e == 0, 1.0, denom_e)
        return out[:, None] if squeeze else out

    # -- aggregations to the DESTINATION index (pyg/lucid convention) -- #
    def sum_to_dst(self, data, mask=None):
        data = self._masked(data, mask)
        return self._psum(windowed_segment_sum(
            data[self.recv_perm], self.receivers_sorted, self.num_nodes))

    def mean_to_dst(self, data, mask=None):
        mask = self.edge_mask if mask is None else mask
        total = self.sum_to_dst(data, mask)
        counts = self._psum(windowed_segment_sum(
            mask[self.recv_perm], self.receivers_sorted, self.num_nodes))
        denom = jnp.maximum(counts, 1.0)
        return total / (denom[:, None] if data.ndim > 1 else denom)


def _agg_flatten(agg: 'EdgeAggregator'):
    children = (agg.senders, agg.receivers, agg.recv_perm, agg.edge_mask,
                agg.receivers_sorted, agg.inv_recv_perm)
    aux = (agg.num_nodes, agg.axis_name)
    return children, aux


def _agg_unflatten(aux, children):
    obj = object.__new__(EdgeAggregator)
    (obj.senders, obj.receivers, obj.recv_perm, obj.edge_mask,
     obj.receivers_sorted, obj.inv_recv_perm) = children
    obj.num_nodes, obj.axis_name = aux
    return obj


# Registered as a pytree so aggregators can cross jit/remat/scan
# boundaries as ordinary arguments.
jax.tree_util.register_pytree_node(
    EdgeAggregator, _agg_flatten, _agg_unflatten)
