"""Fused Pallas BACKWARD kernel for the Satorras EGNN edge pass.

Flash-style recompute: the forward kernel (fused_egnn.py) stores NO edge
intermediates — this kernel re-derives x, hidden, m, chidden, phi and the
attention inside VMEM for each 128-node window and chains the cotangents
through the same math, so training avoids the HBM round trips of the
unfused path's [E, 2K+4] input / [E, K] hidden / [E, K] message tensors in
BOTH directions.

Outputs:
- per-edge gradients (feature-major, blend-written by each edge's OWNER
  window exactly as the forward writes phi/att/messages): d_h_src^T,
  d_h_dst^T, d_radial (row 0 of an 8-row buffer), d_prev^T;
- parameter gradients accumulated across the sequential grid in VMEM
  blocks (index map pinned to (0, 0)).

The node-side scatters (d_h from d_h_src over senders) happen OUTSIDE the
kernel on the proven MXU windowed-scatter path (ops/sorted_segment) — the
kernel emits per-edge values only, so it needs no cross-window writes
beyond the owner-blend pattern.

Numerics notes:
- every contraction runs at HIGHEST precision (matches forward);
- the previous-message buffer's padding columns may hold NaN canaries:
  they are SELECTed out before use, and loaded cotangents are selected
  against (in_window AND edge_mask) so 0 * NaN never reaches the
  parameter-gradient matmuls;
- softmax backward is exact per window for the same reason the forward
  is: the collator guarantees all of a node's edges lie in its window's
  slice.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _bwd_kernel(starts_ref,
                h_t_ref, h_dst_ref, extras_ref, prev_ref,
                dphi_ref, datt_ref, dmsg_ref,
                w1_ref, b1_ref, w2_ref, b2_ref,
                cw1_ref, cb1_ref, cw2_ref, attw_ref, attb_ref,
                dagg_ref,
                dhsrc_ref, dhdst_ref, drad_ref, dprev_ref,
                dw1_ref, dw2_ref, dcw1_ref, dvecs_ref,
                hwin_s, hdst_s, extras_s, prev_s,
                cot8a_s, cot8b_s, cotk_s, stage8_s, stagek_s, dma_sems,
                *, window: int, max_eb: int, k: int,
                attention: str, tanh: bool, edge_residual: bool,
                has_dmsg: bool):
    j = pl.program_id(0)
    start = pl.multiple_of(starts_ref[j], 128)
    base = pl.multiple_of(
        jnp.maximum(j - 1, 0).astype(jnp.int32) * window, 128)

    copies = [
        pltpu.make_async_copy(
            h_t_ref.at[:, pl.ds(base, 2 * window)], hwin_s, dma_sems.at[0]),
        pltpu.make_async_copy(
            h_dst_ref.at[:, pl.ds(start, max_eb)], hdst_s, dma_sems.at[1]),
        pltpu.make_async_copy(
            extras_ref.at[:, pl.ds(start, max_eb)], extras_s,
            dma_sems.at[2]),
        pltpu.make_async_copy(
            dphi_ref.at[:, pl.ds(start, max_eb)], cot8a_s, dma_sems.at[3]),
        pltpu.make_async_copy(
            datt_ref.at[:, pl.ds(start, max_eb)], cot8b_s, dma_sems.at[4]),
    ]
    if edge_residual:
        copies.append(pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(start, max_eb)], prev_s, dma_sems.at[5]))
    if has_dmsg:
        copies.append(pltpu.make_async_copy(
            dmsg_ref.at[:, pl.ds(start, max_eb)], cotk_s, dma_sems.at[6]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # ---- recompute the forward window (identical math to _kernel) ---- #
    ids = extras_s[5:6, :].astype(jnp.int32)
    local2 = ids - base
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, max_eb), 0)
    onehot2 = (iota2 == local2).astype(jnp.float32)
    h_src_t = _dot(hwin_s[:], onehot2, ((1,), (0,)))

    local = ids - j * window
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (window, max_eb), 0)
    onehot = (iota1 == local).astype(jnp.float32)
    in_window = ((local >= 0) & (local < window)).astype(jnp.float32)

    x = jnp.concatenate([h_src_t, hdst_s[:], extras_s[0:4, :]], axis=0)
    edge_mask = extras_s[4:5, :]
    valid = in_window * edge_mask                      # [1, max_eb]

    pre1 = _dot(w1_ref[:], x, ((1,), (0,))) + b1_ref[:]
    hidden = _silu(pre1)
    pre2 = _dot(w2_ref[:], hidden, ((1,), (0,))) + b2_ref[:]
    m = _silu(pre2)
    if edge_residual:
        m = m + jnp.where(edge_mask > 0, prev_s[:], 0.0)

    prec = _dot(cw1_ref[:], m, ((1,), (0,))) + cb1_ref[:]
    chidden = _silu(prec)
    prephi = _dot(cw2_ref[:], chidden, ((1,), (0,)))
    phi = jnp.tanh(prephi) if tanh else prephi

    if attention != 'none':
        logits = _dot(attw_ref[:], m, ((1,), (0,))) + attb_ref[:]
        if attention == 'sigmoid':
            att = jax.nn.sigmoid(logits)
        elif attention == 'tanh':
            att = jnp.tanh(logits)
        elif attention == 'relu':
            att = jnp.maximum(logits, 0.0)
        elif attention == 'silu':
            att = _silu(logits)
        else:  # softmax
            guarded = jnp.where(edge_mask > 0, logits, -1e30)
            node_max = jnp.max(
                jnp.where(onehot > 0, guarded, -1e30), axis=1,
                keepdims=True)
            node_max = jnp.where(node_max > -1e29, node_max, 0.0)
            shift = _dot(node_max, onehot, ((0,), (0,)))
            expd = jnp.exp(guarded - shift) * edge_mask
            denom = _dot(onehot, expd, ((1,), (1,)))
            denom_e = _dot(jnp.maximum(denom, 1e-16), onehot,
                           ((0,), (0,)))
            att = expd / jnp.where(denom_e == 0, 1.0, denom_e)

    # ---- cotangents in ---- #
    g_phi = jnp.where(valid > 0, cot8a_s[0:1, :], 0.0)
    # d_messages from this window's aggregation block: onehot restricts to
    # in-window edges; mask padding columns.
    g_messages = _dot(dagg_ref[:], onehot, ((0,), (0,))) * edge_mask

    if attention != 'none':
        g_att_ext = jnp.where(valid > 0, cot8b_s[0:1, :], 0.0)
        g_m = g_messages * att
        g_att = jnp.sum(g_messages * m, axis=0, keepdims=True) + g_att_ext
        if attention == 'sigmoid':
            g_logits = g_att * att * (1.0 - att)
        elif attention == 'tanh':
            g_logits = g_att * (1.0 - att * att)
        elif attention == 'relu':
            g_logits = g_att * (logits > 0).astype(jnp.float32)
        elif attention == 'silu':
            g_logits = g_att * _dsilu(logits)
        else:  # softmax per window, per source node
            weighted = att * g_att                     # [1, max_eb]
            pernode = _dot(onehot, weighted, ((1,), (1,)))   # [W, 1]
            s_e = _dot(pernode, onehot, ((0,), (0,)))        # [1, max_eb]
            g_logits = att * (g_att - s_e)
        g_logits = jnp.where(valid > 0, g_logits, 0.0)
        g_m = g_m + _dot(attw_ref[:], g_logits, ((0,), (0,)))
        d_attw = _dot(g_logits, m, ((1,), (1,)))             # [1, K]
        d_attb = jnp.sum(g_logits)
    else:
        g_m = g_messages
        d_attw = jnp.zeros((1, k), jnp.float32)
        d_attb = jnp.float32(0.0)

    if has_dmsg:
        g_m = g_m + jnp.where(valid > 0, cotk_s[:], 0.0)

    # phi / coord-MLP path
    g_prephi = g_phi * (1.0 - phi * phi) if tanh else g_phi
    d_cw2 = _dot(g_prephi, chidden, ((1,), (1,)))            # [1, K]
    g_chidden = _dot(cw2_ref[:], g_prephi, ((0,), (0,)))     # [K, max_eb]
    g_prec = g_chidden * _dsilu(prec)
    g_prec = jnp.where(valid > 0, g_prec, 0.0)
    d_cw1 = _dot(g_prec, m, ((1,), (1,)))                    # [K, K]
    d_cb1 = jnp.sum(g_prec, axis=1, keepdims=True)           # [K, 1]
    g_m = g_m + _dot(cw1_ref[:], g_prec, ((0,), (0,)))

    g_m = jnp.where(valid > 0, g_m, 0.0)
    # edge residual: gradient splits equally to prev and to m0 = silu(pre2)
    g_pre2 = g_m * _dsilu(pre2)
    d_w2 = _dot(g_pre2, hidden, ((1,), (1,)))                # [K, K]
    d_b2 = jnp.sum(g_pre2, axis=1, keepdims=True)
    g_hidden = _dot(w2_ref[:], g_pre2, ((0,), (0,)))
    g_pre1 = g_hidden * _dsilu(pre1)
    d_w1 = _dot(g_pre1, x, ((1,), (1,)))                     # [K, 2K+4]
    d_b1 = jnp.sum(g_pre1, axis=1, keepdims=True)
    g_x = _dot(w1_ref[:], g_pre1, ((0,), (0,)))              # [2K+4, max_eb]

    # ---- parameter-grad accumulation across the sequential grid ---- #
    vec_rows = jnp.concatenate([
        d_b1.T, d_b2.T, d_cb1.T, d_cw2, d_attw,
        jnp.full((1, k), d_attb, jnp.float32),
        jnp.zeros((2, k), jnp.float32)], axis=0)             # [8, K]

    @pl.when(j == 0)
    def _init():
        dw1_ref[:] = d_w1
        dw2_ref[:] = d_w2
        dcw1_ref[:] = d_cw1
        dvecs_ref[:] = vec_rows

    @pl.when(j > 0)
    def _acc():
        dw1_ref[:] += d_w1
        dw2_ref[:] += d_w2
        dcw1_ref[:] += d_cw1
        dvecs_ref[:] += vec_rows

    # ---- per-edge gradient outputs (owner-window blend writes) ---- #
    def blend_k(vals, out_ref):
        read = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(start, max_eb)], stagek_s, dma_sems.at[7])
        read.start()
        read.wait()
        stagek_s[:] = jnp.where(in_window > 0, vals, stagek_s[:])
        write = pltpu.make_async_copy(
            stagek_s, out_ref.at[:, pl.ds(start, max_eb)], dma_sems.at[7])
        write.start()
        write.wait()

    blend_k(g_x[:k, :], dhsrc_ref)
    blend_k(g_x[k:2 * k, :], dhdst_ref)
    if edge_residual:
        blend_k(jnp.where(valid > 0, g_m, 0.0), dprev_ref)

    read = pltpu.make_async_copy(
        drad_ref.at[:, pl.ds(start, max_eb)], stage8_s, dma_sems.at[7])
    read.start()
    read.wait()
    stage8_s[:] = jnp.where(
        in_window > 0,
        jnp.broadcast_to(g_x[2 * k:2 * k + 1, :], (8, max_eb)),
        stage8_s[:])
    write = pltpu.make_async_copy(
        stage8_s, drad_ref.at[:, pl.ds(start, max_eb)], dma_sems.at[7])
    write.start()
    write.wait()


def fused_edge_backward(h: jnp.ndarray, h_dst_t: jnp.ndarray,
                        extras_t: jnp.ndarray,
                        prev_messages_t: Optional[jnp.ndarray],
                        params: dict,
                        d_agg: jnp.ndarray, d_phi_t: jnp.ndarray,
                        d_att_t: jnp.ndarray,
                        d_msg_t: Optional[jnp.ndarray], *,
                        num_nodes: int, window: int, max_eb: int,
                        attention: str, tanh: bool,
                        interpret: bool = False):
    """Backward of fused_edge_forward by windowed recompute.

    Returns (d_h_src_t [K, E_pad], d_h_dst_t [K, E_pad],
             d_radial_t [8, E_pad] (row 0 meaningful),
             d_prev_t [K, E_pad] or None, d_params dict).
    d_h (node-side) is NOT produced here: scatter d_h_src_t over senders
    outside (ops/sorted_segment windowed scatter).
    """
    k = h.shape[1]
    e_pad = extras_t.shape[1]
    nb = num_nodes // window
    senders = extras_t[5, :].astype(jnp.int32)
    starts = jnp.searchsorted(
        senders, jnp.arange(nb, dtype=jnp.int32) * window).astype(jnp.int32)
    starts = jnp.minimum((starts // 128) * 128, e_pad - max_eb)

    h_t = h.T
    edge_residual = prev_messages_t is not None
    if prev_messages_t is None:
        prev_messages_t = jnp.zeros((k, e_pad), jnp.float32)
    has_dmsg = d_msg_t is not None
    if d_msg_t is None:
        d_msg_t = jnp.zeros((k, e_pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 7 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec((window, k), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM)],         # d_agg block
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),           # d_hsrc_t
            pl.BlockSpec(memory_space=pltpu.HBM),           # d_hdst_t
            pl.BlockSpec(memory_space=pltpu.HBM),           # d_radial_t
            pl.BlockSpec(memory_space=pltpu.HBM),           # d_prev_t
            pl.BlockSpec((k, 2 * k + 4), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),          # dw1
            pl.BlockSpec((k, k), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),          # dw2
            pl.BlockSpec((k, k), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),          # dcw1
            pl.BlockSpec((8, k), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),          # dvecs
        ),
        scratch_shapes=[
            pltpu.VMEM((k, 2 * window), jnp.float32),       # h 2-window
            pltpu.VMEM((k, max_eb), jnp.float32),           # h_dst slice
            pltpu.VMEM((8, max_eb), jnp.float32),           # extras slice
            pltpu.VMEM((k, max_eb), jnp.float32),           # prev slice
            pltpu.VMEM((8, max_eb), jnp.float32),           # d_phi slice
            pltpu.VMEM((8, max_eb), jnp.float32),           # d_att slice
            pltpu.VMEM((k, max_eb), jnp.float32),           # d_msg slice
            pltpu.VMEM((8, max_eb), jnp.float32),           # 8-row stage
            pltpu.VMEM((k, max_eb), jnp.float32),           # K-row stage
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )

    kernel = functools.partial(
        _bwd_kernel, window=window, max_eb=max_eb, k=k,
        attention=attention, tanh=tanh, edge_residual=edge_residual,
        has_dmsg=has_dmsg)

    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, 2 * k + 4), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
            jax.ShapeDtypeStruct((8, k), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, h_t, h_dst_t, extras_t, prev_messages_t,
      d_phi_t, d_att_t, d_msg_t,
      params['w1'], params['b1'], params['w2'], params['b2'],
      params['cw1'], params['cb1'], params['cw2'],
      params['attw'], params['attb'], d_agg)

    (d_hsrc_t, d_hdst_t, d_rad_t, d_prev_t,
     dw1, dw2, dcw1, dvecs) = outs
    d_params = {
        'w1': dw1, 'b1': dvecs[0:1, :].T, 'w2': dw2,
        'b2': dvecs[1:2, :].T,
        'cw1': dcw1, 'cb1': dvecs[2:3, :].T, 'cw2': dvecs[3:4, :],
        'attw': dvecs[4:5, :], 'attb': dvecs[5:6, 0:1],
    }
    return (d_hsrc_t, d_hdst_t, d_rad_t,
            d_prev_t if edge_residual else None, d_params)
