"""Fused Pallas kernel for the Satorras EGNN edge pass.

One grid program per 128-node window computes, entirely in VMEM:

    x_e   = [h_src, h_dst, ||dx||^2, edge_attr]        (edge MLP input)
    m_e   = silu(W2 @ silu(W1 @ x_e + b1) + b2)        (edge messages)
    m_e  += prev_messages                              (edge residual, opt)
    a_e   = sigmoid/softmax attention                  (optional)
    agg_w = sum_{e in window} a_e * m_e                (feature aggregation)
    phi_e = coord_mlp(m_e)                             (coordinate weights)

Layout and correctness notes (each of these was load-bearing on Mosaic):

- everything edge-wise is feature-major ([K, E]) so DMA slices are
  lane-aligned; window offsets are pre-aligned to 128 and hinted with
  pl.multiple_of;
- source features are gathered with a window-local one-hot over TWO node
  windows ([j-1, j+1)) because a slice's leading <=128 edges belong to the
  previous window;
- per-edge outputs (phi, attention, messages) are written with a
  read-blend-write: each program finalises only the edges whose senders
  fall in ITS node window, so overlapping slices never clobber earlier
  windows' values. Grid dimension semantics are 'arbitrary' (sequential),
  making the read-modify-write race-free;
- all contractions run on the MXU at HIGHEST precision (f32 inputs are
  otherwise rounded to bf16, which fails the 3e-5 invariance gates);
- softmax attention is exact per window: the collator guarantees every
  edge of a window's nodes lies inside that window's slice
  (data/buckets capacity check).

The fused layer saves the HBM round trips of the unfused path's
[E, 2K+4] input, [E, K] hidden and [E, K] message tensors. Destination
features are gathered OUTSIDE the kernel (XLA gathers are fast; only
scatters were pathological on this compiler).
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


def _kernel(starts_ref,
            h_t_ref, h_dst_ref, extras_ref, prev_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            cw1_ref, cb1_ref, cw2_ref,
            attw_ref, attb_ref,
            agg_ref, phi_out_ref, att_out_ref, msg_out_ref,
            hwin_s, hdst_s, extras_s, prev_s, stage8_s, stagek_s, dma_sems,
            *, window: int, max_eb: int, k: int, num_nodes: int,
            attention: str, tanh: bool, edge_residual: bool,
            emit_messages: bool):
    j = pl.program_id(0)
    start = pl.multiple_of(starts_ref[j], 128)
    # Two-window node range [base, base + 2W) with base = max(j-1, 0)*W.
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
    ]
    if edge_residual:
        copies.append(pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(start, max_eb)], prev_s, dma_sems.at[3]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    ids = extras_s[5:6, :].astype(jnp.int32)            # senders [1,max_eb]
    local2 = ids - base                                 # within 2W range
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, max_eb), 0)
    onehot2 = (iota2 == local2).astype(jnp.float32)     # [2W, max_eb]
    # h_src^T [K, max_eb] = h_win [K, 2W] @ onehot2
    h_src_t = jax.lax.dot_general(
        hwin_s[:], onehot2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)

    # This window's own membership (for aggregation + output blending).
    local = ids - j * window
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (window, max_eb), 0)
    onehot = (iota1 == local).astype(jnp.float32)       # [W, max_eb]
    in_window = ((local >= 0) & (local < window)).astype(jnp.float32)

    x = jnp.concatenate(
        [h_src_t, hdst_s[:], extras_s[0:4, :]], axis=0)  # [2K+4, max_eb]

    edge_mask = extras_s[4:5, :]                         # [1, max_eb]

    hidden = _silu(jax.lax.dot_general(
        w1_ref[:], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI) + b1_ref[:])
    m = _silu(jax.lax.dot_general(
        w2_ref[:], hidden, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI) + b2_ref[:])
    if edge_residual:
        # Padding columns of the previous-message buffer are never blended
        # and may hold NaN canaries: select, don't multiply.
        m = m + jnp.where(edge_mask > 0, prev_s[:], 0.0)

    chidden = _silu(jax.lax.dot_general(
        cw1_ref[:], m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI) + cb1_ref[:])
    phi = jax.lax.dot_general(
        cw2_ref[:], chidden, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)  # [1, max_eb]
    if tanh:
        phi = jnp.tanh(phi)

    if attention == 'none':
        att = jnp.zeros_like(phi)
        messages = m
    else:
        logits = jax.lax.dot_general(
            attw_ref[:], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI) + attb_ref[:]
        if attention == 'sigmoid':
            att = jax.nn.sigmoid(logits)
        elif attention == 'tanh':
            att = jnp.tanh(logits)
        elif attention == 'relu':
            att = jnp.maximum(logits, 0.0)
        elif attention == 'silu':
            att = _silu(logits)
        else:  # softmax per destination node, complete within the window
            guarded = jnp.where(edge_mask > 0, logits, -1e30)
            node_max = jnp.max(
                jnp.where(onehot > 0, guarded, -1e30), axis=1,
                keepdims=True)                           # [W, 1]
            node_max = jnp.where(node_max > -1e29, node_max, 0.0)
            shift = jax.lax.dot_general(
                node_max, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HI)                           # [1, max_eb]
            expd = jnp.exp(guarded - shift) * edge_mask
            denom = jax.lax.dot_general(
                onehot, expd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)  # [W,1]
            denom_e = jax.lax.dot_general(
                jnp.maximum(denom, 1e-16), onehot,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            att = expd / jnp.where(denom_e == 0, 1.0, denom_e)
        messages = m * att

    # Select (not multiply): padding columns can carry NaNs, and
    # 0 * NaN = NaN would contaminate the aggregation matmul.
    messages = jnp.where(edge_mask > 0, messages, 0.0)

    # Feature aggregation: agg[w, k] = sum_e onehot[w, e] * messages[k, e]
    agg_ref[:] = jax.lax.dot_general(
        onehot, messages, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)

    # Per-edge outputs with read-blend-write so overlapping slices only
    # finalise their own window's edges.
    def blend_write(vals_1row, out_ref):
        read = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(start, max_eb)], stage8_s, dma_sems.at[3])
        read.start()
        read.wait()
        blended = jnp.where(in_window > 0,
                            jnp.broadcast_to(vals_1row, (8, max_eb)),
                            stage8_s[:])
        stage8_s[:] = blended
        write = pltpu.make_async_copy(
            stage8_s, out_ref.at[:, pl.ds(start, max_eb)], dma_sems.at[3])
        write.start()
        write.wait()

    blend_write(phi, phi_out_ref)
    if attention != 'none':
        blend_write(att, att_out_ref)

    if emit_messages:
        read = pltpu.make_async_copy(
            msg_out_ref.at[:, pl.ds(start, max_eb)], stagek_s,
            dma_sems.at[3])
        read.start()
        read.wait()
        stagek_s[:] = jnp.where(in_window > 0, m, stagek_s[:])
        write = pltpu.make_async_copy(
            stagek_s, msg_out_ref.at[:, pl.ds(start, max_eb)],
            dma_sems.at[3])
        write.start()
        write.wait()


def fused_edge_forward(h: jnp.ndarray, h_dst_t: jnp.ndarray,
                       extras_t: jnp.ndarray,
                       prev_messages_t: Optional[jnp.ndarray],
                       params: dict, *, num_nodes: int, window: int,
                       max_eb: int, attention: str, tanh: bool,
                       emit_messages: bool,
                       interpret: bool = False):
    """Run the fused edge pass.

    h: [N, K] node features (N a multiple of window, >= 2*window)
    h_dst_t: [K, E_pad] receiver features, feature-major
    extras_t: [8, E_pad] rows = radial, attr0, attr1, attr2, edge_mask,
        senders(float), 0, 0; E_pad - true_E >= max_eb
    prev_messages_t: [K, E_pad] or None (edge residual)
    params: w1 [K,2K+4], b1 [K,1], w2 [K,K], b2 [K,1], cw1 [K,K],
        cb1 [K,1], cw2 [1,K], attw [1,K], attb [1,1]
    Returns (agg [N, K], phi_t [8, E_pad], att_t [8, E_pad],
             messages_t [K, E_pad]).
    """
    k = h.shape[1]
    e_pad = extras_t.shape[1]
    nb = num_nodes // window
    senders = extras_t[5, :].astype(jnp.int32)
    starts = jnp.searchsorted(
        senders, jnp.arange(nb, dtype=jnp.int32) * window).astype(jnp.int32)
    starts = jnp.minimum((starts // 128) * 128, e_pad - max_eb)

    h_t = h.T  # [K, N]
    edge_residual = prev_messages_t is not None
    if prev_messages_t is None:
        prev_messages_t = jnp.zeros((k, e_pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec((window, k), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM),       # agg
            pl.BlockSpec(memory_space=pltpu.HBM),        # phi_t
            pl.BlockSpec(memory_space=pltpu.HBM),        # att_t
            pl.BlockSpec(memory_space=pltpu.HBM),        # messages_t
        ),
        scratch_shapes=[
            pltpu.VMEM((k, 2 * window), jnp.float32),    # h 2-window slice
            pltpu.VMEM((k, max_eb), jnp.float32),        # h_dst slice
            pltpu.VMEM((8, max_eb), jnp.float32),        # extras slice
            pltpu.VMEM((k, max_eb), jnp.float32),        # prev slice
            pltpu.VMEM((8, max_eb), jnp.float32),        # 8-row stage
            pltpu.VMEM((k, max_eb), jnp.float32),        # K-row stage
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(
        _kernel, window=window, max_eb=max_eb, k=k, num_nodes=num_nodes,
        attention=attention, tanh=tanh, edge_residual=edge_residual,
        emit_messages=emit_messages)

    agg, phi_t, att_t, msg_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_nodes, k), jnp.float32),
            jax.ShapeDtypeStruct((8, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, e_pad), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # The [2W, max_eb] one-hot/iota temporaries exceed Mosaic's
            # default 16M scoped-vmem limit at large buckets (max_eb=4096
            # needs ~21M); v5e has 128M of VMEM, so raise the ceiling.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, h_t, h_dst_t, extras_t, prev_messages_t,
      params['w1'], params['b1'], params['w2'], params['b2'],
      params['cw1'], params['cb1'], params['cw2'],
      params['attw'], params['attb'])
    return agg, phi_t, att_t, msg_t


# --------------------------------------------------------------------- #
# Differentiable wrapper: fused forward + flash-style fused backward
# (ops/pallas/fused_egnn_bwd.py recomputes each window's intermediates in
# VMEM), so the TRAINING step can use the fused edge pass too.
# --------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_edge_pass(h, h_dst_t, extras_t, prev_t, params,
                    num_nodes: int, window: int, max_eb: int,
                    attention: str, tanh: bool, edge_residual: bool,
                    interpret: bool = False):
    """Differentiable fused edge pass.

    Same contract as fused_edge_forward, but prev_t is always an array
    ([K, E_pad]; ignored when edge_residual is False) so the pytree
    structure is static, and messages are always emitted (the backward
    needs nothing saved — it recomputes — but the caller may feed msg_t
    into the next layer's prev).
    """
    return fused_edge_forward(
        h, h_dst_t, extras_t, prev_t if edge_residual else None, params,
        num_nodes=num_nodes, window=window, max_eb=max_eb,
        attention=attention, tanh=tanh, emit_messages=True,
        interpret=interpret)


def _fep_fwd(h, h_dst_t, extras_t, prev_t, params,
             num_nodes, window, max_eb, attention, tanh, edge_residual,
             interpret):
    out = fused_edge_pass(h, h_dst_t, extras_t, prev_t, params,
                          num_nodes, window, max_eb, attention, tanh,
                          edge_residual, interpret)
    return out, (h, h_dst_t, extras_t, prev_t, params)


def _fep_bwd(num_nodes, window, max_eb, attention, tanh, edge_residual,
             interpret, residuals, cotangents):
    from pointvs_tpu.ops.pallas.fused_egnn_bwd import fused_edge_backward
    from pointvs_tpu.ops.sorted_segment import windowed_segment_sum
    h, h_dst_t, extras_t, prev_t, params = residuals
    d_agg, d_phi_t, d_att_t, d_msg_t = cotangents

    d_hsrc_t, d_hdst_t, d_rad_t, d_prev_t, d_params = fused_edge_backward(
        h, h_dst_t, extras_t, prev_t if edge_residual else None, params,
        d_agg, d_phi_t, d_att_t, d_msg_t,
        num_nodes=num_nodes, window=window, max_eb=max_eb,
        attention=attention, tanh=tanh, interpret=interpret)

    # Positions never blended by any window (padding edges, the e_pad
    # tail) keep the output buffers' uninitialised values — SELECT them
    # out with the mask row before anything downstream touches them: the
    # windowed scatters are one-hot MATMULS, where 0-weight x NaN still
    # poisons the sum.
    mask_row = extras_t[4:5, :] > 0
    d_hsrc_t = jnp.where(mask_row, d_hsrc_t, 0.0)
    d_hdst_t = jnp.where(mask_row, d_hdst_t, 0.0)
    d_rad_row = jnp.where(mask_row, d_rad_t[0:1, :], 0.0)

    # Node-side gradient: scatter the per-edge d_h_src over the (sorted)
    # senders on the MXU windowed-scatter path — no XLA scatter.
    senders = extras_t[5, :].astype(jnp.int32)
    d_h = windowed_segment_sum(d_hsrc_t.T, senders, num_nodes)

    d_extras = jnp.zeros_like(extras_t).at[0:1, :].set(d_rad_row)
    if d_prev_t is None:
        d_prev_t = jnp.zeros_like(prev_t)
    else:
        d_prev_t = jnp.where(mask_row, d_prev_t, 0.0)
    return d_h, d_hdst_t, d_extras, d_prev_t, d_params


fused_edge_pass.defvjp(_fep_fwd, _fep_bwd)
