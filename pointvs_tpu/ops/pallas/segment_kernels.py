"""Pallas TPU kernel for the windowed (destination-sorted) segment sum.

Same contract as ops/sorted_segment._wss_impl: edges sorted by id, padding
ids == num_segments, per-window capacity max_eb. One grid program per node
window:

- the window's edge offset arrives via scalar prefetch (searchsorted runs
  outside the kernel);
- edge data is laid out feature-major [K, E] so the DMA'd slice
  [K, max_eb] is lane-aligned (Mosaic requires the sliced minor dim to be
  a multiple of 128; max_eb always is, K=32 is not);
- the [WINDOW, max_eb] local one-hot is built from a broadcasted iota and
  contracted against the data slice on the MXU;
- each window owns its output rows exclusively — no synchronisation.

The XLA vmap+dynamic_slice formulation in ops/sorted_segment stays the
default and the numerical reference; this kernel is selected with
POINTVS_PALLAS=1 and parity is pinned in interpret mode by the tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split3(b):
    """Exact 3-chunk bf16 split of f32 data: b == b1 + b2 + b3 up to the
    full 24-bit mantissa (8 bits per chunk; the residuals are exact f32
    subtractions)."""
    b1 = b.astype(jnp.bfloat16)
    r = b - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def _onehot_dot(onehot, data, dims, onehot_first=True):
    """dot_general between a 0/1 one-hot and f32 data in THREE native bf16
    MXU passes instead of Precision.HIGHEST's six: the one-hot operand is
    exactly representable in bf16, so splitting only the data operand
    yields the same sum of exact products (HIGHEST's extra passes multiply
    by the one-hot's zero low-order chunks)."""
    oh = onehot.astype(jnp.bfloat16)
    out = None
    for chunk in _split3(data):
        operands = (oh, chunk) if onehot_first else (chunk, oh)
        p = jax.lax.dot_general(*operands, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    return out


def _kernel(starts_ref, ids_ref, data_t_ref, out_ref,
            data_scratch, ids_scratch, sems, *, window: int, max_eb: int,
            nb: int):
    """Double-buffered: program j waits on the copy started by j-1 and
    prefetches window j+1's slice before computing, hiding the HBM DMA
    behind the MXU contraction (measured 1.10 -> 0.60 ms on [156k, 40])."""
    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)
    nxt = 1 - slot

    def start_copies(win, buf):
        start = pl.multiple_of(starts_ref[win], 128)
        pltpu.make_async_copy(
            data_t_ref.at[:, pl.ds(start, max_eb)], data_scratch.at[buf],
            sems.at[buf, 0]).start()
        pltpu.make_async_copy(
            ids_ref.at[:, pl.ds(start, max_eb)], ids_scratch.at[buf],
            sems.at[buf, 1]).start()

    @pl.when(j == 0)
    def _first():
        start_copies(0, 0)

    @pl.when(j + 1 < nb)
    def _prefetch():
        start_copies(j + 1, nxt)

    start = pl.multiple_of(starts_ref[j], 128)
    pltpu.make_async_copy(
        data_t_ref.at[:, pl.ds(start, max_eb)], data_scratch.at[slot],
        sems.at[slot, 0]).wait()
    pltpu.make_async_copy(
        ids_ref.at[:, pl.ds(start, max_eb)], ids_scratch.at[slot],
        sems.at[slot, 1]).wait()

    local = ids_scratch[slot, 0:1, :] - j * window   # [1, max_eb]
    win_iota = jax.lax.broadcasted_iota(
        jnp.int32, (window, max_eb), 0)
    onehot = (win_iota == local).astype(jnp.float32)
    # out[w, k] = sum_e onehot[w, e] * data_t[k, e]; 3-pass split
    # contraction (see _onehot_dot) — full f32 accuracy (the 3e-5
    # invariance gates need it) at half HIGHEST's MXU passes.
    out_ref[:] = _onehot_dot(
        onehot, data_scratch[slot],
        dims=(((1,), (1,)), ((), ())))


def _softmax_agg_kernel(starts_ref, ids_ref, data_t_ref, out_ref, max_ref,
                        data_scratch, ids_scratch, sems, *, window: int,
                        max_eb: int, nb: int, k: int,
                        mode: str = 'softmax'):
    """Fused per-window softmax aggregation (see
    pallas_fused_softmax_aggregate): one DMA of the packed slice, the
    masked segment max, the exp-shift weighting and the one-hot MXU
    contraction all happen in VMEM — replacing a separate windowed-max
    op + an HBM-materialised exp-weighted edge array per layer."""
    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)
    nxt = 1 - slot

    def start_copies(win, buf):
        start = pl.multiple_of(starts_ref[win], 128)
        pltpu.make_async_copy(
            data_t_ref.at[:, pl.ds(start, max_eb)], data_scratch.at[buf],
            sems.at[buf, 0]).start()
        pltpu.make_async_copy(
            ids_ref.at[:, pl.ds(start, max_eb)], ids_scratch.at[buf],
            sems.at[buf, 1]).start()

    @pl.when(j == 0)
    def _first():
        start_copies(0, 0)

    @pl.when(j + 1 < nb)
    def _prefetch():
        start_copies(j + 1, nxt)

    start = pl.multiple_of(starts_ref[j], 128)
    pltpu.make_async_copy(
        data_t_ref.at[:, pl.ds(start, max_eb)], data_scratch.at[slot],
        sems.at[slot, 0]).wait()
    pltpu.make_async_copy(
        ids_ref.at[:, pl.ds(start, max_eb)], ids_scratch.at[slot],
        sems.at[slot, 1]).wait()

    local = ids_scratch[slot, 0:1, :] - j * window   # [1, max_eb]
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (window, max_eb), 0)
    onehot = (win_iota == local).astype(jnp.float32)

    data = data_scratch[slot]                         # [kp, max_eb]
    logits = data[k + 3:k + 4, :]                     # [1, max_eb]
    mask = data[k + 5:k + 6, :]                       # [1, max_eb]

    if mode == 'softmax':
        # Masked per-destination max (the softmax stabiliser).
        cand = jnp.where((onehot > 0.5) & (mask > 0.0),
                         jnp.broadcast_to(logits, (window, max_eb)),
                         jnp.float32(-1e30))
        seg_max = jnp.max(cand, axis=1, keepdims=True)  # [window, 1]
        seg_max = jnp.where(seg_max > -1e29, seg_max, 0.0)
        max_ref[:] = seg_max

        # Per-edge shift = seg_max[local id] via the one-hot (edges
        # outside the window get 0; their output contribution is killed
        # by onehot).
        shift = _onehot_dot(
            onehot, seg_max, dims=(((0,), (0,)), ((), ())),
            onehot_first=False)                       # [1, max_eb]
        expd = jnp.exp(logits - shift) * mask         # [1, max_eb]
    else:
        # Sigmoid edge attention: per-edge weight, no normalisation.
        max_ref[:] = jnp.zeros((window, 1), jnp.float32)
        expd = jax.nn.sigmoid(logits) * mask          # [1, max_eb]

    # Row factors: feat rows and the ones row x expd, trans rows x mask,
    # the logits row x 0 (dead output), the mask row x 1.
    kp = data.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)
    sel_expd = ((row < k) | (row == k + 4)).astype(jnp.float32)
    sel_mask = ((row >= k) & (row < k + 3)).astype(jnp.float32)
    sel_one = (row == k + 5).astype(jnp.float32)
    factor = (sel_expd * expd + sel_mask * mask + sel_one)
    weighted = data * factor

    out_ref[:] = _onehot_dot(
        onehot, weighted, dims=(((1,), (1,)), ((), ())))


@functools.partial(jax.jit, static_argnames=('num_segments', 'window',
                                             'max_eb', 'interpret',
                                             'mode'))
def pallas_fused_softmax_aggregate(
        feat: jnp.ndarray, logits: jnp.ndarray, trans: jnp.ndarray,
        mask: jnp.ndarray, sorted_ids: jnp.ndarray, num_segments: int,
        window: int, max_eb: int, interpret: bool = False,
        mode: str = 'softmax'):
    """Attention-weighted aggregation in ONE kernel pass.

    Inputs: feat [E, K] edge features, logits [E] attention logits,
    trans [E, 3] coordinate updates, mask [E], ids sorted ascending with
    padding == num_segments. Returns (out [num_segments, K+6],
    seg_max [num_segments]) where out columns are
    [sum feat*w (K) | sum trans*mask (3) | dead | sum w | sum mask] with
    w = exp(logits - seg_max[id]) * mask  (mode='softmax'; the caller
    divides by sum w) or w = sigmoid(logits) * mask (mode='sigmoid';
    unnormalised, seg_max output is zeros).
    """
    e, k = feat.shape
    nb = -(-num_segments // window)
    starts = jnp.searchsorted(
        sorted_ids, jnp.arange(nb, dtype=jnp.int32) * window
    ).astype(jnp.int32)
    starts = (starts // 128) * 128
    max_eb = max_eb + 128

    ones = jnp.ones((e, 1), feat.dtype)
    packed = jnp.concatenate(
        [feat, trans.astype(feat.dtype), logits[:, None], ones,
         mask[:, None].astype(feat.dtype)], axis=1)       # [E, K+6]
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((e, pad), packed.dtype)], axis=1)
    kp = packed.shape[1]
    data_t = jnp.concatenate(
        [packed, jnp.zeros((max_eb, kp), packed.dtype)]).T
    ids_p = jnp.broadcast_to(
        jnp.concatenate([sorted_ids.astype(jnp.int32),
                         jnp.full((max_eb,), num_segments, jnp.int32)]
                        )[None, :], (8, e + max_eb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # ids  [8, E+max_eb]
            pl.BlockSpec(memory_space=pltpu.HBM),   # data [kp, E+max_eb]
        ],
        out_specs=[
            pl.BlockSpec((window, kp), lambda j, starts: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((window, 1), lambda j, starts: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, kp, max_eb), packed.dtype),
            pltpu.VMEM((2, 8, max_eb), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, seg_max = pl.pallas_call(
        functools.partial(_softmax_agg_kernel, window=window,
                          max_eb=max_eb, nb=nb, k=k, mode=mode),
        out_shape=[
            jax.ShapeDtypeStruct((nb * window, kp), jnp.float32),
            jax.ShapeDtypeStruct((nb * window, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, ids_p, data_t)
    return out[:num_segments, :k + 6], seg_max[:num_segments, 0]


@functools.partial(jax.jit, static_argnames=('num_segments', 'window',
                                             'max_eb', 'interpret'))
def pallas_windowed_segment_sum(data: jnp.ndarray, sorted_ids: jnp.ndarray,
                                num_segments: int, window: int,
                                max_eb: int,
                                interpret: bool = False) -> jnp.ndarray:
    """[E, K] edge data + ascending ids -> [num_segments, K] sums."""
    e, k = data.shape
    nb = -(-num_segments // window)
    # Align window offsets down to 128 and grow the slice by 128 so the
    # true window content always fits.
    starts = jnp.searchsorted(
        sorted_ids, jnp.arange(nb, dtype=jnp.int32) * window
    ).astype(jnp.int32)
    starts = (starts // 128) * 128
    max_eb = max_eb + 128
    # Feature-major layout, padded so dynamic slices never clamp; padding
    # ids fall outside every window.
    data_t = jnp.concatenate(
        [data, jnp.zeros((max_eb, k), data.dtype)]).T
    ids_p = jnp.broadcast_to(
        jnp.concatenate([sorted_ids.astype(jnp.int32),
                         jnp.full((max_eb,), num_segments, jnp.int32)]
                        )[None, :], (8, e + max_eb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # ids  [8, E+max_eb]
            pl.BlockSpec(memory_space=pltpu.HBM),   # data [K, E+max_eb]
        ],
        out_specs=pl.BlockSpec((window, k), lambda j, starts: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, k, max_eb), data.dtype),
            pltpu.VMEM((2, 8, max_eb), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, window=window, max_eb=max_eb, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * window, k), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # [W, max_eb] one-hot temporaries outgrow the default 16M
            # scoped-vmem limit at large buckets; v5e has 128M of VMEM.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, ids_p, data_t)
    return out[:num_segments]
