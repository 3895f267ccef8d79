"""MXU-friendly segment ops over destination-sorted edge lists.

Why: XLA lowers scatter-add (both `jax.ops.segment_sum` under grad and the
transpose of gather) to a serialized per-row update on TPU when it cannot
prove anything about the indices — measured ~5.5 ms for 156k x 32 rows on
one v5e chip, which dominated the training step. This module replaces every
hot scatter with dense one-hot matmuls over small node windows, which run
on the MXU at full tilt:

- edges are sorted by destination id at collation time (buckets.py), so
  the edges landing in a window of `WINDOW` consecutive node ids occupy one
  contiguous slice of the edge array;
- per window: slice up to `max_eb` edges, build a [max_eb, WINDOW] one-hot
  of local ids, and matmul with the edge data -> the window's [WINDOW, K]
  output rows. No write conflicts across windows -> fully parallel vmap.
- `max_eb` is derived from the (static) padded shapes, so jit sees a
  constant; the collator *verifies* the true per-window load fits
  (buckets.pad_graphs_to_batch) and fails loudly otherwise.

Backward passes are cheap by construction: the VJP of the windowed sum is
a gather, and gathers that need scatter VJPs are wrapped in custom_vjp
that reuse the windowed sum.

All matmuls use precision=HIGHEST so fp32 data is not silently truncated
to bf16 (the E(3)-invariance gate is 3e-5).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Node-window size for the one-hot scatter formulation. 128 measured
# best at bench shapes (256 halves the grid-step count but the larger
# [window, max_eb] one-hot compare/contract per program did not pay off);
# env knob for per-deployment A/B.
WINDOW = int(os.environ.get('POINTVS_WINDOW', '128'))
# Matmul precision for the one-hot segment ops. HIGHEST (6-pass bf16) by
# default — the E(3)-invariance gate is 3e-5 and f32 data must not be
# silently truncated. POINTVS_SEGMENT_PRECISION=high selects 3-pass for
# perf experiments (validate invariance on the REAL device before use:
# the CPU gates run in f32 regardless and cannot catch it).
_PRECISION = {
    'high': jax.lax.Precision.HIGH,
    'highest': jax.lax.Precision.HIGHEST,
    'default': jax.lax.Precision.DEFAULT,
}[os.environ.get('POINTVS_SEGMENT_PRECISION', 'highest').lower()]


def _use_pallas() -> bool:
    """Pallas kernel for the forward scatter on TPU (2x the XLA windowed
    formulation on v5e); opt out with POINTVS_PALLAS=0."""
    if os.environ.get('POINTVS_PALLAS', '1') == '0':
        return False
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


_EB_ROUND = int(os.environ.get('POINTVS_EB_ROUND', '512'))
# Capacity headroom over the MEAN window load. The one-hot matmul cost is
# linear in capacity, so the factor is a direct perf lever: smaller saves
# FLOPs/DMA but makes the collator grow e_pad (recompile risk) more often
# on skewed batches. 2.0 measured safe across the shipped datasets.
_EB_FACTOR = float(os.environ.get('POINTVS_EB_FACTOR', '2.0'))

# -- per-batch capacity override (the "dynamic cap" path) ---------------- #
# The shape-derived capacity above couples capacity to e_pad: a dense
# pocket whose realised max window load exceeds factor x mean forces the
# collator to GROW e_pad, which inflates every per-edge tensor (gathers,
# edge MLPs) *and* the derived capacity with it — measured 1.47x edge
# padding overhead at author scale (edge_radius 10, estimate_bonds).
# Instead the loader measures the realised max window load per batch,
# rounds it to a coarse bucket grid (bounded program count), and the step
# wrappers (parallel/steps.py) activate it here during tracing. The
# override applies ONLY to scatters whose (num_segments, num_edges)
# match the batch's (n_pad, e_pad) — i.e. the edge->node aggregations —
# so pool/graph-level segment ops keep their shape-derived capacity.
_CAP_OVERRIDE: tuple | None = None   # (n_pad, e_pad, cap)

CAP_BUCKETS = [1024]
while CAP_BUCKETS[-1] < (1 << 21):
    CAP_BUCKETS.append(
        -(-int(CAP_BUCKETS[-1] * 1.35) // 512) * 512)


def cap_bucket(max_load: int) -> int:
    """Smallest capacity bucket covering ``max_load`` (coarse geometric
    grid so a dataset yields a handful of distinct compiled programs)."""
    import bisect
    idx = bisect.bisect_left(CAP_BUCKETS, max(max_load, 1))
    if idx < len(CAP_BUCKETS):
        return CAP_BUCKETS[idx]
    return -(-max_load // 512) * 512


class edge_capacity_override:
    """Context manager activating a per-batch scatter capacity while a
    step traces. No-op when ``cap`` is None."""

    def __init__(self, n_pad: int, e_pad: int, cap: int | None):
        self._value = None if cap is None else (n_pad, e_pad, int(cap))

    def __enter__(self):
        global _CAP_OVERRIDE
        self._saved = _CAP_OVERRIDE
        if self._value is not None:
            _CAP_OVERRIDE = self._value
        return self

    def __exit__(self, *exc):
        global _CAP_OVERRIDE
        _CAP_OVERRIDE = self._saved
        return False


def derive_max_eb(num_edges: int, num_segments: int,
                  window: int = WINDOW) -> int:
    """Static per-window edge capacity from padded shapes:
    ``POINTVS_EB_FACTOR`` (default 2) x the mean window load, at least
    1024, rounded UP to a multiple of 512 (the old power-of-two rounding
    wasted up to 2x — measured 10% of the whole train step.
    POINTVS_EB_ROUND=0 restores pow2). Under an active
    ``edge_capacity_override`` matching this scatter's shapes, the
    loader-measured per-batch capacity is used instead."""
    if _CAP_OVERRIDE is not None:
        ov_n, ov_e, ov_cap = _CAP_OVERRIDE
        if num_segments == ov_n and num_edges == ov_e:
            return min(max(ov_cap, 1024), _pow2ceil(num_edges))
    mean_load = window * num_edges / max(num_segments, 1)
    need = max(1024, int(_EB_FACTOR * mean_load))
    if _EB_ROUND >= 512:
        cap = -(-need // _EB_ROUND) * _EB_ROUND
        return min(cap, _pow2ceil(num_edges))
    cap = 1
    while cap < need:
        cap *= 2
    return min(cap, _pow2ceil(num_edges))


def _pow2ceil(x: int) -> int:
    c = 1
    while c < x:
        c *= 2
    return c


def _window_starts(sorted_ids: jnp.ndarray, num_segments: int,
                   window: int) -> jnp.ndarray:
    nb = -(-num_segments // window)
    return jnp.searchsorted(
        sorted_ids, jnp.arange(nb, dtype=sorted_ids.dtype) * window)


def _wss_impl(data: jnp.ndarray, sorted_ids: jnp.ndarray,
              num_segments: int, window: int, max_eb: int) -> jnp.ndarray:
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    # Feature dim must respect the f32 sublane tile (8) for the kernel's
    # feature-major DMA; narrow data (coords [E,3], counts [E,1]) takes
    # the XLA path.
    # VMEM ceiling: the kernel's per-window footprint is dominated by the
    # [W, max_eb] one-hot/iota temporaries (~1KB/edge) plus the data
    # scratch; the kernel requests a 100M scoped-vmem limit, so gate at
    # 80M. Ultra-dense graphs (capacity == whole edge array) stay on XLA.
    vmem_ok = max_eb * (1024 + 4 * data.shape[1] + 64) < 80 * 1024 * 1024
    if _use_pallas() and data.shape[0] >= 4 * window \
            and data.dtype == jnp.float32 and data.shape[1] % 8 == 0 \
            and vmem_ok:
        from pointvs_tpu.ops.pallas.segment_kernels import \
            pallas_windowed_segment_sum

        # Pallas TPU does not auto-batch ANY-space refs: under vmap
        # (attribution's chunked masked forwards) the batch rule runs the
        # vectorised XLA formulation instead.
        @jax.custom_batching.custom_vmap
        def _run(d, ids):
            return pallas_windowed_segment_sum(
                d, ids, num_segments, window, max_eb)

        @_run.def_vmap
        def _run_vmap(axis_size, in_batched, d, ids):
            d_b, ids_b = in_batched
            fn = lambda dd, ii: _xla_windowed_impl(
                dd, ii, num_segments, window, max_eb)
            out = jax.vmap(
                fn,
                in_axes=(0 if d_b else None, 0 if ids_b else None))(d, ids)
            return out, True

        out = _run(data, sorted_ids)
        return out[:, 0] if squeeze else out
    out = _xla_windowed_impl(data, sorted_ids, num_segments, window, max_eb)
    return out[:, 0] if squeeze else out


def _xla_windowed_impl(data, sorted_ids, num_segments, window, max_eb):
    e, k = data.shape
    nb = -(-num_segments // window)
    starts = _window_starts(sorted_ids, num_segments, window)
    # Pad so dynamic_slice never clamps (clamping would misalign ids/data).
    data_p = jnp.concatenate(
        [data, jnp.zeros((max_eb, k), data.dtype)])
    ids_p = jnp.concatenate(
        [sorted_ids,
         jnp.full((max_eb,), num_segments, sorted_ids.dtype)])

    local_iota = jnp.arange(window, dtype=sorted_ids.dtype)

    def one_window(j, start):
        # Literal 0 must match start's dtype: under x64 it would trace
        # as int64 and lax.dynamic_slice rejects mixed index dtypes.
        d = jax.lax.dynamic_slice(
            data_p, (start, jnp.asarray(0, start.dtype)), (max_eb, k))
        ids = jax.lax.dynamic_slice(ids_p, (start,), (max_eb,))
        local = ids - j * window
        onehot = (local[:, None] == local_iota[None, :]).astype(data.dtype)
        return jnp.matmul(onehot.T, d, precision=_PRECISION)

    out = jax.vmap(one_window)(
        jnp.arange(nb, dtype=sorted_ids.dtype), starts)
    return out.reshape(nb * window, k)[:num_segments]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def windowed_segment_sum(data, sorted_ids, num_segments: int,
                         window: int = WINDOW,
                         max_eb: int | None = None):
    """segment_sum(data, sorted_ids) for ids sorted ascending; padding rows
    must carry id == num_segments (they are dropped)."""
    if max_eb is None:
        max_eb = derive_max_eb(data.shape[0], num_segments, window)
    return _wss_impl(data, sorted_ids, num_segments, window, max_eb)


def _wss_fwd(data, sorted_ids, num_segments, window, max_eb):
    if max_eb is None:
        max_eb = derive_max_eb(data.shape[0], num_segments, window)
    return _wss_impl(data, sorted_ids, num_segments, window, max_eb), \
        sorted_ids


def _wss_bwd(num_segments, window, max_eb, sorted_ids, g):
    # d(data)[e] = g[ids[e]]; out-of-range (padding) ids contribute 0.
    clamped = jnp.minimum(sorted_ids, num_segments - 1)
    valid = (sorted_ids < num_segments)
    if g.ndim == 1:
        d_data = g[clamped] * valid.astype(g.dtype)
    else:
        d_data = g[clamped] * valid[:, None].astype(g.dtype)
    return d_data, None


windowed_segment_sum.defvjp(_wss_fwd, _wss_bwd)


def windowed_segment_max(values: jnp.ndarray, sorted_ids: jnp.ndarray,
                         num_segments: int, window: int = WINDOW,
                         max_eb: int | None = None,
                         initial: float = -1e30) -> jnp.ndarray:
    """Per-segment max of a [E] vector (no gradient — used only for the
    numerically stabilising shift inside segment softmax)."""
    if max_eb is None:
        max_eb = derive_max_eb(values.shape[0], num_segments, window)
    values = jax.lax.stop_gradient(values)
    nb = -(-num_segments // window)
    starts = _window_starts(sorted_ids, num_segments, window)
    vals_p = jnp.concatenate(
        [values, jnp.full((max_eb,), initial, values.dtype)])
    ids_p = jnp.concatenate(
        [sorted_ids, jnp.full((max_eb,), num_segments, sorted_ids.dtype)])
    local_iota = jnp.arange(window, dtype=sorted_ids.dtype)

    def one_window(j, start):
        v = jax.lax.dynamic_slice(vals_p, (start,), (max_eb,))
        ids = jax.lax.dynamic_slice(ids_p, (start,), (max_eb,))
        local = ids - j * window
        hit = local[:, None] == local_iota[None, :]
        return jnp.max(jnp.where(hit, v[:, None], initial), axis=0)

    out = jax.vmap(one_window)(
        jnp.arange(nb, dtype=sorted_ids.dtype), starts)
    return out.reshape(nb * window)[:num_segments]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_by_sorted_ids(node_values, sorted_ids, num_segments: int):
    """node_values[ids] whose backward is the windowed (MXU) scatter
    rather than XLA's serialized transpose-of-gather."""
    clamped = jnp.minimum(sorted_ids, num_segments - 1)
    valid = sorted_ids < num_segments
    out = node_values[clamped]
    return out * (valid[:, None] if out.ndim > 1 else valid).astype(
        out.dtype)


def _gsi_fwd(node_values, sorted_ids, num_segments):
    return gather_by_sorted_ids(node_values, sorted_ids, num_segments), \
        sorted_ids


def _gsi_bwd(num_segments, sorted_ids, g):
    return windowed_segment_sum(g, sorted_ids, num_segments), None


gather_by_sorted_ids.defvjp(_gsi_fwd, _gsi_bwd)


def dense_graph_segment_sum(node_values: jnp.ndarray, graph_id: jnp.ndarray,
                            num_graphs: int,
                            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-graph sums as a dense one-hot matmul — num_graphs is small
    (batch size), so [N, B] one-hot x [N, K] is an MXU-sized product with
    a fast (matmul) transpose under grad."""
    squeeze = node_values.ndim == 1
    if squeeze:
        node_values = node_values[:, None]
    onehot = (graph_id[:, None] ==
              jnp.arange(num_graphs, dtype=graph_id.dtype)[None, :]
              ).astype(node_values.dtype)
    if mask is not None:
        onehot = onehot * mask[:, None]
    out = jnp.matmul(onehot.T, node_values, precision=_PRECISION)
    return out[:, 0] if squeeze else out
