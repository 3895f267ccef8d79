"""Compact wire format for host->device batch transfer.

The edge arrays dominate batch bytes (int32 indices + one-hot float
attrs). The wire form shrinks them ~3-4x with lossless dtype/encoding
tricks, and a trivial jitted decompression reconstructs the full
GraphBatch on device as the first op of every step:

- one-hot node features -> uint8
- one-hot edge classes -> uint8 class ids (one-hot rebuilt on device)
- senders/receivers -> uint16 when the node padding fits
- node_mask / edge_mask -> derived on device (graph_id < B, senders < N)
- recv_perm -> uint16/int32 by edge padding

On this container the host->device path is a ~13-31 MB/s network tunnel
(measured with D2H fencing), so this is worth ~3x on end-to-end epoch
time; on real hosts it still saves PCIe bytes and host memcpy.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from pointvs_tpu.data.buckets import GraphBatch


class WireBatch(NamedTuple):
    node_feats_bits: np.ndarray  # [F, N/8] uint8: features bit-packed
    #                              along the NODE axis (little-endian), so
    #                              F stays recoverable from static shape
    coords: np.ndarray          # [N, 3] float32
    graph_rle: np.ndarray       # [B+1] int32 nodes-per-graph counts
    #                              (padding slot last; decode is a
    #                              searchsorted over B+1 bounds), OR the
    #                              legacy [N] uint16 ids when graph_id is
    #                              not non-decreasing (decode dispatches
    #                              on the static shape)
    senders: np.ndarray         # [E] uint16 or int32
    receivers: np.ndarray       # [E] uint16 or int32
    edge_class: np.ndarray      # [E/4] uint8, 2 bits/edge (3 = padding),
    #                              OR legacy [E] uint8 when e_pad % 4
    y: np.ndarray               # [B] / [B,3] float32
    graph_mask: np.ndarray      # [B] float32
    strain: np.ndarray          # [B, 2] float32


class WireBatchV3(NamedTuple):
    """Symmetric-half wire format: for collator-verified symmetric edge
    lists (every (s, r) has its mirror), only the s < r half ships; the
    device reconstructs the full sender-sorted list with one stable
    argsort (~4.6 ms at 208k edges, D2H-fenced) against ~443 KB of wire
    bytes (~9-18 ms on the 24-47 MB/s tunnel). Eligibility is verified
    at compress time (mirror-at-same-rank + lexicographic order), which
    makes the decode BIT-EXACT vs the v1 pytree path: swapped-mirrors-
    first concatenation + stable sort reproduces the collator's
    (sender, receiver)-lexicographic edge order element for element.

    vs v1.1 on the e2e bench batch (18.4k nodes / 208.6k edges):
    1.16 MB -> 0.72 MB."""
    node_feats_bits: np.ndarray  # [F, N/8] uint8 (as v1)
    coords: np.ndarray          # [N, 3] float32
    graph_rle: np.ndarray       # [B+1] int32 (as v1.1; counts only —
    #                              v3 requires the collator invariants)
    half_senders: np.ndarray    # [E/2] uint16: s of the s < r half,
    #                              in full-list order; padding = n_pad
    half_receivers: np.ndarray  # [E/2] uint16
    edge_class: np.ndarray      # [E/8] uint8, 2 bits per HALF edge
    y: np.ndarray               # [B] / [B,3] float32
    graph_mask: np.ndarray      # [B] float32
    strain: np.ndarray          # [B, 2] float32


class WireBatchV2(NamedTuple):
    """Second-generation wire format: the edge index arrays (the dominant
    bytes) ship as per-node out-degree counts + per-edge receiver deltas.

    Decode relies on collator invariants (data/buckets.py): senders are
    sorted ascending with padding (== n_pad) last, graph_id is
    non-decreasing, and receiver/sender of every edge are in the same
    graph. ``compress`` verifies them and falls back to WireBatch v1
    otherwise.

    vs v1 on the bench batch (14.3k nodes / 156k edges): 1.11 MB -> 0.60
    MB; on a 256-graph screening batch (>64k nodes, int32 indices in v1):
    13.1 MB -> 4.7 MB.
    """
    node_feats_bits: np.ndarray  # [F, N/8] uint8 (as v1)
    coords: np.ndarray          # [N, 3] float32
    graph_counts: np.ndarray    # [B+1] int32 nodes per graph (+padding)
    degrees: np.ndarray         # [N] uint16 out-degree per node
    recv_delta: np.ndarray      # [E] int16 (receiver - sender)
    edge_class_bits: np.ndarray  # [E/4] uint8, 2 bits/edge (3 = padding)
    y: np.ndarray               # [B] / [B,3] float32
    graph_mask: np.ndarray      # [B] float32
    strain: np.ndarray          # [B, 2] float32


def _pack_feature_bits(node_feats) -> np.ndarray:
    feats = np.asarray(node_feats)
    if feats.max(initial=0) > 1 or feats.min(initial=0) < 0:
        raise ValueError('wire bit-packing assumes 0/1 node features '
                         '(one-hot + entity bit); got values outside '
                         '[0, 1]')
    # [.., N, F] -> [.., F, N] -> bit-pack the node axis (N % 8 == 0:
    # node buckets are multiples of 128).
    return np.packbits(feats.astype(np.uint8).swapaxes(-1, -2),
                       axis=-1, bitorder='little')


def _edge_class(batch: GraphBatch) -> np.ndarray:
    edge_class = np.argmax(batch.edge_attr, axis=-1).astype(np.uint8)
    return np.where(np.asarray(batch.edge_mask) > 0, edge_class,
                    np.uint8(3))


def _pack_edge_class_bits(ec: np.ndarray) -> np.ndarray:
    """[.., E] uint8 class ids (values 0-3) -> [.., E/4] uint8, 2 bits
    per edge."""
    e4 = ec.reshape(ec.shape[:-1] + (ec.shape[-1] // 4, 4))
    return (e4[..., 0] | (e4[..., 1] << 2) | (e4[..., 2] << 4)
            | (e4[..., 3] << 6))


def _graph_node_counts(batch: GraphBatch):
    """[.., B+1] int32 nodes-per-graph counts (padding slot last), or
    None when the collator invariant (non-decreasing graph_id) does not
    hold or the counts shape would collide with the legacy ids shape."""
    graph_id = np.asarray(batch.graph_id, np.int64)
    n_pad = graph_id.shape[-1]
    num_graphs = batch.graph_mask.shape[-1]
    if not np.all(graph_id[..., 1:] >= graph_id[..., :-1]):
        return None
    g2 = graph_id.reshape(-1, n_pad)
    counts = np.empty((g2.shape[0], num_graphs + 1), np.int32)
    for d in range(g2.shape[0]):
        counts[d] = np.bincount(np.minimum(g2[d], num_graphs),
                                minlength=num_graphs + 1)
    return counts.reshape(graph_id.shape[:-1] + (num_graphs + 1,))


def _try_compress_v2(batch: GraphBatch):
    """WireBatchV2 if the collator invariants hold, else None."""
    n_pad = batch.node_feats.shape[-2]
    e_pad = batch.senders.shape[-1]
    num_graphs = batch.graph_mask.shape[-1]
    if n_pad % 8 or e_pad % 4:
        return None
    senders = np.asarray(batch.senders, np.int64)
    receivers = np.asarray(batch.receivers, np.int64)
    graph_id = np.asarray(batch.graph_id, np.int64)
    if not (np.all(senders[..., 1:] >= senders[..., :-1])
            and np.all(graph_id[..., 1:] >= graph_id[..., :-1])):
        return None
    delta = receivers - senders
    if delta.size and max(-delta.min(initial=0),
                          delta.max(initial=0)) > 32767:
        return None

    lead = senders.shape[:-1]
    s2 = senders.reshape(-1, e_pad)
    g2 = graph_id.reshape(-1, n_pad)
    degrees = np.empty((s2.shape[0], n_pad), np.uint16)
    graph_counts = np.empty((g2.shape[0], num_graphs + 1), np.int32)
    for d in range(s2.shape[0]):
        deg = np.bincount(s2[d], minlength=n_pad + 1)[:n_pad]
        if deg.max(initial=0) > 65535:
            return None
        degrees[d] = deg
        graph_counts[d] = np.bincount(
            np.minimum(g2[d], num_graphs), minlength=num_graphs + 1)

    ec = _edge_class(batch).reshape(-1, e_pad // 4, 4).astype(np.uint8)
    ec_bits = (ec[..., 0] | (ec[..., 1] << 2) | (ec[..., 2] << 4)
               | (ec[..., 3] << 6))
    return WireBatchV2(
        node_feats_bits=_pack_feature_bits(batch.node_feats),
        coords=np.asarray(batch.coords, np.float32),
        graph_counts=graph_counts.reshape(lead + (num_graphs + 1,)),
        degrees=degrees.reshape(lead + (n_pad,)),
        recv_delta=delta.astype(np.int16),
        edge_class_bits=ec_bits.reshape(lead + (e_pad // 4,)),
        y=np.asarray(batch.y, np.float32),
        graph_mask=np.asarray(batch.graph_mask, np.float32),
        strain=np.asarray(batch.strain, np.float32))


def _try_compress_v3(batch: GraphBatch):
    """WireBatchV3 when the symmetric-half invariants hold, else None.

    Preconditions (all verified here; O(E) numpy):
    - collator-flagged symmetric (``inv_recv_perm`` present);
    - uint16 indices fit (n_pad < 65536) and e_pad % 8 == 0;
    - mirror-at-same-rank: ``senders[recv_perm] == receivers`` — with
      the collator's ``receivers[recv_perm] == senders`` this proves
      every edge's mirror exists at the matching rank;
    - (sender, receiver)-lexicographic edge order, so the device-side
      swapped-first stable sort reproduces the exact collator order;
    - counts-encodable graph_id (non-decreasing).
    """
    if getattr(batch, 'inv_recv_perm', None) is None:
        return None
    n_pad = batch.node_feats.shape[-2]
    e_pad = batch.senders.shape[-1]
    if n_pad >= 65536 or e_pad % 8 or e_pad == 0:
        return None
    counts = _graph_node_counts(batch)
    if counts is None:
        return None
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    rp = np.asarray(batch.recv_perm)
    ec = _edge_class(batch)
    lead = s.shape[:-1]
    s2 = s.reshape(-1, e_pad)
    r2 = r.reshape(-1, e_pad)
    rp2 = rp.reshape(-1, e_pad)
    ec2 = ec.reshape(-1, e_pad)
    half = e_pad // 2
    d_rows = s2.shape[0]
    hs = np.empty((d_rows, half), np.uint16)
    hr = np.empty((d_rows, half), np.uint16)
    hb = np.empty((d_rows, half // 4), np.uint8)
    from pointvs_tpu.native.build import native_symhalf
    for d in range(d_rows):
        out = native_symhalf(s2[d], r2[d], rp2[d], ec2[d], n_pad)
        if out is None:   # no native lib OR ineligible: numpy re-check
            out = _symhalf_numpy(s2[d], r2[d], rp2[d], ec2[d], n_pad)
        if out is None:
            return None
        hs[d], hr[d], hb[d] = out
    return WireBatchV3(
        node_feats_bits=_pack_feature_bits(batch.node_feats),
        coords=np.asarray(batch.coords, np.float32),
        graph_rle=counts,
        half_senders=hs.reshape(lead + (half,)),
        half_receivers=hr.reshape(lead + (half,)),
        edge_class=hb.reshape(lead + (half // 4,)),
        y=np.asarray(batch.y, np.float32),
        graph_mask=np.asarray(batch.graph_mask, np.float32),
        strain=np.asarray(batch.strain, np.float32))


def _symhalf_numpy(s, r, rp, ec, n_pad: int):
    """Numpy fallback for pvs_symhalf (one device row): verify the v3
    invariants and extract the s < r half; None when ineligible."""
    e_pad = len(s)
    half = e_pad // 2
    s64 = s.astype(np.int64, copy=False)
    r64 = r.astype(np.int64, copy=False)
    if not np.array_equal(s[rp], r):
        return None
    if not np.all((s64[1:] > s64[:-1])
                  | ((s64[1:] == s64[:-1]) & (r64[1:] >= r64[:-1]))):
        return None
    up = s64 < r64
    n_up = int(up.sum())
    pad_rows = int((s64 == n_pad).sum())
    if 2 * n_up + pad_rows != e_pad or n_up > half:
        return None
    hs = np.full(half, n_pad, np.uint16)
    hr = np.full(half, n_pad, np.uint16)
    hc = np.full(half, np.uint8(3), np.uint8)
    hs[:n_up] = s[up]
    hr[:n_up] = r[up]
    hc[:n_up] = ec[up]
    return hs, hr, _pack_edge_class_bits(hc)


def compress(batch: GraphBatch, prefer_v2: bool = None):
    """Host-side: GraphBatch (optionally with leading device axis) ->
    WireBatch (or V2). recv_perm is NOT transferred: a stable on-device
    argsort of the receivers rebuilds it for ~free, while its int32
    bytes were ~30% of the packed v1 batch on the 13-31 MB/s tunnel.

    Format choice (D2H-fenced A/B at the e2e bench bucket, 21k nodes /
    230k edges): v2's searchsorted run-length decode costs ~21 ms/step
    on device — 13x its ~0.5 MB byte saving once H2D overlaps compute
    in the loader's producer thread — so v1 is the default. v2 wins only
    where v1's indices go int32 (n_pad >= 65536: a 256-graph screening
    batch ships 4.7 vs 13.1 MB), which is the auto cutover."""
    n_pad_auto = batch.node_feats.shape[-2]
    if prefer_v2 is None:
        prefer_v2 = n_pad_auto >= 65536
    v2 = _try_compress_v2(batch) if prefer_v2 else None
    if v2 is not None:
        return v2
    import os
    if os.environ.get('POINTVS_WIRE_V3', '1') == '1':
        v3 = _try_compress_v3(batch)
        if v3 is not None:
            return v3
    n_pad = batch.node_feats.shape[-2]
    e_pad = batch.senders.shape[-1]
    idx_t = np.uint16 if n_pad < 65536 else np.int32
    counts = _graph_node_counts(batch)
    if counts is None:   # legacy ids fallback
        counts = np.minimum(np.asarray(batch.graph_id), 65535
                            ).astype(np.uint16)
    ec = _edge_class(batch)
    if e_pad % 4 == 0 and e_pad // 4 != e_pad:
        ec = _pack_edge_class_bits(ec)
    return WireBatch(
        node_feats_bits=_pack_feature_bits(batch.node_feats),
        coords=np.asarray(batch.coords, np.float32),
        graph_rle=counts,
        senders=np.asarray(batch.senders).astype(idx_t),
        receivers=np.asarray(batch.receivers).astype(idx_t),
        edge_class=ec,
        y=np.asarray(batch.y, np.float32),
        graph_mask=np.asarray(batch.graph_mask, np.float32),
        strain=np.asarray(batch.strain, np.float32))


def pack(wire: WireBatch) -> np.ndarray:
    """WireBatch -> one contiguous uint8 buffer (one H2D transfer instead
    of eleven — each transfer pays a fixed round trip on tunneled
    backends). Layout is positional: each field's raw bytes in
    WireBatch field order."""
    parts = [np.ascontiguousarray(a).view(np.uint8).reshape(-1)
             for a in wire]
    return np.concatenate(parts)


def pack_stacked(wire: WireBatch) -> np.ndarray:
    """Per-device packing of a [D, ...]-stacked WireBatch -> [D, nbytes]."""
    parts = [np.ascontiguousarray(a).view(np.uint8).reshape(a.shape[0], -1)
             for a in wire]
    return np.concatenate(parts, axis=1)


def stacked_template(wire):
    """Per-device shape/dtype template of a [D, ...]-stacked WireBatch."""
    import jax
    return type(wire)(*[jax.ShapeDtypeStruct(a.shape[1:], a.dtype)
                        for a in wire])


def unpack(buf, template):
    """Device-side (jit-traceable): uint8 buffer -> WireBatch/V2, using a
    host-side template (numpy arrays or ShapeDtypeStructs) for the static
    shapes/dtypes."""
    import jax.lax
    import jax.numpy as jnp
    fields = []
    offset = 0
    for arr in template:
        nbytes = int(np.prod(arr.shape)) * np.dtype(arr.dtype).itemsize
        chunk = jax.lax.dynamic_slice_in_dim(buf, offset, nbytes)
        fields.append(jax.lax.bitcast_convert_type(
            chunk.reshape(-1, np.dtype(arr.dtype).itemsize),
            jnp.dtype(arr.dtype)).reshape(arr.shape))
        offset += nbytes
    return type(template)(*fields)


def wire_template(wire):
    """Shape/dtype template for unpack (host metadata, not transferred)."""
    import jax
    return type(wire)(*[jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in wire])


def _unpack_feature_bits(bits, n_pad):
    """[.., F, N/8] little-endian bits -> [.., N, F] float32."""
    import jax.numpy as jnp
    shifts = jnp.arange(8, dtype=jnp.uint8)
    b = (bits[..., None] >> shifts) & jnp.uint8(1)
    return b.reshape(bits.shape[:-1] + (n_pad,)).swapaxes(
        -1, -2).astype(jnp.float32)


def _ids_from_counts(counts, total: int):
    """Expand run-length counts into the (sorted) id array they encode:
    ids[i] = index of the first cumulative bound > i. No scatters (XLA
    scatter serialises on TPU); searchsorted is a vectorised binary
    search."""
    import jax.numpy as jnp
    bounds = jnp.cumsum(counts.astype(jnp.int32))
    return jnp.searchsorted(
        bounds, jnp.arange(total, dtype=jnp.int32), side='right'
    ).astype(jnp.int32)


def _decompress_v2(wire: WireBatchV2, symmetric: bool = False) -> GraphBatch:
    """Device-side (jit-traceable, per-device arrays): V2 -> GraphBatch."""
    import jax.numpy as jnp
    n_pad = wire.coords.shape[-2]
    e_pad = wire.recv_delta.shape[-1]
    num_graphs = wire.graph_mask.shape[-1]
    node_feats = _unpack_feature_bits(wire.node_feats_bits, n_pad)
    graph_id = _ids_from_counts(wire.graph_counts, n_pad)
    # Out-degrees of the n_pad real node slots; the remainder (e_pad -
    # sum) are padding edges whose searchsorted index lands at n_pad.
    senders = _ids_from_counts(wire.degrees, e_pad)
    receivers = senders + wire.recv_delta.astype(jnp.int32)
    edge_mask = (senders < n_pad).astype(jnp.float32)
    node_mask = (graph_id < num_graphs).astype(jnp.float32)
    shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    ec = ((wire.edge_class_bits[..., None] >> shifts) & jnp.uint8(3)
          ).reshape(wire.edge_class_bits.shape[:-1] + (e_pad,))
    edge_attr = (ec[..., None] == jnp.arange(3, dtype=ec.dtype)
                 ).astype(jnp.float32)
    recv_perm = jnp.argsort(receivers, stable=True).astype(jnp.int32)
    return GraphBatch(
        node_feats=node_feats,
        coords=wire.coords,
        node_mask=node_mask,
        graph_id=graph_id,
        senders=senders,
        receivers=receivers,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        y=wire.y,
        graph_mask=wire.graph_mask,
        strain=wire.strain,
        recv_perm=recv_perm,
        inv_recv_perm=_maybe_inv(recv_perm, symmetric))


def _maybe_inv(recv_perm, symmetric: bool):
    """inv_recv_perm from the on-device recv_perm. ``symmetric`` is a
    STATIC host-verified fact (the collator's
    receivers[recv_perm] == senders check survives the wire as the 4th
    element of the ('packed', buf, template, symmetric) tuple) — the
    model branches on inv_recv_perm-is-None at trace time, so it cannot
    be a traced value. argsort of a permutation is its inverse."""
    import jax.numpy as jnp
    if not symmetric:
        return None
    return jnp.argsort(recv_perm).astype(jnp.int32)


def _unpack_edge_class_bits(bits, e: int):
    """[.., E/4] uint8 -> [.., E] uint8 class ids (2-bit little-endian)."""
    import jax.numpy as jnp
    shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    return ((bits[..., None] >> shifts) & jnp.uint8(3)
            ).reshape(bits.shape[:-1] + (e,))


def _decompress_v3(wire: WireBatchV3, symmetric: bool = True) -> GraphBatch:
    """Device-side (jit-traceable, per-device arrays): V3 -> GraphBatch.

    Mirrors-first concatenation + ONE stable argsort reproduces the
    collator's (sender, receiver)-lexicographic order exactly (verified
    host-side by _try_compress_v3), so this path is bit-identical to
    the v1 decode. Padding half-slots (ids == n_pad) duplicate into the
    two padding edges they encode and sort last."""
    import jax.numpy as jnp
    n_pad = wire.coords.shape[-2]
    half = wire.half_senders.shape[-1]
    e_pad = 2 * half
    num_graphs = wire.graph_mask.shape[-1]
    node_feats = _unpack_feature_bits(wire.node_feats_bits, n_pad)
    graph_id = _ids_from_counts(wire.graph_rle, n_pad)
    hs = wire.half_senders.astype(jnp.int32)
    hr = wire.half_receivers.astype(jnp.int32)
    all_s = jnp.concatenate([hr, hs])   # mirrors first: receivers < s
    all_r = jnp.concatenate([hs, hr])
    perm = jnp.argsort(all_s, stable=True)
    senders = all_s[perm]
    receivers = all_r[perm]
    hc = _unpack_edge_class_bits(wire.edge_class, half)
    ec = jnp.concatenate([hc, hc])[perm]
    edge_mask = (senders < n_pad).astype(jnp.float32)
    node_mask = (graph_id < num_graphs).astype(jnp.float32)
    edge_attr = (ec[..., None] == jnp.arange(3, dtype=ec.dtype)
                 ).astype(jnp.float32)
    recv_perm = jnp.argsort(receivers, stable=True).astype(jnp.int32)
    # _try_compress_v3 verified receivers[recv_perm] == senders AND
    # senders[recv_perm] == receivers: recv_perm maps every edge to its
    # mirror, i.e. it is an INVOLUTION — its inverse is itself, saving
    # the argsort _maybe_inv would spend (~2.3 ms at 208k edges).
    return GraphBatch(
        node_feats=node_feats,
        coords=wire.coords,
        node_mask=node_mask,
        graph_id=graph_id,
        senders=senders,
        receivers=receivers,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        y=wire.y,
        graph_mask=wire.graph_mask,
        strain=wire.strain,
        recv_perm=recv_perm,
        inv_recv_perm=recv_perm)


def decompress(wire, symmetric: bool = False) -> GraphBatch:
    """Device-side (jit-traceable): WireBatch/V2/V3 -> GraphBatch."""
    import jax.numpy as jnp
    if isinstance(wire, WireBatchV3):
        return _decompress_v3(wire, symmetric)
    if isinstance(wire, WireBatchV2):
        return _decompress_v2(wire, symmetric)
    n_pad = wire.coords.shape[-2]
    e_pad = wire.senders.shape[-1]
    num_graphs = wire.graph_mask.shape[-1]
    node_feats = _unpack_feature_bits(wire.node_feats_bits, n_pad)
    senders = wire.senders.astype(jnp.int32)
    receivers = wire.receivers.astype(jnp.int32)
    edge_mask = (senders < n_pad).astype(jnp.float32)
    if wire.graph_rle.dtype == jnp.int32:            # [B+1] counts
        graph_id = _ids_from_counts(wire.graph_rle, n_pad)
    else:                                            # legacy [N] uint16 ids
        graph_id = wire.graph_rle.astype(jnp.int32)
    node_mask = (graph_id < num_graphs).astype(jnp.float32)
    if wire.edge_class.shape[-1] == e_pad:           # legacy [E] ids
        ec = wire.edge_class
    else:                                            # 2-bit packed [E/4]
        shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
        ec = ((wire.edge_class[..., None] >> shifts) & jnp.uint8(3)
              ).reshape(wire.edge_class.shape[:-1] + (e_pad,))
    edge_attr = (ec[..., None] == jnp.arange(3, dtype=ec.dtype)
                 ).astype(jnp.float32)
    # Stable argsort reproduces the collator's recv_perm exactly (padding
    # receivers == n_pad sort last); cheaper on-device than its int32
    # bytes were on the wire.
    recv_perm = jnp.argsort(receivers, stable=True).astype(jnp.int32)
    return GraphBatch(
        node_feats=node_feats,
        coords=wire.coords,
        node_mask=node_mask,
        graph_id=graph_id.astype(jnp.int32),
        senders=senders,
        receivers=receivers,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        y=wire.y,
        graph_mask=wire.graph_mask,
        strain=wire.strain,
        recv_perm=recv_perm,
        inv_recv_perm=_maybe_inv(recv_perm, symmetric))
