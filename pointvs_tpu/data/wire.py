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
    graph_id: np.ndarray        # [N] uint16 (padding rows = B)
    senders: np.ndarray         # [E] uint16 or int32
    receivers: np.ndarray       # [E] uint16 or int32
    edge_class: np.ndarray      # [E] uint8 (3 = padding)
    y: np.ndarray               # [B] / [B,3] float32
    graph_mask: np.ndarray      # [B] float32
    strain: np.ndarray          # [B, 2] float32


def compress(batch: GraphBatch) -> WireBatch:
    """Host-side: GraphBatch (optionally with leading device axis) ->
    WireBatch. recv_perm is NOT transferred: a stable on-device argsort
    of the receivers rebuilds it for ~free, while its int32 bytes were
    ~30% of the packed batch on the 13-31 MB/s tunnel."""
    n_pad = batch.node_feats.shape[-2]
    idx_t = np.uint16 if n_pad < 65536 else np.int32
    edge_class = np.argmax(batch.edge_attr, axis=-1).astype(np.uint8)
    edge_class = np.where(np.asarray(batch.edge_mask) > 0, edge_class,
                          np.uint8(3))
    feats = np.asarray(batch.node_feats)
    if feats.max(initial=0) > 1 or feats.min(initial=0) < 0:
        raise ValueError('wire bit-packing assumes 0/1 node features '
                         '(one-hot + entity bit); got values outside '
                         '[0, 1]')
    # [.., N, F] -> [.., F, N] -> bit-pack the node axis (N % 8 == 0:
    # node buckets are multiples of 128).
    bits = np.packbits(feats.astype(np.uint8).swapaxes(-1, -2),
                       axis=-1, bitorder='little')
    return WireBatch(
        node_feats_bits=bits,
        coords=np.asarray(batch.coords, np.float32),
        graph_id=np.minimum(np.asarray(batch.graph_id), 65535
                            ).astype(np.uint16),
        senders=np.asarray(batch.senders).astype(idx_t),
        receivers=np.asarray(batch.receivers).astype(idx_t),
        edge_class=edge_class,
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


def stacked_template(wire: WireBatch) -> WireBatch:
    """Per-device shape/dtype template of a [D, ...]-stacked WireBatch."""
    import jax
    return WireBatch(*[jax.ShapeDtypeStruct(a.shape[1:], a.dtype)
                       for a in wire])


def unpack(buf, template: WireBatch) -> WireBatch:
    """Device-side (jit-traceable): uint8 buffer -> WireBatch, using a
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
    return WireBatch(*fields)


def wire_template(wire: WireBatch) -> WireBatch:
    """Shape/dtype template for unpack (host metadata, not transferred)."""
    import jax
    return WireBatch(*[jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in wire])


def decompress(wire: WireBatch) -> GraphBatch:
    """Device-side (jit-traceable): WireBatch -> GraphBatch."""
    import jax.numpy as jnp
    n_pad = wire.coords.shape[-2]
    num_graphs = wire.graph_mask.shape[-1]
    # Unpack [.., F, N/8] little-endian bits -> [.., N, F] float32.
    b = wire.node_feats_bits
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (b[..., None] >> shifts) & jnp.uint8(1)
    node_feats = bits.reshape(b.shape[:-1] + (n_pad,)).swapaxes(
        -1, -2).astype(jnp.float32)
    senders = wire.senders.astype(jnp.int32)
    receivers = wire.receivers.astype(jnp.int32)
    edge_mask = (senders < n_pad).astype(jnp.float32)
    node_mask = (wire.graph_id < num_graphs).astype(jnp.float32)
    edge_attr = (wire.edge_class[..., None]
                 == jnp.arange(3, dtype=wire.edge_class.dtype)
                 ).astype(jnp.float32)
    # Stable argsort reproduces the collator's recv_perm exactly (padding
    # receivers == n_pad sort last); cheaper on-device than its int32
    # bytes were on the wire.
    recv_perm = jnp.argsort(receivers, stable=True).astype(jnp.int32)
    return GraphBatch(
        node_feats=node_feats,
        coords=wire.coords,
        node_mask=node_mask,
        graph_id=wire.graph_id.astype(jnp.int32),
        senders=senders,
        receivers=receivers,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        y=wire.y,
        graph_mask=wire.graph_mask,
        strain=wire.strain,
        recv_perm=recv_perm)
