"""Device-resident dataset: collate batches ON the TPU from item ids.

The round-3 e2e decomposition (DEVELOPMENT.md) showed the end-to-end
training floor on tunneled hosts is ``wire_time + step_time`` — H2D
transfers serialise with device compute, so every wire byte is on the
critical path even with the producer-thread overlap. This module removes
the per-step wire entirely for datasets that fit in HBM:

- the whole featurised dataset ships ONCE as a handful of concatenated
  arrays (features, coords, item-local edges, per-item offsets);
- each training step then ships only the sampled item ids (~128 B) and
  the jitted step builds the exact ``GraphBatch`` the host collator
  would have built, via searchsorted + gathers — no argsorts: the
  cached per-item receiver permutations concatenate blockwise, exactly
  as ``buckets.pad_graphs_to_batch`` exploits on the host;
- the per-epoch whole-complex random rotation (dataset.py ``rot``)
  moves on-device: one [B, 3, 3] quaternion-sampled rotation per graph
  applied as ``x @ M`` (the reference's rotation semantics,
  preprocessing.py:70-78) inside the train step.

Collation parity is exact: for ``rot=False`` the device-built batch is
bit-identical to ``pad_graphs_to_batch`` (tests/test_device_dataset.py).

Eligibility (``store_eligibility``): graph layout, single process, no
augmented actives (they re-rotate the raw ligand *before* boxing, so
their graphs genuinely change every epoch), no label noise / entity
dropout (per-epoch host randomness), and the store must fit the HBM
budget. Everything else falls back to the streaming wire path.

Reference anchor: this subsystem replaces the reference's host-side
torch DataLoader + pyg collation hot loop (ref
point_vs/preprocessing/data_loaders.py:481-520) for the common case
where the dataset fits in device memory.
"""
from __future__ import annotations

import time
from typing import List, NamedTuple, Optional

import numpy as np

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.logging import get_logger

LOG = get_logger('PointVS-TPU')


class DeviceCollateSpec(NamedTuple):
    """Static (trace-key) parameters of one device-collated batch."""
    n_pad: int
    e_pad: int
    num_graphs: int       # graph slots per device row
    symmetric: bool       # every item passed the mirror-involution check
    rotate: bool          # apply per-graph random rotation (train + rot)


class DeviceStoreArrays(NamedTuple):
    """The replicated device pytree. Edge indices are ITEM-LOCAL (the
    collate adds batch offsets); dtypes are the smallest lossless ones
    so the one-time upload stays cheap on slow H2D paths."""
    feats: np.ndarray       # [N_tot, F] uint8 (0/1 bits) or float32
    coords: np.ndarray      # [N_tot, 3] float32
    senders: np.ndarray     # [E_tot] uint16/int32, item-local node ids
    receivers: np.ndarray   # [E_tot] uint16/int32
    rperm: np.ndarray       # [E_tot] uint16/int32, item-local edge ranks
    eclass: np.ndarray      # [E_tot] uint8 edge class (0-2)
    node_start: np.ndarray  # [n_items+1] int32
    edge_start: np.ndarray  # [n_items+1] int32
    y: np.ndarray           # [n_items] or [n_items, 3] float32
    strain: np.ndarray      # [n_items, 2] float32


class HostStore(NamedTuple):
    """Host-side metadata kept alongside the device arrays."""
    arrays: DeviceStoreArrays     # numpy originals (pre-upload)
    num_nodes: np.ndarray         # [n_items] int64
    num_edges: np.ndarray         # [n_items] int64
    sorted_recv: np.ndarray       # [E_tot] receivers[rperm] per item
    #                               (item-local, ascending) for cap calc;
    #                               senders are already sorted per item
    lig_fnames: List[str]
    rec_fnames: List[str]
    symmetric: bool
    rot: bool                     # the dataset wanted per-epoch rotation
    nbytes: int                   # upload size estimate


def store_eligibility(dataset) -> Optional[str]:
    """None when ``dataset`` can be device-resident, else the reason."""
    if getattr(dataset, 'p_remove_entity', 0) and dataset.p_remove_entity > 0:
        return 'p_remove_entity resamples graphs every epoch'
    if getattr(dataset, 'p_noise', -1) and getattr(dataset, 'p_noise', -1) > 0:
        return 'p_noise flips labels every epoch'
    pre_aug = getattr(dataset, 'pre_aug_ds_len', len(dataset))
    if pre_aug != len(dataset):
        return ('augmented actives re-rotate the raw ligand before '
                'boxing, so their graphs change every epoch')
    return None


def _idx_dtype(max_value: int):
    return np.uint16 if max_value < 65536 else np.int32


def build_host_store(dataset) -> HostStore:
    """One featurisation pass over ``dataset`` -> concatenated arrays.

    Runs with the dataset's per-epoch rotation DISABLED so the stored
    coordinates are the deterministic boxed-pocket frame; the rotation
    (if requested) is re-applied on device each step."""
    reason = store_eligibility(dataset)
    if reason is not None:
        raise ValueError(f'dataset not device-residable: {reason}')
    had_rot = bool(getattr(dataset, 'rot', False))
    rot = had_rot
    if rot:
        # Only datasets whose own __getitem__ applies the per-epoch
        # rotation get it re-applied on device. Subclasses that override
        # __getitem__ and ignore ``rot`` (e.g. SynthPharmDataset) must
        # not gain a rotation the host path never performed.
        from pointvs_tpu.data.dataset import PointCloudDataset
        rot = type(dataset).__getitem__ is PointCloudDataset.__getitem__
    if had_rot:
        dataset.rot = False
    t0 = time.perf_counter()
    try:
        samples = [dataset[i] for i in range(len(dataset))]
    finally:
        if had_rot:
            dataset.rot = True
    if not samples:
        raise ValueError('empty dataset')

    n_items = len(samples)
    num_nodes = np.array([s.num_nodes for s in samples], np.int64)
    num_edges = np.array([s.num_edges for s in samples], np.int64)
    node_start = np.zeros(n_items + 1, np.int32)
    edge_start = np.zeros(n_items + 1, np.int32)
    np.cumsum(num_nodes, out=node_start[1:])
    np.cumsum(num_edges, out=edge_start[1:])
    n_tot, e_tot = int(node_start[-1]), int(edge_start[-1])

    feat_dim = samples[0].node_feats.shape[1]
    feats_f32 = np.concatenate([s.node_feats for s in samples]
                               ).astype(np.float32)
    # 0/1 feature matrices (the bit-vector featurisation) upload as
    # uint8 — 4x fewer one-time H2D bytes; anything else stays float32.
    if feats_f32.size and np.all((feats_f32 == 0) | (feats_f32 == 1)):
        feats = feats_f32.astype(np.uint8)
    else:
        feats = feats_f32
    coords = np.concatenate([s.coords for s in samples]).astype(np.float32)

    idx_t = _idx_dtype(int(num_nodes.max(initial=1)))
    ridx_t = _idx_dtype(int(num_edges.max(initial=1)))
    senders = np.empty(e_tot, idx_t)
    receivers = np.empty(e_tot, idx_t)
    rperm = np.empty(e_tot, ridx_t)
    eclass = np.empty(e_tot, np.uint8)
    sorted_recv = np.empty(e_tot, idx_t)
    symmetric = True
    for i, s in enumerate(samples):
        lo, hi = edge_start[i], edge_start[i + 1]
        if hi == lo:
            continue
        sl = np.asarray(s.senders)
        rl = np.asarray(s.receivers)
        rp = (np.asarray(s.recv_perm) if s.recv_perm is not None
              else np.argsort(rl, kind='stable'))
        senders[lo:hi] = sl
        receivers[lo:hi] = rl
        rperm[lo:hi] = rp
        eclass[lo:hi] = np.argmax(s.edge_attr, axis=-1)
        sr = rl[rp]
        sorted_recv[lo:hi] = sr
        # Mirror-involution check (the batch-level fact wire v3 verifies
        # per batch, provable per item here): senders[rp] == receivers
        # AND receivers[rp] == senders makes the batch recv_perm its own
        # inverse, enabling the single-scatter gather-pair fast path.
        if symmetric and not (np.array_equal(sl[rp], rl)
                              and np.array_equal(sr, sl)):
            symmetric = False
        # Collator precondition: per-item edges sender-sorted.
        if len(sl) > 1 and not np.all(sl[1:] >= sl[:-1]):
            raise ValueError(
                f'item {i} edges not sender-sorted; device collation '
                f'requires the lex-sorted blob format')

    y0 = np.asarray(samples[0].y, np.float32)
    y = np.stack([np.asarray(s.y, np.float32) for s in samples]) \
        if y0.ndim else np.array([s.y for s in samples], np.float32)
    strain = np.array([(s.dE or 0.0, s.rmsd or 0.0) for s in samples],
                      np.float32)

    arrays = DeviceStoreArrays(
        feats=feats, coords=coords, senders=senders, receivers=receivers,
        rperm=rperm, eclass=eclass, node_start=node_start,
        edge_start=edge_start, y=y, strain=strain)
    nbytes = sum(a.nbytes for a in arrays)
    LOG.info(f'Device-dataset store: {n_items} items, {n_tot} nodes, '
             f'{e_tot} edges, {nbytes / 1e6:.1f} MB, '
             f'symmetric={symmetric}, built in '
             f'{time.perf_counter() - t0:.1f}s')
    return HostStore(
        arrays=arrays, num_nodes=num_nodes, num_edges=num_edges,
        sorted_recv=sorted_recv,
        lig_fnames=[s.lig_fname for s in samples],
        rec_fnames=[s.rec_fname for s in samples],
        symmetric=symmetric, rot=rot, nbytes=nbytes)


class DeviceGraphStore:
    """Host store + its replicated device pytree."""

    def __init__(self, host: HostStore, mesh):
        from pointvs_tpu.parallel.mesh import replicate
        self.host = host
        self.arrays = replicate(host.arrays, mesh)

    def __repr__(self):
        return (f'DeviceGraphStore({len(self.host.num_nodes)} items, '
                f'{self.host.nbytes / 1e6:.1f} MB)')


def batch_row_cap(host: HostStore, ids_row: np.ndarray, n_pad: int,
                  bucket: bool = True) -> int:
    """Max windowed-scatter load (both directions) for one device row's
    item ids, computed from the cached per-item SORTED id arrays — a few
    searchsorted calls per item, no O(E) concatenation. ``bucket=False``
    returns the raw load instead of its capacity bucket."""
    from pointvs_tpu.ops.sorted_segment import WINDOW
    nw = -(-n_pad // WINDOW)
    hist = np.zeros(nw, np.int64)
    hist_r = np.zeros(nw, np.int64)
    off = 0
    es, arr = host.arrays.edge_start, host.arrays
    for i in ids_row:
        if i < 0:
            continue
        n_i = int(host.num_nodes[i])
        lo, hi = int(es[i]), int(es[i + 1])
        if hi > lo:
            lo_w = off // WINDOW
            hi_w = min((off + n_i - 1) // WINDOW, nw - 1)
            # Clip to the item's id range: negative bounds would wrap if
            # searchsorted cast them to the (unsigned) array dtype.
            bounds = np.clip(
                np.arange(lo_w, hi_w + 2, dtype=np.int64) * WINDOW - off,
                0, n_i)
            s = arr.senders[lo:hi]
            hist[lo_w:hi_w + 1] += np.diff(np.searchsorted(s, bounds))
            r = host.sorted_recv[lo:hi]
            hist_r[lo_w:hi_w + 1] += np.diff(np.searchsorted(r, bounds))
        off += n_i
    load = int(max(hist.max(initial=0), hist_r.max(initial=0)))
    if not bucket:
        return load
    from pointvs_tpu.ops.sorted_segment import cap_bucket
    return cap_bucket(load)


# --------------------------------------------------------------------- #
# Device-side (jit-traceable) collation


def collate_from_ids(store: DeviceStoreArrays, ids,
                     spec: DeviceCollateSpec) -> GraphBatch:
    """ids [B] int32 (sentinel -1 = empty slot) -> GraphBatch, exactly
    as ``buckets.pad_graphs_to_batch`` would build it on the host.

    No sorts: per-item edge blocks are sender-sorted and concatenate in
    slot order with increasing node offsets, so the batch edge list is
    globally sender-sorted; the per-item receiver permutations shift by
    the batch edge offsets into the batch-level ``recv_perm``."""
    import jax.numpy as jnp
    b = spec.num_graphs
    n_pad, e_pad = spec.n_pad, spec.e_pad
    ids = ids.astype(jnp.int32)
    valid = ids >= 0
    idc = jnp.where(valid, ids, 0)
    vi = valid.astype(jnp.int32)
    node_start = store.node_start
    edge_start = store.edge_start
    nlen = (node_start[idc + 1] - node_start[idc]) * vi       # [B]
    elen = (edge_start[idc + 1] - edge_start[idc]) * vi
    nb = jnp.cumsum(nlen)
    eb = jnp.cumsum(elen)
    total_n = nb[-1]
    total_e = eb[-1]

    row = jnp.arange(n_pad, dtype=jnp.int32)
    gid = jnp.searchsorted(nb, row, side='right').astype(jnp.int32)
    gc = jnp.minimum(gid, b - 1)
    in_n = row < total_n
    node_mask = in_n.astype(jnp.float32)
    dst0 = nb[gc] - nlen[gc]
    nsrc = jnp.where(in_n, node_start[idc[gc]] + (row - dst0), 0)
    feats = store.feats[nsrc].astype(jnp.float32) * node_mask[:, None]
    coords = store.coords[nsrc] * node_mask[:, None]
    graph_id = jnp.where(in_n, gid, b)

    erow = jnp.arange(e_pad, dtype=jnp.int32)
    egid = jnp.searchsorted(eb, erow, side='right').astype(jnp.int32)
    egc = jnp.minimum(egid, b - 1)
    in_e = erow < total_e
    edst0 = eb[egc] - elen[egc]
    esrc = jnp.where(in_e, edge_start[idc[egc]] + (erow - edst0), 0)
    node_off = nb[egc] - nlen[egc]
    senders = jnp.where(
        in_e, store.senders[esrc].astype(jnp.int32) + node_off, n_pad)
    receivers = jnp.where(
        in_e, store.receivers[esrc].astype(jnp.int32) + node_off, n_pad)
    eclass = jnp.where(in_e, store.eclass[esrc], jnp.uint8(3))
    edge_attr = (eclass[:, None] == jnp.arange(3, dtype=eclass.dtype)
                 ).astype(jnp.float32)
    edge_mask = in_e.astype(jnp.float32)
    recv_perm = jnp.where(
        in_e, store.rperm[esrc].astype(jnp.int32) + edst0, erow)

    vf = valid.astype(jnp.float32)
    y = store.y[idc]
    y = y * (vf if y.ndim == 1 else vf[:, None])
    strain = store.strain[idc] * vf[:, None]
    return GraphBatch(
        node_feats=feats, coords=coords, node_mask=node_mask,
        graph_id=graph_id, senders=senders, receivers=receivers,
        edge_attr=edge_attr, edge_mask=edge_mask, y=y, graph_mask=vf,
        strain=strain, recv_perm=recv_perm,
        inv_recv_perm=recv_perm if spec.symmetric else None)


def _quats_to_mats(q):
    """[b, 4] unit quaternions -> [b, 3, 3] rotation matrices (det +1)."""
    import jax.numpy as jnp
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)                                     # [b, 3, 3]


def random_rotations(key, ids):
    """One rotation matrix per graph slot, uniform over SO(3)
    (normalised quaternions — the same distribution as the reference's
    host rotation, ref preprocessing.py:30-53).

    Keys derive from (step key, ITEM id) — not the device slot — so
    rotations are independent of the data-parallel layout: 1-device and
    8-device runs rotate each sampled complex identically, preserving
    the DP-parity invariant. (An item drawn twice into one batch by the
    with-replacement sampler shares its rotation that step — a harmless
    departure from the host sampler's fresh draw per occurrence.)"""
    import jax
    import jax.numpy as jnp
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        key, jnp.maximum(ids, 0))
    q = jax.vmap(lambda k: jax.random.normal(k, (4,), jnp.float32))(keys)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return _quats_to_mats(q)


def rotate_per_graph(batch: GraphBatch, key, ids,
                     num_graphs: int) -> GraphBatch:
    """Fresh uniform rotation per graph, applied as the host does
    (``x @ M``, preprocessing.py:70-78). Padding rows are zeros and stay
    zeros. HIGHEST precision: the default MXU path rounds f32 operands
    to bf16, which would cost ~1e-2 coordinate error at pocket scale."""
    import jax
    import jax.numpy as jnp
    mats = random_rotations(key, ids)               # [B, 3, 3]
    mg = mats[jnp.minimum(batch.graph_id, num_graphs - 1)]
    coords = jnp.einsum('ni,nij->nj', batch.coords, mg,
                        precision=jax.lax.Precision.HIGHEST)
    return batch._replace(coords=coords)
