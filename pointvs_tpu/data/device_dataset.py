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
label noise / entity dropout (per-epoch host randomness), and the store
must fit the HBM budget. Everything else falls back to the streaming
wire path.

HYBRID MODE (augmented actives): aug items re-rotate the raw ligand
*before* boxing (ref data_loaders.py:144-157), so their graphs genuinely
change every epoch and cannot be resident as-is. Instead the store
reserves a CAPACITY-padded tail region for them (per-item node/edge
capacity probed over a few rotations at build time), and at each train
epoch start the loader triggers ``DeviceGraphStore.refresh``: the host
re-featurises only the aug items (rotations are keyed by
(seed, epoch, item) — identical to what the streaming path would draw)
and ONE donated jitted ``dynamic_update_slice`` refreshes the tail in
HBM. ``node_len``/``edge_len`` carry actual sizes; the offset arrays
stay fixed, so the compiled step programs are reused across epochs.

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
    so the one-time upload stays cheap on slow H2D paths.

    ``node_start``/``edge_start`` demarcate each item's STORAGE slot
    (capacity; equals size for non-augmented items); ``node_len``/
    ``edge_len`` carry the actual sizes, which the hybrid refresh
    rewrites per epoch while the slots stay fixed."""
    feats: np.ndarray       # [N_tot, F] uint8 (0/1 bits) or float32
    coords: np.ndarray      # [N_tot, 3] float32
    senders: np.ndarray     # [E_tot] uint16/int32, item-local node ids
    receivers: np.ndarray   # [E_tot] uint16/int32
    rperm: np.ndarray       # [E_tot] uint16/int32, item-local edge ranks
    eclass: np.ndarray      # [E_tot] uint8 edge class (0-2)
    node_start: np.ndarray  # [n_items+1] int32 (slot offsets)
    edge_start: np.ndarray  # [n_items+1] int32 (slot offsets)
    node_len: np.ndarray    # [n_items] int32 (actual, <= slot size)
    edge_len: np.ndarray    # [n_items] int32
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
    aug_from: int                 # first augmented item (== n_items: none)
    aug_epoch: List[int]          # [epoch the aug tail holds] (mutable box)


def hybrid_enabled() -> bool:
    import os
    return os.environ.get('POINTVS_DD_HYBRID', '1') != '0'


def store_eligibility(dataset) -> Optional[str]:
    """None when ``dataset`` can be device-resident, else the reason."""
    if getattr(dataset, 'p_remove_entity', 0) and dataset.p_remove_entity > 0:
        return 'p_remove_entity resamples graphs every epoch'
    if getattr(dataset, 'p_noise', -1) and getattr(dataset, 'p_noise', -1) > 0:
        return 'p_noise flips labels every epoch'
    pre_aug = getattr(dataset, 'pre_aug_ds_len', len(dataset))
    if pre_aug != len(dataset):
        # Hybrid mode keeps aug items in a capacity-padded tail region
        # refreshed each epoch; it needs the dataset's deterministic
        # per-(seed, epoch, item) aug rotations (dataset.set_epoch).
        if not hybrid_enabled():
            return ('augmented actives re-rotate the raw ligand before '
                    'boxing and POINTVS_DD_HYBRID=0 disables the hybrid '
                    'refresh path')
        if not hasattr(dataset, 'set_epoch'):
            return ('augmented actives need the dataset to support '
                    'deterministic per-epoch rotations (set_epoch)')
    return None


def _idx_dtype(max_value: int):
    return np.uint16 if max_value < 65536 else np.int32


# Hybrid-tail capacity: per-aug-item slot size = the dataset's own
# deterministic aug_size_cap (slack x the max size over the base graph
# and POINTVS_AUG_PROBES probe rotations — data/dataset.py). Aug
# rotations follow the reference exactly — the ligand rotates about the
# ORIGIN (ref preprocessing.py:52-53 reduces to x @ M), so the
# ligand-relative box can sweep very different receptor regions and
# graph sizes vary a lot. Because BOTH the streaming loader and the
# store draw rotations through dataset._aug_draw, which rejects
# over-cap draws (bounded retries, then the first probe rotation), a
# slot can never overflow: the old spill path (train on the previous
# epoch's rotation) is structurally unreachable and raises if hit.


def _write_item(arrays, sorted_recv, i, s, check_symmetric: bool):
    """Write one GraphSample into its slot; returns item symmetry."""
    n_lo = int(arrays.node_start[i])
    e_lo = int(arrays.edge_start[i])
    n_i, e_i = s.num_nodes, s.num_edges
    if (n_lo + n_i > int(arrays.node_start[i + 1])
            or e_lo + e_i > int(arrays.edge_start[i + 1])):
        raise RuntimeError(
            f'augmented item {i} outgrew its store slot '
            f'({n_i} nodes / {e_i} edges vs capacity '
            f'{int(arrays.node_start[i + 1]) - n_lo} / '
            f'{int(arrays.edge_start[i + 1]) - e_lo}); the store was '
            f'built under different POINTVS_AUG_* settings - rebuild it '
            f'or set POINTVS_DD_HYBRID=0')
    f = np.asarray(s.node_feats, np.float32)
    if arrays.feats.dtype == np.uint8:
        if not np.all((f == 0) | (f == 1)):
            raise RuntimeError('non-binary features in a uint8 store')
        arrays.feats[n_lo:n_lo + n_i] = f.astype(np.uint8)
    else:
        arrays.feats[n_lo:n_lo + n_i] = f
    arrays.coords[n_lo:n_lo + n_i] = np.asarray(s.coords, np.float32)
    arrays.node_len[i] = n_i
    arrays.edge_len[i] = e_i
    symmetric = True
    if e_i:
        sl = np.asarray(s.senders)
        rl = np.asarray(s.receivers)
        rp = (np.asarray(s.recv_perm) if s.recv_perm is not None
              else np.argsort(rl, kind='stable'))
        arrays.senders[e_lo:e_lo + e_i] = sl
        arrays.receivers[e_lo:e_lo + e_i] = rl
        arrays.rperm[e_lo:e_lo + e_i] = rp
        arrays.eclass[e_lo:e_lo + e_i] = np.argmax(s.edge_attr, axis=-1)
        sr = rl[rp]
        sorted_recv[e_lo:e_lo + e_i] = sr
        if check_symmetric:
            # Mirror-involution check (the batch-level fact wire v3
            # verifies per batch, provable per item here): senders[rp] ==
            # receivers AND receivers[rp] == senders makes the batch
            # recv_perm its own inverse (gather-pair fast path).
            symmetric = (np.array_equal(sl[rp], rl)
                         and np.array_equal(sr, sl))
        # Collator precondition: per-item edges sender-sorted.
        if len(sl) > 1 and not np.all(sl[1:] >= sl[:-1]):
            raise ValueError(
                f'item {i} edges not sender-sorted; device collation '
                f'requires the lex-sorted blob format')
    return symmetric


def _norot_getitem(dataset, i):
    """dataset[i] with the whole-complex rotation disabled (the store
    keeps the deterministic frame; rotation re-applies on device)."""
    had_rot = bool(getattr(dataset, 'rot', False))
    if had_rot:
        dataset.rot = False
    try:
        return dataset[i]
    finally:
        if had_rot:
            dataset.rot = True


def build_host_store(dataset) -> HostStore:
    """One featurisation pass over ``dataset`` -> concatenated arrays.

    Runs with the dataset's per-epoch rotation DISABLED so the stored
    coordinates are the deterministic boxed-pocket frame; the rotation
    (if requested) is re-applied on device each step. Augmented actives
    (hybrid mode) get capacity-padded slots sized to the dataset's
    deterministic aug_size_cap; their contents are refreshed per epoch
    (``refresh_augmented``)."""
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
    n_items = len(dataset)
    if not n_items:
        raise ValueError('empty dataset')
    aug_from = getattr(dataset, 'pre_aug_ds_len', n_items)
    aug_epoch = int(getattr(dataset, '_aug_epoch', 0))

    t0 = time.perf_counter()
    samples = [_norot_getitem(dataset, i) for i in range(n_items)]

    num_nodes = np.array([s.num_nodes for s in samples], np.int64)
    num_edges = np.array([s.num_edges for s in samples], np.int64)
    node_slot = num_nodes.copy()
    edge_slot = num_edges.copy()
    if aug_from < n_items:
        # Slot capacity = the dataset's deterministic per-item cap; the
        # shared retry-gated draw (dataset._aug_draw) guarantees every
        # epoch's rotation fits (spill-free by construction).
        for i in range(aug_from, n_items):
            n_cap, e_cap = dataset.aug_size_cap(i)
            node_slot[i] = max(node_slot[i], n_cap)
            edge_slot[i] = max(edge_slot[i], e_cap)

    node_start = np.zeros(n_items + 1, np.int32)
    edge_start = np.zeros(n_items + 1, np.int32)
    np.cumsum(node_slot, out=node_start[1:])
    np.cumsum(edge_slot, out=edge_start[1:])
    n_tot, e_tot = int(node_start[-1]), int(edge_start[-1])

    feat_dim = samples[0].node_feats.shape[1]
    binary = all(
        np.all((np.asarray(s.node_feats) == 0)
               | (np.asarray(s.node_feats) == 1)) for s in samples)
    # 0/1 feature matrices (the bit-vector featurisation) store as
    # uint8 — 4x fewer one-time H2D bytes; anything else stays float32.
    feats = np.zeros((n_tot, feat_dim),
                     np.uint8 if binary else np.float32)
    coords = np.zeros((n_tot, 3), np.float32)
    idx_t = _idx_dtype(int(node_slot.max(initial=1)))
    ridx_t = _idx_dtype(int(edge_slot.max(initial=1)))
    senders = np.zeros(e_tot, idx_t)
    receivers = np.zeros(e_tot, idx_t)
    rperm = np.zeros(e_tot, ridx_t)
    eclass = np.full(e_tot, 3, np.uint8)
    sorted_recv = np.zeros(e_tot, idx_t)

    y0 = np.asarray(samples[0].y, np.float32)
    y = np.stack([np.asarray(s.y, np.float32) for s in samples]) \
        if y0.ndim else np.array([s.y for s in samples], np.float32)
    strain = np.array([(s.dE or 0.0, s.rmsd or 0.0) for s in samples],
                      np.float32)

    arrays = DeviceStoreArrays(
        feats=feats, coords=coords, senders=senders, receivers=receivers,
        rperm=rperm, eclass=eclass, node_start=node_start,
        edge_start=edge_start,
        node_len=np.zeros(n_items, np.int32),
        edge_len=np.zeros(n_items, np.int32), y=y, strain=strain)
    symmetric = True
    if aug_from >= n_items:
        # Dense slots (no aug tail): ONE vectorised pass. The per-item
        # python loop below costs ~0.7 ms/item — 70 s at a 100k-pose
        # screening library — while these bulk ops take ~2-4 s.
        feats[:] = np.concatenate(
            [np.asarray(s.node_feats) for s in samples]).astype(
                feats.dtype, copy=False)
        coords[:] = np.concatenate(
            [np.asarray(s.coords) for s in samples]).astype(np.float32)
        s_all = np.concatenate(
            [np.asarray(s.senders) for s in samples]) \
            if e_tot else np.zeros(0, np.int64)
        r_all = np.concatenate(
            [np.asarray(s.receivers) for s in samples]) \
            if e_tot else np.zeros(0, np.int64)
        rp_all = np.concatenate(
            [(np.asarray(s.recv_perm) if s.recv_perm is not None
              else np.argsort(np.asarray(s.receivers), kind='stable'))
             for s in samples]) if e_tot else np.zeros(0, np.int64)
        eclass[:] = np.concatenate(
            [np.argmax(s.edge_attr, axis=-1).astype(np.uint8)
             if s.num_edges else np.zeros(0, np.uint8)
             for s in samples]) if e_tot else eclass[:0]
        if e_tot:
            e_off = np.repeat(edge_start[:-1].astype(np.int64),
                              num_edges)
            rp_g = rp_all.astype(np.int64) + e_off
            sr = r_all[rp_g]
            senders[:] = s_all
            receivers[:] = r_all
            rperm[:] = rp_all
            sorted_recv[:] = sr
            # Per-item mirror-involution (vectorised): senders[rp] ==
            # receivers AND receivers[rp] == senders per item.
            symmetric = (np.array_equal(s_all[rp_g], r_all)
                         and np.array_equal(sr, s_all))
            # Collator precondition: per-item edges sender-sorted
            # (order may legitimately reset at item boundaries).
            nondec = s_all[1:] >= s_all[:-1]
            bounds = edge_start[1:-1].astype(np.int64) - 1
            nondec[bounds[(bounds >= 0) & (bounds < e_tot - 1)]] = True
            if not np.all(nondec):
                bad = int(np.searchsorted(
                    edge_start, np.flatnonzero(~nondec)[0],
                    side='right')) - 1
                raise ValueError(
                    f'item {bad} edges not sender-sorted; device '
                    f'collation requires the lex-sorted blob format')
        arrays.node_len[:] = num_nodes
        arrays.edge_len[:] = num_edges
    else:
        for i, s in enumerate(samples):
            symmetric &= _write_item(arrays, sorted_recv, i, s,
                                     check_symmetric=symmetric)

    nbytes = sum(a.nbytes for a in arrays)
    LOG.info(f'Device-dataset store: {n_items} items '
             f'({max(0, n_items - aug_from)} augmented), {n_tot} nodes, '
             f'{e_tot} edges, {nbytes / 1e6:.1f} MB, '
             f'symmetric={symmetric}, built in '
             f'{time.perf_counter() - t0:.1f}s')
    return HostStore(
        arrays=arrays, num_nodes=num_nodes, num_edges=num_edges,
        sorted_recv=sorted_recv,
        lig_fnames=[s.lig_fname for s in samples],
        rec_fnames=[s.rec_fname for s in samples],
        symmetric=symmetric, rot=rot, nbytes=nbytes,
        aug_from=min(aug_from, n_items), aug_epoch=[aug_epoch])


def refresh_augmented(host: HostStore, dataset, epoch: int,
                      samples=None):
    """Re-featurise the augmented tail for ``epoch`` IN PLACE (host
    arrays) and return the tail slices for the device update, or None
    when there is nothing to do. Rotations derive from
    (seed, epoch, item) inside the dataset, so the graphs equal what the
    streaming path would draw for the same epoch. ``samples`` (from the
    background prefetch) skips the featurise pass."""
    n_items = len(host.num_nodes)
    if host.aug_from >= n_items or host.aug_epoch[0] == int(epoch):
        return None
    if len(dataset) != n_items:
        raise ValueError('store was built from a different dataset')
    t0 = time.perf_counter()
    dataset.set_epoch(int(epoch))
    arrays = host.arrays
    for i in range(host.aug_from, n_items):
        s = (samples[i - host.aug_from] if samples is not None
             else _norot_getitem(dataset, i))
        if (s.num_nodes > int(arrays.node_start[i + 1]
                              - arrays.node_start[i])
                or s.num_edges > int(arrays.edge_start[i + 1]
                                     - arrays.edge_start[i])):
            # Structurally unreachable: slots are sized to
            # dataset.aug_size_cap and _aug_draw rejects over-cap
            # rotations on both paths. A hit means the store was built
            # under different cap env knobs than this process runs with
            # — refuse to train on a stale rotation.
            raise RuntimeError(
                f'augmented item {i} drew a graph ({s.num_nodes} nodes / '
                f'{s.num_edges} edges) larger than its store slot at '
                f'epoch {epoch}; the store was built under different '
                f'POINTVS_AUG_* settings - rebuild it (or set '
                f'POINTVS_DD_HYBRID=0)')
        ok = _write_item(arrays, host.sorted_recv, i, s,
                         check_symmetric=host.symmetric)
        if host.symmetric and not ok:
            # spec.symmetric is a trace-key fact baked into the compiled
            # step; a flip would silently corrupt the involution fast
            # path, so fail loudly (never observed for radius-graph
            # generators — edges are bidirectional by construction).
            raise RuntimeError(
                f'augmented item {i} lost edge symmetry at epoch '
                f'{epoch}; set POINTVS_DD_HYBRID=0')
        host.num_nodes[i] = s.num_nodes
        host.num_edges[i] = s.num_edges
    host.aug_epoch[0] = int(epoch)
    n_lo = int(arrays.node_start[host.aug_from])
    e_lo = int(arrays.edge_start[host.aug_from])
    a_lo = host.aug_from
    tail = {
        'feats': arrays.feats[n_lo:], 'coords': arrays.coords[n_lo:],
        'senders': arrays.senders[e_lo:],
        'receivers': arrays.receivers[e_lo:],
        'rperm': arrays.rperm[e_lo:], 'eclass': arrays.eclass[e_lo:],
        'node_len': arrays.node_len[a_lo:],
        'edge_len': arrays.edge_len[a_lo:],
    }
    LOG.info(f'Hybrid store refresh: {n_items - a_lo} augmented items '
             f're-featurised for epoch {epoch} in '
             f'{time.perf_counter() - t0:.2f}s')
    return tail


def store_shape_bucket(n: int) -> int:
    """Coarse geometric bucket for store array extents, so screens of
    similar-size libraries reuse ONE compiled eval program (store array
    shapes are operand shapes of the ids-collation step) and a cold
    process can pre-warm the executable from a recorded spec."""
    b = 256
    while b < n:
        b = -(-int(b * 1.25) // 256) * 256
    return b


def pad_store_arrays(arrays: DeviceStoreArrays) -> DeviceStoreArrays:
    """Zero-pad node/edge/item extents up to their shape buckets (the
    collate gathers only real slots, so padding is never read)."""
    def pad_to(a, n, axis=0):
        if a.shape[axis] >= n:
            return a
        width = [(0, 0)] * a.ndim
        width[axis] = (0, n - a.shape[axis])
        return np.pad(a, width)

    n_b = store_shape_bucket(arrays.feats.shape[0])
    e_b = store_shape_bucket(arrays.senders.shape[0])
    i_b = store_shape_bucket(arrays.node_len.shape[0])
    start_pad = ((0, i_b - arrays.node_len.shape[0]),)
    return arrays._replace(
        feats=pad_to(arrays.feats, n_b), coords=pad_to(arrays.coords, n_b),
        senders=pad_to(arrays.senders, e_b),
        receivers=pad_to(arrays.receivers, e_b),
        rperm=pad_to(arrays.rperm, e_b), eclass=pad_to(arrays.eclass, e_b),
        node_start=np.pad(arrays.node_start, start_pad, mode='edge'),
        edge_start=np.pad(arrays.edge_start, start_pad, mode='edge'),
        node_len=pad_to(arrays.node_len, i_b),
        edge_len=pad_to(arrays.edge_len, i_b),
        y=pad_to(arrays.y, i_b), strain=pad_to(arrays.strain, i_b))


class DeviceGraphStore:
    """Host store + its replicated device pytree.

    ``pad_shapes=True`` (screening) buckets the uploaded array extents
    (store_shape_bucket) so repeat screens of similar-size libraries
    compile once and cold processes can pre-warm the executable."""

    def __init__(self, host: HostStore, mesh, pad_shapes: bool = False):
        from pointvs_tpu.parallel.mesh import replicate
        self.host = host
        self.mesh = mesh
        arrays = pad_store_arrays(host.arrays) if pad_shapes \
            else host.arrays
        self.arrays = replicate(arrays, mesh)
        self._updater = None
        self._prefetch = None   # (epoch, thread, result box)

    def prefetch_refresh(self, dataset, epoch: int) -> None:
        """Featurise epoch ``epoch``'s augmented graphs in a BACKGROUND
        thread (rotations are deterministic per (seed, epoch, item), so
        the next epoch's graphs are known in advance) — the streaming
        path hides aug featurisation behind device compute in its
        producer thread, and without this the hybrid path paid it
        serially at every epoch boundary (measured: it lost the aug e2e
        A/B for short epochs)."""
        import threading
        n_items = len(self.host.num_nodes)
        if (self.host.aug_from >= n_items
                or self.host.aug_epoch[0] == int(epoch)
                or not hasattr(dataset, 'aug_item')
                or self._prefetch is not None):
            return
        box = {}

        def work():
            try:
                box['samples'] = [dataset.aug_item(i, int(epoch))
                                  for i in range(self.host.aug_from,
                                                 n_items)]
            except Exception as exc:   # fall back to the sync path
                box['error'] = exc

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prefetch = (int(epoch), t, box)

    def refresh(self, dataset, epoch: int) -> None:
        """Hybrid mode: re-featurise the augmented tail for ``epoch`` and
        patch it into HBM with one donated dynamic_update_slice program
        (offsets are static — the slot layout never changes — so the one
        compiled updater serves every epoch)."""
        samples = None
        if self._prefetch is not None:
            pf_epoch, t, box = self._prefetch
            self._prefetch = None
            if pf_epoch == int(epoch):
                t.join()
                samples = box.get('samples')
        tail = refresh_augmented(self.host, dataset, epoch,
                                 samples=samples)
        if tail is None:
            return
        import jax
        from pointvs_tpu.parallel.mesh import replicate
        if self._updater is None:
            arrays = self.host.arrays
            n_lo = int(arrays.node_start[self.host.aug_from])
            e_lo = int(arrays.edge_start[self.host.aug_from])
            a_lo = int(self.host.aug_from)

            def upd(dev, t):
                dus = jax.lax.dynamic_update_slice
                return dev._replace(
                    feats=dus(dev.feats, t['feats'], (n_lo, 0)),
                    coords=dus(dev.coords, t['coords'], (n_lo, 0)),
                    senders=dus(dev.senders, t['senders'], (e_lo,)),
                    receivers=dus(dev.receivers, t['receivers'], (e_lo,)),
                    rperm=dus(dev.rperm, t['rperm'], (e_lo,)),
                    eclass=dus(dev.eclass, t['eclass'], (e_lo,)),
                    node_len=dus(dev.node_len, t['node_len'], (a_lo,)),
                    edge_len=dus(dev.edge_len, t['edge_len'], (a_lo,)))

            self._updater = jax.jit(upd, donate_argnums=0)
        self.arrays = self._updater(self.arrays,
                                    replicate(dict(tail), self.mesh))

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
        lo = int(es[i])
        hi = lo + int(arr.edge_len[i])   # actual edges, not slot size
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
    # Actual sizes, not slot sizes: hybrid aug slots carry capacity
    # padding between node_start[i]+node_len[i] and node_start[i+1].
    nlen = store.node_len[idc].astype(jnp.int32) * vi         # [B]
    elen = store.edge_len[idc].astype(jnp.int32) * vi
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


# --------------------------------------------------------------------- #
# Chunked store codec: stream library shards into HBM while scoring.
#
# For libraries that outgrow the HBM budget (or to bound upload bursts),
# the host packs item ranges of a HostStore into compact fixed-shape
# buffers — bit-packed features, symmetric-HALF edge lists — and a
# single jitted ``expand_chunk`` program rebuilds full DeviceStoreArrays
# in HBM per chunk (~2.3x fewer wire bytes than raw store arrays; the
# reconstruction reuses the wire-v3 proof: mirrors-first concatenation +
# one stable argsort reproduces the per-item lex order exactly, pinned
# bit-exact by tests/test_device_dataset.py).

class StoreChunkSpec(NamedTuple):
    """Static shapes shared by every chunk (one compiled expand/eval)."""
    items: int          # item slots per chunk
    n_fix: int          # node rows (multiple of 8 for the bit unpack)
    eh_fix: int         # half-edge slots (multiple of 4 for 2-bit class)
    feat_dim: int
    half: bool          # symmetric-half edges (False: full lists)
    # raw: ship full edge lists INCLUDING rperm — ~2.2x the wire bytes of
    # the half codec, but ZERO device-side sorts. Measured on the
    # tunneled chip: the half codec's expand costs 7.0 s/chunk hot (two
    # 28M-element TPU argsorts) + a multi-minute first compile, far more
    # than the extra upload seconds; raw is the default for screening.
    raw: bool = False
    # degrees: senders ship as per-node out-degree counts (2 B/node)
    # instead of the explicit per-edge list (2 B/edge, ~11x more at
    # typical mean degree) — edges are lex-sorted per item, so senders
    # are a run-length expansion. Device decode is one cumsum over the
    # node slots + one searchsorted of edge positions into the offsets
    # (the same primitive the raw-symmetric receiver decode already
    # uses at this size) — still ZERO device sorts. Cuts chunk upload
    # ~30% on the tunnel-upload-bound single-pass screen.
    degrees: bool = False
    # coords16: coordinates ship as per-axis fixed-point uint16 against
    # a per-chunk (lo, scale) affine map — 6 B/node instead of 12. Worst
    # per-axis error is scale/2 = extent/131070 (< 0.0005 A for an 80 A
    # pocket library) — far below the pose-perturbation noise screening
    # tolerates, but NOT bit-exact: scores shift within a documented
    # bound (tests/test_device_dataset.py pins the coordinate bound;
    # POINTVS_CHUNK_COORDS16=0 restores exact f32 coords).
    coords16: bool = False
    # rperm12: rperm values are ITEM-LOCAL edge ranks, so when every
    # item has < 4096 edges they fit 12 bits — pairs pack into 3 bytes
    # (1.5 B/edge vs 2). Lossless; device unpack is three elementwise
    # byte ops. rperm is the largest chunk field (~64% of the wire at
    # 100k-pose scale), so this cuts the upload ~16%.
    # POINTVS_CHUNK_RPERM12=0 restores plain uint16.
    rperm12: bool = False
    # deg8: out-degree counts fit uint8 when the densest node has < 256
    # out-edges (radius-graph pockets: ~54 at the default radius) —
    # 1 B/node instead of 2. Lossless.
    deg8: bool = False


def _max_out_degree(host: HostStore) -> int:
    """Max out-degree across the store, from run lengths of the
    lex-sorted per-item sender lists (one vectorised pass — equal
    senders are contiguous within an item, and item boundaries break
    runs explicitly)."""
    s = host.arrays.senders
    if len(s) == 0:
        return 0
    breaks = np.flatnonzero(s[1:] != s[:-1]).astype(np.int64) + 1
    bounds = np.union1d(np.concatenate(
        ([0], breaks, [len(s)])), host.arrays.edge_start.astype(np.int64))
    return int(np.diff(bounds).max(initial=0))


def plan_chunks(host: HostStore, budget_bytes: float, raw: bool = True):
    """(ranges, spec): contiguous item ranges whose EXPANDED store bytes
    fit ``budget_bytes``, plus the fixed chunk shapes."""
    if host.aug_from < len(host.num_nodes):
        raise ValueError('chunked stores do not support augmented tails')
    import os
    ns, es = host.arrays.node_start, host.arrays.edge_start
    feat_dim = host.arrays.feats.shape[1]
    # Degree counts ship as uint16; out-degree <= the item's edge count,
    # so rperm fitting uint16 (every item < 65536 edges) guarantees no
    # overflow — int32-rperm stores fall back to explicit senders.
    degrees = (raw and host.arrays.rperm.itemsize <= 2
               and os.environ.get('POINTVS_CHUNK_DEGREES', '1') != '0')
    coords16 = (raw and
                os.environ.get('POINTVS_CHUNK_COORDS16', '1') != '0')
    max_item_e = int(np.max(host.arrays.edge_len, initial=0))
    rperm12 = (raw and max_item_e < 4096
               and os.environ.get('POINTVS_CHUNK_RPERM12', '1') != '0')
    deg8 = (degrees and _max_out_degree(host) < 256
            and os.environ.get('POINTVS_CHUNK_DEG8', '1') != '0')
    n_items = len(host.num_nodes)
    # BALANCED ranges: chunks ship FIXED shapes (one compiled expand
    # program), so every chunk pays max-chunk bytes on the wire. A
    # greedy fill makes k-1 full chunks plus a small tail padded to the
    # full shape (measured 20,041 B/pose on the tail vs 3,777 real at
    # 100k scale); splitting the cumulative byte estimate evenly keeps
    # the fixed shapes ~= total/k and eliminates the tail waste.
    # Split on EXPANDED device bytes — the documented contract, and the
    # binding constraint: ~2 chunks stay live in HBM while executions
    # drain, and the expanded arrays (senders/receivers/rperm int32 +
    # eclass = 13 B/edge; uint8 feats + f32 coords = feat_dim + 12
    # B/node) are ~3x the wire codec's bytes. Splitting on wire bytes
    # let a heavy library (4,854 edges/pose measured) build 3.7 GB
    # chunks that crashed the TPU worker. Upload balance follows — both
    # estimates are edge-dominated.
    per_node_dev = feat_dim + 12
    per_edge_dev = 13
    wb = (np.diff(ns).astype(np.float64) * per_node_dev
          + np.diff(es).astype(np.float64) * per_edge_dev)
    cum = np.concatenate([[0.0], np.cumsum(wb)])
    # Even splitting targets budget-sized chunks, but searchsorted lands
    # boundaries on item edges so a range can overshoot the budget by up
    # to one item — and the FIXED shapes are the max over ranges, so one
    # over-budget range inflates every chunk's upload. Raise k until all
    # multi-item ranges fit (a single item over budget is unsplittable).
    k = max(1, int(np.ceil(cum[-1] / budget_bytes)))
    while True:
        splits = np.searchsorted(cum, cum[-1] * np.arange(1, k) / k)
        splits = (np.unique(np.clip(splits, 1, n_items - 1))
                  if k > 1 else [])
        bounds = np.concatenate([[0], splits, [n_items]]).astype(int)
        range_bytes = np.diff(cum[bounds])
        range_items = np.diff(bounds)
        if (k >= n_items
                or not np.any((range_bytes > budget_bytes)
                              & (range_items > 1))):
            break
        k += 1
    ranges = [(int(a_), int(b_))
              for a_, b_ in zip(bounds[:-1], bounds[1:]) if b_ > a_]
    items = max(hi - lo for lo, hi in ranges)
    n_fix = max(int(ns[hi] - ns[lo]) for lo, hi in ranges)
    e_fix = max(int(es[hi] - es[lo]) for lo, hi in ranges)
    n_fix = -(-n_fix // 8) * 8
    if raw:
        eh_fix = -(-e_fix // 4) * 4
        # In raw mode ``half`` records store SYMMETRY (receivers then
        # ship implicitly as senders[rperm], the mirror involution).
        return ranges, StoreChunkSpec(
            items=items, n_fix=n_fix, eh_fix=eh_fix, feat_dim=feat_dim,
            half=host.symmetric, raw=True, degrees=degrees,
            coords16=coords16, rperm12=rperm12, deg8=deg8)
    eh_fix = -(-(e_fix // 2) // 4) * 4 if host.symmetric else e_fix
    return ranges, StoreChunkSpec(items=items, n_fix=n_fix, eh_fix=eh_fix,
                                  feat_dim=feat_dim, half=host.symmetric)


def pack_chunk(host: HostStore, lo: int, hi: int, spec: StoreChunkSpec):
    """Item range [lo, hi) -> dict of padded compact numpy buffers."""
    a = host.arrays
    n_lo, n_hi = int(a.node_start[lo]), int(a.node_start[hi])
    e_lo, e_hi = int(a.edge_start[lo]), int(a.edge_start[hi])
    n, e, c = n_hi - n_lo, e_hi - e_lo, hi - lo

    feats = np.zeros((spec.n_fix, spec.feat_dim), np.uint8)
    feats[:n] = a.feats[n_lo:n_hi]
    # Bit-pack along the node axis (n_fix % 8 == 0), as wire v1 does.
    feat_bits = np.packbits(feats.T, axis=-1, bitorder='little')
    if spec.coords16:
        # Per-axis fixed-point against the chunk's bounding box: error
        # <= scale/2 per axis (see StoreChunkSpec.coords16).
        real = a.coords[n_lo:n_hi]
        lo3 = real.min(axis=0) if n else np.zeros(3, np.float32)
        hi3 = real.max(axis=0) if n else np.zeros(3, np.float32)
        scale = np.maximum((hi3 - lo3) / 65535.0, 1e-12).astype(np.float32)
        coords_q = np.zeros((spec.n_fix, 3), np.uint16)
        coords_q[:n] = np.clip(
            np.rint((real - lo3) / scale), 0, 65535).astype(np.uint16)
        coord_fields = {'coords_q': coords_q,
                        'coords_lo': lo3.astype(np.float32),
                        'coords_scale': scale}
    else:
        coords = np.zeros((spec.n_fix, 3), np.float32)
        coords[:n] = a.coords[n_lo:n_hi]
        coord_fields = {'coords': coords}

    node_start = np.zeros(spec.items + 1, np.int32)
    node_start[:c + 1] = a.node_start[lo:hi + 1] - n_lo
    node_start[c + 1:] = node_start[c]
    edge_start = np.zeros(spec.items + 1, np.int32)
    edge_start[:c + 1] = a.edge_start[lo:hi + 1] - e_lo
    edge_start[c + 1:] = edge_start[c]
    node_len = np.zeros(spec.items, np.int32)
    node_len[:c] = a.node_len[lo:hi]
    edge_len = np.zeros(spec.items, np.int32)
    edge_len[:c] = a.edge_len[lo:hi]

    y = np.zeros((spec.items,) + a.y.shape[1:], np.float32)
    y[:c] = a.y[lo:hi]
    strain = np.zeros((spec.items, 2), np.float32)
    strain[:c] = a.strain[lo:hi]

    s = a.senders[e_lo:e_hi].astype(np.int32)
    r = a.receivers[e_lo:e_hi].astype(np.int32)
    ec = a.eclass[e_lo:e_hi]
    if spec.raw:
        # Full lists + rperm, smallest lossless dtypes, classes 2-bit:
        # no device-side reconstruction. For SYMMETRIC stores receivers
        # ship implicitly: rperm is the mirror involution, so
        # receivers[k] == senders[rperm[k]] — one device gather replaces
        # 2 bytes/edge of wire.
        fp = np.zeros(spec.eh_fix, a.rperm.dtype)
        fc = np.full(spec.eh_fix, 3, np.uint8)
        fp[:e] = a.rperm[e_lo:e_hi]
        fc[:e] = ec
        e4 = fc.reshape(-1, 4)
        class_bits = (e4[:, 0] | (e4[:, 1] << 2) | (e4[:, 2] << 4)
                      | (e4[:, 3] << 6)).astype(np.uint8)
        if spec.rperm12:
            # Item-local ranks < 4096: pack value pairs into 3 bytes
            # (eh_fix % 4 == 0 so the pairing is exact; padding is 0).
            v = fp.astype(np.uint16)
            v0, v1 = v[0::2], v[1::2]
            rp12 = np.empty((spec.eh_fix // 2, 3), np.uint8)
            rp12[:, 0] = v0 & 0xff
            rp12[:, 1] = ((v0 >> 8) & 0xf) | ((v1 & 0xf) << 4)
            rp12[:, 2] = (v1 >> 4) & 0xff
            edges = {'raw_rperm12': rp12, 'raw_class_bits': class_bits}
        else:
            edges = {'raw_rperm': fp, 'raw_class_bits': class_bits}
        if spec.degrees:
            # Senders as per-(chunk-local)-node out-degrees: edges are
            # lex-sorted per item, so the sender list is exactly the
            # run-length expansion of these counts.
            item_ids = np.repeat(np.arange(c),
                                 np.diff(a.edge_start[lo:hi + 1]))
            g_send = (a.senders[e_lo:e_hi].astype(np.int64)
                      + (a.node_start[lo:hi].astype(np.int64)
                         - n_lo)[item_ids])
            deg = np.bincount(g_send, minlength=spec.n_fix)
            if deg.max(initial=0) >= 65536:
                raise ValueError(
                    'node out-degree exceeds uint16; set '
                    'POINTVS_CHUNK_DEGREES=0 for the explicit-senders '
                    'chunk codec')
            edges['raw_degrees'] = deg.astype(
                np.uint8 if spec.deg8 else np.uint16)
        else:
            fs = np.zeros(spec.eh_fix, a.senders.dtype)
            fs[:e] = a.senders[e_lo:e_hi]
            edges['raw_senders'] = fs
        if not spec.half:   # half==symmetric flag reused: see plan_chunks
            fr = np.zeros(spec.eh_fix, a.receivers.dtype)
            fr[:e] = a.receivers[e_lo:e_hi]
            edges['raw_receivers'] = fr
    elif spec.half:
        keep = s < r                 # per-item lex order is preserved
        hs, hr, hc = s[keep], r[keep], ec[keep]
        half_senders = np.full(spec.eh_fix, np.uint16(0xffff), np.uint16)
        half_receivers = np.full(spec.eh_fix, np.uint16(0xffff), np.uint16)
        half_class = np.full(spec.eh_fix, 3, np.uint8)
        half_senders[:len(hs)] = hs.astype(np.uint16)
        half_receivers[:len(hr)] = hr.astype(np.uint16)
        half_class[:len(hc)] = hc
        e4 = half_class.reshape(-1, 4)
        class_bits = (e4[:, 0] | (e4[:, 1] << 2) | (e4[:, 2] << 4)
                      | (e4[:, 3] << 6)).astype(np.uint8)
        edges = {'half_senders': half_senders,
                 'half_receivers': half_receivers,
                 'half_class_bits': class_bits}
    else:
        fs = np.zeros(spec.eh_fix, np.uint16)
        fr = np.zeros(spec.eh_fix, np.uint16)
        fc = np.full(spec.eh_fix, 3, np.uint8)
        fs[:e] = s.astype(np.uint16)
        fr[:e] = r.astype(np.uint16)
        fc[:e] = ec
        edges = {'full_senders': fs, 'full_receivers': fr,
                 'full_class': fc}
    return {
        'feat_bits': feat_bits, **coord_fields,
        'node_start': node_start, 'edge_start': edge_start,
        'node_len': node_len, 'edge_len': edge_len,
        'y': y, 'strain': strain,
        'n_real': np.int32(n), 'e_real': np.int32(e), **edges,
    }


def expand_chunk(packed: dict, spec: StoreChunkSpec) -> DeviceStoreArrays:
    """Device-side (jit-traceable): packed chunk -> DeviceStoreArrays.

    Half-edge reconstruction (spec.half): rebase the half list to
    chunk-global node ids (disjoint, increasing per item), mirrors-first
    concatenation + one stable argsort by global sender — the wire-v3
    construction — yields the chunk-concatenated per-item lex lists;
    item-local ids and per-item receiver ranks (rperm) then come back by
    subtracting the per-item offsets."""
    import jax.numpy as jnp
    node_start = packed['node_start']
    edge_start = packed['edge_start']
    n_fix, eh = spec.n_fix, spec.eh_fix

    bits = packed['feat_bits']                      # [F, n_fix/8]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    feats = ((bits[:, :, None] >> shifts[None, None, :]) & 1
             ).reshape(spec.feat_dim, n_fix).T      # [n_fix, F] uint8
    if spec.coords16:
        coords = (packed['coords_lo']
                  + packed['coords_q'].astype(jnp.float32)
                  * packed['coords_scale'])
    else:
        coords = packed['coords']

    if spec.raw:
        pos = jnp.arange(eh, dtype=jnp.int32)
        bc = packed['raw_class_bits']
        eclass = ((bc[pos // 4] >> (2 * (pos % 4))) & 3).astype(jnp.uint8)
        item_e = jnp.clip(jnp.searchsorted(
            edge_start.astype(jnp.int32), pos, side='right'
        ).astype(jnp.int32) - 1, 0, spec.items - 1)
        if spec.degrees:
            # Run-length expand the per-node out-degrees back into the
            # item-local sender list: one cumsum + one searchsorted of
            # edge positions into the node offsets (no sorts).
            deg = packed['raw_degrees'].astype(jnp.int32)
            offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(deg)])
            g_send = jnp.clip(jnp.searchsorted(
                offs, pos, side='right').astype(jnp.int32) - 1,
                0, spec.n_fix - 1)
            senders = jnp.where(pos < packed['e_real'],
                                g_send - node_start[item_e],
                                0).astype(jnp.int32)
        else:
            senders = packed['raw_senders'].astype(jnp.int32)
        if spec.rperm12:
            b = packed['raw_rperm12'].astype(jnp.int32)   # [eh/2, 3]
            v0 = b[:, 0] | ((b[:, 1] & 0xf) << 8)
            v1 = (b[:, 1] >> 4) | (b[:, 2] << 4)
            rperm = jnp.stack([v0, v1], axis=1).reshape(-1)
        else:
            rperm = packed['raw_rperm'].astype(jnp.int32)
        if 'raw_receivers' in packed:
            receivers = packed['raw_receivers'].astype(jnp.int32)
        else:
            # Symmetric store: receivers[k] = senders[mirror(k)], with
            # rperm the (item-local) mirror involution.
            receivers = senders[
                jnp.clip(rperm + edge_start[item_e], 0, eh - 1)]
        return DeviceStoreArrays(
            feats=feats, coords=coords,
            senders=senders, receivers=receivers,
            rperm=rperm, eclass=eclass,
            node_start=node_start, edge_start=edge_start,
            node_len=packed['node_len'], edge_len=packed['edge_len'],
            y=packed['y'], strain=packed['strain'])

    if spec.half:
        hs = packed['half_senders'].astype(jnp.int32)
        hr = packed['half_receivers'].astype(jnp.int32)
        pos = jnp.arange(eh, dtype=jnp.int32)
        item_h = jnp.searchsorted(
            edge_start.astype(jnp.int32), pos * 2, side='right'
        ).astype(jnp.int32) - 1
        item_h = jnp.clip(item_h, 0, spec.items - 1)
        off = node_start[item_h]
        real_h = pos * 2 < packed['e_real']
        sentinel = jnp.int32(n_fix)
        hs_g = jnp.where(real_h, hs + off, sentinel)
        hr_g = jnp.where(real_h, hr + off, sentinel)
        bc = packed['half_class_bits']
        hc = ((bc[pos // 4] >> (2 * (pos % 4))) & 3).astype(jnp.uint8)

        all_s = jnp.concatenate([hr_g, hs_g])       # mirrors first
        all_r = jnp.concatenate([hs_g, hr_g])
        perm = jnp.argsort(all_s, stable=True)
        senders_g = all_s[perm]
        receivers_g = all_r[perm]
        eclass = jnp.concatenate([hc, hc])[perm]
        epos = jnp.arange(2 * eh, dtype=jnp.int32)
        item_e = jnp.clip(jnp.searchsorted(
            edge_start.astype(jnp.int32), epos, side='right'
        ).astype(jnp.int32) - 1, 0, spec.items - 1)
        eoff = node_start[item_e]
        real_e = senders_g < sentinel
        senders = jnp.where(real_e, senders_g - eoff, 0)
        receivers = jnp.where(real_e, receivers_g - eoff, 0)
        eclass = jnp.where(real_e, eclass, jnp.uint8(3))
        # Per-item receiver ranks: one stable argsort of the global
        # receivers (padding == sentinel sorts last), rebased per item.
        rp_g = jnp.argsort(
            jnp.where(real_e, receivers_g, jnp.int32(2 * n_fix)),
            stable=True).astype(jnp.int32)
        rperm = jnp.where(real_e, rp_g - edge_start[item_e], 0)
    else:
        epos = jnp.arange(eh, dtype=jnp.int32)
        item_e = jnp.clip(jnp.searchsorted(
            edge_start.astype(jnp.int32), epos, side='right'
        ).astype(jnp.int32) - 1, 0, spec.items - 1)
        real_e = epos < packed['e_real']
        senders = jnp.where(real_e,
                            packed['full_senders'].astype(jnp.int32), 0)
        receivers = jnp.where(
            real_e, packed['full_receivers'].astype(jnp.int32), 0)
        eclass = jnp.where(real_e, packed['full_class'], jnp.uint8(3))
        recv_g = jnp.where(real_e, receivers + node_start[item_e],
                           jnp.int32(2 * n_fix))
        rp_g = jnp.argsort(recv_g, stable=True).astype(jnp.int32)
        rperm = jnp.where(real_e, rp_g - edge_start[item_e], 0)

    return DeviceStoreArrays(
        feats=feats, coords=coords,
        senders=senders.astype(jnp.int32),
        receivers=receivers.astype(jnp.int32),
        rperm=rperm.astype(jnp.int32), eclass=eclass,
        node_start=node_start, edge_start=edge_start,
        node_len=packed['node_len'], edge_len=packed['edge_len'],
        y=packed['y'], strain=packed['strain'])


# --------------------------------------------------------------------- #
# Host-store disk cache: production screening re-scores the same
# featurised library many times — the per-item __getitem__ passes
# (~1 ms/item even fully memory-cached: object construction dominates)
# put a ~1,000 poses/s ceiling on a 100k-pose screen's host prep. One
# flat blob of the BUILT store loads at disk bandwidth instead.

def save_host_store(host: HostStore, path) -> None:
    from pointvs_tpu.data.blob import save_blob
    from pathlib import Path
    path = Path(path)
    names = '\n'.join(host.lig_fnames).encode()
    recs = '\n'.join(host.rec_fnames).encode()
    arrays = {f'a_{k}': v for k, v in host.arrays._asdict().items()}
    arrays.update(
        num_nodes=host.num_nodes, num_edges=host.num_edges,
        sorted_recv=host.sorted_recv,
        lig_fnames=np.frombuffer(names, np.uint8).copy(),
        rec_fnames=np.frombuffer(recs, np.uint8).copy(),
        flags=np.array([int(host.symmetric), int(host.rot),
                        host.aug_from], np.int64))
    tmp = path.with_suffix('.tmp.bin')
    save_blob(tmp, arrays)
    tmp.rename(path)


def load_host_store(path) -> Optional[HostStore]:
    from pathlib import Path
    from pointvs_tpu.data.blob import load_blob
    if not Path(path).exists():
        return None
    b = load_blob(path)
    arrays = DeviceStoreArrays(
        **{k[2:]: v for k, v in b.items() if k.startswith('a_')})
    flags = b['flags']
    nbytes = sum(a.nbytes for a in arrays)
    return HostStore(
        arrays=arrays, num_nodes=b['num_nodes'],
        num_edges=b['num_edges'], sorted_recv=b['sorted_recv'],
        lig_fnames=b['lig_fnames'].tobytes().decode().split('\n'),
        rec_fnames=b['rec_fnames'].tobytes().decode().split('\n'),
        symmetric=bool(flags[0]), rot=bool(flags[1]), nbytes=nbytes,
        aug_from=int(flags[2]), aug_epoch=[0])
