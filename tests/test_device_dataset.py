"""Device-resident dataset tests (data/device_dataset.py).

Gates:
- device-side collation is BIT-IDENTICAL to the host collator
  (buckets.pad_graphs_to_batch) for full, partial and multi-device
  batches, including the windowed-scatter capacity measurement;
- the on-device per-graph rotation produces proper rotations and is
  data-parallel-layout invariant;
- CLI training with --device_cache on matches --device_cache off
  (same seeds, rot off -> same batches, near-identical predictions);
- eligibility gating falls back for per-epoch host randomness.
"""
import numpy as np
import pytest

from pointvs_tpu.data.buckets import (pad_graphs_to_batch, pick_bucket,
                                      stack_device_batches,
                                      DEFAULT_NODE_BUCKETS,
                                      DEFAULT_EDGE_BUCKETS,
                                      batch_scatter_cap)
from pointvs_tpu.data.dataset import PointCloudDataset
from pointvs_tpu.data.device_dataset import (
    DeviceCollateSpec, batch_row_cap, build_host_store, collate_from_ids,
    random_rotations, rotate_per_graph, store_eligibility)

DATA_ROOT = 'tests/resources'
TYPES = 'tests/resources/test.types'


@pytest.fixture(scope='module')
def dataset():
    return PointCloudDataset(DATA_ROOT, types_fname=TYPES, radius=6,
                             edge_radius=4, compact=True,
                             polar_hydrogens=False,
                             model_task='classification', rot=False)


@pytest.fixture(scope='module')
def host_store(dataset):
    return build_host_store(dataset)


def _host_batch(samples, num_graphs, n_pad, e_pad):
    return pad_graphs_to_batch(samples, num_graphs=num_graphs,
                               n_pad=n_pad, e_pad=e_pad, dynamic_cap=True)


def _device_batch(host_store, ids, num_graphs, n_pad, e_pad):
    import jax
    spec = DeviceCollateSpec(n_pad=n_pad, e_pad=e_pad,
                             num_graphs=num_graphs,
                             symmetric=host_store.symmetric, rotate=False)
    fn = jax.jit(lambda store, i: collate_from_ids(store, i, spec))
    return jax.tree.map(np.asarray, fn(
        host_store.arrays, np.asarray(ids, np.int32)))


def _assert_batch_equal(dev, host):
    np.testing.assert_array_equal(dev.node_feats, host.node_feats)
    np.testing.assert_array_equal(dev.coords, host.coords)
    np.testing.assert_array_equal(dev.node_mask, host.node_mask)
    np.testing.assert_array_equal(dev.graph_id, host.graph_id)
    np.testing.assert_array_equal(dev.senders, host.senders)
    np.testing.assert_array_equal(dev.receivers, host.receivers)
    np.testing.assert_array_equal(dev.edge_attr, host.edge_attr)
    np.testing.assert_array_equal(dev.edge_mask, host.edge_mask)
    np.testing.assert_array_equal(dev.y, host.y)
    np.testing.assert_array_equal(dev.graph_mask, host.graph_mask)
    np.testing.assert_array_equal(dev.strain, host.strain)
    np.testing.assert_array_equal(dev.recv_perm, host.recv_perm)
    if host.inv_recv_perm is not None:
        np.testing.assert_array_equal(dev.inv_recv_perm,
                                      host.inv_recv_perm)


def test_collation_bit_exact_full_batch(dataset, host_store):
    n = len(dataset)
    ids = list(range(min(4, n)))
    samples = [dataset[i] for i in ids]
    n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                        DEFAULT_NODE_BUCKETS)
    e_pad = pick_bucket(sum(s.num_edges for s in samples),
                        DEFAULT_EDGE_BUCKETS)
    host = _host_batch(samples, len(ids), n_pad, e_pad)
    dev = _device_batch(host_store, ids, len(ids), n_pad, e_pad)
    _assert_batch_equal(dev, host)
    # Host symmetry detection agrees with the store-level fact.
    assert (host.inv_recv_perm is not None) == host_store.symmetric


def test_collation_partial_and_repeated(dataset, host_store):
    """Short batches (sentinel -1 slots) and with-replacement repeats."""
    ids = [1, 1, 0]
    samples = [dataset[i] for i in ids]
    num_graphs = 5
    n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                        DEFAULT_NODE_BUCKETS)
    e_pad = pick_bucket(sum(s.num_edges for s in samples),
                        DEFAULT_EDGE_BUCKETS)
    host = _host_batch(samples, num_graphs, n_pad, e_pad)
    dev = _device_batch(host_store, ids + [-1, -1], num_graphs,
                        n_pad, e_pad)
    _assert_batch_equal(dev, host)


def test_cap_measurement_matches_host(dataset, host_store):
    ids = [0, 1, 0]
    samples = [dataset[i] for i in ids]
    n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                        DEFAULT_NODE_BUCKETS)
    e_pad = pick_bucket(sum(s.num_edges for s in samples),
                        DEFAULT_EDGE_BUCKETS)
    host = _host_batch(samples, len(ids), n_pad, e_pad)
    assert batch_row_cap(host_store, np.array(ids + [-1]), n_pad) \
        == batch_scatter_cap(host)


def test_rotation_properties(host_store):
    import jax
    key = jax.random.PRNGKey(3)
    ids = np.arange(6, dtype=np.int32)
    mats = np.asarray(random_rotations(key, ids))
    eye = np.eye(3, dtype=np.float32)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)
    # Layout invariance: the same item id gets the same rotation
    # regardless of its slot/device placement.
    mats_b = np.asarray(random_rotations(key, ids[::-1].copy()))
    np.testing.assert_array_equal(mats_b, mats[::-1])
    # Distinct items get distinct rotations.
    assert not np.allclose(mats[0], mats[1])


def test_rotation_preserves_invariants(dataset, host_store):
    import jax
    ids = [0, 1]
    samples = [dataset[i] for i in ids]
    n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                        DEFAULT_NODE_BUCKETS)
    e_pad = pick_bucket(sum(s.num_edges for s in samples),
                        DEFAULT_EDGE_BUCKETS)
    spec = DeviceCollateSpec(n_pad, e_pad, len(ids),
                             host_store.symmetric, rotate=False)
    batch = collate_from_ids(host_store.arrays,
                             np.asarray(ids, np.int32), spec)
    rot = rotate_per_graph(batch, jax.random.PRNGKey(0),
                           np.asarray(ids, np.int32), len(ids))
    c0, c1 = np.asarray(batch.coords), np.asarray(rot.coords)
    # Norms preserved (rotation about the origin, as the host applies).
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1),
                               np.linalg.norm(c0, axis=1), atol=1e-4)
    # Padding rows stay zero.
    pad = np.asarray(batch.node_mask) == 0
    assert np.all(c1[pad] == 0)
    # Pairwise distances within a graph preserved (first graph).
    g0 = np.asarray(batch.graph_id) == 0
    d0 = np.linalg.norm(c0[g0][:, None] - c0[g0][None], axis=-1)
    d1 = np.linalg.norm(c1[g0][:, None] - c1[g0][None], axis=-1)
    np.testing.assert_allclose(d1, d0, atol=1e-3)


def test_rotation_spec_gating():
    """Stores record rot only for datasets whose OWN __getitem__ applies
    it; overriding subclasses that ignore rot must not gain a device
    rotation. The build pass restores the dataset's rot flag."""
    rot_ds = PointCloudDataset(DATA_ROOT, types_fname=TYPES, radius=6,
                               edge_radius=4, compact=True,
                               polar_hydrogens=False,
                               model_task='classification', rot=True)
    host = build_host_store(rot_ds)
    assert host.rot is True
    assert rot_ds.rot is True          # restored after the build pass

    class IgnoresRot(PointCloudDataset):
        def __getitem__(self, item):   # pretend rot-unaware override
            save, self.rot = self.rot, False
            try:
                return super().__getitem__(item)
            finally:
                self.rot = save

    ign = IgnoresRot(DATA_ROOT, types_fname=TYPES, radius=6,
                     edge_radius=4, compact=True, polar_hydrogens=False,
                     model_task='classification', rot=True)
    assert build_host_store(ign).rot is False


def test_eligibility_gates():
    class FakeDS:
        p_remove_entity = 0
        p_noise = -1
        pre_aug_ds_len = 10

        def __len__(self):
            return 10

    ds = FakeDS()
    assert store_eligibility(ds) is None
    ds.p_noise = 0.1
    assert 'p_noise' in store_eligibility(ds)
    ds.p_noise = -1
    ds.pre_aug_ds_len = 8
    assert 'augmented' in store_eligibility(ds)
    ds.pre_aug_ds_len = 10
    ds.p_remove_entity = 0.5
    assert 'p_remove_entity' in store_eligibility(ds)


def test_loader_ids_mode_matches_streaming(dataset, host_store):
    """The ids-mode loader yields the same index stream, buckets and
    metadata as the streaming loader, and the device-collated batches
    equal the streaming collator's output batch-for-batch."""
    import jax
    from pointvs_tpu.data.loader import GraphDataLoader

    class Store:   # minimal DeviceGraphStore stand-in (host == device)
        def __init__(self, host):
            self.host = host
            self.arrays = host.arrays

    kw = dict(batch_size=2, mode='train', num_devices=2, prefetch=0,
              seed=11, drop_last=False)
    stream = GraphDataLoader(dataset, **kw)
    ids_loader = GraphDataLoader(dataset, **kw)
    ids_loader.enable_device_dataset(Store(host_store))
    for (sb, sm), (ib, im) in zip(stream, ids_loader):
        assert ib[0] == 'ids'
        _, ids, store, spec = ib
        assert sm.lig_fnames == im.lig_fnames
        assert sm.cap == im.cap
        np.testing.assert_array_equal(sm.y, im.y)
        np.testing.assert_array_equal(sm.graph_mask, im.graph_mask)
        # Per-device collation parity against the streaming batch.
        fn = jax.jit(lambda s, i: collate_from_ids(s, i, spec))
        for d in range(kw['num_devices']):
            dev = jax.tree.map(np.asarray, fn(store.arrays, ids[d]))
            host_d = jax.tree.map(
                lambda a: None if a is None else np.asarray(a)[d], sb)
            _assert_batch_equal(dev, host_d)


def test_auto_preference_threshold(dataset, monkeypatch):
    """'auto' prefers streaming above POINTVS_DD_AUTO_MB (measured: the
    device store loses to the overlapped wire at ~1 GB scale, BASELINE
    r4) but --device_cache on still forces the store, and small sets
    auto-enable as before."""
    from types import SimpleNamespace
    from pointvs_tpu.data.loader import GraphDataLoader
    from pointvs_tpu.parallel.mesh import get_mesh
    from pointvs_tpu.training.engine import Trainer

    def trainer_like(mode):
        return SimpleNamespace(device_cache=mode, graph_shard=1,
                               _device_stores={}, mesh=get_mesh(1))

    def loader():
        return GraphDataLoader(dataset, batch_size=2, mode='train',
                               num_devices=1, prefetch=0, seed=3)

    enable = Trainer._maybe_enable_device_dataset
    monkeypatch.setenv('POINTVS_DD_AUTO_MB', '0.0001')
    dl = loader()
    enable(trainer_like('auto'), dl)
    assert dl.device_store is None          # auto defers to streaming
    dl = loader()
    enable(trainer_like('on'), dl)
    assert dl.device_store is not None      # explicit on overrides
    monkeypatch.delenv('POINTVS_DD_AUTO_MB')
    dl = loader()
    enable(trainer_like('auto'), dl)
    assert dl.device_store is not None      # small set still auto-enables


def test_cli_device_cache_parity(tmp_path):
    """--device_cache on vs off: identical sampling, near-identical
    training (the only difference is XLA fusion boundaries around the
    prepended collate)."""
    from pointvs_tpu.main import main as train_main

    def preds(path):
        vals = []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    vals.append(float(parts[2]))
        return np.array(vals)

    flags = ['--train_data_root_pose', DATA_ROOT,
             '--train_types_pose', TYPES,
             '--test_data_root_pose', DATA_ROOT,
             '--test_types_pose', TYPES,
             '--layers', '2', '--egnn_attention', '--compact',
             '--prefetch', '0', '-ep', '2', '-b', '2',
             '--num_devices', '1']
    train_main(['egnn', str(tmp_path / 'off'), *flags,
                '--device_cache', 'off'])
    train_main(['egnn', str(tmp_path / 'on'), *flags,
                '--device_cache', 'on'])
    p_off = preds(tmp_path / 'off' / 'pose_predictions.txt')
    p_on = preds(tmp_path / 'on' / 'pose_predictions.txt')
    assert len(p_off) == len(p_on) > 0
    np.testing.assert_allclose(p_on, p_off, atol=5e-5)


# ---------------------------------------------------------------------- #
# Hybrid mode: augmented actives in a capacity-padded, per-epoch-refreshed
# tail region (VERDICT r4 item #2).

def _aug_dataset():
    return PointCloudDataset(DATA_ROOT, types_fname=TYPES, radius=6,
                             edge_radius=4, compact=True,
                             polar_hydrogens=False,
                             model_task='classification', rot=False,
                             augmented_active_count=2,
                             augmented_active_min_angle=30)


def test_hybrid_store_refresh_matches_streaming():
    """Per-epoch aug-tail refresh: device collation stays bit-identical
    to the host collator featurising the SAME epoch (rotations keyed by
    (seed, epoch, item) make the two paths draw identical graphs)."""
    import jax
    from pointvs_tpu.data.device_dataset import DeviceGraphStore
    from pointvs_tpu.parallel.mesh import get_mesh

    ds = _aug_dataset()
    assert ds.pre_aug_ds_len == 2 and len(ds) == 6
    host = build_host_store(ds)
    assert host.aug_from == 2
    store = DeviceGraphStore(host, get_mesh(1))
    ids = list(range(len(ds)))

    prev_aug_coords = None
    for epoch in (0, 1, 2, 1):
        store.refresh(ds, epoch)
        ds.set_epoch(epoch)
        samples = [ds[i] for i in ids]
        n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                            DEFAULT_NODE_BUCKETS)
        e_pad = pick_bucket(sum(s.num_edges for s in samples),
                            DEFAULT_EDGE_BUCKETS)
        host_b = _host_batch(samples, len(ids), n_pad, e_pad)
        spec = DeviceCollateSpec(n_pad=n_pad, e_pad=e_pad,
                                 num_graphs=len(ids),
                                 symmetric=host.symmetric, rotate=False)
        fn = jax.jit(lambda a, i: collate_from_ids(a, i, spec))
        dev = jax.tree.map(np.asarray,
                           fn(store.arrays, np.asarray(ids, np.int32)))
        _assert_batch_equal(dev, host_b)
        # Capacity measurement agrees with the refreshed host arrays.
        assert batch_row_cap(host, np.asarray(ids), n_pad) \
            == batch_scatter_cap(host_b)
        # Aug labels are decoys (0) regardless of epoch.
        assert np.all(np.asarray(dev.y).reshape(-1)[2:6] == 0.0)
        aug_coords = np.asarray(dev.coords).copy()
        if prev_aug_coords is not None:
            # A different epoch actually produced different aug graphs.
            assert not np.array_equal(aug_coords, prev_aug_coords)
        prev_aug_coords = aug_coords


def test_hybrid_spill_free_under_forced_rejections(monkeypatch):
    """Spill-free hybrid refresh (VERDICT r4 #4): with deliberately TINY
    caps (slack 1.0, zero probes — the cap is exactly the unrotated base
    size) many rotation draws exceed the cap, so the retry/fallback path
    runs hot on BOTH the streaming dataset and the hybrid store — and
    they still draw IDENTICAL graphs, every graph fits its slot, and the
    old spill path (stale previous-epoch rotation) never fires."""
    import jax
    from pointvs_tpu.data.device_dataset import DeviceGraphStore
    from pointvs_tpu.parallel.mesh import get_mesh

    # Slack far below 1 shrinks the cap to ~the fallback rotation's size
    # (the cap floors there by construction), so the occasional draw
    # that sweeps extra receptor region gets rejected.
    monkeypatch.setenv('POINTVS_AUG_SLACK_N', '0.05')
    monkeypatch.setenv('POINTVS_AUG_SLACK_E', '0.05')
    monkeypatch.setenv('POINTVS_AUG_PROBES', '1')
    monkeypatch.setenv('POINTVS_AUG_RETRIES', '2')

    ds = _aug_dataset()
    host = build_host_store(ds)
    store = DeviceGraphStore(host, get_mesh(1))
    stream_ds = _aug_dataset()
    ids = list(range(len(ds)))

    for epoch in range(10):
        store.refresh(ds, epoch)     # raises if any draw outgrew a slot
        stream_ds.set_epoch(epoch)
        samples = [stream_ds[i] for i in ids]
        for i in range(stream_ds.pre_aug_ds_len, len(stream_ds)):
            n_cap, e_cap = stream_ds.aug_size_cap(i)
            assert samples[i].num_nodes <= n_cap
            assert samples[i].num_edges <= e_cap
        n_pad = pick_bucket(sum(s.num_nodes for s in samples),
                            DEFAULT_NODE_BUCKETS)
        e_pad = pick_bucket(sum(s.num_edges for s in samples),
                            DEFAULT_EDGE_BUCKETS)
        host_b = _host_batch(samples, len(ids), n_pad, e_pad)
        spec = DeviceCollateSpec(n_pad=n_pad, e_pad=e_pad,
                                 num_graphs=len(ids),
                                 symmetric=host.symmetric, rotate=False)
        fn = jax.jit(lambda a, i: collate_from_ids(a, i, spec))
        dev = jax.tree.map(np.asarray,
                           fn(store.arrays, np.asarray(ids, np.int32)))
        _assert_batch_equal(dev, host_b)

    # The tiny caps actually exercised the reject path (otherwise this
    # test proves nothing) and both paths counted identically.
    assert ds.aug_rejects > 0
    assert ds.aug_rejects == stream_ds.aug_rejects
    assert ds.aug_fallbacks == stream_ds.aug_fallbacks


def test_hybrid_prefetch_refresh_matches_sync():
    """aug_item (the thread-safe explicit-epoch featuriser the background
    prefetch uses) is bit-identical to the sync set_epoch path, and a
    store refreshed via a consumed prefetch equals one refreshed
    synchronously."""
    from pointvs_tpu.data.device_dataset import (DeviceGraphStore,
                                                 _norot_getitem)
    from pointvs_tpu.parallel.mesh import get_mesh

    ds = _aug_dataset()
    for epoch in (0, 3):
        ds.set_epoch(epoch)
        for i in range(ds.pre_aug_ds_len, len(ds)):
            a = ds.aug_item(i, epoch)
            b = _norot_getitem(ds, i)
            np.testing.assert_array_equal(a.node_feats, b.node_feats)
            np.testing.assert_array_equal(a.coords, b.coords)
            np.testing.assert_array_equal(a.senders, b.senders)
            np.testing.assert_array_equal(a.receivers, b.receivers)
            np.testing.assert_array_equal(a.edge_attr, b.edge_attr)
            np.testing.assert_array_equal(a.recv_perm, b.recv_perm)
            assert float(a.y) == float(b.y) == 0.0
            assert (a.lig_fname, a.rec_fname) == (b.lig_fname, b.rec_fname)
    ds.set_epoch(0)

    sync_ds, pf_ds = _aug_dataset(), _aug_dataset()
    sync = DeviceGraphStore(build_host_store(sync_ds), get_mesh(1))
    pf = DeviceGraphStore(build_host_store(pf_ds), get_mesh(1))
    pf.prefetch_refresh(pf_ds, 1)
    assert pf._prefetch is not None
    sync.refresh(sync_ds, 1)
    pf.refresh(pf_ds, 1)          # consumes the prefetched samples
    assert pf._prefetch is None
    for name in sync.host.arrays._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(pf.arrays, name)),
            np.asarray(getattr(sync.arrays, name)), err_msg=name)


def test_hybrid_loader_ids_mode_matches_streaming():
    """Two epochs through REAL loaders: the hybrid ids-mode loader and
    the streaming loader see identical batches (same buckets, metadata
    and bit-identical collation) with augmented actives in play."""
    import jax
    from pointvs_tpu.data.device_dataset import DeviceGraphStore
    from pointvs_tpu.data.loader import GraphDataLoader
    from pointvs_tpu.parallel.mesh import get_mesh

    stream_ds = _aug_dataset()
    ids_ds = _aug_dataset()
    kw = dict(batch_size=3, mode='train', num_devices=1, prefetch=0,
              seed=7, drop_last=False)
    stream = GraphDataLoader(stream_ds, **kw)
    ids_loader = GraphDataLoader(ids_ds, **kw)
    ids_loader.enable_device_dataset(
        DeviceGraphStore(build_host_store(ids_ds), get_mesh(1)))
    for _ in range(2):   # two epochs -> one real tail refresh
        for (sb, sm), (ib, im) in zip(stream, ids_loader):
            assert ib[0] == 'ids'
            _, ids, store, spec = ib
            assert sm.lig_fnames == im.lig_fnames
            assert sm.cap == im.cap
            fn = jax.jit(lambda a, i: collate_from_ids(a, i, spec))
            dev = jax.tree.map(np.asarray, fn(store.arrays, ids[0]))
            host_d = jax.tree.map(
                lambda a: None if a is None else np.asarray(a)[0], sb)
            _assert_batch_equal(dev, host_d)


def test_hybrid_cli_device_cache_parity(tmp_path):
    """CLI training with --augmented_actives: --device_cache on (hybrid
    tail refresh) vs off (streaming) trains to near-identical
    predictions — the flagship quality protocol now rides the flagship
    fast path (VERDICT r3 missing #2)."""
    from pointvs_tpu.main import main as train_main

    def preds(path):
        vals = []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    vals.append(float(parts[2]))
        return np.array(vals)

    flags = ['--train_data_root_pose', DATA_ROOT,
             '--train_types_pose', TYPES,
             '--test_data_root_pose', DATA_ROOT,
             '--test_types_pose', TYPES,
             '--layers', '2', '--egnn_attention', '--compact',
             '--augmented_actives', '2', '--min_aug_angle', '30',
             '--prefetch', '0', '-ep', '3', '-b', '3',
             '--num_devices', '1']
    train_main(['egnn', str(tmp_path / 'off'), *flags,
                '--device_cache', 'off'])
    train_main(['egnn', str(tmp_path / 'on'), *flags,
                '--device_cache', 'on'])
    p_off = preds(tmp_path / 'off' / 'pose_predictions.txt')
    p_on = preds(tmp_path / 'on' / 'pose_predictions.txt')
    assert len(p_off) == len(p_on) > 0
    np.testing.assert_allclose(p_on, p_off, atol=5e-5)


def test_chunk_codec_bit_exact(dataset, host_store):
    """pack_chunk -> expand_chunk reproduces the host store slices
    bit-exactly (both the symmetric-half and full-list codecs), so
    chunked screening scores are byte-identical to the resident path."""
    import jax
    from pointvs_tpu.data.device_dataset import (expand_chunk, pack_chunk,
                                                 plan_chunks)

    ranges, spec = plan_chunks(host_store,
                               budget_bytes=host_store.nbytes / 2 + 1)
    assert len(ranges) >= 2 and spec.raw and spec.degrees
    # Fixed-point coords (the default for screening) are NOT bit-exact —
    # they have their own bound test below; everything here pins the
    # exact codecs.
    assert spec.coords16
    spec = spec._replace(coords16=False)
    full_e = int(max(host_store.arrays.edge_start[hi]
                     - host_store.arrays.edge_start[lo]
                     for lo, hi in ranges))
    # raw degree-encoded (default incl. 12-bit rperm + uint8 degrees),
    # raw with the legacy uint16 fields, raw explicit senders
    assert spec.rperm12 and spec.deg8
    specs = [spec, spec._replace(rperm12=False, deg8=False),
             spec._replace(degrees=False)]
    if host_store.symmetric:   # the symmetric-HALF reconstruction codec
        specs.append(spec._replace(
            raw=False, half=True,
            eh_fix=-(-(full_e // 2) // 4) * 4))
    # full-list codec (rperm recomputed by one device argsort)
    specs.append(spec._replace(raw=False, half=False, eh_fix=full_e))
    a = host_store.arrays
    for sp in specs:
        expand = jax.jit(lambda p: expand_chunk(p, sp))
        for lo, hi in ranges:
            packed = pack_chunk(host_store, lo, hi, sp)
            got = jax.tree.map(np.asarray, expand(packed))
            n_lo, n_hi = int(a.node_start[lo]), int(a.node_start[hi])
            e_lo, e_hi = int(a.edge_start[lo]), int(a.edge_start[hi])
            n, e, c = n_hi - n_lo, e_hi - e_lo, hi - lo
            np.testing.assert_array_equal(got.feats[:n],
                                          a.feats[n_lo:n_hi])
            np.testing.assert_array_equal(got.coords[:n],
                                          a.coords[n_lo:n_hi])
            np.testing.assert_array_equal(
                got.senders[:e], a.senders[e_lo:e_hi].astype(np.int32))
            np.testing.assert_array_equal(
                got.receivers[:e],
                a.receivers[e_lo:e_hi].astype(np.int32))
            np.testing.assert_array_equal(
                got.rperm[:e], a.rperm[e_lo:e_hi].astype(np.int32))
            np.testing.assert_array_equal(got.eclass[:e],
                                          a.eclass[e_lo:e_hi])
            np.testing.assert_array_equal(got.node_len[:c],
                                          a.node_len[lo:hi])
            np.testing.assert_array_equal(got.edge_len[:c],
                                          a.edge_len[lo:hi])
            np.testing.assert_array_equal(
                got.node_start[:c + 1],
                a.node_start[lo:hi + 1] - a.node_start[lo])
            np.testing.assert_array_equal(got.y[:c], a.y[lo:hi])
            # Collation from the chunk == collation from the global
            # store for a batch of this chunk's items.
            ids_g = np.arange(lo, hi, dtype=np.int32)
            ids_l = np.arange(0, hi - lo, dtype=np.int32)
            cspec = DeviceCollateSpec(
                n_pad=256, e_pad=8192, num_graphs=hi - lo,
                symmetric=host_store.symmetric, rotate=False)
            cg = jax.tree.map(np.asarray, jax.jit(
                lambda s, i: collate_from_ids(s, i, cspec))(a, ids_g))
            cl = jax.tree.map(np.asarray, jax.jit(
                lambda s, i: collate_from_ids(s, i, cspec))(got, ids_l))
            _assert_batch_equal(cl, cg)


def test_chunk_coords16_bound(host_store):
    """Fixed-point chunk coords (6 B/node wire) reconstruct within the
    documented per-axis bound scale/2 = extent/131070, and everything
    ELSE in the chunk stays bit-exact (the quantisation touches only the
    coordinate field)."""
    import jax
    from pointvs_tpu.data.device_dataset import (expand_chunk, pack_chunk,
                                                 plan_chunks)

    ranges, spec = plan_chunks(host_store,
                               budget_bytes=host_store.nbytes / 2 + 1)
    assert spec.coords16
    a = host_store.arrays
    expand = jax.jit(lambda p: expand_chunk(p, spec))
    for lo, hi in ranges:
        packed = pack_chunk(host_store, lo, hi, spec)
        got = jax.tree.map(np.asarray, expand(packed))
        n_lo, n_hi = int(a.node_start[lo]), int(a.node_start[hi])
        e_lo, e_hi = int(a.edge_start[lo]), int(a.edge_start[hi])
        n, e = n_hi - n_lo, e_hi - e_lo
        real = a.coords[n_lo:n_hi]
        extent = real.max(axis=0) - real.min(axis=0)
        # scale/2 quantisation + a little f32 arithmetic slack (the
        # pack-side division and the device-side q*scale multiply each
        # round once more).
        bound = extent / 131070.0 * 1.01 + 1e-5
        err = np.abs(got.coords[:n] - real)
        assert (err <= bound[None, :]).all(), \
            f'coords16 error {err.max()} exceeds bound {bound}'
        np.testing.assert_array_equal(got.feats[:n], a.feats[n_lo:n_hi])
        np.testing.assert_array_equal(
            got.senders[:e], a.senders[e_lo:e_hi].astype(np.int32))
        np.testing.assert_array_equal(
            got.receivers[:e], a.receivers[e_lo:e_hi].astype(np.int32))
        np.testing.assert_array_equal(
            got.rperm[:e], a.rperm[e_lo:e_hi].astype(np.int32))


def test_chunk_rperm12_gated_on_item_edge_count(host_store):
    """12-bit rperm packing requires every item to have < 4096 edges
    (ranks are item-local); a store with a larger item falls back to
    plain uint16 automatically. uint8 degrees likewise require the max
    out-degree to fit a byte."""
    from pointvs_tpu.data.device_dataset import plan_chunks

    _, spec = plan_chunks(host_store, budget_bytes=host_store.nbytes)
    assert spec.rperm12 and spec.deg8
    el = host_store.arrays.edge_len.copy()
    el[0] = 4096
    big = host_store._replace(arrays=host_store.arrays._replace(
        edge_len=el))
    _, spec_big = plan_chunks(big, budget_bytes=host_store.nbytes)
    assert not spec_big.rperm12


def test_chunk_ranges_respect_budget(host_store):
    """plan_chunks' documented contract: every multi-item range's
    EXPANDED device bytes (int32 edge triples + eclass = 13 B/edge,
    uint8 feats + f32 coords = feat_dim + 12 B/node — the arrays that
    actually occupy HBM while ~2 chunks stay live) fit budget_bytes;
    a single over-budget item is unsplittable and exempt. The balanced
    splitter lands boundaries on item edges, so without the retry loop
    a range could overshoot by up to one item and inflate every chunk's
    fixed shapes — and splitting on the ~3x-smaller wire bytes built
    chunks that crashed the TPU worker on a heavy library."""
    from pointvs_tpu.data.device_dataset import plan_chunks

    a = host_store.arrays
    n_items = len(host_store.num_nodes)
    per_item = (np.diff(a.node_start) * float(a.feats.shape[1] + 12)
                + np.diff(a.edge_start) * 13.0)
    # A budget just under half the total: naive k=2 splitting puts the
    # boundary mid-item and one side overshoots for most size mixes.
    for frac in (0.51, 0.34, 0.26):
        budget = float(per_item.sum()) * frac
        ranges, _ = plan_chunks(host_store, budget_bytes=budget)
        assert ranges and ranges[0][0] == 0 and ranges[-1][1] == n_items
        for (lo, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi == lo2   # contiguous, no gaps
        for lo, hi in ranges:
            if hi - lo > 1:
                est = float(per_item[lo:hi].sum())
                assert est <= budget * 1.001, (lo, hi, est, budget)


def test_chunk_degrees_gated_on_uint16_rperm(host_store):
    """Degree-encoded senders require uint16 counts; a store whose rperm
    is int32 (some item >= 65536 edges, so out-degrees could overflow)
    must fall back to the explicit-senders chunk codec automatically."""
    from pointvs_tpu.data.device_dataset import plan_chunks

    _, spec = plan_chunks(host_store, budget_bytes=host_store.nbytes)
    assert spec.degrees    # uint16 rperm fixture: degrees eligible
    wide = host_store._replace(arrays=host_store.arrays._replace(
        rperm=host_store.arrays.rperm.astype(np.int32)))
    _, spec32 = plan_chunks(wide, budget_bytes=host_store.nbytes)
    assert not spec32.degrees
