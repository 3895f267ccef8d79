"""The numpy struct-dict fast path must produce identical samples to the
reference-semantics pandas path, and the wire format must round-trip
exactly."""
import numpy as np
import pytest

from pointvs_tpu.data.dataset import PointCloudDataset

from .setup_and_params import RESOURCES


def _dataset(**kwargs):
    return PointCloudDataset(
        RESOURCES, radius=6, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification',
        in_memory_cache=False, **kwargs)


def test_fast_path_matches_pandas_path(monkeypatch):
    ds = _dataset()
    fast = ds[0]

    # Force the pandas path by pretending augmentation is requested for
    # the struct build (aug_angle=0 still, so geometry is identical).
    import pointvs_tpu.data.dataset as dsmod
    orig = PointCloudDataset._build_struct

    def pandas_build(self, lig, rec, aug_angle, rng=None):
        from pointvs_tpu.data import fast_structs as fs
        from pointvs_tpu.data.preprocessing import concat_structs, make_box
        struct = make_box(
            concat_structs(rec, lig, self.n_features,
                           min_lig_rotation=aug_angle,
                           extended=self.extended_atom_types,
                           rng=self.rng),
            radius=self.radius, relative_to_ligand=True)
        struct = {k: struct[k].to_numpy() for k in fs.KEYS}
        if not self.polar_hydrogens:
            struct = fs.subset(struct, struct['atomic_number'] > 1)
        return struct

    monkeypatch.setattr(PointCloudDataset, '_build_struct', pandas_build)
    slow = _dataset()[0]

    np.testing.assert_array_equal(fast.node_feats, slow.node_feats)
    np.testing.assert_array_equal(fast.coords, slow.coords)
    np.testing.assert_array_equal(fast.senders, slow.senders)
    np.testing.assert_array_equal(fast.receivers, slow.receivers)
    np.testing.assert_array_equal(fast.edge_attr, slow.edge_attr)


def test_wire_v1_fallback_roundtrip():
    """Batches violating the v2 invariants (unsorted senders) must fall
    back to the v1 wire format and still round-trip exactly."""
    import jax
    from pointvs_tpu.data.buckets import pad_graphs_to_batch, \
        stack_device_batches
    from pointvs_tpu.data.wire import (WireBatch, compress, decompress,
                                       pack_stacked, stacked_template,
                                       unpack)
    ds = _dataset()
    batch = pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)
    # Swap the first and last REAL edges so senders are no longer sorted.
    senders = np.asarray(batch.senders).copy()
    receivers = np.asarray(batch.receivers).copy()
    attr = np.asarray(batch.edge_attr).copy()
    last = int(np.asarray(batch.edge_mask).sum()) - 1
    assert senders[0] != senders[last]
    senders[[0, last]] = senders[[last, 0]]
    receivers[[0, last]] = receivers[[last, 0]]
    attr[[0, last]] = attr[[last, 0]]
    batch = batch._replace(senders=senders, receivers=receivers,
                           edge_attr=attr)
    stacked = stack_device_batches([batch])
    wire = compress(stacked)
    assert isinstance(wire, WireBatch)
    template = stacked_template(wire)

    @jax.jit
    def roundtrip(b):
        return decompress(unpack(b[0], template))

    got = roundtrip(pack_stacked(wire))
    for field in ('node_feats', 'coords', 'senders', 'receivers',
                  'edge_attr', 'edge_mask', 'node_mask', 'graph_id', 'y',
                  'graph_mask', 'strain'):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(batch, field)), err_msg=field)


@pytest.mark.parametrize('fmt', ['v1', 'v2', 'v3'])
def test_wire_roundtrip(fmt, monkeypatch):
    """All wire formats round-trip exactly (v3 symmetric-half is the
    train-path default for collator-symmetric batches; v2 auto-cuts-over
    at n_pad >= 65536; v1 is the general fallback — see wire.compress).
    The field loop covers recv_perm/inv_recv_perm, pinning v3's exact
    edge-order reconstruction, not just multiset equality."""
    import jax
    from pointvs_tpu.data.buckets import pad_graphs_to_batch, \
        stack_device_batches
    from pointvs_tpu.data.wire import (WireBatch, WireBatchV2, WireBatchV3,
                                       compress, decompress, pack_stacked,
                                       stacked_template, unpack)
    if fmt == 'v1':
        monkeypatch.setenv('POINTVS_WIRE_V3', '0')
    ds = _dataset()
    batch = pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)
    stacked = stack_device_batches([batch])
    wire = compress(stacked, prefer_v2=(fmt == 'v2'))
    expected = {'v1': WireBatch, 'v2': WireBatchV2, 'v3': WireBatchV3}[fmt]
    assert isinstance(wire, expected)
    buf = pack_stacked(wire)
    template = stacked_template(wire)
    # The symmetric flag rides beside the template on the real packed
    # path (engine._to_device) — decompress rebuilds inv_recv_perm from
    # it so the roundtrip covers EVERY GraphBatch field.
    sym = batch.inv_recv_perm is not None

    @jax.jit
    def roundtrip(b):
        return decompress(unpack(b[0], template), symmetric=sym)

    got = roundtrip(buf)
    for field in batch._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(batch, field)), err_msg=field)


def test_symhalf_native_matches_numpy(monkeypatch):
    """The C++ pvs_symhalf extraction must produce byte-identical v3
    wires to the numpy fallback (same eligibility verdicts included)."""
    from pointvs_tpu.data.buckets import pad_graphs_to_batch, \
        stack_device_batches
    from pointvs_tpu.data import wire as wire_mod
    from pointvs_tpu.native.build import get_graphops
    if get_graphops() is None:
        pytest.skip('native graphops unavailable')
    ds = _dataset()
    stacked = stack_device_batches(
        [pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)])
    native = wire_mod.compress(stacked)
    assert isinstance(native, wire_mod.WireBatchV3)
    monkeypatch.setattr('pointvs_tpu.native.build.native_symhalf',
                        lambda *a, **k: None)
    fallback = wire_mod.compress(stacked)
    assert isinstance(fallback, wire_mod.WireBatchV3)
    for name, a, b in zip(native._fields, native, fallback):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_symmetric_gather_pair_matches_general_path():
    """The collator-verified symmetric fast path (GraphBatch.inv_recv_perm
    -> EdgeAggregator.gather_pair: one node gather, ONE backward scatter)
    must match the general two-scatter path in forward AND parameter/coord
    gradients. Covers f32 (gather_pair) and bf16-features
    (gather_hc_pair) variants."""
    import jax
    import jax.numpy as jnp
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    from pointvs_tpu.models import build_model
    from pointvs_tpu.training.losses import loss_fn
    from .setup_and_params import FAST_MODEL_KWARGS

    ds = _dataset()
    batch = pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)
    assert batch.inv_recv_perm is not None, \
        'radius-graph batches must be collator-verified symmetric'
    stripped = batch._replace(inv_recv_perm=None)

    for bf16 in (False, True):
        model = build_model('egnn', bf16=bf16, **FAST_MODEL_KWARGS)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), stripped)

        def lo(p, b):
            s, w = loss_fn(model.apply(p, b), b, 'classification', 'mse')
            return s / jnp.maximum(w, 1.0)

        for wrt, label in ((lambda b: jax.value_and_grad(lo)(params, b),
                            'params'),):
            v_gen, g_gen = jax.jit(wrt)(stripped)
            v_sym, g_sym = jax.jit(wrt)(batch)
            np.testing.assert_allclose(np.asarray(v_sym),
                                       np.asarray(v_gen), atol=1e-6,
                                       err_msg=f'{label} bf16={bf16}')
            tol = 2e-3 if bf16 else 1e-5
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=tol, rtol=1e-4),
                g_sym, g_gen)
