"""Shared-receptor screening fast path: graphs must match the standard
per-item pipeline EXACTLY (same node rows, same multiset of
(sender, receiver, class) edges — including the reference's intra-block
duplicate-edge quirk)."""
import numpy as np
import pytest

from pointvs_tpu.data.dataset import PointCloudDataset
from pointvs_tpu.data.shared_receptor import SharedReceptorDataset

from .setup_and_params import RESOURCES


def _edge_multiset(sample):
    cls = np.argmax(np.asarray(sample.edge_attr), axis=1)
    trip = np.stack([np.asarray(sample.senders),
                     np.asarray(sample.receivers), cls], axis=1)
    return sorted(map(tuple, trip.tolist()))


@pytest.mark.parametrize('kwargs', [
    dict(radius=6, edge_radius=4, estimate_bonds=False),
    dict(radius=8, edge_radius=4, estimate_bonds=True),
    dict(radius=4, edge_radius=6, estimate_bonds=False),
])
def test_shared_receptor_matches_standard_pipeline(kwargs):
    common = dict(
        compact=True, polar_hydrogens=False,
        types_fname=RESOURCES / 'test.types', rot=False,
        model_task='classification', **kwargs)
    std = PointCloudDataset(RESOURCES, **common)
    fast = SharedReceptorDataset(RESOURCES, **common)
    assert len(std) == len(fast)
    for i in range(len(std)):
        a, b = std[i], fast[i]
        assert a.num_nodes == b.num_nodes, (i, a.num_nodes, b.num_nodes)
        np.testing.assert_array_equal(np.asarray(a.node_feats),
                                      np.asarray(b.node_feats))
        np.testing.assert_allclose(np.asarray(a.coords),
                                   np.asarray(b.coords), atol=1e-6)
        assert a.num_edges == b.num_edges, (i, a.num_edges, b.num_edges)
        assert _edge_multiset(a) == _edge_multiset(b)
        # the per-sample perms must actually sort receivers
        rb = np.asarray(b.receivers)[np.asarray(b.recv_perm)]
        assert np.all(rb[1:] >= rb[:-1])
        # lex (sender, receiver) order — the base _edges_for contract:
        # qualifies batches for wire v3 and makes recv_perm a mirror
        # involution (device_dataset symmetric fast path). Regression:
        # the fast path used to sort by sender only.
        sl, rl = np.asarray(b.senders), np.asarray(b.receivers)
        if len(sl) > 1:
            assert np.all((sl[1:] > sl[:-1])
                          | ((sl[1:] == sl[:-1]) & (rl[1:] >= rl[:-1])))
        rp = np.asarray(b.recv_perm)
        assert np.array_equal(rl[rp], sl) and np.array_equal(sl[rp], rl)


def test_shared_receptor_fallback_paths():
    """Configs the fast path cannot reproduce exactly must fall back to
    the standard pipeline (prune on)."""
    common = dict(
        compact=True, polar_hydrogens=False,
        types_fname=RESOURCES / 'test.types', rot=False,
        model_task='classification', radius=6, edge_radius=4, prune=True)
    std = PointCloudDataset(RESOURCES, **common)
    fast = SharedReceptorDataset(RESOURCES, **common)
    for i in range(len(std)):
        a, b = std[i], fast[i]
        assert a.num_nodes == b.num_nodes
        assert _edge_multiset(a) == _edge_multiset(b)
