"""Native graph-ops kernels vs brute-force numpy references.

The radius-edge kernel (pointvs_tpu/native/graphops.cpp) switched to a
cell-list grid; this pins exact ordering parity (inter block then intra
block, row-major, ascending cols — reference generate_edges semantics,
/root/reference/point_vs/preprocessing/preprocessing.py:68-155) against a
dense O(N^2) reference on clouds large enough to take the grid path.
"""
import numpy as np
import pytest

from pointvs_tpu.native.build import (
    get_graphops, native_box_filter, native_radius_edges)

pytestmark = pytest.mark.skipif(get_graphops() is None,
                                reason='no native library / compiler')


def _dense_edges(xyz, bp, inter_r, intra_r):
    n = len(bp)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    eps2 = 1e-14
    rows, cols, attrs = [], [], []
    for i in range(n):
        for j in range(n):
            if bp[i] != bp[j] and eps2 < d2[i, j] < inter_r ** 2:
                rows.append(i), cols.append(j), attrs.append(1)
    for i in range(n):
        for j in range(n):
            if eps2 < d2[i, j] < intra_r ** 2:
                rows.append(i), cols.append(j)
                attrs.append(2 if (bp[i] == 1 and bp[j] == 1) else 0)
    return np.array(rows), np.array(cols), np.array(attrs)


@pytest.mark.parametrize('inter_r,intra_r',
                         [(4.0, 4.0), (4.0, 2.0), (10.0, 2.0)])
def test_grid_edges_match_dense_reference(inter_r, intra_r):
    rng = np.random.RandomState(7)
    for _ in range(3):
        n = int(rng.randint(100, 300))   # > 64: grid path
        xyz = rng.rand(n, 3) * rng.uniform(10, 35)
        bp = (rng.rand(n) < 0.7).astype(np.int32)
        r1, c1, a1, _ = native_radius_edges(xyz, bp, inter_r, intra_r,
                                            prune=False)
        r2, c2, a2 = _dense_edges(xyz, bp, inter_r, intra_r)
        assert np.array_equal(r1, r2)
        assert np.array_equal(c1, c2)
        assert np.array_equal(a1, a2)


def test_box_filter_matches_numpy():
    rng = np.random.RandomState(3)
    lig = rng.rand(25, 3) * 10
    rec = rng.rand(3000, 3) * 60 - 25
    keep = native_box_filter(lig, rec, 10.0)
    d = np.sqrt(((lig[:, None, :] - rec[None, :, :]) ** 2).sum(-1))
    ref = np.where((d < 10.0).any(axis=0))[0]
    assert np.array_equal(keep, ref)
