"""Shared-receptor screening dataset: amortise receptor work across a
whole ligand library.

In library screening every item pairs the SAME receptor with a different
ligand. The standard pipeline re-does, per pose: the pocket box over all
receptor atoms, and a radius-edge search whose pairs are >90%
receptor-receptor (identical across poses up to the pocket subset).
This dataset precomputes, once per receptor:

- the (H-filtered) receptor struct + its full receptor-receptor intra
  edge list (radius edges are pairwise-local, so the pocket's rec-rec
  edges are EXACTLY the restriction of the full-receptor list to the
  pocket's atoms);
- a uniform cell grid over the receptor atoms for pocket selection and
  ligand-receptor pair queries.

Per pose only ligand-sized work remains: grid queries for the pocket
subset and lig-rec pairs, the tiny lig-lig pair block, and the edge-list
restriction. Semantics match data/preprocessing.generate_edges exactly —
including the intra-block duplicate-edge quirk (ref preprocessing.py:
119-137) — and are pinned against the standard pipeline by
tests/test_shared_receptor.py.

The fast path gates itself off (falling back to the standard pipeline)
for configurations whose semantics are not pairwise-local: BFS pruning,
bp entity filtering, ligand rotation/augmentation.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pointvs_tpu.data.dataset import PointCloudDataset, _stable_argsort_ids


class _RecGrid:
    """Uniform cell grid over receptor coordinates (numpy, built once)."""

    def __init__(self, xyz: np.ndarray, cell: float):
        self.xyz = xyz
        self.cell = float(max(cell, 1e-6))
        keys = np.floor(xyz / self.cell).astype(np.int64)
        self.min_key = keys.min(axis=0) if len(keys) else np.zeros(3,
                                                                   np.int64)
        k = keys - self.min_key
        self.dims = (k.max(axis=0) + 1) if len(k) else np.ones(3, np.int64)
        flat = (k[:, 0] * self.dims[1] + k[:, 1]) * self.dims[2] + k[:, 2]
        order = np.argsort(flat, kind='stable')
        self.sorted_idx = order.astype(np.int64)
        self.sorted_flat = flat[order]

    def _candidates(self, points: np.ndarray, radius: float):
        """(owner point idx, receptor idx, dist^2) for every receptor
        atom in a cell within ``radius`` of each point — fully
        vectorised (one searchsorted batch + one distance pass)."""
        empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                 np.zeros(0))
        if not len(self.xyz) or not len(points):
            return empty
        nr = int(np.ceil(radius / self.cell))
        span = np.arange(-nr, nr + 1)
        offs = np.stack(np.meshgrid(span, span, span,
                                    indexing='ij'), axis=-1).reshape(-1, 3)
        k = np.floor(points / self.cell).astype(np.int64) - self.min_key
        cells3 = k[:, None, :] + offs[None, :, :]          # [L, M, 3]
        valid = np.all((cells3 >= 0) & (cells3 < self.dims), axis=-1)
        owner3 = np.broadcast_to(
            np.arange(len(points), dtype=np.int64)[:, None], valid.shape)
        cells3 = cells3[valid]
        owners = owner3[valid]
        flat = ((cells3[:, 0] * self.dims[1] + cells3[:, 1])
                * self.dims[2] + cells3[:, 2])
        lo = np.searchsorted(self.sorted_flat, flat, side='left')
        hi = np.searchsorted(self.sorted_flat, flat, side='right')
        counts = hi - lo
        total = int(counts.sum())
        if not total:
            return empty
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(total, dtype=np.int64) - starts \
            + np.repeat(lo, counts)
        cand = self.sorted_idx[pos]
        owner = np.repeat(owners, counts)
        diff = self.xyz[cand] - points[owner]
        d2 = np.einsum('ij,ij->i', diff, diff)
        keep = d2 < radius * radius
        return owner[keep], cand[keep], d2[keep]

    def query(self, points: np.ndarray, radius: float) -> np.ndarray:
        """Indices (sorted unique) of receptor atoms within ``radius`` of
        any query point."""
        _, cand, _ = self._candidates(points, radius)
        return np.unique(cand)

    def pairs(self, points: np.ndarray, radius: float):
        """(point_idx, rec_idx, dist2) for all pairs within ``radius``."""
        return self._candidates(points, radius)


class _SharedReceptor:
    """Once-per-receptor precomputation."""

    def __init__(self, rec_struct: Dict[str, np.ndarray],
                 polar_hydrogens: bool, intra_radius: float,
                 query_radius: float):
        self.rec_all = rec_struct
        self.all_xyz = np.stack([rec_struct['x'], rec_struct['y'],
                                 rec_struct['z']], axis=1).astype(
                                     np.float64)
        if polar_hydrogens:
            self.f_of_all = np.arange(len(self.all_xyz))
            self.rec_f = rec_struct
        else:
            keep = rec_struct['atomic_number'] > 1
            self.f_of_all = np.cumsum(keep) - 1       # all idx -> f idx
            self.f_of_all[~keep] = -1
            self.rec_f = {k: v[keep] for k, v in rec_struct.items()}
        self.f_xyz = np.stack([self.rec_f['x'], self.rec_f['y'],
                               self.rec_f['z']], axis=1).astype(np.float64)
        # Grids: selection runs on ALL atoms (the standard path boxes
        # BEFORE the H filter); pair queries run on the filtered atoms.
        self.grid_all = _RecGrid(self.all_xyz, cell=4.0)
        self.grid_f = _RecGrid(self.f_xyz, cell=4.0)
        del query_radius

        # Full-receptor rec-rec intra edges on the FILTERED atoms (edges
        # are generated after the H filter in the standard path), stored
        # CSR-style (row-sorted + offsets) so the per-pose restriction
        # gathers only the pocket rows' slices instead of masking the
        # whole receptor's edge list.
        rows, cols, _ = _all_pairs_within(self.f_xyz, self.grid_f,
                                          intra_radius)
        order = np.argsort(rows, kind='stable')
        self.rr_rows = rows[order].astype(np.int64)
        self.rr_cols = cols[order].astype(np.int64)
        counts = np.bincount(self.rr_rows, minlength=len(self.f_xyz))
        self.rr_offsets = np.concatenate(
            [[0], np.cumsum(counts)]).astype(np.int64)

    def rr_restrict(self, sel_f: np.ndarray, inv: np.ndarray):
        """Pocket rec-rec edges: (rows, cols) reindexed to pocket-local
        ids, gathered from the CSR slices of the selected rows."""
        lo = self.rr_offsets[sel_f]
        hi = self.rr_offsets[sel_f + 1]
        counts = hi - lo
        total = int(counts.sum())
        if not total:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(total, dtype=np.int64) - starts \
            + np.repeat(lo, counts)
        rows = self.rr_rows[pos]
        cols = self.rr_cols[pos]
        new_cols = inv[cols]
        keep = new_cols >= 0
        return inv[rows[keep]], new_cols[keep]


def _all_pairs_within(xyz: np.ndarray, grid: _RecGrid, radius: float):
    """All ordered pairs (i != j, dist in (1e-7, radius))."""
    pi, ri, d2 = grid.pairs(xyz, radius)
    keep = (pi != ri) & (d2 > 1e-14)
    return pi[keep], ri[keep], d2[keep]


class SharedReceptorDataset(PointCloudDataset):
    """PointCloudDataset with the shared-receptor fast path (see module
    docstring). Safe generally: items whose configuration the fast path
    cannot reproduce exactly fall back to the standard pipeline."""

    _shared_cache: Dict[str, _SharedReceptor] = {}

    def _fast_path_ok(self, aug_angle: float) -> bool:
        return (not aug_angle and self.bp is None and not self.prune
                and self.edge_radius >= 0 and not self.rot)

    def _shared_for(self, rec_fname) -> Optional[_SharedReceptor]:
        from pointvs_tpu.data import fast_structs as fs
        edge_radius = self.edge_radius if self.edge_radius > 0 else 4
        intra_radius = 2.0 if self.estimate_bonds else edge_radius
        key = (str(rec_fname), bool(self.polar_hydrogens),
               float(intra_radius))
        if key not in self._shared_cache:
            self._shared_cache[key] = _SharedReceptor(
                fs.read_struct(str(rec_fname)), self.polar_hydrogens,
                intra_radius, self.radius)
        return self._shared_cache[key]

    def _build_graph(self, lig_fname, rec_fname, aug_angle: float,
                     rng=None):
        if not self._fast_path_ok(aug_angle) or \
                str(lig_fname).rsplit('.', 1)[-1] != 'parquet' or \
                str(rec_fname).rsplit('.', 1)[-1] != 'parquet':
            return super()._build_graph(lig_fname, rec_fname, aug_angle,
                                        rng=rng)
        from pointvs_tpu.data import fast_structs as fs
        shared = self._shared_for(rec_fname)
        lig_all = fs.read_struct(str(lig_fname))
        lig_xyz_all = np.stack([lig_all['x'], lig_all['y'],
                                lig_all['z']], axis=1).astype(np.float64)

        # Pocket selection on UNFILTERED atoms (standard path boxes
        # before the H filter), then apply the H filter to both sides.
        sel_all = shared.grid_all.query(lig_xyz_all, self.radius)
        if self.polar_hydrogens:
            lig = lig_all
            sel_f = sel_all
        else:
            lig = fs.subset(lig_all, lig_all['atomic_number'] > 1)
            sel_f = shared.f_of_all[sel_all]
            sel_f = sel_f[sel_f >= 0]
        rec_sub = {k: v[sel_f] for k, v in shared.rec_f.items()}

        # Assemble the pocket struct: ligand rows first, receptor types
        # offset (concat_structs_np + box_np ordering).
        n_lig = len(lig['bp'])
        struct = fs.concat_structs_np(rec_sub, lig, self.n_features,
                                      extended=self.extended_atom_types)
        if self.use_atomic_numbers:
            z = np.minimum(struct['atomic_number'], 129)
            struct = dict(struct)
            struct['types'] = (self._z_lut[z]
                               + struct['bp'] * self.n_features)

        edge_radius = self.edge_radius if self.edge_radius > 0 else 4
        intra_radius = 2.0 if self.estimate_bonds else edge_radius
        lig_xyz = np.stack([lig['x'], lig['y'], lig['z']],
                           axis=1).astype(np.float64)

        # lig-rec pairs against the FILTERED receptor, once at the larger
        # cutoff; reuse distances for both blocks.
        li, ri_f, d2 = shared.grid_f.pairs(lig_xyz, max(edge_radius,
                                                        intra_radius))
        # keep only pairs into the pocket subset, reindexed to subset ids
        inv = np.full(len(shared.rec_f['bp']), -1, np.int64)
        inv[sel_f] = np.arange(len(sel_f))
        in_pocket = inv[ri_f] >= 0
        li, rj, d2 = li[in_pocket], inv[ri_f[in_pocket]], d2[in_pocket]
        rj_struct = rj + n_lig
        nontrivial = d2 > 1e-14

        blocks_r, blocks_c, blocks_a = [], [], []

        def emit(r, c, a):
            blocks_r.append(r)
            blocks_c.append(c)
            blocks_a.append(np.full(len(r), a, np.int32))

        # Inter block (class 1, both directions, < edge_radius).
        m = (d2 < edge_radius ** 2) & nontrivial
        emit(li[m], rj_struct[m], 1)
        emit(rj_struct[m], li[m], 1)

        # Intra block — deliberately not bp-filtered (the reference
        # quirk): lig-lig (class 0), lig-rec both directions (class 0),
        # rec-rec (class 2, restricted from the precomputed full list).
        ld = lig_xyz[:, None, :] - lig_xyz[None, :, :]
        ld2 = np.einsum('ijk,ijk->ij', ld, ld)
        ii, jj = np.where((ld2 < intra_radius ** 2) & (ld2 > 1e-14))
        emit(ii.astype(np.int64), jj.astype(np.int64), 0)
        m = (d2 < intra_radius ** 2) & nontrivial
        emit(li[m], rj_struct[m], 0)
        emit(rj_struct[m], li[m], 0)
        rr_r, rr_c = shared.rr_restrict(sel_f, inv)
        emit(rr_r + n_lig, rr_c + n_lig, 2)

        rows = np.concatenate(blocks_r).astype(np.int32)
        cols = np.concatenate(blocks_c).astype(np.int32)
        attrs = np.concatenate(blocks_a)
        n_nodes = len(struct['bp'])
        # LEX sort by (sender, receiver) — not sender alone — to meet the
        # base _edges_for contract (dataset.py): lex order qualifies
        # batches for the symmetric-half wire format and makes recv_perm
        # a mirror involution (device_dataset symmetric fast path).
        o1 = _stable_argsort_ids(cols, n_nodes)
        o2 = _stable_argsort_ids(rows[o1], n_nodes)
        order = o1[o2]
        rows, cols, attrs = rows[order], cols[order], attrs[order]
        onehot = np.zeros((len(attrs), 3), dtype=np.float32)
        if len(attrs):
            onehot[np.arange(len(attrs)), attrs] = 1.0
        rperm = _stable_argsort_ids(cols, n_nodes)
        return struct, rows, cols, onehot, rperm
