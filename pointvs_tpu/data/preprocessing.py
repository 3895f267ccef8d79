"""Geometry/featurisation kernels of the host data pipeline (numpy/pandas).

Behavioural spec from the reference (point_vs/preprocessing/preprocessing.py):

- ``uniform_random_rotation``: Avro (1992) fast random rotation matrices,
  applied about the centroid of the point set (ref :30-53).
- ``make_box``: keep all ligand atoms plus receptor atoms within ``radius``
  Angstrom of *any* ligand atom (ref :165-211).
- ``generate_edges``: O(N^2) pairwise-distance radius graph with separate
  inter-/intra-molecular radii; edge classes 0=lig-lig, 1=lig-rec, 2=rec-rec;
  optional pruning of subgraphs disconnected from the ligand (ref :68-155).
  Edge ordering (inter block then intra block, row-major) and the reference's
  duplicate-edge quirk when ``intra_radius`` overlaps ``inter_radius`` are
  reproduced exactly — the unit tests pin golden edge lists.
- ``make_bit_vector``: compact one-hot + receptor/ligand bit featurisation
  (ref :214-239), returned as numpy (the torch version returned tensors).

These run on the host (offline / dataloader path), so plain numpy is the
right tool; the TPU never sees dynamic shapes because batching pads into
fixed-size buckets (see buckets.py).
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd


def generate_random_z_axis_rotation(rng=None) -> np.ndarray:
    """Random rotation matrix about the z axis (NOT uniform over SO(3))."""
    rng = np.random if rng is None else rng
    theta = 2 * np.pi * rng.rand()
    rot = np.eye(3)
    rot[0, 0] = rot[1, 1] = np.cos(theta)
    rot[0, 1] = -np.sin(theta)
    rot[1, 0] = np.sin(theta)
    return rot


def random_rotation_matrix(rng=None) -> np.ndarray:
    """Rotation matrix drawn uniformly over SO(3).

    Algorithm: "Fast Random Rotation Matrices" (James Avro, 1992) — a
    random z-rotation reflected through a random Householder plane
    (ref preprocessing.py:30-53). Built with scalar arithmetic: this runs
    once per item per epoch on a 1-core host, and the array-op version
    (eye/outer/two 3x3 matmuls) measured ~60% of the whole hot item path.
    """
    rng = np.random if rng is None else rng
    # Draw order (x2, x3, theta) preserved from the pre-optimisation
    # version so seeded streams produce identical rotations.
    x2 = 2 * np.pi * rng.rand()
    x3 = rng.rand()
    theta = 2 * np.pi * rng.rand()
    ct, st = np.cos(theta), np.sin(theta)
    s3 = np.sqrt(x3)
    vx, vy, vz = np.cos(x2) * s3, np.sin(x2) * s3, np.sqrt(1 - x3)
    # householder = I - 2 v v^T ; m = -(householder @ rot_z)
    h00, h01, h02 = 1 - 2 * vx * vx, -2 * vx * vy, -2 * vx * vz
    h11, h12 = 1 - 2 * vy * vy, -2 * vy * vz
    h22 = 1 - 2 * vz * vz
    return -np.array([
        [h00 * ct + h01 * st, -h00 * st + h01 * ct, h02],
        [h01 * ct + h11 * st, -h01 * st + h11 * ct, h12],
        [h02 * ct + h12 * st, -h02 * st + h12 * ct, h22],
    ])


def uniform_random_rotation(x: np.ndarray, rng=None) -> np.ndarray:
    """Rotate a point cloud by a rotation drawn uniformly over the sphere.

    The reference applies the rotation about the centroid but translates
    the centroid through the rotation too (ref preprocessing.py:30-53):
    ``(x - mean) @ M + mean @ M``, which is algebraically just ``x @ M``.
    """
    m = random_rotation_matrix(rng)
    return np.asarray(x).reshape((-1, 3)) @ m


def angle_3d(v1: np.ndarray, v2: np.ndarray) -> float:
    """Angle between two 3D vectors (first rows if given matrices)."""
    v1 = np.asarray(v1, dtype=np.float64).reshape((-1, 3))
    v2 = np.asarray(v2, dtype=np.float64).reshape((-1, 3))
    dot = float(np.einsum('ij,ij->i', v1, v2)[0])
    denom = max(1e-7, float(np.linalg.norm(v1) * np.linalg.norm(v2)))
    return float(np.arccos(np.clip(dot / denom, -1.0, 1.0)))


def extract_coords(struct: pd.DataFrame, bp=None) -> np.ndarray:
    """[N, 3] coordinate array from a structure DataFrame (optionally one
    entity: bp=0 ligand, bp=1 receptor)."""
    entity = struct[struct.bp == bp] if bp is not None else struct
    return np.stack([entity.x.to_numpy(), entity.y.to_numpy(),
                     entity.z.to_numpy()], axis=1)


def _pairwise_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean cdist without scipy (fast enough, keeps deps slim)."""
    diff = a[:, None, :] - b[None, :, :]
    return np.sqrt(np.einsum('ijk,ijk->ij', diff, diff))


def make_box(struct: pd.DataFrame, radius: float = 4,
             relative_to_ligand: bool = True) -> pd.DataFrame:
    """Pocket box filter: drop receptor atoms too far from the ligand.

    relative_to_ligand=True keeps receptor atoms within ``radius`` of *any*
    ligand atom; False keeps those within ``radius`` of the ligand centroid.
    Row order: all ligand rows first (original order), then surviving
    receptor rows (original order) — matches ref preprocessing.py:165-211.
    """
    lig_xyz = extract_coords(struct, 0)
    rec_xyz = extract_coords(struct, 1)

    if relative_to_ligand:
        lig_rows = struct[struct.bp == 0].copy()
        rec_rows = struct[struct.bp == 1].copy().reset_index(drop=True)
        if len(rec_rows) and len(lig_rows):
            keep = None
            try:
                from pointvs_tpu.native.build import native_box_filter
                keep = native_box_filter(lig_xyz, rec_xyz, radius)
            except Exception:  # native path is best-effort
                keep = None
            if keep is None:
                dists = _pairwise_distances(lig_xyz, rec_xyz)
                keep = np.where((dists < radius).any(axis=0))[0]
            rec_rows = rec_rows.iloc[keep]
        elif not len(lig_rows):
            rec_rows = rec_rows.iloc[:0]
        out = pd.concat([lig_rows, rec_rows], ignore_index=True)
        return out.reset_index(drop=True)

    centre = np.mean(lig_xyz, axis=0)
    sq_dist = ((struct.x - centre[0]) ** 2 + (struct.y - centre[1]) ** 2 +
               (struct.z - centre[2]) ** 2)
    out = struct[(sq_dist < radius ** 2) | (struct.bp == 0)].copy()
    return out.reset_index(drop=True)


def generate_edges(struct: pd.DataFrame, inter_radius: float = 4.0,
                   intra_radius: float = 2.0, prune: bool = True,
                   synthpharm: bool = False):
    """Radius-graph edges with inter/intra cutoffs and class labels.

    Returns ``(struct, (row_idx, col_idx), edge_attrs)`` where attrs are
    0=lig-lig, 1=lig-rec, 2=rec-rec. Edges come in two blocks:

    1. *inter* block: pairs of atoms in different molecules closer than
       ``inter_radius`` (class 1);
    2. *intra* block: ALL pairs closer than ``intra_radius`` (class 2 if both
       receptor, else class 0) — note this block is not bp-filtered, which
       reproduces the reference's duplicate-edge behaviour when the two radii
       overlap (ref preprocessing.py:119-137).

    With ``prune=True``, atoms not connected (via any edges) to the first
    inter-molecular edge's source atom are dropped and edges are regenerated
    (ref :144-153: BFS over the undirected adjacency from
    ``edge_indices[0][0]``).
    """
    struct = struct.reset_index(drop=True)
    coords = extract_coords(struct)

    if synthpharm:
        struct = struct.copy()
        struct['bp'] = (struct['atom_id'] <= 2).astype(int)

    bp = struct.bp.to_numpy()

    # Native C++ fast path (identical semantics, golden-tested).
    try:
        from pointvs_tpu.native.build import native_radius_edges
        native = native_radius_edges(coords, bp, inter_radius,
                                     intra_radius, prune)
    except Exception:
        native = None
    if native is not None:
        rows, cols, attrs, keep_mask = native
        if prune and not keep_mask.all():
            struct = struct[keep_mask].reset_index(drop=True)
        return struct, (rows.astype(np.int64), cols.astype(np.int64)), \
            attrs.astype('int32')
    dists = _pairwise_distances(coords, coords)
    nontrivial = dists > 1e-7

    # Inter-molecular block.
    inter_adj = (dists < inter_radius) & nontrivial
    inter_i, inter_j = np.where(inter_adj)
    mixed = bp[inter_i] != bp[inter_j]
    inter_i, inter_j = inter_i[mixed], inter_j[mixed]
    inter_attrs = np.ones(len(inter_i), dtype='int32')

    # Intra block (deliberately NOT restricted to same-molecule pairs).
    intra_adj = (dists < intra_radius) & nontrivial
    intra_i, intra_j = np.where(intra_adj)
    intra_attrs = np.where((bp[intra_i] == 1) & (bp[intra_j] == 1), 2, 0
                           ).astype('int32')

    rows = np.concatenate([inter_i, intra_i])
    cols = np.concatenate([inter_j, intra_j])
    attrs = np.concatenate([inter_attrs, intra_attrs])

    if prune and len(inter_i):
        adjacency = defaultdict(list)
        for a, b in zip(rows, cols):
            adjacency[a].append(b)
            adjacency[b].append(a)
        # Iterative BFS (the reference recursed; same reachable set).
        start = rows[0]
        seen = {start}
        frontier = [start]
        while frontier:
            node = frontier.pop()
            for child in adjacency[node]:
                if child not in seen:
                    seen.add(child)
                    frontier.append(child)
        keep = np.array(sorted(seen))
        drop = np.setdiff1d(struct.index.to_numpy(), keep)
        if len(drop):
            struct = struct.drop(drop)
            return generate_edges(struct.copy(), inter_radius, intra_radius,
                                  prune=False, synthpharm=False)

    return struct, (rows, cols), attrs


def make_bit_vector(atom_types: np.ndarray, n_atom_types: int,
                    compact: bool = True) -> np.ndarray:
    """One-hot featurisation of (possibly receptor-offset) atom type indices.

    compact=True: ``n_atom_types + 1`` columns — one-hot of
    ``types % n_atom_types`` with the final column replaced by the
    receptor/ligand bit ``types // n_atom_types``. compact=False: plain
    one-hot over ``2 * n_atom_types`` classes. Returns float32 numpy.
    """
    atom_types = np.asarray(atom_types, dtype=np.int64)
    if compact:
        base = atom_types % n_atom_types
        onehot = np.zeros((len(atom_types), n_atom_types + 1),
                          dtype=np.float32)
        onehot[np.arange(len(atom_types)), base] = 1.0
        onehot[:, -1] = (atom_types // n_atom_types).astype(np.float32)
    else:
        onehot = np.zeros((len(atom_types), n_atom_types * 2),
                          dtype=np.float32)
        onehot[np.arange(len(atom_types)), atom_types] = 1.0
    return onehot


def centre_on_ligand(struct: pd.DataFrame) -> pd.DataFrame:
    """Translate all coordinates so the ligand centroid is the origin."""
    lig = struct[struct.bp == 0]
    mean_x, mean_y, mean_z = (lig.x.to_numpy().mean(),
                              lig.y.to_numpy().mean(),
                              lig.z.to_numpy().mean())
    struct.x -= mean_x
    struct.y -= mean_y
    struct.z -= mean_z
    return struct


from functools import lru_cache


@lru_cache(maxsize=64)
def _read_parquet_cached(path_str: str) -> pd.DataFrame:
    """In-memory structure cache: receptors are shared by every ligand in
    a screen (the reference re-read the receptor parquet per item,
    data_loaders.py:268-269 — the single biggest host cost at TPU
    throughputs). Callers must copy before mutating."""
    return pd.read_parquet(path_str)


def concat_structs(rec, lig, n_features: int, min_lig_rotation: float = 0,
                   parsers=None, extended: bool = False,
                   synth_pharm: bool = False, rng=None) -> pd.DataFrame:
    """Load + concatenate receptor and ligand structures (ligand rows first).

    Receptor type indices are offset by ``n_features`` (+8 for extended
    typing) so compact featurisation can recover the entity bit. With
    ``min_lig_rotation`` > 0 the ligand is re-rotated until its first atom
    vector moves by at least that many degrees (augmented-active decoys,
    ref preprocessing.py:262-299).
    """
    min_rot_rads = np.pi * min_lig_rotation / 180

    if parsers is None:
        lig_struct = _read_parquet_cached(str(lig))
        rec_struct = _read_parquet_cached(str(rec))
    else:
        lig_struct = parsers[0].file_to_parquets(lig, add_polar_hydrogens=True)
        rec_struct = parsers[1].file_to_parquets(rec, add_polar_hydrogens=True)

    if synth_pharm:
        atomic_nums = (6, 7, 8, 9, 15, 16, 17, 35, 53)
        lig_struct = lig_struct.copy()
        lig_struct['atom_id'] = lig_struct['type'].map(
            {num: idx + 3 for idx, num in enumerate(atomic_nums)})
        rec_struct = rec_struct.copy()
        rec_struct['atom_id'] = rec_struct['type']
        return pd.concat([lig_struct, rec_struct], ignore_index=True)

    rec_struct = rec_struct.copy()
    rec_struct.types += n_features + int(extended) * 8

    if min_lig_rotation:
        lig_struct = lig_struct.copy()
        initial = np.stack(
            [lig_struct.x, lig_struct.y, lig_struct.z], axis=1)
        orig_vector = initial[0, :]
        candidate = initial
        while angle_3d(orig_vector, candidate[0, :]) < min_rot_rads:
            candidate = uniform_random_rotation(initial, rng=rng)
        lig_struct.x = candidate[:, 0]
        lig_struct.y = candidate[:, 1]
        lig_struct.z = candidate[:, 2]

    return pd.concat([lig_struct, rec_struct], ignore_index=True)
