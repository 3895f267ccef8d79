"""Host-side dataset: types manifest -> preprocessed GraphSamples.

Behavioural counterpart of the reference's PointCloudDataset /
PygPointCloudDataset (point_vs/preprocessing/data_loaders.py:33-478):

- classification labels straight from the types file, or relabelled from
  pose RMSD with max_active / min_inactive / max_inactive cutoffs
  (ref :133-161);
- augmented actives: each active optionally duplicated
  ``augmented_active_count`` times, re-rotated (ligand only) by at least
  ``augmented_active_min_angle`` degrees and labelled decoy (ref :144-157);
- class-balancing sample weights (ref WeightedRandomSampler :174-186);
- label noise ``p_noise`` and entity dropout ``p_remove_entity`` (data
  fault-injection knobs, ref :237-238, :293-300);
- smina-type or atomic-number featurisation with the compact
  one-hot+entity-bit scheme (ref :194-226);
- radius-graph construction with inter/intra radii (estimate_bonds =>
  intra 2.0 A) and optional pruning (ref :359-370).

TPU-native additions: an on-disk .npz cache of the boxed structure + edges
per (receptor, ligand, params) key. Rotation augmentation is applied after
cache load — legal because the box filter and edge generation depend only on
pairwise distances, which rotations preserve.
"""
from __future__ import annotations

import hashlib
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from pointvs_tpu.data.buckets import GraphSample
from pointvs_tpu.data.preprocessing import (
    concat_structs,
    generate_edges,
    make_bit_vector,
    make_box,
    uniform_random_rotation,
)
from pointvs_tpu.data.types_files import (
    parse_classification_types,
    parse_regression_types,
)
from pointvs_tpu.logging import get_logger
from pointvs_tpu.utils import expand_path, shorten_home

LOG = get_logger('PointVS-TPU')


def _stable_argsort_ids(ids: np.ndarray, max_id: int) -> np.ndarray:
    """Stable argsort for bounded non-negative int ids: native counting
    sort (O(E+N)) when available, numpy otherwise."""
    try:
        from pointvs_tpu.native.build import native_counting_argsort
        order = native_counting_argsort(ids, max_id)
        if order is not None:
            return order
    except Exception:
        pass
    return np.argsort(ids, kind='stable').astype(np.int32)

# Atomic-number featurisation (ref data_loaders.py:194-216): recognised
# organic elements, then grouped halogens / alkali / alkaline-earth /
# transition metals, then (optionally) polar hydrogen, then "other".
_RECOGNISED_ATOMIC_NUMBERS = (6, 7, 8, 9, 15, 16, 17)
_OTHER_GROUPINGS = ((35, 53), (3, 11, 19), (4, 12, 20), (26, 29, 30))


def build_atomic_number_map(polar_hydrogens: bool):
    mapping = {num: idx for idx, num in enumerate(_RECOGNISED_ATOMIC_NUMBERS)}
    for grouping in _OTHER_GROUPINGS:
        nxt = max(mapping.values()) + 1
        mapping.update({elem: nxt for elem in grouping})
    if polar_hydrogens:
        mapping[1] = max(mapping.values()) + 1
    n_features = max(mapping.values()) + 1  # +1 slot for unmapped elements
    lookup = defaultdict(lambda: n_features)
    lookup.update(mapping)
    return lookup, n_features


class PointCloudDataset:
    """Map-style dataset of protein-ligand complexes as graphs."""

    def __init__(
            self, base_path, radius: float = 12,
            polar_hydrogens: bool = True, use_atomic_numbers: bool = False,
            compact: bool = True, rot: bool = False,
            augmented_active_count: int = 0,
            augmented_active_min_angle: float = 90,
            max_active_rms_distance: Optional[float] = None,
            min_inactive_rms_distance: Optional[float] = None,
            max_inactive_rms_distance: Optional[float] = None,
            fname_suffix: str = 'parquet',
            model_task: str = 'classification',
            types_fname=None, edge_radius: Optional[float] = None,
            estimate_bonds: bool = False, prune: bool = False,
            bp: Optional[int] = None, p_remove_entity: float = 0,
            extended_atom_types: bool = False, p_noise: float = -1,
            include_strain_info: bool = False,
            cache_dir=None, seed: int = 0,
            in_memory_cache: bool = True,
            memory_cache_bytes: int = 4 << 30, **kwargs):
        del kwargs  # flag soup passed through from the CLI
        assert not ((max_active_rms_distance is None) !=
                    (min_inactive_rms_distance is None))
        assert not (include_strain_info and augmented_active_count)

        self.base_path = expand_path(base_path)
        if not self.base_path.exists():
            raise FileNotFoundError(
                f'Dataset {self.base_path} does not exist.')
        self.radius = radius
        self.polar_hydrogens = polar_hydrogens
        self.use_atomic_numbers = use_atomic_numbers
        self.compact = compact
        self.rot = rot
        self.estimate_bonds = estimate_bonds
        self.prune = prune
        self.bp = bp
        self.edge_radius = edge_radius if edge_radius is not None else 4.0
        self.p_remove_entity = p_remove_entity
        self.p_noise = p_noise
        self.model_task = model_task
        self.fname_suffix = fname_suffix
        self.include_strain_info = include_strain_info
        self.extended_atom_types = extended_atom_types
        self.augmented_active_min_angle = augmented_active_min_angle
        self.rng = np.random.RandomState(seed)
        self.seed = seed
        # Epoch counter for the DETERMINISTIC augmented-active rotations:
        # each aug item's ligand rotation derives from (seed, epoch, item)
        # instead of the shared rng stream, so the graph an aug item
        # yields depends only on those three values — the streaming path
        # and the hybrid device-resident store (which featurises aug
        # items at epoch start, in a different order) draw IDENTICAL
        # graphs. The train loader bumps this via set_epoch each epoch.
        self._aug_epoch = 0
        # Deterministic per-item size caps for augmented rotations
        # (aug_size_cap) + reject/fallback counters for observability.
        self._aug_caps: dict = {}
        self.aug_rejects = 0
        self.aug_fallbacks = 0
        self.cache_dir = Path(cache_dir) if cache_dir else None
        if self.cache_dir:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        # In-memory cache of boxed graphs (pre-rotation, pre-featurise):
        # epochs >= 2 skip parquet IO and graph construction entirely.
        # Budgeted; disabled per item once the budget is exhausted.
        self._mem_cache = {} if in_memory_cache else None
        self._mem_cache_budget = memory_cache_bytes
        # Files whose existence has already been verified (stat once per
        # file, not twice per item per epoch).
        self._seen_files: set = set()
        self._path_cache: dict = {}

        self.use_types = types_fname is not None
        self.sample_weights = None
        self.dEs, self.rmsds = [], []

        if self.model_task.endswith('regression'):
            entries = parse_regression_types(self.base_path, types_fname)
            self.pki, self.pkd, self.ic50 = (
                entries.pki, entries.pkd, entries.ic50)
            self.receptor_fnames = entries.receptors
            self.ligand_fnames = entries.ligands
            self.pre_aug_ds_len = len(self.ligand_fnames)
            self.labels = np.array([])
        else:
            self._init_classification(
                types_fname, max_active_rms_distance,
                min_inactive_rms_distance, max_inactive_rms_distance,
                augmented_active_count, include_strain_info)

        LOG.info(f'There are {len(self.ligand_fnames)} data points in '
                 f'{shorten_home(base_path)}')

        # Featurisation setup (ref data_loaders.py:194-226).
        self._z_lut = None
        if use_atomic_numbers:
            self.atomic_number_to_index, self.n_features = (
                build_atomic_number_map(polar_hydrogens))
            self._z_lut = np.full(130, self.n_features, dtype=np.int64)
            for z, idx in dict(self.atomic_number_to_index).items():
                if z < 130:
                    self._z_lut[z] = idx
        elif polar_hydrogens:
            raise NotImplementedError('Hydrogens temporarily disabled.')
        else:
            self.n_features = 11 + 8 * extended_atom_types
        self.feature_dim = (self.n_features + 1 if compact
                            else self.n_features * 2)

    # ------------------------------------------------------------------ #
    def _init_classification(self, types_fname, max_active_rmsd,
                             min_inactive_rmsd, max_inactive_rmsd,
                             aug_count, include_strain_info):
        label_by_rmsd = any(v is not None for v in (
            max_active_rmsd, min_inactive_rmsd, max_inactive_rmsd))
        if label_by_rmsd:
            max_active_rmsd = (np.inf if max_active_rmsd is None
                               else max_active_rmsd)
            max_inactive_rmsd = (np.inf if max_inactive_rmsd is None
                                 else max_inactive_rmsd)
            min_inactive_rmsd = (0 if min_inactive_rmsd is None
                                 else min_inactive_rmsd)

        entries = parse_classification_types(
            types_fname, include_strain_info=include_strain_info)

        labels, recs, ligs, dEs, rmsds = [], [], [], [], []
        aug_recs, aug_ligs = [], []
        for i in range(len(entries)):
            rec, lig = entries.receptors[i], entries.ligands[i]
            label = entries.labels[i]
            if label_by_rmsd:
                rmsd = entries.rmsds[i]
                if rmsd is None or rmsd < 0:
                    continue
                if rmsd < max_active_rmsd:
                    label = 1
                    aug_ligs += [lig] * aug_count
                    aug_recs += [rec] * aug_count
                elif rmsd >= max_inactive_rmsd:
                    continue
                elif rmsd >= min_inactive_rmsd:
                    label = 0
                else:
                    continue
            elif label:
                aug_ligs += [lig] * aug_count
                aug_recs += [rec] * aug_count
            labels.append(label)
            recs.append(rec)
            ligs.append(lig)
            dEs.append(entries.dEs[i])
            rmsds.append(entries.strain_rmsds[i])

        self.pre_aug_ds_len = len(ligs)
        self.receptor_fnames = recs + aug_recs
        self.ligand_fnames = ligs + aug_ligs
        self.dEs = dEs
        self.rmsds = rmsds
        labels = labels + [0] * len(aug_ligs)
        self.labels = np.array(
            [l if l is not None else -1 for l in labels], dtype=np.int64)

        # Class-balancing weights (ref :174-186). None if single-class or
        # unlabelled.
        if len(labels) and labels[0] is not None:
            active_count = int(np.sum(self.labels == 1))
            total = len(self.labels)
            if active_count in (0, total):
                self.sample_weights = None
            else:
                class_counts = np.array(
                    [total - active_count, active_count], dtype=np.float64)
                weights = 1.0 / class_counts
                self.sample_weights = weights[
                    np.clip(self.labels, 0, 1)]

    # ------------------------------------------------------------------ #
    def __len__(self):
        return len(self.ligand_fnames)

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmented-active rotation stream (see __init__)."""
        self._aug_epoch = int(epoch)

    def aug_item(self, item: int, epoch: int) -> 'GraphSample':
        """Augmented item featurised for an EXPLICIT epoch, without the
        whole-complex rotation — exactly what ``__getitem__`` yields with
        rot disabled and ``set_epoch(epoch)``. Thread-safe (no shared rng
        draws, no cache writes: aug items bypass every cache), so the
        hybrid device store can prefetch the NEXT epoch's aug graphs in a
        background thread while the current epoch trains."""
        _, _, lig_str, rec_str = self._paths_for_cached(item)
        struct, rows, cols, attrs, rperm = self._aug_draw(item, int(epoch))
        coords = np.stack([struct['x'], struct['y'], struct['z']],
                          axis=1).astype(np.float32)
        feats = make_bit_vector(struct['types'], self.n_features,
                                self.compact).astype(np.float32)
        return GraphSample(
            node_feats=feats, coords=coords,
            senders=np.asarray(rows, dtype=np.int32),
            receivers=np.asarray(cols, dtype=np.int32),
            edge_attr=np.asarray(attrs, dtype=np.float32),
            y=np.float32(0),   # augmented actives are labelled decoy
            lig_fname=lig_str, rec_fname=rec_str,
            recv_perm=np.asarray(rperm, dtype=np.int32))

    def _aug_attempt_rng(self, item: int, epoch: int,
                         attempt: int) -> np.random.RandomState:
        """Per-(seed, epoch, item[, attempt]) rng for augmented-active
        rotations. Attempt 0 keys exactly as the original
        (seed, epoch, item) stream so accepted first draws are identical
        to the pre-retry scheme; retries extend the key."""
        entropy = [int(self.seed) & 0x7fffffff, int(epoch), int(item)]
        if attempt:
            entropy.append(int(attempt))
        ss = np.random.SeedSequence(entropy)
        return np.random.RandomState(int(ss.generate_state(1)[0]))

    def aug_size_cap(self, item: int):
        """Deterministic (node, edge) size cap for ``item``'s augmented
        rotations: slack x the max size over the unrotated base graph and
        ``POINTVS_AUG_PROBES`` probe rotations (keyed far above any real
        epoch). Because the cap depends only on (seed, item, params) it
        is identical for the streaming loader and the hybrid device
        store — the store sizes its slots from it, and ``_aug_draw``
        rejects over-cap rotations on BOTH paths, so a store slot can
        never overflow (spill-free by construction; VERDICT r4 #4)."""
        import math
        import os
        hit = self._aug_caps.get(item)
        if hit is not None:
            return hit
        lig_fname, rec_fname, lig_str, rec_str = self._paths_for_cached(
            item)
        base = self._load_boxed_graph(lig_fname, rec_fname, 0,
                                      mem_key=(lig_str, rec_str))
        n_max, e_max = len(base[0]['x']), len(base[1])
        # At least one probe always runs: probe 0 doubles as _aug_draw's
        # bounded fallback rotation, and the cap floors at its exact size
        # below, so the fallback fits BY CONSTRUCTION for any slack
        # (slack < 1 is a test lever for forcing the reject path).
        probes = max(1, int(os.environ.get('POINTVS_AUG_PROBES', '4')))
        fb_n = fb_e = 0
        for j in range(probes):
            rng = self._aug_attempt_rng(item, (1 << 30) + j, 0)
            g = self._build_graph(lig_fname, rec_fname,
                                  self.augmented_active_min_angle, rng=rng)
            if j == 0:
                fb_n, fb_e = len(g[0]['x']), len(g[1])
            n_max = max(n_max, len(g[0]['x']))
            e_max = max(e_max, len(g[1]))
        slack_n = float(os.environ.get('POINTVS_AUG_SLACK_N', '1.6'))
        slack_e = float(os.environ.get('POINTVS_AUG_SLACK_E', '1.8'))
        cap = (max(int(math.ceil(n_max * slack_n)), fb_n),
               max(int(math.ceil(e_max * slack_e)), fb_e))
        self._aug_caps[item] = cap
        return cap

    def _aug_draw(self, item: int, epoch: int):
        """Retry-gated augmented-rotation draw, shared by the streaming
        ``__getitem__`` and the hybrid device store (parity by
        construction). Draws rotations keyed (seed, epoch, item, attempt)
        until one fits ``aug_size_cap``; after ``POINTVS_AUG_RETRIES``
        rejections it falls back to the FIRST PROBE rotation (a real
        >=min-angle rotation whose size is inside the cap pre-slack by
        definition) — never a stale or truncated graph."""
        import os
        n_cap, e_cap = self.aug_size_cap(item)
        lig_fname, rec_fname, _, _ = self._paths_for_cached(item)
        retries = int(os.environ.get('POINTVS_AUG_RETRIES', '4'))
        for attempt in range(retries + 1):
            rng = self._aug_attempt_rng(item, epoch, attempt)
            g = self._build_graph(lig_fname, rec_fname,
                                  self.augmented_active_min_angle, rng=rng)
            if len(g[0]['x']) <= n_cap and len(g[1]) <= e_cap:
                return g
            self.aug_rejects += 1
        self.aug_fallbacks += 1
        rng = self._aug_attempt_rng(item, 1 << 30, 0)
        return self._build_graph(lig_fname, rec_fname,
                                 self.augmented_active_min_angle, rng=rng)

    def _label_for(self, item: int):
        if self.model_task == 'classification':
            label = int(self.labels[item]) if len(self.labels) else 0
            if self.rng.rand() < self.p_noise:
                label = 1 - label
            return np.float32(label)
        if self.model_task == 'multi_regression':
            return np.array([self.pki[item], self.pkd[item],
                             self.ic50[item]], dtype=np.float32)
        vals = [v for v in (self.pki[item], self.pkd[item], self.ic50[item])
                if v is not None]
        return np.float32(max(vals) if vals else 0.0)

    def _paths_for(self, item: int):
        if self.use_types:
            return (self.base_path / self.ligand_fnames[item],
                    self.base_path / self.receptor_fnames[item])
        lig_fname = Path(self.ligand_fnames[item])
        rec_name = lig_fname.parent.name.split('_')[0]
        matches = sorted((self.base_path / 'receptors').glob(
            f'{rec_name}*.{self.fname_suffix}'))
        if not matches:
            raise RuntimeError(
                f'Receptor for ligand {lig_fname} not found (looked for '
                f'{rec_name}.{self.fname_suffix}).')
        return lig_fname, matches[0]

    def _paths_for_cached(self, item: int):
        """(lig_path, rec_path, lig_str, rec_str), memoised per item —
        pathlib join + str() per epoch measured ~20% of the hot path."""
        hit = self._path_cache.get(item)
        if hit is None:
            lig, rec = self._paths_for(item)
            hit = (lig, rec, str(lig), str(rec))
            self._path_cache[item] = hit
        return hit

    def _file_fp(self, path) -> tuple:
        """(size, mtime_ns) content fingerprint, memoised per process —
        keeps blob-cache keys content-aware (a re-docked pose written to
        the same path must not serve a stale cached graph) without
        paying per-epoch stat calls on the hot path."""
        key = str(path)
        hit = self._path_cache.get(('fp', key))
        if hit is None:
            try:
                st = Path(path).stat()
                hit = (st.st_size, st.st_mtime_ns)
            except OSError:
                hit = (0, 0)
            self._path_cache[('fp', key)] = hit
        return hit

    def _cache_key(self, lig_fname, rec_fname) -> Optional[Path]:
        if self.cache_dir is None:
            return None
        # 'lex3' = blob-format generation: edges lex-sorted by
        # (sender, receiver) so batches qualify for the symmetric-half
        # wire format (wire.WireBatchV3) and the device-dataset
        # involution fast path. Bump on edge-order changes so stale
        # caches regenerate rather than silently disqualifying v3
        # (lex2 -> lex3: the shared-receptor path used to sort by
        # sender only).
        params = (str(lig_fname), str(rec_fname),
                  self._file_fp(lig_fname), self._file_fp(rec_fname),
                  self.radius,
                  self.edge_radius, self.estimate_bonds, self.prune,
                  self.polar_hydrogens, self.use_atomic_numbers,
                  self.extended_atom_types, self.bp, 'lex3')
        digest = hashlib.sha1(repr(params).encode()).hexdigest()[:24]
        return self.cache_dir / f'{digest}.bin'

    def _build_struct(self, lig_fname, rec_fname, aug_angle: float,
                      rng=None):
        """parquets -> concatenated, boxed, element-filtered struct dict."""
        from pointvs_tpu.data import fast_structs as fs
        rng = rng if rng is not None else self.rng
        if str(lig_fname).rsplit('.', 1)[-1] != 'parquet' \
                or str(rec_fname).rsplit('.', 1)[-1] != 'parquet':
            # Non-parquet inputs go through the reference-semantics
            # pandas path.
            struct = make_box(
                concat_structs(rec_fname, lig_fname, self.n_features,
                               min_lig_rotation=aug_angle,
                               extended=self.extended_atom_types,
                               rng=rng),
                radius=self.radius, relative_to_ligand=True)
            struct = {k: struct[k].to_numpy() for k in fs.KEYS}
        else:
            # Augmented actives re-rotate the (lru-cached) raw ligand in
            # numpy: they bypass the boxed-graph caches every epoch, and
            # the pandas+parquet path made them ~4x the cost of a normal
            # item — 165 fresh parquet reads per hot epoch on
            # small_chembl.
            lig_struct = fs.read_struct(str(lig_fname))
            if aug_angle:
                lig_struct = fs.rotate_struct(lig_struct, aug_angle, rng)
            struct = fs.box_np(
                fs.concat_structs_np(
                    fs.read_struct(str(rec_fname)), lig_struct,
                    self.n_features, extended=self.extended_atom_types),
                radius=self.radius)
        if not self.polar_hydrogens:
            struct = fs.subset(struct, struct['atomic_number'] > 1)
        if self.use_atomic_numbers:
            z = np.minimum(struct['atomic_number'], 129)
            struct = dict(struct)
            struct['types'] = (self._z_lut[z]
                               + struct['bp'] * self.n_features)
        return struct

    def _build_graph(self, lig_fname, rec_fname, aug_angle: float,
                     rng=None):
        """(struct, rows, cols, attrs, rperm) for one complex — the
        boxed-pocket + radius-edges pipeline. Subclasses can override
        (data/shared_receptor.py reuses receptor work across a whole
        screening library)."""
        from pointvs_tpu.data.fast_structs import subset
        struct = self._build_struct(lig_fname, rec_fname, aug_angle,
                                    rng=rng)
        if self.bp is not None:
            struct = subset(struct, struct['bp'] == self.bp)
        return self._edges_for(struct)

    def _edges_for(self, struct):
        from pointvs_tpu.data import fast_structs as fs
        edge_radius = self.edge_radius if self.edge_radius > 0 else 4
        intra_radius = 2.0 if self.estimate_bonds else edge_radius
        if self.edge_radius >= 0:
            struct, rows, cols, attrs = fs.edges_np(
                struct, edge_radius, intra_radius, prune=self.prune)
            rows = rows.astype(np.int32)
            cols = cols.astype(np.int32)
            n_nodes = len(struct['bp'])
            # Lex-sort by (sender, receiver) once HERE (cached across
            # epochs): the batch collator requires sender-sorted edges
            # (a sorted concatenation of sorted lists skips four
            # full-batch gathers per batch), and the LEXICOGRAPHIC tie
            # order additionally qualifies symmetric batches for the
            # half-edge wire format (wire.WireBatchV3: ship E/2 edges,
            # reconstruct the exact order on device with one stable
            # sort). Two counting-sort passes keep it O(E + N).
            if len(rows) and not np.all(
                    (rows[1:] > rows[:-1])
                    | ((rows[1:] == rows[:-1]) & (cols[1:] >= cols[:-1]))):
                o1 = _stable_argsort_ids(cols, n_nodes)
                o2 = _stable_argsort_ids(rows[o1], n_nodes)
                order = o1[o2]
                rows, cols, attrs = rows[order], cols[order], attrs[order]
            onehot = np.zeros((len(attrs), 3), dtype=np.float32)
            if len(attrs):
                onehot[np.arange(len(attrs)), attrs] = 1.0
            # Receiver-sort permutation, also cached across epochs: per-
            # sample perms concatenate into the batch-level receiver sort
            # (buckets.pad_graphs_to_batch), replacing a per-batch
            # counting argsort of the full edge array.
            rperm = _stable_argsort_ids(cols, n_nodes)
            return struct, rows, cols, onehot, rperm
        return (struct, np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros((0, 3), np.float32), np.zeros(0, np.int32))

    def _load_boxed_graph(self, lig_fname, rec_fname, aug_angle: float,
                          mem_key=None, rng=None):
        """Boxed struct dict + edges, through the caches if present."""
        from pointvs_tpu.data.fast_structs import KEYS, subset
        if self._mem_cache is None or aug_angle:
            mem_key = None
        elif mem_key is None:
            mem_key = (str(lig_fname), str(rec_fname))
        if mem_key is not None:
            hit = self._mem_cache.get(mem_key)
            if hit is not None:
                return hit
        cache_path = (None if aug_angle else
                      self._cache_key(lig_fname, rec_fname))
        if cache_path is not None:
            item = self._read_disk_cache(cache_path)
            if item is not None:
                # Promote disk hits into the memory cache too — otherwise
                # a populated cache_dir forces a blob read per item per
                # epoch, which measured 3x the rest of the hot path.
                self._mem_cache_put(mem_key, item)
                return item

        struct, rows, cols, attrs, rperm = self._build_graph(
            lig_fname, rec_fname, aug_angle, rng=rng)

        if cache_path is not None:
            from pointvs_tpu.data.blob import save_blob
            tmp = cache_path.with_suffix('.tmp.bin')
            save_blob(tmp, {'rows': rows, 'cols': cols, 'attrs': attrs,
                            'rperm': rperm,
                            **{k: struct[k] for k in KEYS}})
            tmp.rename(cache_path)
        self._mem_cache_put(mem_key, (struct, rows, cols, attrs, rperm))
        return struct, rows, cols, attrs, rperm

    @staticmethod
    def _read_disk_cache(cache_path):
        from pointvs_tpu.data.blob import load_blob
        from pointvs_tpu.data.fast_structs import KEYS
        if cache_path.exists():
            blob = load_blob(cache_path)
        else:
            # Legacy npz caches from before the flat-blob format.
            legacy = cache_path.with_suffix('.npz')
            if not legacy.exists():
                return None
            with np.load(legacy, allow_pickle=False) as z:
                blob = {k: z[k] for k in z.files}
        struct = {k: blob[k] for k in KEYS}
        rperm = (blob['rperm'] if 'rperm' in blob else
                 np.argsort(blob['cols'], kind='stable').astype(np.int32))
        return struct, blob['rows'], blob['cols'], blob['attrs'], rperm

    def _mem_cache_put(self, mem_key, item):
        if mem_key is None or self._mem_cache_budget <= 0:
            return
        size = sum(v.nbytes for v in item[0].values()) \
            + sum(a.nbytes for a in item[1:])
        if size <= self._mem_cache_budget:
            self._mem_cache[mem_key] = item
            self._mem_cache_budget -= size

    def __getitem__(self, item: int) -> GraphSample:
        label = self._label_for(item)
        lig_fname, rec_fname, lig_str, rec_str = self._paths_for_cached(item)
        # Existence check once per file, not once per epoch: the two
        # stat() calls per item were measurable at cached-epoch speeds.
        for f, fstr in ((lig_fname, lig_str), (rec_fname, rec_str)):
            if fstr not in self._seen_files:
                if not f.is_file():
                    raise FileNotFoundError(f'{f} does not exist.')
                self._seen_files.add(fstr)

        # Augmented actives sit past the pre-augmentation length and get a
        # fresh ligand rotation + decoy label each epoch (ref :259-269).
        is_augmented = (not self.model_task.endswith('regression')
                        and item >= self.pre_aug_ds_len)
        aug_angle = self.augmented_active_min_angle if is_augmented else 0

        if is_augmented:
            # Retry-gated deterministic rotation (shared with the hybrid
            # device store via the same (seed, epoch, item, attempt)
            # keys and size caps — see _aug_draw).
            struct, rows, cols, attrs, rperm = self._aug_draw(
                item, self._aug_epoch)
        else:
            struct, rows, cols, attrs, rperm = self._load_boxed_graph(
                lig_fname, rec_fname, aug_angle,
                mem_key=(lig_str, rec_str))

        # Entity dropout: drop receptor or ligand, force label 0 (ref
        # :293-300). Requires regenerating edges on the remaining entity.
        dropped_entity = (self.p_remove_entity > 0
                          and self.rng.rand() < self.p_remove_entity)
        if dropped_entity:
            from pointvs_tpu.data.fast_structs import subset
            keep_bp = 0 if self.rng.rand() < 0.5 else 1
            struct = subset(struct, struct['bp'] == keep_bp)
            struct, rows, cols, attrs, rperm = self._edges_for(struct)
            label = (np.float32(0) if np.ndim(label) == 0
                     else np.zeros(3, dtype=np.float32))

        # Featurisation is deterministic per (struct) — cache the derived
        # coords/feats alongside the boxed graph so hot epochs only pay
        # for the per-epoch rotation.
        feat_key = (None if (aug_angle or dropped_entity
                             or self._mem_cache is None)
                    else (lig_str, rec_str, 'feats'))
        cached = (self._mem_cache.get(feat_key)
                  if feat_key is not None else None)
        if cached is not None:
            coords, feats = cached
        else:
            coords = np.stack([struct['x'], struct['y'], struct['z']],
                              axis=1).astype(np.float32)
            feats = make_bit_vector(
                struct['types'], self.n_features,
                self.compact).astype(np.float32)
            if feat_key is not None and self._mem_cache_budget > 0:
                self._mem_cache[feat_key] = (coords, feats)
                self._mem_cache_budget -= coords.nbytes + feats.nbytes
        if self.rot:
            coords = uniform_random_rotation(
                coords, rng=self.rng).astype(np.float32)

        d_e, rmsd = 0.0, 0.0
        if self.include_strain_info and item < len(self.dEs):
            d_e = self.dEs[item] or 0.0
            rmsd = self.rmsds[item] or 0.0

        return GraphSample(
            node_feats=feats,
            coords=(coords if self.rot
                    else coords.astype(np.float32, copy=False)),
            senders=np.asarray(rows, dtype=np.int32),
            receivers=np.asarray(cols, dtype=np.int32),
            edge_attr=np.asarray(attrs, dtype=np.float32),
            y=label,
            lig_fname=lig_str, rec_fname=rec_str,
            dE=float(d_e), rmsd=float(rmsd),
            recv_perm=np.asarray(rperm, dtype=np.int32))


class SynthPharmDataset(PointCloudDataset):
    """Synthetic-pharmacophore dataset: 12-class atom_id one-hot features
    (ref data_loaders.py:394-478)."""

    def __init__(self, *args, no_receptor: bool = False, **kwargs):
        self.no_receptor = no_receptor
        super().__init__(*args, **kwargs)

    def __getitem__(self, item: int) -> GraphSample:
        label = self._label_for(item)
        lig_fname, rec_fname = self._paths_for(item)
        struct = concat_structs(rec_fname, lig_fname, self.n_features,
                                min_lig_rotation=0, synth_pharm=True)
        if self.no_receptor:
            struct = struct[struct['bp'] == 0].reset_index(drop=True)
        if self.bp is not None:
            struct = struct[struct.bp == self.bp].reset_index(drop=True)

        edge_radius = self.edge_radius if self.edge_radius > 0 else 4
        intra_radius = 2.0 if self.estimate_bonds else edge_radius
        struct, (rows, cols), attrs = generate_edges(
            struct, inter_radius=edge_radius, intra_radius=intra_radius,
            prune=self.prune, synthpharm=True)
        onehot_edges = np.zeros((len(attrs), 3), dtype=np.float32)
        if len(attrs):
            onehot_edges[np.arange(len(attrs)), attrs] = 1.0

        coords = np.stack([struct.x.to_numpy(), struct.y.to_numpy(),
                           struct.z.to_numpy()], axis=1)
        atom_ids = struct.atom_id.to_numpy().astype(np.int64)
        feats = np.zeros((len(atom_ids), 12), dtype=np.float32)
        feats[np.arange(len(atom_ids)), atom_ids] = 1.0

        return GraphSample(
            node_feats=feats, coords=coords.astype(np.float32),
            senders=rows.astype(np.int32), receivers=cols.astype(np.int32),
            edge_attr=onehot_edges, y=label,
            lig_fname=str(lig_fname), rec_fname=str(rec_fname))
