"""Static-shape graph batching for XLA.

This is the key TPU-native departure from the reference (which used pyg's
dynamic-shape `Batch` concatenation, data_loaders.py:481-520): variable-size
complexes are padded into a small set of fixed (node, edge) bucket shapes so
every bucket compiles exactly once and all downstream segment ops run over
static shapes on the MXU/VPU.

Conventions (relied on by pointvs_tpu.ops.segment and the models):

- Node arrays are padded to ``n_pad`` rows; padding rows have
  ``node_mask == 0`` and ``graph_id == num_graphs`` (one-past-the-end, so
  clamped segment ops with masked data contribute nothing).
- Edge arrays are padded to ``e_pad`` rows; padding rows have
  ``edge_mask == 0`` and ``senders == receivers == n_pad``.
- The graph axis is padded to ``num_graphs`` entries with
  ``graph_mask == 0`` for dummy graphs (used when the final batch of an
  epoch is short, and to keep per-device batch shapes equal under data
  parallelism).
"""
from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Sequence

import numpy as np


class GraphBatch(NamedTuple):
    """A statically shaped batch of graphs (a pytree of arrays).

    Shapes: N = padded node count, E = padded edge count, B = graph slots.
    """
    node_feats: np.ndarray   # [N, F] float32
    coords: np.ndarray       # [N, 3] float32
    node_mask: np.ndarray    # [N]    float32 (1 = real node)
    graph_id: np.ndarray     # [N]    int32   (padding rows = B)
    senders: np.ndarray      # [E]    int32   (aggregation destination, "row";
                             #                 SORTED ascending, pads last)
    receivers: np.ndarray    # [E]    int32   ("col")
    edge_attr: np.ndarray    # [E, 3] float32
    edge_mask: np.ndarray    # [E]    float32 (1 = real edge)
    y: np.ndarray            # [B] or [B, 3] float32 targets
    graph_mask: np.ndarray   # [B]    float32 (1 = real graph)
    strain: np.ndarray       # [B, 2] float32 (dE, strain rmsd; zeros if n/a)
    recv_perm: np.ndarray    # [E]    int32   permutation sorting receivers
                             #                 (for receiver-side aggregation
                             #                 on the MXU scatter path)
    # [E] int32 inverse of recv_perm, present ONLY when the edge list is
    # verified symmetric (receivers[recv_perm] == senders elementwise,
    # i.e. per-node in-degree == out-degree — always true for the radius
    # graphs preprocessing.generate_edges builds, both adjacency blocks
    # being symmetric). With it, h[receivers] == h[senders][inv], so the
    # destination-side gather's backward is a PERMUTATION instead of a
    # second windowed scatter per layer (ops/aggregate.gather_pair). None
    # (structural in the pytree -> static branch) selects the general
    # two-scatter path.
    inv_recv_perm: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.node_feats.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


class SiamesePair(NamedTuple):
    """Two-tower batch: receptor-only and ligand-only graphs for the same
    complexes, slot-aligned (ref point_vs/models/siamese.py:23-207 zips a
    receptor loader and a ligand loader). Labels/masks live on the
    receptor side, mirroring the reference's ``y_true = rec_graph.y``."""
    rec: GraphBatch
    lig: GraphBatch

    @property
    def y(self) -> np.ndarray:
        return self.rec.y

    @property
    def graph_mask(self) -> np.ndarray:
        return self.rec.graph_mask

    @property
    def num_graphs(self) -> int:
        return self.rec.num_graphs


class DenseBatch(NamedTuple):
    """Zero-padded dense (p, v, m) batch for the vanilla family (ref
    point_vs/preprocessing/data_loaders.py:638-675 get_collate_fn)."""
    p: np.ndarray            # [B, N, 3] coords
    v: np.ndarray            # [B, N, F] features
    m: np.ndarray            # [B, N]    node mask
    y: np.ndarray            # [B]       targets
    graph_mask: np.ndarray   # [B]       1 = real graph

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


@dataclass
class GraphSample:
    """One preprocessed complex (host-side, pre-batching)."""
    node_feats: np.ndarray    # [n, F] float32
    coords: np.ndarray        # [n, 3] float32
    senders: np.ndarray       # [e] int
    receivers: np.ndarray     # [e] int
    edge_attr: np.ndarray     # [e, 3] float32 (one-hot edge class)
    y: np.ndarray             # scalar or [3]
    lig_fname: str = ''
    rec_fname: str = ''
    dE: float = 0.0
    rmsd: float = 0.0
    extra: dict = field(default_factory=dict)
    # Optional per-sample receiver-sort permutation (argsort of receivers),
    # cached by the dataset. When present on every sample the batch
    # collator concatenates them (receiver ranges are disjoint and
    # increasing across samples) instead of re-sorting the whole batch.
    recv_perm: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.node_feats.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]


# Bucket boundaries grow geometrically (ratio ~1.4) so the number of distinct
# compiled shapes stays small (<~20 per axis) while padding waste stays <40%.
def bucket_sizes(minimum: int, maximum: int, ratio: float = 1.4,
                 multiple: int = 128) -> Sequence[int]:
    """Geometric grid of padded sizes, rounded up to `multiple` (TPU lanes)."""
    sizes = []
    value = float(max(minimum, multiple))
    while True:
        padded = int(-(-value // multiple) * multiple)
        if not sizes or padded > sizes[-1]:
            sizes.append(padded)
        if padded >= maximum:
            break
        value *= ratio
    return sizes


DEFAULT_NODE_BUCKETS = bucket_sizes(128, 65536)
DEFAULT_EDGE_BUCKETS = bucket_sizes(512, 1048576)


def pick_bucket(size: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= size (grows the grid if size exceeds the last)."""
    idx = bisect.bisect_left(buckets, size)
    if idx < len(buckets):
        return buckets[idx]
    # Out of grid: round up to next multiple of the last stride.
    stride = buckets[-1] - (buckets[-2] if len(buckets) > 1 else 0)
    stride = max(stride, 128)
    over = size - buckets[-1]
    return buckets[-1] + int(-(-over // stride) * stride)


def pad_graphs_to_batch(samples: Sequence[GraphSample],
                        num_graphs: Optional[int] = None,
                        node_buckets: Sequence[int] = DEFAULT_NODE_BUCKETS,
                        edge_buckets: Sequence[int] = DEFAULT_EDGE_BUCKETS,
                        n_pad: Optional[int] = None,
                        e_pad: Optional[int] = None,
                        dynamic_cap: bool = False) -> GraphBatch:
    """Concatenate samples and pad to bucketed static shapes.

    With ``dynamic_cap`` the collator does NOT grow ``e_pad`` to cover
    the windowed scatter's shape-derived capacity; the caller must
    measure the batch's realised max window load (``batch_scatter_cap``)
    and run the step under ``ops.sorted_segment.edge_capacity_override``
    (the loader/engine do this; see parallel/steps.py)."""
    if not samples:
        raise ValueError('pad_graphs_to_batch needs at least one sample')
    num_graphs = num_graphs or len(samples)
    assert len(samples) <= num_graphs

    total_nodes = sum(s.num_nodes for s in samples)
    total_edges = sum(s.num_edges for s in samples)
    n_pad = n_pad if n_pad is not None else pick_bucket(
        max(total_nodes, 1), node_buckets)
    e_pad = e_pad if e_pad is not None else pick_bucket(
        max(total_edges, 1), edge_buckets)
    if n_pad < total_nodes or e_pad < total_edges:
        raise ValueError(
            f'pad sizes ({n_pad},{e_pad}) smaller than actual '
            f'({total_nodes},{total_edges})')

    # Capacity pre-pass: dense batches can exceed the windowed scatter's
    # derived 2x-mean per-window capacity, which would force assembling
    # the edge arrays twice (the _required_e_pad recursion below stays as
    # the authoritative guard). One bincount per sample is ~free next to
    # the array fills it avoids.
    if not dynamic_cap:
        from pointvs_tpu.ops.sorted_segment import WINDOW
        nb_w = -(-n_pad // WINDOW) + 1
        hist_s = np.zeros(nb_w, np.int64)
        hist_r = np.zeros(nb_w, np.int64)
        off = 0
        for s in samples:
            if s.num_edges:
                hist_s += np.bincount((s.senders + off) // WINDOW,
                                      minlength=nb_w)[:nb_w]
                hist_r += np.bincount((s.receivers + off) // WINDOW,
                                      minlength=nb_w)[:nb_w]
            off += s.num_nodes
        max_load = int(max(hist_s.max(initial=0), hist_r.max(initial=0)))
        e_pad = max(e_pad, _e_pad_for_load(max_load, n_pad, e_pad))

    feat_dim = samples[0].node_feats.shape[1]
    edge_dim = samples[0].edge_attr.shape[1] if samples[0].num_edges else 3

    # np.empty + zero/fill only the padding TAILS after the copy loop:
    # the real region is overwritten anyway, and memsetting the ~3 MB of
    # full-size zeros measured ~20% of collation.
    node_feats = np.empty((n_pad, feat_dim), dtype=np.float32)
    coords = np.empty((n_pad, 3), dtype=np.float32)
    node_mask = np.empty((n_pad,), dtype=np.float32)
    graph_id = np.empty((n_pad,), dtype=np.int32)
    senders = np.empty((e_pad,), dtype=np.int32)
    receivers = np.empty((e_pad,), dtype=np.int32)
    edge_attr = np.empty((e_pad, edge_dim), dtype=np.float32)
    edge_mask = np.empty((e_pad,), dtype=np.float32)

    y0 = np.asarray(samples[0].y, dtype=np.float32)
    y_shape = (num_graphs,) if y0.ndim == 0 else (num_graphs,) + y0.shape
    y = np.zeros(y_shape, dtype=np.float32)
    graph_mask = np.zeros((num_graphs,), dtype=np.float32)
    strain = np.zeros((num_graphs, 2), dtype=np.float32)

    have_sample_perms = all(
        s.recv_perm is not None or not s.num_edges for s in samples)
    recv_perm = np.empty((e_pad,), dtype=np.int32)

    node_offset = 0
    edge_offset = 0
    for gid, sample in enumerate(samples):
        n, e = sample.num_nodes, sample.num_edges
        node_feats[node_offset:node_offset + n] = sample.node_feats
        coords[node_offset:node_offset + n] = sample.coords
        graph_id[node_offset:node_offset + n] = gid
        if e:
            senders[edge_offset:edge_offset + e] = (
                sample.senders + node_offset)
            receivers[edge_offset:edge_offset + e] = (
                sample.receivers + node_offset)
            edge_attr[edge_offset:edge_offset + e] = sample.edge_attr
            if have_sample_perms:
                recv_perm[edge_offset:edge_offset + e] = (
                    sample.recv_perm + edge_offset)
        y[gid] = np.asarray(sample.y, dtype=np.float32)
        graph_mask[gid] = 1.0
        strain[gid] = (sample.dE or 0.0, sample.rmsd or 0.0)
        node_offset += n
        edge_offset += e

    # Padding tails (real regions were filled above).
    node_feats[node_offset:] = 0.0
    coords[node_offset:] = 0.0
    node_mask[:node_offset] = 1.0
    node_mask[node_offset:] = 0.0
    graph_id[node_offset:] = num_graphs
    senders[edge_offset:] = n_pad
    receivers[edge_offset:] = n_pad
    edge_attr[edge_offset:] = 0.0
    edge_mask[:edge_offset] = 1.0
    edge_mask[edge_offset:] = 0.0
    recv_perm[edge_offset:] = np.arange(edge_offset, e_pad, dtype=np.int32)

    # Sort edges by destination (senders) — the MXU windowed-scatter path
    # (ops/sorted_segment.py) requires it. Padding edges (id n_pad) sort
    # to the end. recv_perm sorts by receivers for the mirror direction.
    # Counting argsort (native when available): ids are bounded by n_pad,
    # so O(E) beats numpy's comparison sort on every batch.
    # Per-sample edge lists come out of the radius kernels row-sorted and
    # offsets increase monotonically, so the concatenation is almost
    # always already sorted (padding ids == n_pad sit at the end) — one
    # vectorised monotonicity pass beats 4 full-array gathers.
    if not np.all(senders[1:] >= senders[:-1]):
        order = _argsort_ids(senders, n_pad)
        senders = senders[order]
        receivers = receivers[order]
        edge_attr = edge_attr[order]
        edge_mask = edge_mask[order]
        have_sample_perms = False  # offsets no longer line up
    if not have_sample_perms:
        # Fallback: whole-batch receiver sort. With per-sample perms the
        # concatenation above is already receiver-sorted: each sample's
        # receivers live in its own disjoint, increasing node-id range,
        # and padding (id n_pad) sits at the end.
        recv_perm = _argsort_ids(receivers, n_pad).astype(np.int32)

    if not dynamic_cap:
        needed = _required_e_pad(senders, receivers, n_pad, e_pad)
        if needed != e_pad:
            # Rare dense batch: rebuild with enough edge padding that the
            # windowed scatter's derived capacity covers realised loads.
            return pad_graphs_to_batch(samples, num_graphs=num_graphs,
                                       n_pad=n_pad, e_pad=needed)

    # Symmetry detection for the single-scatter gather-pair fast path
    # (see GraphBatch.inv_recv_perm): O(E) numpy, ~0.1 ms per batch.
    inv_recv_perm = None
    if np.array_equal(receivers[recv_perm], senders):
        inv_recv_perm = np.empty((e_pad,), np.int32)
        inv_recv_perm[recv_perm] = np.arange(e_pad, dtype=np.int32)

    return GraphBatch(node_feats, coords, node_mask, graph_id, senders,
                      receivers, edge_attr, edge_mask, y, graph_mask,
                      strain, recv_perm, inv_recv_perm)


def _argsort_ids(ids: np.ndarray, max_id: int) -> np.ndarray:
    try:
        from pointvs_tpu.native.build import native_counting_argsort
        order = native_counting_argsort(ids, max_id)
        if order is not None:
            return order
    except Exception:
        pass
    return np.argsort(ids, kind='stable')


def _max_window_load(ids: np.ndarray, n_pad: int, window: int) -> int:
    try:
        from pointvs_tpu.native.build import native_max_window_load
        load = native_max_window_load(ids, n_pad, window)
        if load is not None:
            return load
    except Exception:
        pass
    real = ids[ids < n_pad]
    return int(np.bincount(real // window).max()) if len(real) else 0


def _sorted_max_window_load(sorted_ids: np.ndarray, n_pad: int,
                            window: int) -> int:
    """Max ids per window for an ASCENDING id array (pads == n_pad at the
    end): O(n_pad/window * log E) via searchsorted, ~free per batch."""
    bounds = np.arange(0, n_pad + window, window, dtype=sorted_ids.dtype)
    idx = np.searchsorted(sorted_ids, bounds, side='left')
    return int(np.diff(idx).max()) if len(idx) > 1 else 0


def _e_pad_for_load(max_load: int, n_pad: int, e_pad: int) -> int:
    """Smallest e_pad (>= the given one, 512-stepped) whose derived
    per-window capacity covers ``max_load``; e_pad itself when it
    already does."""
    from pointvs_tpu.ops.sorted_segment import derive_max_eb
    if max_load <= derive_max_eb(e_pad, n_pad):
        return e_pad
    grown = e_pad
    for _ in range(64):
        grown = -(-int(grown * 1.25) // 512) * 512
        if derive_max_eb(grown, n_pad) >= max_load:
            return grown
    return -1


def _required_e_pad(senders, receivers, n_pad: int, e_pad: int) -> int:
    """The windowed scatter derives a static per-window edge capacity
    from (e_pad, n_pad). Return the e_pad under which the realised
    window loads fit — e_pad itself when they already do, a larger
    padding otherwise (dense pockets can exceed the 2x-mean capacity;
    growing the padding grows the derived capacity, costing only extra
    masked edges on rare pathological batches)."""
    from pointvs_tpu.ops.sorted_segment import WINDOW
    max_load = max(_sorted_max_window_load(senders, n_pad, WINDOW),
                   _max_window_load(receivers, n_pad, WINDOW))
    grown = _e_pad_for_load(max_load, n_pad, e_pad)
    if grown >= 0:
        return grown
    raise ValueError(
        f'Graph too dense for the windowed scatter: a {WINDOW}-node '
        f'window has {max_load} incident edges (e_pad={e_pad}, '
        f'n_pad={n_pad}).')


def batch_scatter_cap(batch: GraphBatch) -> int:
    """Measure a collated batch's required windowed-scatter capacity:
    the max per-window incident-edge count over BOTH aggregation
    directions, rounded to the coarse capacity-bucket grid (see
    ops.sorted_segment.cap_bucket). Both id streams are already sorted
    (senders by construction; receivers via recv_perm), so this is two
    O(n_pad/W log E) searchsorted passes plus one O(E) gather."""
    from pointvs_tpu.ops.sorted_segment import WINDOW, cap_bucket
    n_pad = batch.num_nodes
    load = max(
        _sorted_max_window_load(batch.senders, n_pad, WINDOW),
        _sorted_max_window_load(batch.receivers[batch.recv_perm],
                                n_pad, WINDOW))
    return cap_bucket(load)


def stack_device_batches(batches):
    """Stack equal-shape per-device batches along a new leading axis.

    Used for data parallelism: the result's arrays have shape [D, ...] and
    are fed to a ``shard_map``-ped train step over a ('dp',) mesh. Works
    for any flat NamedTuple of arrays (GraphBatch, DenseBatch, ...).
    """
    cls = type(batches[0])
    if (len(batches) > 1 and hasattr(batches[0], 'inv_recv_perm')
            and any(b.inv_recv_perm is None for b in batches)
            and any(b.inv_recv_perm is not None for b in batches)):
        # Mixed symmetry across device rows (e.g. a dummy last shard):
        # the fast path needs ALL rows symmetric — drop it batch-wide.
        batches = [b._replace(inv_recv_perm=None) for b in batches]
    shapes = {tuple(None if a is None else tuple(np.shape(a)) for a in b)
              for b in batches}
    if len(shapes) != 1:
        raise ValueError(f'device batches must share shapes, got {shapes}')
    if len(batches) == 1:
        # Zero-copy: a leading length-1 axis is a view, and np.stack's
        # full copy of ~6 MB of batch arrays was measurable per batch.
        return cls(*[None if arr is None else np.asarray(arr)[None]
                     for arr in batches[0]])
    return cls(*[None if arrs[0] is None else np.stack(arrs)
                 for arrs in zip(*batches)])
