"""Batched, prefetching graph data loader.

Replaces torch DataLoader + WeightedRandomSampler + pyg collation (ref
point_vs/preprocessing/data_loaders.py:481-520) with a TPU-friendly design:

- class-balanced *weighted sampling with replacement* for classification
  training (identical semantics to WeightedRandomSampler: one epoch =
  len(dataset) draws);
- samples are collated into statically-shaped bucketed ``GraphBatch``es
  (buckets.py) — XLA compiles once per (node-bucket, edge-bucket) pair;
- optional data-parallel layout: the batch is split into ``num_devices``
  equal sub-batches padded to a shared bucket and stacked along a leading
  device axis for ``shard_map``;
- a background prefetch thread keeps ``prefetch`` batches ready so host
  preprocessing overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from pointvs_tpu.data.buckets import (
    DEFAULT_EDGE_BUCKETS,
    DEFAULT_NODE_BUCKETS,
    GraphBatch,
    GraphSample,
    SiamesePair,
    batch_scatter_cap,
    bucket_sizes,
    pad_graphs_to_batch,
    pick_bucket,
    stack_device_batches,
)

# Dense (p, v, m) layout: nodes per GRAPH (not per batch) are bucketed; the
# all-pairs dense model is O(B * N^2 * K) so the grid is finer-grained.
DENSE_NODE_BUCKETS = bucket_sizes(64, 8192, ratio=1.3, multiple=64)
from pointvs_tpu.data.dataset import PointCloudDataset, SynthPharmDataset
from pointvs_tpu.logging import get_logger

LOG = get_logger('PointVS-TPU')


class BatchMeta:
    """Host-side metadata for one batch (filenames line up with graph
    slots). ``y``/``graph_mask`` are host copies of the batch targets so
    consumers (predictions writers) never need to read them back from a
    device-resident batch. ``cap`` is the batch's measured windowed-
    scatter capacity bucket (dynamic-cap loaders only; the step wrappers
    consume it — see parallel/steps.py). It lives here, not on the
    batch, so reading it never costs a D2H fetch."""

    __slots__ = ('lig_fnames', 'rec_fnames', 'y', 'graph_mask', 'cap')

    def __init__(self, lig_fnames: List[str], rec_fnames: List[str],
                 y=None, graph_mask=None, cap=None):
        self.lig_fnames = lig_fnames
        self.rec_fnames = rec_fnames
        self.y = y
        self.graph_mask = graph_mask
        self.cap = cap


class GraphDataLoader:
    """Iterable over (GraphBatch, BatchMeta) pairs."""

    def __init__(self, dataset: PointCloudDataset, batch_size: int = 32,
                 mode: str = 'train', num_devices: int = 1,
                 shuffle: Optional[bool] = None, drop_last: bool = False,
                 prefetch: int = 2, seed: int = 0,
                 node_buckets=DEFAULT_NODE_BUCKETS,
                 edge_buckets=DEFAULT_EDGE_BUCKETS,
                 shard_index: int = 0, num_shards: int = 1,
                 layout: str = 'graph', paired_dataset=None,
                 graph_shard: int = 1, scatter_cap: int = None):
        if layout not in ('graph', 'dense', 'pair'):
            raise ValueError(f'unknown layout {layout!r}')
        if layout == 'pair' and paired_dataset is None:
            raise ValueError("layout='pair' needs paired_dataset (the "
                             'ligand-side dataset)')
        if graph_shard > 1 and layout != 'graph':
            raise ValueError('--graph_shard requires the graph layout')
        self.layout = layout
        self.paired_dataset = paired_dataset
        # Edge parallelism: each data-parallel row's sub-batch ships as
        # [gp, ...] edge shards (parallel/graph_shard.py). num_devices
        # here counts dp ROWS; the full mesh is num_devices * graph_shard.
        self.graph_shard = graph_shard
        if batch_size % num_devices:
            raise ValueError(
                f'batch_size {batch_size} not divisible by num_devices '
                f'{num_devices}')
        self.dataset = dataset
        self.batch_size = batch_size
        self.mode = mode
        self.num_devices = num_devices
        self.shuffle = shuffle if shuffle is not None else (mode == 'train')
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.node_buckets = node_buckets
        self.edge_buckets = edge_buckets
        # Multi-host (DCN) data sharding: each process draws a disjoint
        # stripe of every epoch's index stream (weighted samples included),
        # replacing the reference's single-host WeightedRandomSampler
        # (SURVEY.md section 5.8).
        self.shard_index = shard_index
        self.num_shards = num_shards
        # Deterministic loaders (validation: no shuffle, no weighted
        # sampling, no rotation) produce identical batches every epoch —
        # cache the collated batches after the first pass.
        self._batch_cache = None
        self._cacheable = (mode != 'train' and not self.shuffle
                           and not getattr(dataset, 'rot', False)
                           and getattr(dataset, 'p_noise', -1) <= 0
                           and getattr(dataset, 'p_remove_entity', 0) <= 0)
        # Weighted class-balancing only for classification training (ref
        # data_loaders.py:506-509).
        self.use_weighted_sampler = (
            mode == 'train'
            and dataset.model_task == 'classification'
            and getattr(dataset, 'sample_weights', None) is not None)
        # Optional host->device transfer applied INSIDE the producer
        # thread (set by the training engine): collation, wire packing
        # and the async device_put then all overlap device compute, which
        # is worth ~2x end-to-end on tunneled backends where the H2D
        # path is slow. Consumers still get (batch, meta); meta carries
        # host y/graph_mask for predictions writers.
        self.transfer_fn = None
        # Per-batch scatter capacity (decoupled from e_pad): collation
        # measures the realised max window load and ships it as meta.cap
        # instead of growing e_pad on dense batches (which inflates every
        # per-edge tensor AND the derived capacity — 1.47x edge padding
        # at author scale). POINTVS_DYNAMIC_CAP=0 restores the coupled
        # scheme. Graph layout only; the edge-sharded (graph_shard)
        # collator keeps the shape-derived capacity.
        # Multi-process runs must keep it OFF: each process measures only
        # its local rows, and divergent caps would trace DIFFERENT
        # programs for one collective step (deadlock). Multihost already
        # pins buckets for the same reason.
        import os
        self.dynamic_cap = (
            layout == 'graph' and graph_shard == 1
            and (num_shards == 1 or scatter_cap is not None)
            and os.environ.get('POINTVS_DYNAMIC_CAP', '1') == '1')
        # Pinned capacity (--scatter_cap): multihost-safe variant of the
        # dynamic cap — every process uses the SAME user-chosen value, so
        # the collective step compiles one program. Batches whose
        # measured window load exceeds it raise (silent overflow would
        # corrupt aggregation).
        self.scatter_cap = scatter_cap if self.dynamic_cap else None
        # Device-resident dataset (data/device_dataset.py): when set (via
        # enable_device_dataset), the producer emits ('ids', ...) batches
        # — per-step H2D is just the sampled item ids — and the jitted
        # step collates on device. The training engine enables this for
        # eligible datasets that fit the HBM budget.
        self.device_store = None
        # Sticky cap: meta.cap is the running MAX of measured caps, not
        # the per-batch value. The step wrappers key their trace cache on
        # the cap value, so per-batch caps would compile a fresh program
        # whenever sampling composes a batch with a new (even SMALLER)
        # bucket — measured as a 2.5x end-to-end regression. A monotone
        # cap converges to one program within the first epoch (the coarse
        # 1.35x bucket grid makes new records rare) and capacity-above-
        # load is always numerically safe.
        self._cap_high = 0
        # Train epochs started by this loader: drives the dataset's
        # deterministic per-(seed, epoch, item) augmented-active
        # rotations and the hybrid device-store tail refresh. A resumed
        # run's loader counts from 0 again — same semantics as the
        # loader's own rng stream, which also replays from its seed.
        self._epochs_started = 0

    def seed_scatter_cap(self, cap: int) -> None:
        """Pre-seed the sticky dynamic cap (``_cap_high``): a caller that
        probed its epoch compositions (bench.py) or recorded a previous
        run's realised capacity (training/engine train_spec.yaml) starts
        the running max at that value, so the step program compiles ONCE
        at the final capacity instead of re-compiling whenever a later
        epoch sets a new record mid-run — recompiles inside a training
        or measurement window cost 40-240 s on the remote service."""
        self._cap_high = max(self._cap_high, int(cap))

    def _meta_cap(self, measured: int) -> int:
        """meta.cap from a batch's measured capacity bucket: the pinned
        --scatter_cap when set (multihost-deterministic; overflow is a
        hard error), else the sticky running max (see __init__)."""
        if self.scatter_cap is not None:
            if measured > self.scatter_cap:
                raise ValueError(
                    f'--scatter_cap {self.scatter_cap} is below this '
                    f'batch\'s required windowed-scatter capacity '
                    f'{measured}; raise it (or unset to use per-batch '
                    f'caps on single-process runs)')
            return self.scatter_cap
        self._cap_high = max(self._cap_high, measured)
        return self._cap_high

    def __len__(self):
        n = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.use_weighted_sampler:
            weights = np.asarray(self.dataset.sample_weights, dtype=np.float64)
            probs = weights / weights.sum()
            idx = self.rng.choice(n, size=n, replace=True, p=probs)
        else:
            idx = np.arange(n)
            if self.shuffle:
                self.rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def _collate_dense(self, samples):
        from pointvs_tpu.models.vanilla import dense_collate
        meta = BatchMeta([s.lig_fname for s in samples],
                         [s.rec_fname for s in samples])
        per_dev = self.batch_size // self.num_devices
        max_len = pick_bucket(max(s.num_nodes for s in samples),
                              DENSE_NODE_BUCKETS)
        if self.num_devices == 1:
            batch = dense_collate(samples, max_len,
                                  num_graphs=self.batch_size)
            return stack_device_batches([batch]), meta
        chunks = [samples[d * per_dev:(d + 1) * per_dev]
                  for d in range(self.num_devices)]
        batches = [dense_collate(c or samples[:1], max_len,
                                 num_graphs=per_dev) for c in chunks]
        for d, c in enumerate(chunks):
            if not c:
                batches[d] = batches[d]._replace(
                    graph_mask=np.zeros_like(batches[d].graph_mask))
        return stack_device_batches(batches), meta

    def _collate_pair(self, rec_samples, lig_samples):
        """Two slot-aligned GraphBatches (receptor / ligand towers)."""
        meta = BatchMeta([s.lig_fname for s in rec_samples],
                         [s.rec_fname for s in rec_samples])
        per_dev = self.batch_size // self.num_devices

        def side(samples):
            if self.num_devices == 1:
                return stack_device_batches([pad_graphs_to_batch(
                    samples, num_graphs=self.batch_size,
                    node_buckets=self.node_buckets,
                    edge_buckets=self.edge_buckets)])
            # Contiguous chunks (NOT size-balanced): rec/lig slots must
            # stay aligned across the two sides.
            chunks = [samples[d * per_dev:(d + 1) * per_dev]
                      for d in range(self.num_devices)]
            max_n = max(sum(s.num_nodes for s in c) for c in chunks if c)
            max_e = max(sum(s.num_edges for s in c) for c in chunks if c)
            n_pad = pick_bucket(max(max_n, 1), self.node_buckets)
            e_pad = pick_bucket(max(max_e, 1), self.edge_buckets)
            batches = []
            for c in chunks:
                is_dummy = not c
                b = pad_graphs_to_batch(c or [_dummy_sample(samples[0])],
                                        num_graphs=per_dev,
                                        n_pad=n_pad, e_pad=e_pad)
                if is_dummy:
                    b = b._replace(graph_mask=np.zeros_like(b.graph_mask))
                batches.append(b)
            return stack_device_batches(batches)

        return SiamesePair(rec=side(rec_samples),
                           lig=side(lig_samples)), meta

    def _check_pinned_shapes(self, batch: GraphBatch) -> None:
        """Multi-process runs pad to pinned single buckets; a batch that
        silently extended past them (pick_bucket grows the grid, the
        capacity pre-pass grows e_pad) would trace a different program
        on one process and deadlock the collective step — fail loudly
        instead."""
        if self.num_shards <= 1:
            return
        # Edge-sharded batches are [gp, ...]-stacked with the edge axis
        # SPLIT over gp; read the padded sizes off the trailing dims and
        # recover the pre-split edge total.
        n_pad = int(np.asarray(batch.node_feats).shape[-2])
        e_pad = int(np.asarray(batch.senders).shape[-1])
        if np.asarray(batch.senders).ndim > 1:
            e_pad *= self.graph_shard
        if (len(self.node_buckets) == 1 and len(self.edge_buckets) == 1
                and (n_pad != self.node_buckets[0]
                     or e_pad != self.edge_buckets[0])):
            raise ValueError(
                f'batch padded to ({n_pad}, {e_pad}) '
                f'— beyond the pinned buckets ({self.node_buckets[0]}, '
                f'{self.edge_buckets[0]}); raise --node_bucket/'
                f'--edge_bucket (and --scatter_cap if set)')

    def _collate(self, samples: List[GraphSample]
                 ) -> Tuple[GraphBatch, BatchMeta]:
        meta = BatchMeta([s.lig_fname for s in samples],
                         [s.rec_fname for s in samples])
        if self.num_devices == 1 and self.graph_shard == 1:
            batch = pad_graphs_to_batch(
                samples, num_graphs=self.batch_size,
                node_buckets=self.node_buckets,
                edge_buckets=self.edge_buckets,
                dynamic_cap=self.dynamic_cap)
            self._check_pinned_shapes(batch)
            if self.dynamic_cap:
                meta.cap = self._meta_cap(batch_scatter_cap(batch))
            # Leading device axis [1, ...] so train/eval steps see one
            # layout regardless of mesh size.
            return stack_device_batches([batch]), meta

        # Data-parallel: split graphs round-robin by size (largest first) so
        # per-device node/edge totals balance, then pad all shards to the
        # *same* bucket so shapes match across the device axis.
        per_dev = self.batch_size // self.num_devices
        order = sorted(range(len(samples)),
                       key=lambda i: -samples[i].num_nodes)
        shards: List[List[GraphSample]] = [[] for _ in range(self.num_devices)]
        loads = np.zeros(self.num_devices, dtype=np.int64)
        for i in order:
            dev = int(np.argmin(loads + np.where(
                np.array([len(s) for s in shards]) >= per_dev, 1 << 40, 0)))
            shards[dev].append(samples[i])
            loads[dev] += samples[i].num_nodes
        # Meta must line up with graph slots: re-order filenames to match.
        flat = [s for shard in shards for s in shard]
        meta = BatchMeta([s.lig_fname for s in flat],
                         [s.rec_fname for s in flat])
        max_nodes = max((sum(s.num_nodes for s in sh) for sh in shards if sh),
                        default=1)
        max_edges = max((sum(s.num_edges for s in sh) for sh in shards if sh),
                        default=1)
        n_pad = pick_bucket(max(max_nodes, 1), self.node_buckets)
        e_pad = pick_bucket(max(max_edges, 1), self.edge_buckets)
        dummy = None
        batches = []
        for shard in shards:
            is_dummy = not shard
            if is_dummy:
                if dummy is None:
                    dummy = _dummy_sample(samples[0])
                shard = [dummy]
            if self.graph_shard > 1:
                # [gp, ...]: the row's edges split over the gp columns,
                # node arrays replicated (parallel/graph_shard.py).
                from pointvs_tpu.parallel.graph_shard import \
                    shard_graph_batch
                shard_batch = shard_graph_batch(
                    shard, self.graph_shard, num_graphs=per_dev,
                    n_pad=n_pad, e_pad=e_pad)
            else:
                shard_batch = pad_graphs_to_batch(
                    shard, num_graphs=per_dev, n_pad=n_pad, e_pad=e_pad,
                    dynamic_cap=self.dynamic_cap)
            if is_dummy:
                # Placeholder graphs must not count as real examples.
                shard_batch = shard_batch._replace(
                    graph_mask=np.zeros_like(shard_batch.graph_mask))
            batches.append(shard_batch)
        for b in batches:
            self._check_pinned_shapes(b)
        if self.dynamic_cap:
            # One capacity for all shards (shapes — and therefore the
            # compiled program — are shared across the device axis).
            meta.cap = self._meta_cap(
                max(batch_scatter_cap(b) for b in batches))
        return stack_device_batches(batches), meta

    def enable_device_dataset(self, store) -> None:
        """Switch this loader to device-resident collation (store is a
        device_dataset.DeviceGraphStore built from this loader's
        dataset). Graph layout, no graph sharding; multi-process runs
        additionally need pinned single buckets + --scatter_cap so every
        process compiles the one identical spec (divergent specs would
        trace different programs for one collective step)."""
        if self.layout != 'graph' or self.graph_shard > 1:
            raise ValueError('device-resident datasets require the graph '
                             'layout without graph sharding')
        if self.num_shards > 1 and not (
                len(self.node_buckets) == 1 and len(self.edge_buckets) == 1
                and self.scatter_cap is not None):
            raise ValueError('multi-process device-resident datasets need '
                             'pinned --node_bucket/--edge_bucket and '
                             '--scatter_cap (processes cannot negotiate '
                             'batch specs)')
        if len(store.host.num_nodes) != len(self.dataset):
            raise ValueError('store was built from a different dataset')
        self.device_store = store
        self._batch_cache = None   # cached host batches are the old form

    def _produce_ids(self, indices) -> Iterator[Tuple[tuple, BatchMeta]]:
        """Device-resident batches: ('ids', ids[D, B], store, spec)."""
        from pointvs_tpu.data.device_dataset import (DeviceCollateSpec,
                                                     batch_row_cap)
        from pointvs_tpu.data.buckets import _e_pad_for_load
        store = self.device_store
        host = store.host
        per_dev = self.batch_size // self.num_devices
        rotate = self.mode == 'train' and host.rot
        for start in range(0, len(indices), self.batch_size):
            chunk = [int(i) for i in indices[start:start + self.batch_size]]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            if self.num_devices == 1:
                rows = [chunk]
            else:
                # Largest-first round-robin balancing, as _collate does.
                order = sorted(chunk,
                               key=lambda i: -int(host.num_nodes[i]))
                rows = [[] for _ in range(self.num_devices)]
                loads = np.zeros(self.num_devices, np.int64)
                for i in order:
                    free = [d for d in range(self.num_devices)
                            if len(rows[d]) < per_dev]
                    dev = min(free, key=lambda d: loads[d])
                    rows[dev].append(i)
                    loads[dev] += int(host.num_nodes[i])
            ids = np.full((self.num_devices, per_dev), -1, np.int32)
            for d, r in enumerate(rows):
                ids[d, :len(r)] = r
            max_n = max((int(host.num_nodes[r].sum()) for r in rows if r),
                        default=1)
            max_e = max((int(host.num_edges[r].sum()) for r in rows if r),
                        default=1)
            n_pad = pick_bucket(max(max_n, 1), self.node_buckets)
            e_pad = pick_bucket(max(max_e, 1), self.edge_buckets)
            if self.num_shards > 1 and (n_pad != self.node_buckets[0]
                                        or e_pad != self.edge_buckets[0]):
                # pick_bucket silently extends past the grid; divergent
                # per-process shapes would deadlock the collective step.
                raise ValueError(
                    f'batch exceeds the pinned buckets '
                    f'({max_n}/{max_e} vs {self.node_buckets[0]}/'
                    f'{self.edge_buckets[0]}); raise --node_bucket/'
                    f'--edge_bucket')
            loads_w = [batch_row_cap(host, ids[d], n_pad, bucket=False)
                       for d in range(self.num_devices)]
            cap = None
            if self.dynamic_cap:
                from pointvs_tpu.ops.sorted_segment import cap_bucket
                cap = self._meta_cap(cap_bucket(max(loads_w)))
            else:
                # Legacy coupled scheme: grow the edge padding until the
                # shape-derived window capacity covers the realised load.
                e_pad = max(e_pad, _e_pad_for_load(max(loads_w), n_pad,
                                                   e_pad))
            spec = DeviceCollateSpec(n_pad=n_pad, e_pad=e_pad,
                                     num_graphs=per_dev,
                                     symmetric=host.symmetric,
                                     rotate=rotate)
            flat = [i for r in rows for i in r]
            meta = BatchMeta([host.lig_fnames[i] for i in flat],
                             [host.rec_fnames[i] for i in flat])
            yv = host.arrays.y
            ym = np.zeros((self.num_devices, per_dev) + yv.shape[1:],
                          np.float32)
            gm = np.zeros((self.num_devices, per_dev), np.float32)
            for d, r in enumerate(rows):
                if r:
                    ym[d, :len(r)] = yv[r]
                    gm[d, :len(r)] = 1.0
            meta.y = ym
            meta.graph_mask = gm
            meta.cap = cap
            yield ('ids', ids, store, spec), meta

    def _produce(self) -> Iterator[Tuple[GraphBatch, BatchMeta]]:
        indices = self._epoch_indices()
        if self.device_store is not None:
            yield from self._produce_ids(indices)
            return
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            samples = [self.dataset[int(i)] for i in chunk]
            if self.layout == 'dense':
                batch, meta = self._collate_dense(samples)
            elif self.layout == 'pair':
                lig = [self.paired_dataset[int(i)] for i in chunk]
                batch, meta = self._collate_pair(samples, lig)
            else:
                batch, meta = self._collate(samples)
            meta.y = np.asarray(batch.y)
            meta.graph_mask = np.asarray(batch.graph_mask)
            if self.graph_shard > 1 and self.layout == 'graph':
                # [dp, gp, B_row]: graph arrays are replicated along gp
                # and the 2-D eval step emits [dp, B_row, out] logits —
                # collapse gp so meta lines up with the logits.
                meta.y = meta.y[:, 0]
                meta.graph_mask = meta.graph_mask[:, 0]
            yield batch, meta

    def _apply_transfer(self, item):
        """Ship a host batch to device (runs in the producer thread when
        prefetching, so the H2D transfer overlaps device compute)."""
        if self.transfer_fn is None:
            return item
        batch, meta = item
        return self.transfer_fn(batch), meta

    def __iter__(self):
        if self.mode == 'train':
            # Advance the augmented-active rotation stream (keyed by
            # (seed, epoch, item) inside the dataset) and, in hybrid
            # device-resident mode, re-featurise + re-upload the aug
            # tail BEFORE the producer starts consuming store metadata.
            epoch = self._epochs_started
            self._epochs_started += 1
            if hasattr(self.dataset, 'set_epoch'):
                self.dataset.set_epoch(epoch)
            refresh = getattr(self.device_store, 'refresh', None)
            if refresh is not None:
                refresh(self.dataset, epoch)
                # Featurise NEXT epoch's aug graphs while this one
                # trains (rotations are deterministic per epoch).
                self.device_store.prefetch_refresh(self.dataset,
                                                   epoch + 1)
        # Deterministic loaders cache HOST batches; the device transfer is
        # re-applied per pass (the async device_put still pipelines ahead
        # of the consumer).
        if self._cacheable and self._batch_cache is not None:
            for item in self._batch_cache:
                yield self._apply_transfer(item)
            return
        cache = [] if self._cacheable else None
        if self.prefetch <= 0:
            for item in self._produce():
                if cache is not None:
                    cache.append(item)
                yield self._apply_transfer(item)
        else:
            q: queue.Queue = queue.Queue(maxsize=self.prefetch)
            sentinel = object()
            error_holder = []

            def worker():
                try:
                    for item in self._produce():
                        # Transfer runs here, in the producer thread, so
                        # collation + packing + H2D overlap the consumer's
                        # device compute.
                        q.put((item, self._apply_transfer(item)))
                except BaseException as exc:  # surface in consumer thread
                    error_holder.append(exc)
                finally:
                    q.put(sentinel)

            thread = threading.Thread(target=worker, daemon=True)
            thread.start()
            while True:
                got = q.get()
                if got is sentinel:
                    if error_holder:
                        raise error_holder[0]
                    break
                host_item, out_item = got
                if cache is not None:
                    cache.append(host_item)
                yield out_item
        if cache is not None:
            if self.dynamic_cap and self.scatter_cap is None:
                # Normalise cached caps to the pass-1 running max so every
                # later pass replays ONE compiled program (metas captured
                # early in pass 1 hold lower sticky values). Pinned
                # --scatter_cap metas are already uniform.
                for _, m in cache:
                    if m.cap is not None:
                        m.cap = self._cap_high
            self._batch_cache = cache


def _dummy_sample(template: GraphSample) -> GraphSample:
    """A 1-node, 0-edge placeholder graph (masked out downstream)."""
    y = np.asarray(template.y)
    return GraphSample(
        node_feats=np.zeros((1, template.node_feats.shape[1]), np.float32),
        coords=np.zeros((1, 3), np.float32),
        senders=np.zeros(0, np.int32), receivers=np.zeros(0, np.int32),
        edge_attr=np.zeros((0, 3), np.float32),
        y=np.zeros(y.shape, np.float32) if y.ndim else np.float32(0),
        lig_fname='', rec_fname='')


def get_data_loader(
        data_root, dataset_class=PointCloudDataset, receptors=None,
        batch_size: int = 32, compact: bool = True,
        use_atomic_numbers: bool = False, radius: float = 6,
        rot: bool = True, augmented_actives: int = 0,
        min_aug_angle: float = 30, polar_hydrogens: bool = True,
        mode: str = 'train', model_task: str = 'classification',
        max_active_rms_distance=None, fname_suffix: str = 'parquet',
        min_inactive_rms_distance=None, types_fname=None,
        edge_radius=None, prune: bool = False, estimate_bonds: bool = False,
        bp=None, p_noise: float = -1, num_devices: int = 1,
        prefetch: int = 2, seed: int = 0, cache_dir=None,
        shard_index: int = 0, num_shards: int = 1,
        layout: str = 'graph', graph_shard: int = 1,
        node_buckets=DEFAULT_NODE_BUCKETS,
        edge_buckets=DEFAULT_EDGE_BUCKETS,
        scatter_cap: int = None,
        **kwargs) -> GraphDataLoader:
    """Build dataset + loader with the reference's flag surface
    (ref data_loaders.py:481-520)."""
    del receptors  # accepted for parity; unused (ref also ignores it)

    def make_ds(bp_filter):
        return dataset_class(
            data_root, compact=compact,
            augmented_active_count=augmented_actives,
            augmented_active_min_angle=min_aug_angle,
            polar_hydrogens=polar_hydrogens,
            max_active_rms_distance=max_active_rms_distance,
            min_inactive_rms_distance=min_inactive_rms_distance,
            use_atomic_numbers=use_atomic_numbers,
            fname_suffix=fname_suffix, types_fname=types_fname,
            edge_radius=edge_radius, estimate_bonds=estimate_bonds,
            prune=prune, bp=bp_filter, radius=radius, rot=rot,
            model_task=model_task, p_noise=p_noise, seed=seed,
            cache_dir=cache_dir, **kwargs)

    paired = None
    if layout == 'pair':
        # Receptor tower = bp 1, ligand tower = bp 0, same types file and
        # index stream (ref siamese.py zips two entity-filtered loaders).
        ds = make_ds(1)
        paired = make_ds(0)
    else:
        ds = make_ds(bp)
    return GraphDataLoader(
        ds, batch_size=batch_size, mode=mode, num_devices=num_devices,
        prefetch=prefetch, seed=seed, shard_index=shard_index,
        num_shards=num_shards, layout=layout, paired_dataset=paired,
        graph_shard=graph_shard, node_buckets=node_buckets,
        edge_buckets=edge_buckets, scatter_cap=scatter_cap)
