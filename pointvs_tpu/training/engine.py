"""Trainer: the train/eval engine.

Behavioural counterpart of the reference's PointNeuralNetworkBase
(point_vs/models/point_neural_network_base.py): epoch/batch training loop
with per-batch LR scheduling, BCE / MSE / Huber / masked-3-target losses,
gradient value clipping at 1.0, NaN-loss abort, incremental
``<task>_predictions*.txt`` artefacts, top1/Pearson model selection for
--only_save_best_models, per-epoch checkpoints with optimiser state and
both (pose, affinity) epoch counters, and task switching via set_task.

TPU-native differences:
- the train step is one jit-compiled SPMD program (forward + backward +
  optimiser) over a data-parallel device mesh — compiled once per batch
  bucket shape;
- checkpoints are orbax directories (not torch .pt);
- progress is rich-rendered when attached to a tty, plain logs otherwise.
"""
from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointvs_tpu.analysis.top_n import top_n
from pointvs_tpu.data.buckets import DenseBatch, GraphBatch, SiamesePair
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.registry import MODEL_REGISTRY, build_model, \
    filter_model_kwargs, model_input_kind
from pointvs_tpu.parallel.mesh import get_mesh, replicate, shard_batch
from pointvs_tpu.parallel.steps import make_eval_step, make_train_step
from pointvs_tpu.training.checkpoints import restore_checkpoint, \
    save_checkpoint
from pointvs_tpu.training.metrics_logger import MetricsLogger
from pointvs_tpu.training.optimisers import build_optimiser, make_lr_schedule
from pointvs_tpu.utils import expand_path, format_time, \
    get_regression_pearson, load_yaml, mkdir, save_yaml

LOG = get_logger('PointVS-TPU')

VALID_TASKS = ('classification', 'regression', 'multi_regression')


def _progress_ctx():
    """rich progress bars when attached to a tty (reference UX,
    point_neural_network_base.py:40-43); a no-op shim otherwise."""
    import sys

    class _Null:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def add_task(self, *a, **k):
            return None

        def update(self, *a, **k):
            pass

        def reset(self, *a, **k):
            pass

    if not sys.stderr.isatty():
        return _Null()
    try:
        from rich.progress import Progress, TimeElapsedColumn
        return Progress(*Progress.get_default_columns(),
                        TimeElapsedColumn(), transient=False,
                        refresh_per_second=2)
    except ImportError:
        return _Null()


def _dummy_batch(dim_input: int, num_graphs: int = 1) -> GraphBatch:
    """Smallest valid batch for parameter initialisation."""
    n, e = 8, 8
    return GraphBatch(
        node_feats=np.zeros((n, dim_input), np.float32),
        coords=np.zeros((n, 3), np.float32),
        node_mask=np.ones((n,), np.float32),
        graph_id=np.zeros((n,), np.int32),
        senders=np.arange(e, dtype=np.int32) % n,
        receivers=(np.arange(e, dtype=np.int32) + 1) % n,
        edge_attr=np.zeros((e, 3), np.float32),
        edge_mask=np.ones((e,), np.float32),
        y=np.zeros((num_graphs,), np.float32),
        graph_mask=np.ones((num_graphs,), np.float32),
        strain=np.zeros((num_graphs, 2), np.float32),
        recv_perm=np.argsort((np.arange(e) + 1) % n).astype(np.int32))


def _dummy_input(input_kind: str, dim_input: int):
    """Smallest valid model input for parameter init, by input kind."""
    if input_kind == 'pair':
        return SiamesePair(rec=_dummy_batch(dim_input),
                           lig=_dummy_batch(dim_input))
    if input_kind == 'dense':
        return DenseBatch(p=np.zeros((1, 8, 3), np.float32),
                          v=np.zeros((1, 8, dim_input), np.float32),
                          m=np.ones((1, 8), np.float32),
                          y=np.zeros((1,), np.float32),
                          graph_mask=np.ones((1,), np.float32))
    return _dummy_batch(dim_input)


class Trainer:
    """Owns model + params + optimiser state and runs train/val loops."""

    def __init__(self, model_name: str, save_path, learning_rate: float,
                 weight_decay: Optional[float] = None,
                 wandb_project: Optional[str] = None,
                 wandb_run: Optional[str] = None, silent: bool = False,
                 use_1cycle: bool = False, warm_restarts: bool = False,
                 only_save_best_models: bool = False,
                 optimiser: str = 'adam', regression_loss: str = 'mse',
                 num_devices: Optional[int] = None, seed: int = 2,
                 wandb_dir=None, profile: bool = False,
                 graph_shard: int = 1, device_cache: str = 'auto',
                 double: bool = False, **model_kwargs):
        assert not (use_1cycle and warm_restarts), \
            '1cycle and warm restarts are mutually exclusive'
        from pointvs_tpu.compile_cache import \
            enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        self.model_name = model_name
        self.multitask = model_name == 'multitask'
        self.save_path = expand_path(save_path)
        self.silent = silent
        if not silent:
            mkdir(self.save_path)
        self.predictions_file = self.save_path / 'predictions.txt'

        self.profile = profile
        self._profiling = False
        self.lr = learning_rate
        self.weight_decay = weight_decay
        self.use_1cycle = use_1cycle
        self.warm_restarts = warm_restarts
        self.only_save_best_models = only_save_best_models
        self.optimiser_name = optimiser
        self.regression_loss = regression_loss
        self.model_kwargs = dict(model_kwargs)

        self.set_task(model_kwargs.get('model_task', 'classification'))
        self.p_epoch = 0
        self.a_epoch = 0
        self.global_iter = 0
        self.test_metric = 0.0
        self.log_interval = 10
        self.decoy_mean_pred, self.active_mean_pred = 0.5, 0.5

        # Edge parallelism (--graph_shard): a 2-D (dp x gp) mesh where
        # each dp row trains its own sub-batch with the edge arrays split
        # over the gp columns (parallel/graph_shard.py). For huge
        # complexes whose edge tensors exceed one device's memory.
        self.graph_shard = max(1, graph_shard)
        if self.graph_shard > 1:
            total = num_devices or len(jax.devices())
            if total % self.graph_shard:
                raise ValueError(
                    f'num_devices {total} not divisible by graph_shard '
                    f'{self.graph_shard}')
            from pointvs_tpu.parallel.mesh import get_mesh_2d
            self.mesh = get_mesh_2d(total // self.graph_shard,
                                    self.graph_shard)
            self.num_devices = total
        else:
            self.mesh = get_mesh(num_devices)
            self.num_devices = self.mesh.devices.size

        build_kwargs = dict(model_kwargs)
        if self.graph_shard > 1:
            # The model's aggregations psum over 'gp' inside the sharded
            # steps. Kept OUT of self.model_kwargs so model_kwargs.yaml /
            # checkpoints stay loadable on a single device.
            build_kwargs['edge_shard_axis'] = 'gp'
        if (model_kwargs.get('graphnorm_whole_batch')
                and (num_devices or len(jax.devices())) > 1):
            # --strict_graphnorm under DP: whole-batch statistics psum
            # across the dp axis so they cover the GLOBAL batch — the
            # reference's batch=None semantics at the same global batch
            # size (ADVICE r4). Also kept out of self.model_kwargs.
            build_kwargs['batch_shard_axis'] = 'dp'
        self.model = build_model(model_name, **build_kwargs)
        self.input_kind = model_input_kind(model_name)
        self.rng = jax.random.PRNGKey(seed)
        dim_input = model_kwargs.get('dim_input', 12)
        init_rng, self.rng = jax.random.split(self.rng)
        # jit the init: eager init dispatches op-by-op, which is minutes
        # over a remote-tunnel TPU backend. An edge-sharded model's psums
        # reference a mesh axis only bound inside shard_map, so init runs
        # on an unsharded clone (param shapes are sharding-independent).
        init_model = self.model
        unshard = {k: None for k in ('edge_shard_axis', 'batch_shard_axis')
                   if getattr(self.model, k, None) is not None}
        if unshard:
            init_model = self.model.clone(**unshard)
        params = jax.jit(init_model.init)(
            {'params': init_rng, 'dropout': init_rng},
            _dummy_input(self.input_kind, dim_input))
        self.double = double
        if double:
            # Real float64 training (--double, ref point_vs.py:46-51 ==
            # torch.set_default_dtype(float64)): promote every float
            # param; the f32 batch data then promotes per-op, so the
            # whole compute path (and the optimiser state initialised
            # below) runs in f64. CPU-only — main.py gates the backend.
            if not jax.config.jax_enable_x64:
                raise ValueError('double=True requires jax_enable_x64')
            params = jax.tree.map(
                lambda p: (p.astype(jnp.float64)
                           if jnp.issubdtype(p.dtype, jnp.floating) else p),
                params)
        self.tx = build_optimiser(optimiser, weight_decay)
        opt_state = self.tx.init(params)
        self.params = replicate(params, self.mesh)
        self.opt_state = replicate(opt_state, self.mesh)

        # Device-resident dataset stores (data/device_dataset.py), one
        # per dataset object. 'auto' enables when the dataset is
        # eligible and fits the HBM budget; 'on' demands it; 'off'
        # keeps the streaming wire path.
        if device_cache not in ('auto', 'on', 'off'):
            raise ValueError(f'device_cache must be auto/on/off, got '
                             f'{device_cache!r}')
        self.device_cache = device_cache
        self._device_stores: Dict[int, Any] = {}

        self._train_steps: Dict[str, Any] = {}
        self._eval_steps: Dict[str, Any] = {}
        # Packed-program records for the train_spec.yaml sidecar (one
        # entry per compiled (template, symmetric, cap) train program) —
        # lets the NEXT run background-compile its executables while the
        # cold first epoch featurises (see _prewarm_train_step).
        self._train_spec_seen: Dict[tuple, dict] = {}
        self.scheduler = None
        self._task_step_counter = {'classification': 0, 'regression': 0,
                                   'multi_regression': 0}

        if not silent:
            save_yaml(self.model_kwargs, self.save_path / 'model_kwargs.yaml')
        self.logger = MetricsLogger(
            self.save_path, wandb_project=wandb_project, wandb_run=wandb_run,
            wandb_dir=wandb_dir, config={**self.model_kwargs,
                                         'model': model_name})
        if not silent:
            LOG.info(f'Model parameters: {self.param_count}')
        self.logger.log({'Parameters': self.param_count})

    # ------------------------------------------------------------------ #
    @property
    def host_model(self):
        """The model with mesh-axis bindings cleared — for callers that
        apply it OUTSIDE the sharded step functions (attribution tools,
        single-graph probes), where psum axes are unbound."""
        unshard = {k: None for k in ('edge_shard_axis', 'batch_shard_axis')
                   if getattr(self.model, k, None) is not None}
        return self.model.clone(**unshard) if unshard else self.model

    @property
    def param_count(self) -> int:
        return int(sum(np.prod(p.shape)
                       for p in jax.tree.leaves(self.params)))

    def set_task(self, task: str):
        if task not in VALID_TASKS:
            raise ValueError('Argument for set_task must be one of '
                             'classification, regression or multi_regression')
        self.model_task = task
        if 'regression' in task:
            self.model_task_for_fnames = 'affinity'
            self.model_task_string = 'Mean squared error'
        else:
            self.model_task_for_fnames = 'pose'
            self.model_task_string = 'Binary crossentropy'

    def _train_step(self):
        key = self.model_task
        if key not in self._train_steps:
            if self.graph_shard > 1:
                from pointvs_tpu.parallel.graph_shard import \
                    make_train_step_2d
                self._train_steps[key] = make_train_step_2d(
                    self.model, self.tx, key, self.regression_loss,
                    self.mesh, multitask=self.multitask)
            else:
                self._train_steps[key] = make_train_step(
                    self.model, self.tx, key, self.regression_loss,
                    self.mesh, multitask=self.multitask, with_metrics=True)
        return self._train_steps[key]

    def _eval_step(self):
        key = self.model_task
        if key not in self._eval_steps:
            if self.graph_shard > 1:
                from pointvs_tpu.parallel.graph_shard import \
                    make_eval_step_2d
                self._eval_steps[key] = make_eval_step_2d(
                    self.model, key, self.mesh, multitask=self.multitask)
            else:
                self._eval_steps[key] = make_eval_step(
                    self.model, key, self.mesh, multitask=self.multitask)
        return self._eval_steps[key]

    def _maybe_enable_device_dataset(self, loader) -> None:
        """Switch ``loader`` to device-resident collation when allowed:
        the whole featurised dataset ships to HBM once and each step's
        H2D is just the sampled item ids (see data/device_dataset.py).
        Governed by ``device_cache`` (auto/on/off), dataset eligibility
        (no per-epoch host randomness baked into the graphs) and the
        POINTVS_DD_BUDGET_MB upload budget (default 2048)."""
        import os
        if (self.device_cache == 'off'
                or os.environ.get('POINTVS_DEVICE_DATASET', '1') == '0'):
            return
        demanded = self.device_cache == 'on'
        from pointvs_tpu.data.loader import GraphDataLoader
        # Multi-process runs qualify only with pinned single buckets AND
        # a pinned --scatter_cap: the one identical batch spec then
        # compiles the one identical program on every process.
        multiproc_ok = (
            len(getattr(loader, 'node_buckets', ())) == 1
            and len(getattr(loader, 'edge_buckets', ())) == 1
            and getattr(loader, 'scatter_cap', None) is not None)
        if (not isinstance(loader, GraphDataLoader)
                or loader.layout != 'graph' or loader.graph_shard > 1
                or self.graph_shard > 1
                or ((loader.num_shards > 1 or jax.process_count() > 1)
                    and not multiproc_ok)):
            if demanded:
                raise ValueError(
                    '--device_cache on requires the graph layout without '
                    'graph sharding; multi-process runs additionally '
                    'need pinned --node_bucket/--edge_bucket and '
                    '--scatter_cap')
            return
        if loader.device_store is not None:
            return
        from pointvs_tpu.data.device_dataset import (
            DeviceGraphStore, build_host_store, store_eligibility)
        reason = store_eligibility(loader.dataset)
        if reason is not None:
            if demanded:
                raise ValueError(f'--device_cache on: {reason}')
            LOG.info(f'Device-resident dataset disabled: {reason}')
            return
        # Keyed by object identity; the dict holds the dataset itself so
        # the id cannot be recycled by a later allocation after GC.
        hit = self._device_stores.get(id(loader.dataset))
        store = hit[1] if hit is not None else None
        if store is None:
            budget = float(os.environ.get('POINTVS_DD_BUDGET_MB',
                                          '2048')) * 1e6
            # Cheap probe before the full featurisation pass: estimate
            # upload bytes from a sample of items (items are cached, so
            # the probe work is reused by the full build). Rotation off
            # so the probe does not consume the dataset's host rng.
            n = len(loader.dataset)
            rot = bool(getattr(loader.dataset, 'rot', False))
            if rot:
                loader.dataset.rot = False
            try:
                probe = [loader.dataset[i]
                         for i in range(0, n, max(1, n // 32))[:32]]
            finally:
                if rot:
                    loader.dataset.rot = True
            per_item = (sum(s.node_feats.nbytes // 4 + s.coords.nbytes
                            + 7 * s.num_edges for s in probe)
                        / max(1, len(probe)))
            if per_item * n > budget and not demanded:
                LOG.info(f'Device-resident dataset disabled: estimated '
                         f'{per_item * n / 1e6:.0f} MB exceeds the '
                         f'{budget / 1e6:.0f} MB budget '
                         f'(POINTVS_DD_BUDGET_MB)')
                return
            # 'auto' preference threshold, separate from the hard budget:
            # measured at HEAD (BASELINE.md r4), the device store wins
            # where the set is HBM-hot and small (320 items / 15 MB:
            # 1,632 vs 1,087 g/s) but LOSES to the overlapped streaming
            # wire at 1 GB scale (990 vs 1,259 g/s — the on-device
            # collate pays real gather time over a large store every
            # step). --device_cache on still forces it.
            auto_mb = float(os.environ.get('POINTVS_DD_AUTO_MB', '512'))
            if per_item * n > auto_mb * 1e6 and not demanded:
                LOG.info(f'Device-resident dataset not auto-enabled: '
                         f'estimated {per_item * n / 1e6:.0f} MB > '
                         f'{auto_mb:.0f} MB (POINTVS_DD_AUTO_MB) — '
                         f'streaming measured faster at this scale; '
                         f'--device_cache on overrides')
                return
            host = build_host_store(loader.dataset)
            if host.nbytes > budget and not demanded:
                LOG.info(f'Device-resident dataset disabled: '
                         f'{host.nbytes / 1e6:.0f} MB exceeds the budget')
                return
            store = DeviceGraphStore(host, self.mesh)
            self._device_stores[id(loader.dataset)] = (loader.dataset,
                                                       store)
        loader.enable_device_dataset(store)

    # -- train_spec.yaml sidecar: pre-warm step executables ----------- #
    def _record_train_program(self, batch_dev, cap) -> None:
        """Remember the (template, symmetric, cap) of every packed
        train-step program this run uses; _write_train_spec persists
        them so the next run can compile them during featurisation."""
        if not (type(batch_dev) is tuple and batch_dev[0] == 'packed'):
            return
        template = batch_dev[2]
        sym = bool(batch_dev[3]) if len(batch_dev) > 3 else False
        key = (self.model_task, type(template).__name__, sym,
               tuple((tuple(a.shape), str(a.dtype)) for a in template))
        rec = self._train_spec_seen.get(key)
        if rec is None:
            self._train_spec_seen[key] = {
                'task': self.model_task,
                'template': type(template).__name__,
                'symmetric': sym,
                'arrays': [[list(a.shape), str(np.dtype(a.dtype))]
                           for a in template],
                'cap': cap}
        elif cap is not None:
            # Sticky caps only grow; keep the largest (= the program the
            # run converged to).
            rec['cap'] = max(rec['cap'] or 0, cap)

    def _write_train_spec(self) -> None:
        if not self._train_spec_seen or self.silent:
            return
        save_yaml({'num_devices': self.num_devices,
                   'programs': list(self._train_spec_seen.values())},
                  self.save_path / 'train_spec.yaml')

    def _prewarm_train_step(self, data_loader) -> None:
        """Cold-start cut for TRAINING (VERDICT r4 item #5, mirroring
        screen.py's screen_spec.yaml): a previous run recorded its
        packed train-step programs; this run re-compiles them in a
        background thread CONCURRENTLY with host featurisation (the
        remote service compiles server-side, so the thread mostly waits
        on work that would otherwise block the first batches), and
        seeds the loader's sticky scatter cap so later epochs never
        set a new capacity record mid-run. Harmless no-op when the
        spec changed — the real loop compiles its own programs."""
        import threading
        path = self.save_path / 'train_spec.yaml'
        if self.graph_shard > 1 or not path.exists():
            return
        if getattr(data_loader, 'device_store', None) is not None:
            return   # ids-path run: the packed programs are never used
        rec = load_yaml(path) or {}
        if rec.get('num_devices') != self.num_devices:
            return
        progs = [p for p in rec.get('programs', [])
                 if p.get('task') == self.model_task]
        if not progs:
            return
        caps = [p['cap'] for p in progs if p.get('cap')]
        if caps and hasattr(data_loader, 'seed_scatter_cap') \
                and getattr(data_loader, 'scatter_cap', None) is None:
            data_loader.seed_scatter_cap(max(caps))

        # Snapshot params/opt NOW, on the main thread: the real first
        # step donates self.params/opt_state buffers, so a copy taken
        # later from the background thread would read deleted arrays.
        # ONE jitted program for the whole (params, opt) tuple — per-leaf
        # eager jnp.copy would dispatch dozens of tiny remote programs
        # (the op-by-op pattern this backend punishes with minutes).
        tree_copy = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        params0, opt0 = tree_copy((self.params, self.opt_state))

        def work():
            try:
                from pointvs_tpu.data import wire as wire_mod
                from pointvs_tpu.parallel.mesh import shard_batch
                step_fn = self._train_step()
                for p in progs:
                    cls = getattr(wire_mod, p['template'])
                    fields = [jax.ShapeDtypeStruct(tuple(s), np.dtype(d))
                              for s, d in p['arrays']]
                    template = cls(*fields)
                    nbytes = sum(int(np.prod(f.shape)) * f.dtype.itemsize
                                 for f in fields)
                    buf = np.zeros((self.num_devices, nbytes), np.uint8)
                    # Fresh COPIES per program (each call donates its
                    # first two arguments); the snapshot itself is never
                    # donated, so later copies stay valid. Reuses the
                    # already-compiled single-program tree_copy.
                    params, opt = tree_copy((params0, opt0))
                    out = step_fn(
                        params, opt,
                        ('packed', shard_batch(buf, self.mesh), template,
                         bool(p['symmetric'])),
                        jnp.float32(0.0), jax.random.PRNGKey(0),
                        cap=p.get('cap'))
                    float(np.asarray(out[2]).ravel()[0])   # fence
                LOG.info(f'Pre-warmed {len(progs)} train-step '
                         f'executable(s) from train_spec.yaml')
            except Exception as exc:  # never fail training for a warm-up
                LOG.info(f'Train-step pre-warm skipped: {exc!r}')

        threading.Thread(target=work, daemon=True).start()

    def _to_device(self, batch):
        """Compress + pack the batch into one device buffer (one H2D
        transfer; see data/wire.py). Non-GraphBatch pytrees (SiamesePair,
        DenseBatch) ship as plain sharded arrays. Idempotent: batches the
        loader already transferred (via its producer-thread transfer_fn)
        pass through untouched."""
        if type(batch) is tuple and batch[0] == 'packed':
            return batch
        if type(batch) is tuple and batch[0] == 'ids':
            # Device-resident dataset: ship the ids, point the step at
            # the replicated store arrays (parallel/steps.py 'ids' path).
            # Idempotent: the second element is already a device array
            # when the loader's producer thread transferred the batch.
            _, ids, store, spec = batch
            if not isinstance(ids, np.ndarray):
                return batch
            return ('ids', shard_batch(ids, self.mesh),
                    getattr(store, 'arrays', store), spec)
        if self.graph_shard > 1:
            # [dp, gp, ...] pytree for the 2-D steps (no wire packing:
            # the graph-shard regime is device-memory-bound, not
            # H2D-bound, and the 2-D steps take raw GraphBatches).
            return shard_batch(batch, self.mesh, ('dp', 'gp'))
        if not isinstance(batch, GraphBatch):
            return shard_batch(batch, self.mesh)
        from pointvs_tpu.data.wire import (compress, pack_stacked,
                                           stacked_template)
        wire = compress(batch)
        # 4th element: the collator's verified-symmetric-edges fact
        # (GraphBatch.inv_recv_perm), a STATIC flag decompress uses to
        # rebuild inv_recv_perm on device (wire._maybe_inv).
        return ('packed', shard_batch(pack_stacked(wire), self.mesh),
                stacked_template(wire),
                getattr(batch, 'inv_recv_perm', None) is not None)

    # ------------------------------------------------------------------ #
    def training_setup(self, data_loader, epochs: int,
                       model_task: Optional[str] = None):
        if model_task is not None:
            self.set_task(model_task)
        self.scheduler = make_lr_schedule(
            self.lr, steps_per_epoch=len(data_loader), epochs=epochs,
            use_1cycle=self.use_1cycle, warm_restarts=self.warm_restarts)
        init_epoch = (self.a_epoch if 'regression' in self.model_task
                      else self.p_epoch)
        return init_epoch, time.time()

    def train_model(self, data_loader, epochs: int = 1,
                    epoch_end_validation_set=None, top1_on_end: bool = False):
        """Epoch/batch loop (ref train_model :136-205)."""
        init_epoch, start = self.training_setup(data_loader, epochs)
        step_fn = self._train_step()
        # Ship batches from the loader's producer thread so collation +
        # wire packing + the async H2D overlap device compute.
        if hasattr(data_loader, 'transfer_fn'):
            data_loader.transfer_fn = self._to_device
            self._maybe_enable_device_dataset(data_loader)
            self._prewarm_train_step(data_loader)
        steps_per_epoch = len(data_loader)
        total_steps = max(1, (epochs - init_epoch) * steps_per_epoch)
        done_steps = 0
        sched_step = init_epoch * steps_per_epoch

        progress = _progress_ctx()
        progress.__enter__()
        task_word = ('regression' if 'reg' in self.model_task
                     else 'classification')
        total_task = progress.add_task(
            f'[green]Epochs ({task_word})', total=total_steps)
        epoch_task = progress.add_task(
            f'[white]Batches ({task_word})', total=steps_per_epoch)

        pending_losses = []
        for epoch_idx in range(init_epoch, epochs):
            progress.reset(epoch_task)
            epoch_start = time.time()
            losses = []
            for batch_idx, (batch, meta) in enumerate(data_loader):
                # Profiling window: trace steps 3-8 of the first epoch
                # (past compiles) to <save_path>/profile for tensorboard/
                # xprof (SURVEY.md section 5.1 tracing subsystem).
                if self.profile and epoch_idx == init_epoch:
                    if batch_idx == 3 and not self._profiling:
                        jax.profiler.start_trace(
                            str(self.save_path / 'profile'))
                        self._profiling = True
                    elif batch_idx == 8 and self._profiling:
                        jax.profiler.stop_trace()
                        self._profiling = False
                lr_now = self.scheduler(sched_step)
                step_rng = jax.random.fold_in(self.rng, self.global_iter)
                batch_dev = self._to_device(batch)
                # Loader-measured per-batch scatter capacity (see
                # parallel/steps.py); absent on legacy/2-D paths.
                cap_kw = ({'cap': meta.cap}
                          if getattr(meta, 'cap', None) is not None
                          and self.graph_shard == 1 else {})
                self.params, self.opt_state, stats = step_fn(
                    self.params, self.opt_state, batch_dev,
                    jnp.float32(lr_now), step_rng, **cap_kw)
                self._record_train_program(batch_dev, cap_kw.get('cap'))
                sched_step += 1
                self.global_iter += 1
                done_steps += 1

                progress.update(epoch_task, advance=1.0)
                progress.update(total_task, advance=1.0)
                # Defer the D2H stats fetch to the log interval: a per-step
                # fetch serialises the pipeline (tens of ms on tunneled
                # backends). The NaN guard fires within log_interval steps.
                # stats = [loss, act_sum, act_cnt, dec_sum, dec_cnt].
                pending_losses.append((batch_idx, stats))
                if (not batch_idx % self.log_interval
                        or batch_idx == steps_per_epoch - 1):
                    for p_idx, p_stats in pending_losses:
                        vec = np.asarray(p_stats).reshape(-1)
                        loss_val = float(vec[0])
                        losses.append(loss_val)
                        if math.isnan(loss_val):
                            LOG.error('We have hit a NaN loss value.')
                            raise FloatingPointError(
                                f'NaN loss at epoch {epoch_idx} batch '
                                f'{p_idx}')
                        if len(vec) >= 5:
                            if vec[2] > 0:
                                self.active_mean_pred = float(
                                    vec[1] / vec[2])
                            if vec[4] > 0:
                                self.decoy_mean_pred = float(
                                    vec[3] / vec[4])
                    pending_losses.clear()

                if not batch_idx % self.log_interval:
                    loss_val = losses[-1] if losses else float('nan')
                    elapsed = time.time() - start
                    eta = elapsed / done_steps * (total_steps - done_steps)
                    if (self.model_task == 'classification'
                            and self.graph_shard == 1):
                        # Reference logs these every train batch
                        # (point_neural_network_base.py:459-463). The 2-D
                        # edge-sharded step is loss-only, so the means
                        # would be stale placeholders there.
                        self.logger.log({
                            'Mean active prediction (train)':
                                self.active_mean_pred,
                            'Mean inactive prediction (train)':
                                self.decoy_mean_pred})
                    self.logger.log({
                        f'Loss (train, {self.model_task_for_fnames})':
                            loss_val,
                        f'Learning rate (train, '
                        f'{self.model_task_for_fnames})': lr_now,
                        f'Batch (train, {self.model_task_for_fnames})':
                            epoch_idx * steps_per_epoch + batch_idx + 1,
                        f'Examples seen (train, '
                        f'{self.model_task_for_fnames})':
                            self.global_iter * data_loader.batch_size,
                        f'Time remaining (train, '
                        f'{self.model_task_for_fnames})': format_time(eta),
                    })
                    if not self.silent:
                        LOG.info(
                            f'Epoch {epoch_idx + 1}/{epochs} batch '
                            f'{batch_idx + 1}/{steps_per_epoch} loss '
                            f'{loss_val:.4f} lr {lr_now:.2e} eta '
                            f'{format_time(eta)}')

            if self._profiling:  # short epochs: close the trace window
                jax.profiler.stop_trace()
                self._profiling = False
            if not self.silent:
                LOG.info(
                    f'Epoch {epoch_idx + 1} done in '
                    f'{time.time() - epoch_start:.1f}s, mean loss '
                    f'{np.mean(losses):.4f}')
            rejects = int(getattr(data_loader.dataset, 'aug_rejects', 0))
            if rejects:
                # Observability for the retry-gated aug draws (both the
                # streaming loader and the hybrid store route through
                # dataset._aug_draw; rejected draws are re-keyed, never
                # stale).
                self.logger.log({
                    'Augmented rotation redraws (cumulative)': rejects,
                    'Augmented rotation fallbacks (cumulative)': int(
                        getattr(data_loader.dataset, 'aug_fallbacks', 0))})
            self._write_train_spec()
            self.on_epoch_end(epoch_end_validation_set, epochs, top1_on_end)
        progress.__exit__(None, None, None)

    def on_epoch_end(self, epoch_end_validation_set, epochs: int,
                     top1_on_end: bool):
        """Per-epoch checkpoint + optional validation (ref :470-490)."""
        if 'regression' in self.model_task:
            self.a_epoch += 1
            epoch = self.a_epoch
        else:
            self.p_epoch += 1
            epoch = self.p_epoch
        if not self.only_save_best_models:
            self.save()
        if epoch_end_validation_set is not None and epoch < epochs:
            fname = Path(self.predictions_file.parent,
                         f'predictions_epoch_{epoch}.txt')
            best = self.val(epoch_end_validation_set,
                            predictions_file=fname, top1_on_end=top1_on_end)
            if self.only_save_best_models and best:
                self.save()

    # ------------------------------------------------------------------ #
    def val(self, data_loader, predictions_file=None,
            top1_on_end: bool = False) -> bool:
        """Inference over a test loader; writes predictions artefact
        (ref val :208-360). Returns True unless this is a
        tracked-metric run that failed to improve."""
        if predictions_file is None:
            predictions_file = self.predictions_file
        predictions_file = Path(predictions_file)
        predictions_file = predictions_file.parent / (
            f'{self.model_task_for_fnames}_{predictions_file.name}')
        if jax.process_count() > 1:
            # Each process scores (and therefore writes) its own device
            # rows; suffixing keeps concurrent writers apart on shared
            # filesystems.
            predictions_file = predictions_file.with_name(
                f'{predictions_file.stem}_proc{jax.process_index()}'
                f'{predictions_file.suffix}')
        if predictions_file.is_file():
            predictions_file.unlink()
        mkdir(predictions_file.parent)

        eval_fn = self._eval_step()
        if hasattr(data_loader, 'transfer_fn'):
            data_loader.transfer_fn = self._to_device
            self._maybe_enable_device_dataset(data_loader)
        pending = ''
        in_flight = []  # [(device_logits, meta)] — fetch deferred so the
        #                 eval dispatches pipeline instead of fencing on
        #                 every batch's D2H logits read.

        def drain():
            nonlocal pending
            for dev_logits, m in in_flight:
                if getattr(dev_logits, 'is_fully_addressable', True):
                    logits = np.asarray(dev_logits)
                else:
                    # Multi-process: only this process's device rows are
                    # addressable — and the loader collated exactly those
                    # rows, so meta lines up with the local shards (each
                    # process writes ITS slice of the predictions).
                    shards = sorted(
                        dev_logits.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
                    logits = np.concatenate(
                        [np.asarray(s.data) for s in shards])
                logits = logits.reshape(-1, logits.shape[-1])
                graph_mask = m.graph_mask.reshape(-1)
                y_true = m.y.reshape(graph_mask.shape[0], -1)
                real = graph_mask > 0
                pending += self._format_predictions(
                    logits[real], y_true[real], m)
                self._update_mean_preds(logits[real], y_true[real])
            in_flight.clear()

        for batch_idx, (batch, meta) in enumerate(data_loader):
            batch_dev = self._to_device(batch)
            # Per-batch scatter capacity (loader-measured) — None for
            # legacy loaders / non-graph layouts / 2-D sharded steps.
            cap_kw = ({'cap': meta.cap}
                      if getattr(meta, 'cap', None) is not None
                      and self.graph_shard == 1 else {})
            in_flight.append((eval_fn(self.params, batch_dev, **cap_kw),
                              meta))
            if not (batch_idx + 1) % self.log_interval:
                drain()
                with open(predictions_file, 'a', encoding='utf-8') as f:
                    f.write(pending)
                pending = ''
        drain()
        if pending:
            with open(predictions_file, 'a', encoding='utf-8') as f:
                f.write(pending)

        if top1_on_end:
            return self._score_and_track(predictions_file)
        return True

    def _format_predictions(self, logits: np.ndarray, y_true: np.ndarray,
                            meta) -> str:
        """Prediction-file rows, format-compatible with the reference
        (ref val :287-319)."""
        recs, ligs = meta.rec_fnames, meta.lig_fnames
        lines = []
        if self.model_task == 'classification':
            preds = 1 / (1 + np.exp(-logits[:, 0]))
            for i in range(len(preds)):
                truth = y_true[i, 0]
                if truth >= 0:
                    lines.append(f'{int(truth):.3f} | {preds[i]:.3f} '
                                 f'{recs[i]} {ligs[i]}')
                else:
                    lines.append(f'{preds[i]:.3f} | {recs[i]} {ligs[i]}')
        elif self.model_task == 'multi_regression':
            metric_names = np.array(['pki', 'pkd', 'ic50'])
            for i in range(logits.shape[0]):
                labelled = y_true[i] > -0.5
                if labelled.any():
                    for j in np.where(labelled)[0]:
                        lines.append(
                            f'{y_true[i, j]:.3f} | {logits[i, j]:.3f} '
                            f'{recs[i]} {ligs[i]} | {metric_names[j]}')
                else:
                    lines.append(
                        f'{logits[i, 0]:.3f} {logits[i, 1]:.3f} '
                        f'{logits[i, 2]:.3f} | {recs[i]} {ligs[i]}')
        else:
            for i in range(logits.shape[0]):
                truth = y_true[i, 0]
                lines.append(f'{truth:.3f} | {logits[i, 0]:.3f} '
                             f'{recs[i]} {ligs[i]}')
        return '\n'.join(lines) + ('\n' if lines else '')

    def _update_mean_preds(self, logits: np.ndarray, y_true: np.ndarray):
        """Mean active/decoy predictions for observability (ref :387-415)."""
        if self.model_task == 'classification':
            preds = 1 / (1 + np.exp(-logits[:, 0]))
            labels = y_true[:, 0]
            actives, decoys = preds[labels > 0.5], preds[labels < 0.5]
            if len(actives):
                self.active_mean_pred = float(np.mean(actives))
            if len(decoys):
                self.decoy_mean_pred = float(np.mean(decoys))
            self.logger.log({
                'Mean active prediction (val)': self.active_mean_pred,
                'Mean inactive prediction (val)': self.decoy_mean_pred})

    def _score_and_track(self, predictions_file) -> bool:
        """top1 / Pearson tracking for --only_save_best_models
        (ref :330-359)."""
        if self.model_task == 'classification':
            metric = top_n(predictions_file)
            best = metric > self.test_metric
            if best:
                self.test_metric = metric
            self.logger.log({'Validation Top1': metric,
                             'Best validation Top1': self.test_metric,
                             'Epoch (pose)': self.p_epoch})
        else:
            r, p = get_regression_pearson(predictions_file)
            best = p < 0.05 and r > self.test_metric
            if best:
                self.test_metric = r
            self.logger.log({"Pearson's correlation coefficient": r,
                             'Best PCC': self.test_metric,
                             'Epoch (affinity)': self.a_epoch})
        if self.only_save_best_models and not best:
            return False
        return True

    # ------------------------------------------------------------------ #
    def save(self, save_path=None) -> Path:
        epoch = (self.a_epoch if 'regression' in self.model_task
                 else self.p_epoch)
        if save_path is None:
            fname = f'{self.model_task_for_fnames}_ckpt_epoch_{epoch}'
            save_path = self.save_path / 'checkpoints' / fname
        path = save_checkpoint(
            save_path, self.params, self.opt_state, self.p_epoch,
            self.a_epoch, self.lr, self.weight_decay)
        if not self.silent:
            LOG.info(f'Saved checkpoint to {path}')
        return path

    def load_weights(self, checkpoint_file, silent: bool = False):
        checkpoint_file = expand_path(checkpoint_file)
        if checkpoint_file.suffix in ('.pt', '.pth'):
            # Reference-trained torch checkpoint (ref
            # point_neural_network_base.py:519-565 load_weights).
            return self.import_torch_weights(checkpoint_file,
                                             silent=silent)
        restored = restore_checkpoint(
            checkpoint_file, self.params, self.opt_state)
        self.params = replicate(restored['params'], self.mesh)
        self.opt_state = replicate(restored['opt_state'], self.mesh)
        meta = restored['meta']
        self.p_epoch = int(meta['p_epoch'])
        self.a_epoch = int(meta['a_epoch'])
        if not silent:
            LOG.info(f'Successfully loaded weights from {checkpoint_file}')

    def import_torch_weights(self, checkpoint_file, silent: bool = False):
        """Import a reference-trained PointVS ``.pt`` checkpoint.

        The torch state_dict (current or legacy key schemas, ref
        point_neural_network_base.py:519-565) is mapped onto this model's
        flax tree; the optimiser state restarts fresh (torch Adam moments
        don't transfer across frameworks), epoch counters carry over so
        resumed runs number checkpoints the same way the reference would.
        """
        from pointvs_tpu.models.torch_import import (
            load_torch_checkpoint, torch_to_flax_params)
        state_dict, meta = load_torch_checkpoint(checkpoint_file)
        template = jax.tree.map(np.asarray, self.params)
        new_params = torch_to_flax_params(state_dict, template,
                                          self.model_name)
        self.params = replicate(new_params, self.mesh)
        self.opt_state = replicate(self.tx.init(new_params), self.mesh)
        self.p_epoch = int(meta.get('p_epoch', 0))
        self.a_epoch = int(meta.get('a_epoch', 0))
        if not silent:
            LOG.info(
                f'Imported reference torch weights from {checkpoint_file}')
