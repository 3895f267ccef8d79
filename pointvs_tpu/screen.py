"""Library-scale virtual screening: stream a ligand library against one
receptor at maximum device throughput.

The serving counterpart of training (BASELINE.json stretch config:
"batched inference + attention attribution over ~1M poses"): big static
batches through the fused inference engine, the receptor's pocket graph
work shared via the in-memory structure cache, ranked CSV output, and
optional attribution of the top hits.

Usage:
    python -m pointvs_tpu.screen <model_run_dir> <receptor.parquet> \
        <ligand_glob_or_dir> --output hits.csv --batch_size 256 \
        [--attribute_top 10 --attribution atom_masking]
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import pandas as pd

from pointvs_tpu.data.loader import get_data_loader
from pointvs_tpu.logging import get_logger
from pointvs_tpu.models.load_model import load_model
from pointvs_tpu.utils import expand_path, load_yaml, mkdir, save_yaml

LOG = get_logger('PointVS-TPU')


def _prewarm_from_sidecar(trainer, batch_size: int):
    """Cold-start cut (VERDICT r4 item #7): a previous screen run
    records its compiled-program spec in <run_dir>/screen_spec.yaml;
    re-screens compile + load the eval executable in a background
    thread CONCURRENTLY with host featurisation, so the one-time
    per-process trace + remote executable load (~3-13 s) overlaps work
    that had to happen anyway. Harmless no-op when the spec changed:
    the real pass just compiles its own program as before."""
    import threading

    path = expand_path(trainer.save_path) / 'screen_spec.yaml'
    if not path.exists():
        return None
    rec = load_yaml(path) or {}
    if (rec.get('kind') != 'resident'
            or rec.get('batch_size') != batch_size
            or rec.get('num_devices') != trainer.num_devices):
        return None

    def work():
        try:
            from pointvs_tpu.data.device_dataset import (
                DeviceCollateSpec, DeviceStoreArrays)
            from pointvs_tpu.parallel.mesh import replicate, shard_batch
            i_b = int(rec['i_b'])
            y_shape = (i_b, 3) if rec.get('y3') else (i_b,)
            arrays = DeviceStoreArrays(
                feats=np.zeros((rec['n_b'], rec['feat_dim']),
                               np.dtype(rec['feats_dtype'])),
                coords=np.zeros((rec['n_b'], 3), np.float32),
                senders=np.zeros(rec['e_b'], np.dtype(rec['idx_dtype'])),
                receivers=np.zeros(rec['e_b'],
                                   np.dtype(rec['idx_dtype'])),
                rperm=np.zeros(rec['e_b'], np.dtype(rec['rperm_dtype'])),
                eclass=np.full(rec['e_b'], 3, np.uint8),
                node_start=np.zeros(i_b + 1, np.int32),
                edge_start=np.zeros(i_b + 1, np.int32),
                node_len=np.zeros(i_b, np.int32),
                edge_len=np.zeros(i_b, np.int32),
                y=np.zeros(y_shape, np.float32),
                strain=np.zeros((i_b, 2), np.float32))
            arrays = replicate(arrays, trainer.mesh)
            ids = np.full((trainer.num_devices, rec['per_dev']), -1,
                          np.int32)
            spec = DeviceCollateSpec(
                n_pad=rec['n_pad'], e_pad=rec['e_pad'],
                num_graphs=rec['per_dev'],
                symmetric=bool(rec['symmetric']), rotate=False)
            ev = trainer._eval_step()
            out = ev(trainer.params,
                     ('ids', shard_batch(ids, trainer.mesh), arrays,
                      spec), cap=rec.get('cap'))
            float(np.asarray(out).ravel()[0])   # fence: exec loaded
            LOG.info('Pre-warmed screening executable from '
                     'screen_spec.yaml')
        except Exception as exc:   # never fail the screen for a warm-up
            LOG.info(f'Screen pre-warm skipped: {exc!r}')

    t = threading.Thread(target=work, daemon=True)
    t.start()
    return rec


def _collect_ligands(ligands) -> list:
    path = Path(ligands)
    if path.is_dir():
        found = sorted(str(p) for p in path.glob('**/*.parquet'))
    elif any(ch in str(ligands) for ch in '*?['):
        import glob
        found = sorted(glob.glob(str(ligands), recursive=True))
    else:
        found = [str(path)]
    # Manifest paths resolve against '/', so they must be absolute.
    return [str(expand_path(p)) for p in found]


def screen(model_path, receptor, ligands, output='screen_results.csv',
           batch_size: int = 256, radius: float = 10,
           edge_radius: float = 4, estimate_bonds: bool = False,
           attribute_top: int = 0, attribution: str = 'atom_masking',
           num_devices=None, cache_dir=None) -> pd.DataFrame:
    """Score every ligand against the receptor; returns the ranked frame."""
    receptor = expand_path(receptor)
    lig_files = _collect_ligands(ligands)
    if not lig_files:
        raise SystemExit(f'No ligand files found under {ligands}')
    LOG.info(f'Screening {len(lig_files)} ligands against {receptor.name}')

    # Order the library by ligand size: homogeneous batches hit far
    # fewer padding buckets, so the whole screen compiles a handful of
    # shapes instead of one per batch. File size is the sort key — with
    # one schema it orders like atom count, and a stat costs ~2 us vs
    # ~2-5 ms for a parquet metadata read (minutes at 100k+ poses).
    import os as _os

    def _atoms(path):
        try:
            return _os.path.getsize(path)
        except OSError:
            return 0

    lig_files = sorted(lig_files, key=_atoms)

    # Manifest: unlabelled `<rec> <lig>` rows relative to the filesystem
    # root so the standard dataset machinery applies unchanged.
    manifest = Path(output).with_suffix('.types')
    mkdir(Path(output).parent if Path(output).parent != Path('') else '.')
    manifest.write_text('\n'.join(
        f'{receptor} {lig}' for lig in lig_files) + '\n')

    from pointvs_tpu.inference import _auto_num_devices
    trainer, model_kwargs, cmd_args = load_model(
        model_path, num_devices=_auto_num_devices(batch_size, num_devices))
    trainer.set_task(model_kwargs.get('model_task', 'classification')
                     if model_kwargs.get('model_task') != 'both'
                     else 'classification')
    # Kick off executable pre-warm from the previous run's spec sidecar
    # (overlaps the featurisation/sizing passes below).
    prewarm_rec = _prewarm_from_sidecar(trainer, batch_size)

    from pointvs_tpu.data.shared_receptor import SharedReceptorDataset
    dl = get_data_loader(
        '/', batch_size=batch_size,
        dataset_class=SharedReceptorDataset,
        compact=cmd_args.get('compact', True),
        radius=cmd_args.get('radius', radius),
        use_atomic_numbers=cmd_args.get('use_atomic_numbers', False),
        rot=False, polar_hydrogens=cmd_args.get('hydrogens', False),
        types_fname=manifest, mode='val',
        model_task=trainer.model_task,
        edge_radius=cmd_args.get('edge_radius', edge_radius),
        estimate_bonds=cmd_args.get('estimate_bonds', estimate_bonds),
        prune=cmd_args.get('prune', False),
        cache_dir=cache_dir,
        num_devices=trainer.num_devices)

    # Device-store decision FIRST: the built store (possibly loaded from
    # the store-level disk cache — production libraries re-screen, and
    # even a fully memory-cached per-item pass costs ~1 ms/item in
    # object construction, a 1,000 poses/s host ceiling at 100k poses)
    # carries the per-item sizes, so batch sizing needs no item pass.
    import hashlib
    import os
    from pointvs_tpu.data.buckets import pick_bucket
    per_dev = batch_size // max(1, trainer.num_devices)
    dd_store = None
    dd_chunk = None   # (host_store, chunk_budget_bytes): chunked path
    host = None
    if (os.environ.get('POINTVS_SCREEN_DEVICE', '1') == '1'
            and os.environ.get('POINTVS_SCREEN_SCAN', '0') != '1'
            and getattr(trainer, 'graph_shard', 1) <= 1):
        from pointvs_tpu.data.device_dataset import (
            DeviceGraphStore, build_host_store, load_host_store,
            save_host_store, store_eligibility)
        budget = float(os.environ.get('POINTVS_DD_BUDGET_MB',
                                      '2048')) * 1e6
        chunk_mb = float(os.environ.get('POINTVS_SCREEN_CHUNK_MB', '0'))
        if store_eligibility(dl.dataset) is None:
            store_path = None
            if cache_dir is not None:
                # Content fingerprint: (size, mtime_ns) per input file,
                # not just the manifest paths — re-docked/overwritten
                # parquets at the same paths must invalidate the cached
                # featurised store (ADVICE r4). ~2 us/stat: negligible
                # even at 100k+ poses.
                def _fp(path):
                    try:
                        st = _os.stat(path)
                        return st.st_size, st.st_mtime_ns
                    except OSError:
                        return (0, 0)

                fps = [_fp(receptor)] + [_fp(p) for p in lig_files]
                params = (manifest.read_text(), fps,
                          cmd_args.get('compact', True),
                          cmd_args.get('radius', radius),
                          cmd_args.get('edge_radius', edge_radius),
                          cmd_args.get('estimate_bonds', estimate_bonds),
                          cmd_args.get('prune', False),
                          cmd_args.get('use_atomic_numbers', False),
                          cmd_args.get('hydrogens', False), 'store2')
                digest = hashlib.sha1(
                    repr(params).encode()).hexdigest()[:24]
                store_path = Path(cache_dir) / f'store_{digest}.bin'
                t0 = time.perf_counter()
                host = load_host_store(store_path)
                if host is not None:
                    LOG.info(f'Host store loaded from cache in '
                             f'{time.perf_counter() - t0:.1f}s '
                             f'({host.nbytes / 1e6:.0f} MB)')
            if host is None:
                host = build_host_store(dl.dataset)
                if store_path is not None:
                    save_host_store(host, store_path)
                    LOG.info(f'Host store cached to {store_path}')

    if host is not None:
        # Vectorised batch sizing from the store's size arrays.
        nn = np.concatenate([[0], np.cumsum(host.num_nodes)])
        ne = np.concatenate([[0], np.cumsum(host.num_edges)])
        bounds = np.arange(0, len(host.num_nodes) + per_dev - 1, per_dev)
        bounds = np.clip(bounds, 0, len(host.num_nodes))
        max_n = int(np.max(np.diff(nn[bounds]), initial=1))
        max_e = int(np.max(np.diff(ne[bounds]), initial=1))
    else:
        # One per-item pass: pin ONE bucket for the whole screen (shape
        # count, not compile count, is the wall-clock lever on remote-
        # compile backends). The pass memory-caches every item for the
        # scoring loop.
        sizes = [(dl.dataset[i].num_nodes, dl.dataset[i].num_edges)
                 for i in range(len(dl.dataset))]
        max_n = max_e = 1
        for lo in range(0, len(sizes), per_dev):
            chunk = sizes[lo:lo + per_dev]
            max_n = max(max_n, sum(s[0] for s in chunk))
            max_e = max(max_e, sum(s[1] for s in chunk))
    n_fix = pick_bucket(max_n, dl.node_buckets)
    e_fix = pick_bucket(max_e, dl.edge_buckets)
    dl.node_buckets = [n_fix]
    dl.edge_buckets = [e_fix]
    LOG.info(f'Screen bucket: {n_fix} nodes x {e_fix} edges '
             f'(max batch {max_n}/{max_e})')

    if host is not None:
        if host.nbytes <= budget and not chunk_mb:
            # pad_shapes: bucket the uploaded extents so similar-size
            # libraries reuse one compiled program and the pre-warm
            # sidecar can predict the shapes cold.
            dd_store = DeviceGraphStore(host, trainer.mesh,
                                        pad_shapes=True)
            dl.enable_device_dataset(dd_store)
        elif trainer.num_devices == 1:
            dd_chunk = (host, (chunk_mb * 1e6) or budget)
        else:
            LOG.info('library exceeds the HBM budget and chunked '
                     'scoring is single-device; falling back to the '
                     'streaming wire path')

    if prewarm_rec and prewarm_rec.get('cap') and dl.scatter_cap is None:
        # Seed the loader's sticky scatter cap with the recorded value so
        # the first batches reuse the pre-warmed max-cap program instead
        # of compiling lower-cap variants first.
        dl._cap_high = max(dl._cap_high, int(prewarm_rec['cap']))

    eval_fn = trainer._eval_step()
    # Pipeline: collation + wire packing run in the loader's producer
    # thread; packed batches are shipped in GROUPS of TRANSFER_GROUP via
    # ONE device_put each (one [G, D, nbytes] mega-buffer) and scored by
    # ONE lax.scan program per group (steps.make_scan_eval_step), because
    # on tunneled backends the per-transfer and per-EXECUTION round trips
    # (~50 ms-1 s each), not bytes or host compute (~0.1 s for the whole
    # library) or device eval (~30 ms/batch), dominate the scoring loop.
    # Logits drain AFTER all dispatches so work overlaps.
    from pointvs_tpu.data.wire import (compress, pack_stacked,
                                       stacked_template)

    def pack_host(batch):
        wire = compress(batch)
        return ('host_packed', pack_stacked(wire), stacked_template(wire),
                getattr(batch, 'inv_recv_perm', None) is not None)

    if dd_store is not None and trainer.num_devices == 1 and \
            os.environ.get('POINTVS_SCREEN_ONESHOT', '0') == '1':
        # One-shot mega-batches: re-batch the library into the fewest
        # executions whose padded edge count fits the budget (the
        # 1,160-pose BASELINE library becomes ONE execution). Measured
        # 2026-08-18: once programs are warm, per-execution overhead on
        # the device store is negligible (bs-256's 5 executions and the
        # mega batch both score the library in ~0.45 s), so this is OFF
        # by default — it costs one extra compile shape and a slower
        # per-process executable load, and only pays off when the
        # remote service degrades (multi-second per-execution rounds).
        budget_e = float(os.environ.get('POINTVS_SCREEN_ONESHOT_EDGES',
                                        '1.5e6'))
        tot_e = int(dd_store.host.num_edges.sum())
        n_items = len(dl.dataset)
        n_chunks = max(1, -(-tot_e // int(budget_e)))
        mega_bs = -(-n_items // n_chunks)
        if mega_bs > batch_size:
            nn, ne = dd_store.host.num_nodes, dd_store.host.num_edges
            max_n = max(int(nn[lo:lo + mega_bs].sum())
                        for lo in range(0, n_items, mega_bs))
            max_e = max(int(ne[lo:lo + mega_bs].sum())
                        for lo in range(0, n_items, mega_bs))
            dl.batch_size = mega_bs
            # Exact pinned shapes (multiple-of-256 headroom) — the
            # grid-extension path would round 88k nodes up to 112k.
            dl.node_buckets = [int(np.ceil(max_n * 1.02 / 256) * 256)]
            dl.edge_buckets = [int(np.ceil(max_e * 1.02 / 256) * 256)]
            LOG.info(f'One-shot screen: {n_chunks} execution(s) of '
                     f'{mega_bs} poses ({dl.node_buckets[0]} nodes x '
                     f'{dl.edge_buckets[0]} edges)')
    dl.transfer_fn = (trainer._to_device if dd_store is not None
                      else pack_host)
    dl.prefetch = max(dl.prefetch, 3)
    TRANSFER_GROUP = int(os.environ.get('POINTVS_SCREEN_GROUP', '8'))
    # Healthy-window A/B (2026-08-17, 1,160 poses, bs 256, hot): per-batch
    # dispatch 4.9 s (236 poses/s) vs one-program scan 13.8 s — the scan
    # mega-program pays a multi-second executable load per process plus a
    # slower execution, and per-execution overhead is only ~0.5 s when the
    # service is healthy. Scan remains the right call when the service
    # degrades (~7.7 s per execution measured; 2.75x win at bs 64) —
    # opt in with POINTVS_SCREEN_SCAN=1.
    scan_eval = None
    if (os.environ.get('POINTVS_SCREEN_SCAN', '0') == '1'
            and getattr(trainer, 'graph_shard', 1) <= 1):
        from pointvs_tpu.parallel.steps import make_scan_eval_step
        # unroll 0 = full: a ROLLED scan body costs ~18 s/execution on
        # the tunneled backend (vs ~2.6 s fully unrolled, same group).
        scan_eval = make_scan_eval_step(
            trainer.model, trainer.model_task, trainer.mesh,
            multitask=trainer.multitask,
            unroll=int(os.environ.get('POINTVS_SCREEN_UNROLL', '0')))
    rows = []
    start = time.perf_counter()
    ids_batches = []     # device-resident (batch, cap_kw) for repeat passes
    in_flight = []       # ('batch', dev_logits, meta) | ('scan', outs, n, metas)
    group, group_meta = [], []
    scan_g = None        # fixed group length => ONE compiled scan program

    _dbg = os.environ.get('POINTVS_SCREEN_DEBUG') == '1'

    def flush_group(final=False):
        nonlocal scan_g
        if not group:
            return
        import jax
        t0 = time.perf_counter()
        template = group[0][2]
        symmetric = group[0][3]
        bufs = [g[1] for g in group]
        n_real = len(bufs)
        # One scatter capacity per group (the max of its members') so the
        # group shares a compiled program; the size-sorted library plus
        # the coarse capacity grid keep distinct values to ~1-2.
        caps = [m.cap for m in group_meta if getattr(m, 'cap', None)]
        cap = max(caps) if caps else None
        if scan_eval is not None:
            # Pad short (final) groups by repeating the last buffer so a
            # library of any size compiles at most one scan program; a
            # library that fits in a single short group gets an
            # exact-size program instead of paying the padded compute.
            if scan_g is None:
                scan_g = n_real if (final and n_real < TRANSFER_GROUP) \
                    else TRANSFER_GROUP
            bufs = bufs + [bufs[-1]] * (scan_g - n_real)
            mega_dev = jax.device_put(np.stack(bufs))  # [G, D, nbytes]
            t1 = time.perf_counter()
            in_flight.append(('scan',
                              scan_eval(trainer.params, mega_dev,
                                        template, symmetric, cap=cap),
                              n_real, list(group_meta)))
        else:
            mega_dev = jax.device_put(np.stack(bufs))  # [G, D, nbytes]
            t1 = time.perf_counter()
            for i in range(n_real):
                dev = ('packed', mega_dev[i], template, symmetric)
                in_flight.append(('batch',
                                  eval_fn(trainer.params, dev, cap=cap),
                                  group_meta[i]))
        if _dbg:
            LOG.info(f'flush: put {t1-t0:.2f}s dispatch '
                     f'{time.perf_counter()-t1:.2f}s x{n_real}')
        group.clear()
        group_meta.clear()

    def run_chunked(host, chunk_budget):
        """Score the library through HBM-resident chunks: pack -> upload
        -> expand -> dispatch every batch of the chunk. Uploads/expands
        queue on the device timeline between execs; the host packs the
        next chunk while the device scores the current one."""
        import jax
        from pointvs_tpu.data.loader import BatchMeta
        from pointvs_tpu.data.device_dataset import (
            DeviceCollateSpec, batch_row_cap, expand_chunk, pack_chunk,
            plan_chunks)
        from pointvs_tpu.parallel.mesh import shard_batch
        ranges, cspec = plan_chunks(
            host, chunk_budget,
            raw=os.environ.get('POINTVS_SCREEN_CHUNK_RAW', '1') == '1')
        LOG.info(f'Chunked screen: {len(ranges)} chunks of <= '
                 f'{cspec.items} poses ({cspec.n_fix} nodes x '
                 f'{cspec.eh_fix} {"half-" if cspec.half else ""}edge '
                 f'slots each)')
        expand = jax.jit(lambda p: expand_chunk(p, cspec))
        n_items = len(host.num_nodes)
        # BUDGET batching: fill each batch with contiguous poses until
        # the (n_fix, e_fix) bucket is full, instead of a fixed pose
        # count. With one pinned bucket over a size-sorted library,
        # fixed-count batches at the small-pose end pay the largest
        # batch's padding (measured 1.85x padded edge work at a 100k
        # library with 3x pose-size spread); budget batches keep every
        # execution ~full. num_graphs caps at POINTVS_SCREEN_MAX_BS so
        # graph-level one-hot work (pool/graphnorm) stays bounded.
        nn_, ne_ = host.num_nodes, host.num_edges
        max_bs = int(os.environ.get('POINTVS_SCREEN_MAX_BS',
                                    str(per_dev * 4)))
        # Per-execution bucket: measured per-EDGE eval cost grows with
        # bucket size (3.81 M edges/s at 150k-edge buckets vs 1.81 at
        # 600k — graph-level one-hot work scales with batch size and
        # edge intermediates fall out of fast memory), so executions use
        # a mid-size bucket independent of the library batch_size.
        # Clamped up to cover the largest single pose.
        e_bud = int(os.environ.get('POINTVS_SCREEN_EDGE_BUDGET',
                                   '131072'))
        e_bud = max(e_bud, int(ne_.max(initial=1)))
        n_bud = max(int(e_bud * (nn_.sum() / max(ne_.sum(), 1)) * 1.4),
                    int(nn_.max(initial=1)))
        n_bud = -(-n_bud // 256) * 256
        e_bud = -(-e_bud // 256) * 256

        def plan_batches(lo, hi):
            spans = []
            i = lo
            while i < hi:
                n = e = 0
                j = i
                while (j < hi and j - i < max_bs
                       and n + nn_[j] <= n_bud and e + ne_[j] <= e_bud):
                    n += int(nn_[j])
                    e += int(ne_[j])
                    j += 1
                if j == i:
                    j = i + 1   # single oversize item (n_bud/e_bud are
                    #             clamped to cover every pose)
                spans.append((i, j))
                i = j
            return spans

        chunk_spans = {r: plan_batches(*r) for r in ranges}
        num_graphs = max(j - i for spans in chunk_spans.values()
                         for i, j in spans)
        # One sticky scatter cap for the whole screen (one program).
        cap = max(batch_row_cap(host, np.arange(i, j), n_bud)
                  for spans in chunk_spans.values() for i, j in spans)
        n_batches = sum(len(v) for v in chunk_spans.values())
        LOG.info(f'Chunked screen: {n_batches} budget batches '
                 f'(<= {num_graphs} poses each), scatter cap {cap}')
        stack_cache = {}
        STACK_G = 32   # fixed stack arity: ONE compiled concat program
        #                (variable-arity stacks compiled one program per
        #                distinct batch count — minutes each remotely)

        def stacked(outs):
            # Group D2H buffers: individual logit fetches cost a tunnel
            # round trip each (~0.1-0.5 s), which would dominate the
            # drain at library scale (hundreds of batches). Short
            # groups pad by repeating the last buffer.
            n = len(outs)
            outs = outs + [outs[-1]] * (STACK_G - n)
            if STACK_G not in stack_cache:
                stack_cache[STACK_G] = jax.jit(
                    lambda *xs: jax.numpy.stack(xs))
            return stack_cache[STACK_G](*outs)

        spec = DeviceCollateSpec(
            n_pad=n_bud, e_pad=e_bud, num_graphs=num_graphs,
            symmetric=host.symmetric, rotate=False)
        for lo, hi in ranges:
            t0 = time.perf_counter()
            packed = pack_chunk(host, lo, hi, cspec)
            t1 = time.perf_counter()
            # No host-side reference is kept past this iteration: each
            # queued execution holds the chunk's buffers alive in the
            # runtime until it runs, so dropping ``arrays`` lets HBM
            # free chunk-by-chunk as the device timeline advances —
            # peak HBM is ~2 chunks (executing + next upload), not the
            # whole expanded library (ADVICE r4).
            arrays = expand(jax.device_put(packed))
            t2 = time.perf_counter()
            outs, metas = [], []
            n_disp = 0
            for b_lo, b_hi in chunk_spans[(lo, hi)]:
                ids = np.full((1, num_graphs), -1, np.int32)
                ids[0, :b_hi - b_lo] = np.arange(b_lo - lo, b_hi - lo)
                meta = BatchMeta(host.lig_fnames[b_lo:b_hi],
                                 host.rec_fnames[b_lo:b_hi])
                gm = np.zeros((1, num_graphs), np.float32)
                gm[0, :b_hi - b_lo] = 1.0
                meta.graph_mask = gm
                batch_dev = ('ids', shard_batch(ids, trainer.mesh),
                             arrays, spec)
                outs.append(eval_fn(trainer.params, batch_dev, cap=cap))
                metas.append(meta)
                n_disp += 1
                if len(outs) == STACK_G:
                    in_flight.append(('scan', stacked(outs), len(outs),
                                      metas))
                    outs, metas = [], []
            if outs:
                in_flight.append(('scan', stacked(outs), len(outs),
                                  metas))
            if _dbg:
                LOG.info(f'chunk [{lo},{hi}): pack {t1-t0:.2f}s '
                         f'put+expand {t2-t1:.2f}s dispatch '
                         f'{time.perf_counter()-t2:.2f}s '
                         f'x{n_disp} batches')

    if dd_chunk is not None:
        run_chunked(*dd_chunk)

    for batch, meta in (() if dd_chunk is not None else dl):
        if isinstance(batch, tuple) and batch[0] == 'host_packed':
            group.append(batch)
            group_meta.append(meta)
            if len(group) >= TRANSFER_GROUP:
                flush_group()
        else:   # ids-mode / non-graph layouts: per-batch dispatch
            cap_kw = ({'cap': meta.cap}
                      if getattr(meta, 'cap', None) is not None else {})
            dev = trainer._to_device(batch)
            ids_batches.append((dev, cap_kw))
            in_flight.append(('batch',
                              eval_fn(trainer.params, dev, **cap_kw),
                              meta))
    flush_group(final=True)
    if _dbg:
        LOG.info(f'all dispatched at {time.perf_counter()-start:.2f}s')
    _t_drain = time.perf_counter()

    def score_one(logits, meta):
        logits = logits.reshape(-1, logits.shape[-1])
        mask = meta.graph_mask.reshape(-1) > 0
        scores = logits[mask]
        if trainer.model_task == 'classification':
            scores = 1 / (1 + np.exp(-scores[:, 0]))
        else:
            scores = scores.mean(axis=1)
        for lig, score in zip(meta.lig_fnames, scores):
            rows.append({'ligand': lig, 'score': float(score)})

    # Fetch all logit buffers CONCURRENTLY: each D2H materialisation is a
    # ~0.5 s tunnel round trip (healthy) that would otherwise serialise;
    # the buffers are tiny ([G?, D, B, out] floats) so latency, not
    # bandwidth, is the cost. Threads overlap the round trips.
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(in_flight)))) as ex:
        fetched = list(ex.map(lambda it: np.asarray(it[1]), in_flight))
    for item, arr in zip(in_flight, fetched):
        if item[0] == 'scan':
            _, _, n_real, metas = item           # arr [G, D, B, out]
            for i in range(n_real):
                score_one(arr[i], metas[i])
        else:
            score_one(arr, item[2])
    if _dbg:
        LOG.info(f'drain took {time.perf_counter()-_t_drain:.2f}s')
    elapsed = time.perf_counter() - start
    LOG.info(f'Scored {len(rows)} poses in {elapsed:.1f}s '
             f'({len(rows) / max(elapsed, 1e-9):.0f} poses/s end-to-end)')

    if dd_store is not None:
        # Record this run's compiled-program spec so the NEXT cold
        # process pre-warms the executable during featurisation.
        arr = dd_store.arrays
        save_yaml({
            'kind': 'resident', 'batch_size': batch_size,
            'num_devices': trainer.num_devices, 'per_dev': per_dev,
            'n_pad': int(n_fix), 'e_pad': int(e_fix),
            'symmetric': bool(dd_store.host.symmetric),
            'cap': (int(dl._cap_high) if dl._cap_high else None),
            'n_b': int(arr.feats.shape[0]),
            'e_b': int(arr.senders.shape[0]),
            'i_b': int(arr.node_len.shape[0]),
            'feat_dim': int(arr.feats.shape[1]),
            'feats_dtype': str(np.dtype(arr.feats.dtype)),
            'idx_dtype': str(np.dtype(arr.senders.dtype)),
            'rperm_dtype': str(np.dtype(arr.rperm.dtype)),
            'y3': bool(np.ndim(arr.y) > 1),
        }, expand_path(trainer.save_path) / 'screen_spec.yaml')

    repeat = int(os.environ.get('POINTVS_SCREEN_REPEAT', '1'))
    if repeat > 1 and ids_batches:
        # Sustained-throughput measurement: the first pass pays the
        # one-time per-process costs (jit trace + remote executable
        # load, ~2-3 s) that a production screen of a large library
        # amortises to nothing. Re-run the dispatch+drain loop on the
        # cached device-resident batches (byte-identical scores) and
        # report the steady-state rate the TPU sustains.
        import jax
        stack32 = jax.jit(lambda *xs: jax.numpy.stack(xs))
        steady = float('inf')
        for _ in range(repeat - 1):
            t0 = time.perf_counter()
            outs = [eval_fn(trainer.params, dev, **kw)
                    for dev, kw in ids_batches]
            # Group fetches 32-up: per-buffer D2H round trips (~0.1-0.5
            # s each) would dominate at library scale.
            grouped = [stack32(*(outs[i:i + 32]
                                 + [outs[-1]] * (32 - len(outs[i:i + 32]))))
                       for i in range(0, len(outs), 32)]
            with ThreadPoolExecutor(
                    max_workers=min(8, len(grouped))) as ex:
                list(ex.map(np.asarray, grouped))
            steady = min(steady, time.perf_counter() - t0)
        LOG.info(f'Steady state: {len(rows)} poses in {steady:.2f}s '
                 f'({len(rows) / steady:.0f} poses/s sustained)')

    df = pd.DataFrame(rows).sort_values(
        'score', ascending=False).reset_index(drop=True)
    df['rank'] = np.arange(1, len(df) + 1)
    df.to_csv(output, index=False)
    LOG.info(f'Ranked results written to {output}')

    if attribute_top > 0:
        from pointvs_tpu.attribution.attribution import score_atoms
        from pointvs_tpu.attribution.attribution_fns import ATTRIBUTION_FNS
        out_dir = mkdir(Path(output).with_suffix('') .parent
                        / 'top_hit_attributions')
        for _, hit in df.head(attribute_top).iterrows():
            scored = score_atoms(
                trainer, receptor, hit.ligand,
                ATTRIBUTION_FNS[attribution],
                radius=cmd_args.get('radius', radius),
                edge_radius=cmd_args.get('edge_radius', edge_radius))
            name = Path(hit.ligand).stem
            scored.to_csv(out_dir / f'{name}_{attribution}.csv',
                          index=False)
        LOG.info(f'Attributions for top {attribute_top} hits in {out_dir}')
    return df


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('model', help='Trained run directory or checkpoint')
    ap.add_argument('receptor', help='Receptor parquet')
    ap.add_argument('ligands', help='Ligand dir, glob or single file')
    ap.add_argument('--output', '-o', default='screen_results.csv')
    ap.add_argument('--batch_size', '-b', type=int, default=256)
    ap.add_argument('--attribute_top', type=int, default=0)
    ap.add_argument('--attribution', default='atom_masking')
    ap.add_argument('--num_devices', type=int, default=None)
    ap.add_argument('--cache_dir', default=None,
                    help='On-disk featurisation cache (production '
                         'libraries screen repeatedly; do not re-'
                         'featurise)')
    args = ap.parse_args(argv)
    screen(args.model, args.receptor, args.ligands, output=args.output,
           batch_size=args.batch_size, attribute_top=args.attribute_top,
           attribution=args.attribution, num_devices=args.num_devices,
           cache_dir=args.cache_dir)


if __name__ == '__main__':
    main()
