"""Worker process for the multi-process `jax.distributed` CPU test.

Spawned by tests/test_multihost.py with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local> in the
environment (set BEFORE interpreter start, so the sitecustomize jax
import honours them). Each process:

1. joins the cluster (coordinator on 127.0.0.1),
2. builds the tests/resources dataset + a striped GraphDataLoader
   exactly as main.build_loaders does for --multihost (same seed, local
   device rows, pinned single buckets),
3. runs 2 training steps of the shard_map DP step over the GLOBAL mesh
   (grads/loss psum over ICI+DCN),
4. writes its final params + per-step losses to <out>/result_<pid>.npz.

Run with num_processes=1 for the single-process reference.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    coord, n_proc, pid, out = sys.argv[1:5]
    n_proc, pid = int(n_proc), int(pid)
    # sitecustomize imports jax (registering the remote TPU backend)
    # before this script runs, so env tweaks are too late; XLA_FLAGS from
    # the spawner still applies because backends initialise lazily.
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', 'highest')
    if n_proc > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n_proc, process_id=pid)
    import numpy as np

    from pointvs_tpu.data.dataset import PointCloudDataset
    from pointvs_tpu.data.loader import GraphDataLoader
    from pointvs_tpu.models import build_model
    from pointvs_tpu.parallel.mesh import get_mesh, replicate, shard_batch
    from pointvs_tpu.parallel.steps import make_train_step
    from pointvs_tpu.training.optimisers import build_optimiser
    import jax.numpy as jnp

    assert jax.process_count() == n_proc
    total = len(jax.devices())
    local_rows = total // n_proc

    ds = PointCloudDataset(
        'tests/resources', radius=4, polar_hydrogens=False, compact=True,
        types_fname='tests/resources/test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    # Same seed on every process; each strides off its own rows of every
    # global batch (loader stripes the shared index stream by process).
    dl = GraphDataLoader(
        ds, batch_size=8 // n_proc, mode='train',
        num_devices=local_rows, prefetch=0, seed=3,
        shard_index=pid, num_shards=n_proc,
        node_buckets=(256,), edge_buckets=(1024,))

    model = build_model('egnn', dim_input=ds.feature_dim, k=12,
                        dim_output=1, num_layers=2, scan_layers=True,
                        residual=True, graphnorm=True)
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    init_batch = pad_graphs_to_batch([ds[0]], num_graphs=1,
                                     n_pad=256, e_pad=1024)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    tx = build_optimiser('adam', 1e-4)
    opt_state = tx.init(params)

    mesh = get_mesh()  # all GLOBAL devices
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = make_train_step(model, tx, 'classification', 'mse', mesh)
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(7)

    losses = []
    for _ in range(2):  # 2 epochs x 1 batch = 2 steps
        for batch, _meta in dl:
            dev = shard_batch(batch, mesh)
            params, opt_state, loss = step(params, opt_state, dev, lr,
                                           rng)
            losses.append(float(np.asarray(jax.device_get(loss))))

    if pid == 0:
        leaves = jax.tree.leaves(jax.device_get(params))
        np.savez(f'{out}/result_{n_proc}proc.npz',
                 losses=np.array(losses),
                 **{f'p{i}': np.asarray(l) for i, l in enumerate(leaves)})

    # Eval path: each process fetches only its ADDRESSABLE logit shards
    # (exactly the rows its loader collated) — the mechanism engine.val
    # uses in multi-process mode.
    from pointvs_tpu.parallel.steps import make_eval_step
    eval_dl = GraphDataLoader(
        ds, batch_size=8 // n_proc, mode='val', num_devices=local_rows,
        prefetch=0, shard_index=pid, num_shards=n_proc,
        node_buckets=(256,), edge_buckets=(1024,))
    ev = make_eval_step(model, 'classification', mesh)
    batch, meta = next(iter(eval_dl))
    logits = ev(params, shard_batch(batch, mesh))
    if getattr(logits, 'is_fully_addressable', True):
        arr = np.asarray(jax.device_get(logits))
    else:
        shards = sorted(logits.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
        arr = np.concatenate([np.asarray(s.data) for s in shards])
    mask = np.asarray(meta.graph_mask).reshape(-1) > 0
    real = arr.reshape(mask.shape[0], -1)[mask]
    np.savez(f'{out}/eval_{n_proc}proc_{pid}.npz', logits=real)

    # Device-resident dataset under multi-process: pinned single buckets
    # + pinned --scatter_cap give every process the one identical batch
    # spec, so the ids-collation step compiles one program globally.
    # Same seed/stream as the wire phase above -> identical batches ->
    # the per-step losses must match the wire path.
    from pointvs_tpu.data.device_dataset import (DeviceGraphStore,
                                                 build_host_store)
    dd = GraphDataLoader(
        ds, batch_size=8 // n_proc, mode='train', num_devices=local_rows,
        prefetch=0, seed=3, shard_index=pid, num_shards=n_proc,
        node_buckets=(256,), edge_buckets=(1024,), scatter_cap=2048)
    dd.enable_device_dataset(DeviceGraphStore(build_host_store(ds), mesh))
    params2 = replicate(jax.jit(model.init)(jax.random.PRNGKey(0),
                                            init_batch), mesh)
    opt2 = replicate(tx.init(jax.jit(model.init)(jax.random.PRNGKey(0),
                                                 init_batch)), mesh)
    dd_losses = []
    for _ in range(2):
        for batch, meta in dd:
            assert batch[0] == 'ids', batch[0]
            _, ids_np, st, spec = batch
            dev = ('ids', shard_batch(ids_np, mesh), st.arrays, spec)
            params2, opt2, loss = step(params2, opt2, dev, lr, rng,
                                       cap=meta.cap)
            dd_losses.append(float(np.asarray(jax.device_get(loss))))
    np.testing.assert_allclose(np.array(dd_losses), np.array(losses),
                               atol=1e-5)
    if pid == 0:
        leaves = jax.tree.leaves(jax.device_get(params2))
        np.savez(f'{out}/result_dd_{n_proc}proc.npz',
                 losses=np.array(dd_losses),
                 **{f'p{i}': np.asarray(l) for i, l in enumerate(leaves)})

    # --graph_shard x --multihost composition (VERDICT r4 item #5): the
    # 2-D (dp x gp) mesh spans processes — global mesh (total//gp, gp),
    # each process's loader collating only its own dp rows with every
    # graph's edges split over the gp columns. Same seed/stream as the
    # phases above, so the 1-proc and 2-proc runs must produce identical
    # per-step losses and final params.
    gp = 2
    if total % gp == 0 and (total // gp) % n_proc == 0:
        from pointvs_tpu.parallel.graph_shard import make_train_step_2d
        from pointvs_tpu.parallel.mesh import get_mesh_2d
        mesh2 = get_mesh_2d(total // gp, gp)
        gs_model = build_model(
            'egnn', dim_input=ds.feature_dim, k=12, dim_output=1,
            num_layers=2, scan_layers=True, residual=True,
            graphnorm=True, edge_shard_axis='gp')
        gs_dl = GraphDataLoader(
            ds, batch_size=8 // n_proc, mode='train',
            num_devices=local_rows // gp, graph_shard=gp, prefetch=0,
            seed=3, shard_index=pid, num_shards=n_proc,
            node_buckets=(256,), edge_buckets=(1024,))
        p3 = replicate(jax.jit(model.init)(jax.random.PRNGKey(0),
                                           init_batch), mesh2)
        o3 = replicate(tx.init(jax.jit(model.init)(
            jax.random.PRNGKey(0), init_batch)), mesh2)
        step2d = make_train_step_2d(gs_model, tx, 'classification',
                                    'mse', mesh2)
        gs_losses = []
        for _ in range(2):
            for batch, _meta in gs_dl:
                dev = shard_batch(batch, mesh2, ('dp', 'gp'))
                p3, o3, loss = step2d(p3, o3, dev, lr, rng)
                gs_losses.append(float(np.asarray(jax.device_get(loss))))
        if pid == 0:
            leaves = jax.tree.leaves(jax.device_get(p3))
            np.savez(f'{out}/result_gs_{n_proc}proc.npz',
                     losses=np.array(gs_losses),
                     **{f'p{i}': np.asarray(l)
                        for i, l in enumerate(leaves)})

    # All processes must stay alive until every file has been written.
    if n_proc > 1:
        import jax.experimental.multihost_utils as mhu
        mhu.sync_global_devices('done')


if __name__ == '__main__':
    main()
