"""Graph-sharded (edge-parallel) parity: splitting one graph's edges over
a 4-device mesh must reproduce the single-device forward, gradients and
optimiser step."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model
from pointvs_tpu.parallel.graph_shard import (
    make_sharded_forward,
    shard_graph_batch,
)
from pointvs_tpu.parallel.mesh import get_mesh, replicate, shard_batch

from .setup_and_params import FAST_MODEL_KWARGS as MODEL_KWARGS, RESOURCES

np.random.seed(2)


def _sample():
    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    return ds[0]


@pytest.mark.parametrize('name', ['egnn', 'lucid', 'en_transformer',
                                  'multitask'])
def test_edge_parallel_matches_single_device(name):
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    sample = _sample()

    # Single-device truth
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    full_batch = pad_graphs_to_batch([sample], num_graphs=1)
    model = build_model(name, **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), full_batch)
    expected = np.asarray(model.apply(params, full_batch))

    # Edge-parallel over 4 devices
    sharded_model = build_model(name, edge_shard_axis='gp',
                                **MODEL_KWARGS)
    mesh = get_mesh(4, axis_name='gp')
    batch = shard_graph_batch(sample, 4)
    fwd = make_sharded_forward(sharded_model, mesh)
    got = np.asarray(fwd(replicate(params, mesh),
                         shard_batch(batch, mesh, axis_name='gp')))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_edge_parallel_train_step_matches_single_device():
    """One edge-parallel optimiser step == the unsharded step: pmean of
    per-device grads recovers the exact full-graph gradient (psum
    transposes to psum under check_rep=False), so post-step params must
    agree to float accumulation noise."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    from pointvs_tpu.parallel.graph_shard import make_sharded_train_step
    from pointvs_tpu.training.losses import loss_fn
    from pointvs_tpu.training.optimisers import build_optimiser

    sample = _sample()
    full = pad_graphs_to_batch([sample], num_graphs=1)
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), full)
    # SGD: the update is linear in the gradient, so parity holds to
    # float noise (Adam's first step is ~sign(g) and amplifies it).
    tx = build_optimiser('sgd', weight_decay=1e-4)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(7)

    # Single-device truth (dropout=0, so rng folding is irrelevant).
    def sum_loss(p):
        logits = model.apply(p, full, train=True, rngs={'dropout': rng})
        return loss_fn(logits, full, 'classification', 'mse')

    (loss_sum, weight), grads = jax.value_and_grad(
        sum_loss, has_aux=True)(params)
    grads = jax.tree.map(lambda g: g / max(float(weight), 1.0), grads)
    updates, _ = tx.update(grads, opt_state, params)
    expected = jax.tree.map(lambda p, u: p - 1e-3 * u, params, updates)
    expected_loss = float(loss_sum) / max(float(weight), 1.0)

    # Edge-parallel over 4 devices.
    sharded_model = build_model('egnn', edge_shard_axis='gp',
                                **MODEL_KWARGS)
    mesh = get_mesh(4, axis_name='gp')
    batch = shard_batch(shard_graph_batch(sample, 4), mesh, axis_name='gp')
    step = make_sharded_train_step(sharded_model, tx, 'classification',
                                   'mse', mesh)
    # The step donates its params/opt_state buffers; give it copies so the
    # reference pytrees stay alive.
    copy = lambda t: jax.tree.map(lambda x: np.array(x), t)
    new_params, _, loss = step(replicate(copy(params), mesh),
                               replicate(copy(opt_state), mesh), batch,
                               jax.numpy.float32(1e-3), rng)

    assert abs(float(loss) - expected_loss) < 1e-5
    _check_params_close(expected, new_params, params)


def _check_params_close(expected, new_params, params):
    scale = max(float(np.max(np.abs(np.asarray(l))))
                for l in jax.tree.leaves(params))
    for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(new_params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   atol=1e-5 * scale)


def test_lucid_edge_parallel_training_no_nan():
    """Lucid edge-parallel training end-to-end: also a regression test for
    the CoorsNorm NaN (sqrt differentiated at 0 on padding edges leaked
    NaN into every gradient from step 1)."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    import jax.numpy as jnp
    from pointvs_tpu.parallel.graph_shard import (
        init_sharded_params, make_sharded_train_step)
    from pointvs_tpu.training.optimisers import build_optimiser

    sample = _sample()
    model = build_model('lucid', edge_shard_axis='gp', k=32, dim_input=12,
                        dim_output=1, num_layers=4, attention=True)
    params = init_sharded_params(model, sample, jax.random.PRNGKey(0))
    mesh = get_mesh(4, axis_name='gp')
    batch = shard_batch(shard_graph_batch(sample, 4), mesh, axis_name='gp')
    tx = build_optimiser('adam', 1e-4)
    step = make_sharded_train_step(model, tx, 'classification', 'mse',
                                   mesh)
    p, o = replicate(params, mesh), replicate(tx.init(params), mesh)
    losses = []
    for i in range(5):
        p, o, loss = step(p, o, batch, jnp.float32(3e-3),
                          jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert not np.isnan(losses[-1])
    assert losses[-1] < losses[0]


def test_2d_dp_gp_matches_dp_only():
    """dp x gp (2x2) one-step training == plain 2-device DP on the same
    two graphs: the gp pmean recovers each row's exact gradient, and the
    dp combine uses the identical psum(loss_sum)/psum(weight) scheme."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    import jax.numpy as jnp
    from pointvs_tpu.data.buckets import (
        pad_graphs_to_batch, stack_device_batches)
    from pointvs_tpu.parallel.graph_shard import (
        make_train_step_2d, stack_2d_batches)
    from pointvs_tpu.parallel.mesh import get_mesh_2d
    from pointvs_tpu.parallel.steps import make_train_step
    from pointvs_tpu.training.optimisers import build_optimiser

    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    samples = [ds[0], ds[1]]

    model = build_model('egnn', **MODEL_KWARGS)
    full = pad_graphs_to_batch([samples[0]], num_graphs=1)
    params = model.init(jax.random.PRNGKey(2), full)
    tx = build_optimiser('sgd', weight_decay=1e-4)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(7)
    lr = jax.numpy.float32(1e-3)
    copy = lambda t: jax.tree.map(lambda x: np.array(x), t)

    # Reference: plain DP over 2 devices, one graph each.
    dp_mesh = get_mesh(2, axis_name='dp')
    dp_batch = stack_device_batches(
        [pad_graphs_to_batch([s], num_graphs=1) for s in samples])
    dp_step = make_train_step(model, tx, 'classification', 'mse', dp_mesh)
    exp_params, _, exp_loss = dp_step(
        replicate(copy(params), dp_mesh), replicate(copy(opt_state),
                                                    dp_mesh),
        shard_batch(dp_batch, dp_mesh), lr, rng)

    # 2x2: same two graphs, each edge-split over 2 gp columns.
    sharded_model = build_model('egnn', edge_shard_axis='gp',
                                **MODEL_KWARGS)
    mesh2d = get_mesh_2d(2, 2)
    batch2d = jax.device_put(
        stack_2d_batches(samples, n_gp=2),
        jax.sharding.NamedSharding(mesh2d,
                                   jax.sharding.PartitionSpec('dp', 'gp')))
    step2d = make_train_step_2d(sharded_model, tx, 'classification',
                                'mse', mesh2d)
    got_params, _, got_loss = step2d(
        replicate(copy(params), mesh2d),
        replicate(copy(opt_state), mesh2d), batch2d, lr, rng)

    assert abs(float(got_loss) - float(exp_loss)) < 1e-5
    _check_params_close(exp_params, got_params, params)


def test_multitask_affinity_2d_matches_dp_only():
    """Multitask AFFINITY head under edge sharding (ADVICE r3): the task
    kwarg must route through make_train_step_2d/make_eval_step_2d, and a
    2x2 multi_regression train step must match plain 2-device DP."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    import jax.numpy as jnp
    from pointvs_tpu.data.buckets import (
        pad_graphs_to_batch, stack_device_batches)
    from pointvs_tpu.parallel.graph_shard import (
        make_eval_step_2d, make_train_step_2d, stack_2d_batches)
    from pointvs_tpu.parallel.mesh import get_mesh_2d
    from pointvs_tpu.parallel.steps import make_train_step
    from pointvs_tpu.training.optimisers import build_optimiser

    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    import dataclasses
    ys = [np.array([4.0, 5.0, 6.0], np.float32),
          np.array([5.5, 4.5, 6.5], np.float32)]
    samples = [dataclasses.replace(ds[0], y=ys[0]),
               dataclasses.replace(ds[1], y=ys[1])]

    mt_kwargs = dict(MODEL_KWARGS, dim_output=3)
    model = build_model('multitask', **mt_kwargs)
    full = pad_graphs_to_batch([samples[0]], num_graphs=1)
    params = model.init(jax.random.PRNGKey(2), full)
    tx = build_optimiser('sgd', weight_decay=1e-4)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(7)
    lr = jnp.float32(1e-3)
    copy = lambda t: jax.tree.map(lambda x: np.array(x), t)

    dp_mesh = get_mesh(2, axis_name='dp')
    dp_batch = stack_device_batches(
        [pad_graphs_to_batch([s], num_graphs=1) for s in samples])
    dp_step = make_train_step(model, tx, 'multi_regression', 'mse',
                              dp_mesh, multitask=True)
    exp_params, _, exp_loss = dp_step(
        replicate(copy(params), dp_mesh),
        replicate(copy(opt_state), dp_mesh),
        shard_batch(dp_batch, dp_mesh), lr, rng)

    sharded_model = build_model('multitask', edge_shard_axis='gp',
                                **mt_kwargs)
    mesh2d = get_mesh_2d(2, 2)
    batch2d = jax.device_put(
        stack_2d_batches(samples, n_gp=2),
        jax.sharding.NamedSharding(mesh2d,
                                   jax.sharding.PartitionSpec('dp', 'gp')))
    step2d = make_train_step_2d(sharded_model, tx, 'multi_regression',
                                'mse', mesh2d, multitask=True)
    got_params, _, got_loss = step2d(
        replicate(copy(params), mesh2d),
        replicate(copy(opt_state), mesh2d), copy(batch2d), lr, rng)

    assert abs(float(got_loss) - float(exp_loss)) < 1e-5
    _check_params_close(exp_params, got_params, params)

    # Eval-side task routing: the sharded affinity logits equal the
    # unsharded multi-head forward.
    eval2d = make_eval_step_2d(sharded_model, 'multi_regression', mesh2d,
                               multitask=True)
    got_logits = np.asarray(
        eval2d(replicate(params, mesh2d), batch2d)).reshape(-1, 3)
    exp_logits = np.stack([
        np.asarray(model.apply(
            params, pad_graphs_to_batch([s], num_graphs=1),
            task='multi_regression')).reshape(3)
        for s in samples])
    np.testing.assert_allclose(got_logits, exp_logits, atol=2e-5)


def test_cli_graph_shard_matches_dp_only(tmp_path):
    """The CLI path: --num_devices 8 --graph_shard 2 (4 dp rows x 2 edge
    shards) reproduces 4-device DP-only training end to end — loader 2-D
    collation, Trainer 2-D mesh/steps, val predictions."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from pointvs_tpu.main import main as train_main

    flags = [
        '--train_data_root_pose', 'tests/resources',
        '--train_types_pose', 'tests/resources/test.types',
        '--test_data_root_pose', 'tests/resources',
        '--test_types_pose', 'tests/resources/test.types',
        '--layers', '2', '--egnn_attention', '--egnn_residual',
        '--egnn_tanh', '--egnn_normalise', '--graphnorm', '--compact',
        '--prefetch', '0', '-ep', '2', '-b', '4',
    ]

    def preds(path):
        vals = []
        with open(path) as f:
            for line in f:
                chunks = line.split()
                if len(chunks) >= 3:
                    vals.append(float(chunks[2]))
        return np.sort(np.array(vals))

    dp_dir = str(tmp_path / 'dp_only')
    train_main(['egnn', dp_dir, *flags, '--num_devices', '4'])
    gs_dir = str(tmp_path / 'graph_shard')
    train_main(['egnn', gs_dir, *flags, '--num_devices', '8',
                '--graph_shard', '2'])

    p_dp = preds(f'{dp_dir}/pose_predictions.txt')
    p_gs = preds(f'{gs_dir}/pose_predictions.txt')
    assert len(p_dp) == len(p_gs) == 2
    np.testing.assert_allclose(p_dp, p_gs, atol=5e-4)

    # Checkpoints from edge-sharded training stay single-device
    # loadable (edge_shard_axis is injected at build time, never saved).
    from pointvs_tpu.inference import main as infer_main
    infer_main([gs_dir, 'tests/resources/test.types', 'tests/resources',
                '--output_fname', 'gs_roundtrip.txt', '--num_devices',
                '1'])
    p_inf = preds(f'{gs_dir}/pose_gs_roundtrip.txt')
    np.testing.assert_allclose(p_inf, p_gs, atol=5e-4)
