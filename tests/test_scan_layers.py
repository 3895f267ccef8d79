"""nn.scan layer stacking: params live as [L, ...] leaves, compute is
fully unrolled. Must match the unrolled module exactly (forward, grads,
aux capture) when the unrolled params are stacked into the scan layout."""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import FAST_MODEL_KWARGS as MODEL_KWARGS, RESOURCES

KW = dict(MODEL_KWARGS, edge_residual=True)


def _batch():
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    return pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)


def _stack_params(p_un, scan_shape_tree, num_layers):
    """Unrolled param tree -> scan layout ([L, ...] stacked leaves)."""
    un = p_un['params']
    flat, treedef = jtu.tree_flatten_with_path(scan_shape_tree)
    leaves = []
    for path, _ in flat:
        keys = [k.key for k in path]
        leaves.append(jnp.asarray(np.stack([
            np.asarray(jtu.tree_reduce(lambda a, b: a[b], keys,
                                       un[f'egnn_layer_{i}']))
            for i in range(num_layers)])))
    out = {'params': {k: v for k, v in un.items()
                      if not k.startswith('egnn_layer_')}}
    out['params']['egnn_scan'] = jtu.tree_unflatten(treedef, leaves)
    return out


def test_scan_matches_unrolled_forward_grads_aux():
    batch = _batch()
    L = KW['num_layers']
    m_un = build_model('egnn', **KW)
    m_sc = build_model('egnn', scan_layers=True, **KW)
    p_un = m_un.init(jax.random.PRNGKey(0), batch)
    p_shape = jax.eval_shape(m_sc.init, jax.random.PRNGKey(0), batch)
    p_sc = _stack_params(p_un, p_shape['params']['egnn_scan'], L)

    o_un = np.asarray(m_un.apply(p_un, batch))
    o_sc = np.asarray(m_sc.apply(p_sc, batch))
    np.testing.assert_allclose(o_sc, o_un, atol=1e-6)

    from pointvs_tpu.training.losses import loss_fn

    def lo(m, p):
        s, w = loss_fn(m.apply(p, batch), batch, 'classification', 'mse')
        return s / jnp.maximum(w, 1.0)

    g_un = jax.grad(lambda p: lo(m_un, p))(p_un)
    g_sc = jax.grad(lambda p: lo(m_sc, p))(p_sc)
    for i in (0, L - 1):
        a = g_un['params'][f'egnn_layer_{i}']['edge_mlp']
        b = jax.tree.map(lambda x, i=i: x[i],
                         g_sc['params']['egnn_scan']['edge_mlp'])
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=1e-6)

    _, aux_un = m_un.apply(p_un, batch, capture_aux=True)
    _, aux_sc = m_sc.apply(p_sc, batch, capture_aux=True)
    assert len(aux_sc['layers']) == L
    for x, y in zip(jax.tree.leaves(aux_un['layers']),
                    jax.tree.leaves(aux_sc['layers'])):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_scan_leaf_count_reduction():
    batch = _batch()
    L = KW['num_layers']
    n_un = len(jax.tree.leaves(jax.eval_shape(
        build_model('egnn', **KW).init, jax.random.PRNGKey(0), batch)))
    n_sc = len(jax.tree.leaves(jax.eval_shape(
        build_model('egnn', scan_layers=True, **KW).init,
        jax.random.PRNGKey(0), batch)))
    assert n_sc < n_un / (L / 2)


def test_scan_cli_training_end_to_end(tmp_path):
    """Default CLI path (scan on) trains and predicts."""
    from pointvs_tpu.main import main as train_main
    train_main(['egnn', str(tmp_path / 'run'),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--test_data_root_pose', 'tests/resources',
                '--test_types_pose', 'tests/resources/test.types',
                '--layers', '3', '-ep', '2', '-b', '2', '--compact',
                '--egnn_attention', '--prefetch', '0',
                '--num_devices', '1'])
    preds = list((tmp_path / 'run').glob('**/*predictions*.txt'))
    assert preds, 'no predictions written'


def test_scan_multitask_guard():
    with pytest.raises(AssertionError):
        build_model('multitask', scan_layers=True,
                    edge_attention_final_only=True, **KW).init(
            jax.random.PRNGKey(0), _batch())


def test_scan_remat_composes():
    batch = _batch()
    m = build_model('egnn', scan_layers=True, remat=True, **KW)
    p = m.init(jax.random.PRNGKey(0), batch)
    out = jax.grad(
        lambda pp: jnp.sum(m.apply(pp, batch)))(p)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(out))


@pytest.mark.parametrize('name,prefix,scanname', [
    ('lucid', 'lucid_layer_', 'lucid_scan'),
    ('en_transformer', 'tf_layer_', 'tf_scan'),
])
def test_scan_matches_unrolled_other_families(name, prefix, scanname):
    batch = _batch()
    L = 4
    kw = dict(k=32, dim_input=12, dim_output=1, num_layers=L,
              attention=True)
    m_un = build_model(name, **kw)
    m_sc = build_model(name, scan_layers=True, **kw)
    p_un = m_un.init(jax.random.PRNGKey(0), batch)
    shape = jax.eval_shape(m_sc.init, jax.random.PRNGKey(0), batch)
    un = p_un['params']
    flat, treedef = jtu.tree_flatten_with_path(shape['params'][scanname])
    leaves = []
    for path, _ in flat:
        keys = [k.key for k in path]
        leaves.append(jnp.asarray(np.stack([
            np.asarray(jtu.tree_reduce(lambda a, b: a[b], keys,
                                       un[f'{prefix}{i}']))
            for i in range(L)])))
    p_sc = {'params': {k: v for k, v in un.items()
                       if not k.startswith(prefix)}}
    p_sc['params'][scanname] = jtu.tree_unflatten(treedef, leaves)
    o_un = np.asarray(m_un.apply(p_un, batch))
    o_sc = np.asarray(m_sc.apply(p_sc, batch))
    np.testing.assert_allclose(o_sc, o_un, atol=1e-6)
