"""Fused TRAINING path parity: fused_apply (Pallas fused edge kernel with
the flash-style fused backward, interpret mode on CPU) must match
model.apply in both outputs and gradients — parameters and coordinates —
for the supported config space."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvs_tpu.fused_train import fused_apply, supports_fused_training
from pointvs_tpu.models import build_model
from pointvs_tpu.training.losses import loss_fn

from .setup_and_params import FAST_MODEL_KWARGS as MODEL_KWARGS
from .test_fused_engine import _pad_nodes

np.random.seed(2)


def _batch():
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    from pointvs_tpu.data.dataset import PointCloudDataset
    from .setup_and_params import RESOURCES
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    return _pad_nodes(pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2))


VARIANTS = {
    'softmax_attention': MODEL_KWARGS,
    'sigmoid_attention': {**MODEL_KWARGS, 'softmax_attention': False},
    'no_attention': {**MODEL_KWARGS, 'edge_attention': False,
                     'node_attention': False, 'softmax_attention': False},
    'edge_residual': {**MODEL_KWARGS, 'edge_residual': True},
    'no_graphnorm': {**MODEL_KWARGS, 'graphnorm': False,
                     'normalize': False, 'tanh': False},
    'scan_layers': {**MODEL_KWARGS, 'scan_layers': True},
}


@pytest.mark.parametrize('variant', sorted(VARIANTS))
def test_fused_train_forward_and_grad_parity(variant):
    batch = _batch()
    model = build_model('egnn', **VARIANTS[variant])
    assert supports_fused_training(model, batch)
    params = model.init(jax.random.PRNGKey(2), batch)

    want = np.asarray(model.apply(params, batch, train=True,
                                  rngs={'dropout': jax.random.PRNGKey(0)}))
    got = np.asarray(fused_apply(model, params, batch, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)

    def loss_unfused(p, coords):
        out = model.apply(p, batch._replace(coords=coords), train=True,
                          rngs={'dropout': jax.random.PRNGKey(0)})
        s, w = loss_fn(out, batch, 'classification', 'mse')
        return s / jnp.maximum(w, 1.0)

    def loss_fused(p, coords):
        out = fused_apply(model, p, batch._replace(coords=coords),
                          interpret=True)
        s, w = loss_fn(out, batch, 'classification', 'mse')
        return s / jnp.maximum(w, 1.0)

    coords = jnp.asarray(batch.coords)
    g_un = jax.grad(loss_unfused, argnums=(0, 1))(params, coords)
    g_fu = jax.grad(loss_fused, argnums=(0, 1))(params, coords)

    # coordinate gradients
    np.testing.assert_allclose(np.asarray(g_fu[1]), np.asarray(g_un[1]),
                               atol=3e-5)
    # parameter gradients, leaf by leaf
    flat_un = jax.tree_util.tree_leaves_with_path(g_un[0])
    flat_fu = jax.tree_util.tree_leaves_with_path(g_fu[0])
    assert len(flat_un) == len(flat_fu)
    for (path_u, leaf_u), (path_f, leaf_f) in zip(flat_un, flat_fu):
        assert path_u == path_f
        scale = max(1.0, float(np.abs(np.asarray(leaf_u)).max()))
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_u), atol=3e-5 * scale,
            err_msg=str(path_u))
