"""Mixed-precision (--bf16) mode: params stay f32, feature-path MLPs run
bfloat16, head/loss/geometry stay f32."""
import jax
import jax.numpy as jnp
import numpy as np

from pointvs_tpu.models import build_model

from .setup_and_params import FAST_MODEL_KWARGS as MODEL_KWARGS, RESOURCES


def _batch():
    from pointvs_tpu.data.buckets import pad_graphs_to_batch
    from pointvs_tpu.data.dataset import PointCloudDataset
    ds = PointCloudDataset(
        RESOURCES, radius=4, polar_hydrogens=False, compact=True,
        types_fname=RESOURCES / 'test.types', edge_radius=4,
        estimate_bonds=True, model_task='classification')
    return pad_graphs_to_batch([ds[0], ds[1]], num_graphs=2)


def test_bf16_forward_close_to_f32_and_params_stay_f32():
    batch = _batch()
    m32 = build_model('egnn', **MODEL_KWARGS)
    m16 = build_model('egnn', bf16=True, **MODEL_KWARGS)
    params = m32.init(jax.random.PRNGKey(0), batch)
    # Same param tree serves both precisions (cast happens per-op).
    o32 = np.asarray(m32.apply(params, batch))
    o16 = np.asarray(m16.apply(params, batch))
    rel = np.max(np.abs(o32 - o16)) / (np.max(np.abs(o32)) + 1e-9)
    assert rel < 0.05, rel
    p16 = m16.init(jax.random.PRNGKey(0), batch)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p16))
    # logits come out f32 (head runs full precision)
    assert m16.apply(p16, batch).dtype == jnp.float32


def test_bf16_gradients_finite_and_train_decreases_loss():
    from pointvs_tpu.training.losses import loss_fn
    from pointvs_tpu.training.optimisers import build_optimiser
    batch = _batch()
    model = build_model('egnn', bf16=True, **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = build_optimiser('adam', 1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lo(pp):
            s, w = loss_fn(model.apply(pp, batch), batch,
                           'classification', 'mse')
            return s / jnp.maximum(w, 1.0)
        loss, g = jax.value_and_grad(lo)(p)
        u, o = tx.update(g, o, p)
        return jax.tree.map(lambda a, b: a - 3e-3 * b, p, u), o, loss

    losses = []
    for _ in range(10):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bf16_cli_flag_reaches_model():
    from pointvs_tpu.config import model_kwargs_from_args, parse_args
    args = parse_args(['egnn', '/tmp/x', '--bf16'])
    kwargs = model_kwargs_from_args(args, dim_input=12)
    assert kwargs['bf16'] is True
    model = build_model('egnn', **kwargs)
    assert model.bf16
