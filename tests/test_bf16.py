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


def test_mixed_gather_hc_bit_exact():
    """The bitcast-packed bf16+f32 fused gather must reproduce the
    separate gathers BIT-EXACTLY (select-masking, no arithmetic on
    packed lanes), and its one-scatter backward must match the separate
    backwards."""
    from pointvs_tpu.ops.aggregate import EdgeAggregator
    rng = np.random.RandomState(0)
    n, e, k = 512, 4096, 32
    senders = np.sort(np.concatenate(
        [rng.randint(0, n, e - 300), np.full(300, n)])).astype(np.int32)
    receivers = np.where(senders < n, rng.randint(0, n, e),
                         n).astype(np.int32)
    recv_perm = np.argsort(receivers, kind='stable').astype(np.int32)
    mask = (senders < n).astype(np.float32)
    agg = EdgeAggregator(jnp.asarray(senders), jnp.asarray(receivers),
                         jnp.asarray(recv_perm), jnp.asarray(mask), n)
    h = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    coord = jnp.asarray(rng.randn(n, 3), jnp.float32)

    for fused, sep in (
            (agg.gather_hc_src, lambda x: agg.gather_src(x)),
            (agg.gather_hc_dst, lambda x: agg.gather_dst(x))):
        h_f, c_f = fused(h, coord)
        h_ref = sep(h.astype(jnp.float32)).astype(jnp.bfloat16)
        c_ref = sep(coord)
        np.testing.assert_array_equal(
            np.asarray(h_f, np.float32), np.asarray(h_ref, np.float32))
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                                   atol=0, rtol=0)

    def loss_fused(hh, cc):
        hs, cs = agg.gather_hc_src(hh, cc)
        hr, cr = agg.gather_hc_dst(hh, cc)
        return (jnp.sum(hs.astype(jnp.float32) * 0.3)
                + jnp.sum(cs * 0.7) + jnp.sum(hr.astype(jnp.float32))
                + jnp.sum(cr * 1.3))

    def loss_sep(hh, cc):
        hs = agg.gather_src(hh.astype(jnp.float32))
        cs = agg.gather_src(cc)
        hr = agg.gather_dst(hh.astype(jnp.float32))
        cr = agg.gather_dst(cc)
        return (jnp.sum(hs * 0.3) + jnp.sum(cs * 0.7) + jnp.sum(hr)
                + jnp.sum(cr * 1.3))

    gf = jax.grad(loss_fused, argnums=(0, 1))(h, coord)
    gs = jax.grad(loss_sep, argnums=(0, 1))(h, coord)
    # h grads agree to bf16 precision (the reference loss upcasts before
    # the multiply, the fused one after the gather — one-ulp rounding).
    np.testing.assert_allclose(np.asarray(gf[0], np.float32),
                               np.asarray(gs[0], np.float32), rtol=1e-2,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gs[1]),
                               atol=1e-5)


def test_bf16_fused_paths_match_f32_model():
    """bf16 with the fused gather/aggregation paths still tracks the f32
    forward closely (aggregations upcast to f32 at the scatter)."""
    batch = _batch()
    kwargs = dict(MODEL_KWARGS)
    kwargs['softmax_attention'] = True
    m32 = build_model('egnn', **kwargs)
    m16 = build_model('egnn', bf16=True, **kwargs)
    params = m32.init(jax.random.PRNGKey(0), batch)
    o32 = np.asarray(m32.apply(params, batch))
    o16 = np.asarray(m16.apply(params, batch))
    rel = np.max(np.abs(o32 - o16)) / (np.max(np.abs(o32)) + 1e-9)
    assert rel < 0.05, rel
