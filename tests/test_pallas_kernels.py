"""Pallas windowed-segment-sum parity (interpret mode on CPU; the
compiled kernel's device parity is exercised by bench/TPU runs)."""
import jax
import jax.numpy as jnp
import numpy as np

from pointvs_tpu.ops.pallas.segment_kernels import (
    pallas_windowed_segment_sum,
)
from pointvs_tpu.ops.sorted_segment import (
    WINDOW,
    derive_max_eb,
    windowed_segment_sum,
)

np.random.seed(2)


def test_pallas_matches_xla_windowed():
    rng = np.random.RandomState(0)
    n, e, k = 1024, 8192, 32
    ids = np.sort(np.concatenate(
        [rng.randint(0, n, e - 500), np.full(500, n)])).astype(np.int32)
    data = rng.rand(e, k).astype(np.float32)
    max_eb = derive_max_eb(e, n)
    ref = windowed_segment_sum(jnp.array(data), jnp.array(ids), n)
    got = pallas_windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, WINDOW, max_eb,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_pallas_empty_windows():
    """Windows with zero incident edges must come out exactly zero."""
    rng = np.random.RandomState(1)
    n, e, k = 512, 2048, 32
    # ids concentrated in the first half: second-half windows are empty.
    # Concentration doubles the per-window load, so pass an explicit
    # capacity (the collator would have enforced this bound).
    ids = np.sort(rng.randint(0, n // 2, e)).astype(np.int32)
    data = rng.rand(e, k).astype(np.float32)
    max_eb = 2048
    got = np.asarray(pallas_windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, WINDOW, max_eb,
        interpret=True))
    assert np.all(got[n // 2:] == 0)
    ref = np.asarray(windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, max_eb=max_eb))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def _softmax_setup(seed=3, n=1024, e=8192, k=32):
    rng = np.random.RandomState(seed)
    ids = np.sort(np.concatenate(
        [rng.randint(0, n, e - 700), np.full(700, n)])).astype(np.int32)
    # Ensure tie cases: some destinations with exactly one edge.
    feat = rng.randn(e, k).astype(np.float32)
    logits = (rng.randn(e) * 2).astype(np.float32)
    trans = rng.randn(e, 3).astype(np.float32)
    mask = (ids < n).astype(np.float32)
    mask[rng.rand(e) < 0.1] = 0.0   # some masked real edges
    return ids, feat, logits, trans, mask


def _unfused_reference(agg_cls):
    """The composable (windowed max + scatter) formulation, forced."""
    def run(feat, logits, trans, mask, ids, n):
        import pointvs_tpu.ops.aggregate as A
        agg = agg_cls(jnp.asarray(ids), jnp.asarray(ids), None,
                      jnp.asarray(mask), n)
        # bypass the pallas gate by calling the tail of the method:
        guarded = jnp.where(mask > 0, logits, jnp.asarray(-1e30))
        from pointvs_tpu.ops.sorted_segment import (
            windowed_segment_max, windowed_segment_sum)
        seg_max = windowed_segment_max(guarded, agg.senders, n)
        seg_max = jnp.where(seg_max > -1e29, seg_max, 0.0)
        shift = jax.lax.stop_gradient(
            seg_max[jnp.minimum(agg.senders, n - 1)])
        expd = jnp.exp(logits - shift) * mask
        k = feat.shape[1]
        packed = jnp.concatenate(
            [feat * expd[:, None], trans * mask[:, None],
             expd[:, None], mask[:, None]], axis=1)
        pad = (-packed.shape[1]) % 8
        if pad:
            packed = jnp.concatenate(
                [packed, jnp.zeros((packed.shape[0], pad),
                                   packed.dtype)], axis=1)
        out = windowed_segment_sum(packed, agg.senders, n)
        denom = jnp.maximum(out[:, k + 3:k + 4], 1e-16)
        feat_agg = out[:, :k] / denom
        counts = jnp.maximum(out[:, k + 4:k + 5], 1.0)
        return feat_agg, out[:, k:k + 3] / counts
    return run


def test_fused_softmax_aggregate_kernel_forward():
    from pointvs_tpu.ops.aggregate import EdgeAggregator, \
        _fused_softmax_pallas
    n, e, k = 1024, 8192, 32
    ids, feat, logits, trans, mask = _softmax_setup()
    max_eb = derive_max_eb(e, n)
    ref_fn = _unfused_reference(EdgeAggregator)
    ref_f, ref_c = ref_fn(jnp.asarray(feat), jnp.asarray(logits),
                          jnp.asarray(trans), jnp.asarray(mask), ids, n)
    got_f, got_c = _fused_softmax_pallas(
        jnp.asarray(feat), jnp.asarray(logits), jnp.asarray(trans),
        jnp.asarray(mask), jnp.asarray(ids), n, WINDOW, max_eb, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               atol=2e-5, rtol=1e-5)


def test_fused_softmax_aggregate_kernel_grads():
    """Custom VJP must replicate autodiff of the unfused formulation —
    including the maximum-tie subgradient at degree-1 destinations."""
    from pointvs_tpu.ops.aggregate import EdgeAggregator, \
        _fused_softmax_pallas
    n, e, k = 512, 4096, 16
    ids, feat, logits, trans, mask = _softmax_setup(seed=5, n=n, e=e, k=k)
    max_eb = derive_max_eb(e, n)
    ref_fn = _unfused_reference(EdgeAggregator)

    def loss_ref(f, l, t):
        a, c = ref_fn(f, l, t, jnp.asarray(mask), ids, n)
        return (jnp.sum(a * jnp.cos(jnp.arange(a.size).reshape(a.shape)))
                + jnp.sum(c * 0.5))

    def loss_got(f, l, t):
        a, c = _fused_softmax_pallas(
            f, l, t, jnp.asarray(mask), jnp.asarray(ids), n, WINDOW,
            max_eb, True)
        return (jnp.sum(a * jnp.cos(jnp.arange(a.size).reshape(a.shape)))
                + jnp.sum(c * 0.5))

    args = (jnp.asarray(feat), jnp.asarray(logits), jnp.asarray(trans))
    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    got_g = jax.grad(loss_got, argnums=(0, 1, 2))(*args)
    for rg, gg, name in zip(ref_g, got_g, ('feat', 'logits', 'trans')):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f'grad {name}')


def test_fused_sigmoid_aggregate_kernel():
    """Sigmoid-attention fused kernel: forward and custom VJP match the
    composable sigmoid + packed-scatter formulation."""
    from pointvs_tpu.ops.aggregate import (EdgeAggregator,
                                           _fused_sigmoid_pallas)
    n, e, k = 512, 4096, 16
    ids, feat, logits, trans, mask = _softmax_setup(seed=9, n=n, e=e, k=k)
    max_eb = derive_max_eb(e, n)
    agg = EdgeAggregator(jnp.asarray(ids), jnp.asarray(ids), None,
                         jnp.asarray(mask), n)

    def ref(f, l, t):
        att = jax.nn.sigmoid(l)[:, None]
        return agg.fused_sum_mean_to_src(att * f, t,
                                         mask=jnp.asarray(mask))

    def got(f, l, t):
        return _fused_sigmoid_pallas(
            f, l, t, jnp.asarray(mask), jnp.asarray(ids), n, WINDOW,
            max_eb, True)

    args = (jnp.asarray(feat), jnp.asarray(logits), jnp.asarray(trans))
    rf, rc = ref(*args)
    gf, gc = got(*args)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                               atol=2e-5, rtol=1e-5)

    def loss(fn):
        def run(f, l, t):
            a, c = fn(f, l, t)
            return (jnp.sum(a * jnp.sin(jnp.arange(a.size
                                                   ).reshape(a.shape)))
                    + 0.5 * jnp.sum(c))
        return run

    rg = jax.grad(loss(ref), argnums=(0, 1, 2))(*args)
    gg = jax.grad(loss(got), argnums=(0, 1, 2))(*args)
    for r, g, name in zip(rg, gg, ('feat', 'logits', 'trans')):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f'grad {name}')
