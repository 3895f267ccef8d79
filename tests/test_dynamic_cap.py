"""Per-batch scatter-capacity decoupling (dynamic cap).

The windowed scatter's capacity used to be a pure function of
(e_pad, n_pad): dense batches whose realised max window load exceeded it
forced the collator to GROW e_pad, inflating every per-edge tensor. The
dynamic-cap path keeps e_pad at the bucket and ships the measured
capacity via meta.cap instead (data/buckets.batch_scatter_cap ->
ops.sorted_segment.edge_capacity_override -> parallel/steps wrappers).

These tests pin: (1) override-path numerics against numpy segment sums,
(2) loss/grad/logit parity between a dynamic-cap run and the legacy
grown-e_pad run on a SKEWED batch where the two paths actually diverge,
(3) that the loader stops growing e_pad and emits a sufficient cap.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointvs_tpu.data.buckets import (GraphSample, batch_scatter_cap,
                                      pad_graphs_to_batch,
                                      stack_device_batches)
from pointvs_tpu.ops.sorted_segment import (WINDOW, cap_bucket,
                                            derive_max_eb,
                                            edge_capacity_override,
                                            windowed_segment_sum)


def _skewed_samples(rng, n_graphs=4, hub_edges=6000):
    """Graphs whose first member is a dense near-clique on few nodes:
    its incident edges all land in one scatter window, pushing the max
    window load far above the 2x-mean default capacity."""
    samples = []
    for g in range(n_graphs):
        if g == 0:
            n = 48
            s = rng.integers(0, n, size=hub_edges)
            r = (s + 1 + rng.integers(0, n - 1, size=hub_edges)) % n
        else:
            n = 400
            e = 300
            s = rng.integers(0, n, size=e)
            r = (s + 1 + rng.integers(0, n - 1, size=e)) % n
        # Symmetrise so in-degree == out-degree (collator invariant for
        # the radius graphs; keeps the gather-pair fast path honest).
        s2 = np.concatenate([s, r])
        r2 = np.concatenate([r, s])
        order = np.argsort(s2, kind='stable')
        s2, r2 = s2[order], r2[order]
        samples.append(GraphSample(
            node_feats=rng.normal(size=(n, 22)).astype(np.float32),
            coords=rng.normal(size=(n, 3)).astype(np.float32) * 3,
            senders=s2.astype(np.int32), receivers=r2.astype(np.int32),
            edge_attr=np.eye(3, dtype=np.float32)[
                rng.integers(0, 3, size=len(s2))],
            y=np.float32(g % 2),
            lig_fname=f'lig_{g}', rec_fname='rec'))
    return samples


def test_override_matches_numpy_segment_sum():
    rng = np.random.default_rng(0)
    n_pad, e_pad = 2048, 8192
    ids = np.sort(rng.integers(0, 64, size=6000)).astype(np.int32)
    ids = np.concatenate([ids, np.full(e_pad - len(ids), n_pad, np.int32)])
    data = rng.normal(size=(e_pad, 8)).astype(np.float32)
    data[6000:] = 0
    expected = np.zeros((n_pad, 8), np.float32)
    np.add.at(expected, ids[:6000], data[:6000])

    load = 6000  # all real ids in window 0
    cap = cap_bucket(load)
    assert cap >= load
    with edge_capacity_override(n_pad, e_pad, cap):
        assert derive_max_eb(e_pad, n_pad) == min(cap, 8192)
        out = np.asarray(windowed_segment_sum(
            jnp.asarray(data), jnp.asarray(ids), n_pad))
    np.testing.assert_allclose(out, expected, atol=1e-4)
    # Shapes that do NOT match the batch (e.g. node->graph pools) keep
    # the shape-derived capacity.
    base_pool = derive_max_eb(n_pad, 32)
    base_off = derive_max_eb(e_pad, n_pad + 1)
    with edge_capacity_override(n_pad, e_pad, cap):
        assert derive_max_eb(n_pad, 32) == base_pool
        assert derive_max_eb(e_pad, n_pad + 1) == base_off


def test_collator_skips_growth_and_caps_cover_load():
    rng = np.random.default_rng(1)
    samples = _skewed_samples(rng)
    grown = pad_graphs_to_batch(samples, num_graphs=4)
    capped = pad_graphs_to_batch(samples, num_graphs=4, dynamic_cap=True)
    # The skewed batch must actually exercise the divergence.
    assert grown.num_edges > capped.num_edges, \
        'fixture not skewed enough: legacy path did not grow e_pad'
    cap = batch_scatter_cap(capped)
    # Sufficiency: cap covers the realised max window load.
    real = np.asarray(capped.senders)
    loads = np.bincount(real[real < capped.num_nodes] // WINDOW)
    assert cap >= loads.max()


@pytest.mark.parametrize('attention', [False, True])
def test_train_and_eval_parity_vs_grown_epad(attention):
    from pointvs_tpu.models import build_model
    from pointvs_tpu.parallel.mesh import get_mesh, replicate, shard_batch
    from pointvs_tpu.parallel.steps import make_eval_step, make_train_step
    from pointvs_tpu.training.optimisers import build_optimiser

    rng = np.random.default_rng(2)
    samples = _skewed_samples(rng)
    grown = stack_device_batches(
        [pad_graphs_to_batch(samples, num_graphs=4)])
    capped_b = pad_graphs_to_batch(samples, num_graphs=4, dynamic_cap=True)
    cap = batch_scatter_cap(capped_b)
    capped = stack_device_batches([capped_b])

    model = build_model('egnn', dim_input=22, k=16, dim_output=1,
                        num_layers=2, edge_attention=attention,
                        softmax_attention=attention, residual=True,
                        normalize=True, graphnorm=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), capped_b)
    mesh = get_mesh(1)
    params = replicate(params, mesh)
    tx = build_optimiser('adam', 1e-4)

    eval_fn = make_eval_step(model, 'classification', mesh)
    logits_grown = np.asarray(eval_fn(params, shard_batch(grown, mesh)))
    logits_capped = np.asarray(eval_fn(
        params, shard_batch(capped, mesh), cap=cap))
    np.testing.assert_allclose(logits_capped, logits_grown, atol=3e-5)

    step = make_train_step(model, tx, 'classification', 'mse', mesh)
    sk = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    def run(batch, cap_kw):
        p = replicate(jax.jit(model.init)(jax.random.PRNGKey(0), capped_b),
                      mesh)
        o = replicate(tx.init(p), mesh)
        p, o, loss = step(p, o, shard_batch(batch, mesh), lr, sk, **cap_kw)
        return float(np.asarray(loss).ravel()[0]), p

    loss_g, params_g = run(grown, {})
    loss_c, params_c = run(capped, {'cap': cap})
    assert np.isfinite(loss_g) and abs(loss_g - loss_c) < 3e-5
    flat_g = jax.tree.leaves(params_g)
    flat_c = jax.tree.leaves(params_c)
    for a, b in zip(flat_g, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_loader_emits_cap(tmp_path):
    """The real loader path: dynamic cap on by default for the graph
    layout, meta.cap present and sufficient, and the deterministic val
    cache keeps it."""
    from tests.setup_and_params import _loader_kwargs
    from pointvs_tpu.data import get_data_loader
    dl = get_data_loader(batch_size=2, **_loader_kwargs)
    assert dl.dynamic_cap
    batch, meta = next(iter(dl))
    assert meta.cap is not None and meta.cap >= 1024
    senders = np.asarray(batch.senders)[0]
    n_pad = np.asarray(batch.coords)[0].shape[0]
    real = senders[senders < n_pad]
    assert meta.cap >= np.bincount(real // WINDOW).max()


def test_pinned_scatter_cap():
    """--scatter_cap pins meta.cap to one deterministic value (the
    multihost-safe variant: every process compiles the same program);
    undersized pins raise instead of silently overflowing."""
    from tests.setup_and_params import _loader_kwargs
    from pointvs_tpu.data import get_data_loader
    dl = get_data_loader(batch_size=2, scatter_cap=1 << 16,
                         **_loader_kwargs)
    assert dl.dynamic_cap and dl.scatter_cap == 1 << 16
    caps = [meta.cap for _, meta in dl]
    assert set(caps) == {1 << 16}
    small = get_data_loader(batch_size=2, scatter_cap=1,
                            **_loader_kwargs)
    with pytest.raises(ValueError, match='scatter_cap'):
        next(iter(small))


def test_caps_are_sticky_and_val_cache_normalised():
    """meta.cap must be MONOTONE NON-DECREASING within a loader (the step
    wrappers trace one program per cap value; a per-batch cap compiled a
    new program for every newly-composed batch — measured 2.5x e2e loss),
    and deterministic val caches must replay ONE cap from pass 2 on."""
    from tests.setup_and_params import _loader_kwargs
    from pointvs_tpu.data import get_data_loader
    dl = get_data_loader(batch_size=1, **_loader_kwargs)
    assert dl.dynamic_cap
    caps_pass1 = [meta.cap for _, meta in dl]
    assert len(caps_pass1) >= 2
    assert all(c is not None for c in caps_pass1)
    assert caps_pass1 == sorted(caps_pass1), 'caps must be monotone'
    # Cached second pass: every cap equals the pass-1 running max.
    caps_pass2 = [meta.cap for _, meta in dl]
    assert set(caps_pass2) == {max(caps_pass1)}
