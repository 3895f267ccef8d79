"""Graph-sharded (edge-parallel) inference and training for very large
complexes.

The context/sequence-parallelism analogue for graphs (SURVEY.md section
5.7): one graph's edge list is split across the mesh; node arrays are
replicated; every segment aggregation psums partial per-node sums over
ICI. Node-wise compute (MLPs on [N, K]) is replicated — nodes are ~10x
fewer than edges in radius graphs, so the savings concentrate where the
work is.

Use case: scoring complexes whose edge tensors exceed one device's memory,
or cutting latency for single very large graphs. Batched screening should
use ordinary data parallelism instead.
"""
from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pointvs_tpu.data.buckets import GraphBatch, GraphSample, \
    pad_graphs_to_batch


def shard_graph_batch(samples, num_devices: int, num_graphs=None,
                      n_pad=None, e_pad=None) -> GraphBatch:
    """GraphSample(s) -> GraphBatch whose edge arrays are [D, E/D, ...]
    shards (each internally sender-sorted with a local recv_perm) and
    whose node/graph arrays are [D, ...] replicated copies.

    Accepts one sample (the original huge-complex use) or a list (the CLI
    training path: a whole per-dp-row sub-batch edge-sharded over gp)."""
    if isinstance(samples, GraphSample):
        samples = [samples]
    base = pad_graphs_to_batch(samples, num_graphs=num_graphs,
                               n_pad=n_pad, e_pad=e_pad)
    e_pad = base.num_edges
    per_dev = -(-e_pad // num_devices)

    shards = []
    for d in range(num_devices):
        lo, hi = d * per_dev, min((d + 1) * per_dev, e_pad)
        senders = np.full((per_dev,), base.num_nodes, np.int32)
        receivers = np.full((per_dev,), base.num_nodes, np.int32)
        edge_attr = np.zeros((per_dev,) + base.edge_attr.shape[1:],
                             np.float32)
        edge_mask = np.zeros((per_dev,), np.float32)
        n = hi - lo
        if n > 0:
            senders[:n] = base.senders[lo:hi]
            receivers[:n] = base.receivers[lo:hi]
            edge_attr[:n] = base.edge_attr[lo:hi]
            edge_mask[:n] = base.edge_mask[lo:hi]
        # senders stay sorted (slices of a sorted array); local recv perm
        recv_perm = np.argsort(receivers, kind='stable').astype(np.int32)
        # inv_recv_perm dropped: edge shards are not symmetric (the pair
        # of a shard-local edge may live on another shard), and the
        # aggregator ignores the fast path when edge-sharded anyway.
        shards.append(base._replace(
            senders=senders, receivers=receivers, edge_attr=edge_attr,
            edge_mask=edge_mask, recv_perm=recv_perm,
            inv_recv_perm=None))
    return GraphBatch(*[None if arrs[0] is None else np.stack(arrs)
                        for arrs in zip(*shards)])


def make_sharded_forward(model, mesh: Mesh, axis_name: str = 'gp',
                         **apply_kwargs) -> Callable:
    """jitted (params, sharded_batch) -> logits, with the model's
    aggregations psumming over ``axis_name``.

    The model must be constructed with ``edge_shard_axis=axis_name``.
    """

    def device_forward(params, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        out = model.apply(params, batch, **apply_kwargs)
        return out[None]

    sharded = shard_map(
        device_forward, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False)

    def forward(params, batch):
        # node aggregations are psummed, so every shard's output is the
        # full-graph result; return the first.
        return jax.tree.map(lambda x: x[0], sharded(params, batch))

    return jax.jit(forward)


def init_sharded_params(model, sample: GraphSample, rng):
    """Initialise params for an edge-sharded model.

    ``model.init`` can't run the sharded forward directly — its psums
    reference a mesh axis that is only bound inside shard_map — so init
    runs on an unsharded clone over the full (unsplit) graph. Parameter
    shapes are independent of the edge sharding, so the result is valid
    for the sharded model.
    """
    unsharded = model.clone(edge_shard_axis=None)
    batch = pad_graphs_to_batch([sample], num_graphs=1)
    return jax.jit(unsharded.init)(rng, batch)


def make_sharded_train_step(model, tx, model_task: str,
                            regression_loss: str, mesh: Mesh,
                            axis_name: str = 'gp') -> Callable:
    """Edge-parallel training: jitted step(params, opt_state, batch, lr,
    rng) -> (params, opt_state, loss) for ONE graph whose edge arrays are
    sharded over ``axis_name`` (node arrays replicated, as produced by
    shard_graph_batch).

    Gradient correctness under shard_map(check_rep=False): every
    aggregation in the forward is psum(partial_d), and psum transposes to
    psum, so each device's raw grad is D * (its partial edge-path grad)
    while node-path grads come out replicated (= the full grad). pmean
    over the axis therefore recovers the exact full-graph gradient for
    BOTH kinds of parameter — pinned numerically against the
    single-device jax.grad by tests/test_graph_shard.py.

    The model must be constructed with ``edge_shard_axis=axis_name``.
    """
    import jax.numpy as jnp

    from pointvs_tpu.training.losses import loss_fn

    def device_step(params, opt_state, batch, lr, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        # Per-edge dropout must differ per shard: fold in the device index.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def sum_loss(p):
            logits = model.apply(p, batch, train=True,
                                 rngs={'dropout': rng})
            return loss_fn(logits, batch, model_task, regression_loss)

        (loss_sum, weight), grads = jax.value_and_grad(
            sum_loss, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis_name)
        # loss_sum/weight are computed from post-psum (replicated) logits
        # and replicated labels, so they're already the full-graph values.
        weight = jnp.maximum(weight, 1.0)
        grads = jax.tree.map(lambda g: g / weight, grads)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_sum / weight

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1))


def stack_2d_batches(rows, n_gp: int, num_graphs=None, n_pad=None,
                     e_pad=None):
    """len(rows) == n_dp GraphSamples (or lists of GraphSamples) ->
    GraphBatch pytree of [n_dp, n_gp, ...] arrays: one (sub-)batch per dp
    row, its edges split over the gp columns (node arrays replicated
    along gp). Pass num_graphs/n_pad/e_pad so every row pads to the same
    static shape (required for the stack)."""
    per_dp = [shard_graph_batch(r, n_gp, num_graphs=num_graphs,
                                n_pad=n_pad, e_pad=e_pad) for r in rows]
    return jax.tree.map(lambda *xs: np.stack(xs), *per_dp)


def make_eval_step_2d(model, model_task, mesh: Mesh, dp_axis: str = 'dp',
                      gp_axis: str = 'gp',
                      multitask: bool = False) -> Callable:
    """Eval over the (dp x gp) mesh: jitted (params, batch[dp, gp, ...])
    -> logits [dp, B_row, out]. Each dp row scores its own sub-batch with
    edges split over gp; the model's aggregation psums make every gp
    column's logits the full-graph values, so the gp axis is dropped from
    the output (check_rep=False: replication is guaranteed by the psum
    algebra, pinned by tests/test_graph_shard.py).

    The model must be constructed with ``edge_shard_axis=gp_axis``.
    """
    apply_kwargs = {'task': model_task} if (multitask and model_task) else {}

    def device_eval(params, batch):
        batch = jax.tree.map(lambda x: x[0, 0], batch)
        out = model.apply(params, batch, train=False, **apply_kwargs)
        return out[None]

    sharded = shard_map(
        device_eval, mesh=mesh,
        in_specs=(P(), P(dp_axis, gp_axis)),
        out_specs=P(dp_axis),
        check_rep=False)
    return jax.jit(sharded)


def make_train_step_2d(model, tx, model_task: str, regression_loss: str,
                       mesh: Mesh, dp_axis: str = 'dp',
                       gp_axis: str = 'gp',
                       multitask: bool = False) -> Callable:
    """Combined data-parallel x edge-parallel training over a 2-D mesh
    (mesh.get_mesh_2d): each dp row trains on its own graph, whose edges
    are split over the gp columns.

    Gradient flow: pmean over gp recovers each row's exact full-graph
    gradient (see make_sharded_train_step); the rows then combine with
    the same psum(loss_sum)/psum(weight) scheme as the 1-D DP step, so
    results are bitwise-comparable to DP-only training on the same
    graphs.

    The model must be constructed with ``edge_shard_axis=gp_axis``.
    """
    import jax.numpy as jnp

    from pointvs_tpu.training.losses import loss_fn

    apply_kwargs = {'task': model_task} if multitask else {}

    def device_step(params, opt_state, batch, lr, rng):
        batch = jax.tree.map(lambda x: x[0, 0], batch)
        # One dropout stream per dp row, IDENTICAL across gp columns:
        # node arrays are replicated over gp, so per-column masks would
        # desynchronise the replicated node state that the psums assume.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(dp_axis))

        def sum_loss(p):
            logits = model.apply(p, batch, train=True,
                                 rngs={'dropout': rng}, **apply_kwargs)
            return loss_fn(logits, batch, model_task, regression_loss)

        (loss_sum, weight), grads = jax.value_and_grad(
            sum_loss, has_aux=True)(params)
        grads = jax.lax.pmean(grads, gp_axis)
        grads = jax.lax.psum(grads, dp_axis)
        loss_sum = jax.lax.psum(loss_sum, dp_axis)
        weight = jnp.maximum(jax.lax.psum(weight, dp_axis), 1.0)
        grads = jax.tree.map(lambda g: g / weight, grads)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_sum / weight

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), P(dp_axis, gp_axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1))
