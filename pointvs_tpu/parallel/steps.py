"""SPMD train and eval steps: shard_map over a ('dp',) mesh.

One code path from 1 chip to a pod slice: the loader stacks per-device
sub-batches along a leading axis [D, ...]; inside shard_map each device
sees its own shard, computes grads of the *local loss sum*, psums grads and
weights over ICI, and applies the optimiser to the global-mean gradient.
Dividing psum(sum)/psum(weight) (rather than pmean of local means) keeps the
loss exact when real-graph counts differ across devices due to padding.

The learning rate enters as a traced scalar each step so host-side
schedules (1cycle / warm restarts) never trigger recompiles.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pointvs_tpu.training.losses import loss_fn


def _squeeze_leading(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _as_graph_batch(batch):
    """Accept either a full GraphBatch or a compact WireBatch/V2/V3."""
    from pointvs_tpu.data.wire import (WireBatch, WireBatchV2, WireBatchV3,
                                       decompress)
    if isinstance(batch, (WireBatch, WireBatchV2, WireBatchV3)):
        return decompress(batch)
    return batch


def _pad_shapes(tree):
    """(n_pad, e_pad) from a batch or wire template — shape metadata
    only, so this never touches device buffers. Works for GraphBatch and
    all wire formats, stacked ([D, ...]) or not."""
    from pointvs_tpu.data.wire import WireBatchV2, WireBatchV3
    n_pad = tree.coords.shape[-2]
    if isinstance(tree, WireBatchV2):
        e_pad = tree.recv_delta.shape[-1]
    elif isinstance(tree, WireBatchV3):
        e_pad = 2 * tree.half_senders.shape[-1]
    else:
        e_pad = tree.senders.shape[-1]
    return n_pad, e_pad


def make_train_step(model, tx, model_task: str, regression_loss: str,
                    mesh: Mesh, axis_name: str = 'dp',
                    multitask: bool = False,
                    with_metrics: bool = False) -> Callable:
    """Returns step(params, opt_state, batch, lr, rng) ->
    (params, opt_state, loss).

    `batch` is either a [D, ...]-stacked GraphBatch/WireBatch pytree, or a
    packed single-buffer tuple ('packed', uint8[D, nbytes], template) from
    data/wire.pack_stacked — one H2D transfer per step instead of one per
    array (round trips dominate on tunneled backends).

    With ``with_metrics`` the loss output becomes a [5]-vector
    ``[loss, active_pred_sum, active_count, decoy_pred_sum, decoy_count]``
    so the engine can log the reference's per-batch mean active/decoy
    training predictions (ref point_neural_network_base.py:387-415) from
    the same deferred D2H fetch as the loss.
    """

    apply_kwargs = {'task': model_task} if multitask else {}

    def local_loss(params, batch, rng):
        logits = model.apply(params, batch, train=True,
                             rngs={'dropout': rng}, **apply_kwargs)
        s, w = loss_fn(logits, batch, model_task, regression_loss)
        return s, (w, logits)

    def _pred_metrics(logits, batch):
        """Per-device sums for mean active/decoy train predictions."""
        mask = batch.graph_mask.reshape(-1)
        if model_task == 'classification':
            preds = jax.nn.sigmoid(logits.reshape(-1))
            y = batch.y.reshape(-1)
            act = (y > 0.5).astype(preds.dtype) * mask
            dec = (y < 0.5).astype(preds.dtype) * mask
        else:
            # Reference logs sigmoid'd mean prediction over labelled rows
            # for regression tasks too (ref :388-409, is_label branch).
            preds = jax.nn.sigmoid(logits.reshape(mask.shape[0], -1)
                                   ).mean(axis=-1)
            act = mask
            dec = jnp.zeros_like(mask)
        return jnp.stack([jnp.sum(preds * act), jnp.sum(act),
                          jnp.sum(preds * dec), jnp.sum(dec)])

    def device_step_core(params, opt_state, batch, lr, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        (loss_sum, (weight, logits)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, batch, rng)
        grads = jax.lax.psum(grads, axis_name)
        loss_sum = jax.lax.psum(loss_sum, axis_name)
        weight = jnp.maximum(jax.lax.psum(weight, axis_name), 1.0)
        grads = jax.tree.map(lambda g: g / weight, grads)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        loss = loss_sum / weight
        if with_metrics:
            metrics = jax.lax.psum(_pred_metrics(logits, batch), axis_name)
            loss = jnp.concatenate([loss[None], metrics])
        return params, opt_state, loss

    def device_step(params, opt_state, batch, lr, rng):
        batch = _as_graph_batch(_squeeze_leading(batch))
        return device_step_core(params, opt_state, batch, lr, rng)

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)

    # One jit object per scatter capacity: the per-batch capacity (see
    # ops.sorted_segment.edge_capacity_override) changes the traced
    # program, so each cap value needs its own trace cache. cap=None is
    # the legacy shape-derived capacity.
    pytree_cache = {}

    def pytree_step_for(cap):
        if cap not in pytree_cache:
            pytree_cache[cap] = jax.jit(sharded, donate_argnums=(0, 1))
        return pytree_cache[cap]

    packed_cache = {}

    def packed_step_for(template, symmetric, cap):
        key = (type(template).__name__, symmetric, cap) + tuple(
            (tuple(a.shape), str(a.dtype)) for a in template)
        if key not in packed_cache:
            from pointvs_tpu.data.wire import decompress, unpack

            def device_step_packed(params, opt_state, buf, lr, rng):
                wire = unpack(buf[0], template)
                batch = decompress(wire, symmetric)
                return device_step_core(params, opt_state, batch, lr, rng)

            sharded_p = shard_map(
                device_step_packed, mesh=mesh,
                in_specs=(P(), P(), P(axis_name), P(), P()),
                out_specs=(P(), P(), P()),
                check_rep=False)
            packed_cache[key] = jax.jit(sharded_p, donate_argnums=(0, 1))
        return packed_cache[key]

    ids_cache = {}

    def ids_step_for(spec, cap):
        key = (spec, cap)
        if key not in ids_cache:
            from pointvs_tpu.data.device_dataset import (collate_from_ids,
                                                         rotate_per_graph)

            def device_step_ids(params, opt_state, store, ids, lr, rng):
                batch = collate_from_ids(store, ids[0], spec)
                if spec.rotate:
                    # Rotation keys derive from (step rng, item id) —
                    # layout-invariant, so DP parity holds (see
                    # device_dataset.random_rotations).
                    rot_key = jax.random.fold_in(rng, 0x526f7461)
                    batch = rotate_per_graph(batch, rot_key, ids[0],
                                             spec.num_graphs)
                return device_step_core(params, opt_state, batch, lr, rng)

            sharded_i = shard_map(
                device_step_ids, mesh=mesh,
                in_specs=(P(), P(), P(), P(axis_name), P(), P()),
                out_specs=(P(), P(), P()),
                check_rep=False)
            ids_cache[key] = jax.jit(sharded_i, donate_argnums=(0, 1))
        return ids_cache[key]

    from pointvs_tpu.ops.sorted_segment import edge_capacity_override

    def step(params, opt_state, batch, lr, rng, cap=None):
        # NB type(), not isinstance(): GraphBatch is a NamedTuple.
        if type(batch) is tuple and batch[0] == 'ids':
            # Device-resident dataset: collate ON device from item ids
            # (data/device_dataset.py) — the per-step H2D is ~128 bytes.
            _, ids_dev, store, spec = batch
            with edge_capacity_override(spec.n_pad, spec.e_pad, cap):
                return ids_step_for(spec, cap)(
                    params, opt_state, store, ids_dev, lr, rng)
        if type(batch) is tuple and batch[0] == 'packed':
            _, buf, template, *sym = batch
            shapes = _pad_shapes(template) if cap is not None else (0, 0)
            with edge_capacity_override(*shapes, cap):
                return packed_step_for(template, bool(sym and sym[0]),
                                       cap)(params, opt_state, buf, lr, rng)
        # cap=None covers non-graph layouts (dense/siamese) too — their
        # batches have no senders/coords fields to read shapes from.
        shapes = _pad_shapes(batch) if cap is not None else (0, 0)
        with edge_capacity_override(*shapes, cap):
            return pytree_step_for(cap)(params, opt_state, batch, lr, rng)

    return step


def make_eval_step(model, model_task: Optional[str], mesh: Mesh,
                   axis_name: str = 'dp', multitask: bool = False,
                   use_fused: bool = False) -> Callable:
    """Returns jitted step(params, batch[D,...]) -> logits [D, B/D, out].

    Inference goes through the fused Pallas engine when the model/shape
    supports it (pointvs_tpu/inference_engine.py), falling back to
    model.apply otherwise. (Attribution paths that need aux outputs call
    model.apply directly on a single device instead — aux leaves have
    node/edge-shaped axes that do not gather usefully across shards.)
    """

    apply_kwargs = {'task': model_task} if (multitask and model_task) else {}
    # The fused Pallas engine USED to win 1.5x at >=6 layers; after the
    # round-2 per-layer op fusion in the module forward (packed gathers +
    # single aggregation scatter + folded softmax), the module path is
    # honestly 1.3-2x FASTER at every measured shape (12L softmax: 996 vs
    # 766 poses/s; sigmoid: 2012 vs 995), so it is now the default.
    # use_fused=True keeps the engine reachable for A/B.
    from pointvs_tpu.inference_engine import supports_fusion
    fuse = (use_fused and getattr(model, 'num_layers', 0) >= 6
            and supports_fusion(model))

    def eval_core(params, batch):
        if fuse and jax.default_backend() == 'tpu':
            from pointvs_tpu.inference_engine import fused_forward
            out = fused_forward(model, params, batch, task=model_task)
        else:
            out = model.apply(params, batch, train=False, **apply_kwargs)
        return out[None]

    def device_eval(params, batch):
        return eval_core(params, _as_graph_batch(_squeeze_leading(batch)))

    sharded = shard_map(
        device_eval, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False)
    pytree_cache = {}

    def pytree_eval_for(cap):
        if cap not in pytree_cache:
            pytree_cache[cap] = jax.jit(sharded)
        return pytree_cache[cap]

    packed_cache = {}

    def packed_eval_for(template, symmetric, cap):
        key = (type(template).__name__, symmetric, cap) + tuple(
            (tuple(a.shape), str(a.dtype)) for a in template)
        if key not in packed_cache:
            from pointvs_tpu.data.wire import decompress, unpack

            def device_eval_packed(params, buf):
                return eval_core(params, decompress(
                    unpack(buf[0], template), symmetric))

            sharded_p = shard_map(
                device_eval_packed, mesh=mesh,
                in_specs=(P(), P(axis_name)),
                out_specs=P(axis_name),
                check_rep=False)
            packed_cache[key] = jax.jit(sharded_p)
        return packed_cache[key]

    ids_cache = {}

    def ids_eval_for(spec, cap):
        key = (spec, cap)
        if key not in ids_cache:
            from pointvs_tpu.data.device_dataset import collate_from_ids

            def device_eval_ids(params, store, ids):
                # No rotation at eval (matches host loaders: val datasets
                # run rot=False; spec.rotate only drives the train step).
                return eval_core(params, collate_from_ids(store, ids[0],
                                                          spec))

            sharded_i = shard_map(
                device_eval_ids, mesh=mesh,
                in_specs=(P(), P(), P(axis_name)),
                out_specs=P(axis_name),
                check_rep=False)
            ids_cache[key] = jax.jit(sharded_i)
        return ids_cache[key]

    from pointvs_tpu.ops.sorted_segment import edge_capacity_override

    def step(params, batch, cap=None):
        # NB type(), not isinstance(): GraphBatch is a NamedTuple.
        if type(batch) is tuple and batch[0] == 'ids':
            _, ids_dev, store, spec = batch
            with edge_capacity_override(spec.n_pad, spec.e_pad, cap):
                return ids_eval_for(spec, cap)(params, store, ids_dev)
        if type(batch) is tuple and batch[0] == 'packed':
            _, buf, template, *sym = batch
            shapes = _pad_shapes(template) if cap is not None else (0, 0)
            with edge_capacity_override(*shapes, cap):
                return packed_eval_for(template, bool(sym and sym[0]),
                                       cap)(params, buf)
        shapes = _pad_shapes(batch) if cap is not None else (0, 0)
        with edge_capacity_override(*shapes, cap):
            return pytree_eval_for(cap)(params, batch)

    return step


def make_scan_eval_step(model, model_task: Optional[str], mesh: Mesh,
                        axis_name: str = 'dp', multitask: bool = False,
                        unroll: int = 1) -> Callable:
    """Returns jitted step(params, mega[G, D, nbytes], template) ->
    logits [G, D, B/D, out]: a GROUP of packed batches scored by ONE
    compiled program (lax.scan over the group axis).

    On tunneled remote backends every separate executable invocation
    pays a scheduling round trip that can dwarf the ~30 ms of device
    compute (the screening loop measured ~1 s of overhead per batch
    while the device sat >95% idle); scanning G batches inside one
    program amortises that G-fold. All group members must share one
    wire template — pointvs_tpu/screen.py guarantees this by pinning a
    single padding bucket for the whole library.

    ``unroll <= 0`` means FULL unroll (the group length). This is the
    default via screen.py: a rolled scan body costs ~18 s per execution
    on the tunneled backend (measured at G=8, 6L/80k-edge batches —
    the same rolled-scan pathology as round 1's layer scan) where the
    fully unrolled program runs the same group in ~2.6 s.
    """
    apply_kwargs = {'task': model_task} if (multitask and model_task) else {}

    def eval_core(params, batch):
        return model.apply(params, batch, train=False, **apply_kwargs)[None]

    cache = {}

    from pointvs_tpu.ops.sorted_segment import edge_capacity_override

    def step(params, mega, template, symmetric=False, cap=None):
        from pointvs_tpu.data.wire import decompress, unpack
        key = (tuple(mega.shape), type(template).__name__, symmetric, cap) \
            + tuple((tuple(a.shape), str(a.dtype)) for a in template)
        if key not in cache:
            def device_scan(params, mega_shard):     # [G, 1, nbytes]
                def body(carry, buf):                # buf [1, nbytes]
                    return carry, eval_core(
                        params, decompress(unpack(buf[0], template),
                                           symmetric))
                _, outs = jax.lax.scan(
                    body, None, mega_shard,
                    unroll=unroll if unroll > 0 else mega.shape[0])
                return outs                          # [G, 1, B, out]

            sharded = shard_map(
                device_scan, mesh=mesh,
                in_specs=(P(), P(None, axis_name)),
                out_specs=P(None, axis_name),
                check_rep=False)
            cache[key] = jax.jit(sharded)
        shapes = _pad_shapes(template) if cap is not None else (0, 0)
        with edge_capacity_override(*shapes, cap):
            return cache[key](params, mega)

    return step
