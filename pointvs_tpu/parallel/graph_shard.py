"""Graph-sharded (edge-parallel) inference for very large complexes.

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


def shard_graph_batch(sample: GraphSample, num_devices: int) -> GraphBatch:
    """One GraphSample -> GraphBatch whose edge arrays are [D, E/D, ...]
    shards (each internally sender-sorted with a local recv_perm) and
    whose node/graph arrays are [D, ...] replicated copies."""
    base = pad_graphs_to_batch([sample], num_graphs=1)
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
        shards.append(base._replace(
            senders=senders, receivers=receivers, edge_attr=edge_attr,
            edge_mask=edge_mask, recv_perm=recv_perm))
    return GraphBatch(*[np.stack(arrs) for arrs in zip(*shards)])


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
