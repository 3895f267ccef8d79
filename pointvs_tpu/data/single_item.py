"""Wrap one graph as a batch of 1 for inference/attribution.

Ref parity: point_vs/preprocessing/pyg_single_item_dataset.py.
"""
from __future__ import annotations

import numpy as np

from pointvs_tpu.data.buckets import GraphBatch, GraphSample, \
    pad_graphs_to_batch


def get_single_graph_for_inference(sample: GraphSample,
                                   n_pad=None, e_pad=None) -> GraphBatch:
    """Pad a single GraphSample into a batch-of-1 GraphBatch."""
    return pad_graphs_to_batch([sample], num_graphs=1,
                               n_pad=n_pad, e_pad=e_pad)


def graph_batch_from_arrays(node_feats, coords, senders, receivers,
                            edge_attr, y=None, n_pad=None,
                            e_pad=None) -> GraphBatch:
    """Convenience constructor from raw arrays (attribution tooling)."""
    sample = GraphSample(
        node_feats=np.asarray(node_feats, np.float32),
        coords=np.asarray(coords, np.float32),
        senders=np.asarray(senders, np.int32),
        receivers=np.asarray(receivers, np.int32),
        edge_attr=np.asarray(edge_attr, np.float32),
        y=np.float32(0.0) if y is None else np.asarray(y, np.float32))
    return get_single_graph_for_inference(sample, n_pad=n_pad, e_pad=e_pad)
