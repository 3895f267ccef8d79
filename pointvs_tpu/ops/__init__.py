"""Device-side graph kernels: masked segment ops, graph normalisation and
(optionally) fused Pallas message-passing.

These replace the reference's torch_scatter / pyg native kernels
(SURVEY.md section 2.9) with XLA segment primitives that are safe under the
static-shape padding conventions of ``pointvs_tpu.data.buckets``.
"""
from pointvs_tpu.ops.segment import (
    masked_segment_sum,
    masked_segment_mean,
    masked_segment_softmax,
    masked_graph_mean_pool,
    gather_nodes,
)
from pointvs_tpu.ops.graphnorm import GraphNorm
