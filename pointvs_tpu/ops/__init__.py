"""Device-side graph kernels: masked segment ops, graph normalisation and
MXU windowed-scatter aggregation.

These replace the reference's torch_scatter / pyg native kernels
(SURVEY.md section 2.9). Imports are lazy: the host data pipeline imports
this package for shape arithmetic (sorted_segment.derive_max_eb) and must
not drag flax/jax into loader worker startup.
"""

_LAZY = {
    'masked_segment_sum': 'pointvs_tpu.ops.segment',
    'masked_segment_mean': 'pointvs_tpu.ops.segment',
    'masked_segment_softmax': 'pointvs_tpu.ops.segment',
    'masked_graph_mean_pool': 'pointvs_tpu.ops.segment',
    'gather_nodes': 'pointvs_tpu.ops.segment',
    'GraphNorm': 'pointvs_tpu.ops.graphnorm',
    'EdgeAggregator': 'pointvs_tpu.ops.aggregate',
    'windowed_segment_sum': 'pointvs_tpu.ops.sorted_segment',
    'windowed_segment_max': 'pointvs_tpu.ops.sorted_segment',
    'gather_by_sorted_ids': 'pointvs_tpu.ops.sorted_segment',
    'dense_graph_segment_sum': 'pointvs_tpu.ops.sorted_segment',
    'derive_max_eb': 'pointvs_tpu.ops.sorted_segment',
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(name)
