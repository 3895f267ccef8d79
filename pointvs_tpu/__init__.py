"""PointVS-TPU: a TPU-native JAX/XLA/Pallas framework for SE(3)-equivariant
point-cloud virtual screening.

A from-scratch rebuild of the capabilities of jscant/PointVS (reference at
/root/reference) designed TPU-first:

- EGNN message passing over *statically shaped*, bucketed graph batches so
  XLA compiles once per bucket and the MXU sees large fused matmuls.
- Masked segment ops (sum / mean / softmax) replace torch_scatter.
- Data parallelism over an ICI device mesh via ``shard_map`` + ``psum``
  instead of any host-side distributed backend.
- Host-side data pipeline (parquet -> pocket box -> radius graph ->
  bit-vector featurisation) in numpy/pandas, with on-disk graph caching and
  background prefetch so a single host core can keep the chip fed.

Layout (mirrors the reference layer map, SURVEY.md section 1):

- ``pointvs_tpu.data``      -- data pipeline (ref: point_vs/preprocessing/*)
- ``pointvs_tpu.models``    -- model zoo      (ref: point_vs/models/geometric/*)
- ``pointvs_tpu.ops``       -- segment/graph kernels incl. Pallas
- ``pointvs_tpu.parallel``  -- mesh/sharding utilities (new, TPU-native)
- ``pointvs_tpu.training``  -- train/eval engine (ref: point_neural_network_base.py)
- ``pointvs_tpu.analysis``  -- metrics + pose ranking (ref: point_vs/analysis/*)
- ``pointvs_tpu.attribution`` -- model explanation (ref: point_vs/attribution/*)
- ``pointvs_tpu.dataset_generation`` -- offline dataset tooling
"""

__version__ = "0.1.0"
