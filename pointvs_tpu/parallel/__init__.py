"""Device-mesh utilities and SPMD train/eval steps.

This subsystem is new relative to the reference (which was single-process,
single-device; SURVEY.md section 2.9): data parallelism runs over an ICI
mesh via ``shard_map`` with explicit psums, scaling from 1 chip to a pod
slice without code changes. Host CPUs with
``--xla_force_host_platform_device_count`` exercise the same code path in
tests.
"""
from pointvs_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
)
from pointvs_tpu.parallel.steps import (
    make_eval_step,
    make_train_step,
)
