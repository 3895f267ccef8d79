"""Native (C++) host-side components.

The TPU compute path is JAX/XLA; the runtime around it uses native code
where the work is host-bound: graph construction for the data loader
(graphops.cpp). Modules here compile lazily with the system toolchain and
degrade gracefully to the numpy implementations when no compiler is
available.
"""
from pointvs_tpu.native.build import get_graphops, HAVE_COMPILER
