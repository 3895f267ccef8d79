"""Training/eval engine (reference counterpart:
point_vs/models/point_neural_network_base.py)."""
from pointvs_tpu.training.engine import Trainer
from pointvs_tpu.training.losses import loss_fn
from pointvs_tpu.training.optimisers import (
    build_optimiser,
    make_lr_schedule,
)
