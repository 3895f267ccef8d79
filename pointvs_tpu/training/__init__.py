"""Training/eval engine (reference counterpart:
point_vs/models/point_neural_network_base.py)."""
from pointvs_tpu.training.losses import loss_fn
from pointvs_tpu.training.optimisers import build_optimiser, make_lr_schedule


def __getattr__(name):
    # Lazy: engine pulls in parallel.steps, which imports training.losses —
    # importing it eagerly here would be a cycle.
    if name == 'Trainer':
        from pointvs_tpu.training.engine import Trainer
        return Trainer
    raise AttributeError(name)
