"""Optimisers and LR schedules with the reference's exact semantics.

- Adam with *coupled* L2 weight decay (torch.optim.Adam adds wd*param to the
  gradient before the moment updates — NOT AdamW), ref
  point_neural_network_base.py:83-86.
- SGD momentum 0.9 + Nesterov (ref :87-92).
- Gradient *value* clipping at 1.0 applied to raw grads before the optimiser
  sees them (torch clip_grad_value_, ref :421).
- 1cycle (torch OneCycleLR defaults: cos anneal, pct_start 0.3, div_factor
  25, final_div_factor 1e4) over epochs*len(dl) steps (ref :374-377).
- Cosine annealing with warm restarts, T_0 = len(dl), T_mult 1, eta_min 0
  (one restart per epoch, ref :378-380).

The learning rate is passed into the train step as a scalar each step
(computed host-side from the schedule) so switching tasks mid-run can swap
schedules without recompiling, exactly like torch scheduler.step().
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import optax


def build_optimiser(optimiser: str = 'adam',
                    weight_decay: Optional[float] = 1e-4
                    ) -> optax.GradientTransformation:
    """Gradient transformation WITHOUT the lr scaling (applied by caller)."""
    weight_decay = weight_decay or 0.0
    if optimiser == 'adam':
        return optax.chain(
            optax.clip(1.0),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if optimiser == 'sgd':
        return optax.chain(
            optax.clip(1.0),
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=0.9, nesterov=True),
        )
    raise NotImplementedError(f'{optimiser} not recognised optimiser.')


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                div_factor: float = 25.0, final_div_factor: float = 1e4
                ) -> Callable[[int], float]:
    """torch OneCycleLR (anneal_strategy='cos') as a step -> lr function."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up_steps = max(1, int(pct_start * total_steps) - 1)
    down_steps = max(1, total_steps - up_steps - 1)

    def schedule(step: int) -> float:
        step = min(step, total_steps - 1)
        if step <= up_steps:
            frac = step / up_steps
            return initial + (max_lr - initial) * 0.5 * (
                1 - math.cos(math.pi * frac))
        frac = (step - up_steps) / down_steps
        return final + (max_lr - final) * 0.5 * (
            1 + math.cos(math.pi * frac))

    return schedule


def cosine_warm_restarts_lr(base_lr: float, t_0: int, eta_min: float = 0.0
                            ) -> Callable[[int], float]:
    """torch CosineAnnealingWarmRestarts with T_mult=1."""
    t_0 = max(1, t_0)

    def schedule(step: int) -> float:
        t_cur = step % t_0
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + math.cos(math.pi * t_cur / t_0))

    return schedule


def constant_lr(lr: float) -> Callable[[int], float]:
    return lambda step: lr


def make_lr_schedule(lr: float, steps_per_epoch: int, epochs: int,
                     use_1cycle: bool = False, warm_restarts: bool = False
                     ) -> Callable[[int], float]:
    assert not (use_1cycle and warm_restarts), \
        '1cycle and warm restarts are mutually exclusive'
    if use_1cycle:
        return onecycle_lr(lr, max(1, epochs * steps_per_epoch))
    if warm_restarts:
        return cosine_warm_restarts_lr(lr, steps_per_epoch)
    return constant_lr(lr)
