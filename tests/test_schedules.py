"""LR schedule parity against torch's OneCycleLR /
CosineAnnealingWarmRestarts (the reference's exact schedulers,
point_neural_network_base.py:372-385)."""
import numpy as np
import pytest
import torch

from pointvs_tpu.training.optimisers import (
    cosine_warm_restarts_lr,
    onecycle_lr,
)


def test_onecycle_matches_torch():
    lr, total = 8e-4, 200
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=total)
    ours = onecycle_lr(lr, total)
    for step in range(total - 1):
        expected = sched.get_last_lr()[0]
        assert ours(step) == pytest.approx(expected, rel=1e-4), step
        opt.step()
        sched.step()


def test_warm_restarts_matches_torch():
    lr, t0 = 2e-3, 40
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=1, eta_min=0)
    ours = cosine_warm_restarts_lr(lr, t0)
    for step in range(3 * t0):
        expected = sched.get_last_lr()[0]
        assert ours(step) == pytest.approx(expected, rel=1e-5), step
        opt.step()
        sched.step()
