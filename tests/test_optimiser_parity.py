"""Optimiser parity against torch: our optax chain (value-clip 1.0 ->
coupled L2 decay -> Adam / Nesterov-SGD -> -lr scaling) must reproduce
torch.optim trajectories update-for-update (the reference's exact
optimisers, point_neural_network_base.py:83-94, :421)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pointvs_tpu.training.optimisers import build_optimiser

np.random.seed(2)


def _trajectory_torch(optimiser, params0, grads, lr, wd):
    p = torch.nn.Parameter(torch.tensor(params0.copy()))
    if optimiser == 'adam':
        opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    else:
        opt = torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=wd,
                              nesterov=True)
    out = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_value_([p], 1.0)
        opt.step()
        out.append(p.detach().numpy().copy())
    return out


def _trajectory_ours(optimiser, params0, grads, lr, wd):
    tx = build_optimiser(optimiser, wd)
    params = jnp.array(params0)
    state = tx.init(params)
    out = []
    for g in grads:
        updates, state = tx.update(jnp.array(g), state, params)
        params = params + (-lr) * updates
        out.append(np.asarray(params).copy())
    return out


@pytest.mark.parametrize('optimiser', ['adam', 'sgd'])
def test_optimiser_matches_torch(optimiser):
    rng = np.random.RandomState(0)
    params0 = rng.randn(16).astype(np.float32)
    # include grads beyond the clip threshold to exercise value clipping
    grads = [(rng.randn(16) * 3).astype(np.float32) for _ in range(8)]
    lr, wd = 2e-3, 1e-4
    theirs = _trajectory_torch(optimiser, params0, grads, lr, wd)
    ours = _trajectory_ours(optimiser, params0, grads, lr, wd)
    for step, (a, b) in enumerate(zip(theirs, ours)):
        np.testing.assert_allclose(b, a, atol=2e-6,
                                   err_msg=f'step {step}')
