"""E(3)-invariance gates at the reference tolerance (3e-5), ported from
test/test_invariance.py: sigmoid(model(G)) must match sigmoid(model(R G))
for a uniformly random rotation R, for both model families."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import (
    EGNN_EPS,
    MODEL_KWARGS,
    ORIGINAL_GRAPH,
    ROTATED_GRAPH,
)

np.random.seed(2)


def _sigmoid_output(name, graph, params=None, model=None):
    if model is None:
        model = build_model(name, **MODEL_KWARGS)
    if params is None:
        params = model.init(jax.random.PRNGKey(2), graph)
    out = model.apply(params, graph)
    return float(jax.nn.sigmoid(out[0, 0])), params, model


@pytest.mark.parametrize('name', ['egnn', 'lucid', 'multitask'])
def test_egnn_invariance(name):
    unrotated, params, model = _sigmoid_output(name, ORIGINAL_GRAPH)
    rotated, _, _ = _sigmoid_output(name, ROTATED_GRAPH, params, model)
    assert unrotated == pytest.approx(rotated, abs=EGNN_EPS)


@pytest.mark.parametrize('name', ['egnn', 'lucid'])
def test_egnn_translation_invariance(name):
    unrotated, params, model = _sigmoid_output(name, ORIGINAL_GRAPH)
    shifted = ORIGINAL_GRAPH._replace(
        coords=ORIGINAL_GRAPH.coords + np.float32([10.0, -3.0, 7.5]))
    translated, _, _ = _sigmoid_output(name, shifted, params, model)
    assert unrotated == pytest.approx(translated, abs=EGNN_EPS)
