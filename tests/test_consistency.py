"""Determinism gates (ported from test/test_consistency.py): repeated
forwards agree to 3e-5 and the output is not trivially zero."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import (
    EGNN_EPS,
    MODEL_KWARGS,
    N_SAMPLES,
    ORIGINAL_GRAPH,
)

np.random.seed(2)


@pytest.mark.parametrize('name', ['egnn', 'lucid'])
def test_consistency(name):
    model = build_model(name, **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    apply = jax.jit(lambda p, g: model.apply(p, g))
    first = float(jax.nn.sigmoid(apply(params, ORIGINAL_GRAPH)[0, 0]))
    assert first != pytest.approx(0, abs=1e-5)
    for _ in range(N_SAMPLES):
        again = float(jax.nn.sigmoid(apply(params, ORIGINAL_GRAPH)[0, 0]))
        assert again == pytest.approx(first, abs=EGNN_EPS)
