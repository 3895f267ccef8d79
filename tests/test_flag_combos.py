"""E(3)-invariance and determinism across the architecture-flag surface
(SURVEY.md section 7 'hard parts': gated_residual / rezero /
edge_residual / permutation_invariance / attention activation combos)."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import EGNN_EPS, MODEL_KWARGS, ORIGINAL_GRAPH, \
    ROTATED_GRAPH

np.random.seed(2)

COMBOS = {
    'rezero': {'rezero': True},
    'gated_residual': {'gated_residual': True},
    'edge_residual': {'edge_residual': True},
    'edge_and_rezero': {'edge_residual': True, 'rezero': True},
    'permutation_invariance': {'permutation_invariance': True},
    'tanh_attention': {'softmax_attention': False,
                       'attention_activation_fn': 'tanh'},
    'relu_attention': {'softmax_attention': False,
                       'attention_activation_fn': 'relu'},
    'static_coords': {'update_coords': False},
    'multi_fc_softplus': {'multi_fc': True, 'final_softplus': True},
    'strain_info': {'include_strain_info': True},
    'no_normalise': {'normalize': False},
}


@pytest.mark.parametrize('name', sorted(COMBOS))
def test_combo_invariance(name):
    kwargs = {**MODEL_KWARGS, **COMBOS[name]}
    model = build_model('egnn', **kwargs)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    first = float(jax.nn.sigmoid(
        model.apply(params, ORIGINAL_GRAPH)[0, 0]))
    rotated = float(jax.nn.sigmoid(
        model.apply(params, ROTATED_GRAPH)[0, 0]))
    assert first == pytest.approx(rotated, abs=EGNN_EPS), name
    # determinism
    again = float(jax.nn.sigmoid(
        model.apply(params, ORIGINAL_GRAPH)[0, 0]))
    assert again == pytest.approx(first, abs=EGNN_EPS)


@pytest.mark.parametrize('switch', [
    'edge_attention_first_only', 'edge_attention_final_only',
    'node_attention_first_only', 'node_attention_final_only'])
def test_multitask_attention_switches(switch):
    model = build_model('multitask', **{**MODEL_KWARGS, switch: True})
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    _, aux = model.apply(params, ORIGINAL_GRAPH, capture_aux=True)
    key = ('att_val' if switch.startswith('edge') else 'node_att_val')
    with_attention = [i for i, layer in enumerate(aux['layers'])
                      if key in layer]
    expected = [0] if 'first' in switch else [model.num_layers - 1]
    assert with_attention == expected
