"""E(n)-transformer family gates: invariance, determinism, attention
normalisation, end-to-end trainability via the CLI."""
import jax
import numpy as np
import pytest

from pointvs_tpu.models import build_model

from .setup_and_params import (
    EGNN_EPS,
    ORIGINAL_GRAPH,
    ORIGINAL_GRAPH_TWO_ITEMS,
    ROTATED_GRAPH,
)

np.random.seed(2)

KWARGS = {'dim_input': 12, 'k': 32, 'dim_output': 1, 'num_layers': 4,
          'heads': 4}


def test_en_transformer_invariance():
    model = build_model('en_transformer', **KWARGS)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    first = float(jax.nn.sigmoid(model.apply(params, ORIGINAL_GRAPH)[0, 0]))
    rotated = float(jax.nn.sigmoid(model.apply(params, ROTATED_GRAPH)[0, 0]))
    assert first == pytest.approx(rotated, abs=EGNN_EPS)
    translated = ORIGINAL_GRAPH._replace(
        coords=ORIGINAL_GRAPH.coords + np.float32([5.0, -2.0, 9.0]))
    shifted = float(jax.nn.sigmoid(model.apply(params, translated)[0, 0]))
    assert first == pytest.approx(shifted, abs=EGNN_EPS)


def test_en_transformer_attention_normalised():
    graph = ORIGINAL_GRAPH_TWO_ITEMS
    model = build_model('en_transformer', **KWARGS)
    params = model.init(jax.random.PRNGKey(2), graph)
    _, aux = model.apply(params, graph, capture_aux=True)
    att = np.asarray(aux['layers'][0]['att_val']).squeeze(-1)
    senders = np.asarray(graph.senders)
    real = np.asarray(graph.edge_mask) > 0
    sums = np.zeros(int(graph.node_mask.sum()))
    np.add.at(sums, senders[real], att[real])
    # att is the mean over heads; each head sums to 1 per node
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-5)


def test_en_transformer_trains(tmp_path):
    from pointvs_tpu.main import main as train_main
    save = tmp_path / 'en_run'
    train_main(['en_transformer', str(save),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--layers', '2', '-ep', '1', '-b', '2', '--compact',
                '--prefetch', '0', '--num_devices', '1'])
    assert (save / 'checkpoints' / 'pose_ckpt_epoch_1').exists()
