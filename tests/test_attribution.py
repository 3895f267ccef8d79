"""Attribution subsystem tests: batched masking equivalence, CAM,
attention extraction, coordinate tracking, B-factor PDB export."""
import jax
import numpy as np
import pytest

from pointvs_tpu.attribution.attribution_fns import (
    atom_masking,
    bond_masking,
    cam,
    edge_attention,
    node_attention,
    track_bond_lengths,
    track_position_changes,
)
from pointvs_tpu.models import build_model

from .setup_and_params import FAST_MODEL_KWARGS as MODEL_KWARGS, ORIGINAL_GRAPH

np.random.seed(2)


@pytest.fixture(scope='module')
def model_and_params():
    model = build_model('egnn', **MODEL_KWARGS)
    params = model.init(jax.random.PRNGKey(2), ORIGINAL_GRAPH)
    return model, params


def _n_real_nodes():
    return int(ORIGINAL_GRAPH.node_mask.sum())


def _n_real_edges():
    return int(ORIGINAL_GRAPH.edge_mask.sum())


def test_atom_masking_matches_sequential(model_and_params):
    """The vmapped masked-forward scores must equal literally deleting the
    mask of one atom at a time (the reference's sequential semantics)."""
    model, params = model_and_params
    scores = atom_masking(model, params, ORIGINAL_GRAPH)
    assert scores.shape == (_n_real_nodes(),)
    # sequential re-computation for a few atoms
    out0 = float(model.apply(params, ORIGINAL_GRAPH)[0, 0])
    for i in (0, 3, 11):
        node_mask = np.array(ORIGINAL_GRAPH.node_mask)
        node_mask[i] = 0
        edge_mask = np.array(ORIGINAL_GRAPH.edge_mask)
        drop = ((ORIGINAL_GRAPH.senders == i)
                | (ORIGINAL_GRAPH.receivers == i))
        edge_mask[drop] = 0
        masked = ORIGINAL_GRAPH._replace(node_mask=node_mask,
                                         edge_mask=edge_mask)
        expected = out0 - float(model.apply(params, masked)[0, 0])
        assert scores[i] == pytest.approx(expected, abs=1e-5)
    assert np.abs(scores).max() > 0


def test_bond_masking(model_and_params):
    model, params = model_and_params
    scores = bond_masking(model, params, ORIGINAL_GRAPH)
    assert scores.shape == (_n_real_edges(),)
    lig_rec = np.asarray(
        ORIGINAL_GRAPH.edge_attr[:_n_real_edges(), 1]) > 0
    # non lig-rec edges are scored 0 by construction
    assert np.all(scores[~lig_rec] == 0)
    assert np.abs(scores[lig_rec]).max() > 0


def test_cam(model_and_params):
    model, params = model_and_params
    scores = cam(model, params, ORIGINAL_GRAPH)
    assert scores.shape == (_n_real_nodes(),)
    assert np.abs(scores).max() > 0


def test_attention_extraction(model_and_params):
    model, params = model_and_params
    node_scores = node_attention(model, params, ORIGINAL_GRAPH)
    edge_scores = edge_attention(model, params, ORIGINAL_GRAPH)
    assert node_scores.shape == (_n_real_nodes(),)
    assert edge_scores.shape == (_n_real_edges(),)
    assert (edge_scores >= 0).all()  # softmax weights


def test_coordinate_tracking(model_and_params):
    model, params = model_and_params
    disp = track_position_changes(model, params, ORIGINAL_GRAPH)
    blen = track_bond_lengths(model, params, ORIGINAL_GRAPH)
    assert disp.shape == (_n_real_nodes(),)
    assert (disp >= 0).all()
    assert blen.shape == (_n_real_edges(),)


def test_bfactor_pdb_export(tmp_path):
    """colour_b_factors_pdb writes scores into the B-factor column keyed
    on coordinates."""
    import pandas as pd
    from pointvs_tpu.attribution.attribution import colour_b_factors_pdb
    pdb = 'tests/resources/7zzp_rec_0.pdb'
    rows = []
    with open(pdb) as f:
        for line in f:
            if line.startswith('ATOM') and len(rows) < 5:
                rows.append({'x': float(line[30:38]),
                             'y': float(line[38:46]),
                             'z': float(line[46:54]),
                             'attribution': 7.77})
    scored = pd.DataFrame(rows)
    out = colour_b_factors_pdb(pdb, tmp_path / 'out.pdb', scored)
    stamped = [line for line in open(out)
               if line.startswith('ATOM') and line[60:66].strip() == '7.77']
    assert len(stamped) == 5
