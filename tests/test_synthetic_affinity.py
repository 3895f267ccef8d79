"""Synthetic affinity label generator (dataset_generation/synthetic_affinity).

Pins the properties the regression-quality study relies on: determinism,
exact E(3) invariance (the label must be learnable by an invariant
model), dependence on BOTH geometry and the smina type channel, and a
types-file output that round-trips through parse_regression_types."""
import numpy as np
import pandas as pd
import pytest

from pointvs_tpu.data.preprocessing import random_rotation_matrix
from pointvs_tpu.data.types_files import parse_regression_types
from pointvs_tpu.dataset_generation.synthetic_affinity import (
    contact_score, make_types, scores_to_pk)

REC = 'tests/resources/rec_0.parquet'
LIG = 'tests/resources/lig_0.parquet'


def _frames():
    return pd.read_parquet(REC), pd.read_parquet(LIG)


def test_contact_score_deterministic_and_positive():
    rec, lig = _frames()
    s1, s2 = contact_score(rec, lig), contact_score(rec, lig)
    assert s1 == s2 and s1 > 0


def test_contact_score_e3_invariant():
    rec, lig = _frames()
    base = contact_score(rec, lig)
    rng = np.random.RandomState(0)
    m, t = random_rotation_matrix(rng), rng.normal(size=3) * 10
    rot_rec, rot_lig = rec.copy(), lig.copy()
    for df in (rot_rec, rot_lig):
        df[['x', 'y', 'z']] = df[['x', 'y', 'z']].to_numpy() @ m + t
    assert contact_score(rot_rec, rot_lig) == pytest.approx(
        base, rel=1e-9)


def test_contact_score_depends_on_geometry_and_types():
    rec, lig = _frames()
    base = contact_score(rec, lig)
    pulled = lig.copy()   # drag the ligand 5 A out of the pocket
    pulled[['x', 'y', 'z']] += 5.0
    assert contact_score(rec, pulled) != pytest.approx(base, rel=1e-3)
    retyped = lig.copy()  # same geometry, different type channel
    retyped['types'] = (retyped['types'].to_numpy() + 1) % 14
    assert contact_score(rec, retyped) != pytest.approx(base, rel=1e-3)


def test_scores_to_pk_range_and_monotone():
    s = np.array([0.0, 1.0, 10.0, 1e6])
    pk = scores_to_pk(s, s0=10.0, pk_max=12.0)
    assert (pk >= 0).all() and (pk < 12).all()
    assert (np.diff(pk) > 0).all()
    assert pk[2] == pytest.approx(6.0)   # S == s0 -> pk_max/2


def test_make_types_roundtrips_through_regression_parser(tmp_path):
    out = make_types('tests/resources', 'tests/resources/test.types',
                     tmp_path / 'aff.types')
    entries = parse_regression_types('tests/resources', out)
    assert len(entries.ligands) == 2
    assert entries.pki[0] == -1 and entries.ic50[0] == -1
    # Both lines are the same pose: same label; s0=median(S) -> pk_max/2.
    assert entries.pkd[0] == entries.pkd[1] == pytest.approx(6.0, abs=1e-3)
