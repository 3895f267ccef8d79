"""Library-screening CLI: ranked CSV + top-hit attributions end-to-end."""
import shutil

import numpy as np
import pytest

from pointvs_tpu.main import main as train_main
from pointvs_tpu.screen import screen


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp('screen_model') / 'model'
    train_main(['egnn', str(path),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--layers', '2', '-ep', '1', '-b', '2', '--compact',
                '--egnn_attention', '--prefetch', '0',
                '--num_devices', '1'])
    return path


def test_screen_pipeline(model_dir, tmp_path):
    out = tmp_path / 'hits.csv'
    df = screen(model_dir, 'tests/resources/rec_0.parquet',
                'tests/resources/lig_0.parquet', output=str(out),
                batch_size=2, attribute_top=1)
    assert out.exists()
    assert list(df.columns) == ['ligand', 'score', 'rank']
    assert len(df) == 1 and 0 <= df.score[0] <= 1
    attr_dir = out.parent / 'top_hit_attributions'
    assert any(attr_dir.glob('*_atom_masking.csv'))


def test_screen_scan_groups_match_dispatch(model_dir, tmp_path,
                                           monkeypatch):
    """The one-program-per-group lax.scan scoring path (full groups +
    a repeat-padded final group) produces the same ranked scores as
    per-batch dispatch."""
    lib = tmp_path / 'library'
    lib.mkdir()
    for i in range(5):
        shutil.copy('tests/resources/lig_0.parquet',
                    lib / f'lig_{i}.parquet')
    monkeypatch.setenv('POINTVS_SCREEN_GROUP', '2')

    def run(scan):
        monkeypatch.setenv('POINTVS_SCREEN_SCAN', scan)
        out = tmp_path / f'hits_{scan}.csv'
        # batch_size 2 over 5 poses -> 3 batches -> one full group of 2
        # plus a final 1-batch group padded by repetition.
        return screen(model_dir, 'tests/resources/rec_0.parquet',
                      str(lib), output=str(out), batch_size=2)

    df_scan, df_ref = run('1'), run('0')
    assert len(df_scan) == len(df_ref) == 5
    scan_scores = df_scan.sort_values('ligand').score.to_numpy()
    ref_scores = df_ref.sort_values('ligand').score.to_numpy()
    np.testing.assert_allclose(scan_scores, ref_scores, atol=1e-6)


def test_screen_oneshot_and_repeat_match_dispatch(model_dir, tmp_path,
                                                  monkeypatch):
    """The one-shot mega-batch re-batching (whole library in one
    execution) and the sustained-rate repeat passes score identically
    to the default per-batch device-store dispatch."""
    lib = tmp_path / 'library'
    lib.mkdir()
    for i in range(5):
        shutil.copy('tests/resources/lig_0.parquet',
                    lib / f'lig_{i}.parquet')

    def run(tag, **env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = tmp_path / f'hits_{tag}.csv'
        df = screen(model_dir, 'tests/resources/rec_0.parquet',
                    str(lib), output=str(out), batch_size=2)
        for k in env:
            monkeypatch.delenv(k)
        return df.sort_values('ligand').score.to_numpy()

    ref = run('ref')
    oneshot = run('oneshot', POINTVS_SCREEN_ONESHOT='1')
    repeat = run('repeat', POINTVS_SCREEN_REPEAT='3')
    np.testing.assert_allclose(oneshot, ref, atol=1e-6)
    np.testing.assert_allclose(repeat, ref, atol=1e-6)


def test_screen_chunked_matches_resident(model_dir, tmp_path,
                                         monkeypatch):
    """Chunked HBM streaming (pack_chunk/expand_chunk shards scored
    while the library exceeds the chunk budget) produces byte-identical
    scores to the fully-resident device-store path."""
    lib = tmp_path / 'library'
    lib.mkdir()
    for i in range(6):
        shutil.copy('tests/resources/lig_0.parquet',
                    lib / f'lig_{i}.parquet')

    def run(tag, **env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = tmp_path / f'hits_{tag}.csv'
        df = screen(model_dir, 'tests/resources/rec_0.parquet',
                    str(lib), output=str(out), batch_size=2)
        for k in env:
            monkeypatch.delenv(k)
        return df.sort_values('ligand').score.to_numpy()

    ref = run('resident')
    # ~tiny chunk budget: forces several chunks for the 6-pose library.
    # COORDS16=0: exact f32 coords so the parity is BYTE-identical (the
    # default fixed-point coords carry a documented ≤ extent/131070
    # per-axis bound — exercised below and in test_device_dataset).
    chunked = run('chunked', POINTVS_SCREEN_CHUNK_MB='0.08',
                  POINTVS_CHUNK_COORDS16='0')
    np.testing.assert_array_equal(chunked, ref)
    # Default chunked path (fixed-point coords): scores agree to the
    # quantisation tolerance — coordinates feed radial distances, so a
    # <= 0.001 A coordinate bound keeps sigmoid scores within ~1e-3.
    chunked_q = run('chunked_q', POINTVS_SCREEN_CHUNK_MB='0.08')
    np.testing.assert_allclose(chunked_q, ref, atol=1e-3)


def test_screen_store_cache_invalidates_on_content_change(model_dir,
                                                          tmp_path):
    """The store-level disk cache fingerprints file CONTENT
    ((size, mtime_ns) per input), not just manifest paths: re-docking a
    ligand to the same path must re-featurise, not silently reuse the
    stale cached store (ADVICE r4)."""
    import os
    import shutil

    lib = tmp_path / 'library'
    lib.mkdir()
    shutil.copy('tests/resources/lig_0.parquet', lib / 'lig.parquet')
    cache = tmp_path / 'cache'

    def run(tag):
        out = tmp_path / f'hits_{tag}.csv'
        return screen(model_dir, 'tests/resources/rec_0.parquet',
                      str(lib), output=str(out), batch_size=2,
                      cache_dir=str(cache))

    s0 = run('a').score[0]
    stores0 = set(cache.glob('store_*.bin'))
    assert len(stores0) == 1          # first run wrote the store cache
    # Same content -> same digest -> cache reused, same score.
    assert run('b').score[0] == s0
    assert set(cache.glob('store_*.bin')) == stores0
    # "Re-dock": a perturbed pose at the SAME path. New digest, new
    # store, different score.
    import pandas as pd
    df = pd.read_parquet(lib / 'lig.parquet')
    # Non-rigid perturbation (a rigid shift would be invisible to the
    # E(3)-invariant model).
    df['x'] = df['x'] + np.linspace(0, 2.0, len(df))
    df.to_parquet(lib / 'lig.parquet')
    os.utime(lib / 'lig.parquet')
    s2 = run('c').score[0]
    assert set(cache.glob('store_*.bin')) != stores0
    assert s2 != s0
