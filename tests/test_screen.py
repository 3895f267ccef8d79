"""Library-screening CLI: ranked CSV + top-hit attributions end-to-end."""
import pandas as pd

from pointvs_tpu.main import main as train_main
from pointvs_tpu.screen import screen


def test_screen_pipeline(tmp_path):
    model_dir = tmp_path / 'model'
    train_main(['egnn', str(model_dir),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--layers', '2', '-ep', '1', '-b', '2', '--compact',
                '--egnn_attention', '--prefetch', '0',
                '--num_devices', '1'])
    out = tmp_path / 'hits.csv'
    df = screen(model_dir, 'tests/resources/rec_0.parquet',
                'tests/resources/lig_0.parquet', output=str(out),
                batch_size=2, attribute_top=1)
    assert out.exists()
    assert list(df.columns) == ['ligand', 'score', 'rank']
    assert len(df) == 1 and 0 <= df.score[0] <= 1
    attr_dir = out.parent / 'top_hit_attributions'
    assert any(attr_dir.glob('*_atom_masking.csv'))
