"""Crash-resume: training continues from the saved epoch counter with the
rebuilt loaders (ref point_vs/resume_training.py behaviour)."""
from pathlib import Path

import yaml

from pointvs_tpu.main import main as train_main
from pointvs_tpu.resume_training import main as resume_main


def test_resume_training(tmp_path):
    save = tmp_path / 'resume_run'
    train_main(['egnn', str(save),
                '--train_data_root_pose', 'tests/resources',
                '--train_types_pose', 'tests/resources/test.types',
                '--layers', '2', '-ep', '1', '-b', '2', '--compact',
                '--prefetch', '0', '--num_devices', '1'])
    assert (save / 'checkpoints' / 'pose_ckpt_epoch_1').exists()

    # Pretend the job was meant to run 3 epochs and died after 1.
    args = yaml.safe_load((save / 'cmd_args.yaml').read_text())
    args['epochs_pose'] = 3
    (save / 'cmd_args.yaml').write_text(yaml.dump(args))

    trainer = resume_main([str(save), '--num_devices', '1'])
    assert trainer.p_epoch == 3
    assert (save / 'checkpoints' / 'pose_ckpt_epoch_2').exists()
    assert (save / 'checkpoints' / 'pose_ckpt_epoch_3').exists()
