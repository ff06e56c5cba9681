"""Checkpoint-dir hygiene: resume must survive a trainer killed mid-save.

Orbax writes `checkpoint_epoch_N.orbax-checkpoint-tmp...` while saving and
renames on completion; a SIGKILL between the two leaves the tmp dir behind.
`latest_checkpoint` must skip it (restoring an incomplete checkpoint raises
ValueError inside orbax), falling back to the newest complete epoch —
mirrors the reference trainer's newest-`*.pth` resume (tools/train.py), which
has the same property because torch.save is written to a single file.
"""

from pathlib import Path

from lidardetection_tpu.utils.checkpoint import latest_checkpoint


def test_latest_checkpoint_skips_incomplete_tmp(tmp_path):
    (tmp_path / 'checkpoint_epoch_8').mkdir()
    (tmp_path / 'checkpoint_epoch_9.orbax-checkpoint-tmp').mkdir()
    got = latest_checkpoint(str(tmp_path))
    assert got is not None and Path(got).name == 'checkpoint_epoch_8'


def test_latest_checkpoint_empty_dir(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    (tmp_path / 'checkpoint_epoch_3.orbax-checkpoint-tmp').mkdir()
    assert latest_checkpoint(str(tmp_path)) is None
