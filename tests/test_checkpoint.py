import pytest
import numpy as np

from stereo_dso_g2o_tpu.runtime import checkpoint
from stereo_dso_g2o_tpu.io import trajectory

from test_full_system import _sequence, SET, W_, H_, BASE
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.models.camera import make_calib


@pytest.mark.slow
def test_checkpoint_resume_exact(tmp_path):
    """Save at frame 6, resume, continue: the resumed run must produce the
    same trajectory as the uninterrupted one."""
    K, poses_gt, frames = _sequence(10, seed=4)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)

    fs_a = FullSystem(calib, SET)
    for i in range(6):
        fs_a.add_frame(*frames[i], i, timestamp=0.1 * i)
    ckpt = str(tmp_path / "state")
    checkpoint.save(fs_a, ckpt)

    # continue run A
    for i in range(6, 10):
        fs_a.add_frame(*frames[i], i, timestamp=0.1 * i)

    # resume as run B
    fs_b = checkpoint.load(ckpt, calib)
    for i in range(6, 10):
        fs_b.add_frame(*frames[i], i, timestamp=0.1 * i)

    ta = fs_a.trajectory()
    tb = fs_b.trajectory()
    assert len(ta) == len(tb) == 10
    for A, B in zip(ta, tb):
        np.testing.assert_allclose(A, B, atol=1e-5)

    ate = trajectory.ate_rmse(tb, poses_gt)
    assert ate < 0.05, ate


def test_checkpoint_save_load_state_exact(tmp_path):
    """Fast tier: save/load round-trips the device pytrees and host metadata
    bit-exactly after a 3-frame bootstrap (the full resume-and-continue
    equivalence is the slow test above)."""
    K, poses_gt, frames = _sequence(3, seed=6)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_,
                      n_levels=5)
    fs = FullSystem(calib, SET)
    for i in range(3):
        fs.add_frame(*frames[i], i, timestamp=0.1 * i)
    ckpt = str(tmp_path / "state")
    checkpoint.save(fs, ckpt)
    fs2 = checkpoint.load(ckpt, calib)

    import dataclasses
    for f in dataclasses.fields(fs.win):
        a = np.asarray(getattr(fs.win, f.name))
        b = np.asarray(getattr(fs2.win, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f"win.{f.name}")
    for f in dataclasses.fields(fs.imm):
        a = np.asarray(getattr(fs.imm, f.name))
        b = np.asarray(getattr(fs2.imm, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f"imm.{f.name}")
    assert len(fs2.history) == len(fs.history)
    assert len(fs2.kf_shells) == len(fs.kf_shells)
    assert fs2.next_kf_id == fs.next_kf_id
