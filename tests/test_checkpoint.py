import numpy as np

from stereo_dso_g2o_tpu.runtime import checkpoint
from stereo_dso_g2o_tpu.io import trajectory

from test_full_system import _sequence, SET, W_, H_, BASE
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.models.camera import make_calib


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
