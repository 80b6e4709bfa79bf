"""Long-run stress: many keyframes, repeated marginalization, slot reuse."""

import numpy as np
import jax.numpy as jnp

from stereo_dso_g2o_tpu.config import Settings
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.io import synthetic, trajectory
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.utils import se3

W_, H_, BASE = 192, 96, 0.1

# small window + low densities: forces frequent keyframes and marginalization
SET = Settings(
    desired_point_density=400.0,
    desired_immature_density=300.0,
    immature_cap=512,
    active_cap=512,
    min_frames=4,
    max_frames=5,
)


def test_long_sequence_with_marginalization_cycles():
    scene = synthetic.default_scene(41)
    K = synthetic.default_K(W_, H_)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=4)
    fs = FullSystem(calib, SET)

    poses = []
    max_kfs = 0
    total_kf_ids = 0
    for i in range(30):
        # forward motion with a continuous turn — keeps flow high so KFs fire
        xi = np.array(
            [0.02 * i, -0.004 * i, 0.035 * i, 0.0, 0.012 * i, 0.0015 * i]
        )
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
        poses.append(np.linalg.inv(T))
        left, right, _ = synthetic.render_stereo_pair(scene, K, W_, H_, BASE, T)
        fs.add_frame(left, right, i, timestamp=0.1 * i)
        assert not fs.is_lost, f"lost at {i}"
        max_kfs = max(max_kfs, len(fs.kf_slots))
        total_kf_ids = fs.next_kf_id
        # window invariants
        assert len(fs.kf_slots) <= SET.max_frames + 1
        assert len(set(fs.kf_slots)) == len(fs.kf_slots)

    # marginalization must actually have cycled the window (slot reuse)
    assert total_kf_ids > SET.max_frames + 1, total_kf_ids
    assert max_kfs >= SET.max_frames

    traj = fs.trajectory()
    ate = trajectory.ate_rmse(traj, poses)
    assert ate < 0.05, ate

    # marginal prior must have accumulated and stayed finite/symmetric
    HM = np.asarray(fs.win.HM)
    assert np.isfinite(HM).all()
    assert np.abs(HM).max() > 0
    np.testing.assert_allclose(HM, HM.T, atol=1e-3 * max(np.abs(HM).max(), 1))
