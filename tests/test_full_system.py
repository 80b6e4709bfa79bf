import numpy as np
import pytest

from stereo_dso_g2o_tpu.config import Settings
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.io import synthetic, trajectory
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.utils import se3
import jax.numpy as jnp

W_, H_ = 256, 128
BASE = 0.12


def _sequence(n_frames=10, seed=0):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(W_, H_)
    poses = []
    frames = []
    for i in range(n_frames):
        xi = np.array(
            [0.025 * i, -0.008 * i, 0.04 * i, 0.002 * i, 0.004 * i, -0.001 * i]
        )
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
        poses.append(np.linalg.inv(T))  # camToWorld
        left, right, _ = synthetic.render_stereo_pair(scene, K, W_, H_, BASE, T)
        frames.append((left, right))
    return K, poses, frames


SET = Settings(
    desired_point_density=600.0,
    desired_immature_density=450.0,
    immature_cap=512,
    active_cap=1024,
)


@pytest.mark.slow
def test_full_system_synthetic_sequence():
    K, poses_gt, frames = _sequence(10)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)
    fs = FullSystem(calib, SET)
    for i, (left, right) in enumerate(frames):
        fs.add_frame(left, right, i, timestamp=0.1 * i)
        assert not fs.is_lost, f"lost at frame {i}"

    traj = fs.trajectory()
    assert len(traj) == 10
    ate = trajectory.ate_rmse(traj, poses_gt)
    # scene is ~5m away, motion ~25cm/frame; a few mm ATE is healthy
    assert ate < 0.03, ate

    # scale should be roughly right thanks to static stereo (no Sim3 cheat)
    ate_sim = trajectory.ate_rmse(traj, poses_gt, align_scale=True)
    assert ate_sim <= ate + 1e-9
    assert ate < 3 * max(ate_sim, 1e-4), (ate, ate_sim)


def test_full_system_keyframes_and_window():
    K, poses_gt, frames = _sequence(12, seed=2)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)
    fs = FullSystem(calib, SET)
    for i, (left, right) in enumerate(frames):
        fs.add_frame(left, right, i)
    # window stays within capacity and has at least min frames once warmed up
    assert 1 <= len(fs.kf_slots) <= SET.max_frames + 1
    assert len(fs.kf_shells) >= 2
    # active point count is controlled
    import jax.numpy as jnp
    from stereo_dso_g2o_tpu.backend import window as W

    n_active = int(np.asarray(fs.win.pt_status == W.PT_ACTIVE).sum())
    assert 50 < n_active <= SET.active_cap * 2, n_active


def test_trajectory_eval_helpers(tmp_path):
    rng = np.random.default_rng(0)
    poses = []
    T = np.eye(4)
    for i in range(50):
        T = T.copy()
        T[:3, 3] += [0.5, 0.01 * rng.standard_normal(), 1.0]
        poses.append(T)
    p = tmp_path / "traj.txt"
    trajectory.write_kitti(str(p), poses)
    back = trajectory.read_kitti(str(p))
    assert len(back) == 50
    np.testing.assert_allclose(back[10], poses[10], atol=1e-4)
    assert trajectory.ate_rmse(poses, poses) < 1e-9
    t_err, r_err = trajectory.kitti_rel_errors(poses, poses, lengths=(10, 20), step=5)
    assert t_err < 1e-6 and r_err < 1e-6


@pytest.mark.slow
def test_full_system_occlusion_scene():
    """End-to-end odometry on a hostile multi-object scene: boxes at staggered
    depths, ground plane, side facades -> occlusion boundaries, depth
    discontinuities, background revealed by forward motion. Exposure varies
    sinusoidally so the affine-brightness estimation is exercised too.
    (KITTI-style validation stand-in; VERDICT round-1 item 3.)"""
    w, h = 256, 96
    baseline = 0.3
    K = synthetic.default_K(w, h, fov_deg=75.0)
    scene = synthetic.box_scene(
        seed=7, n_boxes=5, depth_range=(6.0, 25.0), lateral=8.0,
        backdrop_dist=40.0,
    )
    poses = synthetic.forward_trajectory(24, step=0.22, yaw_amp=0.10, yaw_period=30.0)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline, w, h, n_levels=5)
    fs = FullSystem(calib, SET)
    gt_c2w = []
    for i, T_cw in enumerate(poses):
        expo = 1.0 + 0.15 * np.sin(0.4 * i)
        left, right, _ = synthetic.render_multi_stereo_pair(
            scene, K, w, h, baseline, T_cw, exposure=expo
        )
        fs.add_frame(left, right, i, timestamp=0.1 * i)
        assert not fs.is_lost, f"lost at frame {i}"
        gt_c2w.append(np.linalg.inv(T_cw))

    traj = fs.trajectory()
    ate = trajectory.ate_rmse(traj, gt_c2w)
    # ~5.3 m travelled among obstacles: a few cm ATE is a pass; the planar
    # scenes achieve mm but occlusion boundaries legitimately cost accuracy
    assert ate < 0.08, ate
    assert len(fs.kf_shells) >= 4


def test_garbage_input_no_crash():
    """Uncorrelated noise frames: the system must fail gracefully (reset flag
    or lost or simply no tracking), never crash (reference resets,
    main_dso_pangolin.cpp:497-514)."""
    rng = np.random.default_rng(0)
    K = synthetic.default_K(W_, H_)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)
    fs = FullSystem(calib, SET)
    for i in range(5):
        left = rng.uniform(0, 255, (H_, W_)).astype(np.float32)
        right = rng.uniform(0, 255, (H_, W_)).astype(np.float32)
        fs.add_frame(left, right, i)
    # any of these outcomes is acceptable; the invariant is "still standing".
    # Declaring the run lost and stopping early is the reference's own
    # behavior on unrecoverable input (isLost -> abort, main:516-519).
    assert isinstance(fs.init_failed, bool)
    traj = fs.trajectory()
    assert 1 <= len(traj) <= 5
    if len(traj) < 5 or not all(np.isfinite(T).all() for T in traj):
        # a non-finite pose or an early stop is only acceptable if the
        # system DECLARED the failure (the reference aborts on isLost)
        assert fs.is_lost or fs.init_failed
