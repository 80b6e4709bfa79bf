"""KITTI-resolution accuracy bound (VERDICT r3 item 4).

The reference's published KITTI numbers are rel-trans 1.1-4.2 % and
rel-rot 0.001-0.0053 deg/m (/root/reference/README.md:107-126). No KITTI
data exists in this environment, so the hostile synthetic corridor at the
SAME resolution (1216x352) is the proxy: this test asserts the engine at
full resolution stays INSIDE the reference's published envelope, replacing
round-3's untested "6.1 % at 256x128 is just resolution" argument.

Runs the bench's sequence-0 configuration (same scene generator, same
trajectory, same settings) truncated to 120 frames to bound CPU wall time;
bench.py reports the full 200-frame numbers on TPU.
"""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_kitti_res_within_reference_envelope():
    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem
    from stereo_dso_g2o_tpu.io import synthetic, trajectory
    from stereo_dso_g2o_tpu.models.camera import make_calib

    W_, H_, BASE = 1216, 352, 0.54
    N, BOOT = 120, 12
    step = 0.30
    K = synthetic.default_K(W_, H_, fov_deg=80.0)

    cache = f"/root/repo/.cache/bench_frames_v5_{W_}x{H_}_4x200.npz"
    if os.path.exists(cache):
        data = np.load(cache)
        lefts, rights = data["l0"][:N], data["r0"][:N]
        poses_wc = data["p0"][:N]
    else:
        scene = synthetic.corridor_scene(
            seed=100, length=step * 200 + 40.0, box_spacing=9.0, lateral=14.0
        )
        poses_cw = synthetic.forward_trajectory(
            N, step=step, yaw_amp=0.10, yaw_period=80.0, seed=0
        )
        expos = 1.0 + 0.12 * np.sin(0.25 * np.arange(N))
        lefts, rights = synthetic.render_stereo_sequence_fast(
            scene, K, W_, H_, BASE, poses_cw, expos
        )
        poses_wc = np.stack([np.linalg.inv(T) for T in poses_cw])

    settings = Settings(
        desired_point_density=2000.0,
        desired_immature_density=1500.0,
        immature_cap=2048,
        active_cap=2048,
        affine_opt_mode_a=0.0,
        affine_opt_mode_b=0.0,
    )
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_,
                       n_levels=6)
    fs = FullSystem(calib, settings)
    for i in range(BOOT):
        fs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
    gs = GraphSystem.from_full_system(fs)
    for i in range(BOOT, N):
        gs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
        assert not gs.is_lost, f"lost at frame {i}"

    traj = gs.trajectory()
    assert all(np.isfinite(np.asarray(T)).all() for T in traj)
    ate = trajectory.ate_rmse(traj, poses_wc)
    rel_t, rel_r = trajectory.kitti_rel_errors(
        traj, poses_wc, lengths=(10, 20, 30), step=5
    )
    n_kfs = len(gs.kf_shells)
    print(f"\nkitti-res 120f: ate={ate:.3f}m rel_t={rel_t:.2f}% "
          f"rel_r={rel_r:.5f}deg/m kfs={n_kfs}")
    assert n_kfs >= 15, n_kfs  # steady-state window churn happened
    # the reference's published KITTI envelope (README.md:113)
    assert rel_t <= 4.2, rel_t
    assert rel_r <= 0.0053, rel_r
