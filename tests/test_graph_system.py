"""The fused one-dispatch-per-frame graph system (incl. in-graph KF path)."""

import numpy as np
import pytest

from stereo_dso_g2o_tpu.config import Settings
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem
from stereo_dso_g2o_tpu.io import synthetic, trajectory
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.utils import se3
import jax.numpy as jnp

W_, H_ = 256, 128
BASE = 0.12

SET = Settings(
    desired_point_density=600.0,
    desired_immature_density=450.0,
    immature_cap=512,
    active_cap=1024,
)


def _frames(n, seed=0):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(W_, H_)
    poses, frames = [], []
    for i in range(n):
        xi = np.array(
            [0.025 * i, -0.008 * i, 0.04 * i, 0.002 * i, 0.004 * i, -0.001 * i]
        )
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
        poses.append(np.linalg.inv(T))
        left, right, _ = synthetic.render_stereo_pair(scene, K, W_, H_, BASE, T)
        frames.append((left, right))
    return K, poses, frames


@pytest.mark.slow
def test_graph_system_continues_full_system():
    """Bootstrap on the host FullSystem, freeze, then the fused program must
    keep tracking with comparable accuracy AND create keyframes in-graph."""
    n = 16
    K, poses_gt, frames = _frames(n)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)
    fs = FullSystem(calib, SET)
    n_boot = 8
    for i in range(n_boot):
        fs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
    assert len(fs.kf_shells) >= 3

    gs = GraphSystem.from_full_system(fs)
    kfs_before = len(gs.kf_shells)
    for i in range(n_boot, n):
        b = gs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
        assert not gs.is_lost, f"lost at {i}"
    assert len(gs.trajectory()) == n

    ate = trajectory.ate_rmse(gs.trajectory(), poses_gt)
    assert ate < 0.03, ate
    # the graph path must have decided at least one keyframe on its own
    assert len(gs.kf_shells) > kfs_before


@pytest.mark.slow
@pytest.mark.parametrize("kf_mode", ["deferred", "gated", "fused"])
def test_batched_runner_two_sequences(kf_mode):
    """Config 4: two sequences stepped by one vmapped track program per frame
    (deferred: keyframe pipeline dispatched one step late, before the next
    track — no blocking need_kf sync; gated: same split with an in-frame
    sync; fused: everything under vmapped lax.cond). The deferred run also
    exercises the queued-bundle fix-up: without it the host bookkeeping
    would never see the keyframe bundles and kf_shells would not grow."""
    from stereo_dso_g2o_tpu.parallel.batched import BatchedRunner

    n, n_boot = 14, 7
    K, gt0, fr0 = _frames(n, seed=0)
    _, gt1, fr1 = _frames(n, seed=5)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)

    import dataclasses

    # eager KF policy so the batched keyframe path (gated dispatch / fused
    # cond) is actually exercised within the short tail
    set_kf = dataclasses.replace(SET, kf_global_weight=3.0)
    systems = []
    for frames in (fr0, fr1):
        fs = FullSystem(calib, set_kf)
        for i in range(n_boot):
            fs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
        systems.append(GraphSystem.from_full_system(fs))
    runner = BatchedRunner(systems, kf_mode=kf_mode)
    kfs_boot = [len(gs.kf_shells) for gs in runner.systems]
    for i in range(n_boot, n):
        runner.add_frames(
            [fr0[i], fr1[i]], i, timestamp=0.1 * i
        )
    t0, t1 = runner.trajectories()
    assert len(t0) == n and len(t1) == n
    # at least one sequence must have decided a keyframe through this path
    kfs_after = [len(gs.kf_shells) for gs in runner.systems]
    assert any(a > b for a, b in zip(kfs_after, kfs_boot)), (
        kfs_boot, kfs_after,
    )
    ate0 = trajectory.ate_rmse(t0, gt0)
    ate1 = trajectory.ate_rmse(t1, gt1)
    assert ate0 < 0.03 and ate1 < 0.03, (ate0, ate1)


@pytest.mark.slow
def test_graph_system_matches_full_system_accuracy():
    """Running the tail through FullSystem vs GraphSystem: same family of
    trajectories (policies match; selector adaptation is stale-by-one so
    exact bitwise equality is not expected)."""
    n = 14
    K, poses_gt, frames = _frames(n, seed=3)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)

    fs = FullSystem(calib, SET)
    for i in range(n):
        fs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
    ate_fs = trajectory.ate_rmse(fs.trajectory(), poses_gt)

    fs2 = FullSystem(calib, SET)
    n_boot = 7
    for i in range(n_boot):
        fs2.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
    gs = GraphSystem.from_full_system(fs2)
    for i in range(n_boot, n):
        gs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
    ate_gs = trajectory.ate_rmse(gs.trajectory(), poses_gt)

    assert ate_gs < max(3.0 * ate_fs, 0.02), (ate_gs, ate_fs)
