import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import default_settings
from stereo_dso_g2o_tpu.frontend.coarse_tracker import (
    CoarseTracker,
    motion_model_tries,
    rotation_ladder,
)
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.utils import se3

SET = default_settings()
N_LVL = 5


def _make_tracker(seed=0, w=256, h=128, n_pts=1200):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(w, h)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.15, w, h, n_levels=N_LVL)
    ref_img, idepth = synthetic.render(scene, K, w, h, np.eye(4))
    dI_ref, _ = build_pyramid(jnp.asarray(ref_img), N_LVL)

    rng = np.random.default_rng(seed)
    us = rng.integers(6, w - 6, n_pts).astype(np.float32)
    vs = rng.integers(6, h - 6, n_pts).astype(np.float32)
    ids = idepth[vs.astype(int), us.astype(int)]
    tracker = CoarseTracker(calib, SET)
    tracker.set_reference(
        dI_ref,
        jnp.asarray(us),
        jnp.asarray(vs),
        jnp.asarray(ids),
        jnp.ones(n_pts, jnp.float32),
        jnp.ones(n_pts, dtype=bool),
    )
    return scene, K, calib, tracker


def _track(tracker, scene, K, T_gt, w=256, h=128, T_init=None):
    new_img, _ = synthetic.render(scene, K, w, h, T_gt)
    dI_new, _ = build_pyramid(jnp.asarray(new_img), N_LVL)
    if T_init is None:
        T_init = np.eye(4)
    return tracker.track_newest_coarse(
        dI_new,
        T_init,
        np.zeros(2),
        coarsest_lvl=N_LVL - 1,
        min_res_for_abort=np.full(N_LVL, np.inf),
    )


def test_track_identity():
    scene, K, calib, tracker = _make_tracker()
    res = _track(tracker, scene, K, np.eye(4))
    assert res.ok
    xi = np.asarray(se3.se3_log(jnp.asarray(res.T_ref_new)))
    assert np.abs(xi).max() < 2e-3, xi
    assert res.residuals[0] < 2.0, res.residuals


def test_track_known_motion():
    scene, K, calib, tracker = _make_tracker(seed=2)
    xi_gt = np.array([0.04, -0.02, 0.06, 0.004, 0.008, -0.003])
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi_gt)), dtype=np.float64)
    res = _track(tracker, scene, K, T_gt)
    assert res.ok
    err = np.asarray(
        se3.se3_log(jnp.asarray(res.T_ref_new @ np.linalg.inv(T_gt)))
    )
    assert np.linalg.norm(err[:3]) < 5e-3, err  # translation (scene at ~5m)
    assert np.linalg.norm(err[3:]) < 2e-3, err  # rotation
    assert res.residuals[0] < 3.0, res.residuals


def test_track_larger_motion_converges_from_coarse():
    scene, K, calib, tracker = _make_tracker(seed=3)
    xi_gt = np.array([0.25, 0.1, 0.15, 0.01, 0.03, 0.01])
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi_gt)), dtype=np.float64)
    res = _track(tracker, scene, K, T_gt)
    assert res.ok
    err = np.asarray(se3.se3_log(jnp.asarray(res.T_ref_new @ np.linalg.inv(T_gt))))
    assert np.linalg.norm(err[:3]) < 2e-2, err
    assert np.linalg.norm(err[3:]) < 5e-3, err


def test_abort_on_worse_residual():
    scene, K, calib, tracker = _make_tracker(seed=4)
    res = _track(tracker, scene, K, np.eye(4))
    tight = np.maximum(res.residuals * 0.1, 1e-3)
    xi = np.array([0.3, 0.0, 0.0, 0.0, 0.05, 0.0])
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
    res2 = tracker.track_newest_coarse(
        build_pyramid(
            jnp.asarray(synthetic.render(scene, K, w=256, h=128, T_cw=T_gt)[0]), N_LVL
        )[0],
        np.eye(4),
        np.zeros(2),
        coarsest_lvl=N_LVL - 1,
        min_res_for_abort=tight,
    )
    assert not res2.ok


def test_motion_model_tries():
    T0 = np.eye(4)
    T1 = np.eye(4); T1[:3, 3] = [0, 0, 1.0]
    T2 = np.eye(4); T2[:3, 3] = [0, 0, 2.0]
    tries = motion_model_tries(T0, T1, T2)
    assert len(tries) == 5
    # constant velocity: lastF->fh should predict one more unit of motion
    # (exact algebra depends on convention; just check all are valid SE3)
    for T in tries:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_rotation_ladder_size():
    lad = rotation_ladder()
    assert len(lad) == 52  # 26 combos x 2 deltas
    for T in lad:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-9)


def test_cutoff_repeat_in_graph():
    """The in-graph cutoff-repeat (legacy CoarseTracker.cpp:891-906,
    :1036-1041): a large global brightness shift saturates >60% of residuals
    at the 1x cutoff; lm_level must raise the cutoff, report the repeat, and
    still recover the photometric offset + pose."""
    import jax

    from stereo_dso_g2o_tpu.ops import tracker_ops

    scene, K, calib, tracker = _make_tracker()
    T_gt = np.eye(4)
    T_gt[:3, 3] = [0.02, 0.0, 0.01]
    new_img, _ = synthetic.render(scene, K, 256, 128, T_gt)
    # +90 intensity shift: residuals >> coarse_cutoff_th=20 at aff=(0,0)
    new_img = np.clip(new_img + 90.0, 0.0, 1e9)
    dI_new, _ = build_pyramid(jnp.asarray(new_img), N_LVL)

    lvl = 2
    K_lvl = jnp.stack(
        [calib.fx(lvl), calib.fy(lvl), calib.cx(lvl), calib.cy(lvl)]
    )
    pc_u, pc_v, pc_id, pc_color, pc_ok = tracker.ref[lvl]
    out = tracker_ops.lm_level(
        pc_u, pc_v, pc_id, pc_color, pc_ok, dI_new[lvl], K_lvl,
        jnp.asarray(T_gt, jnp.float32), jnp.zeros(2, jnp.float32),
        tracker.ref_aff, jnp.float32(1.0), jnp.float32(1.0),
        jnp.asarray(False), settings=SET, max_iterations=10,
    )
    assert bool(out.repeated), "saturated start must trigger the repeat"
    assert float(out.sat_frac) <= 0.6 + 1e-6
    # the affine b should have moved toward the -90 shift (b enters residual
    # as hit - (a*color + b); the optimizer tracks it in aff_g2l convention)
    rel_b = float(out.aff[1])
    assert abs(rel_b) > 20.0, f"affine b did not move: {rel_b}"

    # an unshifted frame must NOT repeat
    new2, _ = synthetic.render(scene, K, 256, 128, T_gt)
    dI2, _ = build_pyramid(jnp.asarray(new2), N_LVL)
    out2 = tracker_ops.lm_level(
        pc_u, pc_v, pc_id, pc_color, pc_ok, dI2[lvl], K_lvl,
        jnp.asarray(T_gt, jnp.float32), jnp.zeros(2, jnp.float32),
        tracker.ref_aff, jnp.float32(1.0), jnp.float32(1.0),
        jnp.asarray(False), settings=SET, max_iterations=10,
    )
    assert not bool(out2.repeated)
    assert float(out2.sat_frac) < 0.1
