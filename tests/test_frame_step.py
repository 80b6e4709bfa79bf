"""Fused per-frame program vs the host-driven cascade: equivalence checks."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import default_settings
from stereo_dso_g2o_tpu.frontend import frame_step as FS
from stereo_dso_g2o_tpu.frontend.coarse_tracker import CoarseTracker
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.utils import se3

SET = default_settings()
N_LVL = 5
W_, H_ = 256, 128


def _setup(seed=0):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(W_, H_)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.15, W_, H_, n_levels=N_LVL)
    ref_img, idepth = synthetic.render(scene, K, W_, H_, np.eye(4))
    dI_ref, _ = build_pyramid(jnp.asarray(ref_img), N_LVL)
    rng = np.random.default_rng(seed)
    n = 1200
    us = rng.integers(6, W_ - 6, n).astype(np.float32)
    vs = rng.integers(6, H_ - 6, n).astype(np.float32)
    ids = idepth[vs.astype(int), us.astype(int)]
    tracker = CoarseTracker(calib, SET)
    tracker.set_reference(
        dI_ref, jnp.asarray(us), jnp.asarray(vs), jnp.asarray(ids),
        jnp.ones(n), jnp.ones(n, bool),
    )
    return scene, K, calib, tracker


def test_fused_cascade_matches_host_cascade():
    scene, K, calib, tracker = _setup(21)
    xi = np.array([0.05, -0.02, 0.07, 0.004, 0.009, -0.002])
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
    img, _ = synthetic.render(scene, K, W_, H_, T_gt)
    dI_new, _ = build_pyramid(jnp.asarray(img), N_LVL)

    host = tracker.track_newest_coarse(
        dI_new, np.eye(4), np.zeros(2), N_LVL - 1, np.full(N_LVL, np.inf)
    )
    fused = FS.cascade_step(
        dI_new, tuple(tracker.ref), calib.c, calib.baseline,
        jnp.eye(4, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
        tracker.ref_aff, jnp.float32(1.0), jnp.float32(1.0),
        jnp.full(N_LVL, jnp.inf, jnp.float32), settings=SET, n_levels=N_LVL,
    )
    assert host.ok and bool(fused.ok)
    np.testing.assert_allclose(
        np.asarray(fused.T), host.T_ref_new, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(fused.aff), host.aff, atol=1e-4)
    # residual vectors agree where both evaluated
    fr = np.asarray(fused.residuals)
    m = np.isfinite(host.residuals) & np.isfinite(fr)
    np.testing.assert_allclose(fr[m], host.residuals[m], rtol=1e-3)


def test_frame_step_full_ladder_recovers_bad_init():
    """With a bad try-0 the in-graph ladder must still find the pose via the
    alternative hypotheses."""
    scene, K, calib, tracker = _setup(22)
    xi = np.array([0.04, -0.01, 0.05, 0.002, 0.006, -0.001])
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
    img, _ = synthetic.render(scene, K, W_, H_, T_gt)
    right, _ = synthetic.render(
        scene, K, W_, H_, synthetic.stereo_pose(T_gt, 0.15)
    )

    from stereo_dso_g2o_tpu.backend import window as Wb
    from stereo_dso_g2o_tpu.frontend import immature as IMM

    win = Wb.empty_window(8, 64, np.asarray(calib.c))
    from stereo_dso_g2o_tpu.backend import builder

    win = builder.insert_frame(win, 0, np.eye(4), (0.0, 0.0), 1.0, 0)
    imm = IMM.empty(8, 64)

    # try 0 is far off; try 3 is the identity (closest to truth)
    T_bad = np.asarray(
        se3.se3_exp(jnp.asarray([0.6, 0.3, -0.4, 0.15, -0.1, 0.2])),
        dtype=np.float64,
    )
    tries = np.stack([T_bad, T_bad, T_bad, np.eye(4), T_bad])

    pyrs, imm2, track, used_ladder = FS.frame_step_full(
        jnp.asarray(img), jnp.asarray(right), tuple(tracker.ref), win, imm,
        calib.c, calib.baseline, jnp.asarray(0),
        jnp.asarray(tries, jnp.float32), jnp.zeros(2, jnp.float32),
        tracker.ref_aff, jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(1e-3),  # force the ladder even if try 0 "succeeds"
        settings=SET, n_levels=N_LVL, n_tries=5,
    )
    assert bool(used_ladder)
    assert bool(track.ok)
    err = np.asarray(
        se3.se3_log(
            jnp.asarray(
                np.asarray(track.T, np.float64) @ np.linalg.inv(T_gt),
                dtype=jnp.float64,
            )
        )
    )
    assert np.linalg.norm(err[:3]) < 5e-3, err


def test_hypothesis_selection_policies():
    """_select: "best" takes the lowest finite-ok residual (try-0 preferred
    when good); "sequential" replays trackNewCoarse STEP2-4 and stops at the
    accept gate, so try-0 wins whenever it passes — even when a later try
    has a (slightly) lower residual."""
    import dataclasses
    import jax.numpy as jnp
    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.frame_step import TrackOut, _select

    def mk(res0s, oks, sat0=0.0):
        n = len(res0s)
        return TrackOut(
            T=jnp.stack([jnp.eye(4) * (k + 1) for k in range(n)]),
            aff=jnp.zeros((n, 2)),
            residuals=jnp.stack(
                [jnp.array([r, r, r, r, r], jnp.float32) for r in res0s]
            ),
            flow=jnp.zeros((n, 3)),
            ok=jnp.array(oks),
            sat_frac0=jnp.full((n,), sat0, jnp.float32),
        )

    s_best = Settings(hypothesis_selection="best")
    s_seq = Settings(hypothesis_selection="sequential")

    # try-0 passes the accept gate but try-3 is slightly lower:
    # sequential must stop at try-0, best must switch to try-3
    tb = mk([10.0, 12.0, 11.0, 9.75, 20.0], [True] * 5)
    sel_seq = _select(tb, jnp.float32(10.0), s_seq, 5)
    sel_best = _select(tb, jnp.float32(10.0), s_best, 5)
    assert float(sel_seq.residuals[0]) == 10.0
    assert float(sel_best.residuals[0]) == 9.75
    assert bool(sel_seq.ok) and bool(sel_best.ok)

    # try-0 failed (coverage guard): sequential accepts the FIRST ok try
    # that passes the gate (12 < 10*1.5) and stops; best scans all
    tb = mk([5.0, 12.0, 9.0, 9.75, 20.0], [False, True, True, True, True])
    sel = _select(tb, jnp.float32(10.0), s_seq, 5)
    assert float(sel.residuals[0]) == 12.0 and bool(sel.ok)
    sel = _select(tb, jnp.float32(10.0), s_best, 5)
    assert float(sel.residuals[0]) == 9.0 and bool(sel.ok)

    # nothing ok: ok=False must surface (isLost handling upstream)
    tb = mk([5.0, 6.0, 7.0, 8.0, 9.0], [False] * 5)
    for s in (s_seq, s_best):
        assert not bool(_select(tb, jnp.float32(10.0), s, 5).ok)

    # saturated try-0 must not win under "best" even with lowest residual
    tb = mk([5.0, 6.0, 7.0, 8.0, 9.0], [True] * 5, sat0=0.9)
    sel = _select(tb, jnp.float32(100.0), s_best, 5)
    assert float(sel.residuals[0]) == 6.0
