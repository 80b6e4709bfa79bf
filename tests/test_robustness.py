"""Regression tests for the round-3 long-run divergence fixes.

The round-2 bench died mid-run (NaN trajectory) through a chain the tests
below pin down individually:
1. a window frame with zero residual support made the reduced camera system
   exactly singular -> LU produced NaN for the WHOLE window,
2. the isOOB recency rules (HessianBlocks.h:439-462) never fired because
   they were gated on res_exists, which linearize_all_final prunes, so
   points invisible in the newest keyframes lingered forever,
3. the fused keyframe branch never reset first_rmse (the reference resets
   firstCoarseRMSE on every new tracking reference, CoarseTracker.cpp:803).
"""

import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.backend import ba
from stereo_dso_g2o_tpu.backend import window as W
from stereo_dso_g2o_tpu.config import default_settings
from test_ba import _build_window

SET = default_settings()


def test_ba_survives_unsupported_frame():
    """A valid frame whose residuals all died (zero pose information, no
    marginal prior) must not NaN the solve; its own pose must not move."""
    win, dI_stack, poses, idepths, K = _build_window(n_pts=96)
    # make frame 3 valid but completely unsupported
    win = win.replace(
        frame_valid=win.frame_valid.at[3].set(True),
        frame_id=win.frame_id.at[3].set(99),
    )
    for it in range(3):
        win, energy, conv, nres = ba.ba_iteration(
            win, dI_stack, jnp.asarray(it), settings=SET
        )
        assert np.isfinite(np.asarray(win.state)).all(), f"NaN state at it{it}"
        assert np.isfinite(float(energy))
    # the unsupported frame's step is pinned in the solve; only the gauge
    # orthogonalization may move it (by the same small amount as everyone)
    assert np.abs(np.asarray(win.state)[3]).max() < 0.05


def test_ba_rejects_nonfinite_steps():
    """Poisoned linearization data must not propagate NaN through the step
    (the in-solver sanity gate zeroes the whole increment)."""
    win, dI_stack, *_ = _build_window(n_pts=96)
    win = win.replace(HM=win.HM.at[0, 0].set(jnp.nan))
    win2, energy, conv, nres = ba.ba_iteration(
        win, dI_stack, jnp.asarray(0), settings=SET
    )
    assert np.isfinite(np.asarray(win2.state)).all()
    assert np.isfinite(np.asarray(win2.pt_idepth)).all()


def test_flag_points_oob_recency_survives_pruning():
    """A point whose residual in the newest keyframe went OOB must be
    flagged even after that residual's res_exists was pruned — the recorded
    res_state IS the reference's lastResiduals[..].second (isOOB,
    HessianBlocks.h:458)."""
    win, dI_stack, *_ = _build_window(n_pts=96)
    last_slot, prev_slot = 2, 1

    pt = 5  # give it solid history so only the recency rule fires
    win = win.replace(
        pt_num_good_res=win.pt_num_good_res.at[pt].set(100),
        # recorded state: OOB in the newest keyframe, residual pruned
        res_state=win.res_state.at[pt, last_slot].set(W.RES_OOB),
        res_exists=win.res_exists.at[pt, last_slot].set(False),
    )
    flagged_frames = jnp.zeros((win.F,), bool)
    win2 = ba.flag_points_for_removal(
        win, dI_stack, flagged_frames,
        jnp.asarray(last_slot), jnp.asarray(prev_slot), settings=SET,
    )
    st = np.asarray(win2.pt_status)
    assert st[pt] in (W.PT_MARGINALIZE, W.PT_DROP), (
        "OOB-in-newest-KF point must leave the active set"
    )
    # control: an identical point whose newest residual is IN stays active
    assert st[6] == W.PT_ACTIVE
