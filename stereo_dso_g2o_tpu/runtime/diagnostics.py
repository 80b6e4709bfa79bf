"""Solver observability: eigenvalue / Hessian-diagonal / nullspace dumps.

The reference streams these per-keyframe when setting_logStuff is on
(FullSystem::printEigenValLine, FullSystem.cpp:1689-1768: eigenvalues of the
last H, its pose/a-b sub-blocks, the Hessian diagonal, and the nullspace
columns; the log files are opened in FullSystem.cpp:71-126). This module
reproduces the same dump as one JSONL record so accuracy drift during perf
work is attributable to a specific direction of the state space.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.backend import ba, window as W
from stereo_dso_g2o_tpu.config import CPARS, Settings, default_settings


@functools.partial(jax.jit, static_argnames=("settings",))
def _hessian_parts(win: W.Window, settings: Settings):
    """Final-state H (A-mode + priors + marginal prior - Schur), eigendata."""
    AH, AT = ba.adjoints(win)
    active = win.res_exists & (win.res_state == W.RES_IN)
    mode0 = active & ~win.res_linearized
    accA = ba.accumulate_top(win, AH, AT, mode0, 0, settings, use_prior=True)
    prior_pt = ba.point_prior(win, settings)
    sc = ba.accumulate_sc(win, AH, AT, active, accA, prior_pt, True)
    H = accA.H + win.HM - sc.H
    D = H.shape[0]
    # the reference logs eigenvalues of the undamped system
    ev_all = jnp.linalg.eigvalsh(0.5 * (H + H.T))
    # pose block (6 dof per frame) and a/b block, like ev_H_A / ev_H_ab
    F = win.F
    pose_idx = CPARS + (jnp.arange(F * 8).reshape(F, 8)[:, :6]).reshape(-1)
    ab_idx = CPARS + (jnp.arange(F * 8).reshape(F, 8)[:, 6:]).reshape(-1)
    Hp = H[jnp.ix_(pose_idx, pose_idx)]
    Hab = H[jnp.ix_(ab_idx, ab_idx)]
    ev_pose = jnp.linalg.eigvalsh(0.5 * (Hp + Hp.T))
    ev_ab = jnp.linalg.eigvalsh(0.5 * (Hab + Hab.T))
    diag = jnp.diagonal(H)
    N = ba.nullspaces(win)
    # nullspace response: ||H n|| / ||n|| per column (should be ~0 in the
    # gauge directions the orthogonalization removes)
    HN = H @ N
    resp = jnp.linalg.norm(HN, axis=0) / jnp.maximum(
        jnp.linalg.norm(N, axis=0), 1e-12
    )
    return ev_all, ev_pose, ev_ab, diag, resp


def eigenvalue_record(win: W.Window, settings: Settings = default_settings()):
    """One JSON-ready dict mirroring printEigenValLine's content."""
    ev_all, ev_pose, ev_ab, diag, resp = _hessian_parts(win, settings)
    ev_all, ev_pose, ev_ab, diag, resp = jax.device_get(
        (ev_all, ev_pose, ev_ab, diag, resp)
    )
    return {
        "type": "eig",
        "ev_H": np.round(np.sort(ev_all)[::-1], 6).tolist(),
        "ev_H_pose": np.round(np.sort(ev_pose)[::-1], 6).tolist(),
        "ev_H_ab": np.round(np.sort(ev_ab)[::-1], 6).tolist(),
        "H_diag": np.round(diag, 6).tolist(),
        "nullspace_response": np.round(resp, 8).tolist(),
    }
