import jax
import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.backend import ba, builder
from stereo_dso_g2o_tpu.backend import window as W
from stereo_dso_g2o_tpu.config import CPARS, default_settings
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.ops import trace as trace_ops
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.utils import se3

SET = default_settings()
WID, HGT = 192, 96
NF = 3
NPCAP = 256
FCAP = 4


def _build_window(seed=0, n_pts=120, pose_noise=0.0, idepth_noise=0.0):
    """3-frame window on a rendered plane with optionally perturbed states."""
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(WID, HGT)
    rng = np.random.default_rng(seed)

    poses = []
    for i in range(NF):
        xi = np.array([0.06 * i, -0.02 * i, 0.04 * i, 0.003 * i, 0.008 * i, -0.002 * i])
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64))

    def blur(im):
        # two 3x3 box passes: image-gradient smoothness makes the central-diff
        # gradients consistent with the bilinear sampling surface
        for _ in range(2):
            p = np.pad(im, 1, mode="edge")
            im = sum(
                p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ) / 9.0
        return im.astype(np.float32)

    imgs, idepths = [], []
    for T in poses:
        img, idp = synthetic.render(scene, K, WID, HGT, T)
        imgs.append(blur(img))
        idepths.append(idp)

    dIs = [build_pyramid(jnp.asarray(im), 1)[0][0] for im in imgs]
    dI_stack = jnp.stack(dIs)  # (NF, H, W, 3)
    dI_stack = jnp.concatenate(
        [dI_stack, jnp.zeros((FCAP - NF,) + dI_stack.shape[1:])], axis=0
    )

    win = W.empty_window(FCAP, NPCAP, [K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    for i in range(NF):
        T_pert = poses[i]
        if pose_noise > 0 and i > 0:
            xi_n = rng.standard_normal(6) * pose_noise
            T_pert = np.asarray(
                se3.se3_exp(jnp.asarray(xi_n, dtype=jnp.float32)), dtype=np.float64
            ) @ poses[i]
        win = builder.insert_frame(win, i, T_pert, (0.0, 0.0), 1.0, i)

    # points hosted in frame 0
    us = rng.integers(10, WID - 10, n_pts).astype(np.float32)
    vs = rng.integers(10, HGT - 10, n_pts).astype(np.float32)
    ids = idepths[0][vs.astype(int), us.astype(int)].astype(np.float32)
    if idepth_noise > 0:
        ids = ids * (1.0 + rng.standard_normal(n_pts).astype(np.float32) * idepth_noise)
    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIs[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    win = builder.insert_points(
        win, np.arange(n_pts), 0, jnp.asarray(us), jnp.asarray(vs),
        jnp.asarray(ids), color, weights, eth,
    )
    win = builder.add_residuals(win, np.arange(n_pts), 1)
    win = builder.add_residuals(win, np.arange(n_pts), 2)
    return win, dI_stack, poses, idepths, K


def test_linearize_zero_residual_at_ground_truth():
    win, dI_stack, poses, idepths, K = _build_window()
    from stereo_dso_g2o_tpu.ops import residuals as R

    lin = R.linearize(win, dI_stack, settings=SET)
    active = np.asarray(win.res_exists)
    e = np.asarray(lin.energy)[active]
    st = np.asarray(lin.new_state)[active]
    # at ground truth most residuals are IN with tiny energy
    assert (st == W.RES_IN).mean() > 0.9
    assert np.median(e[st == W.RES_IN]) < 15.0, np.median(e)


def test_jacobian_idepth_numeric():
    """Jpdd + JIdx chain vs numeric diff of the actual pattern residual."""
    win, dI_stack, poses, idepths, K = _build_window()
    from stereo_dso_g2o_tpu.ops import residuals as R

    lin = R.linearize(win, dI_stack, settings=SET)

    eps = 1e-4
    win_p = win.replace(
        pt_idepth=win.pt_idepth + eps, pt_idepth_zero=win.pt_idepth_zero + eps
    )
    lin_p = R.linearize(win_p, dI_stack, settings=SET)
    win_m = win.replace(
        pt_idepth=win.pt_idepth - eps, pt_idepth_zero=win.pt_idepth_zero - eps
    )
    lin_m = R.linearize(win_m, dI_stack, settings=SET)

    # numeric dresF/didepth vs analytic JIdx^T Jpdd (per pattern pixel)
    num = (np.asarray(lin_p.resF) - np.asarray(lin_m.resF)) / (2 * eps)
    ana = (
        np.asarray(lin.JIdx)[:, :, 0, :] * np.asarray(lin.Jpdd)[:, :, 0:1]
        + np.asarray(lin.JIdx)[:, :, 1, :] * np.asarray(lin.Jpdd)[:, :, 1:2]
    )
    ok = (
        np.asarray(win.res_exists)
        & (np.asarray(lin.new_state) == W.RES_IN)
        & (np.asarray(lin_p.new_state) == W.RES_IN)
        & (np.asarray(lin_m.new_state) == W.RES_IN)
    )
    num_ok = num[ok]
    ana_ok = ana[ok]
    denom = np.abs(ana_ok) + 5.0
    rel = np.abs(num_ok - ana_ok) / denom
    # bilinear interpolation is piecewise linear; gradients differ at cell
    # boundaries — accept median agreement
    assert np.median(rel) < 0.15, np.median(rel)


def test_ba_converges_from_perturbation():
    win, dI_stack, poses, idepths, K = _build_window(
        seed=3, pose_noise=2e-3, idepth_noise=0.03
    )
    win2, energy, nres = ba.optimize(win, dI_stack, settings=SET, max_its=8)

    # mono windowed BA has a free scale gauge (the reference's 7-dof
    # nullspace); stereo anchors it elsewhere (depth priors / stereo traces).
    # Compare modulo scale: lambda from the idepth ratio.
    ids = np.asarray(win2.pt_idepth)[:120]
    us = np.asarray(win2.pt_u)[:120].astype(int)
    vs = np.asarray(win2.pt_v)[:120].astype(int)
    gt = idepths[0][vs, us]
    lam = np.median(gt / ids)

    w2c = np.asarray(win2.w2c())
    for i in (1, 2):
        T_rel_est = w2c[i] @ np.linalg.inv(w2c[0])
        T_rel_gt = poses[i] @ np.linalg.inv(poses[0])
        T_al = T_rel_est.copy()
        T_al[:3, 3] /= lam  # undo the scale gauge
        err = np.asarray(
            se3.se3_log(jnp.asarray(T_al @ np.linalg.inv(T_rel_gt), dtype=jnp.float64))
        )
        assert np.linalg.norm(err[:3]) < 5e-3, (i, err, lam)
        assert np.linalg.norm(err[3:]) < 1e-3, (i, err)

    rel = np.abs(ids * lam - gt) / gt
    assert np.median(rel) < 0.02, np.median(rel)

    # the sharper optimality statement: the converged state's photometric
    # energy must not exceed the energy at geometric ground truth (the
    # photometric minimum of a sampled/blurred scene sits slightly off GT)
    from stereo_dso_g2o_tpu.ops import residuals as R

    win_gt, _, _, _, _ = _build_window(seed=3)
    lin_gt = R.linearize(win_gt, dI_stack, settings=SET)
    e_gt = float(
        np.where(np.asarray(win_gt.res_exists), np.asarray(lin_gt.energy), 0).sum()
    )
    lin_fin = R.linearize(win2, dI_stack, settings=SET)
    e_fin = float(
        np.where(np.asarray(win2.res_exists), np.asarray(lin_fin.energy), 0).sum()
    )
    assert e_fin <= e_gt * 1.05, (e_fin, e_gt)


def test_ba_energy_decreases():
    win, dI_stack, poses, idepths, K = _build_window(
        seed=4, pose_noise=3e-3, idepth_noise=0.05
    )
    energies = []
    for it in range(5):
        win, e, conv, nres = ba.ba_iteration(
            win, dI_stack, jnp.asarray(it), settings=SET
        )
        energies.append(float(e))
    assert energies[-1] < energies[0] * 0.5, energies


def test_marginalize_frame_matches_dense_schur():
    """Frame marginalization == dense Schur elimination of the 8-block."""
    rng = np.random.default_rng(0)
    win = W.empty_window(FCAP, 8, [100.0, 100.0, 50.0, 50.0])
    for i in range(3):
        win = builder.insert_frame(win, i, np.eye(4), (0.0, 0.0), 1.0, i + 1)
    D = CPARS + 8 * FCAP
    A = rng.standard_normal((D, D))
    HM = A @ A.T + 10 * np.eye(D)
    bM = rng.standard_normal(D)
    win = win.replace(HM=jnp.asarray(HM, jnp.float32), bM=jnp.asarray(bM, jnp.float32))

    slot = 1
    win2 = ba.marginalize_frame(win, slot, settings=SET)

    # dense reference (float64): eliminate the slot's 8 indices
    io = CPARS + 8 * slot
    keep = np.ones(D, bool)
    keep[io : io + 8] = False
    # no frame prior contribution here (frame_id != 0 => only affine priors)
    pf = np.zeros(8)
    pf[6] = SET.affine_opt_mode_a
    pf[7] = SET.affine_opt_mode_b
    Hd = HM.copy()
    bd = bM.copy()
    Hd[io + np.arange(8), io + np.arange(8)] += pf
    # delta_prior = state = 0 for this synthetic case -> no b change
    Hkk = Hd[np.ix_(keep, keep)]
    Hkm = Hd[np.ix_(keep, ~keep)]
    Hmm = Hd[np.ix_(~keep, ~keep)]
    bk = bd[keep]
    bm = bd[~keep]
    H_ref = Hkk - Hkm @ np.linalg.inv(Hmm) @ Hkm.T
    b_ref = bk - Hkm @ np.linalg.inv(Hmm) @ bm

    H_out = np.asarray(win2.HM)[np.ix_(keep, keep)]
    b_out = np.asarray(win2.bM)[keep]
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H_out, H_ref, atol=2e-3 * scale)
    np.testing.assert_allclose(
        b_out, b_ref, atol=1e-3 * max(np.abs(b_ref).max(), 1.0)
    )
    assert not bool(win2.frame_valid[slot])


def test_point_marginalization_preserves_solution():
    """Marginalizing points folds their information into HM/bM: after
    marginalization the remaining system still pulls toward the same pose."""
    win, dI_stack, poses, idepths, K = _build_window(seed=5)
    win, e, nres = ba.optimize(win, dI_stack, settings=SET, max_its=4)

    # flag half the points for marginalization via the real path
    frames_to_marg = jnp.zeros(FCAP, bool)
    win_f = ba.flag_points_for_removal(
        win, dI_stack, frames_to_marg, jnp.asarray(2), jnp.asarray(1), settings=SET
    )
    # manually force the first 60 points to marginalize (they're healthy, so
    # flag_points wouldn't; this simulates a frame being dropped)
    lin_mask = (jnp.arange(NPCAP) < 60)[:, None] & win_f.res_exists & (
        win_f.res_state == W.RES_IN
    )
    rtz = ba.res_to_zero_fixed(win_f)
    win_f = win_f.replace(
        res_to_zero=jnp.where(lin_mask[..., None], rtz, win_f.res_to_zero),
        res_linearized=win_f.res_linearized | lin_mask,
        pt_status=jnp.where(
            jnp.arange(NPCAP) < 60, W.PT_MARGINALIZE, win_f.pt_status
        ),
        pt_idepth_hessian=jnp.maximum(win_f.pt_idepth_hessian, 100.0),
    )
    HM_before = np.asarray(win_f.HM).copy()
    win_m = ba.marginalize_points(win_f, settings=SET)
    HM_after = np.asarray(win_m.HM)
    assert (np.abs(HM_after) > 0).any()
    assert np.abs(HM_after - HM_before).max() > 0  # information was added
    assert int((np.asarray(win_m.pt_status) == W.PT_ACTIVE).sum()) == 60
    # HM must stay symmetric PSD-ish (float32 accumulation noise scales with
    # the largest entries)
    np.testing.assert_allclose(
        HM_after, HM_after.T, atol=1e-4 * np.abs(HM_after).max()
    )
    evals = np.linalg.eigvalsh(HM_after.astype(np.float64))
    assert evals.min() > -1e-1 * max(evals.max(), 1.0), evals.min()
