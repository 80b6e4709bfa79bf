import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import default_settings
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.ops import trace as trace_ops
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid

SET = default_settings()


def _setup(seed=0, w=256, h=128, b=0.15):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(w, h)
    left, right, idepth = synthetic.render_stereo_pair(scene, K, w, h, b)
    dIpL, _ = build_pyramid(jnp.asarray(left), 4)
    dIpR, _ = build_pyramid(jnp.asarray(right), 4)
    return K, left, right, idepth, dIpL, dIpR, b


def _grid_points(w, h, margin=20, step=9):
    ys, xs = np.mgrid[margin : h - margin : step, margin : w - margin : step]
    return xs.ravel().astype(np.float32), ys.ravel().astype(np.float32)


def test_trace_stereo_recovers_disparity():
    K, left, right, idepth, dIpL, dIpR, b = _setup()
    w, h = left.shape[1], left.shape[0]
    us, vs = _grid_points(w, h)
    n = len(us)

    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIpL[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    res, idepth_stereo = trace_ops.trace_stereo(
        jnp.asarray(us),
        jnp.asarray(vs),
        jnp.zeros(n, jnp.float32),
        jnp.full(n, jnp.nan, jnp.float32),
        color,
        weights,
        gradH,
        eth,
        jnp.full(n, 10000.0, jnp.float32),
        jnp.full(n, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        jnp.asarray(K, dtype=jnp.float32),
        jnp.float32(b),
        dIpR[0],
        mode_right=True,
        settings=SET,
    )
    st = np.asarray(res.status)
    good = st == trace_ops.IPS_GOOD
    # most grid points on a textured plane should match
    assert good.mean() > 0.5, f"only {good.mean():.2%} good"

    gt = idepth[vs.astype(int), us.astype(int)]
    est = np.asarray(idepth_stereo)
    err = np.abs(est[good] - gt[good])
    # idepth error bound: errorInPixel pixels of disparity -> err/bf
    bf = K[0, 0] * b
    bound = np.asarray(res.pixel_interval)[good] / bf + 2e-3
    frac_in_bound = (err < bound).mean()
    assert np.median(err) < 0.01, np.median(err)
    assert frac_in_bound > 0.9, frac_in_bound

    # interval must bracket the estimate
    lo = np.asarray(res.idepth_min)[good]
    hi = np.asarray(res.idepth_max)[good]
    assert (lo <= hi).all()


def test_trace_oob_status():
    """Points whose epipolar projection leaves the image go OOB."""
    K, left, right, idepth, dIpL, dIpR, b = _setup()
    us = jnp.asarray([5.0])  # too close to the border (uMin > 4 fails after shift)
    vs = jnp.asarray([5.0])
    color, weights, gradH, eth = trace_ops.extract_point_data(dIpL[0], us, vs, SET)
    res, _ = trace_ops.trace_stereo(
        us, vs, jnp.zeros(1), jnp.full(1, jnp.nan), color, weights, gradH, eth,
        jnp.full(1, 10000.0), jnp.full(1, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        jnp.asarray(K, dtype=jnp.float32), jnp.float32(b), dIpR[0],
        mode_right=True, settings=SET,
    )
    # tracing right with positive disparity moves left: u=5 - disp < 4 at the
    # far end of the search, so either OOB or (rarely) OUTLIER — never GOOD
    # with a wildly wrong idepth. Accept OOB as the expected dominant outcome.
    assert int(res.status[0]) in (trace_ops.IPS_OOB, trace_ops.IPS_OUTLIER)


def test_trace_frozen_oob_stays_oob():
    K, left, right, idepth, dIpL, dIpR, b = _setup()
    us = jnp.asarray([100.0])
    vs = jnp.asarray([60.0])
    color, weights, gradH, eth = trace_ops.extract_point_data(dIpL[0], us, vs, SET)
    res, _ = trace_ops.trace_stereo(
        us, vs, jnp.zeros(1), jnp.full(1, jnp.nan), color, weights, gradH, eth,
        jnp.full(1, 10000.0), jnp.full(1, trace_ops.IPS_OOB, jnp.int32),
        jnp.asarray(K, dtype=jnp.float32), jnp.float32(b), dIpR[0],
        mode_right=True, settings=SET,
    )
    assert int(res.status[0]) == trace_ops.IPS_OOB


def test_trace_temporal_identity():
    """Tracing a frame against itself with identity motion: the epipolar
    segment collapses; with a tight interval the trace reports SKIPPED."""
    K, left, right, idepth, dIpL, dIpR, b = _setup()
    w, h = left.shape[1], left.shape[0]
    us, vs = _grid_points(w, h, margin=30, step=17)
    n = len(us)
    gt = idepth[vs.astype(int), us.astype(int)]
    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIpL[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    KRKi = jnp.eye(3, dtype=jnp.float32)  # identity motion: K R K^-1 = I
    Kt = jnp.zeros(3, dtype=jnp.float32)
    res = trace_ops.trace(
        jnp.asarray(us), jnp.asarray(vs),
        jnp.asarray(gt * 0.95), jnp.asarray(gt * 1.05),
        color, weights, gradH, eth,
        jnp.full(n, 10000.0, jnp.float32),
        jnp.full(n, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        KRKi, Kt, jnp.asarray([1.0, 0.0], dtype=jnp.float32), dIpL[0],
        settings=SET,
    )
    st = np.asarray(res.status)
    assert (st == trace_ops.IPS_SKIPPED).mean() > 0.95, st


def test_trace_temporal_translation():
    """Temporal trace under a known forward+lateral motion recovers idepth."""
    scene = synthetic.default_scene(5)
    w, h, b = 256, 128, 0.15
    K = synthetic.default_K(w, h)
    left0, _, idepth0 = synthetic.render_stereo_pair(scene, K, w, h, b)
    T = np.eye(4)
    T[:3, 3] = [0.15, 0.05, 0.1]  # host -> target camera motion
    left1, _ = synthetic.render(scene, K, w, h, T)

    dIp0, _ = build_pyramid(jnp.asarray(left0), 4)
    dIp1, _ = build_pyramid(jnp.asarray(left1), 4)

    us, vs = _grid_points(w, h, margin=25, step=11)
    n = len(us)
    gt = idepth0[vs.astype(int), us.astype(int)]

    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIp0[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    Kj = jnp.asarray(K, dtype=jnp.float32)
    R = jnp.asarray(T[:3, :3], dtype=jnp.float32)
    t = jnp.asarray(T[:3, 3], dtype=jnp.float32)
    KRKi = Kj @ R @ jnp.linalg.inv(Kj)
    Kt = Kj @ t
    res = trace_ops.trace(
        jnp.asarray(us), jnp.asarray(vs),
        jnp.zeros(n, jnp.float32), jnp.full(n, jnp.nan, jnp.float32),
        color, weights, gradH, eth,
        jnp.full(n, 10000.0, jnp.float32),
        jnp.full(n, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        KRKi, Kt, jnp.asarray([1.0, 0.0], dtype=jnp.float32), dIp1[0],
        settings=SET,
    )
    st = np.asarray(res.status)
    good = st == trace_ops.IPS_GOOD
    assert good.mean() > 0.4, good.mean()
    lo = np.asarray(res.idepth_min)[good]
    hi = np.asarray(res.idepth_max)[good]
    mid = 0.5 * (lo + hi)
    err = np.abs(mid - gt[good]) / gt[good]
    assert np.median(err) < 0.05, np.median(err)


def test_trace_pallas_matches_xla():
    """The VMEM slab kernel (interpret mode on CPU) must agree with the XLA
    gather formulation: same status machine, same best positions to within
    bf16 sampling noise. Regression guard for the round-1 NN-vs-bilinear
    deviation (VERDICT weak #7): both paths are bilinear now."""
    scene = synthetic.default_scene(5)
    w, h, b = 256, 128, 0.15
    K = synthetic.default_K(w, h)
    left0, _, idepth0 = synthetic.render_stereo_pair(scene, K, w, h, b)
    T = np.eye(4)
    T[:3, 3] = [0.12, 0.04, 0.08]
    left1, _ = synthetic.render(scene, K, w, h, T)
    dIp0, _ = build_pyramid(jnp.asarray(left0), 4)
    dIp1, _ = build_pyramid(jnp.asarray(left1), 4)
    us, vs = _grid_points(w, h, margin=25, step=13)
    n = len(us)
    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIp0[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    Kj = jnp.asarray(K, dtype=jnp.float32)
    KRKi = Kj @ jnp.asarray(T[:3, :3], jnp.float32) @ jnp.linalg.inv(Kj)
    Kt = Kj @ jnp.asarray(T[:3, 3], jnp.float32)
    args = (
        jnp.asarray(us), jnp.asarray(vs),
        jnp.zeros(n, jnp.float32), jnp.full(n, jnp.nan, jnp.float32),
        color, weights, gradH, eth,
        jnp.full(n, 10000.0, jnp.float32),
        jnp.full(n, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        KRKi, Kt, jnp.asarray([1.0, 0.0], dtype=jnp.float32), dIp1[0],
    )
    rx = trace_ops.trace(*args, settings=SET, backend="xla")
    rp = trace_ops.trace(*args, settings=SET, backend="pallas")
    st_x = np.asarray(rx.status)
    st_p = np.asarray(rp.status)
    # statuses agree except where bf16 ties flip a marginal gate
    assert (st_x == st_p).mean() > 0.9, (st_x, st_p)
    both_good = (st_x == trace_ops.IPS_GOOD) & (st_p == trace_ops.IPS_GOOD)
    assert both_good.sum() > 10
    du = np.abs(np.asarray(rx.last_uv) - np.asarray(rp.last_uv))[both_good]
    assert np.median(du) < 0.1, np.median(du)
    dmin = np.abs(np.asarray(rx.idepth_min) - np.asarray(rp.idepth_min))
    rel = dmin[both_good] / np.maximum(np.asarray(rx.idepth_min)[both_good], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)


def test_trace_stereo_pallas_matches_xla():
    """The stereo trace through the slab kernel (horizontal special case,
    interpret mode on CPU) must agree with the strip-slice XLA formulation."""
    scene = synthetic.default_scene(6)
    w, h, b = 256, 128, 0.2
    K = synthetic.default_K(w, h)
    left, right, idepth = synthetic.render_stereo_pair(scene, K, w, h, b)
    dIl, _ = build_pyramid(jnp.asarray(left), 4)
    dIr, _ = build_pyramid(jnp.asarray(right), 4)
    us, vs = _grid_points(w, h, margin=25, step=13)
    n = len(us)
    color, weights, gradH, eth = trace_ops.extract_point_data(
        dIl[0], jnp.asarray(us), jnp.asarray(vs), SET
    )
    Kj = jnp.asarray(K, dtype=jnp.float32)
    args = (
        jnp.asarray(us), jnp.asarray(vs),
        jnp.zeros(n, jnp.float32), jnp.full(n, jnp.nan, jnp.float32),
        color, weights, gradH, eth,
        jnp.full(n, 10000.0, jnp.float32),
        jnp.full(n, trace_ops.IPS_UNINITIALIZED, jnp.int32),
        Kj, jnp.float32(b), dIr[0],
    )
    rx, idx_x = trace_ops.trace_stereo(
        *args, mode_right=True, settings=SET, backend="xla"
    )
    rp, idx_p = trace_ops.trace_stereo(
        *args, mode_right=True, settings=SET, backend="pallas"
    )
    st_x = np.asarray(rx.status)
    st_p = np.asarray(rp.status)
    assert (st_x == st_p).mean() > 0.9, (st_x, st_p)
    both_good = (st_x == trace_ops.IPS_GOOD) & (st_p == trace_ops.IPS_GOOD)
    assert both_good.sum() > 10
    du = np.abs(np.asarray(rx.last_uv[:, 0]) - np.asarray(rp.last_uv[:, 0]))
    assert np.median(du[both_good]) < 0.1, np.median(du[both_good])
    did = np.abs(np.asarray(idx_x) - np.asarray(idx_p))[both_good]
    rel = did / np.maximum(np.abs(np.asarray(idx_x))[both_good], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)


def test_trace_compaction_overflow_keeps_rows():
    """When live rows exceed trace_cap, overflow rows must keep their state
    (no corruption) while in-budget rows trace normally."""
    import dataclasses as _dc

    from stereo_dso_g2o_tpu.frontend import immature as IMM

    scene = synthetic.default_scene(5)
    w, h = 192, 96
    K = synthetic.default_K(w, h)
    left0, _, idepth0 = synthetic.render_stereo_pair(scene, K, w, h, 0.2)
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.02, 0.05]
    left1, _ = synthetic.render(scene, K, w, h, T)
    dIp0, _ = build_pyramid(jnp.asarray(left0), 3)
    dIp1, _ = build_pyramid(jnp.asarray(left1), 3)

    F, C = 2, 64
    imm = IMM.empty(F, C)
    us, vs = _grid_points(w, h, margin=20, step=6)
    assert len(us) >= F * C
    us, vs = us[: F * C], vs[: F * C]
    for f in range(F):
        seg = slice(f * C, (f + 1) * C)
        color, weights, gradH, eth = trace_ops.extract_point_data(
            dIp0[0], jnp.asarray(us[seg]), jnp.asarray(vs[seg]), SET
        )
        imm = imm.replace(
            valid=imm.valid.at[f].set(True),
            u=imm.u.at[f].set(jnp.asarray(us[seg])),
            v=imm.v.at[f].set(jnp.asarray(vs[seg])),
            color=imm.color.at[f].set(color),
            weights=imm.weights.at[f].set(weights),
            gradH=imm.gradH.at[f].set(gradH),
            energy_th=imm.energy_th.at[f].set(eth),
        )
    Kj = jnp.asarray(K, jnp.float32)
    KRKi = Kj @ jnp.asarray(T[:3, :3], jnp.float32) @ jnp.linalg.inv(Kj)
    Kt = Kj @ jnp.asarray(T[:3, 3], jnp.float32)
    KRKi_f = jnp.broadcast_to(KRKi, (F, 3, 3))
    Kt_f = jnp.broadcast_to(Kt, (F, 3))
    aff = jnp.broadcast_to(jnp.asarray([1.0, 0.0], jnp.float32), (F, 2))
    hv = jnp.ones((F,), bool)

    full = IMM.trace_on_frame(imm, KRKi_f, Kt_f, aff, dIp1[0], hv, SET)
    tight = _dc.replace(SET, trace_cap=96)  # < 128 live rows
    part = IMM.trace_on_frame(imm, KRKi_f, Kt_f, aff, dIp1[0], hv, tight)

    st_full = np.asarray(full.status).reshape(-1)
    st_part = np.asarray(part.status).reshape(-1)
    # first 96 live rows must match the untruncated result exactly
    assert (st_part[:96] == st_full[:96]).all()
    # overflow rows must be untouched (still UNINITIALIZED, intervals intact)
    assert (st_part[96:] == trace_ops.IPS_UNINITIALIZED).all()
    assert np.isnan(np.asarray(part.idepth_max).reshape(-1)[96:]).all()


def test_split_precision_dots_are_f32_accurate():
    """The kernel's hi/lo bf16 split dots (`_dot_bf16x3`, `_dot_exact_rhs`)
    must stay within ~0.01 gray of the exact product on image-valued
    operands. Mosaic only exposes DEFAULT (one bf16 pass) and HIGHEST (six
    passes); the split recovers f32-class accuracy at DEFAULT-pass cost —
    single-pass bf16 was the round-3 accuracy bug (~0.5-1 gray per sample,
    4x rel-rot blowup, PERF.md round 4). On CPU the DEFAULT-precision dots
    run in full f32, so this check covers the hi-term numerics (exact
    either way) but NOT the on-chip bf16 truncation of the al/bl residual
    operands in the cross terms — the second-order error model below
    round-trips those residuals through bf16 to bound that part too."""
    from stereo_dso_g2o_tpu.ops import trace_pallas as tk

    rng = np.random.default_rng(7)
    R, C, SP = 64, 256, 368
    slab = jnp.asarray(rng.uniform(0.0, 255.0, (R, C)).astype(np.float32))
    sx = rng.uniform(4, C - 5, SP).astype(np.float32)
    wc = jnp.asarray(
        np.maximum(
            0.0, 1.0 - np.abs(sx[None, :] - np.arange(C, dtype=np.float32)[:, None])
        )
    )
    exact = np.asarray(slab, np.float64) @ np.asarray(wc, np.float64)
    got = np.asarray(tk._dot_bf16x3(slab, wc))
    assert np.abs(got - exact).max() < 0.01, np.abs(got - exact).max()

    # single-pass bf16 (what DEFAULT would do) must be measurably WORSE —
    # guards against the helper silently degenerating to one pass
    one_pass = np.asarray(
        jnp.dot(
            slab.astype(jnp.bfloat16).astype(jnp.float32).astype(jnp.bfloat16),
            wc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    assert np.abs(one_pass - exact).max() > 0.1

    # on-chip error model: DEFAULT also truncates the al/bl RESIDUAL
    # operands of the cross terms to bf16 (CPU runs them in full f32).
    # Simulate that truncation explicitly and verify the result is still
    # inside the same accuracy bound — i.e. the extra on-chip error is
    # second-order, not a reappearance of the one-pass bug.
    def bf16(x):
        return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)

    ah, bh = bf16(slab), bf16(wc)
    al_t, bl_t = bf16(slab - ah), bf16(wc - bh)  # <- the on-chip truncation
    tpu_model = np.asarray(ah @ bh + ah @ bl_t + al_t @ bh)
    assert np.abs(tpu_model - exact).max() < 0.01, np.abs(tpu_model - exact).max()

    # selection-matrix variant: exact 0/1 rhs
    a = jnp.asarray(rng.uniform(-300.0, 300.0, (1, 8)).astype(np.float32))
    E = jnp.asarray(
        (rng.integers(0, 2, (8, SP))).astype(np.float32)
    )
    exact2 = np.asarray(a, np.float64) @ np.asarray(E, np.float64)
    got2 = np.asarray(tk._dot_exact_rhs(a, E))
    # f32-class: the only error left is f32 accumulation-order rounding,
    # so normalize by the cancellation-free magnitude sum, not the result
    mag = np.abs(np.asarray(a, np.float64)) @ np.asarray(E, np.float64)
    rel = np.abs(got2 - exact2) / np.maximum(mag, 1.0)
    assert rel.max() < 1e-5, rel.max()
