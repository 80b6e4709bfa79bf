"""Sub-stage attribution of the non-KF immature refinement (74.7 ms on-chip,
tools/profile_track_stages.py round 5) — the dominant non-KF stage.

Times cumulative prefixes of immature.trace_on_nonkey (keep in sync):
compact | temporal trace | project+extract(new) | stereo L->R |
extract(right)+stereo R->L | reproject+scatter. Each prefix suite runs for
both trace backends (pallas vs xla), so this doubles as the stage-level
backend perf A/B.

Run: python tools/profile_refine_stages.py   (ambient axon env, warm cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REPS = 5


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend import immature as IMM
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem, _rigid_inv
    from stereo_dso_g2o_tpu.models.camera import make_calib
    from stereo_dso_g2o_tpu.ops import trace as trace_ops
    from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid

    settings = Settings(
        desired_point_density=2000.0,
        desired_immature_density=1500.0,
        immature_cap=2048,
        active_cap=2048,
        affine_opt_mode_a=0.0,
        affine_opt_mode_b=0.0,
    )
    K, seqs = bench.render_sequences()
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], bench.BASE,
                       bench.W_, bench.H_, n_levels=6)
    lefts, rights, _ = seqs[0]

    fs = FullSystem(calib, settings)
    for i in range(bench.BOOT):
        fs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
    gs = GraphSystem.from_full_system(fs)
    for i in range(bench.BOOT, 30):
        gs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
    gs.flush()
    state = gs.state
    s = settings
    win = state.win
    imm = state.imm
    n_live = int(np.asarray(jax.device_get(jnp.sum(imm.valid))))

    # per-host transforms exactly as frame_step._nonkey_refine builds them
    dI_new0, _ = build_pyramid(jnp.asarray(lefts[30]).astype(jnp.float32), 1)
    dI_new = dI_new0[0]
    dI_right = build_pyramid(
        jnp.asarray(rights[30]).astype(jnp.float32), 1
    )[0][0]
    Km = calib.K(0)
    Ki = calib.Ki(0)
    w2c = np.asarray(jax.device_get(win.w2c()))
    T_new = w2c[int(jax.device_get(state.ref_slot))]  # approx: new ~ ref
    T_hn = jnp.einsum("ij,fjk->fik", jnp.asarray(T_new),
                      jnp.linalg.inv(jnp.asarray(w2c)))
    R_hn = T_hn[:, :3, :3]
    t_hn = T_hn[:, :3, 3]
    KRKi = jnp.einsum("ij,fjk,kl->fil", Km, R_hn, Ki)
    Kt = jnp.einsum("ij,fj->fi", Km, t_hn)
    aff_ht = jnp.zeros((win.F, 2)).at[:, 0].set(1.0)
    host_valid = win.frame_valid
    baseline = calib.baseline
    Hd, Wd = dI_new.shape[:2]

    def prefix(upto, backend):
        def run(imm, dI_new, dI_right):
            flat, sel = IMM._compact_live(imm, host_valid, s)
            host = flat["host"]
            if upto == 1:
                return flat["u"], sel
            traced = trace_ops.trace_batch(
                flat["u"], flat["v"], flat["idepth_min"], flat["idepth_max"],
                flat["color"], flat["weights"], flat["gradH"],
                flat["energy_th"], flat["quality"], flat["status"],
                KRKi[host], Kt[host], aff_ht[host], dI_new,
                settings=s, backend=backend,
            )
            if upto == 2:
                return traced
            good = flat["sel_ok"] & (traced.status == trace_ops.IPS_GOOD)
            u2 = jnp.clip(traced.last_uv[:, 0], 8.0, Wd - 9.0)
            v2 = jnp.clip(traced.last_uv[:, 1], 8.0, Hd - 9.0)
            ones = jnp.ones_like(u2)
            P = jnp.stack([flat["u"], flat["v"], ones], -1)
            ptp_min = (
                jnp.einsum("nij,nj->ni", KRKi[host],
                           P / traced.idepth_min[:, None]) + Kt[host]
            )
            id_min_proj = 1.0 / ptp_min[:, 2]
            ptp_max = (
                jnp.einsum("nij,nj->ni", KRKi[host],
                           P / traced.idepth_max[:, None]) + Kt[host]
            )
            id_max_proj = 1.0 / ptp_max[:, 2]
            color2, weights2, gradH2, eth2 = trace_ops.extract_point_data(
                dI_new, u2, v2, s
            )
            if upto == 3:
                return color2, id_min_proj, id_max_proj
            n = u2.shape[0]
            fresh_q = jnp.full((n,), 10000.0)
            fresh_st = jnp.full((n,), trace_ops.IPS_UNINITIALIZED, jnp.int32)
            res_lr, idepth_stereo = trace_ops.trace_stereo(
                u2, v2, id_min_proj, id_max_proj, color2, weights2, gradH2,
                eth2, fresh_q, fresh_st, Km, baseline, dI_right,
                mode_right=True, settings=s, backend=backend,
            )
            if upto == 4:
                return res_lr
            u3 = jnp.clip(res_lr.last_uv[:, 0], 8.0, Wd - 9.0)
            v3 = jnp.clip(res_lr.last_uv[:, 1], 8.0, Hd - 9.0)
            color3, weights3, gradH3, eth3 = trace_ops.extract_point_data(
                dI_right, u3, v3, s
            )
            res_rl, _ = trace_ops.trace_stereo(
                u3, v3, id_min_proj, id_max_proj, color3, weights3, gradH3,
                eth3, jnp.full((n,), 10000.0),
                jnp.full((n,), trace_ops.IPS_UNINITIALIZED, jnp.int32),
                Km, baseline, dI_new, mode_right=False, settings=s,
                backend=backend,
            )
            if upto == 5:
                return res_rl
            return IMM.trace_on_nonkey(
                imm, KRKi, Kt, R_hn, t_hn, aff_ht, dI_new, dI_right, Km,
                baseline, host_valid, settings=s,
            )

        return jax.jit(run)

    names = [
        (1, "compact"),
        (2, "temporal_trace"),
        (3, "project_extract_new"),
        (4, "stereo_lr"),
        (5, "extract_stereo_rl"),
        (6, "full_refine"),
    ]
    # status mix of the live rows: OOB rows no-op inside trace_batch but
    # still occupy kernel lanes — a large OOB fraction would argue for
    # excluding them from the compact pool
    st_live = np.asarray(jax.device_get(imm.status))[
        np.asarray(jax.device_get(imm.valid & host_valid[:, None]))
    ]
    hist = {
        name: int((st_live == code).sum())
        for name, code in [
            ("good", trace_ops.IPS_GOOD), ("oob", trace_ops.IPS_OOB),
            ("outlier", trace_ops.IPS_OUTLIER),
            ("skipped", trace_ops.IPS_SKIPPED),
            ("badcond", trace_ops.IPS_BADCONDITION),
            ("uninit", trace_ops.IPS_UNINITIALIZED),
        ]
    }
    out = {"n_live_immature": n_live, "trace_cap": s.trace_cap,
           "status_hist": hist}
    for backend in ("pallas", "xla"):
        cums = {}
        for upto, name in names:
            if upto == 6 and backend == "xla":
                continue  # trace_on_nonkey uses default_backend internally
            fn = prefix(upto, backend)
            r = fn(imm, dI_new, dI_right)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(N_REPS):
                jax.block_until_ready(fn(imm, dI_new, dI_right))
            dt = (time.perf_counter() - t0) / N_REPS * 1e3
            cums[name] = dt
            print(json.dumps({"backend": backend, "progress": name,
                              "cum_ms": round(dt, 2)}), flush=True)
        stages = {}
        prev = 0.0
        for upto, name in names:
            if name not in cums:
                continue
            stages[f"{backend}_stage_{name}_ms"] = round(cums[name] - prev, 2)
            prev = cums[name]
        out.update(stages)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
