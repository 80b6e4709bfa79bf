"""Isolate why epipolar_search costs ~17.5 ms in the production refine
program but ~0.7 ms in the microbench (same shapes, same kernel).

Runs trace_batch(backend=pallas) as a STANDALONE jit on the exact live
compact-pool inputs from a bootstrapped bench state (production data), then
on the microbench's synthetic inputs — same shapes. If production data is
slow standalone too, the cost is data-dependent (DMA locality / masked
lanes); if not, it is program-context-dependent (fusion/VMEM pressure
around the custom call).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem
    from stereo_dso_g2o_tpu.models.camera import make_calib
    from stereo_dso_g2o_tpu.ops import trace as trace_ops
    from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid

    settings = Settings(
        desired_point_density=2000.0, desired_immature_density=1500.0,
        immature_cap=2048, active_cap=2048,
        affine_opt_mode_a=0.0, affine_opt_mode_b=0.0,
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
    win = state.win

    dI_new = build_pyramid(jnp.asarray(lefts[30]).astype(jnp.float32), 1)[0][0]
    Km, Ki = calib.K(0), calib.Ki(0)
    w2c = np.asarray(jax.device_get(win.w2c()))
    T_new = w2c[int(jax.device_get(state.ref_slot))]
    T_hn = jnp.einsum("ij,fjk->fik", jnp.asarray(T_new),
                      jnp.linalg.inv(jnp.asarray(w2c)))
    KRKi = jnp.einsum("ij,fjk,kl->fil", Km, T_hn[:, :3, :3], Ki)
    Kt = jnp.einsum("ij,fj->fi", Km, T_hn[:, :3, 3])
    aff_ht = jnp.zeros((win.F, 2)).at[:, 0].set(1.0)

    flat, sel = jax.jit(
        lambda imm: IMM._compact_live(imm, win.frame_valid, settings)
    )(state.imm)
    flat = jax.device_get(flat)  # concrete host values
    host = flat["host"]
    args_prod = dict(
        u=jnp.asarray(flat["u"]), v=jnp.asarray(flat["v"]),
        idepth_min=jnp.asarray(flat["idepth_min"]),
        idepth_max=jnp.asarray(flat["idepth_max"]),
        color=jnp.asarray(flat["color"]), weights=jnp.asarray(flat["weights"]),
        gradH=jnp.asarray(flat["gradH"]),
        energy_th=jnp.asarray(flat["energy_th"]),
        quality=jnp.asarray(flat["quality"]),
        status=jnp.asarray(flat["status"]),
        KRKi=jnp.asarray(np.asarray(jax.device_get(KRKi))[host]),
        Kt=jnp.asarray(np.asarray(jax.device_get(Kt))[host]),
        aff=jnp.asarray(np.asarray(jax.device_get(aff_ht))[host]),
    )
    N = args_prod["u"].shape[0]
    st = np.asarray(flat["status"])
    rep = {"n_lanes": int(N),
           "n_status_oob": int((st == trace_ops.IPS_OOB).sum()),
           "n_uninit_maxinf": int((~np.isfinite(flat["idepth_max"])).sum())}

    def timeit(fn, reps=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    def run(a):
        return trace_ops.trace_batch(
            a["u"], a["v"], a["idepth_min"], a["idepth_max"], a["color"],
            a["weights"], a["gradH"], a["energy_th"], a["quality"],
            a["status"], a["KRKi"], a["Kt"], a["aff"], dI_new,
            settings=settings, backend="pallas",
        )

    rep["standalone_production_data_ms"] = round(
        timeit(lambda: run(args_prod)), 2)

    # synthetic microbench-style data, same lane count
    rng = np.random.default_rng(1)
    args_syn = dict(args_prod)
    args_syn["u"] = jnp.asarray(
        rng.uniform(16, bench.W_ - 16, N).astype(np.float32))
    args_syn["v"] = jnp.asarray(
        rng.uniform(16, bench.H_ - 16, N).astype(np.float32))
    idt = rng.uniform(1 / 40.0, 1 / 5.0, N).astype(np.float32)
    args_syn["idepth_min"] = jnp.asarray(idt * 0.7)
    args_syn["idepth_max"] = jnp.asarray(idt * 1.5)
    args_syn["status"] = jnp.full((N,), trace_ops.IPS_UNINITIALIZED, jnp.int32)
    rep["standalone_synthetic_data_ms"] = round(
        timeit(lambda: run(args_syn)), 2)

    # synthetic but with idepth_max = inf (fresh points: full-length search)
    args_inf = dict(args_syn)
    args_inf["idepth_max"] = jnp.full((N,), np.inf, jnp.float32)
    rep["standalone_inf_interval_ms"] = round(
        timeit(lambda: run(args_inf)), 2)

    # DIRECT kernel call on microbench-style inputs (same N, S): if this is
    # fast while trace_batch is slow, the cost is in XLA glue/layout around
    # the custom call, not the kernel itself
    from stereo_dso_g2o_tpu.ops import trace_pallas as tk
    from stereo_dso_g2o_tpu.config import PATTERN

    img_pad, oy, ox = jax.jit(tk.pad_image_for_search)(dI_new[..., 0])
    img_pad = jax.block_until_ready(img_pad)
    Hp, Wp = img_pad.shape
    S = 46
    dxn = jnp.full((N,), 0.9, jnp.float32)
    dyn = jnp.full((N,), 0.43, jnp.float32)
    ns = jnp.full((N,), S - 2, jnp.int32)
    y0, x0, ptx_rel, pty_rel = jax.jit(tk.slab_origins)(
        args_syn["u"], args_syn["v"], dxn, dyn, ns, oy, ox, Hp, Wp)
    scal = jnp.stack([ptx_rel, pty_rel, dxn, dyn, ns.astype(jnp.float32),
                      jnp.ones((N,)), jnp.zeros((N,)),
                      jnp.zeros((N,))], 1).astype(jnp.float32)
    patb = jnp.broadcast_to(
        jnp.asarray(np.asarray(PATTERN, np.float32)), (N, 8, 2))
    inputs = [jax.block_until_ready(jnp.asarray(a)) for a in
              (y0, x0, scal, args_prod["color"], args_prod["weights"],
               patb[:, :, 0], patb[:, :, 1])]
    for resident in (False, True):
        ms = timeit(lambda resident=resident: tk.epipolar_search(
            img_pad, *inputs, S=S, gn_iters=3, resident=resident))
        rep[f"direct_kernel_resident{int(resident)}_ms"] = round(ms, 2)

    # direct kernel, 100 reps, to rule out async-timing artifacts
    f = lambda: tk.epipolar_search(img_pad, *inputs, S=S, gn_iters=3)
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    outs = [f() for _ in range(100)]
    jax.block_until_ready(outs)
    rep["direct_kernel_100reps_ms_each"] = round(
        (time.perf_counter() - t0) / 100 * 1e3, 2)

    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
