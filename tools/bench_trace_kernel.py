"""Micro-benchmark of the epipolar-search kernel variants on the TPU.

Times, for a realistic KITTI-res trace workload (N points, S=46 steps):
- the Pallas kernel with gn_iters=0 (search only) and 3 (search+GN)
- the XLA gather formulation via trace_batch backend="xla"

so kernel-structure changes (precision passes, per-point vs batched GN)
are attributable without running the full pipeline.

Run: python tools/bench_trace_kernel.py [N]
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
    from stereo_dso_g2o_tpu.ops import trace as T
    from stereo_dso_g2o_tpu.ops import trace_pallas as tk
    from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    settings = Settings()
    K, seqs = bench.render_sequences()
    lefts, _, poses = seqs[0]
    i, j = 30, 33
    dIh = build_pyramid(jnp.asarray(lefts[i], jnp.float32), 1)[0][0]
    dIt = build_pyramid(jnp.asarray(lefts[j], jnp.float32), 1)[0][0]
    K0 = np.asarray(K)
    T_ht = np.linalg.inv(np.asarray(poses[j])) @ np.asarray(poses[i])
    KRKi = K0 @ T_ht[:3, :3] @ np.linalg.inv(K0)
    Kt = K0 @ T_ht[:3, 3]

    rng = np.random.default_rng(1)
    us = jnp.asarray(rng.uniform(16, bench.W_ - 16, N).astype(np.float32))
    vs = jnp.asarray(rng.uniform(16, bench.H_ - 16, N).astype(np.float32))
    id_true = rng.uniform(1 / 40.0, 1 / 5.0, N).astype(np.float32)
    color, weights, gradH, eth = T.extract_point_data(dIh, us, vs, settings)
    qual = jnp.full((N,), 10000.0, jnp.float32)
    stat = jnp.full((N,), T.IPS_UNINITIALIZED, jnp.int32)
    KRKi_b = jnp.broadcast_to(jnp.asarray(KRKi, jnp.float32), (N, 3, 3))
    Kt_b = jnp.broadcast_to(jnp.asarray(Kt, jnp.float32), (N, 3))
    aff_b = jnp.stack([jnp.ones(N), jnp.zeros(N)], 1).astype(jnp.float32)
    id_min = jnp.asarray(id_true * 0.7)
    id_max = jnp.asarray(id_true * 1.5)

    def timeit(fn, reps=10):
        """Per-rep timing with a sync per repetition.

        WARNING (round 5): the earlier variant (async reps, one final
        block_until_ready) reported 0.1-0.7 ms for programs that measure
        17-20 ms by every production-context method (xprof hlo_stats,
        cumulative-prefix diffs, 100-rep blocked loops) — through the axon
        tunnel the async-pipelined pattern is NOT a trustworthy device-time
        proxy. Keep per-rep syncs; treat historical numbers from this tool
        as invalid (PERF.md round 5)."""
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn())
        return (time.perf_counter() - t0) / reps * 1e3

    results = {"n_points": N}

    for be in ("pallas", "xla"):
        ms = timeit(lambda be=be: T.trace_batch(
            us, vs, id_min, id_max, color, weights, gradH, eth, qual, stat,
            KRKi_b, Kt_b, aff_b, dIt, settings=settings, backend=be,
        ))
        results[f"trace_batch_{be}_ms"] = round(ms, 3)
        print(json.dumps({"progress": f"trace_batch_{be}",
                          "ms": round(ms, 3)}), flush=True)

    # kernel-only: search vs search+GN (same inputs as the pallas branch
    # of trace_batch would build)
    img_pad, oy, ox = tk.pad_image_for_search(dIt[..., 0])
    Hp, Wp = img_pad.shape
    S = 46
    dxn = jnp.full((N,), 0.9, jnp.float32)
    dyn = jnp.full((N,), 0.43, jnp.float32)
    ns = jnp.full((N,), S - 2, jnp.int32)
    y0, x0, ptx_rel, pty_rel = tk.slab_origins(us, vs, dxn, dyn, ns, oy, ox,
                                               Hp, Wp)
    scal = jnp.stack([ptx_rel, pty_rel, dxn, dyn, ns.astype(jnp.float32),
                      jnp.ones((N,)), jnp.zeros((N,)), jnp.zeros((N,))], 1
                     ).astype(jnp.float32)
    pat = jnp.broadcast_to(
        jnp.asarray(np.asarray(
            __import__("stereo_dso_g2o_tpu.config", fromlist=["PATTERN"]
                       ).PATTERN, np.float32)), (N, 8, 2))
    for gn in (0, 3):
        ms = timeit(lambda gn=gn: tk.epipolar_search(
            img_pad, y0, x0, scal, color, weights, pat[:, :, 0],
            pat[:, :, 1], S=S, gn_iters=gn,
        ))
        results[f"kernel_gn{gn}_ms"] = round(ms, 3)
        print(json.dumps({"progress": f"kernel_gn{gn}",
                          "ms": round(ms, 3)}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
