"""Single-sequence accuracy probe on the ambient backend.

Runs bench sequence 0 (cached KITTI-res hostile corridor) through the
graph pipeline and prints one JSON line with ATE / KITTI rel errors /
keyframe count. Used for backend numerics A/B (TPU Pallas-trace vs XLA
trace vs host CPU): set SDSO_TRACE_BACKEND=xla|pallas to override the
trace search backend (ops/trace.py::default_backend).

Run: python tools/accuracy_probe.py [n_frames]
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

    jax.config.update("jax_default_matmul_precision", "highest")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem
    from stereo_dso_g2o_tpu.io import trajectory
    from stereo_dso_g2o_tpu.models.camera import make_calib
    from stereo_dso_g2o_tpu.ops import trace as trace_ops

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else bench.N_FRAMES
    seq = int(os.environ.get("SDSO_PROBE_SEQ", "0"))
    settings = Settings(
        desired_point_density=2000.0,
        desired_immature_density=1500.0,
        immature_cap=2048,
        active_cap=2048,
        affine_opt_mode_a=0.0,
        affine_opt_mode_b=0.0,
        # split-ladder A/B (Settings.ladder_fine_levels): coarse-only
        # hypothesis evaluation, winner-only fine descent; unset -> default
        ladder_fine_levels=int(os.environ.get(
            "SDSO_LADDER_FINE",
            str(Settings.__dataclass_fields__["ladder_fine_levels"].default),
        )),
        # pallas trace-dot precision A/B ("split" | "highest")
        trace_dot_precision=os.environ.get("SDSO_TRACE_DOTS", "split"),
    )
    K, seqs = bench.render_sequences()
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], bench.BASE,
                       bench.W_, bench.H_, n_levels=6)
    lefts, rights, poses = seqs[seq]

    fs = FullSystem(calib, settings)
    for i in range(bench.BOOT):
        fs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
    gs = GraphSystem.from_full_system(fs)
    # device-resident frames (same staging as bench.py: the dev tunnel
    # charges ~190 ms/frame for per-frame stereo uploads)
    import jax.numpy as jnp

    lefts_d = jax.block_until_ready(jnp.asarray(lefts[:n_frames]))
    rights_d = jax.block_until_ready(jnp.asarray(rights[:n_frames]))
    t0 = time.perf_counter()
    for i in range(bench.BOOT, n_frames):
        gs.add_frame(lefts_d[i], rights_d[i], i, timestamp=0.1 * i)
    gs.flush()
    wall = time.perf_counter() - t0

    traj = gs.trajectory()
    ate = trajectory.ate_rmse(traj, poses[:n_frames])
    rel_t, rel_r = trajectory.kitti_rel_errors(
        traj, poses[:n_frames], lengths=(10, 20, 30, 40), step=5
    )
    print(json.dumps({
        "backend": jax.default_backend(),
        "seq": seq,
        "trace_backend": trace_ops.default_backend(),
        "ladder_fine_levels": settings.ladder_fine_levels,
        "trace_dots": settings.trace_dot_precision,
        "n_frames": n_frames,
        "ate_rmse_m": round(float(ate), 4),
        "kitti_rel_trans_pct": round(float(rel_t), 3),
        "kitti_rel_rot_degpm": round(float(rel_r), 5),
        "n_keyframes": len(gs.kf_shells),
        "lost": bool(gs.is_lost),
        "wall_s": round(wall, 1),
        "fps": round((n_frames - bench.BOOT) / wall, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
