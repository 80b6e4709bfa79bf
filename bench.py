"""Benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: full stereo direct SLAM at KITTI resolution (1216x352) on a
rendered HOSTILE synthetic sequence — multi-box street scene with occlusion
boundaries, depth discontinuities, ground plane, side facades, sinusoidal
exposure variation, and a forward trajectory with yaw (VERDICT r1 item 3) —
through the fused one-dispatch-per-frame graph pipeline, steady-state window
churn included (n_keyframes >= 30 over the run).

Metrics:
- primary: aggregate frames/sec/chip with N_SEQ sequences batched into one
  vmapped program per frame (BASELINE config 4 — the TPU-native throughput
  axis; the reference is a single-sequence CPU process at 18.9 fps).
- single_seq_fps: one sequence, same fused pipeline.
- ate_rmse_m / kitti_rel_trans_pct / kitti_rel_rot_degpm on the single run.
- mfu: XLA-reported FLOPs of the fused frame program x achieved frame rate
  / device peak (f32 on the MXU path; utilization proxy, see PERF.md).

First run renders + compiles (~10-20 min); warm runs reuse .cache/.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_SEQ = 4
N_FRAMES = 200
BOOT = 12  # host-bootstrap frames per sequence (initialization)
W_, H_, BASE = 1216, 352, 0.54
PEAK_F32_FLOPS = 49.2e12  # TPU v5e fp32-accumulate MXU peak (bf16 197/4)

# SDSO_BENCH_SMALL=1: shrunken smoke-mode (CPU-checkable) — validates the
# full bench code path without the KITTI-resolution compile/render cost.
if os.environ.get("SDSO_BENCH_SMALL") == "1":
    N_SEQ, N_FRAMES, W_, H_, BASE = 2, 40, 256, 128, 0.2


def _render_one_sequence(s):
    """Render one sequence (worker-process entry; returns picklable arrays)."""
    from stereo_dso_g2o_tpu.io import synthetic

    K = synthetic.default_K(W_, H_, fov_deg=80.0)
    if os.environ.get("SDSO_BENCH_SMALL") == "1":
        lateral, box_spacing, step = 6.0, 5.0, 0.12
    else:
        lateral, box_spacing, step = 14.0, 9.0, 0.30
    # corridor long enough that structure stays 5-40 m ahead for EVERY frame
    # (box_scene's fixed depth band gets driven through on 200-frame runs —
    # the round-2 bench diverged exactly that way)
    scene = synthetic.corridor_scene(
        seed=100 + s, length=step * N_FRAMES + 40.0, box_spacing=box_spacing,
        lateral=lateral,
    )
    poses_cw = synthetic.forward_trajectory(
        N_FRAMES, step=step, yaw_amp=0.10, yaw_period=80.0, seed=s
    )
    frames, poses = [], []
    for i, T in enumerate(poses_cw):
        expo = 1.0 + 0.12 * np.sin(0.25 * i + s)
        left, right, _ = synthetic.render_multi_stereo_pair(
            scene, K, W_, H_, BASE, T, exposure=expo
        )
        l8 = np.clip(left, 0, 255).astype(np.uint8)
        r8 = np.clip(right, 0, 255).astype(np.uint8)
        frames.append((l8, r8))
        poses.append(np.linalg.inv(T))
    return frames, poses


def render_sequences():
    """Render (or load) N_SEQ hostile sequences + GT poses, uint8.

    Rendering is the dominant cold-start cost (~1 s/stereo pair x N_SEQ x
    N_FRAMES of host numpy ray-casting), so sequences render in parallel
    worker processes and cache to .cache/ for warm runs."""
    from stereo_dso_g2o_tpu.io import synthetic

    cache = (
        "/root/repo/.cache/bench_frames_v4.npz"
        if os.environ.get("SDSO_BENCH_SMALL") != "1"
        else f"/root/repo/.cache/bench_small_v4_{W_}x{H_}_{N_SEQ}x{N_FRAMES}.npz"
    )
    K = synthetic.default_K(W_, H_, fov_deg=80.0)
    if os.path.exists(cache):
        data = np.load(cache)
        seqs = []
        for s in range(N_SEQ):
            frames = [
                (data[f"l{s}_{i}"], data[f"r{s}_{i}"])
                for i in range(N_FRAMES)
            ]
            poses = [data[f"p{s}_{i}"] for i in range(N_FRAMES)]
            seqs.append((frames, poses))
        return K, seqs

    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    # spawn (not fork): the parent may already hold a live TPU client whose
    # gRPC threads do not survive fork; workers are numpy-only
    with ProcessPoolExecutor(
        max_workers=min(N_SEQ, os.cpu_count() or 1),
        mp_context=mp.get_context("spawn"),
    ) as ex:
        results = list(ex.map(_render_one_sequence, range(N_SEQ)))

    arrays = {}
    seqs = []
    for s, (frames, poses) in enumerate(results):
        for i in range(N_FRAMES):
            arrays[f"l{s}_{i}"] = frames[i][0]
            arrays[f"r{s}_{i}"] = frames[i][1]
            arrays[f"p{s}_{i}"] = poses[i]
        seqs.append((frames, poses))
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez_compressed(cache, **arrays)
    return K, seqs


def main():
    os.makedirs("/root/repo/.cache/jax", exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem
    from stereo_dso_g2o_tpu.io import trajectory
    from stereo_dso_g2o_tpu.models.camera import make_calib
    from stereo_dso_g2o_tpu.parallel.batched import BatchedRunner

    # exposure is synthesized but NOT fed to the engine — uncalibrated
    # input, so affine brightness must be free (the reference's KITTI
    # operating point: mode=1 sets setting_affineOptModeA/B = 0,
    # main_dso_pangolin.cpp:326-327)
    if os.environ.get("SDSO_BENCH_SMALL") == "1":
        settings = Settings(
            desired_point_density=600.0,
            desired_immature_density=450.0,
            immature_cap=512,
            active_cap=1024,
            affine_opt_mode_a=0.0,
            affine_opt_mode_b=0.0,
        )
    else:
        settings = Settings(
            desired_point_density=2000.0,
            desired_immature_density=1500.0,
            immature_cap=2048,
            active_cap=2048,
            affine_opt_mode_a=0.0,
            affine_opt_mode_b=0.0,
        )
    K, seqs = render_sequences()
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_,
                       n_levels=6)

    def bootstrap(frames):
        fs = FullSystem(calib, settings)
        for i in range(BOOT):
            fs.add_frame(frames[i][0], frames[i][1], i, timestamp=0.1 * i)
        return GraphSystem.from_full_system(fs)

    # ---- single-sequence run (accuracy + single-seq fps) ----
    frames0, poses0 = seqs[0]
    gs = bootstrap(frames0)
    warm_until = BOOT + 8  # compile both cond branches before timing
    for i in range(BOOT, warm_until):
        gs.add_frame(frames0[i][0], frames0[i][1], i, timestamp=0.1 * i)
    t0 = time.perf_counter()
    for i in range(warm_until, N_FRAMES):
        gs.add_frame(frames0[i][0], frames0[i][1], i, timestamp=0.1 * i)
    dt_single = (time.perf_counter() - t0) / (N_FRAMES - warm_until)
    single_fps = 1.0 / dt_single

    traj = gs.trajectory()
    n_finite = int(sum(bool(np.isfinite(T).all()) for T in traj))
    try:
        ate = trajectory.ate_rmse(traj, poses0)
        rel_t, rel_r = trajectory.kitti_rel_errors(
            traj, poses0, lengths=(10, 20, 30, 40), step=5
        )
    except Exception:
        ate, rel_t, rel_r = float("nan"), float("nan"), float("nan")
    n_kfs = len(gs.kf_shells)

    # ---- FLOPs of the fused frame program (for the MFU proxy) ----
    mfu = None
    try:
        import jax.numpy as jnp

        from stereo_dso_g2o_tpu.frontend.graph_system import frame_auto

        lowered = frame_auto.lower(
            gs.state, jnp.zeros((H_, W_), jnp.uint8),
            jnp.zeros((H_, W_), jnp.uint8),
            calib.c, calib.baseline, jnp.float32(1.0),
            settings=settings, n_levels=6, n_tries=5, pot=gs.pot,
            caps=gs.caps, w0=W_, h0=H_, imm_cap=settings.immature_cap,
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_frame = float(cost.get("flops", 0.0))
        mfu = flops_frame * single_fps / PEAK_F32_FLOPS
    except Exception:
        pass

    # ---- batched N_SEQ aggregate throughput ----
    systems = [gs if s == 0 else bootstrap(seqs[s][0]) for s in range(N_SEQ)]
    # re-bootstrap sequence 0 so all sequences are in comparable early state
    systems[0] = bootstrap(frames0)
    runner = BatchedRunner(systems)
    warm_until_b = BOOT + 8
    for i in range(BOOT, warm_until_b):
        runner.add_frames([seqs[s][0][i] for s in range(N_SEQ)], i,
                          timestamp=0.1 * i)
    n_timed_b = min(N_FRAMES, BOOT + 108) - warm_until_b
    t0 = time.perf_counter()
    for i in range(warm_until_b, warm_until_b + n_timed_b):
        runner.add_frames([seqs[s][0][i] for s in range(N_SEQ)], i,
                          timestamp=0.1 * i)
    dt_b = time.perf_counter() - t0
    agg_fps = N_SEQ * n_timed_b / dt_b

    baseline_fps = 18.9  # reference KITTI 05 full pipeline (BASELINE.md)
    out = {
        "metric": "full_slam_agg_fps_kitti_res_hostile_synthetic",
        "value": round(agg_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(agg_fps / baseline_fps, 3),
        "single_seq_fps": round(single_fps, 2),
        "n_seq_batched": N_SEQ,
        "ate_rmse_m": (
            round(float(ate), 4) if np.isfinite(ate) else None
        ),
        "n_finite_frames": n_finite,
        "lost": bool(gs.is_lost),
        # rel errors need >=10 m segments; guard so the JSON stays parseable
        "kitti_rel_trans_pct": (
            round(rel_t, 3) if np.isfinite(rel_t) else None
        ),
        "kitti_rel_rot_degpm": (
            round(rel_r, 5) if np.isfinite(rel_r) else None
        ),
        "n_keyframes": n_kfs,
        "n_frames": N_FRAMES,
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
