"""Roofline evidence for the fused frame program (VERDICT r4 weak #5).

Captures a jax.profiler device trace over steady-state frames and reports:
  - measured device time per frame program
  - top ops/fusions by self time (parsed from the xplane via xprof)
  - achieved HBM GB/s = bytes-accessed / measured time, vs the v5e peak
    (~819 GB/s), replacing the pure cost_analysis() proxy

If the axon tunnel cannot capture device planes, says so explicitly and
falls back to wall-time + cost_analysis bytes (half-measured roofline).

Run: python tools/roofline.py   (ambient axon env, warm cache).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

# the bundled tensorboard_plugin_profile pb2s were generated with an older
# protoc; the pure-python protobuf implementation accepts them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/root/repo/.cache/jaxprof"
V5E_PEAK_GBS = 819.0  # HBM bandwidth of one v5e chip (public spec)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.frontend.graph_system import GraphSystem

    settings = Settings(
        desired_point_density=2000.0,
        desired_immature_density=1500.0,
        immature_cap=2048,
        active_cap=2048,
        affine_opt_mode_a=0.0,
        affine_opt_mode_b=0.0,
        ladder_fine_levels=int(os.environ.get(
            "SDSO_LADDER_FINE",
            str(Settings.__dataclass_fields__["ladder_fine_levels"].default),
        )),
    )
    K, seqs = bench.render_sequences()
    from stereo_dso_g2o_tpu.models.camera import make_calib

    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], bench.BASE,
                       bench.W_, bench.H_, n_levels=6)
    lefts, rights, _ = seqs[0]

    fs = FullSystem(calib, settings)
    for i in range(bench.BOOT):
        fs.add_frame(lefts[i], rights[i], i, timestamp=0.1 * i)
    gs = GraphSystem.from_full_system(fs)
    lefts_d = jax.block_until_ready(jnp.asarray(lefts))
    rights_d = jax.block_until_ready(jnp.asarray(rights))
    # warm both branches
    for i in range(bench.BOOT, bench.BOOT + 10):
        gs.add_frame(lefts_d[i], rights_d[i], i, timestamp=0.1 * i)
    gs.flush()
    print(json.dumps({"progress": "warm"}), flush=True)

    # timed + traced window of steady-state frames
    n_tr = 12
    i0 = bench.BOOT + 10
    os.makedirs(TRACE_DIR, exist_ok=True)
    t0 = time.perf_counter()
    try:
        with jax.profiler.trace(TRACE_DIR):
            for i in range(i0, i0 + n_tr):
                gs.add_frame(lefts_d[i], rights_d[i], i, timestamp=0.1 * i)
            gs.flush()
        trace_ok = True
    except Exception as e:  # tunnel may not support profiling
        print(json.dumps({"trace_failed": repr(e)[:300]}), flush=True)
        for i in range(i0, i0 + n_tr):
            gs.add_frame(lefts_d[i], rights_d[i], i, timestamp=0.1 * i)
        gs.flush()
        trace_ok = False
    wall_ms = (time.perf_counter() - t0) / n_tr * 1e3
    out = {"wall_ms_per_frame": round(wall_ms, 1), "n_frames_traced": n_tr}

    # ---- parse the xplane for device op times ----
    top_ops, device_total_ms = [], None
    if trace_ok:
        files = sorted(glob.glob(
            os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True
        ), key=os.path.getmtime)
        if files:
            try:
                # the xprof package's converter works in this env; the
                # tensorboard_plugin_profile one hits a pywrap mismatch
                from xprof.convert import raw_to_tool_data as rtd

                data, _ = rtd.xspace_to_tool_data([files[-1]], "hlo_stats", {})
                rows = json.loads(data) if isinstance(data, (str, bytes)) else data
                # hlo_stats: gviz-style {cols, rows}; find name + self-time cols
                cols = [c["label"].lower() for c in rows["cols"]]
                name_i = next(i for i, c in enumerate(cols) if "hlo op name" in c or "name" in c)
                self_i = next(i for i, c in enumerate(cols) if "self" in c and "time" in c and "%" not in c)
                cat_i = next((i for i, c in enumerate(cols) if "category" in c), None)
                acc = {}
                for r in rows["rows"]:
                    vals = [c["v"] for c in r["c"]]
                    nm = str(vals[name_i])[:120]
                    cat = str(vals[cat_i]) if cat_i is not None else ""
                    t = float(vals[self_i] or 0.0)
                    acc[(nm, cat)] = acc.get((nm, cat), 0.0) + t
                total_us = sum(acc.values())
                device_total_ms = total_us / 1e3 / n_tr
                top = sorted(acc.items(), key=lambda kv: -kv[1])[:10]
                top_ops = [
                    {"op": nm, "category": cat,
                     "self_ms_per_frame": round(t / 1e3 / n_tr, 2),
                     "pct": round(100.0 * t / max(total_us, 1e-9), 1)}
                    for (nm, cat), t in top
                ]
            except Exception as e:
                out["xplane_parse_failed"] = repr(e)[:300]
        else:
            out["xplane_parse_failed"] = "no .xplane.pb produced"

    if device_total_ms is not None:
        out["device_ms_per_frame"] = round(device_total_ms, 1)
    out["top_ops"] = top_ops

    # ---- bytes accessed of the fused frame program (XLA estimate) ----
    try:
        from stereo_dso_g2o_tpu.frontend.graph_system import frame_auto

        lowered = frame_auto.lower(
            gs.state, lefts_d[i0], rights_d[i0], gs.calib.c,
            gs.calib.baseline, jnp.float32(1.0),
            settings=gs.settings, n_levels=gs.calib.n_levels, n_tries=5,
            pot=gs.pot, caps=gs.caps, w0=gs.calib.w[0], h0=gs.calib.h[0],
            imm_cap=gs.settings.immature_cap,
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ba = float(ca.get("bytes accessed", 0.0))
        fl = float(ca.get("flops", 0.0))
        out["xla_bytes_accessed_GB"] = round(ba / 1e9, 2)
        out["xla_gflops"] = round(fl / 1e9, 2)
        denom_ms = device_total_ms if device_total_ms else wall_ms
        out["achieved_GBps"] = round(ba / 1e9 / (denom_ms / 1e3), 1)
        out["v5e_peak_GBps"] = V5E_PEAK_GBS
        out["pct_of_peak"] = round(
            100.0 * out["achieved_GBps"] / V5E_PEAK_GBS, 1
        )
    except Exception as e:
        out["cost_analysis_failed"] = repr(e)[:300]

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
