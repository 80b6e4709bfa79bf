"""KITTI-resolution accuracy bound (VERDICT r3 item 4).

The reference's published KITTI numbers are rel-trans 1.1-4.2 % and
rel-rot 0.001-0.0053 deg/m (/root/reference/README.md:107-126). No KITTI
data exists in this environment, so the hostile synthetic corridor at the
SAME resolution (1216x352) is the proxy: this test asserts the engine at
full resolution stays INSIDE the reference's published envelope, replacing
round-3's untested "6.1 % at 256x128 is just resolution" argument.

The run happens in a SUBPROCESS with the engine's real precision
(tools/accuracy_probe.py, f32, x64 OFF): conftest enables x64 for test-side
float64 reference checks, and that silently upgraded engine scalars too —
round 4 found the in-process version of this test passing while the f32
engine on hardware violated the rot bound (PERF.md round 4, the bf16-trace
bug). Asserting through the probe keeps the bound honest.

Runs the bench's sequence-0 configuration truncated to 120 frames to bound
CPU wall time; bench.py reports the full 200-frame numbers on TPU.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_kitti_res_within_reference_envelope():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".cache", "bench_frames_v5_1216x352_4x200.npz")
    env = dict(os.environ)
    if not os.path.exists(cache):
        # fresh checkout: let the probe render a 1-sequence cache itself
        # (the fast jitted raycast makes this cheap; the reduced cache file
        # is keyed separately so it never shadows the full bench cache) —
        # VERDICT r4 weak #6: this test must not skip on a fresh checkout.
        env["SDSO_BENCH_NSEQ"] = "1"
    # engine-real precision: CPU backend, no x64, no tunnel re-routing
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env.pop("JAX_ENABLE_X64", None)
    # pin the engine-real single-device config: the inherited test
    # XLA_FLAGS force 8 virtual CPU devices, which changes XLA's intra-op
    # threading and therefore f32 reduction ORDER (not precision). Direct
    # SLAM basin selection on aliased synthetic texture is knife-edge
    # sensitive to that rounding noise in the first post-bootstrap
    # keyframes (PERF.md round 4) — the bound is asserted on the
    # deterministic production config, like the bench runs it.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "accuracy_probe.py"),
         "120"],
        env=env, capture_output=True, text=True, timeout=1500, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    r = json.loads(line)
    print(f"\nkitti-res 120f (f32 subprocess): {r}")
    assert not r["lost"]
    assert r["n_keyframes"] >= 15, r  # steady-state window churn happened
    # the reference's published KITTI envelope (README.md:113)
    assert r["kitti_rel_trans_pct"] <= 4.2, r
    assert r["kitti_rel_rot_degpm"] <= 0.0053, r
