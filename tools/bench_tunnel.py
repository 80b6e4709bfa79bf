"""Host<->device overhead attribution for the per-frame loop.

The bench's single-seq wall time (176 ms/frame, round 4) exceeds the
steady-state device compute (134 ms/frame mean) by ~42 ms. Candidate
overheads, each measured here in isolation on the ambient backend:

  1. round-trip latency of a tiny fetch (the tunnel's floor)
  2. fetching a FrameBundle-shaped pytree (~24 small leaves) vs the same
     payload packed into ONE flat array — does per-leaf overhead dominate?
  3. host->device upload of one KITTI-res uint8 stereo pair
  4. dispatch+sync of a trivial jitted program

Run: python tools/bench_tunnel.py   (ambient axon env)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20


def timed(fn, n=N):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}

    # 1. tiny fetch round trip
    x = jnp.zeros(()).block_until_ready()
    out["fetch_scalar_ms"] = round(timed(lambda: jax.device_get(x)), 2)

    # 2. FrameBundle-shaped pytree vs packed flat array
    F = 8
    leaves = {
        "T": jnp.eye(4), "aff": jnp.zeros(2), "residuals": jnp.zeros(6),
        "flow": jnp.zeros(3), "ok": jnp.asarray(True),
        "sat": jnp.zeros(()), "need_kf": jnp.asarray(False),
        "slot": jnp.asarray(0), "flagged": jnp.zeros(F, bool),
        "w2c": jnp.zeros((F, 4, 4)), "aff_all": jnp.zeros((F, 2)),
        "frame_valid": jnp.zeros(F, bool), "frame_id": jnp.zeros(F, jnp.int32),
        "energy": jnp.zeros(()), "nres": jnp.asarray(0),
        "sel_num": jnp.asarray(0), "n_active": jnp.asarray(0),
        "n_activated": jnp.asarray(0), "n_imm": jnp.asarray(0),
        "n_marg": jnp.asarray(0), "n_dropped": jnp.asarray(0),
        "kf_delta": jnp.zeros(()), "kf_rmse": jnp.zeros(()),
        "kf_first": jnp.zeros(()),
    }
    leaves = jax.tree.map(lambda a: a.block_until_ready(), leaves)
    out["fetch_bundle_pytree_ms"] = round(
        timed(lambda: jax.device_get(leaves)), 2
    )
    n_flat = sum(int(np.prod(v.shape)) for v in leaves.values())
    packed = jnp.zeros((n_flat,), jnp.float32).block_until_ready()
    out["fetch_bundle_packed_ms"] = round(
        timed(lambda: jax.device_get(packed)), 2
    )
    out["bundle_n_leaves"] = len(leaves)
    out["bundle_n_floats"] = n_flat

    # 3. stereo-pair upload (KITTI res uint8)
    img = np.zeros((352, 1216), np.uint8)

    def upload():
        l = jnp.asarray(img)
        r = jnp.asarray(img)
        jax.block_until_ready((l, r))

    out["upload_stereo_pair_ms"] = round(timed(upload), 2)

    # 3b. batched upload: is the 191 ms/pair per-CALL latency or bandwidth?
    imgs8 = np.zeros((8, 2, 352, 1216), np.uint8)
    out["upload_8pair_batch_ms"] = round(
        timed(lambda: jax.block_until_ready(jnp.asarray(imgs8)), n=5), 2
    )
    # 3c. device-resident slicing (the fix: frames staged once in HBM)
    big = jnp.asarray(np.zeros((200, 352, 1216), np.uint8))
    big = big.block_until_ready()
    out["slice_resident_frame_ms"] = round(
        timed(lambda: jax.block_until_ready(big[17])), 2
    )

    # 4. trivial dispatch + sync
    f = jax.jit(lambda a: a + 1.0)
    a = jnp.zeros((8, 128)).block_until_ready()
    f(a).block_until_ready()
    out["dispatch_sync_trivial_ms"] = round(
        timed(lambda: f(a).block_until_ready()), 2
    )

    # 5. async dispatch cost only (no sync): how fast can the host enqueue?
    t0 = time.perf_counter()
    y = a
    for _ in range(N):
        y = f(y)
    out["dispatch_enqueue_ms"] = round(
        (time.perf_counter() - t0) / N * 1e3, 2
    )
    jax.block_until_ready(y)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
