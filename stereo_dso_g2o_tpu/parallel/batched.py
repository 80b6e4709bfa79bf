"""Config-4 multi-sequence throughput: N sequences, ONE program per frame.

Round 1's MultiSequenceRunner round-robined `FullSystem.add_frame` per
sequence on the host — N sequences cost N dispatch pipelines. Here the whole
fused frame program (`frontend/graph_system.frame_auto` — tracking AND the
in-graph keyframe pipeline) vmaps over a leading sequence axis, so stepping
N sequences is ONE dispatch + ONE small fetch per frame: the dispatch
latency amortizes N-fold, and the device fills with N sequences' compute.

All sequences must share resolution/calibration shape (KITTI-style fleets
do; per-sequence intrinsics VALUES may differ — they are traced inputs).
The pixel-selector potential is shared (static reshape stride), adapted from
the mean yield.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import Settings, default_settings
from stereo_dso_g2o_tpu.frontend.graph_system import (
    FrameBundle,
    GraphState,
    GraphSystem,
    frame_auto,
)


@functools.partial(
    jax.jit,
    static_argnames=("settings", "n_levels", "n_tries", "pot", "caps",
                     "w0", "h0", "imm_cap"),
)
def frame_auto_batched(
    states: GraphState,  # leading axis N on every leaf
    lefts,  # (N, H, W)
    rights,
    calib_cs,  # (N, 4)
    baselines,  # (N,)
    exposures,  # (N,)
    settings: Settings = default_settings(),
    n_levels: int = 6,
    n_tries: int = 5,
    pot: int = 3,
    caps: Tuple[int, ...] = (),
    w0: int = 0,
    h0: int = 0,
    imm_cap: int = 2048,
):
    def one(state, left, right, cc, bl, expo):
        return frame_auto(
            state, left, right, cc, bl, expo,
            settings=settings, n_levels=n_levels, n_tries=n_tries,
            pot=pot, caps=caps, w0=w0, h0=h0, imm_cap=imm_cap,
        )

    return jax.vmap(one)(
        states, lefts, rights, calib_cs, baselines, exposures,
    )


class BatchedRunner:
    """Steps N bootstrapped sequences with one device program per frame.

    Build per-sequence `GraphSystem`s (each bootstrapped through the host
    FullSystem past initialization), then `BatchedRunner(systems)`. Host
    bookkeeping stays per-sequence; device state lives stacked."""

    def __init__(self, systems: Sequence[GraphSystem]):
        assert len(systems) >= 1
        self.systems: List[GraphSystem] = list(systems)
        cal0 = systems[0].calib
        for gs in systems:
            assert gs.calib.w == cal0.w and gs.calib.h == cal0.h, (
                "sequences must share the image geometry"
            )
        self.calib = cal0
        self.settings = systems[0].settings
        self.caps = systems[0].caps
        self.pot = systems[0].pot
        self.states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[gs.state for gs in systems]
        )
        self._pending_q = []
        self.calib_cs = jnp.stack([jnp.asarray(gs.calib.c) for gs in systems])
        self.baselines = jnp.stack(
            [jnp.asarray(gs.calib.baseline, jnp.float32) for gs in systems]
        )

    def __len__(self):
        return len(self.systems)

    fetch_lag = 2  # frames the bundle fetch trails the dispatch front

    def add_frames(self, frames, frame_id: int, timestamp: float = 0.0,
                   exposures: Optional[Sequence[float]] = None):
        """frames: list of (left, right) per sequence. One device dispatch;
        results drain `fetch_lag` frames behind (motion model is in-graph)."""
        n = len(self.systems)
        assert len(frames) == n
        if exposures is None:
            exposures = [1.0] * n

        states, bundles = frame_auto_batched(
            self.states,
            jnp.asarray(np.stack([f[0] for f in frames])),
            jnp.asarray(np.stack([f[1] for f in frames])),
            self.calib_cs,
            self.baselines,
            jnp.asarray(np.asarray(exposures), jnp.float32),
            settings=self.settings,
            n_levels=self.calib.n_levels,
            n_tries=5,
            pot=self.pot,
            caps=self.caps,
            w0=self.calib.w[0],
            h0=self.calib.h[0],
            imm_cap=self.settings.immature_cap,
        )
        self.states = states
        self._pending_q.append((bundles, frame_id, timestamp))
        drained = None
        while len(self._pending_q) > self.fetch_lag:
            drained = self._drain_one()
        return drained

    def _drain_one(self):
        bundles, frame_id, timestamp = self._pending_q.pop(0)
        b_all = jax.device_get(bundles)
        sel_yields = []
        for k, gs in enumerate(self.systems):
            bk = jax.tree.map(lambda x: x[k], b_all)
            gs.apply_bundle(bk, frame_id, timestamp,
                            len(gs.kf_shells) - 1)
            if bool(bk.need_kf):
                sel_yields.append(float(bk.sel_num))
        # shared selector-potential adaptation from the mean KF yield
        if sel_yields:
            s = self.settings
            num_have = float(np.mean(sel_yields))
            quotia = s.desired_immature_density / max(num_have, 1.0)
            K = num_have * (self.pot + 1) ** 2
            ideal = max(int(np.sqrt(K / s.desired_immature_density) - 1), 1)
            if quotia > 1.25 and self.pot > 1:
                self.pot = max(min(ideal, self.pot - 1), 1)
            elif quotia < 0.25:
                self.pot = max(ideal, self.pot + 1)
            else:
                self.pot = max(ideal, 1)
        return b_all

    def flush(self):
        while self._pending_q:
            self._drain_one()

    def trajectories(self):
        self.flush()
        return [gs.trajectory() for gs in self.systems]
