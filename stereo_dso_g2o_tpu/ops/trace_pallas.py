"""Pallas TPU kernel for the temporal epipolar search.

The discrete search of ImmaturePoint::traceOn (ImmaturePoint.cpp:610-769) is
gather-bound in plain XLA: ~N x S x 8 scattered bilinear samples of the target
image cost ~11 ns/scalar through the gather unit (~68 ms per frame at KITTI
scale). This kernel restructures the workload TPU-natively:

  1. Per point, one DMA stages a tile-aligned (64 x 256) slab of the target
     image into VMEM (the slab bounds the whole search segment + pattern halo;
     (8, 128) start/size alignment is a Mosaic requirement for HBM slices).
  2. All S x 8 bilinear samples of the search become ONE MXU matmul against
     on-the-fly "tent" interpolation weights: columns are interpolated by
     slab[64, Ceff] @ wcT[Ceff, S*8], rows by an elementwise tent-weighted
     sublane reduction. No gathers anywhere. The slab is f32 and the
     interpolation dots run as explicit hi/lo bf16 splits (`_dot_bf16x3`,
     three single-pass DEFAULT dots ~ f32 accuracy; Mosaic exposes only
     DEFAULT and the 2x-costlier 6-pass HIGHEST): the round-3 formulation
     (bf16 slab + single-pass bf16 tent
     weights) quantized samples by ~0.5-1 gray level, which measurably
     degraded trace depths — on the 200-frame KITTI-res bench it gave
     ATE 0.29 m / rel-rot 0.022 deg/m / 69 keyframes vs 0.10 m /
     0.0032 deg/m / 47 keyframes with exact sampling (the extra keyframes
     are the KF decision tripping on noisier tracking residuals). The
     image is EDGE-padded to mirror the XLA path's coordinate clipping.
  3. Per-step Huber pattern energies, the masked argmin, and the
     second-best-outside-radius statistic are computed in-kernel.
  4. The <=3-step 1-dof GN refinement along the epipolar line
     (ImmaturePoint.cpp:706-769) runs in-kernel too, vectorized across the
     point block, sampling image + central-difference gradients from the same
     VMEM slabs.

This restores the reference's BILINEAR discrete search (round 1 used
nearest-neighbour sampling to cut gather cost; that deviation is gone).

The kernel processes points in blocks of BLK per grid step; DMAs for a block
are issued up front so the copy latency pipelines against the search math.
Everything is fixed-shape; invalid/OOB points run with num_steps=0 and their
outputs are discarded by the status machine in ops/trace.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Slab geometry. R x C must bound: max search extent (num_steps <= S-1 px at
# stepsize 1), the +-3 px rotated-pattern halo, +1 px bilinear support, and
# the (8, 128) tile alignment of the slab origin. For maxPixSearch at KITTI
# resolution (0.027*(1216+352) ~ 42 px, S = 46): extent <= 54 px; aligned
# origins add <= 7 rows / <= 127 lanes -> 64 x 256 always suffices for
# images up to (w+h) <= 0.027^-1 * (64-10) ~ 2000 px... R/C are validated
# against S in `epipolar_search`.
R_SLAB = 64
C_SLAB = 256
HALO = 4  # 3 px pattern + 1 px bilinear support

# Packed per-point scalar lanes (input `scal`):
SCAL_PTX = 0  # search origin x, slab-relative
SCAL_PTY = 1
SCAL_DX = 2  # epipolar step (|.| <= stepsize = 1)
SCAL_DY = 3
SCAL_NSTEPS = 4  # float(num_steps)
SCAL_AFF_A = 5
SCAL_AFF_B = 6
SCAL_HHALF = 7  # unused / padding

# Output lanes:
OUT_BEST_U = 0  # slab-relative, post-GN
OUT_BEST_V = 1
OUT_E_SEARCH = 2
OUT_SECOND_BEST = 3
OUT_E_GN = 4
OUT_BEST_IDX = 5

_BIG = 1e30


def pad_image_for_search(img: jax.Array, dtype=jnp.float32):
    """Pad an (H, W) intensity image so every slab window is in-bounds.

    Returns (img_pad, oy, ox): pixel (u, v) lives at img_pad[v+oy, u+ox].
    Margins: left/top must cover the search halo below aligned-down origins;
    right/bottom must cover origin+slab. Padded dims are (8, 128)-aligned.
    """
    H, W = img.shape
    oy, ox = 8, 128
    Hp = ((H + oy + R_SLAB + 7) // 8) * 8
    Wp = ((W + ox + C_SLAB + 127) // 128) * 128
    # EDGE padding, not zeros: the XLA path clips sample coordinates to the
    # image, so out-of-image bilinear taps read border pixels. Zero padding
    # made border-adjacent searches see a black frame -> biased energies ->
    # noisier trace depths near borders and a ~50% higher keyframe cadence.
    img_pad = jnp.pad(
        img.astype(dtype),
        ((oy, Hp - H - oy), (ox, Wp - W - ox)),
        mode="edge",
    )
    return img_pad, oy, ox


def slab_origins(ptx, pty, dx, dy, num_steps, oy, ox, Hp, Wp):
    """Tile-aligned slab origins (padded-image coords) + slab-relative start.

    ptx/pty: search origin in image coords; the segment spans
    [pt, pt + num_steps * d] plus the +-HALO pattern/bilinear halo.
    """
    ns = num_steps.astype(ptx.dtype)
    x_lo = jnp.minimum(ptx, ptx + ns * dx) - HALO + ox
    y_lo = jnp.minimum(pty, pty + ns * dy) - HALO + oy
    x0 = jnp.clip(
        (jnp.floor(x_lo).astype(jnp.int32) // 128) * 128, 0, Wp - C_SLAB
    )
    y0 = jnp.clip((jnp.floor(y_lo).astype(jnp.int32) // 8) * 8, 0, Hp - R_SLAB)
    ptx_rel = ptx + ox - x0.astype(ptx.dtype)
    pty_rel = pty + oy - y0.astype(pty.dtype)
    return y0, x0, ptx_rel, pty_rel



def _huber(r, th):
    ar = jnp.abs(r)
    return jnp.where(ar < th, 1.0, th / jnp.maximum(ar, 1e-12))


def _dot1(x, y):
    """One single-pass (DEFAULT-precision) MXU dot with an f32 accumulator.

    On TPU, DEFAULT truncates each operand to bf16 internally for the one
    pass; callers exploit this by feeding f32-typed operands that are
    bf16-VALUED (exact under that truncation) or accept a second-order
    truncation on residual terms (see the split-dot helpers below)."""
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_highest(a, b):
    """Exact-f32 matmul (six bf16 MXU passes) — the accuracy reference for
    the split dots; selected by Settings.trace_dot_precision="highest"."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_bf16x3(a, b):
    """~f32-accurate matmul from three single-pass bf16 MXU dots.

    Mosaic exposes only DEFAULT (one bf16 pass — quantizes 0-255 gray
    images by ~0.5 level, the round-3 accuracy bug) and HIGHEST (six
    passes). The classic hi/lo split recovers ~f32 accuracy at half the
    HIGHEST cost: a = ah + al, b = bh + bl with ah/bh the bf16 roundings,
    then a@b ~= ah@bh + ah@bl + al@bh. Error terms: the dropped al@bl is
    O(2^-16) relative; additionally the al/bl residuals carry up to ~16
    mantissa bits and are themselves truncated to bf16 by DEFAULT's one
    pass on TPU, adding another O(2^-16)-relative error in the cross
    terms that full-f32 CPU execution does not have. Measured on this
    kernel's operand distribution: max error 0.002 gray vs 0.94 for
    one-pass bf16."""
    # Operands stay f32 (Mosaic rejects bf16 lhs with an f32 accumulator:
    # "Bad lhs type"); the explicit bf16 round-trip makes ah/bh
    # bf16-VALUED, so DEFAULT's one-pass internal truncation is lossless
    # for the hi@hi term (and for the hi operand of each cross term).
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    return _dot1(ah, bh) + _dot1(ah, bl) + _dot1(al, bh)


def _dot_exact_rhs(a, b01):
    """a @ b for a 0/1 selection matrix b: two single-pass bf16 dots.

    b01's entries are exactly representable in bf16, and the hi/lo split
    of `a` is exact by construction, so ah@b + al@b reconstructs the f32
    product up to (a) f32 accumulation order and (b) the bf16 truncation
    DEFAULT applies to the `al` residual operand on TPU (second-order,
    O(2^-16) relative) — one step below HIGHEST's accuracy, at a third
    of the passes."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    b = b01  # 0/1 entries: DEFAULT's bf16 truncation is exact
    return _dot1(ah, b) + _dot1(al, b)


def _make_kernel(S, BLK, Ceff, huber_th, gn_iters, gn_threshold,
                 hi_precision=False):
    SP = 8 * S
    # hi_precision: every interpolation dot runs at Precision.HIGHEST
    # (exact f32, ~2x the dot passes of the hi/lo split) — removes the
    # second-order bf16 truncation of the split's residual operands, the
    # one numeric term the XLA gather formulation does not have
    dot_img = _dot_highest if hi_precision else _dot_bf16x3
    dot_sel = _dot_highest if hi_precision else _dot_exact_rhs

    def kernel(
        y0_ref,
        x0_ref,
        scal_ref,
        color_ref,
        wts_ref,
        patx_ref,
        paty_ref,
        img_ref,
        out_ref,
        slabs,
        gxs,
        gys,
        search_out,
        sems,
    ):
        blk = pl.program_id(0)

        def dma(i):
            pt = blk * BLK + i
            return pltpu.make_async_copy(
                img_ref.at[
                    pl.ds(pl.multiple_of(y0_ref[pt], 8), R_SLAB),
                    pl.ds(pl.multiple_of(x0_ref[pt], 128), C_SLAB),
                ],
                slabs.at[pl.ds(i * R_SLAB, R_SLAB), :],
                sems.at[i],
            )

        for i in range(BLK):
            dma(i).start()

        # static expansion/selection matrices, built from iotas (pallas
        # kernels cannot capture array constants)
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (8, SP), 1) // S
            == jax.lax.broadcasted_iota(jnp.int32, (8, SP), 0)
        ).astype(jnp.float32)  # E[p, sp] = (sp // S == p)
        Sel = (
            jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (SP, S), 0), S)
            == jax.lax.broadcasted_iota(jnp.int32, (SP, S), 1)
        ).astype(jnp.float32)  # Sel[sp, s] = (sp % S == s)
        # Mosaic iota is integer-only; cast to f32 after
        s_iota_sp = jnp.mod(
            jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1), S
        ).astype(jnp.float32)  # lane sp -> step index (p-major: sp = p*S + s)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (Ceff, SP), 0).astype(
            jnp.float32
        )
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R_SLAB, SP), 0).astype(
            jnp.float32
        )
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1).astype(
            jnp.float32
        )

        def search_one(i, _):
            dma(i).wait()
            slab = slabs[pl.ds(i * R_SLAB, R_SLAB), :Ceff]  # (R, Ceff) f32
            scal = scal_ref[pl.ds(i, 1), :]  # (1, 8)
            ptx = scal[:, SCAL_PTX : SCAL_PTX + 1]
            pty = scal[:, SCAL_PTY : SCAL_PTY + 1]
            dx = scal[:, SCAL_DX : SCAL_DX + 1]
            dy = scal[:, SCAL_DY : SCAL_DY + 1]
            nsteps = scal[:, SCAL_NSTEPS : SCAL_NSTEPS + 1]
            aff_a = scal[:, SCAL_AFF_A : SCAL_AFF_A + 1]
            aff_b = scal[:, SCAL_AFF_B : SCAL_AFF_B + 1]

            patx_sp = dot_sel(patx_ref[pl.ds(i, 1), :], E)  # (1, SP)
            paty_sp = dot_sel(paty_ref[pl.ds(i, 1), :], E)
            color_sp = dot_sel(color_ref[pl.ds(i, 1), :], E)

            sx = ptx + s_iota_sp * dx + patx_sp  # (1, SP)
            sy = pty + s_iota_sp * dy + paty_sp

            wc = jnp.maximum(0.0, 1.0 - jnp.abs(sx - c_iota))  # (Ceff, SP)
            m1 = dot_img(slab, wc)  # (R, SP)
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(sy - r_iota))  # (R, SP)
            vals = jnp.sum(m1 * wr, axis=0, keepdims=True)  # (1, SP)

            res = vals - (aff_a * color_sp + aff_b)
            hw = _huber(res, huber_th)
            en_sp = hw * res * res * (2.0 - hw)
            e_s = dot_sel(en_sp, Sel)

            valid = s_iota < nsteps
            e_m = jnp.where(valid, e_s, _BIG)
            be = jnp.min(e_m, axis=1, keepdims=True)  # (1, 1)
            # argmin via min-of-matching-index (ties -> lowest step, as the
            # reference's strict < scan does)
            bidx = jnp.min(
                jnp.where(e_m <= be, s_iota, _BIG), axis=1, keepdims=True
            )
            outside = jnp.abs(s_iota - bidx) > 2.0  # minTraceTestRadius
            sb = jnp.min(
                jnp.where(valid & outside, e_s, _BIG), axis=1, keepdims=True
            )

            row = jnp.concatenate(
                [
                    ptx + bidx * dx,
                    pty + bidx * dy,
                    be,
                    sb,
                    jnp.zeros((1, 1), jnp.float32),
                    bidx,
                    dx,
                    dy,
                ],
                axis=1,
            )  # (1, 8)
            search_out[pl.ds(i, 1), :] = row
            return 0

        jax.lax.fori_loop(0, BLK, search_one, 0, unroll=False)

        # central-difference gradient slabs (HessianBlocks.cpp:159-201 conv).
        # Row shifts cross adjacent point slabs at rows 0/63 only — outside
        # the sampled halo, so harmless.
        sl = slabs[:, :Ceff].astype(jnp.float32)  # (BLK*R, Ceff)
        gxs[:, 1 : Ceff - 1] = 0.5 * (sl[:, 2:] - sl[:, : Ceff - 2])
        gys[1 : BLK * R_SLAB - 1, :] = 0.5 * (
            sl[2:, :] - sl[: BLK * R_SLAB - 2, :]
        )
        gxs[:, 0:1] = jnp.zeros_like(sl[:, 0:1])
        gxs[:, Ceff - 1 : Ceff] = jnp.zeros_like(sl[:, 0:1])
        gys[0:1, :] = jnp.zeros_like(sl[0:1, :])
        gys[BLK * R_SLAB - 1 :, :] = jnp.zeros_like(sl[0:1, :])

        # -- per-point GN refinement --
        # Per point (not block-batched): the f32 HIGHEST-precision dots on
        # (BLK, R, Ceff) operands overflow the 16 MB scoped-VMEM stack when
        # the iterations are unrolled, and a rolled fori_loop with vector
        # carries does not legalize in Mosaic. Per-point operands are
        # (R, Ceff) = 64 KB, so the fully unrolled 3-iteration GN stays tiny
        # and the loop over the block carries nothing.
        cg_iota_pt = jax.lax.broadcasted_iota(jnp.int32, (Ceff, 8), 0).astype(
            jnp.float32
        )
        rg_iota_pt = jax.lax.broadcasted_iota(
            jnp.int32, (R_SLAB, 8), 0
        ).astype(jnp.float32)

        def gn_one(i, _):
            so = search_out[pl.ds(i, 1), :]  # (1, 8)
            bu = so[:, OUT_BEST_U : OUT_BEST_U + 1]  # (1, 1)
            bv = so[:, OUT_BEST_V : OUT_BEST_V + 1]
            dxb = so[:, 6:7]
            dyb = so[:, 7:8]
            scal = scal_ref[pl.ds(i, 1), :]
            aff_a = scal[:, SCAL_AFF_A : SCAL_AFF_A + 1]
            aff_b = scal[:, SCAL_AFF_B : SCAL_AFF_B + 1]
            color = color_ref[pl.ds(i, 1), :]  # (1, 8)
            wts = wts_ref[pl.ds(i, 1), :]
            patx = patx_ref[pl.ds(i, 1), :]
            paty = paty_ref[pl.ds(i, 1), :]
            slab = slabs[pl.ds(i * R_SLAB, R_SLAB), :Ceff]
            gx = gxs[pl.ds(i * R_SLAB, R_SLAB), :]
            gy = gys[pl.ds(i * R_SLAB, R_SLAB), :]

            def sample8(src, qx, qy):
                """Bilinear samples of (R, Ceff) at (1, 8) positions."""
                wcg = jnp.maximum(0.0, 1.0 - jnp.abs(qx - cg_iota_pt))
                mg = dot_img(src, wcg)  # (R, 8)
                wrg = jnp.maximum(0.0, 1.0 - jnp.abs(qy - rg_iota_pt))
                return jnp.sum(mg * wrg, axis=0, keepdims=True)  # (1, 8)

            if gn_iters > 0:
                carry = (
                    bu,
                    bv,
                    bu,
                    bv,
                    jnp.zeros((1, 1), jnp.float32),
                    jnp.full((1, 1), 1e5, jnp.float32),
                    jnp.zeros((1, 1), bool),
                )
                for _it in range(gn_iters):
                    bu_c, bv_c, ubak, vbak, step_back, be_c, done = carry
                    qx = bu_c + patx
                    qy = bv_c + paty
                    hit = sample8(slab, qx, qy)
                    gxv = sample8(gx, qx, qy)
                    gyv = sample8(gy, qx, qy)
                    resi = hit - (aff_a * color + aff_b)
                    d_res = dxb * gxv + dyb * gyv
                    hw = _huber(resi, huber_th)
                    Hgn = 1.0 + jnp.sum(
                        hw * d_res * d_res, axis=1, keepdims=True
                    )
                    bgn = jnp.sum(hw * resi * d_res, axis=1, keepdims=True)
                    energy = jnp.sum(
                        wts * wts * hw * resi * resi * (2.0 - hw),
                        axis=1,
                        keepdims=True,
                    )
                    worse = energy > be_c
                    sb_worse = step_back * 0.5
                    u_worse = ubak + sb_worse * dxb
                    v_worse = vbak + sb_worse * dyb
                    step = jnp.clip(-bgn / Hgn, -0.5, 0.5)
                    step = jnp.where(jnp.isfinite(step), step, 0.0)
                    u_better = bu_c + step * dxb
                    v_better = bv_c + step * dyb
                    new_u = jnp.where(
                        done, bu_c, jnp.where(worse, u_worse, u_better)
                    )
                    new_v = jnp.where(
                        done, bv_c, jnp.where(worse, v_worse, v_better)
                    )
                    new_ubak = jnp.where(done | worse, ubak, bu_c)
                    new_vbak = jnp.where(done | worse, vbak, bv_c)
                    new_sb = jnp.where(
                        done, step_back, jnp.where(worse, sb_worse, step)
                    )
                    new_e = jnp.where(done | worse, be_c, energy)
                    new_done = done | (jnp.abs(new_sb) < gn_threshold)
                    carry = (
                        new_u, new_v, new_ubak, new_vbak, new_sb, new_e,
                        new_done,
                    )
                bu_f, bv_f, _, _, _, e_gn, _ = carry
            else:
                bu_f, bv_f = bu, bv
                e_gn = so[:, OUT_E_SEARCH : OUT_E_SEARCH + 1]

            out_ref[pl.ds(i, 1), :] = jnp.concatenate(
                [
                    bu_f,
                    bv_f,
                    so[:, OUT_E_SEARCH : OUT_E_SEARCH + 1],
                    so[:, OUT_SECOND_BEST : OUT_SECOND_BEST + 1],
                    e_gn,
                    so[:, OUT_BEST_IDX : OUT_BEST_IDX + 1],
                    jnp.zeros((1, 2), jnp.float32),
                ],
                axis=1,
            )
            return 0

        jax.lax.fori_loop(0, BLK, gn_one, 0, unroll=False)

    return kernel


def _make_kernel_resident(S, N, Ceff, huber_th, gn_iters, gn_threshold,
                          hi_precision):
    """VMEM-resident-image variant: the whole padded target image lives in
    VMEM (loaded once; ~2.9 MB at KITTI res vs ~16 MB/core), and each point
    reads its (R_SLAB, Ceff) window as a dynamic SLICE — no per-point DMA.

    Motivation (round 5, measured): the slab kernel's per-point async copy
    is 64 separate ~1 KB strided bursts; at 6144 lanes that is ~400k bursts
    per invocation and the kernel runs DMA-burst-bound at ~17.5 ms on-chip
    (xprof hlo_stats + prefix-diff + standalone timing all agree) — ~25x
    its compute cost. Resident mode removes the per-point staging entirely;
    search + GN run fused in one loop over points.

    GN gradients use the linearity identity
        bilinear(central_diff_img)(q) == 0.5*(V(q+1) - V(q-1))
    (exact, since bilinear sampling is linear in the image), so no gradient
    slabs are materialized at all."""
    SP = 8 * S

    dot_img = _dot_highest if hi_precision else _dot_bf16x3
    dot_sel = _dot_highest if hi_precision else _dot_exact_rhs

    def kernel(
        y0_ref,  # (N,) i32 scalar-prefetch
        x0_ref,  # (N,) i32 scalar-prefetch
        scal_ref,  # (N, 8) VMEM
        color_ref,
        wts_ref,
        patx_ref,
        paty_ref,
        img_ref,  # (Hp, Wp) f32 VMEM — whole padded image, loaded once
        out_ref,  # (N, 8) VMEM
    ):
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (8, SP), 1) // S
            == jax.lax.broadcasted_iota(jnp.int32, (8, SP), 0)
        ).astype(jnp.float32)
        Sel = (
            jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (SP, S), 0), S)
            == jax.lax.broadcasted_iota(jnp.int32, (SP, S), 1)
        ).astype(jnp.float32)
        s_iota_sp = jnp.mod(
            jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1), S
        ).astype(jnp.float32)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (Ceff, SP), 0).astype(
            jnp.float32
        )
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R_SLAB, SP), 0).astype(
            jnp.float32
        )
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1).astype(
            jnp.float32
        )
        cg_iota_pt = jax.lax.broadcasted_iota(jnp.int32, (Ceff, 8), 0).astype(
            jnp.float32
        )
        rg_iota_pt = jax.lax.broadcasted_iota(
            jnp.int32, (R_SLAB, 8), 0
        ).astype(jnp.float32)

        def one(i, _):
            slab = img_ref[
                pl.ds(pl.multiple_of(y0_ref[i], 8), R_SLAB),
                pl.ds(pl.multiple_of(x0_ref[i], 128), Ceff),
            ]  # (R_SLAB, Ceff) f32
            scal = scal_ref[pl.ds(i, 1), :]  # (1, 8)
            ptx = scal[:, SCAL_PTX : SCAL_PTX + 1]
            pty = scal[:, SCAL_PTY : SCAL_PTY + 1]
            dx = scal[:, SCAL_DX : SCAL_DX + 1]
            dy = scal[:, SCAL_DY : SCAL_DY + 1]
            nsteps = scal[:, SCAL_NSTEPS : SCAL_NSTEPS + 1]
            aff_a = scal[:, SCAL_AFF_A : SCAL_AFF_A + 1]
            aff_b = scal[:, SCAL_AFF_B : SCAL_AFF_B + 1]
            color = color_ref[pl.ds(i, 1), :]
            wts = wts_ref[pl.ds(i, 1), :]
            patx = patx_ref[pl.ds(i, 1), :]
            paty = paty_ref[pl.ds(i, 1), :]

            # -- discrete search (identical math to the slab kernel) --
            patx_sp = dot_sel(patx, E)  # (1, SP)
            paty_sp = dot_sel(paty, E)
            color_sp = dot_sel(color, E)
            sx = ptx + s_iota_sp * dx + patx_sp
            sy = pty + s_iota_sp * dy + paty_sp
            wc = jnp.maximum(0.0, 1.0 - jnp.abs(sx - c_iota))  # (Ceff, SP)
            m1 = dot_img(slab, wc)  # (R, SP)
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(sy - r_iota))
            vals = jnp.sum(m1 * wr, axis=0, keepdims=True)  # (1, SP)
            res = vals - (aff_a * color_sp + aff_b)
            hw = _huber(res, huber_th)
            en_sp = hw * res * res * (2.0 - hw)
            e_s = dot_sel(en_sp, Sel)
            valid = s_iota < nsteps
            e_m = jnp.where(valid, e_s, _BIG)
            be = jnp.min(e_m, axis=1, keepdims=True)
            bidx = jnp.min(
                jnp.where(e_m <= be, s_iota, _BIG), axis=1, keepdims=True
            )
            outside = jnp.abs(s_iota - bidx) > 2.0
            sb = jnp.min(
                jnp.where(valid & outside, e_s, _BIG), axis=1, keepdims=True
            )
            bu = ptx + bidx * dx
            bv = pty + bidx * dy

            # -- fused GN refinement --
            def sample8(qx, qy):
                wcg = jnp.maximum(0.0, 1.0 - jnp.abs(qx - cg_iota_pt))
                mg = dot_img(slab, wcg)  # (R, 8)
                wrg = jnp.maximum(0.0, 1.0 - jnp.abs(qy - rg_iota_pt))
                return jnp.sum(mg * wrg, axis=0, keepdims=True)  # (1, 8)

            if gn_iters > 0:
                carry = (
                    bu, bv, bu, bv,
                    jnp.zeros((1, 1), jnp.float32),
                    jnp.full((1, 1), 1e5, jnp.float32),
                    jnp.zeros((1, 1), bool),
                )
                for _it in range(gn_iters):
                    bu_c, bv_c, ubak, vbak, step_back, be_c, done = carry
                    qx = bu_c + patx
                    qy = bv_c + paty
                    hit = sample8(qx, qy)
                    # bilinear sampling is linear in the image, so sampling
                    # the central-difference gradient image equals the
                    # centered difference of value samples — no grad slabs
                    gxv = 0.5 * (sample8(qx + 1.0, qy) - sample8(qx - 1.0, qy))
                    gyv = 0.5 * (sample8(qx, qy + 1.0) - sample8(qx, qy - 1.0))
                    resi = hit - (aff_a * color + aff_b)
                    d_res = dx * gxv + dy * gyv
                    hw_g = _huber(resi, huber_th)
                    Hgn = 1.0 + jnp.sum(
                        hw_g * d_res * d_res, axis=1, keepdims=True
                    )
                    bgn = jnp.sum(hw_g * resi * d_res, axis=1, keepdims=True)
                    energy = jnp.sum(
                        wts * wts * hw_g * resi * resi * (2.0 - hw_g),
                        axis=1, keepdims=True,
                    )
                    worse = energy > be_c
                    sb_worse = step_back * 0.5
                    u_worse = ubak + sb_worse * dx
                    v_worse = vbak + sb_worse * dy
                    step = jnp.clip(-bgn / Hgn, -0.5, 0.5)
                    step = jnp.where(jnp.isfinite(step), step, 0.0)
                    u_better = bu_c + step * dx
                    v_better = bv_c + step * dy
                    new_u = jnp.where(
                        done, bu_c, jnp.where(worse, u_worse, u_better)
                    )
                    new_v = jnp.where(
                        done, bv_c, jnp.where(worse, v_worse, v_better)
                    )
                    new_ubak = jnp.where(done | worse, ubak, bu_c)
                    new_vbak = jnp.where(done | worse, vbak, bv_c)
                    new_sb = jnp.where(
                        done, step_back, jnp.where(worse, sb_worse, step)
                    )
                    new_e = jnp.where(done | worse, be_c, energy)
                    new_done = done | (jnp.abs(new_sb) < gn_threshold)
                    carry = (
                        new_u, new_v, new_ubak, new_vbak, new_sb, new_e,
                        new_done,
                    )
                bu_f, bv_f, _, _, _, e_gn, _ = carry
            else:
                bu_f, bv_f = bu, bv
                e_gn = be

            out_ref[pl.ds(i, 1), :] = jnp.concatenate(
                [bu_f, bv_f, be, sb, e_gn, bidx,
                 jnp.zeros((1, 2), jnp.float32)],
                axis=1,
            )
            return 0

        jax.lax.fori_loop(0, N, one, 0, unroll=False)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "S",
        "BLK",
        "huber_th",
        "gn_iters",
        "gn_threshold",
        "hi_precision",
        "resident",
        "interpret",
    ),
)
def epipolar_search(
    img_pad,  # (Hp, Wp) f32, from pad_image_for_search
    y0,  # (N,) int32 slab row origins (8-aligned, padded coords)
    x0,  # (N,) int32 slab col origins (128-aligned)
    scal,  # (N, 8) f32 packed per-point scalars (SCAL_*)
    color,  # (N, 8) f32 host pattern intensities
    weights,  # (N, 8) f32 host pattern weights
    patx,  # (N, 8) f32 rotated pattern x-offsets
    paty,  # (N, 8) f32 rotated pattern y-offsets
    *,
    S: int,
    BLK: int = 16,
    huber_th: float = 9.0,
    gn_iters: int = 3,
    gn_threshold: float = 0.1,
    hi_precision: bool = False,
    resident: bool = False,
    interpret: bool = False,
):
    """Run the in-VMEM epipolar search. Returns (N, 8) f32 (OUT_* lanes).

    N must be a multiple of BLK (pad with num_steps=0 rows).
    resident=True keeps the WHOLE padded image in VMEM and reads per-point
    windows as dynamic slices (no per-point DMA) — ~10x faster when the
    image fits (see _make_kernel_resident); the caller gates on size.
    """
    N = y0.shape[0]
    assert N % BLK == 0, (N, BLK)
    # the slab must bound the search segment + halo + tile alignment
    assert S + 2 * HALO + 8 <= R_SLAB, (S, R_SLAB)
    assert S + 2 * HALO + 128 <= C_SLAB, (S, C_SLAB)
    Ceff = ((S + 2 * HALO + 128 + 127) // 128) * 128  # cols actually sampled

    if resident:
        kernel_r = _make_kernel_resident(
            S, N, Ceff, float(huber_th), int(gn_iters), float(gn_threshold),
            bool(hi_precision),
        )
        grid_spec_r = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # scal
                pl.BlockSpec(memory_space=pltpu.VMEM),  # color
                pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
                pl.BlockSpec(memory_space=pltpu.VMEM),  # patx
                pl.BlockSpec(memory_space=pltpu.VMEM),  # paty
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole image
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel_r,
            out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
            grid_spec=grid_spec_r,
            interpret=interpret,
        )(y0, x0, scal, color, weights, patx, paty, img_pad)

    kernel = _make_kernel(
        S, BLK, Ceff, float(huber_th), int(gn_iters), float(gn_threshold),
        hi_precision=bool(hi_precision),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLK, 8), lambda i, y, x: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BLK * R_SLAB, C_SLAB), jnp.float32),
            pltpu.VMEM((BLK * R_SLAB, Ceff), jnp.float32),
            pltpu.VMEM((BLK * R_SLAB, Ceff), jnp.float32),
            pltpu.VMEM((BLK, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0, x0, scal, color, weights, patx, paty, img_pad)
