"""Grid-based approximate K-nearest-neighbours for selected image points.

Replaces the vendored nanoflann KD-tree (util/nanoflann.h + FLANNPointcloud,
CoarseInitializer.h:217-246), which the reference uses only to build the mono
initializer's 10-NN regularization graph and parent links (makeNN,
CoarseInitializer.cpp:1249+).

Pixel-selected points are near-uniform (one per potential cell), so a simple
occupancy grid with a 5x5-cell candidate neighbourhood recovers (almost
always exactly) the same 10 nearest neighbours, with fully static shapes —
no tree, no recursion, jit-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("gh", "gw", "k"))
def grid_knn(us, vs, valid, cell: jax.Array, *, gh: int, gw: int, k: int = 10):
    """K nearest neighbours among (us, vs) via an occupancy grid.

    us, vs: (N,) point coords; valid: (N,); cell: () cell size in pixels.
    gh, gw: static grid dims (>= ceil(max_v/cell)+1 etc.).
    Returns (idx (N, k) int32 with -1 fill, dist2 (N, k)).
    """
    N = us.shape[0]
    ci = jnp.clip((us / cell).astype(jnp.int32), 0, gw - 1)
    cj = jnp.clip((vs / cell).astype(jnp.int32), 0, gh - 1)
    # last-writer-wins occupancy: with ~1 point per cell collisions are rare
    grid = jnp.full((gh, gw), -1, jnp.int32)
    grid = grid.at[cj, ci].set(
        jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1)
    )

    # 5x5 neighbourhood candidates (25 per point, incl. own cell)
    offs = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]
    cand = []
    for dy, dx in offs:
        yy = jnp.clip(cj + dy, 0, gh - 1)
        xx = jnp.clip(ci + dx, 0, gw - 1)
        cand.append(grid[yy, xx])
    cand = jnp.stack(cand, axis=1)  # (N, 25)

    safe = jnp.maximum(cand, 0)
    du = us[safe] - us[:, None]
    dv = vs[safe] - vs[:, None]
    d2 = du * du + dv * dv
    bad = (cand < 0) | (cand == jnp.arange(N)[:, None]) | ~valid[:, None]
    d2 = jnp.where(bad, jnp.inf, d2)

    neg_d2, top_idx = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand, top_idx, axis=1)
    dist2 = -neg_d2
    idx = jnp.where(jnp.isinf(dist2), -1, idx)
    return idx.astype(jnp.int32), jnp.where(jnp.isinf(dist2), 0.0, dist2)


@functools.partial(jax.jit, static_argnames=("gh", "gw"))
def grid_parent(us, vs, valid, us_c, vs_c, valid_c, cell: jax.Array, *, gh: int, gw: int):
    """Nearest coarser-level point ("parent" link, makeNN parent search):
    for each fine point, the closest of the coarser points in a 3x3 cell
    neighbourhood around (u/2, v/2). Returns (N,) int32, -1 where none."""
    N = us.shape[0]
    M = us_c.shape[0]
    pu = us * 0.5
    pv = vs * 0.5
    ci = jnp.clip((us_c / cell).astype(jnp.int32), 0, gw - 1)
    cj = jnp.clip((vs_c / cell).astype(jnp.int32), 0, gh - 1)
    grid = jnp.full((gh, gw), -1, jnp.int32)
    grid = grid.at[cj, ci].set(
        jnp.where(valid_c, jnp.arange(M, dtype=jnp.int32), -1)
    )
    qi = jnp.clip((pu / cell).astype(jnp.int32), 0, gw - 1)
    qj = jnp.clip((pv / cell).astype(jnp.int32), 0, gh - 1)
    cand = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = jnp.clip(qj + dy, 0, gh - 1)
            xx = jnp.clip(qi + dx, 0, gw - 1)
            cand.append(grid[yy, xx])
    cand = jnp.stack(cand, axis=1)  # (N, 9)
    safe = jnp.maximum(cand, 0)
    d2 = (us_c[safe] - pu[:, None]) ** 2 + (vs_c[safe] - pv[:, None]) ** 2
    d2 = jnp.where((cand < 0) | ~valid[:, None], jnp.inf, d2)
    best = jnp.argmin(d2, axis=1)
    parent = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    none = jnp.isinf(jnp.min(d2, axis=1))
    return jnp.where(none, -1, parent).astype(jnp.int32)
