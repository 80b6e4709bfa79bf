import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.ops.interp import bilinear


def ref_pyramid(img, n_levels):
    """Straight NumPy transcription of the reference formulas
    (HessianBlocks.cpp:159-201) for golden comparison."""
    out = []
    cur = img.astype(np.float64)
    for lvl in range(n_levels):
        if lvl > 0:
            H, W = cur.shape
            cur = 0.25 * (
                cur[0 : H - 1 : 2, 0 : W - 1 : 2]
                + cur[0 : H - 1 : 2, 1:W:2]
                + cur[1:H:2, 0 : W - 1 : 2]
                + cur[1:H:2, 1:W:2]
            )
        dx = np.zeros_like(cur)
        dy = np.zeros_like(cur)
        dx[:, 1:-1] = 0.5 * (cur[:, 2:] - cur[:, :-2])
        dy[1:-1, :] = 0.5 * (cur[2:, :] - cur[:-2, :])
        out.append((cur.copy(), dx, dy))
    return out


def test_pyramid_matches_reference_formula(rng):
    img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
    dIp, asg = build_pyramid(jnp.asarray(img), 4)
    ref = ref_pyramid(img, 4)
    for lvl in range(4):
        I, dx, dy = ref[lvl]
        np.testing.assert_allclose(np.asarray(dIp[lvl][..., 0]), I, atol=1e-3)
        np.testing.assert_allclose(np.asarray(dIp[lvl][..., 1]), dx, atol=1e-3)
        np.testing.assert_allclose(np.asarray(dIp[lvl][..., 2]), dy, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(asg[lvl]), dx * dx + dy * dy, atol=1e-2
        )


def test_pyramid_shapes(rng):
    img = rng.uniform(0, 255, size=(128, 256)).astype(np.float32)
    dIp, asg = build_pyramid(jnp.asarray(img), 6)
    for lvl in range(6):
        assert dIp[lvl].shape == (128 >> lvl, 256 >> lvl, 3)
        assert asg[lvl].shape == (128 >> lvl, 256 >> lvl)


def test_bilinear_exact_on_grid(rng):
    img = rng.uniform(0, 255, size=(32, 48)).astype(np.float32)
    xs = jnp.asarray([0.0, 5.0, 46.0, 13.0])
    ys = jnp.asarray([0.0, 7.0, 30.0, 2.0])
    vals = bilinear(jnp.asarray(img), xs, ys)
    expect = img[np.asarray(ys, int), np.asarray(xs, int)]
    np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-4)


def test_bilinear_matches_reference_formula(rng):
    img = rng.uniform(0, 255, size=(32, 48)).astype(np.float32)
    x = np.asarray([3.25, 10.5, 20.75, 1.1], dtype=np.float32)
    y = np.asarray([4.5, 2.25, 15.9, 30.0], dtype=np.float32)
    vals = bilinear(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
    ix, iy = x.astype(int), y.astype(int)
    dx, dy = x - ix, y - iy
    dxdy = dx * dy
    expect = (
        dxdy * img[iy + 1, ix + 1]
        + (dy - dxdy) * img[iy + 1, ix]
        + (dx - dxdy) * img[iy, ix + 1]
        + (1 - dx - dy + dxdy) * img[iy, ix]
    )
    np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-4)


def test_bilinear_multichannel(rng):
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    v = bilinear(jnp.asarray(img), jnp.asarray([2.5]), jnp.asarray([3.5]))
    assert v.shape == (1, 3)
    expect = 0.25 * (img[3, 2] + img[3, 3] + img[4, 2] + img[4, 3])
    np.testing.assert_allclose(np.asarray(v[0]), expect, atol=1e-5)
