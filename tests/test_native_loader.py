"""Native C++ loader (native/loader.cpp) vs the Python reference path.

Covers: PNG 8/16-bit + RGB decode equality, remap+photometric equivalence
against the jitted Undistorter/PhotometricUndistorter, prefetch ordering,
and the StereoDataset.prefetch() stream (DatasetReader.h:200-226 analog).
"""

import os

import numpy as np
import pytest

from stereo_dso_g2o_tpu.runtime import native_loader as NL

pytestmark = pytest.mark.skipif(
    not NL.available(), reason=f"native loader unavailable: {NL.build_error()}"
)


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_decode_gray8(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    _save_png(p, img)
    out = NL.decode_gray(p)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_decode_gray16(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (21, 33), dtype=np.uint16)
    p = str(tmp_path / "g16.png")
    _save_png(p, img)
    out = NL.decode_gray(p)
    # matches io/dataset._load_gray: 16-bit scaled by 255/65535
    np.testing.assert_allclose(
        out, img.astype(np.float32) * (255.0 / 65535.0), rtol=1e-6
    )


def test_decode_rgb(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _save_png(p, img)
    out = NL.decode_gray(p)
    ref = img[..., :3].astype(np.float32) @ np.array(
        [0.299, 0.587, 0.114], np.float32
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_prefetch_order_and_values(tmp_path):
    rng = np.random.default_rng(3)
    lp, rp, refs = [], [], []
    for i in range(10):
        l8 = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        r8 = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        pl = str(tmp_path / f"l{i}.png")
        pr = str(tmp_path / f"r{i}.png")
        _save_png(pl, l8)
        _save_png(pr, r8)
        lp.append(pl)
        rp.append(pr)
        refs.append((l8, r8))
    loader = NL.NativeStereoLoader(lp, rp, 24, 16, n_workers=3, capacity=3)
    seen = []
    for idx, left, right in loader:
        seen.append(idx)
        np.testing.assert_array_equal(left, refs[idx][0].astype(np.float32))
        np.testing.assert_array_equal(right, refs[idx][1].astype(np.float32))
    assert seen == list(range(10))
    loader.close()


def test_remap_photometric_matches_python(tmp_path):
    """Full pipeline (FOV remap + gamma + vignette) vs the jitted path."""
    from stereo_dso_g2o_tpu.io.dataset import StereoDataset
    from stereo_dso_g2o_tpu.io import synthetic

    rng = np.random.default_rng(4)
    w0, h0 = 96, 64
    base = tmp_path / "seq"
    os.makedirs(base / "image_0")
    os.makedirs(base / "image_1")
    scene = synthetic.default_scene(5)
    K = synthetic.default_K(w0, h0)
    for i in range(3):
        T = np.eye(4)
        T[:3, 3] = [0.02 * i, 0.0, 0.01 * i]
        l, r, _ = synthetic.render_stereo_pair(scene, K, w0, h0, 0.1, T)
        _save_png(str(base / "image_0" / f"{i:06d}.png"), l.astype(np.uint8))
        _save_png(str(base / "image_1" / f"{i:06d}.png"), r.astype(np.uint8))
    calib = base / "cam.txt"
    with open(calib, "w") as f:
        # FOV model (omega != 0) so a real remap table is exercised
        f.write(
            f"FOV {K[0,0]/w0} {K[1,1]/h0} {K[0,2]/w0} {K[1,2]/h0} 0.2\n"
            f"{w0} {h0}\ncrop\n{w0} {h0}\n0.1\n"
        )
    gamma = tmp_path / "pcalib.txt"
    g = np.linspace(0, 255, 256) ** 1.1
    np.savetxt(gamma, g[None], fmt="%.6f")
    vig = tmp_path / "vignette.png"
    vmap = (
        55000
        + 10000 * np.cos(np.linspace(0, 2, h0))[:, None]
        * np.ones((1, w0))
    ).astype(np.uint16)
    _save_png(str(vig), vmap)

    ds = StereoDataset(
        str(base), calib_file=str(calib), gamma_file=str(gamma),
        vignette_file=str(vig), n_levels=4,
    )
    ref = [ds.get(i) for i in range(3)]
    out = list(ds.prefetch(n_workers=2, capacity=2))
    assert len(out) == 3
    for (l_n, r_n, ts_n, e_n), (l_p, r_p, ts_p, e_p) in zip(out, ref):
        assert ts_n == ts_p and e_n == e_p
        np.testing.assert_allclose(l_n, np.asarray(l_p), atol=2e-2)
        np.testing.assert_allclose(r_n, np.asarray(r_p), atol=2e-2)
