"""Native data-plane runtime: build, decode parity vs cv2, threaded crops."""

import numpy as np
import pytest

from opencv_dlco_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library failed to build")
    return True


def _write_bmp(path, img):
    import cv2

    assert cv2.imwrite(str(path), img)


def test_bmp_gray_roundtrip(tmp_path, rng, lib_ok):
    img = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    p = tmp_path / "g.bmp"
    _write_bmp(p, img)
    out = native.bmp_load_gray(str(p))
    np.testing.assert_array_equal(out, img)


def test_bmp_color_to_gray(tmp_path, rng, lib_ok):
    import cv2

    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    p = tmp_path / "c.bmp"
    _write_bmp(p, img)
    out = native.bmp_load_gray(str(p))
    ref = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    # both use integer BT.601-ish luma; allow 1 count of rounding skew
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_load_patch_sheets_matches_fallback(tmp_path, rng, lib_ok):
    import cv2

    sheets = rng.integers(0, 255, (3, 1024, 1024)).astype(np.uint8)
    paths = []
    for i, s in enumerate(sheets):
        p = tmp_path / f"patches{i:04d}.bmp"
        _write_bmp(p, s)
        paths.append(str(p))
    out = native.load_patch_sheets(paths, n_threads=2)
    assert out.shape == (3 * 256, 64, 64)
    from opencv_dlco_tpu.data.brown import crop_patch_grid

    ref = np.concatenate([crop_patch_grid(s) for s in sheets])
    np.testing.assert_array_equal(out, ref)


def test_parse_m50(tmp_path, rng, lib_ok):
    rows = rng.integers(0, 100000, size=(500, 4))
    lines = [f"{r[0]} {r[1]} 0 {r[2]} {r[3]} 0 0" for r in rows]
    p = tmp_path / "m50_500000_500000_0.txt"
    p.write_text("\n".join(lines))
    out = native.parse_m50(str(p))
    np.testing.assert_array_equal(out, rows.astype(np.int32))
