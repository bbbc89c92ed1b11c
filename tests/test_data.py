"""Artifact store round-trips + Brown ingestion on generated sheets."""

import numpy as np

from opencv_dlco_tpu.data.brown import (
    convert_brown_patches,
    crop_patch_grid,
    pair_labels,
    parse_pair_index,
)
from opencv_dlco_tpu.data.store import ArtifactStore, parse_model_ref


def test_store_roundtrip(tmp_path, rng):
    p = str(tmp_path / "t.h5")
    data = rng.normal(size=(300, 17)).astype(np.float32)
    with ArtifactStore(p, "w") as st:
        st.write("Distance", data)
        st.set_meta("cfg", {"mu": 0.1})
    with ArtifactStore(p, "r") as st:
        np.testing.assert_array_equal(st.read("Distance"), data)
        assert st.shape("Distance") == (300, 17)
        np.testing.assert_array_equal(st.read("Distance", 10, 20), data[10:20])
        assert st.get_meta("cfg") == {"mu": 0.1}


def test_store_streaming(tmp_path, rng):
    p = str(tmp_path / "s.h5")
    with ArtifactStore(p, "w") as st:
        st.create("Distance", (1000, 32), np.float32)
        full = np.zeros((1000, 32), np.float32)
        for s in range(0, 1000, 128):
            blk = rng.normal(size=(min(128, 1000 - s), 32)).astype(np.float32)
            st.write_rows("Distance", s, blk)
            full[s:s + blk.shape[0]] = blk
    with ArtifactStore(p, "r") as st:
        got = np.concatenate([b for _, b in st.iter_rows("Distance", 256)])
        np.testing.assert_array_equal(got, full)


def test_store_append_history(tmp_path, rng):
    p = str(tmp_path / "w.h5")
    rows = [rng.normal(size=64).astype(np.float32) for _ in range(5)]
    with ArtifactStore(p, "a") as st:
        for i, r in enumerate(rows):
            assert st.append_row("w", r) == i
    with ArtifactStore(p, "r") as st:
        hist = st.read("w")
        assert hist.shape == (5, 64)
        for i, r in enumerate(rows):
            np.testing.assert_array_equal(hist[i], r)


def test_parse_model_ref():
    assert parse_model_ref("a/b-pr.h5#7") == ("a/b-pr.h5", 7)
    assert parse_model_ref("a/b-pr.h5") == ("a/b-pr.h5", -1)


def test_crop_patch_grid():
    sheet = np.arange(1024 * 1024, dtype=np.int64).reshape(1024, 1024) % 251
    sheet = sheet.astype(np.uint8)
    patches = crop_patch_grid(sheet)
    assert patches.shape == (256, 64, 64)
    np.testing.assert_array_equal(patches[0], sheet[:64, :64])
    np.testing.assert_array_equal(patches[1], sheet[:64, 64:128])  # row-major
    np.testing.assert_array_equal(patches[16], sheet[64:128, :64])


def test_convert_brown_roundtrip(tmp_path, rng):
    # build a fake Brown dataset: 2 sheets, 300 patches, 100 pairs
    d = tmp_path / "ds"
    d.mkdir()
    n_patches, n_pairs = 300, 100
    ids = rng.integers(0, n_patches, size=(n_pairs, 2))
    pts = rng.integers(0, 50, size=(n_pairs, 2))
    lines = []
    for (i1, i2), (q1, q2) in zip(ids, pts):
        lines.append(f"{i1} {q1} 0 {i2} {q2} 0 0")
    (d / "m50_500000_500000_0.txt").write_text("\n".join(lines))
    import cv2

    sheets = rng.integers(0, 255, size=(2, 1024, 1024)).astype(np.uint8)
    for i, s in enumerate(sheets):
        cv2.imwrite(str(d / f"patches{i:04d}.bmp"), s)

    out = str(tmp_path / "ds.h5")
    np_pairs, np_patches = convert_brown_patches(str(d), out, progress=False)
    assert np_pairs == n_pairs
    assert np_patches == int(ids.max()) + 1
    with ArtifactStore(out, "r") as st:
        idx = st.read("Indices")
        patches = st.read("Patches")
        assert idx.shape == (n_pairs, 4)
        np.testing.assert_array_equal(idx[:, 0], ids[:, 0])
        np.testing.assert_array_equal(idx[:, 3], pts[:, 1])
        # patch k of sheet s lives at grid position (k//16, k%16)
        k = 37
        np.testing.assert_array_equal(
            patches[k],
            sheets[0, (k // 16) * 64:(k // 16 + 1) * 64,
                   (k % 16) * 64:(k % 16 + 1) * 64],
        )
        labels = pair_labels(idx)
        np.testing.assert_array_equal(labels, (pts[:, 0] == pts[:, 1]))
    # idempotent resume
    assert convert_brown_patches(str(d), out, progress=False) == (n_pairs, np_patches)


def test_synth_patch_pairs_device_distribution_matches_numpy():
    """synth_patch_pairs_device must be distribution-equivalent to the
    canonical numpy generator at the calibrated hard preset (it feeds the
    reference-scale e2e datasets): matched pixel moments and the same
    pos/neg separation structure, without being bit-equal."""
    import jax
    from opencv_dlco_tpu.data.synthetic import (HARD_PAIR_PARAMS,
                                                synth_patch_pairs,
                                                synth_patch_pairs_device)

    n = 1024
    rng = np.random.default_rng(7)
    a1, a2, la = synth_patch_pairs(rng, n_pairs=n, **HARD_PAIR_PARAMS)
    b1, b2, lb = synth_patch_pairs_device(jax.random.PRNGKey(7), n_pairs=n,
                                          **HARD_PAIR_PARAMS)
    assert b1.shape == a1.shape and b1.dtype == np.uint8
    assert np.array_equal(la, lb)

    def stats(p1, p2, labels):
        d = np.abs(p1.astype(np.float32) - p2.astype(np.float32))
        pos = d[labels == 1].mean()
        neg = d[labels == 0].mean()
        return p1.mean(), p1.std(), pos, neg

    am, asd, apos, aneg = stats(a1, a2, la)
    bm, bsd, bpos, bneg = stats(b1, b2, lb)
    assert abs(am - bm) < 0.05 * am, (am, bm)
    assert abs(asd - bsd) < 0.08 * asd, (asd, bsd)
    # positives are warped copies, negatives blended strangers — the
    # separation ratio is the property the solvers train against
    assert apos < aneg and bpos < bneg
    assert abs(apos / aneg - bpos / bneg) < 0.1, (apos / aneg, bpos / bneg)
