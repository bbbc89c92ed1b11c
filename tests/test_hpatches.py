"""HPatches patches-release loader + protocol harness (data/hpatches.py)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_dlco_tpu.data.hpatches import (
    evaluate,
    load_benchmark,
    load_sequence,
    resize_patches,
)
from opencv_dlco_tpu.data.synthetic import _smooth
from opencv_dlco_tpu.ops.sift import sift_describe

cv2 = pytest.importorskip("cv2")


def _make_tree(root, n_seq=2, k=24, rng=None):
    """Synthetic HPatches-release layout: warped stacks are shifted+noised
    copies of the reference texture (row-aligned matches)."""
    rng = rng or np.random.default_rng(17)
    pad = 4
    for s in range(n_seq):
        seq = root / (("i_" if s % 2 else "v_") + f"seq{s}")
        seq.mkdir(parents=True)
        base = _smooth(rng, k, 65 + 2 * pad)

        def crop(dy=0, dx=0, noise=0.0):
            out = base[:, pad + dy:pad + dy + 65, pad + dx:pad + dx + 65]
            out = out + rng.normal(0, noise, out.shape)
            return (np.clip(out, 0, 1) * 255).astype(np.uint8)

        stacks = {"ref": crop()}
        for i, (d, amp) in enumerate(
                [("e", 1), ("e", 2), ("h", 3), ("t", 4)]):
            n = sum(1 for key in stacks if key.startswith(d))
            dy, dx = rng.integers(-amp, amp + 1, size=2)
            stacks[f"{d}{n + 1}"] = crop(dy, dx, noise=0.02 * amp)
        for name, stack in stacks.items():
            tall = stack.reshape(-1, 65)
            assert cv2.imwrite(str(seq / f"{name}.png"), tall)
    return root


def test_resize_patches_identity_and_shape(rng):
    p = rng.integers(0, 255, (5, 64, 64)).astype(np.uint8)
    np.testing.assert_array_equal(resize_patches(p, 64), p)  # no-op at 64
    out = resize_patches(rng.integers(0, 255, (5, 65, 65)).astype(np.uint8))
    assert out.shape == (5, 64, 64) and out.dtype == np.uint8


def test_load_and_evaluate(tmp_path):
    _make_tree(tmp_path)
    seqs = load_benchmark(str(tmp_path))
    assert len(seqs) == 2
    seq = seqs[0]
    assert seq.ref.shape == (24, 64, 64)
    assert len(seq.warped["e"]) == 2
    assert len(seq.warped["h"]) == 1 and len(seq.warped["t"]) == 1
    p1, p2 = seq.pairs("e")
    assert p1.shape == p2.shape == (48, 64, 64)

    m = evaluate(sift_describe, seqs, difficulty="e")
    assert m["n_evals"] == 4
    assert m["auc"] > 0.95, m
    assert m["matching_map"] > 0.8, m

    # harder warps must not score better than easy ones
    m_t = evaluate(sift_describe, seqs, difficulty="t")
    assert m_t["auc"] <= m["auc"] + 0.02


def test_load_sequence_rejects_bad_stack(tmp_path):
    seq = tmp_path / "i_bad"
    seq.mkdir()
    assert cv2.imwrite(str(seq / "ref.png"),
                       np.zeros((64, 65), np.uint8))  # not a 65-multiple
    with pytest.raises(ValueError):
        load_sequence(str(seq))
