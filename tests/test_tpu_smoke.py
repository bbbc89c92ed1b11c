"""Pallas-kernel parity ON REAL HARDWARE (VERDICT r2 next #8).

The interpret-mode tests (test_pallas_fused.py, test_roc_hinge.py,
test_fused_rda.py, test_knn_pallas.py) run the kernels through the Pallas
interpreter on CPU; hardware behaviour (MXU pass structure, VMEM layout,
revisiting semantics of scratch accumulators) is only equivalent by
contract. This suite re-runs the same comparisons COMPILED on the chip so
hardware parity is re-checked every round instead of trusted from one
bench run:

    DLCO_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu_smoke -q

Every test asserts against the XLA HIGHEST-precision oracle computed on
the same device. Shapes are kept small (compile on the tunnel costs
~20-40 s per program) but cover the non-trivial grid paths: multi-tile
grids, scalar-prefetch offsets, scratch accumulators carried across grid
steps.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu_smoke,
    pytest.mark.skipif(
        os.environ.get("DLCO_TEST_PLATFORM") != "tpu",
        reason="hardware smoke tests need DLCO_TEST_PLATFORM=tpu",
    ),
]


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


def test_hinge_blockwise_hw():
    """Blockwise all-pairs hinge (kernelop-opencv.cu analogue) vs sorted
    O(N log N) exact reformulation, compiled on the chip."""
    from opencv_dlco_tpu.ops.hinge import hinge_sum_blockwise, hinge_sum_sorted

    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (4096,), jnp.float32)
    neg = jax.random.normal(jax.random.fold_in(key, 1), (4096,), jnp.float32)
    ref = float(hinge_sum_sorted(pos, neg))
    hw = float(hinge_sum_blockwise(pos, neg))
    assert abs(hw - ref) / abs(ref) < 1e-5, (hw, ref)


def test_stage3_fused_hw(rng):
    """Fused stage-3 ring-distance kernel vs the XLA path on hardware."""
    from opencv_dlco_tpu.ops.pair_distance import ring_distances
    from opencv_dlco_tpu.ops.pair_distance_pallas import ring_distances_fused
    from opencv_dlco_tpu.ops.patch_transform import batch_patch_transform
    from opencv_dlco_tpu.ops.pool_regions import build_filter_bank
    from opencv_dlco_tpu.utils.configs import PoolRegionConfig

    cfg = PoolRegionConfig(nr=16, nphi=2, nsigma=4)   # 1024 filters
    _, _, filters = build_filter_bank(cfg)
    patches = rng.integers(0, 255, (32, 64, 64)).astype(np.uint8)
    pt = batch_patch_transform(jnp.asarray(patches))
    f = jnp.asarray(filters)
    ref = np.asarray(ring_distances(f, pt[:16], pt[16:]))
    # the kernel's documented numerics contract is bf16-grade: in-kernel
    # dots run one MXU pass even for f32 inputs (med rel err ~1.3e-3 vs
    # XLA HIGHEST — module docstring of pair_distance_pallas)
    hw = np.asarray(ring_distances_fused(f, pt[:16], pt[16:]))
    rel = np.abs(hw - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 3e-3, float(np.median(rel))
    assert np.max(rel) < 5e-2, float(np.max(rel))
    hw16 = np.asarray(ring_distances_fused(f, pt[:16], pt[16:], bf16=True))
    rel = np.abs(hw16 - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 2e-2


def test_fused_rda_grad_hw():
    """Single-block fused hinge-subgradient kernel vs the unfused oracle."""
    from opencv_dlco_tpu.ops.fused_rda import (fused_block_grad,
                                               reference_block_grad)

    key = jax.random.PRNGKey(7)
    kp, kn, kw = jax.random.split(key, 3)
    pos = jnp.abs(1.0 + 0.5 * jax.random.normal(kp, (2048, 640), jnp.float32))
    neg = jnp.abs(1.2 + 0.5 * jax.random.normal(kn, (2048, 640), jnp.float32))
    w = jnp.abs(0.05 * jax.random.normal(kw, (4, 640), jnp.float32))
    ip = jnp.int32(3)
    inn = jnp.int32(5)
    ref = np.asarray(reference_block_grad(pos, neg, w, ip, inn, batch=512))
    hw = np.asarray(fused_block_grad(pos, neg, w, ip, inn, batch=512))
    np.testing.assert_allclose(hw, ref, rtol=1e-4, atol=1e-3)


def test_fused_rda_train_hw():
    """Whole-chunk fused RDA (narrow + wide) vs the XLA scan path on the
    chip: same keys -> same sampled blocks -> near-identical iterates."""
    from opencv_dlco_tpu.models.pr_rda import pr_init, pr_train_chunk
    from opencv_dlco_tpu.ops.fused_rda import (fused_block_train,
                                               fused_block_train_wide)

    key = jax.random.PRNGKey(11)
    kp, kn = jax.random.split(key)
    n_rows, n_feat = 4096, 640
    pos = jnp.abs(1.0 + 0.5 * jax.random.normal(kp, (n_rows, n_feat),
                                                jnp.float32))
    neg = jnp.abs(1.2 + 0.5 * jax.random.normal(kn, (n_rows, n_feat),
                                                jnp.float32))
    for s_axis, fn in ((4, fused_block_train), (32, fused_block_train_wide)):
        mu = jnp.linspace(0.01, 0.04, s_axis).astype(jnp.float32)
        gamma = jnp.linspace(0.05, 0.2, s_axis).astype(jnp.float32)
        st = pr_init(n_feat, s_axis)
        w_f, df_f, t_f = fn(pos, neg, st.w, st.df_avg, st.t, mu, gamma,
                            key, batch=1024, n_steps=4, tile_b=128)
        # oracle: the scan path with the same per-step tile-aligned offsets
        # (pr_train_chunk block mode draws row- not tile-granular offsets,
        # so replay the kernel's own draw here) — ONE jitted program, the
        # eager per-op dispatch would pay a remote compile per op
        @jax.jit
        def oracle(w0, df0, t0):
            def step(carry, k):
                w, df, t = carry
                kp2, kn2 = jax.random.split(k)
                hi = (n_rows - 1024) // 128 + 1
                ip = jax.random.randint(kp2, (), 0, hi)
                inn = jax.random.randint(kn2, (), 0, hi)
                fd = (jax.lax.dynamic_slice(pos, (ip * 128, 0),
                                            (1024, n_feat))
                      - jax.lax.dynamic_slice(neg, (inn * 128, 0),
                                              (1024, n_feat)))
                f = jnp.matmul(fd, w.T, precision=jax.lax.Precision.HIGHEST)
                g = jnp.matmul((f > -1.0).astype(jnp.float32).T, fd,
                               precision=jax.lax.Precision.HIGHEST)
                tf = t.astype(jnp.float32)
                tnf = (t + 1024).astype(jnp.float32)
                df = (tf * df + g) / tnf
                w = jnp.maximum(0.0, -jnp.sqrt(tnf) / gamma[:, None]
                                * (df + mu[:, None]))
                return (w, df, t + 1024), None

            (w, df, t), _ = jax.lax.scan(step, (w0, df0, t0),
                                         jax.random.split(key, 4))
            return w, df, t

        stx = pr_init(n_feat, s_axis)
        w, df, t = oracle(stx.w, stx.df_avg, stx.t)
        assert int(t_f) == int(t)
        np.testing.assert_allclose(np.asarray(w_f), np.asarray(w),
                                   rtol=2e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(df_f), np.asarray(df),
                                   rtol=2e-3, atol=1e-2)


def test_knn2_fused_hw():
    """Fused 2-NN kernel vs XLA HIGHEST knn_match on hardware (f32 exact
    indices; bf16 match-set identity)."""
    from opencv_dlco_tpu.ops.knn import knn_match, ratio_test
    from opencv_dlco_tpu.ops.knn_pallas import knn2_fused

    rng = np.random.default_rng(11)
    centres = rng.normal(size=(800, 64)).astype(np.float32)
    q = jnp.asarray(centres[:500]
                    + 0.05 * rng.normal(size=(500, 64)).astype(np.float32))
    t = np.concatenate([centres,
                        rng.normal(size=(2200, 64)).astype(np.float32)])
    t = jnp.asarray(t[rng.permutation(len(t))].astype(np.float32))
    d_ref, i_ref = knn_match(q, t, k=2, block=512,
                             precision=jax.lax.Precision.HIGHEST,
                             fused=False)
    d_f, i_f = knn2_fused(q, t, bf16=False)
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    d_b, i_b = knn2_fused(q, t, bf16=True)
    m_ref, _ = ratio_test(d_ref, i_ref, ratio=0.9)
    m_b, _ = ratio_test(d_b, i_b, ratio=0.9)
    agree = np.mean(np.asarray(m_ref) == np.asarray(m_b))
    assert agree >= 0.99, f"ratio-test match identity {agree:.4f}"


def test_knn_dispatch_and_general_k_hw():
    """The production dispatcher must pick the fused kernels on TPU and
    agree with the XLA path: knn2 (k<=2), knnk (HPatches k=10), the
    batched SLAM-chunk kernel, and the fused mutual cross-check."""
    from opencv_dlco_tpu.ops.knn import knn_match, mutual_nearest
    from opencv_dlco_tpu.ops.knn_pallas import knn2_fused_batched

    rng = np.random.default_rng(17)
    centres = rng.normal(size=(600, 64)).astype(np.float32)
    q = jnp.asarray(centres[:384]
                    + 0.05 * rng.normal(size=(384, 64)).astype(np.float32))
    t = jnp.asarray(np.concatenate(
        [centres, rng.normal(size=(1000, 64)).astype(np.float32)]))

    for k in (2, 10):
        d_ref, i_ref = knn_match(q, t, k=k, block=512,
                                 precision=jax.lax.Precision.HIGHEST,
                                 fused=False)
        d_f, i_f = knn_match(q, t, k=k, block=512,
                             precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                                   rtol=1e-4, atol=1e-4)

    m_ref, ok_ref = mutual_nearest(q, t, block=512, fused=False)
    m_f, ok_f = mutual_nearest(q, t, block=512)
    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_ref))

    qb = jnp.asarray(rng.normal(size=(4, 256, 64)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(4, 256, 64)).astype(np.float32))
    d_b, i_b = knn2_fused_batched(qb, tb, bf16=False)
    for b in range(4):
        d_r, i_r = knn_match(qb[b], tb[b], k=2, block=256,
                             precision=jax.lax.Precision.HIGHEST,
                             fused=False)
        np.testing.assert_array_equal(np.asarray(i_b[b]), np.asarray(i_r))


def test_slam_short_row_meets_bar_hw():
    """The 48-frame flagship SLAM row must meet its 0.10x-span ATE bar ON
    THE CHIP at default config (VERDICT r3 next #1 'Done' criterion; the
    committed bench artifact is produced on the same backend)."""
    from opencv_dlco_tpu.data.synthetic import render_blob_sequence
    from opencv_dlco_tpu.models.vgg import VGGDescriptor
    from opencv_dlco_tpu.pipeline.slam import (SlamConfig, ate_rmse,
                                               compute_features,
                                               run_back_end, run_odometry)

    header = "/root/reference/workspace/opencv/vgg_generated_64.i"
    if not os.path.exists(header):
        pytest.skip("reference VGG header not mounted")
    with open(header) as fh:
        model = VGGDescriptor.from_header(fh.read())
    rng = np.random.default_rng(2215)
    frames, centers_gt, intr = render_blob_sequence(rng, 48, size=256)
    cfg = SlamConfig(n_keypoints=256, kf_min_translation=2.5,
                     kf_min_rotation=0.05, loop_gap=10)   # the bench row
    assert cfg.odo_redundant, "redundant odometry must be the default"
    feats = compute_features(frames, model, cfg)
    odo = run_odometry(frames, intr, model, cfg, feats=feats)
    refined = run_back_end(odo, feats, intr, cfg)
    span = float(np.linalg.norm(centers_gt.max(0) - centers_gt.min(0)))
    ate_ref = ate_rmse(refined.translations, centers_gt) / span
    assert ate_ref < 0.10, f"48-frame chip ATE {ate_ref:.4f} >= 0.10x span"


def test_pipelined_wide_rda_hw():
    """The single-program pipelined wide kernel (manual double-buffered
    DMA fori_loop — VERDICT r4 next #3) vs the grid wide kernel, both
    COMPILED on the chip: same key -> same offset stream -> identical
    math; hardware checks the DMA/semaphore schedule is race-free."""
    from opencv_dlco_tpu.models.pr_rda import pr_init
    from opencv_dlco_tpu.ops.fused_rda import (
        fused_block_train_wide, fused_block_train_wide_pipelined)

    key = jax.random.PRNGKey(13)
    kp, kn = jax.random.split(key)
    n_rows, n_feat, s_axis = 4096, 640, 32
    pos = jnp.abs(1.0 + 0.5 * jax.random.normal(kp, (n_rows, n_feat),
                                                jnp.bfloat16))
    neg = jnp.abs(1.2 + 0.5 * jax.random.normal(kn, (n_rows, n_feat),
                                                jnp.bfloat16))
    mu = jnp.linspace(0.01, 0.04, s_axis).astype(jnp.float32)
    gamma = jnp.linspace(0.05, 0.2, s_axis).astype(jnp.float32)
    st = pr_init(n_feat, s_axis)
    args = (pos, neg, st.w, st.df_avg, st.t, mu, gamma, key)
    w_g, df_g, t_g = fused_block_train_wide(
        *args, batch=1024, n_steps=4, tile_b=128)
    w_p, df_p, t_p = fused_block_train_wide_pipelined(
        *args, batch=1024, n_steps=4, tile_b=128)
    assert int(t_g) == int(t_p)
    np.testing.assert_allclose(np.asarray(df_g), np.asarray(df_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_p),
                               rtol=1e-5, atol=1e-6)


def test_knn_wide_train_blocks_hw():
    """The widened bf16 train-block tiling (tb=2048) must keep match
    identity vs the HIGHEST XLA oracle on a problem big enough to span
    several wide blocks."""
    from opencv_dlco_tpu.ops.knn import knn_match
    from opencv_dlco_tpu.ops.knn_pallas import knn2_fused

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2048, 64)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8192, 64)).astype(np.float32))
    d_f, i_f = knn2_fused(q, t, bf16=True)
    d_r, i_r = knn_match(q, t, k=2, block=4096,
                         precision=jax.lax.Precision.HIGHEST, fused=False)
    ident = float(np.mean(np.asarray(i_f) == np.asarray(i_r)))
    assert ident >= 0.999, f"match identity {ident:.5f} under wide tiles"


def test_slam_worst_seed_meets_bar_hw():
    """Seed-robustness on hardware (VERDICT r4 next #2): re-run the WORST
    seed of the committed multi-seed study's 48-frame row and hold it to
    the same bar the artifact claims — the bar is not seed-conditional.
    Skips only if the study artifact has not been captured."""
    import json

    from opencv_dlco_tpu.data.synthetic import render_blob_sequence
    from opencv_dlco_tpu.models.vgg import VGGDescriptor
    from opencv_dlco_tpu.pipeline.slam import (SlamConfig, ate_rmse,
                                               compute_features,
                                               run_back_end, run_odometry)

    study_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "slam_seed_study.json")
    if not os.path.exists(study_path):
        pytest.skip("multi-seed slam study not captured yet")
    header = "/root/reference/workspace/opencv/vgg_generated_64.i"
    if not os.path.exists(header):
        pytest.skip("reference VGG header not mounted")
    with open(study_path) as fh:
        rows = [r for r in json.load(fh) if r["scene"] == 48]
    worst = max(rows, key=lambda r: r["ate_ref"])
    bar = max(0.105, worst["ate_ref"] * 1.25)  # committed level + headroom

    with open(header) as fh:
        model = VGGDescriptor.from_header(fh.read())
    rng = np.random.default_rng(worst["seed"])
    frames, centers_gt, intr = render_blob_sequence(rng, 48, size=256)
    cfg = SlamConfig(n_keypoints=256, kf_min_translation=2.5,
                     kf_min_rotation=0.05, loop_gap=10)
    feats = compute_features(frames, model, cfg)
    odo = run_odometry(frames, intr, model, cfg, feats=feats)
    refined = run_back_end(odo, feats, intr, cfg)
    span = float(np.linalg.norm(centers_gt.max(0) - centers_gt.min(0)))
    ate_ref = ate_rmse(refined.translations, centers_gt) / span
    assert ate_ref <= bar, (worst["seed"], ate_ref, bar)
