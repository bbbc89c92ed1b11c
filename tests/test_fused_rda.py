"""Fused Pallas RDA-step kernel vs unfused float32 oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.models.pr_rda import pr_init, pr_train_chunk
from opencv_dlco_tpu.ops.fused_rda import (
    fused_block_grad,
    reference_block_grad,
)

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.parametrize("s_dim", [1, 8])
def test_fused_block_grad_matches_oracle(s_dim):
    rng = np.random.default_rng(11)  # pinned: suite-order independent
    n, f, batch, tile_b = 1024, 384, 256, 128
    pos = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (n, f))).astype(np.float32))
    neg = jnp.asarray(np.abs(rng.normal(1.2, 0.5, (n, f))).astype(np.float32))
    w = jnp.asarray(np.abs(rng.normal(0, 0.1, (s_dim, f))).astype(np.float32))
    for ip0b, in0b in [(0, 0), (3, 1), ((n - batch) // tile_b,
                                        (n - batch) // tile_b)]:
        g_fused = fused_block_grad(
            pos, neg, w, jnp.int32(ip0b), jnp.int32(in0b),
            batch=batch, tile_b=tile_b, interpret=not ON_TPU)
        g_ref = reference_block_grad(pos, neg, w, ip0b, in0b,
                                     batch=batch, tile_b=tile_b)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-5, atol=2e-4)


def test_block_fused_training_converges():
    """block_fused sampling must train to the same solution class as block
    (planted informative features recovered)."""
    rng = np.random.default_rng(12)  # pinned: suite-order independent
    from opencv_dlco_tpu.data.synthetic import synth_pr_dataset
    from opencv_dlco_tpu.models.pr_rda import pr_validate

    pos, neg, info = synth_pr_dataset(rng, n_pos=1024, n_neg=1024,
                                      n_feat=256, n_informative=12)
    pos, neg = jnp.asarray(pos), jnp.asarray(neg)
    mu = jnp.asarray([0.02], jnp.float32)
    gamma = jnp.asarray([0.1], jnp.float32)
    key = jax.random.PRNGKey(7)
    state = pr_init(256, 1)
    for _ in range(6):
        key, sub = jax.random.split(key)
        state = pr_train_chunk(pos, neg, mu, gamma, state, sub,
                               batch=256, n_steps=32,
                               sampling="block_fused")
    _, _, obj, nnz = pr_validate(pos, neg, mu, state)
    assert np.isfinite(float(obj[0]))
    w = np.asarray(state.w[0])
    assert w.max() > 0
    # the informative features should dominate the learned weights
    top = np.argsort(w)[-12:]
    assert len(set(top.tolist()) & set(info.tolist())) >= 8


def test_block_fused_falls_back_when_vmem_exceeded():
    """A sweep axis too wide for VMEM residency (resident w + df + tiles
    over the 12 MiB budget in pr_train_chunk) must silently use the XLA
    block path — same math, same RNG stream."""
    rng = np.random.default_rng(13)  # pinned: suite-order independent
    f_dim, s = 5120, 384             # 384*5120*8 B residents ≈ 15.7 MiB
    pos = jnp.asarray(
        np.abs(rng.normal(1.0, 0.5, (384, f_dim))).astype(np.float32))
    neg = jnp.asarray(
        np.abs(rng.normal(1.2, 0.5, (384, f_dim))).astype(np.float32))
    mu = jnp.full((s,), 0.02, jnp.float32)
    gamma = jnp.full((s,), 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)
    st_f = pr_train_chunk(pos, neg, mu, gamma, pr_init(f_dim, s), key,
                          batch=128, n_steps=2, sampling="block_fused")
    st_b = pr_train_chunk(pos, neg, mu, gamma, pr_init(f_dim, s), key,
                          batch=128, n_steps=2, sampling="block")
    np.testing.assert_allclose(np.asarray(st_f.w), np.asarray(st_b.w),
                               rtol=1e-6)


def test_fused_block_train_wide_matches_stepwise():
    """The wide-S whole-chunk kernel (df-folding, no g scratch) must match
    a stepwise XLA replay of the same tile-aligned offsets on f32 inputs —
    the fold df <- df*t/(t+B); df += g_tile/(t+B) is algebraically the
    exact RDA average."""
    from opencv_dlco_tpu.ops.fused_rda import fused_block_train_wide

    rng = np.random.default_rng(17)
    n, f, batch, tile_b, n_steps, s = 1024, 384, 256, 128, 5, 16
    pos = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (n, f))).astype(np.float32))
    neg = jnp.asarray(np.abs(rng.normal(1.2, 0.5, (n, f))).astype(np.float32))
    mu = jnp.asarray(np.geomspace(0.005, 0.08, s), jnp.float32)
    gamma = jnp.asarray(np.geomspace(0.02, 0.5, s), jnp.float32)
    key = jax.random.PRNGKey(21)

    w, df, t = fused_block_train_wide(
        pos, neg, jnp.zeros((s, f), jnp.float32),
        jnp.zeros((s, f), jnp.float32), jnp.int32(0), mu, gamma, key,
        batch=batch, n_steps=n_steps, tile_b=tile_b, interpret=not ON_TPU)
    assert int(t) == batch * n_steps

    w_r = jnp.zeros((s, f), jnp.float32)
    df_r = jnp.zeros((s, f), jnp.float32)
    t_r = 0
    hi_p = (n - batch) // tile_b + 1
    for k in jax.random.split(key, n_steps):
        kp, kn = jax.random.split(k)
        ip0 = int(jax.random.randint(kp, (), 0, hi_p)) * tile_b
        in0 = int(jax.random.randint(kn, (), 0, hi_p)) * tile_b
        fd = (jax.lax.dynamic_slice(pos, (ip0, 0), (batch, f))
              - jax.lax.dynamic_slice(neg, (in0, 0), (batch, f)))
        fv = jnp.matmul(fd, w_r.T, precision=jax.lax.Precision.HIGHEST)
        viol = (fv > -1.0).astype(jnp.float32)
        g = jnp.matmul(viol.T, fd, precision=jax.lax.Precision.HIGHEST)
        tn = t_r + batch
        df_r = (t_r * df_r + g) / tn
        w_r = jnp.maximum(0.0, -jnp.sqrt(float(tn)) / gamma[:, None]
                          * (df_r + mu[:, None]))
        t_r = tn
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_r),
                               rtol=3e-5, atol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_r),
                               rtol=3e-5, atol=3e-4)


def test_fused_block_grad_bf16_inputs():
    """bf16-resident training splits through the fused kernel: halves both
    HBM residency (Brown scale: 8.2 -> 4.1 GiB) and step bandwidth. The
    subgradient must match the f32 oracle computed on the SAME quantized
    values (bf16 storage is the only approximation; accumulation is f32)."""
    rng = np.random.default_rng(14)
    n, f, batch, tile_b = 1024, 384, 256, 128
    pos16 = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (n, f))).astype(np.float32)).astype(jnp.bfloat16)
    neg16 = jnp.asarray(np.abs(rng.normal(1.2, 0.5, (n, f))).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(np.abs(rng.normal(0, 0.1, (1, f))).astype(np.float32))
    g16 = fused_block_grad(pos16, neg16, w.astype(jnp.bfloat16),
                           jnp.int32(2), jnp.int32(4),
                           batch=batch, tile_b=tile_b, interpret=not ON_TPU)
    g_ref = reference_block_grad(pos16.astype(jnp.float32),
                                 neg16.astype(jnp.float32), w, 2, 4,
                                 batch=batch, tile_b=tile_b)
    assert g16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g_ref),
                               rtol=5e-3, atol=0.5)


def test_bf16_resident_training_quality():
    """Training on bf16-quantized splits must reach the same FPR95/AUC and
    support as f32 (the storage quantization is ~0.4% relative — far below
    the hinge decision margins)."""
    from opencv_dlco_tpu.data.synthetic import synth_pr_dataset
    from opencv_dlco_tpu.ops.roc import roc_stats

    rng = np.random.default_rng(15)
    pos, neg, info = synth_pr_dataset(rng, n_pos=1024, n_neg=1024,
                                      n_feat=256, n_informative=12)
    mu = jnp.asarray([0.02], jnp.float32)
    gamma = jnp.asarray([0.1], jnp.float32)

    def train(p, n_):
        st = pr_init(256, 1)
        key = jax.random.PRNGKey(7)
        for _ in range(4):
            key, sub = jax.random.split(key)
            st = pr_train_chunk(p, n_, mu, gamma, st, sub,
                                batch=256, n_steps=48,
                                sampling="block_fused")
        return np.asarray(st.w[0])

    def quality(w):
        d = jnp.concatenate([jnp.asarray(pos) @ w, jnp.asarray(neg) @ w])
        lab = jnp.concatenate([jnp.ones(len(pos)), jnp.zeros(len(neg))])
        fpr95, auc = roc_stats(d, lab)
        return float(fpr95) * 100, float(auc)

    w32 = train(jnp.asarray(pos), jnp.asarray(neg))
    w16 = train(jnp.asarray(pos).astype(jnp.bfloat16),
                jnp.asarray(neg).astype(jnp.bfloat16))
    f32q, a32 = quality(jnp.asarray(w32))
    f16q, a16 = quality(jnp.asarray(w16))
    assert abs(f16q - f32q) < 1.0, f"bf16 FPR95 {f16q:.2f} vs f32 {f32q:.2f}"
    assert abs(a16 - a32) < 0.01
    k = int(min(12, (w32 > 0).sum(), (w16 > 0).sum()))
    assert k >= 3
    sup32 = set(np.argsort(w32)[-k:].tolist())
    sup16 = set(np.argsort(w16)[-k:].tolist())
    assert len(sup32 & sup16) >= int(0.7 * k)


def test_fused_block_train_matches_stepwise():
    """The whole-chunk kernel (n_steps in one launch) must match scanning
    the single-step fused path: same RNG stream, same offsets, same
    update math."""
    from opencv_dlco_tpu.ops.fused_rda import fused_block_train

    rng = np.random.default_rng(16)
    n, f, batch, tile_b, n_steps = 1024, 384, 256, 128, 5
    pos = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (n, f))).astype(np.float32))
    neg = jnp.asarray(np.abs(rng.normal(1.2, 0.5, (n, f))).astype(np.float32))
    mu = jnp.asarray([0.02], jnp.float32)
    gamma = jnp.asarray([0.1], jnp.float32)
    key = jax.random.PRNGKey(9)

    w, df, t = fused_block_train(pos, neg,
                                 jnp.zeros((1, f), jnp.float32),
                                 jnp.zeros((1, f), jnp.float32),
                                 jnp.int32(0), mu, gamma, key,
                                 batch=batch, n_steps=n_steps,
                                 tile_b=tile_b, interpret=not ON_TPU)
    assert int(t) == batch * n_steps

    # stepwise reference with the identical per-step offset draws
    w_r = jnp.zeros((1, f), jnp.float32)
    df_r = jnp.zeros((1, f), jnp.float32)
    t_r = 0
    hi_p = (n - batch) // tile_b + 1
    for k in jax.random.split(key, n_steps):
        kp, kn = jax.random.split(k)
        ip0 = int(jax.random.randint(kp, (), 0, hi_p)) * tile_b
        in0 = int(jax.random.randint(kn, (), 0, hi_p)) * tile_b
        fd = (jax.lax.dynamic_slice(pos, (ip0, 0), (batch, f))
              - jax.lax.dynamic_slice(neg, (in0, 0), (batch, f)))
        fv = jnp.matmul(fd, w_r.T, precision=jax.lax.Precision.HIGHEST)
        viol = (fv > -1.0).astype(jnp.float32)
        g = jnp.matmul(viol.T, fd, precision=jax.lax.Precision.HIGHEST)
        tn = t_r + batch
        df_r = (t_r * df_r + g) / tn
        w_r = jnp.maximum(0.0, -jnp.sqrt(float(tn)) / gamma[:, None]
                          * (df_r + mu[:, None]))
        t_r = tn
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_r),
                               rtol=3e-5, atol=3e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_r),
                               rtol=3e-5, atol=3e-4)


def test_pipelined_wide_matches_grid_wide():
    """The single-program pipelined wide kernel (manual double-buffered
    DMA loop, VERDICT r4 next #3) must reproduce the grid wide kernel
    exactly: same key -> same tile-aligned offset stream -> identical
    (w, df, t). On CPU this runs both in interpret mode; on the chip it
    compares the two compiled Mosaic programs."""
    from opencv_dlco_tpu.ops.fused_rda import (
        fused_block_train_wide, fused_block_train_wide_pipelined)

    rng = np.random.default_rng(23)
    n, f, batch, tile_b, n_steps, s = 1024, 256, 256, 128, 6, 8
    pos = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (n, f))).astype(np.float32))
    neg = jnp.asarray(np.abs(rng.normal(1.2, 0.5, (n, f))).astype(np.float32))
    mu = jnp.asarray(np.geomspace(0.005, 0.08, s), jnp.float32)
    gamma = jnp.asarray(np.geomspace(0.02, 0.5, s), jnp.float32)
    key = jax.random.PRNGKey(29)
    args = (pos, neg, jnp.zeros((s, f), jnp.float32),
            jnp.zeros((s, f), jnp.float32), jnp.int32(0), mu, gamma, key)
    kw = dict(batch=batch, n_steps=n_steps, tile_b=tile_b,
              interpret=not ON_TPU)
    w1, df1, t1 = fused_block_train_wide(*args, **kw)
    w2, df2, t2 = fused_block_train_wide_pipelined(*args, **kw)
    assert int(t1) == int(t2) == batch * n_steps
    np.testing.assert_allclose(np.asarray(df1), np.asarray(df2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-6, atol=1e-7)
