"""PR RDA solver: exact step math + convergence on synthetic data."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.models.pr_rda import (
    pr_init,
    pr_train,
    pr_train_chunk,
    pr_validate,
)
from opencv_dlco_tpu.ops.roc import roc_stats
from opencv_dlco_tpu.utils.configs import PRLearnConfig

from synth import split_train_val, synth_pr_dataset


def _numpy_rda_reference(pos, neg, ip, ineg, mu, gamma, batch):
    """Float64 transcription of the batched RDA recursion for one chunk."""
    n_feat = pos.shape[1]
    w = np.zeros(n_feat)
    dfavg = np.zeros(n_feat)
    t = 0
    n_steps = len(ip) // batch
    for s in range(n_steps):
        bip = ip[s * batch:(s + 1) * batch]
        bin_ = ineg[s * batch:(s + 1) * batch]
        fd = pos[bip].astype(np.float64) - neg[bin_].astype(np.float64)
        f = fd @ w
        g = fd[f > -1.0].sum(axis=0)
        t_new = t + batch
        dfavg = (t * dfavg + g) / t_new
        t = t_new
        w = np.maximum(0.0, -np.sqrt(t) / gamma * (dfavg + mu))
    return w, dfavg, t


def test_step_math_matches_numpy(rng):
    pos, neg, _ = synth_pr_dataset(rng, n_pos=500, n_neg=500, n_feat=64)
    batch, n_steps = 32, 5
    key = jax.random.PRNGKey(0)
    state = pr_init(64, 1)
    out = pr_train_chunk(
        jnp.asarray(pos), jnp.asarray(neg),
        jnp.asarray([0.02], jnp.float32), jnp.asarray([0.1], jnp.float32),
        state, key, batch=batch, n_steps=n_steps,
    )
    # reproduce the exact index stream the solver drew
    keys = jax.random.split(key, n_steps)
    ips, ins = [], []
    for k in keys:
        kp, kn = jax.random.split(k)
        ips.append(np.asarray(jax.random.randint(kp, (batch,), 0, pos.shape[0])))
        ins.append(np.asarray(jax.random.randint(kn, (batch,), 0, neg.shape[0])))
    w_ref, dfavg_ref, t_ref = _numpy_rda_reference(
        pos, neg, np.concatenate(ips), np.concatenate(ins), 0.02, 0.1, batch
    )
    assert int(out.t) == t_ref
    np.testing.assert_allclose(np.asarray(out.df_avg[0]), dfavg_ref,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.w[0]), w_ref,
                               rtol=1e-4, atol=1e-6)


def test_convergence_on_synthetic():
    # dedicated rng: the planted-dims overlap bar sits close enough to the
    # threshold that the scene must not depend on which tests ran before
    pos, neg, info = synth_pr_dataset(np.random.default_rng(2215))
    pos_trn, pos_val = split_train_val(pos)
    neg_trn, neg_val = split_train_val(neg)
    cfg = PRLearnConfig(mu=0.02, gamma=0.25, n_iter=40_000, log_step=10_000,
                        batch=256)
    w_best, history = pr_train(
        jnp.asarray(pos_trn), jnp.asarray(neg_trn),
        jnp.asarray(pos_val), jnp.asarray(neg_val), cfg,
    )
    assert len(history) == 4
    # objective decreases over training
    assert history[-1]["obj_best"] < history[0]["obj"]
    # learned weights are sparse, non-negative, and favour informative dims
    assert np.all(w_best >= 0)
    nnz = np.sum(w_best > 0)
    assert 0 < nnz < pos.shape[1]
    top = np.argsort(-w_best)[: len(info)]
    overlap = len(set(top) & set(info)) / len(info)
    assert overlap >= 0.5, f"only {overlap:.0%} informative dims found"
    # model separates validation pairs well
    dists = np.concatenate([pos_val @ w_best, neg_val @ w_best])
    labels = np.concatenate([np.ones(len(pos_val)), np.zeros(len(neg_val))])
    fpr95, auc = roc_stats(jnp.asarray(dists), jnp.asarray(labels))
    assert float(auc) > 0.95
    assert float(fpr95) < 0.3


def test_sweep_axis_independent(rng):
    """Two sweep entries with identical hyperparams produce identical w."""
    pos, neg, _ = synth_pr_dataset(rng, n_pos=400, n_neg=400, n_feat=32)
    state = pr_init(32, 2)
    mu = jnp.asarray([0.02, 0.02], jnp.float32)
    gamma = jnp.asarray([0.1, 0.1], jnp.float32)
    out = pr_train_chunk(jnp.asarray(pos), jnp.asarray(neg), mu, gamma,
                         state, jax.random.PRNGKey(3), batch=64, n_steps=10)
    np.testing.assert_allclose(np.asarray(out.w[0]), np.asarray(out.w[1]),
                               rtol=1e-6)
    # and different gammas give different iterates
    gamma2 = jnp.asarray([0.1, 0.5], jnp.float32)
    out2 = pr_train_chunk(jnp.asarray(pos), jnp.asarray(neg), mu, gamma2,
                          pr_init(32, 2), jax.random.PRNGKey(3),
                          batch=64, n_steps=10)
    assert not np.allclose(np.asarray(out2.w[0]), np.asarray(out2.w[1]))


def test_validate_metrics(rng):
    pos, neg, _ = synth_pr_dataset(rng, n_pos=300, n_neg=300, n_feat=32)
    state = pr_init(32, 1)._replace(w=jnp.ones((1, 32)) * 0.1)
    mu = jnp.asarray([0.05], jnp.float32)
    loss, regul, obj, nnz = pr_validate(jnp.asarray(pos), jnp.asarray(neg),
                                        mu, state)
    # regul = mu * sum |w| = 0.05 * 3.2
    np.testing.assert_allclose(float(regul[0]), 0.05 * 3.2, rtol=1e-5)
    assert int(nnz[0]) == 32
    np.testing.assert_allclose(float(obj[0]),
                               float(loss[0]) + float(regul[0]), rtol=1e-6)
