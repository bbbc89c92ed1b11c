"""Block-sampling mode: statistical equivalence to gather sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.models.pr_rda import pr_init, pr_train_chunk, pr_validate

from synth import split_train_val, synth_pr_dataset


def test_block_sampling_converges_like_gather(rng):
    pos, neg, info = synth_pr_dataset(rng, n_pos=2000, n_neg=2000, n_feat=128)
    pos_trn, pos_val = split_train_val(pos)
    neg_trn, neg_val = split_train_val(neg)
    # shuffle training rows (the pipeline guarantees this; block sampling
    # relies on it)
    perm = rng.permutation(len(pos_trn))
    pos_trn, neg_trn = pos_trn[perm], neg_trn[perm]
    mu = jnp.asarray([0.02], jnp.float32)
    gamma = jnp.asarray([0.25], jnp.float32)
    key = jax.random.PRNGKey(0)
    objs = {}
    ws = {}
    for mode in ("gather", "block"):
        # compare at (near) convergence: RDA trajectories through phase
        # space differ between sampling modes, the optimum must not
        st = pr_train_chunk(jnp.asarray(pos_trn), jnp.asarray(neg_trn),
                            mu, gamma, pr_init(128, 1), key,
                            batch=256, n_steps=2400, sampling=mode)
        _, _, obj, nnz = pr_validate(jnp.asarray(pos_val),
                                     jnp.asarray(neg_val), mu, st)
        objs[mode] = float(obj[0])
        ws[mode] = np.asarray(st.w[0])
        assert 0 < int(nnz[0]) < 128
    # same optimum neighbourhood (trajectories differ; the converged
    # objective and support must agree)
    assert abs(objs["gather"] - objs["block"]) < 0.15 * max(
        objs["gather"], objs["block"], 1e-6), objs
    corr = np.dot(ws["gather"], ws["block"]) / (
        np.linalg.norm(ws["gather"]) * np.linalg.norm(ws["block"]) + 1e-12)
    assert corr > 0.9, f"w correlation {corr:.3f}"
