"""CF family: Multi-DAE/Multi-VAE/Logistic-VAE + CDAE end-to-end on
synthetic MovieLens-like data (SURVEY §2.1 rows 11-12)."""

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.data import movielens as ML
from recsys_tpu.models import cdae as CDAE
from recsys_tpu.models import vae_cf as V
from recsys_tpu.train import metrics as M
from recsys_tpu.train import optim


def _vae_data():
    u, i, r = ML.synthetic_interactions(n_users=400, n_items=150, seed=3)
    return ML.preprocess_vae_cf(u, i, r, n_heldout_users=60,
                                rating_threshold=0.0)


def test_preprocess_protocol():
    data = _vae_data()
    assert data.train.shape[1] == data.n_items
    assert data.vad_tr.shape == data.vad_te.shape
    # fold-in and heldout are disjoint
    overlap = data.vad_tr.multiply(data.vad_te)
    assert overlap.nnz == 0
    # ~20% heldout
    frac = data.vad_te.nnz / max(data.vad_tr.nnz + data.vad_te.nnz, 1)
    assert 0.1 < frac < 0.35


def _train_vae(loss_fn, init, n_items, train_mat, steps=60, lr=1e-3,
               vae=True):
    params = init(jax.random.key(0))
    opt = optim.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, rng, anneal):
        if vae:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, anneal, rng=rng)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, rng=rng)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    dense = np.asarray(train_mat.todense(), np.float32)
    n = dense.shape[0]
    key = jax.random.key(1)
    losses = []
    bs = 100
    for s in range(steps):
        lo = (s * bs) % max(n - bs, 1)
        x = jnp.asarray(dense[lo:lo + bs])
        key, sub = jax.random.split(key)
        anneal = V.anneal_schedule(s, cap=0.2, total_anneal_steps=1000)
        params, opt_state, loss = step(params, opt_state, x, sub, anneal)
        losses.append(float(loss))
    return params, losses


def test_multi_dae_learns():
    data = _vae_data()
    init, apply, loss_fn = V.make_multi_dae((20, 60, data.n_items), lam=0.0)
    params, losses = _train_vae(loss_fn, init, data.n_items, data.train,
                                vae=False)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_multi_vae_learns_and_ranks():
    data = _vae_data()
    init, apply, loss_fn = V.make_multi_vae((20, 60, data.n_items))
    params, losses = _train_vae(loss_fn, init, data.n_items, data.train,
                                steps=120)
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    # rank heldout items for validation users: fold-in → scores, mask seen
    x = jnp.asarray(np.asarray(data.vad_tr.todense(), np.float32))
    logits, _ = apply(params, x, train=False)
    scores = np.array(logits)   # writable copy
    scores[np.asarray(data.vad_tr.todense()) > 0] = -np.inf
    ndcg = np.asarray(M.ndcg_at_k(
        jnp.asarray(scores),
        jnp.asarray(np.asarray(data.vad_te.todense(), np.float32)),
        k=20,
    ))
    users_with_heldout = np.asarray(data.vad_te.sum(axis=1)).ravel() > 0
    # planted low-rank structure ⇒ clearly better than random
    assert ndcg[users_with_heldout].mean() > 0.05


def test_logistic_vae_variant():
    data = _vae_data()
    init, apply, loss_fn = V.make_multi_vae((20, 60, data.n_items),
                                            likelihood="logistic")
    params, losses = _train_vae(loss_fn, init, data.n_items, data.train)
    assert np.isfinite(losses).all()


def test_cdae_end_to_end():
    users, train_x, _, test_x = ML.synthetic_ml100k(n_users=150, n_items=80,
                                                    seed=5)
    params, apply, losses = CDAE.train_cdae(
        train_x, users, hidden=16, epochs=15, batch_size=32)
    assert np.isfinite(losses).all()
    pred = CDAE.predict_topn(apply, params, train_x, users, n=10)
    assert pred.shape == (150, 10)
    sr = M.success_rate_at_n(pred, test_x)
    assert sr > 15.0  # planted structure ⇒ far above random (10/80 ≈ 12%)
