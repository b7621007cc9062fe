"""SPMD path: sharded-vs-unsharded training equivalence (SURVEY §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.core.config import CriteoConfig, ModelConfig
from recsys_tpu.core.mesh import MeshConfig, make_mesh, make_virtual_mesh
from recsys_tpu.data import criteo
from recsys_tpu.models.api import make_model
from recsys_tpu.parallel import spmd
from recsys_tpu.train import optim

SMALL = CriteoConfig(cat_vocabs=tuple([40] * 26))


def _batch(n, seed=0):
    data = criteo.synthetic_criteo(n, SMALL, criteo.SyntheticSpec(seed=seed))
    return {k: jnp.asarray(v) for k, v in data.items()}


def _local_reference_step(model, opt, batch, seed):
    """Unsharded single-device step with the same math (global loss mean)."""
    # mirror create_spmd_state's key derivation exactly
    init_key, _ = jax.random.split(jax.random.key(seed))
    params, mstate = model.init(init_key)
    opt_state = opt.init(params)
    b = batch["label"].shape[0]

    def loss_fn(p, ms):
        # rng=None → no dropout, keeps sharded/local comparable
        logits, new_ms = model.apply(p, ms, batch, train=False, rng=None)
        labels = batch["label"]
        ce = jnp.sum(jnp.maximum(logits, 0) - logits * labels
                     + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return ce / b, new_ms

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, mstate)
    new_params, _ = opt.update(grads, opt_state, params)
    return float(loss), new_params


@pytest.mark.parametrize("model_axis", [1, 2, 4])
@pytest.mark.parametrize("engine", ["fused", "split"])
def test_spmd_step_matches_local(model_axis, engine):
    env = make_virtual_mesh(8, model_axis=model_axis)
    # dropout off & no BN randomness → deterministic comparison; a 16-vocab
    # split threshold puts the 40-vocab cat fields on the sharded a2a path
    # while the cont buckets ride the replicated matmul path.
    model = make_model(
        "fm", SMALL, ModelConfig(embedding_dim=8, dropout=0.0,
                                 emb_engine=engine, split_threshold=16)
    )
    opt = optim.adam(1e-2)
    bsz = 32
    batch_host = _batch(bsz)

    state = spmd.create_spmd_state(model, env, seed=0, opt=opt)
    step = spmd.make_spmd_train_step(model, opt, env, bsz, batch_host,
                                     a2a_exact=True)
    batch = spmd.place(batch_host, spmd.batch_specs(batch_host), env)
    new_state, loss = step(state, batch)

    ref_loss, ref_params = _local_reference_step(model, opt, batch_host, 0)
    assert abs(float(loss) - ref_loss) < 1e-4

    # Post-Adam params: duplicate-row scatter-adds sum in a different order
    # in the sharded path (per-data-shard partials then psum), and Adam's
    # step-1 update m/(√v+ε) behaves like sign(g) — so rows whose gradient
    # contributions nearly cancel can step differently by up to ~lr. Gradient
    # equivalence itself is asserted exactly in test_embeddings; here we
    # check the updates agree to Adam-step scale.
    got_leaves = jax.tree.leaves(jax.device_get(new_state.params))
    ref_leaves = jax.tree.leaves(ref_params)
    assert len(got_leaves) == len(ref_leaves)
    for g, r in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-3, rtol=1.0)
        assert np.mean(np.abs(np.asarray(g) - np.asarray(r))) < 2e-4


def test_spmd_deepfm_runs_and_learns():
    env = make_virtual_mesh(8, model_axis=2)
    model = make_model(
        "deepfm", SMALL, ModelConfig(embedding_dim=8, deep_layers=(16, 8), emb_engine="fused")
    )
    opt = optim.adam(5e-3)
    bsz = 64
    batch_host = _batch(bsz)
    state = spmd.create_spmd_state(model, env, seed=0, opt=opt)
    step = spmd.make_spmd_train_step(model, opt, env, bsz, batch_host)

    losses = []
    for i in range(30):
        bh = _batch(bsz, seed=0) if i == 0 else None
        data = criteo.synthetic_criteo(bsz, SMALL, start_row=i * bsz)
        bh = {k: jnp.asarray(v) for k, v in data.items()}
        batch = spmd.place(bh, spmd.batch_specs(bh), env)
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_dryrun_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_spmd_grads_match_local_exactly(model_axis):
    """Pre-optimizer gradient equivalence at the SPMD-step level: the
    psum-of-local-grads over 'data' with a2a sharded lookups over 'model'
    must reproduce the single-device gradient to float32 tolerance (the
    strong form of the post-Adam check above)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from recsys_tpu.core.mesh import DATA_AXIS

    env = make_virtual_mesh(8, model_axis=model_axis)
    model = make_model(
        "fm", SMALL, ModelConfig(embedding_dim=8, dropout=0.0,
                                 emb_engine="split", split_threshold=16))
    bsz = 32
    batch_host = _batch(bsz, seed=3)

    init_key, _ = jax.random.split(jax.random.key(0))
    params, mstate = model.init(init_key)
    pspecs = spmd.param_specs(params)
    msspecs = jax.tree.map(lambda _: P(), mstate)
    bspecs = spmd.batch_specs(batch_host)
    emb_ops = spmd.make_sharded_emb_ops(exact=True)

    def shard_fn(p, ms, batch):
        def local_loss(pp):
            logits, _ = model.apply(pp, ms, batch, train=False, rng=None,
                                    emb_ops=emb_ops)
            labels = batch["label"]
            ce = jnp.sum(jnp.maximum(logits, 0) - logits * labels
                         + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return ce / bsz
        g = jax.lax.psum(jax.grad(local_loss)(p), DATA_AXIS)
        return spmd.normalize_model_replication(g, pspecs)

    sharded = shard_map(shard_fn, mesh=env.mesh,
                        in_specs=(pspecs, msspecs, bspecs),
                        out_specs=pspecs, check_vma=False)
    p_placed = spmd.place(params, pspecs, env)
    ms_placed = spmd.place(mstate, msspecs, env)
    b_placed = spmd.place(batch_host, bspecs, env)
    got = jax.device_get(jax.jit(sharded)(p_placed, ms_placed, b_placed))

    def local_loss(pp):
        logits, _ = model.apply(pp, mstate, batch_host, train=False, rng=None)
        labels = batch_host["label"]
        ce = jnp.sum(jnp.maximum(logits, 0) - logits * labels
                     + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return ce / bsz
    want = jax.device_get(jax.grad(local_loss)(params))

    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-6, rtol=2e-5)
