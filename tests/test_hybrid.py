"""Hybrid embedding engine: grouping, equivalence with direct indexing."""

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.config import CriteoConfig, EmbeddingConfig, ModelConfig
from recsys_tpu.embeddings import hybrid


def test_grouping_covers_all_fields():
    cfg = EmbeddingConfig(field_vocab_sizes=CriteoConfig().field_vocab_sizes,
                          embedding_dim=8)
    eng = hybrid.HybridEngine(cfg)
    buckets, gather_fields = eng._grouping()
    covered = sorted(sum(buckets.values(), []) + gather_fields)
    assert covered == list(range(39))
    # the six 100k hash fields + 93145 + the four 5k-15k fields go to gather
    assert all(cfg.field_vocab_sizes[f] > 2048 for f in gather_fields)
    for b, fields in buckets.items():
        assert all(cfg.field_vocab_sizes[f] <= b for f in fields)


def test_hybrid_matches_direct_indexing(rng):
    vocabs = (5, 300, 3000, 10, 2048, 5000)   # mixes all three groups
    cfg = EmbeddingConfig(field_vocab_sizes=vocabs, embedding_dim=8)
    eng = hybrid.HybridEngine(cfg)
    params = eng.init(jax.random.key(0))
    b = 16
    ids = np.stack([rng.integers(0, v, b) for v in vocabs], axis=1).astype(
        np.int32)
    emb, wide = eng.lookup(params, jnp.asarray(ids))
    assert emb.shape == (b, 6, 8)
    assert wide.shape == (b, 6)

    # expected values straight from the param tables
    buckets, gather_fields = eng._grouping()
    field_rows = {}
    for bsize, fields in buckets.items():
        t = np.asarray(params[f"oh{bsize}"])
        for gi, f in enumerate(fields):
            field_rows[f] = t[gi]
    g_vocabs = [vocabs[f] for f in gather_fields]
    off = np.concatenate([[0], np.cumsum(g_vocabs[:-1])]).astype(int)
    gt = np.asarray(params["gather"])
    for gi, f in enumerate(gather_fields):
        field_rows[f] = gt[off[gi]:off[gi] + vocabs[f]]

    for f in range(6):
        expect = field_rows[f][ids[:, f]]
        got_emb = np.asarray(emb[:, f, :])
        got_wide = np.asarray(wide[:, f])
        # one-hot path runs in bf16 → tolerance is bf16 rounding
        np.testing.assert_allclose(got_emb, expect[:, :8], rtol=1e-2,
                                   atol=1e-3)
        np.testing.assert_allclose(got_wide, expect[:, 8], rtol=1e-2,
                                   atol=1e-3)


def test_hybrid_gradients_flow(rng):
    vocabs = (5, 300, 5000)
    cfg = EmbeddingConfig(field_vocab_sizes=vocabs, embedding_dim=4)
    eng = hybrid.HybridEngine(cfg)
    params = eng.init(jax.random.key(0))
    ids = jnp.asarray(np.stack([rng.integers(0, v, 8) for v in vocabs],
                               axis=1).astype(np.int32))

    def loss(p):
        emb, wide = eng.lookup(p, ids)
        return jnp.sum(emb ** 2) + jnp.sum(wide ** 2)

    grads = jax.grad(loss)(params)
    # one-hot bucket grads nonzero only at looked-up rows
    g256 = np.asarray(grads["oh256"])
    touched = np.abs(g256).sum(axis=2) > 0
    assert touched.sum() > 0
    for gi, f in enumerate([0, 1]):  # fields 0,1 → bucket 256? 300>256 → 2048
        pass
    assert float(np.abs(np.asarray(grads["gather"])).sum()) > 0


def test_models_run_with_hybrid_engine(rng):
    from recsys_tpu.models.api import make_model
    small = CriteoConfig(cat_vocabs=tuple([50] * 13 + [5000] * 13))
    for name in ["fm", "deepfm", "dcn", "dnn", "xdeepfm"]:
        model = make_model(name, small,
                           ModelConfig(name=name, embedding_dim=8,
                                       deep_layers=(16,), cross_layers=2,
                                       cin_layers=(4,), emb_engine="hybrid"))
        params, state = model.init(jax.random.key(0))
        vocabs = small.field_vocab_sizes
        batch = {
            "ids": jnp.asarray(np.stack(
                [rng.integers(0, v, 8) for v in vocabs], axis=1
            ).astype(np.int32)),
            "dense": jnp.asarray(rng.normal(size=(8, 13)).astype(np.float32)),
            "label": jnp.asarray((rng.random(8) < 0.3).astype(np.float32)),
        }
        logits, _ = model.apply(params, state, batch, train=False)
        assert logits.shape == (8,)
        assert np.isfinite(np.asarray(logits)).all(), name
