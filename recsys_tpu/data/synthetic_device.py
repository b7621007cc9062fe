"""On-device sampler for the planted synthetic-Criteo task.

The host generator (`data/criteo.py synthetic_criteo`) plants a sparse
logistic ground truth:  logit = bias + Σ_f effect_f[id_f] + w·dense.  It is
the repo's stand-in for the reference's real Criteo runs (README metric
tables, /root/reference/README.md:20-28) and its AUC has a computable Bayes
ceiling — but generating rows with numpy tops out around a few million
rows/minute and every batch must cross the host↔device boundary (which, on
a tunneled chip, costs more than the training step itself).

This module re-expresses the SAME planted distribution as a jittable
function of a PRNG key, so the training scan draws fresh i.i.d. rows at
device speed — training becomes true one-pass online SGD on the population
distribution (no epoch reuse, no host traffic). The planted parameters
(per-id effects, dense weights) are generated ONCE with the identical
numpy PRNG streams as the host generator and uploaded (~3.4 MB), so both
samplers share the exact ground truth; only the sample path differs
(jax threefry vs numpy philox — distributionally equivalent draws).

Used by tools/converge.py, the convergence-quality protocol that closes
the gap between trained AUC and the planted ceiling.

Two ceilings matter (and are both computed here):
- the full Bayes ceiling (`criteo.synthetic_bayes_metrics`) scores the true
  probabilities — attainable only by a model that sees the raw `dense`
  values (of the CTR zoo, only xDeepFM's linear branch does,
  xdeepfm/xdeepfm.py:82);
- the id-only ceiling (`idonly_bayes_metrics`) scores E[y | ids] — the best
  any model consuming only the 39 categorical ids can do (FM, DeepFM, DCN,
  DNN per the reference architectures). The dense term is drawn
  independently of the ids in the planted task, so for these models it is
  irreducible noise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.config import CriteoConfig
from recsys_tpu.data.criteo import SyntheticSpec, synthetic_criteo


def planted_tables(
    cfg: CriteoConfig = CriteoConfig(),
    spec: SyntheticSpec = SyntheticSpec(),
) -> dict[str, np.ndarray]:
    """The planted ground-truth parameters, bit-identical to the host
    generator's streams (criteo.py synthetic_criteo: per-field
    ``default_rng([seed, 31*f+1])`` effects, ``default_rng([seed, 999])``
    dense weights)."""
    field_vocabs = cfg.field_vocab_sizes
    effects = np.concatenate([
        np.random.default_rng([spec.seed, 31 * f + 1]).normal(
            0.0, spec.effect_scale, vocab)
        for f, vocab in enumerate(field_vocabs)
    ]).astype(np.float32)
    w_dense = np.random.default_rng([spec.seed, 999]).normal(
        0.0, spec.dense_scale, len(cfg.cont_boundaries)).astype(np.float32)
    offsets = np.cumsum([0] + list(field_vocabs[:-1])).astype(np.int32)
    return {
        "effects": effects,                                   # [Σ vocab]
        "w_dense": w_dense,                                   # [13]
        "offsets": offsets,                                   # [39]
        "vocabs": np.asarray(field_vocabs, np.float32),       # [39]
        "vocabs_i": np.asarray(field_vocabs, np.int32),       # [39]
    }


def make_device_sampler(
    cfg: CriteoConfig = CriteoConfig(),
    spec: SyntheticSpec = SyntheticSpec(),
):
    """Returns ``sample(key, tables, batch_size) -> batch`` drawing from the
    planted distribution entirely on device.

    Matches the host generator's draws field by field
    (criteo.py synthetic_criteo): zipf-ish ids ``floor(V·u^2.2) mod V``,
    dense = log1p(lognormal(0,1)) (= softplus of a standard normal),
    label ~ Bernoulli(sigmoid(planted logit)).
    """
    n_fields = len(cfg.field_vocab_sizes)
    n_cont = len(cfg.cont_boundaries)

    @partial(jax.jit, static_argnums=(2,))
    def sample(key: jax.Array, tables: dict, batch_size: int) -> dict:
        ku, kd, kl = jax.random.split(key, 3)
        u = jax.random.uniform(ku, (batch_size, n_fields))
        raw = jnp.floor(tables["vocabs"] * u ** 2.2).astype(jnp.int32)
        ids = raw % tables["vocabs_i"]
        # softplus(z) = log1p(e^z) = log1p(lognormal sample), numerically
        # stable for large z
        dense = jax.nn.softplus(
            jax.random.normal(kd, (batch_size, n_cont)))
        logit = (
            spec.bias
            + jnp.sum(tables["effects"][ids + tables["offsets"]], axis=1)
            + dense @ tables["w_dense"]
        )
        label = (
            jax.random.uniform(kl, (batch_size,)) < jax.nn.sigmoid(logit)
        ).astype(jnp.float32)
        return {"ids": ids, "dense": dense, "label": label}

    return sample


def idonly_bayes_metrics(
    num_rows: int,
    cfg: CriteoConfig = CriteoConfig(),
    spec: SyntheticSpec = SyntheticSpec(),
    start_row: int = 0,
    mc_samples: int = 512,
    chunk: int = 65536,
) -> dict[str, float]:
    """AUC/logloss ceiling for models that consume ONLY the 39 ids.

    The optimal id-only predictor is E[y | ids] = E_z[sigmoid(id_logit + z)]
    with z = w·dense the independent dense contribution. AUC needs only the
    ranking, and E_z[sigmoid(l+z)] is monotone in l, so AUC is scored on
    id_logit directly; logloss integrates z by Monte Carlo (shared draws,
    chunked over rows).
    """
    from sklearn.metrics import roc_auc_score

    tables = planted_tables(cfg, spec)
    d = synthetic_criteo(num_rows, cfg, spec, start_row)
    gids = d["ids"].astype(np.int64) + tables["offsets"][None, :]
    id_logit = spec.bias + tables["effects"][gids].sum(axis=1)
    y = d["label"]

    zrng = np.random.default_rng([spec.seed, 424242])
    z = np.log1p(np.exp(zrng.normal(size=(mc_samples, len(cfg.cont_boundaries))))) @ tables["w_dense"]
    ll_sum = 0.0
    for lo in range(0, num_rows, chunk):
        l_chunk = id_logit[lo:lo + chunk]
        p = 1.0 / (1.0 + np.exp(-(l_chunk[:, None] + z[None, :])))
        p = np.clip(p.mean(axis=1), 1e-12, 1 - 1e-12)
        yc = y[lo:lo + chunk]
        ll_sum += float(-np.sum(yc * np.log(p) + (1 - yc) * np.log(1 - p)))
    return {
        "auc": float(roc_auc_score(y, id_logit)),
        "logloss": ll_sum / num_rows,
    }
