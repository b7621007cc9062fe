"""Hybrid embedding engine: one-hot MXU matmuls for small-vocab fields,
packed gather for large ones.

Why: profiling the DeepFM hot loop on v5e showed the step is ~95%
embedding gather/scatter, and that TPU dynamic gather/scatter cost is
per-ROW latency-bound (a [319k] 1-float gather costs as much as [319k,16];
scatter runs at ~19M rows/s). For a small-vocab field it is far cheaper to
multiply a one-hot matrix against the whole table on the MXU:

    emb   = einsum('bfv,fvd->bfd', onehot(ids), table)     # forward
    dW    = einsum('bfv,bfd->fvd', onehot(ids), d_emb)     # backward

— both are dense matmuls (autodiff produces the second automatically), so
the small fields contribute ZERO scatter rows. FLOP cost is B·Σv·D, tiny
for v ≤ 2048; the materialized one-hot ([B, F_g, bucket] bf16) stays in the
hundreds of MB of streamed traffic. Large-vocab fields (hash caps ≥ 100k)
keep the single packed gather, which now carries ~1/3 of the rows.

Field grouping is static (from the config's vocab sizes): each small field
is padded to a power-of-two bucket so each bucket is ONE batched einsum.
The wide/linear weight rides as column D of every table (fused, see
`recsys_tpu.embeddings.table.fused_init`).

Engines expose a uniform interface used by models/ctr.py:
    engine.init(key)                    -> params subtree
    engine.lookup(params, ids[B,F])     -> (emb [B,F,D], wide [B,F])
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.config import EmbeddingConfig
from recsys_tpu.embeddings import table as emb_table
from recsys_tpu.ops import nn

DEFAULT_BUCKETS = (256, 2048)


def _oh_dtype():
    """bf16 one-hot matmuls on TPU (MXU rate); f32 on CPU, whose dot thunk
    lacks BF16xBF16=F32 support (tests run there)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


@dataclass(frozen=True)
class FusedGatherEngine:
    """All fields through one packed [V, D+1] gather (the baseline engine;
    also the one the row-sharded SPMD path uses)."""

    cfg: EmbeddingConfig

    @property
    def offsets(self):
        return emb_table.field_offsets(self.cfg.field_vocab_sizes)

    def init(self, key) -> dict:
        return emb_table.fused_init(key, self.cfg)

    def lookup(self, params, ids):
        gids = emb_table.to_global_ids(ids, self.offsets)
        return emb_table.fused_lookup(params, gids)


@dataclass(frozen=True)
class HybridEngine:
    cfg: EmbeddingConfig
    buckets: tuple[int, ...] = DEFAULT_BUCKETS

    def _grouping(self):
        """-> (bucket_fields: {bucket: [field indices]}, gather_fields)."""
        bucket_fields: dict[int, list[int]] = {b: [] for b in self.buckets}
        gather_fields: list[int] = []
        for f, v in enumerate(self.cfg.field_vocab_sizes):
            for b in self.buckets:
                if v <= b:
                    bucket_fields[b].append(f)
                    break
            else:
                gather_fields.append(f)
        return bucket_fields, gather_fields

    def init(self, key) -> dict:
        bucket_fields, gather_fields = self._grouping()
        d = self.cfg.embedding_dim
        params: dict = {}
        for b, fields in bucket_fields.items():
            if not fields:
                continue
            key, k1, k2 = jax.random.split(key, 3)
            emb = nn.embedding_init(k1, (len(fields), b, d))
            wide = nn.glorot_uniform(k2, (len(fields) * b, 1)).reshape(
                len(fields), b, 1)
            params[f"oh{b}"] = jnp.concatenate([emb, wide], axis=2)
        if gather_fields:
            g_vocabs = tuple(self.cfg.field_vocab_sizes[f]
                             for f in gather_fields)
            key, sub = jax.random.split(key)
            g_cfg = EmbeddingConfig(field_vocab_sizes=g_vocabs,
                                    embedding_dim=d)
            gp = emb_table.fused_init(sub, g_cfg)
            params["gather"] = gp["table"]
        params["b"] = jnp.zeros((), jnp.float32)
        return params

    def lookup(self, params, ids):
        bucket_fields, gather_fields = self._grouping()
        d = self.cfg.embedding_dim
        group_outs: list[jax.Array] = []
        group_fields: list[int] = []
        for b, fields in bucket_fields.items():
            if not fields:
                continue
            sub = ids[:, np.asarray(fields, np.int32)]          # [B, Fg]
            iota = jax.lax.broadcasted_iota(jnp.int32,
                                            (1, 1, b), 2)
            dt = _oh_dtype()
            oh = (sub[:, :, None] == iota).astype(dt)
            t = params[f"oh{b}"].astype(dt)
            out = jnp.einsum("bfv,fvd->bfd", oh, t,
                             preferred_element_type=jnp.float32)
            group_outs.append(out)
            group_fields.extend(fields)
        if gather_fields:
            g_vocabs = tuple(self.cfg.field_vocab_sizes[f]
                             for f in gather_fields)
            offsets = emb_table.field_offsets(g_vocabs)
            gids = ids[:, np.asarray(gather_fields, np.int32)] + \
                jnp.asarray(offsets)[None, :]
            rows = jnp.take(params["gather"], gids, axis=0)     # [B,Fg,D+1]
            group_outs.append(rows)
            group_fields.extend(gather_fields)
        allrows = jnp.concatenate(group_outs, axis=1)           # [B, F, D+1]
        # restore original field order (static inverse permutation)
        inv = np.argsort(np.asarray(group_fields))
        allrows = jnp.take(allrows, jnp.asarray(inv), axis=1)
        return allrows[:, :, :d], allrows[:, :, d]


def make_engine(cfg: EmbeddingConfig, name: str = "hybrid",
                buckets: tuple[int, ...] = DEFAULT_BUCKETS):
    if name == "hybrid":
        return HybridEngine(cfg, buckets)
    if name == "fused":
        return FusedGatherEngine(cfg)
    raise ValueError(f"unknown embedding engine {name!r}")
