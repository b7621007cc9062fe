"""Embedding engines: how a [B, F] id batch becomes (emb [B,F,D], wide [B,F]).

TPU-native replacement for the reference's ``tf.feature_column`` embedding /
indicator stack (fm/fm.py:75-95, deepfm/deepfm.py:37-51). Two engines, both
profiled on v5e (tools/profile_step.py):

**FusedGatherEngine** — all F fields in ONE packed [V, D+1] table (embedding
columns + the wide/linear weight as column D, see
`recsys_tpu.embeddings.table.fused_init`), fetched with a single gather whose
backward is the Pallas sorted-segment scatter (`table_gather`).

**SplitEngine** (default) — fields are partitioned by vocab size:

- *small fields* (vocab ≤ `threshold`, 25 of the 39 Criteo fields, ~64% of
  the gathered rows) never touch a gather or scatter. Their lookup is one
  MXU matmul: a multi-hot [B, Vs] (exactly one hit per field, vocab ranges
  disjoint) times a block-diagonal expansion [Vs, Fs·(D+1)] of the small
  table, so row `v` of field `f` lands in output block `f`. The autodiff
  backward is the transposed matmul — dense MXU work, zero scatter rows.
  TPU dynamic gather/scatter cost is per-ROW latency-bound (~100M gathered /
  ~19M scattered rows/s measured), so converting 205k small-field rows per
  step into a [B,Vs]@[Vs,Fs·W] matmul (~23 GFLOP, ~0.2 ms) is a large win.
- *big fields* (the hash-capped 100k vocabs) keep the packed gather +
  Pallas-scatter path.

**Flat table storage**: big tables are stored as 1-D ``[V·(D+1)]`` arrays
and reshaped to [V, D+1] only at the gather. A 2-D f32[V,17] array is tiled
T(8,128) on TPU — 17 of 128 lanes used — so every whole-table elementwise
pass (the Adam update reads/writes p/mu/nu 7×) pays 7.5× physical HBM
traffic; storing flat cut the optimizer fusion from 4.5 ms to <1 ms per step
at batch 8192.

Engine interface (used by models/ctr.py):
    engine.init(key)                -> params subtree (plain arrays)
    engine.lookup(params, ids[B,F]) -> (emb [B,F,D], wide [B,F])
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.config import EmbeddingConfig
from recsys_tpu.embeddings import table as emb_table
from recsys_tpu.ops import nn

#: Fields with vocab ≤ this go through the one-hot-matmul path.
SPLIT_THRESHOLD = 2048


def _matmul_dtype():
    """bf16 one-hot matmuls ride the MXU at full rate on TPU; f32 on CPU,
    whose dot thunk lacks BF16xBF16=F32 (tests run there)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


@dataclass(frozen=True)
class FusedGatherEngine:
    """All fields through one packed flat [V·(D+1)] table + single gather."""

    cfg: EmbeddingConfig

    @property
    def offsets(self):
        return emb_table.field_offsets(self.cfg.field_vocab_sizes)

    @property
    def width(self) -> int:
        return self.cfg.embedding_dim + 1

    @property
    def v_pad(self) -> int:
        return emb_table.pad_rows(self.cfg.total_vocab)

    def init(self, key) -> dict:
        p = emb_table.fused_init(key, self.cfg)
        return {"table_flat": p["table"].reshape(-1), "b": p["b"]}

    def table2d(self, params) -> jax.Array:
        return params["table_flat"].reshape(self.v_pad, self.width)

    def lookup(self, params, ids, train: bool = True):
        del train  # gather is already the inference-optimal path
        gids = emb_table.to_global_ids(ids, self.offsets)
        rows = emb_table.table_gather_flat(params["table_flat"], gids,
                                           self.v_pad, self.width)
        return rows[:, :, :-1], rows[:, :, -1]

    def lookup_sharded(self, params, ids, axis_name: str = "model",
                       exact: bool = False, cap_factor: float = 2.0):
        """Inside shard_map: params['table_flat'] is this member's row shard;
        lookup via dedup + all-to-all (recsys_tpu.parallel.sharded_embedding)."""
        from recsys_tpu.parallel import sharded_embedding as SE

        local = params["table_flat"].reshape(-1, self.width)
        gids = emb_table.to_global_ids(ids, self.offsets)
        rows = SE.a2a_embedding_lookup(local, gids, axis_name, exact=exact,
                                       cap_factor=cap_factor)
        return rows[:, :, :-1], rows[:, :, -1]

    def a2a_overflow(self, ids, num_data: int, num_model: int,
                     cap_factor: float = 2.0) -> int:
        """Host-side lossless-capacity check for a batch: unique ids that
        would exceed the per-owner a2a capacity at ``cap_factor`` (0 ==
        lossless). Mirrors lookup_sharded's id routing, per data shard."""
        from recsys_tpu.parallel import sharded_embedding as SE

        gids = np.asarray(ids) + np.asarray(self.offsets)[None, :]
        shard_rows = self.v_pad // num_model
        per_shard = np.array_split(gids, num_data, axis=0)
        return max(SE.a2a_overflow(s, num_model, shard_rows, cap_factor)
                   for s in per_shard)


@dataclass(frozen=True)
class SplitEngine:
    cfg: EmbeddingConfig
    threshold: int = SPLIT_THRESHOLD

    # ---- static field partition -----------------------------------------
    def _partition(self):
        small = [f for f, v in enumerate(self.cfg.field_vocab_sizes)
                 if v <= self.threshold]
        big = [f for f, v in enumerate(self.cfg.field_vocab_sizes)
               if v > self.threshold]
        return small, big

    def _sizes(self, fields):
        return tuple(self.cfg.field_vocab_sizes[f] for f in fields)

    @property
    def width(self) -> int:
        return self.cfg.embedding_dim + 1

    def init(self, key) -> dict:
        small, big = self._partition()
        k1, k2 = jax.random.split(key)
        params: dict = {}
        if small:
            s_cfg = EmbeddingConfig(field_vocab_sizes=self._sizes(small),
                                    embedding_dim=self.cfg.embedding_dim)
            params["small"] = emb_table.fused_init(k1, s_cfg)["table"]
        if big:
            b_cfg = EmbeddingConfig(field_vocab_sizes=self._sizes(big),
                                    embedding_dim=self.cfg.embedding_dim)
            params["big_flat"] = emb_table.fused_init(
                k2, b_cfg)["table"].reshape(-1)
        params["b"] = jnp.zeros((), jnp.float32)
        return params

    def lookup(self, params, ids, train: bool = True):
        small, big = self._partition()
        w = self.width
        outs = []
        if small:
            # the one-hot matmul exists to avoid the SCATTER in the backward
            # pass; inference has no backward, and at serving batch sizes a
            # plain gather is ~10× cheaper than the [B,Vs] matmul
            rows_fn = self._small_rows if train else self._small_rows_gather
            outs.append(rows_fn(params["small"], ids, small))
        if big:
            b_sizes = self._sizes(big)
            offsets = emb_table.field_offsets(b_sizes)
            gids = ids[:, np.asarray(big, np.int32)] + \
                jnp.asarray(offsets)[None, :]
            v_pad = emb_table.pad_rows(sum(b_sizes))
            outs.append(emb_table.table_gather_flat(params["big_flat"], gids,
                                                    v_pad, w))
        rows = jnp.concatenate(outs, axis=1)
        # restore original field order (static inverse permutation)
        inv = np.argsort(np.asarray(small + big))
        rows = jnp.take(rows, jnp.asarray(inv), axis=1)
        return rows[:, :, :-1], rows[:, :, -1]

    def lookup_sharded(self, params, ids, axis_name: str = "model",
                       exact: bool = False, cap_factor: float = 2.0):
        """Inside shard_map: 'small' is replicated (every member runs the
        same tiny matmul), 'big_flat' is this member's row shard, fetched
        via dedup + all-to-all."""
        from recsys_tpu.parallel import sharded_embedding as SE

        small, big = self._partition()
        w = self.width
        outs = []
        if small:
            outs.append(self._small_rows(params["small"], ids, small))
        if big:
            b_sizes = self._sizes(big)
            offsets = emb_table.field_offsets(b_sizes)
            gids = ids[:, np.asarray(big, np.int32)] + \
                jnp.asarray(offsets)[None, :]
            local = params["big_flat"].reshape(-1, w)
            outs.append(SE.a2a_embedding_lookup(local, gids, axis_name,
                                                exact=exact,
                                                cap_factor=cap_factor))
        rows = jnp.concatenate(outs, axis=1)
        inv = np.argsort(np.asarray(small + big))
        rows = jnp.take(rows, jnp.asarray(inv), axis=1)
        return rows[:, :, :-1], rows[:, :, -1]

    def a2a_overflow(self, ids, num_data: int, num_model: int,
                     cap_factor: float = 2.0) -> int:
        """Host-side lossless-capacity check (see FusedGatherEngine): only
        the big fields travel over the all-to-all in this engine."""
        from recsys_tpu.parallel import sharded_embedding as SE

        small, big = self._partition()
        if not big:
            return 0
        b_sizes = self._sizes(big)
        offsets = emb_table.field_offsets(b_sizes)
        gids = (np.asarray(ids)[:, np.asarray(big, np.int64)]
                + np.asarray(offsets)[None, :])
        shard_rows = emb_table.pad_rows(sum(b_sizes)) // num_model
        per_shard = np.array_split(gids, num_data, axis=0)
        return max(SE.a2a_overflow(s, num_model, shard_rows, cap_factor)
                   for s in per_shard)

    def _small_rows_gather(self, table, ids, small_fields):
        """[B, Fs, D+1] via plain row gather — the inference path."""
        sizes = self._sizes(small_fields)
        offsets = emb_table.field_offsets(sizes)
        sub = ids[:, np.asarray(small_fields, np.int32)]
        gids = sub + jnp.asarray(offsets)[None, :]
        return jnp.take(table, gids, axis=0)

    def _small_rows(self, table, ids, small_fields):
        """[B, Fs, D+1] via multi-hot @ block-diagonal table expansion."""
        sizes = self._sizes(small_fields)
        fs, w = len(sizes), self.width
        vs = int(sum(sizes))
        offsets = emb_table.field_offsets(sizes)          # [Fs]
        sub = ids[:, np.asarray(small_fields, np.int32)]  # [B, Fs] local ids
        gids = sub + jnp.asarray(offsets)[None, :]        # [B, Fs] in [0, Vs)

        dt = _matmul_dtype()
        # multi-hot [B, Vs]: exactly one hit per field (disjoint ranges) —
        # Σ_f (gids[:, f] == v), fused by XLA into one pass over the output.
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, vs), 1)
        oh = jnp.zeros((ids.shape[0], vs), dt)
        for f in range(fs):
            oh = oh + (gids[:, f][:, None] == iota).astype(dt)

        # block-diagonal weight [Vs, Fs·W]: field f's vocab rows sit in
        # output block f, so oh @ wblk routes each id to its field's slot.
        wblk = jnp.zeros((vs, fs * w), table.dtype)
        lo = 0
        for f, v in enumerate(sizes):
            wblk = jax.lax.dynamic_update_slice(
                wblk, table[lo:lo + v], (lo, f * w))
            lo += v

        out = jnp.dot(oh, wblk.astype(dt),
                      preferred_element_type=jnp.float32)  # [B, Fs·W]
        return out.reshape(ids.shape[0], fs, w)


def make_engine(cfg: EmbeddingConfig, name: str = "split",
                threshold: int = SPLIT_THRESHOLD):
    if name == "split":
        # degenerate partitions (all fields on one side) are handled inside
        return SplitEngine(cfg, threshold)
    if name == "fused":
        return FusedGatherEngine(cfg)
    raise ValueError(f"unknown embedding engine {name!r}")
