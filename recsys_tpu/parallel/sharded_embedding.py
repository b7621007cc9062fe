"""Row-sharded embedding lookup over the 'model' mesh axis.

This is the TPU-native replacement for TF's internal partitioned-variable
hashed-embedding machinery (SURVEY §2.2 row 1): when the packed vocab does
not fit (or should not be replicated) per chip, the [V, D] table is split
row-wise across the ``model`` axis, and lookup becomes

    local = gids - shard_lo            (static shard arithmetic)
    hit   = 0 <= local < shard_rows    (each id lives on exactly one shard)
    psum_over_model( where(hit, local_table[local], 0) )

Exactly one shard contributes each row, so the psum reconstructs the full
gather; XLA lowers the psum to an ICI all-reduce. The autodiff transpose
yields a local scatter-add into each shard's rows followed by the psum
transpose — i.e. the sharded gradient scatter comes for free.

These functions MUST be called inside a `shard_map` context where
``axis_name`` is a mesh axis (see `recsys_tpu.parallel.spmd`). With a
model-axis size of 1 they degrade to the local path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recsys_tpu.core.mesh import MODEL_AXIS


def shard_rows_of(total_rows: int, num_shards: int) -> int:
    if total_rows % num_shards != 0:
        raise ValueError(
            f"padded vocab {total_rows} not divisible by model axis {num_shards}"
        )
    return total_rows // num_shards


def sharded_embedding_lookup(
    local_table: jax.Array,   # [V/m, D] this shard's rows
    gids: jax.Array,          # [B_local, F] global packed ids (replicated on model axis)
    axis_name: str = MODEL_AXIS,
) -> jax.Array:
    shard_rows = local_table.shape[0]
    lo = jax.lax.axis_index(axis_name) * shard_rows
    local = gids - lo
    hit = (local >= 0) & (local < shard_rows)
    safe = jnp.where(hit, local, 0)
    emb = jnp.take(local_table, safe, axis=0)            # [B, F, D]
    emb = jnp.where(hit[..., None], emb, 0.0)
    return jax.lax.psum(emb, axis_name)


def sharded_linear_sum(
    local_w: jax.Array,       # [V/m] this shard's wide weights
    bias: jax.Array,          # scalar (replicated)
    gids: jax.Array,          # [B_local, F]
    axis_name: str = MODEL_AXIS,
) -> jax.Array:
    shard_rows = local_w.shape[0]
    lo = jax.lax.axis_index(axis_name) * shard_rows
    local = gids - lo
    hit = (local >= 0) & (local < shard_rows)
    safe = jnp.where(hit, local, 0)
    w = jnp.where(hit, jnp.take(local_w, safe, axis=0), 0.0)  # [B, F]
    partial = jnp.sum(w, axis=1, keepdims=True)
    return jax.lax.psum(partial, axis_name) + bias
