"""Microbench: strategies for embedding-gradient scatter-add on TPU.

N = B*F updates of width W into a [V, W] table. Variants:
  1. plain .at[ids].add(g)
  2. pre-sorted ids, indices_are_sorted=True
  3. sort + segment-dedup + unique sorted scatter
  4. one-hot matmul within per-field blocks (skipped here; FLOP-bound)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

V, W = 319488, 17
B, F = 8192, 39
N = B * F
STEPS = 20

rng = np.random.default_rng(0)
ids_np = rng.integers(0, V, size=N).astype(np.int32)
g_np = rng.standard_normal((N, W)).astype(np.float32)
table_np = np.zeros((V, W), np.float32)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS


ids = jnp.asarray(ids_np)
g = jnp.asarray(g_np)
table = jnp.asarray(table_np)

@jax.jit
def plain(table, ids, g):
    return table.at[ids].add(g)

@jax.jit
def sorted_scatter(table, ids, g):
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = g[order]
    return table.at[sid].add(sg, indices_are_sorted=True)

@jax.jit
def dedup_scatter(table, ids, g):
    sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    sg = jnp.take(g, order, axis=0)
    # segment-sum duplicates: reverse-cumsum trick. seg boundaries:
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg_id = jnp.cumsum(new_seg) - 1                     # dense 0..U-1
    summed = jax.ops.segment_sum(sg, seg_id, num_segments=N)
    # position of first occurrence of each segment → row id per segment
    first_pos = jax.ops.segment_min(jnp.arange(N), seg_id, num_segments=N)
    seg_rows = jnp.where(first_pos < N, sid[jnp.clip(first_pos, 0, N - 1)], V)
    return table.at[seg_rows].add(summed, indices_are_sorted=True,
                                  unique_indices=True, mode="drop")

@jax.jit
def segment_direct(table, ids, g):
    # segment_sum straight into the table-shaped buffer (scatter under hood)
    return table + jax.ops.segment_sum(g, ids, num_segments=V)

for name, fn in [("plain.at.add", plain),
                 ("sorted", sorted_scatter),
                 ("dedup_unique", dedup_scatter),
                 ("segment_direct", segment_direct)]:
    try:
        dt = timeit(fn, table, ids, g)
        gbps = (N * W * 4 * 2) / dt / 1e9
        print(f"{name:16s} {dt*1e3:8.2f} ms  ({gbps:6.1f} GB/s effective)")
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
