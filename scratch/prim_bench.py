"""Primitive costs with HARD sync (host value fetch) on the tunneled TPU.

Everything returns a scalar derived from the result so the fetch forces
completion.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

V, W = 319488, 17
B, F = 8192, 39
N = B * F

rng = np.random.default_rng(0)
table = jnp.asarray((rng.standard_normal((V, W)) * 0.01).astype(np.float32))
ids = jnp.asarray(rng.integers(0, V, size=N).astype(np.int32))
g = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))


def bench(name, fn, *args, reps=10):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(*args)
    float(s)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.3f} ms", flush=True)


@jax.jit
def scatter(table, ids, g):
    return jnp.sum(table.at[ids].add(g)[0])

@jax.jit
def scatter_zeros(ids, g):
    return jnp.sum(jnp.zeros((V, W), jnp.float32).at[ids].add(g)[0])

@jax.jit
def gather(table, ids):
    return jnp.sum(jnp.take(table, ids, axis=0))

@jax.jit
def sort_ids(ids):
    sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    return jnp.sum(sid[:8] + order[:8])

@jax.jit
def sort_and_permute(ids, g):
    sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    sg = jnp.take(g, order, axis=0)
    return jnp.sum(sg[0]) + jnp.sum(sid[:8])

@jax.jit
def seg_sum(ids, g):
    return jnp.sum(jax.ops.segment_sum(g, ids, num_segments=V)[0])

@jax.jit
def dense_adamish(table, g_dense):
    # elementwise full-table traffic reference point (~6 arrays)
    m = table * 0.9 + g_dense * 0.1
    v = table * 0.999 + g_dense * g_dense * 0.001
    out = table - 0.001 * m / (jnp.sqrt(v) + 1e-8)
    return jnp.sum(out[0])

g_dense = jnp.asarray((rng.standard_normal((V, W)) * 0.01).astype(np.float32))

bench("gather [N]x[V,W]", gather, table, ids)
bench("scatter_add into table", scatter, table, ids, g)
bench("scatter_add into zeros", scatter_zeros, ids, g)
bench("segment_sum", seg_sum, ids, g)
bench("sort_key_val N", sort_ids, ids)
bench("sort + permute g", sort_and_permute, ids, g)
bench("dense adam-ish full table", dense_adamish, table, g_dense)
