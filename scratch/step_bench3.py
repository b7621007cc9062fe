"""Round 3: isolate WHY scatter/gather are slow in the scanned step.

  A. standalone scatter, no donation (known fast, ~0.04ms)
  B. standalone scatter, donated (in-place)      <- is aliasing the culprit?
  C. scatter in scan, no donation on outer jit
  D. python-loop of donated standalone scatter (dispatch cost visible)
  E. gather standalone vs in scan
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

V, W = 319488, 17
B, F = 8192, 39
N = B * F
K = 20

rng = np.random.default_rng(0)
ids_np = rng.integers(0, V, size=(K, N)).astype(np.int32)   # fresh ids per step
g_np = rng.standard_normal((N, W)).astype(np.float32)
table_np = (rng.standard_normal((V, W)) * 0.01).astype(np.float32)

idsK = jnp.asarray(ids_np)
g = jnp.asarray(g_np)


def bench(name, fn, *args, reps=3, inner=K):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * inner) * 1e3
    print(f"{name:24s} {dt:8.3f} ms/step", flush=True)


@jax.jit
def scat_plain(table, ids, g):
    return table.at[ids].add(g)

@partial(jax.jit, donate_argnums=(0,))
def scat_donate(table, ids, g):
    return table.at[ids].add(g)

@jax.jit
def scan_scatter_nodonate(table, idsK, g):
    def body(t, ids):
        return t.at[ids].add(g), jnp.float32(0)
    t, _ = jax.lax.scan(body, table, idsK)
    return t

@partial(jax.jit, donate_argnums=(0,))
def scan_scatter_donate(table, idsK, g):
    def body(t, ids):
        return t.at[ids].add(g), jnp.float32(0)
    t, _ = jax.lax.scan(body, table, idsK)
    return t

@jax.jit
def gath_plain(table, ids):
    return jnp.take(table, ids, axis=0)

@jax.jit
def scan_gather(table, idsK):
    def body(acc, ids):
        e = jnp.take(table, ids, axis=0)
        return acc + jnp.sum(e, axis=0), jnp.float32(0)
    acc, _ = jax.lax.scan(body, jnp.zeros((W,)), idsK)
    return acc

# one scatter per call → inner=1
bench("A scat_plain", scat_plain, jnp.asarray(table_np), idsK[0], g, inner=1)
bench("E gath_plain", gath_plain, jnp.asarray(table_np), idsK[0], inner=1)
bench("C scan_scatter_nodonate", scan_scatter_nodonate,
      jnp.asarray(table_np), idsK, g)
bench("E2 scan_gather", scan_gather, jnp.asarray(table_np), idsK)

# donated: rebuild table each call, time only calls (rough)
def donated_loop():
    t = jnp.asarray(table_np)
    jax.block_until_ready(t)
    t0 = time.perf_counter()
    for i in range(K):
        t = scat_donate(t, idsK[i % K], g)
    jax.block_until_ready(t)
    return (time.perf_counter() - t0) / K * 1e3

scat_donate(jnp.asarray(table_np), idsK[0], g)  # compile
print(f"{'B donated python-loop':24s} {donated_loop():8.3f} ms/step", flush=True)

tbl = jnp.asarray(table_np)
scan_scatter_donate(jnp.array(tbl, copy=True), idsK, g)  # compile
t = jnp.array(tbl, copy=True)
jax.block_until_ready(t)
t0 = time.perf_counter()
t = scan_scatter_donate(t, idsK, g)
jax.block_until_ready(t)
print(f"{'D scan_scatter_donate':24s} {(time.perf_counter()-t0)/K*1e3:8.3f} ms/step", flush=True)
