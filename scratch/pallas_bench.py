"""TPU measurement of the Pallas kernels vs XLA, amortized inside scan.

All timings hard-synced by fetching a scalar value.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from recsys_tpu.ops import pallas_kernels as pk

V, W = 319488, 17
B, F = 8192, 39
N = B * F
K = 20

rng = np.random.default_rng(0)
idsK = jnp.asarray(rng.integers(0, V, size=(K, N)).astype(np.int32))
g = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
table = jnp.asarray((rng.standard_normal((V, W)) * 0.01).astype(np.float32))


def bench(name, fn, *args, reps=3):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(*args)
    float(s)
    print(f"{name:28s} {(time.perf_counter()-t0)/(reps*K)*1e3:8.3f} ms/step",
          flush=True)


@jax.jit
def xla_scatter_scan(idsK, g):
    def body(acc, ids):
        t = jnp.zeros((V, W), jnp.float32).at[ids].add(g)
        return acc + t[0], 0
    acc, _ = jax.lax.scan(body, jnp.zeros((W,)), idsK)
    return jnp.sum(acc)

@jax.jit
def pallas_scatter_scan(idsK, g):
    def body(acc, ids):
        t = pk.embedding_grad(ids, g, V)
        return acc + t[0], 0
    acc, _ = jax.lax.scan(body, jnp.zeros((W,)), idsK)
    return jnp.sum(acc)

@jax.jit
def sort_only_scan(idsK):
    def body(acc, ids):
        sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
        return acc + sid[0] + order[0], 0
    acc, _ = jax.lax.scan(body, jnp.int32(0), idsK)
    return acc

@jax.jit
def sort_permute_scan(idsK, g):
    def body(acc, ids):
        sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
        sg = jnp.take(g, order, axis=0)
        return acc + sg[0, 0] + sid[0], 0
    acc, _ = jax.lax.scan(body, jnp.float32(0), idsK)
    return acc

@jax.jit
def gather_scan(table, idsK):
    def body(acc, ids):
        e = jnp.take(table, ids, axis=0)
        return acc + jnp.sum(e[0]), 0
    acc, _ = jax.lax.scan(body, jnp.float32(0), idsK)
    return acc


bench("sort only", sort_only_scan, idsK)
bench("sort + permute", sort_permute_scan, idsK, g)
bench("xla gather", gather_scan, table, idsK)
bench("xla scatter (scan)", xla_scatter_scan, idsK, g)
bench("pallas embedding_grad", pallas_scatter_scan, idsK, g)
