"""Bisect the slow scatter in the scanned train step.

Variants of a minimal "gather → loss → grad → adam-ish update" inside
lax.scan, timed per step on the TPU.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

V, W = 319488, 17
B, F = 8192, 39
K = 20          # steps per scan
N_DATA = 65536

rng = np.random.default_rng(0)
table0 = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32) * 0.01)
ids_data = jnp.asarray(rng.integers(0, 1000, size=(N_DATA, F)).astype(np.int32))
offsets = jnp.asarray((np.arange(F) * (V // F)).astype(np.int32))
labels = jnp.asarray(rng.integers(0, 2, size=(N_DATA,)).astype(np.float32))
idxm = jnp.asarray(rng.integers(0, N_DATA, size=(K, B)).astype(np.int32))


def timeit(step_fn, carry):
    carry, loss = step_fn(carry, idxm)   # compile+warm
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        carry, loss = step_fn(carry, idxm)
    float(loss)
    return (time.perf_counter() - t0) / (reps * K) * 1e3  # ms/step


def make_step(take_fn, use_grad=True):
    def loss_fn(table, idx):
        ids = jnp.take(ids_data, idx, axis=0) + offsets[None, :]
        y = jnp.take(labels, idx, axis=0)
        emb = take_fn(table, ids)                       # [B, F, W]
        logit = jnp.sum(jnp.sum(emb, axis=1) ** 2, axis=1)
        ce = jnp.mean(jnp.maximum(logit, 0) - logit * y
                      + jnp.log1p(jnp.exp(-jnp.abs(logit))))
        return ce

    @partial(jax.jit, donate_argnums=(0,))
    def steps(table, idxm):
        def body(table, idx):
            if use_grad:
                loss, g = jax.value_and_grad(loss_fn)(table, idx)
                table = table - 1e-3 * g
            else:
                loss = loss_fn(table, idx)
            return table, loss
        table, losses = jax.lax.scan(body, table, idxm)
        return table, jnp.mean(losses)
    return steps


variants = {
    "take_2d":        make_step(lambda t, ids: jnp.take(t, ids, axis=0)),
    "take_flat":      make_step(lambda t, ids: jnp.take(t, ids.reshape(-1), axis=0).reshape(B, F, W)),
    "index_2d":       make_step(lambda t, ids: t[ids]),
    "take_clip_flat": make_step(lambda t, ids: jnp.take(t, ids.reshape(-1), axis=0, mode="clip").reshape(B, F, W)),
    "fwd_only":       make_step(lambda t, ids: jnp.take(t, ids, axis=0), use_grad=False),
}

for name, fn in variants.items():
    try:
        dt = timeit(fn, jnp.array(table0, copy=True))
        print(f"{name:16s} {dt:8.3f} ms/step  ({B/dt*1000:,.0f} ex/s)")
    except Exception as e:
        print(f"{name:16s} FAILED {type(e).__name__}: {e}")
