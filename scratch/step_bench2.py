"""Round 2: can we make the in-scan embedding backward fast without Pallas?

Variants:
  - baseline take_2d (known ~10ms/step)
  - custom_vjp whose bwd does scatter behind an optimization_barrier
  - custom_vjp whose bwd materializes scatter as a standalone XLA op via
    lax.scatter_add with explicit dnums on flattened ids
  - scan of JUST a scatter (no autodiff) — is scatter slow inside scan at all?
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

V, W = 319488, 17
B, F = 8192, 39
K = 20
N_DATA = 65536

rng = np.random.default_rng(0)
table0 = np.asarray(rng.standard_normal((V, W)).astype(np.float32) * 0.01)
ids_data = jnp.asarray(rng.integers(0, 1000, size=(N_DATA, F)).astype(np.int32))
offsets = jnp.asarray((np.arange(F) * (V // F)).astype(np.int32))
labels = jnp.asarray(rng.integers(0, 2, size=(N_DATA,)).astype(np.float32))
idxm = jnp.asarray(rng.integers(0, N_DATA, size=(K, B)).astype(np.int32))


def timeit(step_fn):
    carry = jnp.asarray(table0)
    carry, loss = step_fn(carry, idxm)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        carry, loss = step_fn(carry, idxm)
    float(loss)
    return (time.perf_counter() - t0) / (reps * K) * 1e3


# --- custom-vjp lookups -----------------------------------------------------

@jax.custom_vjp
def lookup_barrier(table, ids):
    return jnp.take(table, ids, axis=0)

def _lb_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape, table.dtype)

def _lb_bwd(res, g):
    ids, shape, dtype = res
    ids_b, g_b = jax.lax.optimization_barrier((ids, g))
    grad = jnp.zeros(shape, dtype).at[ids_b].add(g_b)
    (grad,) = jax.lax.optimization_barrier((grad,))
    return grad, None

lookup_barrier.defvjp(_lb_fwd, _lb_bwd)


@jax.custom_vjp
def lookup_flat(table, ids):
    return jnp.take(table, ids, axis=0)

def _lf_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape, table.dtype)

def _lf_bwd(res, g):
    ids, shape, dtype = res
    flat = ids.reshape(-1)
    gf = g.reshape(-1, shape[1])
    grad = jnp.zeros(shape, dtype).at[flat].add(gf)
    return grad, None

lookup_flat.defvjp(_lf_fwd, _lf_bwd)


def make_step(take_fn):
    def loss_fn(table, idx):
        ids = jnp.take(ids_data, idx, axis=0) + offsets[None, :]
        y = jnp.take(labels, idx, axis=0)
        emb = take_fn(table, ids)
        logit = jnp.sum(jnp.sum(emb, axis=1) ** 2, axis=1)
        ce = jnp.mean(jnp.maximum(logit, 0) - logit * y
                      + jnp.log1p(jnp.exp(-jnp.abs(logit))))
        return ce

    @partial(jax.jit, donate_argnums=(0,))
    def steps(table, idxm):
        def body(table, idx):
            loss, g = jax.value_and_grad(loss_fn)(table, idx)
            return table - 1e-3 * g, loss
        return jax.lax.scan(body, table, idxm)
    return steps


@partial(jax.jit, donate_argnums=(0,))
def scatter_only_scan(table, idxm):
    def body(table, idx):
        ids = (jnp.take(ids_data, idx, axis=0) + offsets[None, :]).reshape(-1)
        g = jnp.take(labels, idx, axis=0)[:, None] * jnp.ones((1, W))
        g = jnp.repeat(g[:, None, :], F, axis=1).reshape(-1, W)
        return table.at[ids].add(g), jnp.float32(0)
    table, losses = jax.lax.scan(body, table, idxm)
    return table, jnp.sum(losses) + table[0, 0]


variants = {
    "baseline_take2d": make_step(lambda t, ids: jnp.take(t, ids, axis=0)),
    "vjp_barrier":     make_step(lookup_barrier),
    "vjp_flat":        make_step(lookup_flat),
    "scatter_only":    scatter_only_scan,
}

for name, fn in variants.items():
    try:
        dt = timeit(fn)
        print(f"{name:18s} {dt:8.3f} ms/step  ({B/dt*1000:,.0f} ex/s)", flush=True)
    except Exception as e:
        print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
