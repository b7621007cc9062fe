"""Microbench: XLA cin_apply vs Pallas cin_apply_fused, fwd+bwd on TPU."""
import sys
import time

import jax
import jax.numpy as jnp

from recsys_tpu.ops import interactions, pallas_cin

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
F0, D = 39, 16
LAYERS = (20, 10, 10)

key = jax.random.key(0)
params = interactions.cin_init(key, F0, LAYERS)
x0 = jax.random.normal(jax.random.key(1), (B, F0, D), jnp.float32)
w_out = jax.random.normal(jax.random.key(2), (sum(LAYERS),), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # hard sync via host fetch (tunnel)
    float(jax.tree.leaves(out)[0].ravel()[0])
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def loss_xla(p, x):
    return jnp.sum(interactions.cin_apply(p, x) * w_out)


def loss_fused(p, x):
    return jnp.sum(pallas_cin.cin_apply_fused(p, x) * w_out)


print(f"B={B} F0={F0} D={D} layers={LAYERS} backend={jax.default_backend()}")
timeit("xla fwd", interactions.cin_apply, params, x0)
timeit("fused fwd", pallas_cin.cin_apply_fused, params, x0)
timeit("xla fwd+bwd", jax.grad(loss_xla, argnums=(0, 1)), params, x0)
timeit("fused fwd+bwd", jax.grad(loss_fused, argnums=(0, 1)), params, x0)
