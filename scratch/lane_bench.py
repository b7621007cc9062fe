"""Microbench: lane-padding cost of narrow (W=17) tables on TPU.

Theory: [V, 17] f32 arrays are tiled (8,128) -> 17 of 128 lanes used, so
elementwise ops pay ~7.5x bandwidth. Compare FMA over [V,17] vs flat [V*17],
and an adam-like update in both layouts.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

V, W = 623304, 17
K = 20

rng = np.random.default_rng(0)
a2 = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
b2 = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
c2 = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
a1, b1, c1 = a2.reshape(-1), b2.reshape(-1), c2.reshape(-1)


def bench(name, fn, *args, reps=3):
    float(fn(*args).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(*args)
    float(s.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{name:34s} {dt:8.3f} ms/iter", flush=True)


def adamish(p, m, v):
    def body(c, _):
        p, m, v = c
        m = 0.9 * m + 0.1 * p
        v = 0.999 * v + 0.001 * p * p
        p = p - 0.001 * m / (jnp.sqrt(v) + 1e-8)
        return (p, m, v), 0
    (p, m, v), _ = jax.lax.scan(body, (p, m, v), None, length=K)
    return p

adam2 = jax.jit(adamish)
adam1 = jax.jit(adamish)

bench("adam-like [V,17]", adam2, a2, b2, c2)
bench("adam-like [V*17] flat", adam1, a1, b1, c1)

# reshape cost: [V,17] -> flat and back
@jax.jit
def reshape_rt(x):
    def body(c, _):
        return c.reshape(-1).reshape(V, W) + 1.0, 0
    out, _ = jax.lax.scan(body, x, None, length=K)
    return out
bench("reshape roundtrip + add [V,17]", reshape_rt, a2)
