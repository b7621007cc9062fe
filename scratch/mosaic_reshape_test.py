"""Can Mosaic reshape a 1-D VMEM block to a 2-D tile efficiently?"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, W, TILE = 837360 // 8 * 8, 17, 512
VP = (V + TILE - 1) // TILE * TILE
flat = jnp.asarray(np.random.default_rng(0).standard_normal(VP * W), jnp.float32)

def k_reshape(in_ref, out_ref):
    out_ref[:, :] = in_ref[:].reshape(TILE, W) * 2.0

@jax.jit
def via_reshape(flat):
    return pl.pallas_call(
        k_reshape,
        grid=(VP // TILE,),
        in_specs=[pl.BlockSpec((TILE * W,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((VP, W), jnp.float32),
    )(flat)

def k_2d(in_ref, out_ref):
    out_ref[:, :] = in_ref[:, :] * 2.0

@jax.jit
def via_2d(x2):
    return pl.pallas_call(
        k_2d,
        grid=(VP // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((VP, W), jnp.float32),
    )(x2)

def bench(name, fn, *args, reps=20):
    out = fn(*args); float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out.reshape(-1)[0])
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)

try:
    bench("flat-in + VMEM reshape", via_reshape, flat)
except Exception as e:
    print("flat reshape kernel FAILED:", str(e)[:500])

x2 = flat.reshape(VP, W)
float(x2[0, 0])
bench("2d-in (padded layout)", via_2d, x2)
