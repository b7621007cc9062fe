"""Prototype: per-row-DMA pipelined gather kernel.

out[i] = src[ids[i]] for arbitrary ids — the primitive behind both the
embedding forward gather and the backward sort-permute. Measures achievable
rows/s vs XLA's gather.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, W = 319488, 17
N = 8192 * 39
CHUNK = 512
K = 20


def _gather_kernel(ids_hbm, src_hbm, out_ref, ids_smem, sem_ids, sems):
    c = pl.program_id(0)
    # ids chunk HBM -> SMEM so rows are scalar-readable
    cp = pltpu.make_async_copy(ids_hbm.at[pl.ds(c, 1), :], ids_smem, sem_ids)
    cp.start()
    cp.wait()

    def issue(r, _):
        row = ids_smem[0, r]
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(r, 1), :],
            sems.at[r % 16],
        ).start()
        return 0

    def drain(r, _):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(0, 1), :],
            out_ref.at[pl.ds(r, 1), :],
            sems.at[r % 16],
        ).wait()
        return 0

    # issue in waves of 16 outstanding DMAs
    def wave(wv, _):
        base = wv * 16
        jax.lax.fori_loop(base, base + 16, issue, 0)
        jax.lax.fori_loop(base, base + 16, drain, 0)
        return 0

    jax.lax.fori_loop(0, CHUNK // 16, wave, 0)


def rowdma_gather(src, ids):
    n = ids.shape[0]
    assert n % CHUNK == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((CHUNK, src.shape[1]),
                               lambda c: (c, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, src.shape[1]), src.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.reshape(n // CHUNK, CHUNK), src)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    src = jnp.asarray((rng.standard_normal((V, W)) * 0.01).astype(np.float32))
    idsK = jnp.asarray(rng.integers(0, V, size=(K, N)).astype(np.int32))

    # correctness single call
    out = rowdma_gather(src, idsK[0])
    want = np.asarray(src)[np.asarray(idsK[0])]
    np.testing.assert_allclose(np.asarray(out), want)
    print("correct ✓", flush=True)

    @jax.jit
    def scan_rowdma(src, idsK):
        def body(acc, ids):
            e = rowdma_gather(src, ids)
            return acc + jnp.sum(e[0]), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), idsK)
        return acc

    float(scan_rowdma(src, idsK))
    t0 = time.perf_counter()
    for _ in range(3):
        s = scan_rowdma(src, idsK)
    float(s)
    dt = (time.perf_counter() - t0) / (3 * K) * 1e3
    print(f"rowdma gather: {dt:.3f} ms/step ({N/dt*1000/1e6:.1f} M rows/s)",
          flush=True)
