"""Fused Pallas CIN layer — the xDeepFM hot op without the HBM z-tensor.

The XLA formulation of one CIN layer (`interactions.cin_apply`,
reference procedure xdeepfm/xdeepfm.py:135-182) materializes the pairwise
feature-map outer product

    z[(b,d), p·Fk+q] = x0[(b,d), p] · xk[(b,d), q]

in HBM before the [B·D, F0·Fk] × [F0·Fk, H] matmul. At the zoo's shapes
(B=16384, D=16, F0=Fk=39) z is ~1.5 GB of traffic per layer per direction;
the profiled step spends most of its time in the reshape/mul/reduce fusions
around z and its cotangent (tools/profile_step.py: ~57 ms/step vs ~13 for
DeepFM). This kernel fuses the outer product into the matmul: each grid
step builds a [T, F0·Fk] z **tile in VMEM** and feeds the MXU directly, so
HBM traffic drops to the x0/xk/y tiles themselves (~100× less).

Layout trick: no Mosaic-hostile reshapes. The expansion of x0 [T, F0] to
z-columns is a matmul with a static 0/1 selector,

    A  = x0 @ Sᵀ     Sᵀ[p, j] = (j // Fk == p)      # A[t,j] = x0[t, p(j)]
    Bm = xk @ Rᵀ     Rᵀ[q, j] = (j %  Fk == q)      # Bm[t,j] = xk[t, q(j)]
    y  = relu((A ⊙ Bm) @ W + b)

and the backward contractions reuse the same selectors transposed:

    g   = dy ⊙ 1[y>0]
    dz  = g @ Wᵀ
    dx0 = (dz ⊙ Bm) @ S        dxk = (dz ⊙ A) @ R
    dW  = Σ_tiles zᵀ @ g        db = Σ g

dW/db accumulate across the sequential TPU grid in a VMEM-resident output
block (constant index map, zero-initialized at grid step 0).

Reference behavior replaced: the conv1d-over-outer-product CIN layer
(xdeepfm/xdeepfm.py:145-158) — same math as `interactions.cin_apply`,
equivalence pinned by tests/test_pallas_cin.py.

Known headroom (measured, not yet landed): the selector-expansion matmuls
(A = x0@Sᵀ, Bm = xk@Rᵀ and their transposes) carry ~70% of the kernel's
FLOPs but compute pure data movement — a[t, p·Fk+r] = x0[t, p] is a
consecutive-element repeat and bm a block tile. Replacing them with
in-VMEM repeat/concat (or running them bf16) is the next ~2-3× on
xDeepFM's step — but in-kernel broadcast/reshape/concat formulations of
exactly this pattern previously wedged the Mosaic compiler for 15-30 min
per attempt on this stack (see .claude/skills/verify SKILL notes), so the
matmul formulation stays until that is debuggable offline. xDeepFM's
RESULTS gap vs DeepFM (760k vs 2.4M ex/s) is this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows (B·D) per grid step. The live VMEM set is ~5 z-tiles
# ([T, F0·Fk] ≤ [256, 1521] ≈ 1.5 MB each) + the resident W/dW blocks.
ROW_TILE = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _selectors(f0: int, fk: int, f0fk: int):
    """Static 0/1 expansion matrices Sᵀ [F0, F0·Fk] and Rᵀ [Fk, F0·Fk]."""
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (f0, f0fk), 1)
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (f0, f0fk), 0)
    st = (cols_s // fk == rows_s).astype(jnp.float32)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (fk, f0fk), 1)
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (fk, f0fk), 0)
    rt = (cols_r % fk == rows_r).astype(jnp.float32)
    return st, rt


def _fwd_kernel(x0_ref, xk_ref, w_ref, b_ref, y_ref):
    f0 = x0_ref.shape[1]
    fk = xk_ref.shape[1]
    f0fk = w_ref.shape[0]
    st, rt = _selectors(f0, fk, f0fk)
    a = jnp.dot(x0_ref[:, :], st, preferred_element_type=jnp.float32)
    bm = jnp.dot(xk_ref[:, :], rt, preferred_element_type=jnp.float32)
    z = a * bm
    y = jnp.dot(z, w_ref[:, :], preferred_element_type=jnp.float32)
    y_ref[:, :] = jax.nn.relu(y + b_ref[:, :])


def _bwd_kernel(x0_ref, xk_ref, w_ref, y_ref, dy_ref,
                dx0_ref, dxk_ref, dw_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    f0 = x0_ref.shape[1]
    fk = xk_ref.shape[1]
    f0fk = w_ref.shape[0]
    st, rt = _selectors(f0, fk, f0fk)

    g = dy_ref[:, :] * (y_ref[:, :] > 0.0).astype(jnp.float32)
    # dz = g @ Wᵀ  — contract over H without transposing W
    dz = jax.lax.dot_general(
        g, w_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = jnp.dot(x0_ref[:, :], st, preferred_element_type=jnp.float32)
    bm = jnp.dot(xk_ref[:, :], rt, preferred_element_type=jnp.float32)
    # dx0 = (dz ⊙ Bm) @ S,  dxk = (dz ⊙ A) @ R — contract over F0·Fk
    dx0_ref[:, :] = jax.lax.dot_general(
        dz * bm, st, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxk_ref[:, :] = jax.lax.dot_general(
        dz * a, rt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dW += zᵀ @ g (recomputed z; contracting over the row tile)
    dw_ref[:, :] += jax.lax.dot_general(
        a * bm, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[:, :] += jnp.sum(g, axis=0, keepdims=True)


def _pad_rows(x: jax.Array, n_pad: int) -> jax.Array:
    n = x.shape[0]
    if n_pad == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)]
    )


def _fwd_impl(x0v, xkv, w, b):
    n, f0 = x0v.shape
    fk = xkv.shape[1]
    f0fk, h = w.shape
    n_pad = _round_up(n, ROW_TILE)
    grid = (n_pad // ROW_TILE,)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, f0), lambda i: (i, 0)),
            pl.BlockSpec((ROW_TILE, fk), lambda i: (i, 0)),
            pl.BlockSpec((f0fk, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, h), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * f0fk * (f0 + fk + h),
            bytes_accessed=4 * n_pad * (f0 + fk + h) + 4 * f0fk * h,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(_pad_rows(x0v.astype(jnp.float32), n_pad),
      _pad_rows(xkv.astype(jnp.float32), n_pad),
      w, b.reshape(1, h))
    return y[:n]


def _bwd_impl(x0v, xkv, w, y, dy):
    n, f0 = x0v.shape
    fk = xkv.shape[1]
    f0fk, h = w.shape
    n_pad = _round_up(n, ROW_TILE)
    grid = (n_pad // ROW_TILE,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    dx0, dxk, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, f0), row),
            pl.BlockSpec((ROW_TILE, fk), row),
            pl.BlockSpec((f0fk, h), full),
            pl.BlockSpec((ROW_TILE, h), row),
            pl.BlockSpec((ROW_TILE, h), row),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, f0), row),
            pl.BlockSpec((ROW_TILE, fk), row),
            pl.BlockSpec((f0fk, h), full),
            pl.BlockSpec((1, h), full),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, f0), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, fk), jnp.float32),
            jax.ShapeDtypeStruct((f0fk, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * f0fk * (2 * h + f0 + fk + f0 + fk),
            bytes_accessed=4 * n_pad * (f0 + fk + 3 * h) + 8 * f0fk * h,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        _pad_rows(x0v.astype(jnp.float32), n_pad),
        _pad_rows(xkv.astype(jnp.float32), n_pad),
        w,
        _pad_rows(y, n_pad),
        # zero-padded dy ⇒ padded rows contribute g = 0 to dW/db
        _pad_rows(dy.astype(jnp.float32), n_pad),
    )
    return dx0[:n], dxk[:n], dw, db.reshape(h)


@jax.custom_vjp
def cin_layer(x0v: jax.Array, xkv: jax.Array, w: jax.Array,
              b: jax.Array) -> jax.Array:
    """One fused CIN layer: relu(outer(x0v, xkv) @ w + b) → [N, H].

    x0v/xkv are [N=B·D, F0]/[N, Fk] feature maps in the embedding-dim-fused
    layout of `interactions.cin_apply`; w is [F0·Fk, H], b [H].

    Compute runs in float32 internally; the output is cast back to
    x0v.dtype and gradients to their primal dtypes, so bf16 models keep
    the same dtype behavior as the XLA path (`cin_apply_xla`).
    """
    return _fwd_impl(x0v, xkv, w.astype(jnp.float32),
                     b.astype(jnp.float32)).astype(x0v.dtype)


def _cin_layer_fwd(x0v, xkv, w, b):
    y32 = _fwd_impl(x0v, xkv, w.astype(jnp.float32), b.astype(jnp.float32))
    return y32.astype(x0v.dtype), (x0v, xkv, w, b, y32)


def _cin_layer_bwd(res, dy):
    x0v, xkv, w, b, y32 = res
    # The padded forward slices y back to [N, H]; grads recompute padding.
    dx0, dxk, dw, db = _bwd_impl(
        x0v, xkv, w.astype(jnp.float32), y32, dy)
    return (dx0.astype(x0v.dtype), dxk.astype(xkv.dtype),
            dw.astype(w.dtype), db.astype(b.dtype))


cin_layer.defvjp(_cin_layer_fwd, _cin_layer_bwd)


def cin_apply_fused(params, x0: jax.Array) -> jax.Array:
    """Fused-kernel CIN forward → pooled concat [B, Σ_k H_k].

    Drop-in for `interactions.cin_apply` (same params, same math, same
    direct-connect sum-pool over the embedding dim).
    """
    b, f0, d = x0.shape
    x0v = x0.transpose(0, 2, 1).reshape(b * d, f0)
    xkv = x0v
    pooled = []
    for layer in params:
        xkv = cin_layer(x0v, xkv, layer["w"], layer["b"])
        pooled.append(jnp.sum(xkv.reshape(b, d, -1), axis=1))
    return jnp.concatenate(pooled, axis=1)
