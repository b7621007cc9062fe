"""Hand-written Pallas TPU kernels for the framework's hot ops.

The profile of every Criteo CTR model in the zoo (DeepFM and friends,
tools/profile_step.py) is dominated by the embedding-table
gather/scatter-add pair — XLA's TPU scatter emitter processes the 319k
duplicate row-updates of a [8192, 39]-id batch essentially serially
(~5 ms/step, >80% of step time). These kernels replace that path with an
MXU formulation:

**sorted_segment_scatter** — embedding-gradient accumulation as tiled
one-hot matmuls. The flat update stream (ids [N], grads [N, W]) is sorted
by row id (XLA sort); the wrapper derives a static-size work-item list
``(tile, chunk)`` covering, for every TILE_V-row table tile, exactly the
sorted-id chunks that overlap it (≤ chunks + tiles items in total — each
chunk/tile boundary crossing adds one). The kernel walks the work items;
Pallas block pipelining streams the id/grad chunks, and each item runs

    out_tile[TILE_V, W] += onehot(local_ids)[TILE_V, C] @ grads[C, W]

on the MXU, with the output tile kept resident in VMEM across consecutive
items of the same tile (revisited block). Duplicate ids are just multiple
matching one-hot columns, so segment summation falls out of the matmul —
no atomics, no serial row loop.

Reference behavior replaced: the backward pass of
``tf.feature_column.embedding_column`` lookups (fm/fm.py:88-95,
deepfm/deepfm.py:41-49) — TF's C++ sparse-apply kernels are the moral
equivalent (SURVEY §2.2 row 1).

`embedding_lookup_vjp` wires the kernel into autodiff as the backward of
the packed-table gather (forward stays XLA's native gather). Models opt in
via the fused embedding engine; CPU tests run the same kernel in
interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per table tile and sorted updates per chunk. A [TILE_V, CHUNK]
# one-hot times a [CHUNK, W] grad block is one MXU pass. Kernel FLOPs scale
# as N·TILE_V + V·CHUNK (every chunk crosses ~N/V·TILE_V tiles; every tile
# pays ≥1 item): at Criteo scale (V≈838k rows, N≈229k updates) the V·CHUNK
# term dominates, so a SMALLER chunk with a larger tile is strictly better
# — swept on v5e at batch 16384: (512,1024) 1.41M ex/s end-to-end,
# (1024,512) 1.50M, (1024,256) 1.54M (best), (2048,128) 1.47M.
TILE_V = 1024
CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, SURVEY §4c)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# sorted_segment_scatter
# ---------------------------------------------------------------------------


def _scatter_kernel(tile_s, chunk_s, flags_s, ids_ref, g_ref, out_ref):
    s = pl.program_id(0)
    flags = flags_s[s]
    is_first = flags & 1
    live = flags & 2

    @pl.when(is_first != 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(live != 0)
    def _():
        base = tile_s[s] * TILE_V
        # ids arrive as a [1, 8, CHUNK] block (8 chunks per block to satisfy
        # the (8, 128) tiling); select this item's chunk row by masked sum.
        sub = chunk_s[s] % 8
        rows = ids_ref[0]                                   # [8, C]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 0) == sub)
        local = jnp.sum(jnp.where(sel, rows, 0), axis=0) - base   # [C]
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_V, CHUNK), 0
        )
        onehot = (local[None, :] == row_iota).astype(jnp.float32)
        out_ref[:, :] += jnp.dot(onehot, g_ref[:, :],
                                 preferred_element_type=jnp.float32)


def _work_items(offsets: jax.Array, n_tiles: int, n_chunks: int):
    """Static-size (tile, chunk, flags) work-item arrays from the sorted
    stream's per-tile [start, end) offsets.

    Item s covers (tile t, chunk c): every tile emits at least one item
    (possibly dead, to zero its output block); a tile whose range spans k
    chunks emits k. Total live items ≤ n_chunks + n_tiles, hence the static
    bound. flags bit0 = first item of tile (zero the block), bit1 = live.
    """
    s_max = n_chunks + n_tiles
    start, end = offsets[:-1], offsets[1:]
    c_lo = start // CHUNK
    c_hi = jnp.where(end > start, (end - 1) // CHUNK, c_lo)
    count = jnp.where(end > start, c_hi - c_lo + 1, 1)      # ≥1 per tile
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(count).astype(jnp.int32)]
    )
    total = starts[-1]
    s_ids = jnp.arange(s_max, dtype=jnp.int32)
    t_of_s = (
        jnp.searchsorted(starts, s_ids, side="right").astype(jnp.int32) - 1
    )
    t_of_s = jnp.clip(t_of_s, 0, n_tiles - 1)
    j = s_ids - starts[t_of_s]
    c_of_s = jnp.clip(c_lo[t_of_s] + j, 0, n_chunks - 1)
    in_range = s_ids < total
    live = in_range & (end[t_of_s] > start[t_of_s])
    first = in_range & (j == 0)
    flags = first.astype(jnp.int32) + 2 * live.astype(jnp.int32)
    return t_of_s, c_of_s, flags


def sorted_segment_scatter(
    sid: jax.Array,       # [Npad] int32, SORTED ascending; pad id ≥ num_rows_pad
    sg: jax.Array,        # [Npad, W] float32, grads in sorted order
    offsets: jax.Array,   # [T+1] int32 searchsorted tile starts
    num_rows_pad: int,    # table rows, multiple of TILE_V
) -> jax.Array:
    """Σ of sorted updates per row → [num_rows_pad, W] dense grad table."""
    npad, w = sg.shape
    assert npad % (8 * CHUNK) == 0 and num_rows_pad % TILE_V == 0
    n_tiles = num_rows_pad // TILE_V
    n_chunks = npad // CHUNK

    t_of_s, c_of_s, flags = _work_items(offsets, n_tiles, n_chunks)
    s_max = int(t_of_s.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_max,),
        in_specs=[
            pl.BlockSpec((1, 8, CHUNK), lambda s, t, c, f: (c[s] // 8, 0, 0)),
            pl.BlockSpec((CHUNK, w), lambda s, t, c, f: (c[s], 0)),
        ],
        out_specs=pl.BlockSpec((TILE_V, w), lambda s, t, c, f: (t[s], 0)),
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_pad, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_max * TILE_V * CHUNK * w,
            bytes_accessed=npad * (4 + 4 * w) + num_rows_pad * 4 * w,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(t_of_s, c_of_s, flags, sid.reshape(n_chunks // 8, 8, CHUNK), sg)


def embedding_grad(
    gids: jax.Array,      # [...] int32 row ids (any shape)
    g: jax.Array,         # [..., W] float32 cotangents for the gathered rows
    num_rows: int,
) -> jax.Array:
    """Dense [num_rows, W] gradient of a packed-table gather: sort the flat
    update stream, locate tile ranges, run the Pallas scatter."""
    w = g.shape[-1]
    flat_ids = gids.reshape(-1)
    flat_g = g.reshape(-1, w).astype(jnp.float32)
    n = flat_ids.shape[0]
    v_pad = _round_up(num_rows, TILE_V)
    n_pad = _round_up(n, 8 * CHUNK)

    sid, order = jax.lax.sort_key_val(
        flat_ids, jnp.arange(n, dtype=jnp.int32)
    )
    sg = jnp.take(flat_g, order, axis=0)

    if n_pad != n:
        sid = jnp.concatenate(
            [sid, jnp.full((n_pad - n,), v_pad, jnp.int32)]
        )
        sg = jnp.concatenate([sg, jnp.zeros((n_pad - n, w), jnp.float32)])

    bounds = (jnp.arange(v_pad // TILE_V + 1, dtype=jnp.int32) * TILE_V)
    offsets = jnp.searchsorted(sid, bounds, side="left").astype(jnp.int32)

    out = sorted_segment_scatter(sid, sg, offsets, v_pad)
    return out[:num_rows]


# ---------------------------------------------------------------------------
# Autodiff wiring: packed-table gather whose backward is the Pallas scatter
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lookup(table: jax.Array, gids: jax.Array, num_rows: int) -> jax.Array:
    return jnp.take(table, gids, axis=0)


def _lookup_fwd(table, gids, num_rows):
    return jnp.take(table, gids, axis=0), gids


def _lookup_bwd(num_rows, gids, ct):
    return embedding_grad(gids, ct, num_rows), None


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def embedding_lookup_vjp(table: jax.Array, gids: jax.Array) -> jax.Array:
    """[B, F] packed global ids → [B, F, W] rows. Forward = XLA gather;
    backward = `embedding_grad` (Pallas tiled one-hot scatter)."""
    return _lookup(table, gids, table.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_flat(table_flat, gids, num_rows, width):
    # NOTE (measured dead end): gathering (1, W) slices from a
    # [V/64, 64·W] view of the flat table — which would avoid the per-step
    # flat→[V, W] relayout entirely — is ~50× slower end-to-end; XLA's TPU
    # gather emitter only runs at full rate on whole-minor-dim row
    # gathers. The reshape+row-gather below is the fast formulation.
    return jnp.take(table_flat.reshape(num_rows, width), gids, axis=0)


def _lookup_flat_fwd(table_flat, gids, num_rows, width):
    return _lookup_flat(table_flat, gids, num_rows, width), gids


def _lookup_flat_bwd(num_rows, width, gids, ct):
    # reshape to flat HERE so the optimizer math downstream runs on the
    # dense 1-D layout — a 2-D [V, 17] cotangent would drag every Adam
    # elementwise pass onto the lane-padded T(8,128) layout (7.5x traffic).
    # The barrier stops XLA from fusing that math back into the padded-2D
    # producer side of the relayout copy (measured: 2 extra [V,17] padded
    # passes, ~2 ms/step at batch 8192 without it).
    flat = embedding_grad(gids, ct, num_rows).reshape(-1)
    return jax.lax.optimization_barrier(flat), None


_lookup_flat.defvjp(_lookup_flat_fwd, _lookup_flat_bwd)


def embedding_lookup_flat_vjp(table_flat: jax.Array, gids: jax.Array,
                              num_rows: int, width: int) -> jax.Array:
    """Flat-stored [V·W] table + [B, F] ids → [B, F, W] rows. Forward = XLA
    gather on the 2-D view; backward = Pallas scatter, returned flat."""
    return _lookup_flat(table_flat, gids, num_rows, width)


# ---------------------------------------------------------------------------
# W-major (transposed) table path: storage [W, V_pad], no relayouts.
#
# Profiling the row-major flat storage (tools/profile_step.py, batch 16384)
# showed the table LAYOUT — not the gather/scatter math — dominating the
# embedding path: the per-step flat→[V,17] reshape materializes the table in
# a 128-lane-padded tiling (7.5× physical bytes, ~430 MB) and XLA follows it
# with a second {1,0}→{0,1} copy for the gather operand (~1.9 ms/step), and
# the backward re-pays both around the scatter output (~1.7 ms/step). A
# [W, V_pad] array tiles (8,128) with V on dense lanes — 24/17 ≈ 1.4× pad
# instead of 7.5× — and it is ALREADY the physical layout the gather wants
# (an [V, W]{0,1} operand ≡ [W, V]{1,0}), so the forward needs no table
# copy at all and the backward writes its gradient directly in the storage
# layout via the transposed kernel below.
# ---------------------------------------------------------------------------


def _scatter_kernel_T(tile_s, chunk_s, flags_s, ids_ref, g_ref, out_ref):
    s = pl.program_id(0)
    flags = flags_s[s]
    is_first = flags & 1
    live = flags & 2

    @pl.when(is_first != 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(live != 0)
    def _():
        base = tile_s[s] * TILE_V
        sub = chunk_s[s] % 8
        rows = ids_ref[0]                                   # [8, C]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 0) == sub)
        local = jnp.sum(jnp.where(sel, rows, 0), axis=0) - base   # [C]
        col_iota = jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, TILE_V), 1
        )
        onehot = (local[:, None] == col_iota).astype(jnp.float32)
        # out[W, TILE_V] += gT[W, C] @ onehot[C, TILE_V] — grads arrive
        # pre-transposed so this is a plain MXU matmul with the dense
        # TILE_V columns on the output lanes
        out_ref[:, :] += jnp.dot(g_ref[:, :], onehot,
                                 preferred_element_type=jnp.float32)


def sorted_segment_scatter_T(
    sid: jax.Array,       # [Npad] int32, SORTED ascending; pad id ≥ num_rows_pad
    sgT: jax.Array,       # [Wp, Npad] float32, grads in sorted order,
                          # PRE-TRANSPOSED; Wp a multiple of 8 (sublanes)
    offsets: jax.Array,   # [T+1] int32 searchsorted tile starts
    num_rows_pad: int,    # table rows, multiple of TILE_V
) -> jax.Array:
    """Σ of sorted updates per row → [Wp, num_rows_pad] W-major grad
    table. Wp rides the SUBLANE dim of every block, so it must be a
    granule multiple (callers pad W→Wp and slice after)."""
    w, npad = sgT.shape
    assert npad % (8 * CHUNK) == 0 and num_rows_pad % TILE_V == 0
    assert w % 8 == 0, "sublane dim must be a multiple of 8 — pad W first"
    n_tiles = num_rows_pad // TILE_V
    n_chunks = npad // CHUNK

    t_of_s, c_of_s, flags = _work_items(offsets, n_tiles, n_chunks)
    s_max = int(t_of_s.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_max,),
        in_specs=[
            pl.BlockSpec((1, 8, CHUNK), lambda s, t, c, f: (c[s] // 8, 0, 0)),
            pl.BlockSpec((w, CHUNK), lambda s, t, c, f: (0, c[s])),
        ],
        out_specs=pl.BlockSpec((w, TILE_V), lambda s, t, c, f: (0, t[s])),
    )
    return pl.pallas_call(
        _scatter_kernel_T,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w, num_rows_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_max * TILE_V * CHUNK * w,
            bytes_accessed=npad * (4 + 4 * w) + num_rows_pad * 4 * w,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(t_of_s, c_of_s, flags, sid.reshape(n_chunks // 8, 8, CHUNK), sgT)


def embedding_grad_T(
    gids: jax.Array,      # [...] int32 row ids (any shape)
    g: jax.Array,         # [..., W] float32 cotangents for the gathered rows
    num_rows_pad: int,    # multiple of TILE_V (the stored table's V dim)
) -> jax.Array:
    """W-major [W, num_rows_pad] gradient of a W-major-table gather."""
    w = g.shape[-1]
    w_pad = _round_up(w, 8)   # output-block sublane granule
    flat_ids = gids.reshape(-1)
    flat_g = g.reshape(-1, w).astype(jnp.float32)
    n = flat_ids.shape[0]
    n_pad = _round_up(n, 8 * CHUNK)

    sid, order = jax.lax.sort_key_val(
        flat_ids, jnp.arange(n, dtype=jnp.int32)
    )
    sg = jnp.take(flat_g, order, axis=0)

    if n_pad != n:
        sid = jnp.concatenate(
            [sid, jnp.full((n_pad - n,), num_rows_pad, jnp.int32)]
        )
        sg = jnp.concatenate([sg, jnp.zeros((n_pad - n, w), jnp.float32)])
    if w_pad != w:
        sg = jnp.pad(sg, ((0, 0), (0, w_pad - w)))

    bounds = (jnp.arange(num_rows_pad // TILE_V + 1, dtype=jnp.int32)
              * TILE_V)
    offsets = jnp.searchsorted(sid, bounds, side="left").astype(jnp.int32)
    # pre-transpose the sorted grads: [Npad, Wp] → [Wp, Npad] puts Npad on
    # dense lanes (cheap, ~1.4× the logical bytes) and makes the kernel's
    # per-item contraction a plain matmul
    out = sorted_segment_scatter_T(sid, sg.T, offsets, num_rows_pad)
    return out[:w]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lookup_wm(table_wm: jax.Array, gids: jax.Array) -> jax.Array:
    # transpose is a layout-bitcast: [W, V]{1,0} IS [V, W]{0,1}, the
    # gather-preferred operand layout — no table copy materializes
    return jnp.take(table_wm.T, gids, axis=0)


def _lookup_wm_fwd(table_wm, gids):
    return _lookup_wm(table_wm, gids), (gids, table_wm.shape[1])


def _lookup_wm_bwd(res, ct):
    gids, v_pad = res
    # barrier: the cotangent arrives as a fusion of interior-padded slice
    # transposes (the engine's emb/wide lane splits); letting XLA fuse that
    # chain into the sort/take operands of the scatter SIGABRTs the TPU
    # compiler at batch≥16k (reduced repro: wide-grad + fm-sum-grad through
    # one lookup). Materializing ct first keeps the kernel operands simple.
    ct = jax.lax.optimization_barrier(ct)
    return embedding_grad_T(gids, ct, v_pad), None


_lookup_wm.defvjp(_lookup_wm_fwd, _lookup_wm_bwd)


def embedding_lookup_wm_vjp(table_wm: jax.Array, gids: jax.Array) -> jax.Array:
    """W-major [W, V_pad] table + [...] packed ids → [..., W] rows.
    Forward = XLA gather on the transpose VIEW (no copy); backward =
    `embedding_grad_T` (Pallas transposed scatter, grads land in the
    storage layout)."""
    return _lookup_wm(table_wm, gids)
