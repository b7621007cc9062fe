"""Pallas kernels vs numpy/XLA oracles (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.ops import pallas_kernels as pk


def _oracle_scatter(ids, g, num_rows):
    out = np.zeros((num_rows, g.shape[-1]), np.float32)
    np.add.at(out, ids.reshape(-1), g.reshape(-1, g.shape[-1]))
    return out


@pytest.mark.parametrize("n,w,v", [
    (1024, 17, 2048),          # aligned
    (1000, 16, 1000),          # ragged rows + ragged N
    (4096, 8, 512),            # many duplicates (N >> V)
    (64, 17, 4096),            # sparse touch (N << V)
])
def test_embedding_grad_matches_dense_oracle(n, w, v, rng):
    ids = rng.integers(0, v, size=n).astype(np.int32)
    g = rng.standard_normal((n, w)).astype(np.float32)
    got = np.asarray(pk.embedding_grad(jnp.asarray(ids), jnp.asarray(g), v))
    want = _oracle_scatter(ids, g, v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_embedding_grad_2d_ids(rng):
    b, f, w, v = 64, 39, 17, 4096
    ids = rng.integers(0, v, size=(b, f)).astype(np.int32)
    g = rng.standard_normal((b, f, w)).astype(np.float32)
    got = np.asarray(pk.embedding_grad(jnp.asarray(ids), jnp.asarray(g), v))
    want = _oracle_scatter(ids, g, v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lookup_vjp_matches_xla_autodiff(rng):
    v, w, b, f = 1024, 16, 32, 7
    table = rng.standard_normal((v, w)).astype(np.float32)
    ids = rng.integers(0, v, size=(b, f)).astype(np.int32)

    def loss_pallas(t):
        e = pk.embedding_lookup_vjp(t, jnp.asarray(ids))
        return jnp.sum(jnp.sin(e) * e)

    def loss_xla(t):
        e = jnp.take(t, jnp.asarray(ids), axis=0)
        return jnp.sum(jnp.sin(e) * e)

    g_pallas = jax.grad(loss_pallas)(jnp.asarray(table))
    g_xla = jax.grad(loss_xla)(jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-5)


def test_lookup_forward_is_gather(rng):
    v, w = 256, 4
    table = rng.standard_normal((v, w)).astype(np.float32)
    ids = rng.integers(0, v, size=(8, 3)).astype(np.int32)
    got = pk.embedding_lookup_vjp(jnp.asarray(table), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), table[ids])


def test_embedding_grad_jit_and_in_scan(rng):
    """The kernel must survive jit + lax.scan (the fast training path)."""
    v, w, n, k = 512, 8, 256, 3
    ids = rng.integers(0, v, size=(k, n)).astype(np.int32)
    g = rng.standard_normal((k, n, w)).astype(np.float32)

    @jax.jit
    def run(ids, g):
        def body(acc, xs):
            i, gg = xs
            return acc + pk.embedding_grad(i, gg, v), 0
        acc, _ = jax.lax.scan(body, jnp.zeros((v, w)), (ids, g))
        return acc

    got = np.asarray(run(jnp.asarray(ids), jnp.asarray(g)))
    want = sum(_oracle_scatter(ids[i], g[i], v) for i in range(k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_embedding_grad_T_matches_row_major(rng):
    """Transposed scatter == row-major scatter transposed == numpy oracle."""
    from recsys_tpu.ops import pallas_kernels as pk

    v_pad, w, n = 2048, 17, 4096
    gids = jnp.asarray(rng.integers(0, v_pad - 5, n, dtype=np.int32))
    g = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    out_t = pk.embedding_grad_T(gids, g, v_pad)
    assert out_t.shape == (w, v_pad)
    oracle = np.zeros((v_pad, w), np.float32)
    np.add.at(oracle, np.asarray(gids), np.asarray(g))
    np.testing.assert_allclose(np.asarray(out_t), oracle.T, rtol=1e-5,
                               atol=1e-5)
    row = pk.embedding_grad(gids, g, v_pad)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(row).T,
                               rtol=1e-6, atol=1e-6)


def test_lookup_wm_vjp_roundtrip(rng):
    """W-major gather forward == take on the transpose; its VJP == the
    transposed scatter of the cotangent."""
    from recsys_tpu.ops import pallas_kernels as pk

    v_pad, w, n = 1024, 9, 2048
    table_wm = jnp.asarray(rng.normal(size=(w, v_pad)).astype(np.float32))
    gids = jnp.asarray(rng.integers(0, v_pad, n, dtype=np.int32))
    rows = pk.embedding_lookup_wm_vjp(table_wm, gids)
    np.testing.assert_allclose(np.asarray(rows),
                               np.asarray(table_wm).T[np.asarray(gids)])

    ct = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    f = lambda t: jnp.vdot(pk.embedding_lookup_wm_vjp(t, gids), ct)
    grad = jax.grad(f)(table_wm)
    oracle = np.zeros((v_pad, w), np.float32)
    np.add.at(oracle, np.asarray(gids), np.asarray(ct))
    np.testing.assert_allclose(np.asarray(grad), oracle.T, rtol=1e-5,
                               atol=1e-5)
