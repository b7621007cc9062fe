"""Fused Pallas CIN vs the XLA reference formulation (interpret mode on CPU).

Pins the equivalence that lets the TPU path swap `interactions.cin_apply`
for `pallas_cin.cin_apply_fused` (reference procedure
xdeepfm/xdeepfm.py:135-182).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.ops import interactions, pallas_cin


def _params(key, f0, layer_sizes):
    return interactions.cin_init(key, f0, layer_sizes)


@pytest.mark.parametrize("layer_sizes", [(4,), (5, 3), (20, 10, 10)])
def test_cin_fused_forward_matches_xla(layer_sizes):
    key = jax.random.key(0)
    b, f0, d = 24, 7, 8
    params = _params(key, f0, layer_sizes)
    x0 = jax.random.normal(jax.random.key(1), (b, f0, d), jnp.float32)

    ref = interactions.cin_apply_xla(params, x0)
    got = pallas_cin.cin_apply_fused(params, x0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cin_fused_grads_match_xla():
    key = jax.random.key(2)
    b, f0, d = 16, 6, 4
    layer_sizes = (5, 3)
    params = _params(key, f0, layer_sizes)
    x0 = jax.random.normal(jax.random.key(3), (b, f0, d), jnp.float32)
    # haul through a scalar loss touching every output element unevenly
    w_out = jax.random.normal(jax.random.key(4),
                              (sum(layer_sizes),), jnp.float32)

    def loss_ref(p, x):
        return jnp.sum(interactions.cin_apply_xla(p, x) * w_out)

    def loss_fused(p, x):
        return jnp.sum(pallas_cin.cin_apply_fused(p, x) * w_out)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x0)
    gp_got, gx_got = jax.grad(loss_fused, argnums=(0, 1))(params, x0)

    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for lr, lg in zip(gp_ref, gp_got):
        np.testing.assert_allclose(np.asarray(lg["w"]), np.asarray(lr["w"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lg["b"]), np.asarray(lr["b"]),
                                   rtol=1e-4, atol=1e-5)


def test_cin_fused_row_padding_exact():
    """N=B·D not a multiple of ROW_TILE: padded rows must not leak."""
    key = jax.random.key(5)
    b, f0, d = 3, 5, 7       # N = 21, ROW_TILE = 256
    params = _params(key, f0, (4, 2))
    x0 = jax.random.normal(jax.random.key(6), (b, f0, d), jnp.float32)
    ref = interactions.cin_apply_xla(params, x0)
    got = pallas_cin.cin_apply_fused(params, x0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cin_fused_preserves_bf16_dtype():
    """bf16 primals keep their dtype through forward AND grad (the XLA
    path preserves dtype; the fused path must match — ADVICE r3)."""
    key = jax.random.key(3)
    params = _params(key, 6, (4, 3))
    x0 = jax.random.normal(jax.random.key(4), (8, 6, 4), jnp.bfloat16)
    params_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    out = pallas_cin.cin_apply_fused(params_bf, x0)
    assert out.dtype == jnp.bfloat16

    def loss(p, x):
        return jnp.sum(pallas_cin.cin_apply_fused(p, x).astype(jnp.float32))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params_bf, x0)
    assert gx.dtype == jnp.bfloat16
    for layer in gp:
        assert layer["w"].dtype == jnp.bfloat16
        assert layer["b"].dtype == jnp.bfloat16
