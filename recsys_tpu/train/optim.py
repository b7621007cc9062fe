"""Optimizers: Adam (TF-parity) and FTRL-proximal, as pure pytree updates.

Self-contained (init, update) pairs in the optax style but with a state
layout that is a plain mirror of the params tree — this keeps sharding-spec
construction for the SPMD path trivial (mu/nu inherit the exact
PartitionSpec of their parameter).

- `adam` reproduces ``tf.train.AdamOptimizer`` (deepfm/deepfm.py:142)
  *exactly*: update = lr·√(1−β2ᵗ)/(1−β1ᵗ) · m / (√v + ε̂) — note TF keeps a
  single ε̂ outside the bias correction, unlike optax's ε-inside-denominator
  variant; the difference is tiny but this removes one source of drift in
  parity runs.
- `ftrl` is the FTRL-proximal update of ftrl/ftrl.py:153-181 (z/n
  accumulators, lazy L1/L2 weights), vectorized over dense tensors — the
  optimizer behind the reference's canned LinearClassifier as well.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Any
    update: Any   # update(grads, state, params) -> (new_params, new_state)


class AdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> Optimizer:
    def init(params) -> AdamState:
        zeros = lambda p: jnp.zeros_like(p)
        return AdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(grads, state: AdamState, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        new_params = jax.tree.map(
            lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + eps),
            params, mu, nu,
        )
        return new_params, AdamState(count, mu, nu)

    return Optimizer(init, update)


class FtrlState(NamedTuple):
    z: Any   # per-weight z accumulator (ftrl/ftrl.py:50 "z: weights")
    n: Any   # per-weight squared-gradient sum


def ftrl(alpha: float = 0.1, beta: float = 1.0, l1: float = 1.0,
         l2: float = 1.0) -> Optimizer:
    """FTRL-proximal. ``params`` here are the *lazy* weights w derived from
    (z, n) (ftrl/ftrl.py:109-151); update() recomputes them after each step
    so models can keep treating params as plain tensors."""

    def weights_from(z, n):
        sign = jnp.sign(z)
        w = (sign * l1 - z) / ((beta + jnp.sqrt(n)) / alpha + l2)
        return jnp.where(jnp.abs(z) <= l1, 0.0, w)

    def init(params) -> FtrlState:
        return FtrlState(
            z=jax.tree.map(jnp.zeros_like, params),
            n=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state: FtrlState, params):
        def upd(z, n, g, w):
            sigma = (jnp.sqrt(n + g * g) - jnp.sqrt(n)) / alpha
            z_new = z + g - sigma * w
            n_new = n + g * g
            return z_new, n_new

        zs_ns = jax.tree.map(
            lambda z, n, g, w: upd(z, n, g, w), state.z, state.n, grads,
            params,
        )
        z_new = jax.tree.map(lambda t: t[0], zs_ns,
                             is_leaf=lambda t: isinstance(t, tuple) and len(t) == 2
                             and isinstance(t[0], jax.Array))
        n_new = jax.tree.map(lambda t: t[1], zs_ns,
                             is_leaf=lambda t: isinstance(t, tuple) and len(t) == 2
                             and isinstance(t[0], jax.Array))
        new_params = jax.tree.map(weights_from, z_new, n_new)
        return new_params, FtrlState(z_new, n_new)

    return Optimizer(init, update)
