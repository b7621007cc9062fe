"""PRNG handling: one root key per run, folded per-purpose and per-step."""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def for_step(key: jax.Array, step) -> jax.Array:
    """Per-step dropout/sampling key — fold the step counter in so the
    train step stays a pure function of (params, batch, step)."""
    return jax.random.fold_in(key, step)


def split_tree(key: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}
