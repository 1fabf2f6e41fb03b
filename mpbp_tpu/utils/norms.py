"""Error norms (reference utils.py:7-26), vectorized over field dicts."""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def _flat(x):
    if isinstance(x, Mapping):
        return jnp.concatenate([jnp.ravel(v) for _, v in sorted(x.items())])
    return jnp.ravel(x)


def weighted_l2(a, b, w: float) -> jax.Array:
    """sqrt(sum(w * (a-b)^2)) with w = dx*dy (reference utils.py:7-9)."""
    q = _flat(a) - _flat(b)
    return jnp.sqrt(jnp.sum(w * q * q))


def weighted_l1(a, b, w: float) -> jax.Array:
    """sum(w * |a-b|) (reference utils.py:11-14)."""
    q = jnp.abs(_flat(a) - _flat(b))
    return jnp.sum(w * q)


def max_norm(a, b) -> jax.Array:
    """max |a-b| (reference utils.py:16-17)."""
    return jnp.max(jnp.abs(_flat(a) - _flat(b)))


def norms_report(approx, exact, dx: float, dy: float) -> dict:
    """All three norms at once (reference utils.py:19-26 print_norms)."""
    return {
        "l1": float(weighted_l1(approx, exact, dx * dy)),
        "l2": float(weighted_l2(approx, exact, dx * dy)),
        "max": float(max_norm(approx, exact)),
    }
