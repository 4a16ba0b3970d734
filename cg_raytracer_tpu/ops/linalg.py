"""Small batched vector-math helpers (last-axis xyz convention).

Everything operates on arrays whose trailing axis is 3 and broadcasts over leading
axes — the building blocks the reference gets from glm (dot/cross/normalize/reflect),
vectorized for ray batches.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a, eps: float = 0.0):
    n = norm(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n[..., None]


def safe_normalize(a, eps: float = 1e-20):
    return normalize(a, eps=eps)


def reflect(incident, normal):
    """glm::reflect: I - 2*dot(N, I)*N."""
    return incident - 2.0 * dot(normal, incident)[..., None] * normal
