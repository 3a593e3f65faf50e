"""Separation-quality metrics.

The reference computes none (BASELINE.md: no SI-SDR/SDR anywhere); the
framework ships its own evaluator since SI-SDR parity is the fidelity target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def si_sdr(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR in dB over the last axis (Le Roux et al. 2019)."""
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    alpha = jnp.sum(estimate * target, axis=-1, keepdims=True) / (
        jnp.sum(target**2, axis=-1, keepdims=True) + eps
    )
    projection = alpha * target
    noise = estimate - projection
    ratio = jnp.sum(projection**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def sdr(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Plain SDR in dB over the last axis."""
    num = jnp.sum(target**2, axis=-1)
    den = jnp.sum((estimate - target) ** 2, axis=-1) + eps
    return 10.0 * jnp.log10(num / den + eps)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)
