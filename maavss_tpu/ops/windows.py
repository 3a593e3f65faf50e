"""Window functions with torch parity.

The reference uses `torch.hamming_window(fft_len)` (av_dataset.py:106), which
is *periodic* (N-point DFT-even): w[n] = 0.54 - 0.46 cos(2*pi*n / N).
"""

from __future__ import annotations

import jax.numpy as jnp


def hamming_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    denom = n if periodic else n - 1
    k = jnp.arange(n, dtype=dtype)
    return (0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * k / denom)).astype(dtype)


def hann_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    denom = n if periodic else n - 1
    k = jnp.arange(n, dtype=dtype)
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / denom)).astype(dtype)
