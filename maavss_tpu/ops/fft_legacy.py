"""Legacy full-clip FFT frontend (the DataGenerator path).

Capability parity with generator.py:60-149: plain (non-short-time) FFT over a
whole audio window with the mirrored half dropped, real/imag channel packing,
optional polar form, and the "center_fft" bin-interleave trick (even bins
flipped to the left half, odd bins on the right, generator.py:117-133). Used
by the `main.py` / `DataGenerator` legacy training regime.

All ops are batched jnp over `[..., N]` / `[..., 2, N]` layouts.
"""

from __future__ import annotations

import jax.numpy as jnp


def fft_half(audio: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """audio [..., N] -> complex [..., N//2]: full FFT, mirrored half dropped
    (generator.py:60-68). `normalize` = torch norm='forward' (1/N)."""
    f = jnp.fft.fft(audio, axis=-1, norm="forward" if normalize else "backward")
    return f[..., : f.shape[-1] // 2]


def ifft_half(fft: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Inverse of `fft_half`: zero-pads the mirror half back
    (generator.py:70-81 — zeros, not the conjugate mirror; reproduced)."""
    full = jnp.concatenate([fft, jnp.zeros_like(fft)], axis=-1)
    audio = jnp.fft.ifft(full, axis=-1, norm="forward" if normalize else "backward")
    return jnp.real(audio)


def complex_to_ri(fft: jnp.ndarray) -> jnp.ndarray:
    """complex [..., N] -> [..., 2, N] real/imag channels (generator.py:97-103)."""
    return jnp.stack([jnp.real(fft), jnp.imag(fft)], axis=-2)


def ri_to_complex(ri: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, N] -> complex [..., N] (generator.py:105-110)."""
    return ri[..., 0, :] + 1j * ri[..., 1, :]


def cartesian_to_polar(fft: jnp.ndarray) -> jnp.ndarray:
    """complex [..., N] -> [..., 2, N] (mag, phase) channels
    (generator.py:84-86 concatenates on the last axis; we use the channel
    layout consistently with complex_to_ri — the reference's polar path is
    internally inconsistent and crashes, §2.5)."""
    return jnp.stack([jnp.abs(fft), jnp.angle(fft)], axis=-2)


def polar_to_cartesian(polar: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, N] (mag, phase) -> [..., 2, N] (real, imag)."""
    mag, ang = polar[..., 0, :], polar[..., 1, :]
    c = mag * jnp.exp(1j * ang)
    return jnp.stack([jnp.real(c), jnp.imag(c)], axis=-2)


def center_fft_bins(ri: jnp.ndarray) -> jnp.ndarray:
    """Interleave trick: even bins flipped into the left half, odd bins right
    (generator.py:117-124), concentrating low-freq energy at the center."""
    left = jnp.flip(ri[..., ::2], axis=-1)
    right = ri[..., 1::2]
    return jnp.concatenate([left, right], axis=-1)


def decenter_fft_bins(ri: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `center_fft_bins` (generator.py:126-133)."""
    n = ri.shape[-1]
    left = jnp.flip(ri[..., : n // 2], axis=-1)
    right = ri[..., n // 2:]
    out = jnp.zeros_like(ri)
    out = out.at[..., ::2].set(left)
    out = out.at[..., 1::2].set(right)
    return out


def process_fft(audio: jnp.ndarray, normalize: bool = True, polar: bool = False,
                center: bool = False) -> jnp.ndarray:
    """audio [..., N] -> features [..., 2, N//2] (generator.py:312-328 path)."""
    f = fft_half(audio, normalize)
    ri = cartesian_to_polar(f) if polar else complex_to_ri(f)
    if center:
        ri = center_fft_bins(ri)
    return ri


def inference_to_audio(ri: jnp.ndarray, normalize: bool = True,
                       polar: bool = False, center: bool = False) -> jnp.ndarray:
    """features [..., 2, N//2] -> audio [..., N] (generator.py:135-149)."""
    if polar:
        ri = polar_to_cartesian(ri)
    if center:
        ri = decenter_fft_bins(ri)
    return ifft_half(ri_to_complex(ri), normalize)
