"""Functional, PRNG-keyed augmentation.

The reference mutates spectrogram batches in-place with per-sample Python
loops (``pytorch/augmentation.py:8-53``) and rolls with host-drawn shifts
(``pytorch/pytorch_utils.py:97-138``).  Here everything is a pure function
of an explicit key, vectorized over the batch, and jit/pjit-safe.

Distribution parity:
* SpecAugment: per sample, 2 time stripes of width U[0, 64) and 2 freq
  stripes of width U[0, 8), start U[0, total - width) — zeroed.
* mixup: beta(1, 1) per consecutive pair; batch halves
  (``pytorch_utils.py:81-95``).
* timeshift: one roll of int(N(0, 90)) frames for the whole batch
  (``pytorch_utils.py:121-138``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _drop_stripes(key: jax.Array, x: jnp.ndarray, axis: int,
                  drop_width: int, stripes_num: int) -> jnp.ndarray:
    """Zero ``stripes_num`` random stripes along ``axis`` per sample.

    x: (B, T, F, C) — axis 1 (time) or 2 (freq).
    """
    total = x.shape[axis]
    b = x.shape[0]
    k1, k2 = jax.random.split(key)
    # torch.randint(0, drop_width) then randint(0, total - distance)
    dist = jax.random.randint(k1, (b, stripes_num), 0, drop_width)
    # uniform in [0, total - dist): draw u in [0,1) and scale (exact
    # distribution of randint with a data-dependent high bound)
    u = jax.random.uniform(k2, (b, stripes_num))
    bgn = jnp.floor(u * (total - dist)).astype(jnp.int32)

    pos = jnp.arange(total)                                   # (total,)
    # mask[b, t] = any stripe covers t
    covered = ((pos[None, None, :] >= bgn[:, :, None]) &
               (pos[None, None, :] < (bgn + dist)[:, :, None]))
    keep = ~jnp.any(covered, axis=1)                          # (B, total)
    shape = [1] * x.ndim
    shape[0] = b
    shape[axis] = total
    return x * keep.reshape(shape).astype(x.dtype)


def spec_augment(key: jax.Array, x: jnp.ndarray,
                 time_drop_width: int = 64, time_stripes_num: int = 2,
                 freq_drop_width: int = 8, freq_stripes_num: int = 2
                 ) -> jnp.ndarray:
    """SpecAugment on (B, T, F, C) log-mel batches."""
    kt, kf = jax.random.split(key)
    x = _drop_stripes(kt, x, 1, time_drop_width, time_stripes_num)
    x = _drop_stripes(kf, x, 2, freq_drop_width, freq_stripes_num)
    return x


def do_mixup(x: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Mix consecutive pairs: out[i] = x[2i]*lam[2i] + x[2i+1]*lam[2i+1].

    Halves the leading batch axis, like ``pytorch_utils.py:81-95``.
    """
    shape = (-1,) + (1,) * (x.ndim - 1)
    lam = lam.astype(x.dtype).reshape(shape)
    return x[0::2] * lam[0::2] + x[1::2] * lam[1::2]


def do_timeshift(key: jax.Array, x: jnp.ndarray, axis: int = 1,
                 mean: float = 0.0, std: float = 90.0) -> jnp.ndarray:
    """Roll the whole batch along the time axis by int(N(mean, std)).

    ``int()`` truncates toward zero like the reference
    (``pytorch_utils.py:124``) — draws in (-1, 1) all map to shift 0, a
    double-width zero bin that rounding would not reproduce.
    """
    shift = jnp.trunc(mean + std * jax.random.normal(key)).astype(jnp.int32)
    return jnp.roll(x, shift, axis=axis)


def do_mixup_timeshift(key: jax.Array, x: jnp.ndarray, lam: jnp.ndarray,
                       axis: int = 1) -> jnp.ndarray:
    """Timeshift then mixup (``pytorch_utils.py:97-119``)."""
    return do_mixup(do_timeshift(key, x, axis=axis), lam)


def mixup_lambda(key: jax.Array, batch_size: int,
                 alpha: float = 1.0) -> jnp.ndarray:
    """Device-side mixup coefficients: beta(alpha, alpha) per pair,
    expanded to (lam, 1-lam) per consecutive sample pair."""
    lam = jax.random.beta(key, alpha, alpha, (batch_size // 2,))
    out = jnp.stack([lam, 1.0 - lam], axis=1).reshape(-1)
    return out


class MixupGenerator:
    """Host-side seeded mixup-lambda generator with the reference's exact
    RNG stream (``utils/utilities.py:375-397``: np.RandomState(1234),
    beta per pair)."""

    def __init__(self, mixup_alpha: float = 1.0, random_seed: int = 1234):
        self.mixup_alpha = mixup_alpha
        self.random_state = np.random.RandomState(random_seed)

    def get_lambda(self, batch_size: int) -> np.ndarray:
        lams = []
        for _ in range(0, batch_size, 2):
            lam = self.random_state.beta(self.mixup_alpha, self.mixup_alpha,
                                         1)[0]
            lams.append(lam)
            lams.append(1.0 - lam)
        return np.array(lams)
