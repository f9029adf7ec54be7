"""Loss functions (``pytorch/losses.py:4-55``).

Numerics match torch ``F.binary_cross_entropy``: log terms are clamped at
-100 so exact 0/1 probabilities don't produce infinities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _bce_elements(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(t * logp + (1.0 - t) * log1p)


def _bce_elements_fwd(p, t):
    return _bce_elements(p, t), (p, t)


def _bce_elements_bwd(res, g):
    # torch clamps the backward denominator at 1e-12; a plain autodiff of
    # the clamped-log forward produces 0 * inf = NaN once a sigmoid
    # saturates to exactly 0.0/1.0 in float32 (logits beyond ~+-17).
    p, t = res
    denom = jnp.maximum(p * (1.0 - p), 1e-12)
    dp = g * (p - t) / denom
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1p = jnp.maximum(jnp.log1p(-p), -100.0)
    dt = g * (log1p - logp)
    return dp, dt


_bce_elements.defvjp(_bce_elements_fwd, _bce_elements_bwd)


def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(_bce_elements(p, t))


def _bce_logits(logits: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    # numerically-stable BCE-with-logits
    return jnp.mean(jnp.maximum(logits, 0) - logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def clip_bce(output_dict: dict, target_dict: dict) -> jnp.ndarray:
    return _bce(output_dict['clipwise_output'], target_dict['target'])


def clip_bce_logits(output_dict: dict, target_dict: dict) -> jnp.ndarray:
    return _bce_logits(output_dict['clipwise_output'], target_dict['target'])


def _truncate_to_min_t(output: jnp.ndarray, target: jnp.ndarray):
    n = min(output.shape[1], target.shape[1])
    return output[:, :n, :], target[:, :n, :]


def frame_bce(output_dict: dict, target_dict: dict) -> jnp.ndarray:
    """Strong framewise BCE; output/target truncated to the common number
    of frames (``pytorch/losses.py:16-28``)."""
    output, target = _truncate_to_min_t(output_dict['framewise_output'],
                                        target_dict['strong_target'])
    return _bce(output, target)


def frame_bce_logits(output_dict: dict, target_dict: dict) -> jnp.ndarray:
    output, target = _truncate_to_min_t(output_dict['framewise_output'],
                                        target_dict['strong_target'])
    return _bce_logits(output, target)


LOSS_REGISTRY = {
    'clip_bce': clip_bce,
    'clip_bce_logits': clip_bce_logits,
    'frame_bce': frame_bce,
    'frame_bce_logits': frame_bce_logits,
}


def get_loss_func(loss_type: str):
    return LOSS_REGISTRY[loss_type]
