"""Jitted train / eval steps over a device mesh.

One compiled step does what the reference's hot loop does per iteration
(``pytorch/main_strong.py:346-406``): forward the weak batch and the
strong batch in train mode (SpecAugment / mixup / timeshift on-device),
mix the targets with the same lambdas, sum ``weak_clip_bce +
strong_frame_bce``, and take an AMSGrad step.  Under ``jit`` with the
batch sharded over the ``data`` mesh axis and parameters replicated, XLA
inserts the gradient all-reduce over ICI automatically — the TPU-native
replacement for ``torch.nn.DataParallel``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from sed_tpu.augment import functional as aug
from sed_tpu.parallel import mesh as mesh_lib
from sed_tpu.train.state import SedTrainState


def make_train_step(model, weak_loss_func: Callable,
                    strong_loss_func: Callable, mixup: bool,
                    timeshift: bool, spec_augment: bool,
                    mesh=None, donate: bool = True,
                    state_sharding=None):
    """Build a jitted joint weak+strong train step.

    Returns ``step(state, weak_batch, strong_batch, rng) ->
    (state, metrics)``.  Batch dicts: weak {'waveform', 'target'
    [, 'mixup_lambda']}, strong {'waveform', 'strong_target'
    [, 'mixup_lambda']}; an optional extra strong stream (FSD50K,
    ``pytorch/main_strong.py:238-247``) can be passed as
    ``strong_batch={'streams': [...]}`` — here we accept a list.
    """

    def _forward(params, batch_stats, batch, rng):
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        k1, k2 = jax.random.split(rng)
        lam = batch.get('mixup_lambda') if mixup else None
        wav = batch['waveform']
        if wav.dtype == jnp.int16:
            # int16 PCM shipped as-is from the HDF5 (half the host->device
            # bytes); dequantized on device (hdf5_pack.int16_to_float32)
            wav = wav.astype(jnp.float32) / 32767.0
        out, mutated = model.apply(
            variables, wav, train=True,
            mixup_lambda=lam, timeshift=timeshift,
            spec_augment=spec_augment,
            rngs={'dropout': k1, 'augment': k2},
            mutable=['batch_stats'])
        return out, mutated.get('batch_stats'), lam

    def loss_fn(params, batch_stats, weak_batch, strong_batches, rng):
        rngs = jax.random.split(rng, 1 + len(strong_batches))
        out_w, batch_stats, lam_w = _forward(params, batch_stats,
                                             weak_batch, rngs[0])
        target_w = weak_batch['target']
        if lam_w is not None:
            target_w = aug.do_mixup(target_w, lam_w)
        weak_loss = weak_loss_func(out_w, {'target': target_w})

        strong_loss = 0.0
        for batch, k in zip(strong_batches, rngs[1:]):
            out_s, batch_stats, lam_s = _forward(params, batch_stats,
                                                 batch, k)
            target_s = batch['strong_target']
            if lam_s is not None:
                target_s = aug.do_mixup(target_s, lam_s)
            strong_loss = strong_loss + strong_loss_func(
                out_s, {'strong_target': target_s})

        loss = weak_loss + strong_loss
        return loss, (batch_stats, weak_loss, strong_loss)

    def step(state: SedTrainState, weak_batch: dict, strong_batches,
             rng) -> tuple:
        if isinstance(strong_batches, dict):
            strong_batches = [strong_batches]
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (batch_stats, weak_loss, strong_loss)), grads = grad_fn(
            state.params, state.batch_stats, weak_batch, strong_batches,
            rng)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=batch_stats)
        metrics = {'loss': loss, 'weak_loss': weak_loss,
                   'strong_loss': strong_loss}
        return state, metrics

    if mesh is not None:
        replicated = mesh_lib.replicated_sharding(mesh)
        sharded = mesh_lib.batch_sharding(mesh)
        # state_sharding (e.g. from parallel.mesh.fsdp_shardings) pins
        # parameter/optimizer shards; default is replicated params
        state_in = state_sharding if state_sharding is not None \
            else replicated
        return jax.jit(
            step,
            in_shardings=(state_in, sharded, sharded, replicated),
            out_shardings=(state_in, replicated),
            donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Jitted eval forward returning the full output dict."""

    @jax.jit
    def step(params, batch_stats, waveform):
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        return model.apply(variables, waveform, train=False)

    return step
