"""Trustworthy device-time measurement: in-jit chained iterations.

Round-3 finding: chaining jitted calls from the HOST and trusting
``block_until_ready`` produced physically impossible readings on the
axon tunnel (e.g. 0.23 ms for a 256x5s-clip forward = ~16 PFLOP/s,
~80x chip peak; the same methodology said a 24+8-clip train step runs
in 0.63 ms = ~4 PFLOP/s).  The tunnel's block_until_ready evidently
returns before the chip finishes.  The in-jit frontend benchmark
(tools/bench_logmel.py, 200 fori_loop-chained iterations) produced a
plausible 27 TFLOP/s in the same sessions — so the fix is to chain
INSIDE one jit and force completion by pulling a scalar that depends on
every iteration:

* one jit program runs N data-dependent iterations (``lax.fori_loop``
  whose carry feeds iteration i+1 from iteration i's output);
* the timed quantity is t(N) - t(1), cancelling dispatch + pull
  overhead;
* completion is forced by ``np.asarray`` of a scalar reduced from the
  final carry — real bytes must cross d2h, which no async runtime can
  fabricate early;
* XLA's own ``cost_analysis()['flops']`` is printed alongside, with the
  implied sustained TFLOP/s — any reading implying more than ~400
  TFLOP/s on a single chip is flagged as a measurement artifact.

Usage:
  python tools/bench_device_time.py forward [batch] [n] [model_type]
  python tools/bench_device_time.py train   [batch] [n] [model_type]
  python tools/bench_device_time.py decode  [batch] [n] [wire]
    wire in {adpcm4, adpcm4_scan, q6, q5, q4, mulaw8, int16}: chained
    device dequant of a (batch, wire_width) buffer — the A/B for the
    associative-scan vs sequential-scan ADPCM decode lives here.

NB: this targets the real chip (remote compiler + persistent cache).
On the 1-vCPU host, XLA-compiling the N-iteration fwd+bwd loop takes
>30 min — `train` mode is impractical on CPU (the chain was verified to
trace/lower there; `forward` mode smoke-passes on CPU).

``BENCH_DTYPES=f32,bf16`` selects compute dtypes (default both).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS_FLAG = 400.0          # > this implies the timer is lying


def _timed_call(fn, args, n_attr):
    """Best-of-3 wall time of fn(*args), completion forced via a d2h
    value pull of the scalar result."""
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        val = float(np.asarray(out))          # forces real completion
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, val


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_sed'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from jax import lax
    from sed_tpu.config import AUDIO_16K, CLASSES_NUM
    from sed_tpu.models.registry import get_model

    mode = sys.argv[1] if len(sys.argv) > 1 else 'forward'
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else \
        (256 if mode == 'forward' else 4)
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    model_type = sys.argv[4] if len(sys.argv) > 4 else \
        'Cnn_9layers_Gru_FrameAtt'
    cfg = AUDIO_16K
    sr = cfg.sample_rate
    rng = np.random.RandomState(0)

    if mode == 'decode':
        from sed_tpu.data import audio_io
        from sed_tpu.ops import wire as wire_ops
        wire = sys.argv[4] if len(sys.argv) > 4 else 'adpcm4'
        samples = sr * 5
        clips = (rng.rand(batch, samples).astype(np.float32) - 0.5)
        if wire.startswith('adpcm4'):
            # adpcm4 | adpcm4_assoc | adpcm4_scan | adpcm4_scanK
            # (K = unroll factor, e.g. adpcm4_scan42)
            buf = audio_io.adpcm_encode(clips)
            if '_scan' in wire:
                k = int(wire.split('_scan')[1] or '1')
                decode = lambda w: wire_ops._adpcm_decode_scan(  # noqa
                    w, samples, unroll=k)
            elif wire.endswith('_assoc'):
                decode = lambda w: wire_ops._adpcm_decode_assoc(  # noqa
                    w, samples)
            else:
                decode = lambda w: wire_ops._adpcm_decode(    # noqa
                    w, samples)
        else:
            if wire.startswith('q'):
                buf = audio_io.qn_encode(clips, int(wire[1]))
            elif wire == 'mulaw8':
                buf = audio_io.mulaw_encode(clips)
            else:
                buf = (np.clip(clips, -1, 1) * 32767).astype(np.int16)
            decode = lambda w: wire_ops.dequant_wire(      # noqa: E731
                w, samples)

        def chained(w, k):
            def body(i, carry):
                out = decode(carry)
                # data dependency XLA cannot elide: adds a runtime zero
                # derived from the decoded samples to the wire bytes
                bump = (out[0, 0] * jnp.float32(1e-30)).astype(w.dtype)
                return carry + bump
            final = lax.fori_loop(0, k, body, w)
            return decode(final).sum()

        f1 = jax.jit(lambda w: chained(w, 1))
        fn = jax.jit(lambda w: chained(w, n))
        args = (jax.device_put(buf),)
        t1, _ = _timed_call(f1, args, 1)
        tn, _ = _timed_call(fn, args, n)
        per_iter = (tn - t1) / (n - 1)
        print(f'decode {wire}: {per_iter * 1e3:.3f} ms/iter '
              f'({batch} clips/iter -> {batch / per_iter:.0f} clips/s '
              f'decode-only)')
        print(f'  raw: t(1)={t1 * 1e3:.1f} ms, t({n})={tn * 1e3:.1f} ms')
        return

    want = os.environ.get('BENCH_DTYPES', 'f32,bf16').split(',')
    for tag, compute_dtype in (('f32', None), ('bf16', jnp.bfloat16)):
        if tag not in want:
            continue
        model = get_model(model_type, cfg, compute_dtype=compute_dtype)

        if mode == 'forward':
            wavs = rng.uniform(-0.5, 0.5, (batch, sr * 5)) \
                .astype(np.float32)
            variables = model.init(jax.random.PRNGKey(0), wavs[:1],
                                   train=False)

            def chained(w, k):
                def body(i, carry):
                    out = model.apply(variables, carry, train=False)
                    # data dependency: next input is perturbed by this
                    # iteration's mean probability (cannot be elided)
                    return w + out['clipwise_output'].mean() * 1e-6
                final = lax.fori_loop(0, k, body, w)
                return final.sum()

            f1 = jax.jit(lambda w: chained(w, 1))
            fn = jax.jit(lambda w: chained(w, n))
            args = (jax.device_put(wavs),)
            clips_per_iter = batch
        elif mode == 'train':
            from sed_tpu import losses
            from sed_tpu.train.state import create_train_state
            from sed_tpu.train.step import make_train_step
            nw, ns = 6 * batch, 2 * batch
            weak = {
                'waveform': rng.randint(-2000, 2000, (nw, sr * 10))
                .astype(np.int16),
                'target': (rng.rand(nw, CLASSES_NUM) > 0.8)
                .astype(np.float32),
                'mixup_lambda': np.repeat(rng.rand(nw // 2), 2)
                .astype(np.float32),
            }
            strong = {
                'waveform': rng.randint(-2000, 2000, (ns, sr * 10))
                .astype(np.int16),
                'strong_target': (rng.rand(ns, 1000, CLASSES_NUM) > 0.9)
                .astype(np.float32),
                'mixup_lambda': np.repeat(rng.rand(ns // 2), 2)
                .astype(np.float32),
            }
            state0 = create_train_state(
                model, jax.random.PRNGKey(0),
                jnp.zeros((1, sr * 10), jnp.float32))
            step = make_train_step(model, losses.clip_bce,
                                   losses.frame_bce, mixup=True,
                                   timeshift=True, spec_augment=True,
                                   donate=False)

            def chained(state, w, s, k):
                def body(i, carry):
                    st, _ = carry
                    st, metrics = step(st, w, s,
                                       jax.random.fold_in(
                                           jax.random.PRNGKey(1), i))
                    return (st, metrics['loss'])
                st, loss = lax.fori_loop(0, k, body,
                                         (state, jnp.float32(0)))
                return loss

            f1 = jax.jit(lambda st, w, s: chained(st, w, s, 1))
            fn = jax.jit(lambda st, w, s: chained(st, w, s, n))
            args = (state0, jax.device_put(weak), jax.device_put(strong))
            clips_per_iter = nw + ns
        else:
            raise SystemExit(f'unknown mode {mode}')

        # XLA's own FLOP estimate for the N-iteration program
        try:
            cost = fn.lower(*args).compile().cost_analysis()
            flops_n = float(cost.get('flops', float('nan')))
        except Exception as e:                      # noqa: BLE001
            print(f'cost_analysis unavailable: {e}')
            flops_n = float('nan')

        t1, _ = _timed_call(f1, args, 1)
        tn, _ = _timed_call(fn, args, n)
        per_iter = (tn - t1) / (n - 1)
        flops_iter = flops_n / n
        tflops = flops_iter / per_iter / 1e12
        print(f'{model_type} {mode} {tag}: {per_iter * 1e3:.2f} ms/iter '
              f'({clips_per_iter} clips/iter -> '
              f'{clips_per_iter / per_iter:.0f} clips/s), '
              f'XLA {flops_iter / 1e9:.1f} GFLOP/iter, '
              f'implied {tflops:.2f} TFLOP/s'
              + ('  [ARTIFACT? exceeds plausible chip peak]'
                 if tflops > PEAK_TFLOPS_FLAG else ''))
        print(f'  raw: t(1)={t1 * 1e3:.1f} ms, t({n})={tn * 1e3:.1f} ms')


if __name__ == '__main__':
    main()
