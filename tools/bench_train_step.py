"""Device-time benchmark of the jitted joint train step.

WARNING (21 Aug, reproduced): on the tunneled backend
``block_until_ready`` can return PRE-COMPLETION, making this host-
chained timer read ~50x low (0.6 ms/step vs the true 34 ms).  For
valid readings use ``tools/bench_device_time.py train`` (in-jit
fori_loop chaining + a d2h value pull); this tool remains useful on
local backends where the sync is honest.

The end-to-end s/step on the tunneled chip is dominated by the link
(BENCHMARKS.md); this tool isolates pure device compute: batches are
made resident on device first, then N steps are dispatched back-to-back
(async) and timed to the final ``block_until_ready``.  Optionally
compares the bfloat16 conv-stack compute path.

Usage: python tools/bench_train_step.py [batch] [reps] [model_type]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_sed'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      0.0)  # cache EVERYTHING: a cache hit skips the
    # remote-compile relay entirely, and its slow-queue windows make
    # even a trivial 1-op probe jit cost 20+ min when missed
    import jax.numpy as jnp
    from sed_tpu import losses
    from sed_tpu.config import AUDIO_16K, CLASSES_NUM
    from sed_tpu.models.registry import get_model
    from sed_tpu.train.state import create_train_state
    from sed_tpu.train.step import make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    model_type = sys.argv[3] if len(sys.argv) > 3 else \
        'Cnn_9layers_Gru_FrameAtt'

    cfg = AUDIO_16K
    sr = cfg.sample_rate
    rng = np.random.RandomState(0)
    # the reference's joint scheme: weak batch x3, strong x1, mixup
    # doubles both (main_strong.py:230-236) -> pairs stay even
    nw, ns = 6 * batch, 2 * batch
    weak = {
        'waveform': rng.randint(-2000, 2000, (nw, sr * 10))
        .astype(np.int16),
        'target': (rng.rand(nw, CLASSES_NUM) > 0.8).astype(np.float32),
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

    want = os.environ.get('BENCH_DTYPES', 'f32,bf16').split(',')
    for tag, compute_dtype in (('f32', None), ('bf16', jnp.bfloat16)):
        if tag not in want:
            continue
        model = get_model(model_type, cfg, compute_dtype=compute_dtype)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, sr * 10), jnp.float32))
        step = make_train_step(model, losses.clip_bce, losses.frame_bce,
                               mixup=True, timeshift=True,
                               spec_augment=True, donate=False)
        weak_d = jax.device_put(weak)
        strong_d = jax.device_put(strong)
        keys = [jax.random.PRNGKey(i) for i in range(reps)]

        state, metrics = step(state, weak_d, strong_d, keys[0])
        jax.block_until_ready(metrics)          # compile + warm
        best = None
        for _ in range(3):                      # best pass beats phase noise
            t0 = time.perf_counter()
            for i in range(reps):
                state, metrics = step(state, weak_d, strong_d, keys[i])
            jax.block_until_ready((state, metrics))
            dt = (time.perf_counter() - t0) / reps
            best = dt if best is None else min(best, dt)
            print(f'  pass: {dt * 1e3:.2f} ms/step', flush=True)
        dt = best
        print(f'{model_type} {tag}: {dt * 1e3:.2f} ms/step device '
              f'({nw}+{ns} clips/step -> '
              f'{(nw + ns) / dt:.0f} clips/s trained), '
              f'loss={float(metrics["loss"]):.4f}')


if __name__ == '__main__':
    main()
