"""Device-time benchmark: fused Pallas log-mel kernel vs the XLA path.

Times the frontend alone on a serving-shaped batch with inputs resident
on device (no transfer in the measurement).  Decides VERDICT item 5:
integrate the kernel into the model path or record that XLA fusion
already matches it.

Usage: python tools/bench_logmel.py [batch] [seconds] [reps]
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
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from sed_tpu.config import AUDIO_16K
    from sed_tpu.models.base import _frontend_arrays
    from sed_tpu.dsp import frontend as fe
    from sed_tpu.ops.logmel_kernel import fused_logmel

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    cfg = AUDIO_16K
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5,
                                  (batch, cfg.sample_rate * seconds))
                      .astype(np.float32))

    stft_mat, mel_mat = _frontend_arrays(cfg)

    @jax.jit
    def xla_path(w):
        spec = fe.spectrogram(w, jnp.asarray(stft_mat), cfg.hop_size,
                              center=cfg.center, pad_mode=cfg.pad_mode)
        mel = jnp.matmul(spec, jnp.asarray(mel_mat))
        return fe.power_to_db(mel, ref=cfg.ref, amin=cfg.amin,
                              top_db=cfg.top_db)

    pallas_path = jax.jit(lambda w: fused_logmel(w, cfg))

    results = {}
    for name, fn in [('xla', xla_path), ('pallas', pallas_path)]:
        out = fn(wav)
        out.block_until_ready()         # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(wav).block_until_ready()
            times.append(time.perf_counter() - t0)
        results[name] = min(times)
        print(f'{name:7s}: best {min(times)*1e3:8.3f} ms  '
              f'median {sorted(times)[len(times)//2]*1e3:8.3f} ms '
              f'({batch}x{seconds}s clips)')
    a, b = np.asarray(xla_path(wav)), np.asarray(pallas_path(wav))
    print(f'max |xla - pallas| = {np.abs(a - b).max():.3e}')
    print(f'pallas/xla speed ratio: {results["xla"] / results["pallas"]:.2f}x')


if __name__ == '__main__':
    main()
