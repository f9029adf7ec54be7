"""Tunnel link microbenchmark: fixed costs and bandwidths that bound the
serving e2e number (recorded in BENCHMARKS.md).

Measures, on the attached device: dispatch+sync latency of a trivial op,
small/large pull (d2h) times, upload (h2d) times, and aggregate h2d
bandwidth scaling with concurrent device_put streams (PJRT releases the
GIL during transfers, so chunk RPCs overlap across threads).
"""
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_sed'))


def main():
    print('device:', jax.devices()[0])

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8,))
    jax.block_until_ready(tiny(x))
    big_np = np.random.randint(0, 255, (64, 1024, 1024), np.uint8)
    big = jax.device_put(big_np)
    jax.block_until_ready(big)

    for tag, fn in [
        ('tiny dispatch+sync', lambda: jax.block_until_ready(tiny(x))),
        ('tiny pull (32B)', lambda: np.asarray(tiny(x))),
        ('pull 1MB', lambda: np.asarray(tiny(big[0, :, :1]))),
        ('pull 16MB', lambda: np.asarray(tiny(big[:16, :, :1]))),
        ('upload 64MB + arrive', lambda: jax.block_until_ready(
            jax.device_put(big_np))),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        print(f'{tag}: {ts}')

    total_mb = 128
    data = np.random.randint(0, 255, (total_mb, 1024, 1024), np.uint8)
    for k in (1, 2, 4, 8, 1):
        chunks = np.array_split(data, k)
        outs = [None] * k

        def up(i):
            outs[i] = jax.device_put(chunks[i])

        t0 = time.time()
        ths = [threading.Thread(target=up, args=(i,)) for i in range(k)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f'upload {total_mb}MB, threads={k}: {dt:.2f}s = '
              f'{total_mb / dt:.0f} MB/s')
        del outs


if __name__ == '__main__':
    main()
