"""A/B the resident pass at different corpus sizes N (same process,
interleaved draws, same link phases).

Motivation (round 4): clips/s = N / (N*bytes/bw + F).  At the observed
mid-window ~45 MB/s with the 41 KB adpcm4 wire the asymptote is
~1100 clips/s but N=4096 reaches only ~870 — the fixed overhead F
(compute + pull RPC + sync, ~1 s) is 21% of the pass.  Doubling N
halves F's share IF F itself stays flat.  This tool measures F(N)
directly: interleaved A/B passes at each N with raw-link probes
between, reporting per-pass telemetry (upload/launch/pull/decode) so
the F growth (bigger topk pull, longer host decode) is attributable.

Usage: python tools/bench_corpus_scaling.py [--sizes 4096,8192]
       [--reps 3] [--wire adpcm4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='4096,8192')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--wire', default='adpcm4')
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--threads', type=int, default=4)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(',')]

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_sed'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from bench import (make_test_clips, encode_wire,
                       measure_raw_link_mb_s)
    from sed_tpu.config import AUDIO_16K, PREDICT_SED_PARAMS
    from sed_tpu.models.registry import get_model
    from sed_tpu.serve.engine import SedInferenceEngine
    from sed_tpu.utils.npz_ckpt import load_variables_npz

    cfg = AUDIO_16K
    sr = cfg.sample_rate
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'bench_checkpoint.npz')
    variables = load_variables_npz(ckpt)
    model = get_model('Cnn_9layers_Gru_FrameAtt', cfg,
                      compute_dtype=jnp.bfloat16)
    engine = SedInferenceEngine(model, variables, cfg,
                                sample_duration=5, overlap=True,
                                batch_size=args.batch,
                                sed_params=PREDICT_SED_PARAMS,
                                pull_format='topk')

    n_max = max(sizes)
    print(f'# generating {n_max} clips', flush=True)
    clips = make_test_clips(n_max, sr)
    wire = encode_wire(clips, args.wire)
    del clips
    print(f'# wire {args.wire}: {wire.shape[1]} B/clip', flush=True)
    for n in sizes:
        engine.warmup_resident(n, wire.shape[1], wire.dtype,
                               args.threads)
        print(f'# warm N={n}', flush=True)

    results = {n: [] for n in sizes}
    for rep in range(args.reps):
        for n in sizes:
            bw = measure_raw_link_mb_s(8)
            tel = {}
            t0 = time.time()
            per_clip, _ = engine.predict_clips_resident(
                wire[:n], upload_threads=args.threads, telemetry=tel)
            dt = time.time() - t0
            ev = sum(len(e) for e in per_clip)
            results[n].append((rep, dt, bw))
            print(f'N={n} rep={rep}: {dt:.2f}s = {n/dt:.1f} clips/s '
                  f'(probe {bw:.1f} MB/s, pull {tel.get("pull_s")}s, '
                  f'decode {tel.get("decode_s")}s, events {ev})',
                  flush=True)

    # F from adjacent same-rep pairs: on this tunnel device_put returns
    # before bytes cross (the wait surfaces in the pull), so the only
    # honest decomposition is pairwise — bw = dBytes/dT between the two
    # corpus sizes of one rep, then F = dt - N*b/bw for each.
    print('# summary: N best_clips/s; pairwise F estimates below')
    for n in sizes:
        best = min(d for _, d, _ in results[n])
        print(f'N={n}: best {n/best:.1f} clips/s', flush=True)
    b = wire.shape[1]
    for rep in range(args.reps):
        for a, c in zip(sizes, sizes[1:]):
            da = next(d for r, d, _ in results[a] if r == rep)
            dc = next(d for r, d, _ in results[c] if r == rep)
            if dc <= da:
                print(f'rep {rep} pair ({a},{c}): phase moved '
                      f'(dt {da:.2f} -> {dc:.2f}), skipped')
                continue
            bw_pair = (c - a) * b / (dc - da)
            f_est = da - a * b / bw_pair
            print(f'rep {rep} pair ({a},{c}): pass bw '
                  f'{bw_pair/2**20:.1f} MB/s, F ~ {f_est:.2f}s',
                  flush=True)


if __name__ == '__main__':
    main()
