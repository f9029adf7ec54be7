"""Interleave raw device_put bandwidth with full engine resident passes
to separate link weather from engine upload inefficiency."""
import os, sys, time, threading, glob
import jax, numpy as np
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_sed'))
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tools')
from sed_tpu.config import AUDIO_16K, PREDICT_SED_PARAMS
from sed_tpu.data import audio_io
from sed_tpu.models.registry import get_model
from sed_tpu.serve.engine import SedInferenceEngine
from sed_tpu.utils.npz_ckpt import load_variables_npz
import bench

cfg = AUDIO_16K
model = get_model('Cnn_9layers_Gru_FrameAtt', cfg)
variables = load_variables_npz('/root/repo/tools/bench_checkpoint.npz')
eng = SedInferenceEngine(model, variables, cfg, sample_duration=5,
                         overlap=True, sed_params=PREDICT_SED_PARAMS,
                         batch_size=512, launch_group=2, pull_format='topk')
N = 4096
clips = bench.make_test_clips(N, cfg.sample_rate)
import tempfile
td = tempfile.mkdtemp(prefix='sed_probeab_')
paths, read = bench.write_wire_files(clips, cfg.sample_rate, 'q6', td)
names = [f'c{i}.wav' for i in range(N)]
print('setup done', flush=True)

raw = np.random.randint(0, 255, (128, 1024, 1024), np.uint8)
def raw_bw():
    chunks = np.array_split(raw, 4)
    outs = [None]*4
    def up(i): outs[i] = jax.device_put(chunks[i])
    t0 = time.time()
    ths = [threading.Thread(target=up, args=(i,)) for i in range(4)]
    for t in ths: t.start()
    for t in ths: t.join()
    jax.block_until_ready(outs)
    return 128/(time.time()-t0)

# also: engine pass from PRE-STACKED buffer (no file reads) to isolate
# the file-read pipeline cost
buf = audio_io.qn_encode(clips[:512], 6)
full = np.concatenate([buf]*8, axis=0)   # 4096 x wire, same bytes

eng.predict_files_resident(paths, read, names=names, upload_threads=4)  # warm
for rep in range(4):
    b0 = raw_bw()
    t0 = time.time(); eng.predict_files_resident(paths, read, names=names, upload_threads=4)
    dt_files = time.time()-t0
    b1 = raw_bw()
    t0 = time.time(); eng.predict_clips_resident(full, names=names, upload_threads=4)
    dt_buf = time.time()-t0
    b2 = raw_bw()
    print(f'rep{rep}: raw {b0:.0f} MB/s | files-pass {dt_files:.2f}s '
          f'({251/dt_files:.0f} MB/s) | raw {b1:.0f} | buf-pass {dt_buf:.2f}s '
          f'({251/dt_buf:.0f} MB/s) | raw {b2:.0f}', flush=True)
for p in paths: os.unlink(p)
os.rmdir(td)
