"""Head-to-head parity tests against the ACTUAL reference implementations.

These import the mounted reference checkout (``/root/reference``) — pure
numpy/scipy modules — and assert output equality on randomized inputs,
making the strongest parity evidence (previously judge-only spot checks)
reproducible.  Skipped entirely when the checkout is absent.

Oracles exercised:
  * ``utils/vad.py`` — the dual-threshold event decoder (the spec for
    ``sed_tpu/post/vad.py``).
  * ``utils/gammatone`` — the vendored Heeris gammatone toolkit (the spec
    for ``sed_tpu/dsp/gammatone.py``).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, 'utils')),
                                reason='reference checkout not present')


@pytest.fixture(scope='module')
def ref_vad():
    spec = importlib.util.spec_from_file_location(
        'ref_vad', os.path.join(REF, 'utils', 'vad.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_gt():
    sys.path.insert(0, os.path.join(REF, 'utils'))
    try:
        import gammatone.fftweight as fftweight
        import gammatone.filters as filters
        import gammatone.gtgram as gtgram
    finally:
        sys.path.pop(0)
    return filters, gtgram, fftweight


# ---------------------------------------------------------------------------
# vad.activity_detection
# ---------------------------------------------------------------------------

def test_activity_detection_head_to_head(ref_vad):
    """600 randomized tracks through both decoders; outputs must be
    byte-identical wherever the reference itself doesn't crash (it raises
    IndexError on some inputs — the rebuild handles those)."""
    from sed_tpu.post.vad import activity_detection

    rng = np.random.RandomState(0)
    n_ref_crashes = 0
    n_compared = 0
    for i in range(600):
        t = int(rng.randint(5, 260))
        # mix smooth and spiky tracks so runs of every length appear
        if rng.rand() < 0.5:
            x = rng.rand(t)
        else:
            x = np.clip(np.cumsum(rng.randn(t)) * 0.1 + 0.5, 0, 1)
        thres = float(rng.uniform(0.2, 0.9))
        low = None if rng.rand() < 0.3 else float(
            rng.uniform(0.05, thres))
        n_smooth = int(rng.randint(0, 13))
        n_salt = int(rng.randint(0, 13))

        got = activity_detection(x, thres, low, n_smooth, n_salt)
        try:
            want = ref_vad.activity_detection(x, thres, low,
                                              n_smooth, n_salt)
        except IndexError:
            n_ref_crashes += 1
            assert isinstance(got, list)  # ours must still decode
            continue
        assert [list(map(int, p)) for p in got] == \
            [list(map(int, p)) for p in want], (
                f'case {i}: thres={thres} low={low} '
                f'n_smooth={n_smooth} n_salt={n_salt}')
        n_compared += 1
    assert n_compared >= 500, (n_compared, n_ref_crashes)


def test_activity_detection_binary_head_to_head(ref_vad):
    """Vote-count decoder (``utils/vad.py:47-106``) head-to-head."""
    from sed_tpu.post.vad import activity_detection_binary

    rng = np.random.RandomState(1)
    n_compared = 0
    for i in range(200):
        overlap_value, sample_duration = [
            (0.5, 6), (0.5, 7), (1, 5), (1, 6), (1, 7)][i % 5]
        t = 100 * 10  # 10 s of frames at 100 fps
        votes = rng.randint(0, 8, t).astype(np.float64)
        thres = float(rng.uniform(0.5, 4.0))
        n_smooth = int(rng.randint(0, 11))
        n_salt = int(rng.randint(0, 11))
        got = activity_detection_binary(votes, overlap_value,
                                        sample_duration, thres,
                                        n_smooth=n_smooth, n_salt=n_salt)
        try:
            want = ref_vad.activity_detection_binary(
                votes, overlap_value, sample_duration, thres,
                n_smooth=n_smooth, n_salt=n_salt)
        except IndexError:
            continue
        assert [list(map(int, p)) for p in got] == \
            [list(map(int, p)) for p in want], f'case {i}'
        n_compared += 1
    assert n_compared >= 150


# ---------------------------------------------------------------------------
# gammatone toolkit
# ---------------------------------------------------------------------------

def test_erb_filter_design_head_to_head(ref_gt):
    from sed_tpu.dsp import gammatone as gt
    filters, _, _ = ref_gt

    for fs, n, cutoff in [(16000, 64, 50), (32000, 64, 50), (8000, 31, 20)]:
        cfs_got = gt.centre_freqs(fs, n, cutoff)
        cfs_want = filters.centre_freqs(fs, n, cutoff)
        np.testing.assert_allclose(cfs_got, cfs_want, rtol=0, atol=1e-9)
        np.testing.assert_allclose(
            gt.make_erb_filters(fs, cfs_got),
            filters.make_erb_filters(fs, cfs_want), rtol=1e-12, atol=0)


def test_erb_filterbank_and_gtgram_head_to_head(ref_gt):
    from sed_tpu.dsp import gammatone as gt
    filters, gtgram_mod, _ = ref_gt

    rng = np.random.RandomState(2)
    fs = 16000
    wave = rng.uniform(-0.5, 0.5, fs // 2)       # 0.5 s
    cfs = filters.centre_freqs(fs, 16, 100)
    coefs = filters.make_erb_filters(fs, cfs)
    np.testing.assert_allclose(
        gt.erb_filterbank(wave, np.asarray(coefs)),
        filters.erb_filterbank(wave, coefs), rtol=1e-9, atol=1e-12)

    got = gt.gtgram(wave, fs, 0.025, 0.010, 16, 100)
    want = gtgram_mod.gtgram(wave, fs, 0.025, 0.010, 16, 100)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_fft_weights_and_fft_gtgram_head_to_head(ref_gt):
    from sed_tpu.dsp import gammatone as gt
    _, _, fftweight = ref_gt

    nfft, fs, nfilts = 1024, 16000, 64
    got_w, got_g = gt.fft_weights(nfft, fs, nfilts, 1, 50, fs / 2,
                                  nfft / 2 + 1)
    want_w, want_g = fftweight.fft_weights(nfft, fs, nfilts, 1, 50, fs / 2,
                                           nfft / 2 + 1)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(got_g, want_g, rtol=1e-10, atol=0)

    rng = np.random.RandomState(3)
    wave = rng.uniform(-0.5, 0.5, 2 * fs)        # 2 s
    got = gt.fft_gtgram(wave, fs, 0.025, 0.010, nfilts, 50)
    want = fftweight.fft_gtgram(wave, fs, 0.025, 0.010, nfilts, 50)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


# ---------------------------------------------------------------------------
# TrainSampler RNG stream
# ---------------------------------------------------------------------------

def test_train_sampler_stream_head_to_head(tmp_path):
    """Bit-exact batch-meta stream vs the actual reference TrainSampler
    (``utils/data_generator.py:52-101``), across reshuffle boundaries.
    The reference module's heavy imports (sed_eval via utilities,
    matplotlib) are stubbed."""
    import types
    import h5py
    from sed_tpu.data.dataset import TrainSampler

    stubs = {}
    if 'utilities' not in sys.modules:
        fake = types.ModuleType('utilities')
        fake.int16_to_float32 = lambda x: (x / 32767.0)
        stubs['utilities'] = fake
    if 'config' not in sys.modules:
        stubs['config'] = types.ModuleType('config')
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        mpl = types.ModuleType('matplotlib')
        mpl.pyplot = types.ModuleType('matplotlib.pyplot')
        stubs['matplotlib'] = mpl
        stubs['matplotlib.pyplot'] = mpl.pyplot
    sys.modules.update(stubs)
    sys.path.insert(0, os.path.join(REF, 'utils'))
    try:
        import data_generator as ref_dg
    finally:
        sys.path.pop(0)
        for k in stubs:
            sys.modules.pop(k, None)

    path = str(tmp_path / 'train.h5')
    with h5py.File(path, 'w') as hf:
        hf.create_dataset('audio_name',
                          data=[f'c{i}.wav'.encode() for i in range(11)])

    for batch_size in (4, 7):
        ours = iter(TrainSampler(path, batch_size))
        theirs = iter(ref_dg.TrainSampler(path, batch_size))
        for _ in range(40):      # > 10 reshuffles of the 11-item stream
            a = next(ours)
            b = next(theirs)
            assert [m['index_in_hdf5'] for m in a] == \
                [int(m['index_in_hdf5']) for m in b]
