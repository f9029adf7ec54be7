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


# ---------------------------------------------------------------------------
# full event pipeline: utils/utilities.py frame_prediction_to_event_* +
# merge/avg_merge, head-to-head on randomized output_dicts
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_utilities():
    """Import the ACTUAL reference ``utils/utilities.py`` with its heavy
    unavailable deps (librosa, sed_eval, prettytable) stubbed — the event
    pipeline under test is pure numpy + vad."""
    import types
    stubs = {}
    for name in ('librosa', 'sed_eval', 'prettytable'):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == 'prettytable':
                mod.PrettyTable = object
            stubs[name] = mod
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
        import utilities as ref_util
    finally:
        sys.path.pop(0)
        for k in stubs:
            sys.modules.pop(k, None)
    return ref_util


def _random_framewise(rng, n, t, c):
    """Mix smooth and spiky tracks so runs of every length appear (same
    generator family as the vad head-to-head).

    The final frame is forced silent: the reference's
    ``find_bgn_fin_pairs`` emits ``bgn = loct + 1`` (``vad.py:118-121``),
    so a run starting at the last frame indexes past the end inside
    ``activity_detection_with_second_thres`` — an IndexError in ~17% of
    unconstrained tracks, which compounds to ~100% across a 75-track
    corpus.  The single-track head-to-heads above cover those crashy
    inputs; here the corpus-level plumbing is under test."""
    out = np.empty((n, t, c))
    for i in range(n):
        for k in range(c):
            if rng.rand() < 0.5:
                out[i, :, k] = rng.rand(t)
            else:
                out[i, :, k] = np.clip(
                    np.cumsum(rng.randn(t)) * 0.1 + 0.5, 0, 1)
    out[:, -1, :] = 0.0
    return out


def _random_params(rng, c):
    """Scalar or per-class-list sed params, like the shipped pickles."""
    if rng.rand() < 0.5:
        return {
            'audio_tagging_threshold': float(rng.uniform(0.05, 0.9)),
            'sed_high_threshold': float(rng.uniform(0.3, 0.9)),
            'sed_low_threshold': float(rng.uniform(0.05, 0.3)),
            'n_smooth': int(rng.randint(0, 13)),
            'n_salt': int(rng.randint(0, 13)),
        }
    return {
        'audio_tagging_threshold': list(rng.uniform(0.05, 0.9, c)),
        'sed_high_threshold': list(rng.uniform(0.3, 0.9, c)),
        'sed_low_threshold': list(rng.uniform(0.05, 0.3, c)),
        'n_smooth': [int(v) for v in rng.randint(0, 13, c)],
        'n_salt': [int(v) for v in rng.randint(0, 13, c)],
    }


def test_frame_prediction_to_event_prediction_head_to_head(ref_utilities):
    """>=200 randomized output_dicts through the ACTUAL reference
    ``frame_prediction_to_event_prediction`` (``utilities.py:82-153``) and
    ``sed_tpu.post.events`` — event lists must be exactly equal
    (filenames, labels, float onsets/offsets, order)."""
    import sed_tpu.post.events as events
    from sed_tpu.config import LABELS

    rng = np.random.RandomState(100)
    c = len(LABELS)
    n_compared = 0
    for i in range(220):
        n = int(rng.randint(1, 4))
        t = int(rng.randint(20, 260))
        framewise = _random_framewise(rng, n, t, c)
        names = [f'corpus{i}_clip{j}.wav' for j in range(n)]
        output_dict = {'audio_name': names,
                       'clipwise_output': rng.rand(n, c),
                       'framewise_output': framewise}
        params = _random_params(rng, c)
        got = events.frame_prediction_to_event_prediction(
            output_dict, dict(params), frames_per_second=100)
        try:
            want = ref_utilities.frame_prediction_to_event_prediction(
                output_dict, dict(params), frames_per_second=100)
        except IndexError:
            # the reference's activity_detection crashes on some tracks
            assert isinstance(got, list)
            continue
        assert got == want, f'corpus {i}'
        n_compared += 1
    assert n_compared >= 200, n_compared


def test_frame_prediction_to_event_prediction_v2_head_to_head(
        ref_utilities):
    """Single-file variant (``utilities.py:155-214``) head-to-head."""
    import sed_tpu.post.events as events
    from sed_tpu.config import LABELS

    rng = np.random.RandomState(101)
    c = len(LABELS)
    n_compared = 0
    for i in range(120):
        t = int(rng.randint(20, 600))
        framewise = _random_framewise(rng, 1, t, c)
        params = _random_params(rng, c)
        got = events.frame_prediction_to_event_prediction_v2(
            framewise, f'file{i}.wav', dict(params),
            frames_per_second=100)
        try:
            want = \
                ref_utilities.frame_prediction_to_event_prediction_v2(
                    framewise, f'file{i}.wav', dict(params),
                    frames_per_second=100)
        except IndexError:
            assert isinstance(got, list)
            continue
        assert got == want, f'file {i}'
        n_compared += 1
    assert n_compared >= 100, n_compared


def test_frame_binary_prediction_to_event_prediction_head_to_head(
        ref_utilities):
    """Voting-pipeline decode (``utilities.py:216-276``) head-to-head on
    randomized vote-count grids across the reference's
    param_combinations grid."""
    import sed_tpu.post.events as events
    from sed_tpu.config import LABELS

    rng = np.random.RandomState(102)
    c = len(LABELS)
    n_compared = 0
    for i in range(60):
        overlap_value, sample_duration = [
            (0.5, 6), (0.5, 7), (1, 5), (1, 6), (1, 7)][i % 5]
        t = 1000
        votes = rng.randint(0, 8, (1, t, c)).astype(np.float64)
        votes[:, -1, :] = 0.0    # same end-of-track crash avoidance
        params = _random_params(rng, c)
        # vote decoding thresholds are vote counts, not probabilities
        if isinstance(params['sed_high_threshold'], float):
            params['sed_high_threshold'] = float(rng.uniform(0.5, 4.0))
        else:
            params['sed_high_threshold'] = list(rng.uniform(0.5, 4.0, c))
        got = events.frame_binary_prediction_to_event_prediction(
            votes, overlap_value, sample_duration, f'file{i}.wav',
            dict(params))
        try:
            want = \
                ref_utilities.frame_binary_prediction_to_event_prediction(
                    votes, overlap_value, sample_duration,
                    f'file{i}.wav', dict(params))
        except IndexError:
            assert isinstance(got, list)
            continue
        assert got == want, f'case {i}'
        n_compared += 1
    assert n_compared >= 45, n_compared


def test_merge_avg_merge_head_to_head(ref_utilities):
    """The incremental ``merge``/``avg_merge`` chain
    (``utilities.py:405-446``) vs both our incremental port and the
    one-shot ``overlap_add_windows`` — bit-exact, across the window
    grid."""
    import sed_tpu.post.merge as post_merge

    rng = np.random.RandomState(103)
    for i in range(60):
        overlap_value, sample_duration = [
            (0.5, 6), (0.5, 7), (1, 5), (1, 6), (1, 7)][i % 5]
        t_win = sample_duration * 100
        n_win = int(rng.randint(1, 9))
        c = int(rng.randint(1, 6))
        windows = rng.rand(n_win, t_win, c)

        # reference incremental chain (avg_merge mutates: pass a copy)
        ref_merged = windows[0:1].copy()
        for w in range(1, n_win):
            ref_merged = ref_utilities.merge(
                ref_merged, windows[w:w + 1], sample_duration, w + 1,
                overlap_value)
        ref_out = ref_utilities.avg_merge(ref_merged.copy(),
                                          sample_duration, overlap_value)

        # our incremental port
        our_merged = windows[0:1].copy()
        for w in range(1, n_win):
            our_merged = post_merge.merge(our_merged, windows[w:w + 1],
                                          sample_duration, w + 1,
                                          overlap_value)
        our_inc = post_merge.avg_merge(our_merged, sample_duration,
                                       overlap_value)
        # our one-shot vectorized merge
        our_oneshot = post_merge.overlap_add_windows(
            windows, sample_duration, overlap_value)

        np.testing.assert_array_equal(our_inc, ref_out)
        np.testing.assert_array_equal(our_oneshot, ref_out)
