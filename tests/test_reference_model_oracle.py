"""Head-to-head against the ACTUAL reference model code.

The ``test_compat*`` modules prove ``.pth`` round-trips against torch
oracles that were hand-built with the reference's exact state-dict key
names — strong, but still replicas.  This module closes the last gap:
it imports the real ``/root/reference/pytorch/models.py`` (torch CPU,
with a functional ``librosa`` stub whose ``filters.mel`` is the vendored
value oracle from ``test_dsp_frontend``), instantiates the shipped model
classes, saves a genuine reference checkpoint with ``torch.save``, loads
it through ``sed_tpu.compat.torch_loader``, and compares FULL forward
outputs — raw waveform in, framewise/clipwise out — so the reference's
own conv-based STFT/logmel frontend (``pytorch/stft.py:157-247,673-734``)
is part of the comparison, not substituted by ours.

Covered classes (reference ``pytorch/models.py``):
  * ``Cnn_9layers_Gru_FrameAtt``        (models.py:564-688, primary)
  * ``Cnn_9layers_Transformer_FrameAtt`` (models.py:981-1077, best ER)
  * ``Cnn_9layers_Conformer_FrameAtt``   (models.py:1189-1376)
plus the T != 1000 roundup/pad quirk (models.py:680-681) on a short clip.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from sed_tpu.config import AUDIO_16K  # noqa: E402
from sed_tpu.compat.torch_loader import load_checkpoint_variables  # noqa: E402
from sed_tpu.models.registry import get_model  # noqa: E402

from test_compat import _randomize_bn_stats  # noqa: E402
from test_dsp_frontend import _librosa_mel_oracle  # noqa: E402

REF = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'pytorch')),
    reason='reference repo not mounted')


def _functional_librosa_stub():
    """A ``librosa`` stub with the three functions the reference frontend
    classes call at construction time (``pytorch/stft.py:192-195,688``),
    implemented for real: ``filters.mel`` is the vendored librosa value
    oracle, ``filters.get_window`` delegates to scipy (as librosa does
    for string window names), ``util.pad_center`` is librosa's centering
    pad."""
    import scipy.signal

    librosa = types.ModuleType('librosa')
    filters = types.ModuleType('librosa.filters')
    util = types.ModuleType('librosa.util')

    def get_window(window, Nx, fftbins=True):
        return scipy.signal.get_window(window, Nx, fftbins=fftbins)

    def pad_center(data, size, axis=-1):
        n = data.shape[axis]
        lpad = int((size - n) // 2)
        lengths = [(0, 0)] * data.ndim
        lengths[axis] = (lpad, int(size - n - lpad))
        assert lpad >= 0, (size, n)
        return np.pad(data, lengths)

    def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False,
            norm='slaney', dtype=np.float32):
        return _librosa_mel_oracle(sr, n_fft, n_mels, fmin, fmax,
                                   htk=htk, norm=norm, dtype=dtype)

    filters.get_window = get_window
    filters.mel = mel
    util.pad_center = pad_center
    librosa.filters = filters
    librosa.util = util
    return {'librosa': librosa, 'librosa.filters': filters,
            'librosa.util': util}


@pytest.fixture(scope='module')
def ref_models():
    """Import the ACTUAL reference ``pytorch/models.py`` on CPU torch."""
    stubs = {k: v for k, v in _functional_librosa_stub().items()
             if k not in sys.modules}
    sys.modules.update(stubs)
    paths = [os.path.join(REF, 'pytorch'), os.path.join(REF, 'utils')]
    sys.path[:0] = paths
    try:
        import models as ref_mod
    finally:
        for p in paths:
            sys.path.remove(p)
        for k in stubs:
            sys.modules.pop(k, None)
    return ref_mod


#: deterministic-frontend parameters (frozen in the reference, and
#: recomputed rather than loaded by the rebuild's checkpoint reader)
_FRONTEND_PREFIXES = ('spectrogram_extractor.', 'logmel_extractor.',
                      'stft_extractor.', 'cqt_extractor.',
                      'gamma_extractor.')


def _perturb_parameters(model, rng, scale=0.05):
    """Add noise to every learnable parameter EXCEPT the frozen frontend
    weights (the STFT/mel matrices are deterministic functions of the
    audio config — the rebuild recomputes them, so perturbing the
    reference's copies would compare against a corrupted frontend).
    Buffers are also left alone: the reference stores e.g.
    positional-encoding tables as buffers that the rebuild recomputes.
    Defaults like LayerNorm weight=1/bias=0 would otherwise mask
    transposition/mapping bugs."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.startswith(_FRONTEND_PREFIXES):
                continue
            p.add_(torch.from_numpy(
                rng.uniform(-scale, scale, p.shape).astype(np.float32)))


def _head_to_head(ref_model, model_type, wav, tmp_path, tol=5e-4):
    """torch.save the ACTUAL reference model -> pure-python load ->
    flax forward on raw waveform -> compare output dicts."""
    ref_model = ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(wav))
    path = str(tmp_path / 'ref_ckpt.pth')
    torch.save({'iteration': 41, 'model': ref_model.state_dict()}, path)
    variables, it = load_checkpoint_variables(path)
    assert it == 41

    model = get_model(model_type, AUDIO_16K)
    out = model.apply(variables, jnp.asarray(wav), train=False)

    got_clip = np.asarray(out['clipwise_output'])
    got_frame = np.asarray(out['framewise_output'])
    want_clip = want['clipwise_output'].numpy()
    want_frame = want['framewise_output'].numpy()
    assert got_frame.shape == want_frame.shape
    np.testing.assert_allclose(got_clip, want_clip, rtol=1e-3, atol=tol)
    np.testing.assert_allclose(got_frame, want_frame, rtol=1e-3, atol=tol)


def test_gru_frameatt_vs_actual_reference(ref_models, tmp_path):
    """Full 10 s clip: reference frontend emits 1001 frames -> 125 after
    pooling -> x8 interpolate = 1000 (the pad branch is NOT taken)."""
    torch.manual_seed(10)
    rng = np.random.RandomState(10)
    m = ref_models.Cnn_9layers_Gru_FrameAtt(
        16000, 512, 160, 64, 25, 7000, 25, 'logmel')
    _perturb_parameters(m, rng)
    _randomize_bn_stats(m, rng)
    wav = rng.uniform(-0.5, 0.5, (2, 160000)).astype(np.float32)
    _head_to_head(m, 'Cnn_9layers_Gru_FrameAtt', wav, tmp_path)


def test_gru_frameatt_short_clip_pad_quirk(ref_models, tmp_path):
    """3 s clip: 301 frames -> 37 -> x8 = 296 != 1000, so the reference
    pads to roundup(296)=300 by repeating the last frame
    (models.py:680-681) — the rebuild must reproduce that exactly."""
    torch.manual_seed(11)
    rng = np.random.RandomState(11)
    m = ref_models.Cnn_9layers_Gru_FrameAtt(
        16000, 512, 160, 64, 25, 7000, 25, 'logmel')
    _perturb_parameters(m, rng)
    _randomize_bn_stats(m, rng)
    wav = rng.uniform(-0.5, 0.5, (1, 48000)).astype(np.float32)
    _head_to_head(m, 'Cnn_9layers_Gru_FrameAtt', wav, tmp_path)


def test_transformer_frameatt_vs_actual_reference(ref_models, tmp_path):
    torch.manual_seed(12)
    rng = np.random.RandomState(12)
    m = ref_models.Cnn_9layers_Transformer_FrameAtt(
        16000, 512, 160, 64, 25, 7000, 25, 'logmel')
    _perturb_parameters(m, rng)
    _randomize_bn_stats(m, rng)
    wav = rng.uniform(-0.5, 0.5, (2, 80000)).astype(np.float32)
    _head_to_head(m, 'Cnn_9layers_Transformer_FrameAtt', wav, tmp_path)


def test_conformer_frameatt_vs_actual_reference(ref_models, tmp_path):
    """main_strong passes ``feature_type`` as the conformer's
    ``cnn_kwargs`` positional (main_strong.py:204 vs models.py:1194) —
    an ignored-arg quirk; the constructor overwrites cnn_kwargs."""
    torch.manual_seed(13)
    rng = np.random.RandomState(13)
    m = ref_models.Cnn_9layers_Conformer_FrameAtt(
        16000, 512, 160, 64, 25, 7000, 25, 'logmel')
    _perturb_parameters(m, rng)
    _randomize_bn_stats(m, rng)
    wav = rng.uniform(-0.5, 0.5, (1, 80000)).astype(np.float32)
    _head_to_head(m, 'Cnn_9layers_Conformer_FrameAtt', wav, tmp_path)
