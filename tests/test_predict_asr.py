"""predict_asr plumbing test with a stubbed speech_recognition backend."""

import os
import sys
import types

import numpy as np
import jax
import pytest

from sed_tpu.config import AUDIO_16K
from sed_tpu.data import audio_io
from sed_tpu.cli import predict as predict_cli


class _FakeRecognizer:
    def record(self, source):
        return 'audio-data'

    def recognize_google(self, audio_data, language='en-SG'):
        return 'hello world'


class _FakeAudioFile:
    def __init__(self, path):
        self.path = path

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_predict_asr_stubbed(tmp_path, monkeypatch):
    import subprocess

    def fake_run(*a, **k):  # stands in for the ffmpeg segment crop
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(subprocess, 'run', fake_run)

    fake = types.ModuleType('speech_recognition')
    fake.Recognizer = _FakeRecognizer
    fake.AudioFile = _FakeAudioFile
    fake.UnknownValueError = type('UnknownValueError', (Exception,), {})
    fake.RequestError = type('RequestError', (Exception,), {})
    monkeypatch.setitem(sys.modules, 'speech_recognition', fake)

    rng = np.random.RandomState(0)
    input_dir = tmp_path / 'wavs'
    input_dir.mkdir()
    audio_io.save_wav(str(input_dir / 'x.wav'),
                      rng.uniform(-0.3, 0.3, AUDIO_16K.sample_rate * 5),
                      AUDIO_16K.sample_rate)
    ws = tmp_path / 'ws'

    predict_cli.main(['predict_asr', '--input_dir', str(input_dir),
                      '--workspace', str(ws),
                      '--model_type', 'Cnn_9layers_FrameAvg',
                      '--batch_size', '4', '--feature_type', 'logmel',
                      '--audio_16k', '--sample_duration', '5'])
    out = ws / 'predict_results' / 'x.xml'
    assert out.exists()
    content = out.read_text()
    assert content.startswith('<AudioDoc')
