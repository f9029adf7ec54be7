"""Gammatonegram rendering with an ERB-scaled frequency axis.

Equivalent of the vendored toolkit's plotting module
(``utils/gammatone/plot.py``): render a waveform's gammatonegram with
correctly-labelled ERB-spaced ticks.  Matplotlib import is deferred so
headless installs don't pay for it.
"""

from __future__ import annotations

import numpy as np

from sed_tpu.dsp import gammatone as gt


class ERBFormatter:
    """Axis formatter mapping [0, 1] positions to ERB-scale frequencies."""

    def __init__(self, low_freq: float, high_freq: float,
                 unit: str = 'Hz', places: int = 0):
        self.low_freq = low_freq
        self.high_freq = high_freq
        self.unit = unit
        self.places = places

    def __call__(self, val, pos=None) -> str:
        freq = gt.erb_point(self.low_freq, self.high_freq, val)
        return f'{freq:.{self.places}f} {self.unit}'


def render_gtgram(wave: np.ndarray, fs: int, window_time: float,
                  hop_time: float, channels: int, f_min: float,
                  axes=None, use_fft: bool = True):
    """Plot a (FFT-approximated by default) gammatonegram onto ``axes``."""
    import matplotlib.pyplot as plt
    from matplotlib.ticker import FuncFormatter

    if use_fft:
        gtg = gt.fft_gtgram(wave, fs, window_time, hop_time, channels,
                            f_min)
    else:
        gtg = gt.gtgram(wave, fs, window_time, hop_time, channels, f_min)
    z = np.flipud(20 * np.log10(np.maximum(gtg, 1e-10)))

    if axes is None:
        _, axes = plt.subplots()
    duration = len(wave) / fs
    axes.imshow(z, extent=[0, duration, 1, 0], aspect='auto')
    axes.yaxis.set_major_formatter(
        FuncFormatter(ERBFormatter(f_min, fs / 2, unit='Hz', places=0)))
    axes.set_xlabel('Time (s)')
    axes.set_ylabel('Frequency')
    return axes
