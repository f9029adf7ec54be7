from sed_tpu.dsp.filters import (
    periodic_hann,
    stft_matrices,
    mel_filterbank,
)
from sed_tpu.dsp.frontend import (
    LogmelFrontend,
    frame_signal,
    stft,
    spectrogram,
    power_to_db,
)
