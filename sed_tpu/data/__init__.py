from sed_tpu.data.audio_io import (
    load_audio,
    save_wav,
    resample,
    pad_truncate,
    get_duration,
)
