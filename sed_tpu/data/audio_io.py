"""Audio file I/O: wav decode, mono mixdown, resampling.

The reference leans on ``librosa.core.load`` (``pytorch/predict.py:295``,
``utils/features.py:356``) and shells out to ffmpeg for non-wav input
(``pytorch/predict.py:288-294``).  Here wav decoding is
scipy/stdlib-based, resampling is polyphase (scipy), and ffmpeg is an
optional gated fallback for compressed formats.
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _to_float32(data: np.ndarray) -> np.ndarray:
    """Normalize PCM to [-1, 1] float32 (librosa convention)."""
    if data.dtype == np.float32 or data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0)
    raise ValueError(f'unsupported wav dtype: {data.dtype}')


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (Kaiser-windowed), mono float32."""
    if orig_sr == target_sr:
        return x.astype(np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(x.astype(np.float64), target_sr // g, orig_sr // g)
    return out.astype(np.float32)


def _ffmpeg_to_wav(path: str) -> str:
    """Convert a compressed file to wav via ffmpeg if available."""
    if shutil.which('ffmpeg') is None:
        raise RuntimeError(
            f'cannot decode {path!r}: not a wav file and ffmpeg is not '
            'installed')
    out = tempfile.NamedTemporaryFile(suffix='.wav', delete=False).name
    subprocess.run(['ffmpeg', '-y', '-i', path, out], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return out


def load_audio(path: str, sr: Optional[int] = None,
               mono: bool = True) -> Tuple[np.ndarray, int]:
    """Load an audio file as float32 in [-1, 1].

    Returns (waveform, sample_rate).  If ``sr`` is given the waveform is
    resampled (librosa.load semantics).
    """
    tmp = None
    if not path.lower().endswith('.wav'):
        tmp = _ffmpeg_to_wav(path)
        path = tmp
    try:
        file_sr, data = wavfile.read(path)
    finally:
        if tmp is not None:
            os.unlink(tmp)
    x = _to_float32(np.asarray(data))
    if mono and x.ndim == 2:
        x = x.mean(axis=1)
    if sr is not None and sr != file_sr:
        x = resample(x, file_sr, sr)
        file_sr = sr
    return x.astype(np.float32), int(file_sr)


def load_wav_int16(path: str) -> Tuple[np.ndarray, int]:
    """Load a 16-bit PCM wav without float conversion (the serving engine
    dequantizes on device, halving host->device traffic)."""
    sr, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype != np.int16:
        x = _to_float32(data)
        if x.ndim == 2:
            x = x.mean(axis=1)
        return (np.clip(x, -1, 1) * 32767.0).astype(np.int16), int(sr)
    if data.ndim == 2:
        data = data.mean(axis=1).astype(np.int16)
    return data, int(sr)


def fast_read_wav_int16(path: str) -> Tuple[np.ndarray, int]:
    """Minimal RIFF parser for canonical 16-bit PCM mono wav files.

    ~20x faster than the general scipy path for small clips (serving-path
    hot loop); falls back to ``load_wav_int16`` for anything non-canonical.
    """
    with open(path, 'rb') as f:
        buf = f.read()
    if buf[:4] != b'RIFF' or buf[8:12] != b'WAVE':
        return load_wav_int16(path)
    pos = 12
    sr = None
    channels = 1
    bits = 16
    while pos + 8 <= len(buf):
        chunk_id = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], 'little')
        if chunk_id == b'fmt ':
            fmt = int.from_bytes(buf[pos + 8:pos + 10], 'little')
            channels = int.from_bytes(buf[pos + 10:pos + 12], 'little')
            sr = int.from_bytes(buf[pos + 12:pos + 16], 'little')
            bits = int.from_bytes(buf[pos + 22:pos + 24], 'little')
            if fmt != 1 or bits != 16:
                return load_wav_int16(path)
        elif chunk_id == b'data':
            if sr is None:            # data before/without fmt: punt
                return load_wav_int16(path)
            data = np.frombuffer(buf, np.int16, count=size // 2,
                                 offset=pos + 8)
            if channels > 1:
                data = data.reshape(-1, channels).mean(axis=1) \
                    .astype(np.int16)
            return data, int(sr)
        pos += 8 + size + (size & 1)
    return load_wav_int16(path)


# ---------------------------------------------------------------------------
# G.711 mu-law wire format (8 bits/sample)
#
# The serving link's host->device bandwidth bounds end-to-end throughput
# (BENCHMARKS.md): int16 PCM costs 160 KB per 5 s clip.  Standard G.711
# mu-law halves that; the engine dequantizes on device with a 256-entry
# table lookup.  This is the telephony wire format, so .wav files with
# format tag 7 (e.g. ffmpeg -acodec pcm_mulaw) are read without
# transcoding.
# ---------------------------------------------------------------------------

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635
_mulaw_tables: dict = {}


def mulaw_decode_table() -> np.ndarray:
    """(256,) float32: G.711 mu-law code -> linear sample in [-1, 1)."""
    if 'dec' not in _mulaw_tables:
        u = np.arange(256, dtype=np.int32) ^ 0xFF
        sign = u & 0x80
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = (((mantissa << 3) + _MULAW_BIAS) << exponent) - _MULAW_BIAS
        lin = np.where(sign != 0, -mag, mag)
        _mulaw_tables['dec'] = (lin / 32768.0).astype(np.float32)
    return _mulaw_tables['dec']


def mulaw_encode_table() -> np.ndarray:
    """(65536,) uint8: int16 sample (viewed as uint16) -> mu-law code."""
    if 'enc' not in _mulaw_tables:
        x = np.arange(-32768, 32768, dtype=np.int32)
        sign = np.where(x < 0, 0x80, 0).astype(np.int32)
        mag = np.clip(np.abs(x), 0, _MULAW_CLIP) + _MULAW_BIAS
        exponent = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
        mantissa = (mag >> (exponent + 3)) & 0x0F
        code = (~(sign | (exponent << 4) | mantissa)) & 0xFF
        # index by the uint16 view of the int16 sample
        table = np.empty(65536, np.uint8)
        table[np.arange(-32768, 32768) & 0xFFFF] = code.astype(np.uint8)
        _mulaw_tables['enc'] = table
    return _mulaw_tables['enc']


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float [-1, 1] or int16 -> (same shape) uint8 mu-law codes."""
    if x.dtype != np.int16:
        x = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
    return mulaw_encode_table()[x.view(np.uint16)]


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> float32 in [-1, 1) (host-side path)."""
    return mulaw_decode_table()[u]


def save_wav_mulaw(path: str, x: np.ndarray, sr: int) -> None:
    """Write audio as a standard mu-law wav (format tag 7, 8 bits)."""
    data = mulaw_encode(np.asarray(x)).tobytes()
    n = len(data)
    with open(path, 'wb') as f:
        f.write(b'RIFF' + (36 + n).to_bytes(4, 'little') + b'WAVE')
        f.write(b'fmt ' + (16).to_bytes(4, 'little'))
        f.write((7).to_bytes(2, 'little'))          # WAVE_FORMAT_MULAW
        f.write((1).to_bytes(2, 'little'))          # mono
        f.write(int(sr).to_bytes(4, 'little'))
        f.write(int(sr).to_bytes(4, 'little'))      # byte rate
        f.write((1).to_bytes(2, 'little'))          # block align
        f.write((8).to_bytes(2, 'little'))          # bits per sample
        f.write(b'data' + n.to_bytes(4, 'little'))
        f.write(data)


def fast_read_wav_mulaw(path: str) -> Tuple[np.ndarray, int]:
    """Read a mu-law wav as raw uint8 codes (no transcoding — the engine
    dequantizes on device).  Falls back to encoding from the PCM reader
    for non-mu-law files."""
    with open(path, 'rb') as f:
        buf = f.read()
    if buf[:4] == b'RIFF' and buf[8:12] == b'WAVE':
        pos = 12
        sr = None
        fmt = None
        while pos + 8 <= len(buf):
            chunk_id = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], 'little')
            if chunk_id == b'fmt ':
                fmt = int.from_bytes(buf[pos + 8:pos + 10], 'little')
                channels = int.from_bytes(buf[pos + 10:pos + 12], 'little')
                sr = int.from_bytes(buf[pos + 12:pos + 16], 'little')
            elif chunk_id == b'data' and fmt == 7 and channels == 1:
                return (np.frombuffer(buf, np.uint8, count=size,
                                      offset=pos + 8), int(sr))
            elif chunk_id == b'data':
                break
            pos += 8 + size + (size & 1)
    pcm, sr = fast_read_wav_int16(path)
    return mulaw_encode(pcm), sr


# ---------------------------------------------------------------------------
# qN wire formats: N-bit block-scaled quantization (N in {4, 5, 6})
#
# Bandwidth-lean serving wires: 128-sample blocks, signed N-bit mantissas
# packed big-endian against a per-block float16 scale, scales appended to
# the same uint8 buffer (one array per clip, so the engine's batch
# plumbing is format agnostic).  Per 5 s clip: q4 ~41 KB, q5 ~51 KB,
# q6 ~61 KB vs 80 KB mu-law / 160 KB int16.  Measured on the bench
# distribution (BENCHMARKS.md): q6 is event/ER-equivalent to mu-law, q5
# keeps the segment-ER but flutters event boundaries, q4 costs ER.
# Device decode: two byte-gathers + shift/mask + one multiply.
# ---------------------------------------------------------------------------

Q4_BLOCK = 128
QN_BITS = (4, 5, 6)


def qn_bytes(samples: int, bits: int) -> int:
    """Wire bytes for ``samples`` N-bit samples (+f16 block scales)."""
    assert samples % Q4_BLOCK == 0 and (samples * bits) % 8 == 0
    return samples * bits // 8 + (samples // Q4_BLOCK) * 2


def qn_encode(x: np.ndarray, bits: int) -> np.ndarray:
    """float [-1,1] or int16 (B, S) -> (B, qn_bytes(S, bits)) uint8."""
    assert bits in QN_BITS, bits
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32767.0
    x = np.asarray(x, np.float32)
    b, s = x.shape
    top = (1 << (bits - 1)) - 1
    blocks = x.reshape(b, s // Q4_BLOCK, Q4_BLOCK)
    scale = np.abs(blocks).max(axis=2) / top
    # floor must survive the float16 cast (1e-6 is a representable f16
    # subnormal; anything below ~6e-8 flushes to zero and poisons the
    # divide)
    scale = np.maximum(scale, 1e-6).astype(np.float16)
    q = np.clip(np.round(blocks / scale.astype(np.float32)[:, :, None]),
                -top - 1, top).astype(np.int32) + top + 1
    q = q.reshape(b, s)
    # big-endian bitstream: sample i occupies bits [i*bits, (i+1)*bits)
    shifts = np.arange(bits - 1, -1, -1)
    bit_mat = ((q[:, :, None] >> shifts[None, None, :]) & 1).astype(
        np.uint8).reshape(b, s * bits)
    codes = np.packbits(bit_mat, axis=1)
    return np.concatenate([codes, scale.view(np.uint8).reshape(b, -1)],
                          axis=1)


def qn_decode_np(buf: np.ndarray, samples: int, bits: int) -> np.ndarray:
    """Host-side reference decode (the engine decodes on device)."""
    assert bits in QN_BITS, bits
    b = buf.shape[0]
    nb = samples * bits // 8
    top = (1 << (bits - 1)) - 1
    codes = buf[:, :nb].astype(np.int32)
    scale = buf[:, nb:].view(np.float16).astype(np.float32)
    bitpos = np.arange(samples) * bits
    j = bitpos >> 3
    sh = 16 - bits - (bitpos & 7)
    lo = codes[:, np.minimum(j + 1, nb - 1)]
    q = (((codes[:, j] << 8) | lo) >> sh) & ((1 << bits) - 1)
    x = (q - top - 1).astype(np.float32).reshape(b, samples // Q4_BLOCK,
                                                 Q4_BLOCK)
    return (x * scale[:, :, None]).reshape(b, samples)


def q4_bytes(samples: int) -> int:
    return qn_bytes(samples, 4)


def q4_encode(x: np.ndarray) -> np.ndarray:
    return qn_encode(x, 4)


def q4_decode_np(buf: np.ndarray, samples: int) -> np.ndarray:
    return qn_decode_np(buf, samples, 4)


def save_qn(path: str, x: np.ndarray, sr: int, bits: int) -> None:
    """Write one clip as a .qN container (sed_tpu's packed serving
    format: 13-byte header + qN wire bytes).  Header version byte 1 is
    the legacy 4-bit container; otherwise it names the bit width."""
    x = np.asarray(x)
    buf = qn_encode(x[None], bits)[0]
    with open(path, 'wb') as f:
        f.write(b'SEDQ' + bytes([1 if bits == 4 else bits]))
        f.write(int(sr).to_bytes(4, 'little'))
        f.write(int(x.shape[-1]).to_bytes(4, 'little'))
        f.write(buf.tobytes())


def read_qn(path: str) -> Tuple[np.ndarray, int, int]:
    """Read a .qN container -> (wire uint8 codes, sample_rate, samples).
    The codes feed the engine directly (device-side decode)."""
    with open(path, 'rb') as f:
        head = f.read(13)
        assert head[:4] == b'SEDQ', f'not a qN file: {path}'
        bits = 4 if head[4] == 1 else head[4]
        assert bits in QN_BITS, f'unknown qN bit width {bits}: {path}'
        sr = int.from_bytes(head[5:9], 'little')
        samples = int.from_bytes(head[9:13], 'little')
        return (np.frombuffer(f.read(qn_bytes(samples, bits)), np.uint8),
                sr, samples)


def save_q4(path: str, x: np.ndarray, sr: int) -> None:
    save_qn(path, x, sr, 4)


def read_q4(path: str) -> Tuple[np.ndarray, int, int]:
    return read_qn(path)


def get_duration(path: str) -> float:
    """Duration in seconds (librosa.get_duration on a file)."""
    x, sr = load_audio(path, sr=None, mono=True)
    return len(x) / float(sr)


def save_wav(path: str, x: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] audio as 16-bit PCM wav."""
    data = np.clip(x, -1.0, 1.0)
    wavfile.write(path, sr, (data * 32767.0).astype(np.int16))


def trim_silent(x: np.ndarray, sr: int, top_db: float = 18.0,
                frame_length: int = 2048, hop_length: int = 512):
    """Split audio on silence (librosa.effects.split semantics): returns
    (non-silent intervals [[start, end), ...] in samples, concatenated
    non-silent audio).  Equivalent of the reference's unused helper
    (``pytorch/predict.py:40-55``)."""
    if len(x) < frame_length:
        rms = np.asarray([np.sqrt(np.mean(x ** 2) + 1e-12)])
    else:
        n = 1 + (len(x) - frame_length) // hop_length
        frames = np.lib.stride_tricks.as_strided(
            x, shape=(n, frame_length),
            strides=(x.strides[0] * hop_length, x.strides[0]))
        rms = np.sqrt(np.mean(frames ** 2, axis=1) + 1e-12)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10))
    non_silent = db > (db.max() - top_db)
    idx = np.flatnonzero(non_silent)
    if idx.size == 0:
        return np.zeros((0, 2), np.int64), x[:0]
    gaps = np.flatnonzero(np.diff(idx) > 1)
    starts = idx[np.concatenate(([0], gaps + 1))] * hop_length
    ends = np.minimum(
        (idx[np.concatenate((gaps, [idx.size - 1]))] + 1) * hop_length
        + frame_length - hop_length, len(x))
    intervals = np.stack([starts, ends], axis=1)
    audio = np.concatenate([x[s:e] for s, e in intervals])
    return intervals, audio


def pad_truncate(x: np.ndarray, max_len: int) -> np.ndarray:
    """Zero-pad or truncate to ``max_len``
    (``utils/utilities.py:66-71``)."""
    if len(x) < max_len:
        return np.concatenate(
            (x, np.zeros(max_len - len(x), dtype=x.dtype)))
    return x[:max_len]


def _wav_format_tag(path: str) -> int:
    """Peek a RIFF wav's fmt-chunk format tag (1=PCM, 7=mu-law).
    Walks chunk headers with seeks, so arbitrarily large metadata
    chunks (LIST/bext) before ``fmt `` don't defeat the sniff.
    Returns 0 for non-RIFF files or when no fmt chunk exists."""
    with open(path, 'rb') as f:
        head = f.read(12)
        if len(head) < 12 or head[:4] != b'RIFF' or head[8:12] != b'WAVE':
            return 0
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return 0
            if hdr[:4] == b'fmt ':
                tag = f.read(2)
                return int.from_bytes(tag, 'little') if len(tag) == 2 \
                    else 0
            size = int.from_bytes(hdr[4:8], 'little')
            f.seek(size + (size & 1), os.SEEK_CUR)


def wire_reader_for(path: str):
    """Pick the serving-wire reader for a corpus by sniffing one file:
    ``.q4/.q5/.q6`` containers -> qN codes, mu-law wav (format tag 7) ->
    raw G.711 codes, other wavs -> int16 PCM.  The returned
    ``reader(path) -> 1-D wire array`` feeds
    ``SedInferenceEngine.predict_files_resident`` (the engine
    dequantizes on device)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in ('.q4', '.q5', '.q6'):
        return lambda p: read_qn(p)[0]
    if _wav_format_tag(path) == 7:
        return lambda p: fast_read_wav_mulaw(p)[0]
    return lambda p: fast_read_wav_int16(p)[0]


def stack_rows(arrays) -> np.ndarray:
    """``np.stack`` for 1-D rows via row-wise fill of a preallocated
    buffer.  NumPy's multi-array concatenate path degrades past ~tens
    of MB on the bench host (measured 17 MB/s vs 1.1+ GB/s for this
    formulation, BENCHMARKS.md) — use this for any corpus-sized stack
    on a hot path."""
    arrays = list(arrays)
    first = np.asarray(arrays[0])
    out = np.empty((len(arrays),) + first.shape, first.dtype)
    out[0] = first
    for i, a in enumerate(arrays[1:], 1):
        a = np.asarray(a)
        if a.shape != first.shape or a.dtype != first.dtype:
            # match np.stack's loudness — assignment alone would
            # silently cast mismatched dtypes or broadcast length-1 rows
            raise ValueError(
                f'stack_rows: row {i} has shape {a.shape} dtype '
                f'{a.dtype}, expected {first.shape} {first.dtype}')
        out[i] = a
    return out
