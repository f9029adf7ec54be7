"""Device-side dequantization of compressed audio wire formats.

The tunnel/PCIe link that feeds the chip is the measured wall for BOTH
serving (BENCHMARKS.md round-3 probe: e2e = bytes / link_bw + fixed)
and training (a 24+8-clip joint step ships 10.24 MB of int16 PCM —
more than 100x the device compute time at slow link phases).  Shipping
a narrower wire and dequantizing on device trades a few elementwise
device ops (negligible: the decode fuses into the frontend matmuls)
for a proportional cut in link bytes.

Wire formats, recognized from dtype + buffer width:

* float32 — passthrough.
* int16 PCM — exact `x / 32767` dequant (2 bytes/sample, the training
  default; `utils/utilities.py` int16_to_float32 parity).
* uint8 G.711 mu-law — 256-entry table gather (1 byte/sample, lossy
  telephony codec).
* uint8 qN block-scaled (N in QN_BITS) — N-bit mantissas per
  128-sample block with float16 scales packed into the same buffer
  (`audio_io.qn_encode`); q6 is ~2.6x narrower than float32.  The
  decode is PURE ELEMENTWISE (static slices per bit-phase group): a
  gather-based decode measured ~150 ms per 256-clip batch of device
  time, this formulation is free.
* uint8 IMA ADPCM (`audio_io.adpcm_encode`, standard wav tag 0x11 at
  ~4.06 bits/sample — half of mu-law's bytes; SNR-beats q4 on natural
  broadband audio, q4-grade on noise/near-Nyquist tones — see
  tests/test_adpcm.py) — one lax.scan over the 505-sample block
  recursion, vectorized across every (clip, block) lane.

This is the single implementation used by the serving engine
(`serve/engine.py`) and the train step (`train/step.py`).
"""

import math

import jax
import jax.numpy as jnp

from sed_tpu.data import audio_io

__all__ = ['dequant_wire', 'wire_widths']


def wire_widths(samples: int) -> dict:
    """Map uint8 wire width -> decode tag for a clip of `samples`:
    a qN bit count (int) or the string ``'adpcm4'`` (IMA ADPCM at the
    default block align).  The ADPCM wire width is odd by construction
    (``audio_io.adpcm_bytes`` trailing pad byte) while every qN and
    mu-law width is even, so the width-keyed dispatch is collision-free
    — asserted here, not assumed."""
    widths: dict = {}
    if samples % audio_io.Q4_BLOCK == 0:
        widths = {audio_io.qn_bytes(samples, n): n
                  for n in audio_io.QN_BITS}
    aw = audio_io.adpcm_bytes(samples)
    assert aw % 2 == 1 and aw not in widths and aw != samples, (
        samples, aw)
    widths[aw] = 'adpcm4'
    return widths


def dequant_wire(wav, samples: int = None):
    """Dequantize a (B, W) wire buffer to (B, samples) float32.

    `samples` is the decoded clip length; defaults to ``wav.shape[-1]``
    for float32/int16 (where width == samples) and is REQUIRED for
    uint8 buffers — a qN buffer whose width happened to be taken as
    `samples` would silently mis-decode through the mu-law table.
    uint8 buffers are decoded as qN when their width matches
    ``qn_bytes(samples, N)`` for some supported N, as mu-law when
    width == samples, and rejected loudly otherwise.
    """
    if wav.dtype == jnp.uint8 and samples is None:
        raise ValueError(
            'dequant_wire: uint8 wire buffers need an explicit '
            '`samples` (decoded clip length) — the buffer width alone '
            'cannot distinguish mu-law from the narrower qN wires')
    if samples is None:
        samples = wav.shape[-1]
    width_bits = wire_widths(samples)
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) / 32767.0
    if wav.dtype == jnp.uint8 and width_bits.get(wav.shape[-1]) == 'adpcm4':
        return _adpcm_decode(wav, samples)
    if wav.dtype == jnp.uint8 and wav.shape[-1] in width_bits:
        bits = width_bits[wav.shape[-1]]
        b = wav.shape[0]
        nb = samples * bits // 8
        top = (1 << (bits - 1)) - 1
        scale = jax.lax.bitcast_convert_type(
            wav[:, nb:].reshape(b, -1, 2),
            jnp.float16).astype(jnp.float32)           # (B, S/128)
        # big-endian bitstream: sample i = bits [i*bits, ..).  Groups
        # repeat every lcm(8, bits) bits, so each sample's byte offsets
        # within a group are STATIC slices.
        gbytes = bits // math.gcd(8, bits)
        gsamples = gbytes * 8 // bits
        codes = wav[:, :nb].astype(jnp.int32).reshape(
            b, nb // gbytes, gbytes)
        parts = []
        for k in range(gsamples):
            j = (k * bits) >> 3
            sh = 16 - bits - ((k * bits) & 7)
            hi = codes[:, :, j]
            lo = codes[:, :, min(j + 1, gbytes - 1)]
            parts.append((((hi << 8) | lo) >> sh) & ((1 << bits) - 1))
        q = jnp.stack(parts, axis=-1).reshape(b, samples)
        x = (q - top - 1).astype(jnp.float32)
        x = x.reshape(b, samples // audio_io.Q4_BLOCK,
                      audio_io.Q4_BLOCK) * scale[:, :, None]
        return x.reshape(b, samples)
    if wav.dtype == jnp.uint8:
        if wav.shape[-1] != samples:
            raise ValueError(
                f'dequant_wire: uint8 buffer width {wav.shape[-1]} is '
                f'neither a qN wire width for {samples} samples '
                f'({sorted(width_bits)}) nor the mu-law width '
                f'(== samples)')
        table = jnp.asarray(audio_io.mulaw_decode_table())
        return jnp.take(table, wav.astype(jnp.int32))
    return wav


def _adpcm_decode(wav, samples: int):
    """IMA ADPCM device decode, bit-exact to ``audio_io.adpcm_decode_np``.

    The predictor recursion is sequential WITHIN a block only, so one
    ``lax.scan`` of spb-1 steps runs vectorized over every
    (clip, block) lane — decode device time scales with the 505-sample
    block length, not the clip length.  Each step is a handful of
    elementwise int32 ops + two small table gathers (89/16 entries)."""
    ba = audio_io.ADPCM_BLOCK_ALIGN
    spb = audio_io.adpcm_samples_per_block(ba)
    b = wav.shape[0]
    nbl = (wav.shape[-1] - 1) // ba          # trailing pad byte dropped
    blocks = jax.lax.slice_in_dim(wav, 0, nbl * ba, axis=1).reshape(
        b * nbl, ba).astype(jnp.int32)
    pred0 = blocks[:, 0] | (blocks[:, 1] << 8)
    pred0 = jnp.where(pred0 >= 32768, pred0 - 65536, pred0)
    idx0 = jnp.clip(blocks[:, 2], 0, 88)
    data = blocks[:, 4:]
    nib = jnp.stack([data & 0xF, data >> 4], axis=-1).reshape(
        b * nbl, spb - 1)                    # low nibble first
    steps = jnp.asarray(audio_io.IMA_STEP_TABLE)
    itab = jnp.asarray(audio_io.IMA_INDEX_TABLE)

    def step_fn(carry, n):
        pred, idx = carry
        step = jnp.take(steps, idx)
        diff = ((step >> 3)
                + jnp.where((n & 4) != 0, step, 0)
                + jnp.where((n & 2) != 0, step >> 1, 0)
                + jnp.where((n & 1) != 0, step >> 2, 0))
        pred = jnp.clip(jnp.where((n & 8) != 0, pred - diff, pred + diff),
                        -32768, 32767)
        idx = jnp.clip(idx + jnp.take(itab, n), 0, 88)
        return (pred, idx), pred

    _, ys = jax.lax.scan(step_fn, (pred0, idx0), nib.T)
    out = jnp.concatenate([pred0[None], ys], axis=0)      # (spb, lanes)
    out = out.T.reshape(b, nbl * spb)[:, :samples]
    return out.astype(jnp.float32) / 32768.0
