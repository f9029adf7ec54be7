"""Pallas fused log-mel kernel: parity with the XLA frontend path."""

import jax.numpy as jnp
import numpy as np
import pytest

from sed_tpu.config import AUDIO_8K, AUDIO_16K, AUDIO_32K
from sed_tpu.dsp.frontend import LogmelFrontend
from sed_tpu.ops.logmel_kernel import fused_logmel


@pytest.mark.parametrize('cfg', [AUDIO_8K, AUDIO_16K, AUDIO_32K],
                         ids=['8k', '16k', '32k'])
def test_fused_logmel_matches_frontend(cfg):
    rng = np.random.RandomState(0)
    wav = rng.uniform(-0.5, 0.5, (2, cfg.sample_rate)).astype(np.float32)
    got = np.asarray(fused_logmel(jnp.asarray(wav), cfg))
    want = np.asarray(LogmelFrontend(cfg)(jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fused_logmel_row_padding():
    """Row counts that don't divide the tile are padded and trimmed."""
    cfg = AUDIO_16K
    wav = jnp.zeros((3, cfg.sample_rate // 2), jnp.float32)  # 51 frames
    out = fused_logmel(wav, cfg, tile_rows=128)
    assert out.shape == (3, cfg.sample_rate // 2 // cfg.hop_size + 1, 64)
