"""Block polyphase FIR: equivalence with the direct per-sample dot products
and block-boundary continuity (overlap-save carry)."""

import numpy as np
import jax.numpy as jnp

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.dsp.fir import (f32_to_iq, fir_reference_np, iq_to_f32,
                                      make_fir_banks, polyphase_fir_block)


def _rand_iq(n, seed=0, scale=1000.0):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            * scale).astype(np.complex64)


def _fir(x_c, tail_c, banks):
    """Run the f32-pair FIR on complex numpy inputs, return complex outputs."""
    F, tail = polyphase_fir_block(jnp.asarray(iq_to_f32(x_c)),
                                  jnp.asarray(iq_to_f32(tail_c)), banks)
    return f32_to_iq(np.asarray(F)), f32_to_iq(np.asarray(tail))


def test_iq_layout_roundtrip():
    x = _rand_iq(64, seed=5)
    np.testing.assert_array_equal(f32_to_iq(iq_to_f32(x)), x)
    two_d = x.reshape(8, 8)
    assert iq_to_f32(two_d).shape == (8, 8, 2)
    np.testing.assert_array_equal(f32_to_iq(iq_to_f32(two_d)), two_d)


def test_fir_matches_direct_dot():
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = make_fir_banks(cfg)
    x = _rand_iq(512)
    tail = np.zeros(cfg.taps - 1, dtype=np.complex64)
    F, _ = _fir(x, tail, banks)
    F_ref = fir_reference_np(x, tail, banks)
    np.testing.assert_allclose(F, F_ref, rtol=2e-5, atol=1e-2)


def test_fir_block_continuity():
    """Two chained blocks must equal one double-length block exactly."""
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = make_fir_banks(cfg)
    x = _rand_iq(1024, seed=1)
    tail0 = np.zeros(cfg.taps - 1, dtype=np.complex64)

    F_full, _ = _fir(x, tail0, banks)
    F1, tail1 = _fir(x[:512], tail0, banks)
    F2, _ = _fir(x[512:], tail1, banks)
    F_chained = np.concatenate([F1, F2])
    np.testing.assert_array_equal(F_full, F_chained)


def test_fir_tail_is_last_samples():
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = make_fir_banks(cfg)
    x = _rand_iq(512, seed=2)
    tail0 = np.zeros(cfg.taps - 1, dtype=np.complex64)
    _, tail = _fir(x, tail0, banks)
    np.testing.assert_array_equal(tail, x[-(cfg.taps - 1):])
