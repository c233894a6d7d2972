"""Block polyphase FIR: equivalence with the direct per-sample dot products
and block-boundary continuity (overlap-save carry)."""

import numpy as np
import jax.numpy as jnp

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.dsp.fir import (make_fir_banks, polyphase_fir_block,
                                      fir_reference_np)


def _rand_iq(n, seed=0, scale=1000.0):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            * scale).astype(np.complex64)


def test_fir_matches_direct_dot():
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = make_fir_banks(cfg)
    x = _rand_iq(512)
    tail = np.zeros(cfg.taps - 1, dtype=np.complex64)
    F, _ = polyphase_fir_block(jnp.asarray(x), jnp.asarray(tail),
                               jnp.asarray(banks))
    F_ref = fir_reference_np(x, tail, banks)
    np.testing.assert_allclose(np.asarray(F), F_ref, rtol=2e-5, atol=1e-2)


def test_fir_block_continuity():
    """Two chained blocks must equal one double-length block exactly."""
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = jnp.asarray(make_fir_banks(cfg))
    x = _rand_iq(1024, seed=1)
    tail0 = jnp.zeros(cfg.taps - 1, dtype=jnp.complex64)

    F_full, _ = polyphase_fir_block(jnp.asarray(x), tail0, banks)
    F1, tail1 = polyphase_fir_block(jnp.asarray(x[:512]), tail0, banks)
    F2, _ = polyphase_fir_block(jnp.asarray(x[512:]), tail1, banks)
    F_chained = np.concatenate([np.asarray(F1), np.asarray(F2)])
    np.testing.assert_array_equal(np.asarray(F_full), F_chained)


def test_fir_tail_is_last_samples():
    cfg = DemodConfig(samplerate=230400, block_len=512)
    banks = jnp.asarray(make_fir_banks(cfg))
    x = _rand_iq(512, seed=2)
    tail0 = jnp.zeros(cfg.taps - 1, dtype=jnp.complex64)
    _, tail = polyphase_fir_block(jnp.asarray(x), tail0, banks)
    np.testing.assert_array_equal(np.asarray(tail), x[-(cfg.taps - 1):])
