"""Turbo chunk-parallel demod vs the sequential stream demodulator.

With max_passes >= chunks+1 the fixpoint iteration is GUARANTEED bitwise
convergence (exact carries propagate at least one chunk per pass): the turbo
result is then self-consistent — identical to sequentially chaining the same
batched program. Against StreamDemodulator (a different XLA program whose
conv contracts FMAs differently) the decision structure must match exactly
(symbol count, lock history, signs); float values drift within loop noise,
so they are compared at the int8 quantization level."""

import numpy as np

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import StreamDemodulator
from meteor_demod_tpu.demod.turbo import demod_array_turbo
from meteor_demod_tpu.sim import synth_psk


def test_turbo_equals_sequential():
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    n = chunks * 2 * cfg.block_len        # exact multiple: no padding
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=22.0, seed=21)
    x = x[:n]

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1)
    assert res.converged, res.max_residual
    assert len(res.symbols) == len(seq)
    np.testing.assert_array_equal(res.symbols["locked_once"],
                                  seq["locked_once"])
    # Signs (the decoded bits) identical; magnitudes within loop noise.
    skip = len(seq) // 4
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    q = lambda v: np.trunc(np.clip(v * 0.5, -127, 127))
    mad = np.mean(np.abs(q(res.symbols["re"]) - q(seq["re"])))
    assert mad < 2.0, mad


def test_turbo_sequential_tail_non_multiple_lengths():
    """The sub-multiple tail is demodulated sequentially from the final
    chunk's carry (demod/turbo.py: no zero padding, no pad symbols); the
    symbol decisions must match the sequential demod's."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    n = chunks * 2 * cfg.block_len - 3000
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=22.0, seed=22)
    x = x[:n]

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1)
    assert res.converged
    # No pad symbols: same count, and decisions agree past acquisition.
    m = min(len(seq), len(res.symbols))
    skip = m // 4
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:m]),
                                  np.sign(seq["re"][skip:m]))


def test_turbo_oqpsk():
    """OQPSK turbo: the dual-slot state machine's parity is part of the
    carry, so the fixpoint handles it like any other loop state."""
    cfg = DemodConfig(samplerate=240000, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks = 4
    n = chunks * 2 * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=120.0, amplitude=6000.0, snr_db=22.0, seed=23)
    x = x[:n]

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1)
    assert res.converged
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 4
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
