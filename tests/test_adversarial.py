"""Adversarial window-budget tests on the REAL signal path.

The prematerialized candidate window is sized by config.py's
max_ticks_per_step / window_delta from a hand-derived worst-case M&M
correction budget of 4 rad (the AGC transient with 16-bit full-scale input
and gain <= 1). These tests drive that budget to its boundary with
worst-case inputs — no poisoned flags, no mocked internals — and check
either no-miss (decisions intact, zero fallbacks) or flag + exact-oracle
fallback end-to-end.
"""

import numpy as np

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod import scalar
from meteor_demod_tpu.demod.pipeline import StreamDemodulator
from meteor_demod_tpu.dsp.fir import make_fir_banks, fir_reference_np
from meteor_demod_tpu.sim import synth_psk


def test_full_scale_16bit_cold_start_within_budget():
    """Cold start (gain = 1) on full-scale 16-bit input — the edge case the
    window budget was derived for (config.py max_ticks_per_step).

    Worst-case cumulative retard: fire 1 sees m1 = max|F| * gain(=1) and
    retards by alpha_t*m1; the AGC then floors the gain to 0 (the drop
    1e-4*(m1-190) exceeds 1 for any m1 > ~10190), so fire 2 sees z=0 and
    the M&M error equals the carried prev = m1 — a second alpha_t*m1
    retard. Fire 3 onward has prev=0. Total: 2*alpha_t*max|F|, which for
    int16 (|F| overshoots the 32767 input peak through the filter) lands at
    ~4.5 rad — ABOVE the nominal 4-rad jitter term. The +8-tick margin in
    window_delta is what absorbs it; this test pins both sides of that
    boundary so a margin change fails loudly."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n = 4 * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=250.0, amplitude=23000.0,
                     snr_db=25.0, seed=7)
    x = x[:n]
    # Emulate the int16 ingest clamp (wavfile.c:60-63 semantics).
    x = (np.clip(np.real(x), -32768, 32767)
         + 1j * np.clip(np.imag(x), -32768, 32767)).astype(np.complex64)

    # Analytic boundary: the first M&M error is bounded by 2*max|F|*gain
    # with gain=1 at cold start; its retard must fit the 4-rad budget.
    F = fir_reference_np(x[:cfg.block_len],
                         np.zeros(cfg.taps - 1, np.complex64),
                         make_fir_banks(cfg))
    a_t = float(cfg.timing_gains[0])
    worst_retard = a_t * 2.0 * float(np.abs(F).max())
    # The window's total slack beyond the drift term, in radians: the
    # ceil(4/f) jitter ticks plus the +8-tick margin (config.window_delta).
    f = float(cfg.timing_freq)
    slack_rad = (np.ceil(4.0 / f) + 8) * f
    assert worst_retard <= slack_rad, (worst_retard, slack_rad)
    # ... and it genuinely exceeds the nominal 4-rad jitter term alone:
    # the +8 margin is load-bearing for full-scale int16, not cosmetic.
    assert worst_retard > 4.0, worst_retard

    d = StreamDemodulator(cfg)
    got = np.concatenate([d.process(x), d.finish()])
    assert d.fallback_blocks == 0

    sym, _ = scalar.demod_stream_np(cfg, x[:n],
                                    scalar.initial_state(cfg))
    # Block-boundary gate rounding differs between one long oracle call and
    # the per-block driver; compare decision structure per driver semantics:
    st = scalar.initial_state(cfg)
    parts = []
    for b in range(n // cfg.block_len):
        s, st = scalar.demod_stream_np(
            cfg, x[b * cfg.block_len:(b + 1) * cfg.block_len], st)
        parts.append(s)
    oracle = np.concatenate(parts)
    assert len(got) == len(oracle)
    np.testing.assert_array_equal(np.sign(got["re"]), np.sign(oracle["re"]))
    np.testing.assert_array_equal(got["locked_once"], oracle["locked_once"])


def test_16bit_signal_onset_after_silence_flags_and_recovers():
    """A realistic pre-pass recording: blocks of silence (AGC gain
    integrates upward), then the full-scale signal appears. The boosted
    gain pushes the first M&M corrections beyond the 4-rad budget — the
    window flags, and the driver must splice the exact oracle result so the
    output remains sample-exact end-to-end."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    L = cfg.block_len
    quiet = 5 * L
    t = np.arange(2 * L)
    # Half-symbol-rate tone: Q alternates sign every symbol, so consecutive
    # M&M errors reinforce instead of cancelling — worst case for the gate.
    tone = (32000.0 * np.exp(
        1j * 2 * np.pi * (cfg.symrate / 2) / cfg.samplerate * t)
    ).astype(np.complex64)
    x = np.concatenate([np.zeros(quiet, np.complex64), tone])

    d = StreamDemodulator(cfg)
    got = np.concatenate([d.process(x), d.finish()])
    assert d.fallback_blocks >= 1   # the onset block tripped the window

    st = scalar.initial_state(cfg)
    parts = []
    for b in range(len(x) // L):
        s, st = scalar.demod_stream_np(cfg, x[b * L:(b + 1) * L], st)
        parts.append(s)
    oracle = np.concatenate(parts)
    # Decision structure must match the exact per-block oracle everywhere
    # (same fires, same lock history, same signs); the clean blocks run the
    # XLA fast path whose conv rounds differently from the numpy FIR, so
    # float values agree to loop noise, not bitwise (the flagged block
    # itself IS the oracle, bit-for-bit).
    assert len(got) == len(oracle)
    np.testing.assert_array_equal(got["locked_once"], oracle["locked_once"])
    np.testing.assert_array_equal(np.sign(got["re"]), np.sign(oracle["re"]))
    np.testing.assert_array_equal(np.sign(got["im"]), np.sign(oracle["im"]))
    assert float(np.abs(got["re"] - oracle["re"]).max()) < 0.1
    assert float(np.abs(got["im"] - oracle["im"]).max()) < 0.1


def test_max_timing_skew_stays_in_window():
    """Symbol clock off by more than the 2**-12 relative clamp
    (timing.c:7,83-86): t_freq pegs at the deviation bound for the whole
    recording — the exact worst case the window_delta drift term is sized
    for. Must run flag-free with the NCO frequency pinned at the clamp."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n = 12 * cfg.block_len
    skew = 1.5 * 2.0 ** -12       # beyond the clamp -> loop pegs at clamp
    x0, _ = synth_psk(int(1.01 * n * cfg.symrate / cfg.samplerate) + 64,
                      cfg.samplerate, carrier_hz=120.0, amplitude=6000.0,
                      snr_db=25.0, seed=11)
    # Resample by (1+skew): every symbol is skew shorter, i.e. the symbol
    # clock runs 1.5x past the NCO deviation clamp. (synth_psk's integer
    # fine-grid decimation cannot express a 0.04% rate offset directly.)
    p = np.arange(n) * (1.0 + skew)
    x = (np.interp(p, np.arange(len(x0)), x0.real)
         + 1j * np.interp(p, np.arange(len(x0)), x0.imag)).astype(np.complex64)

    d = StreamDemodulator(cfg)
    np.concatenate([d.process(x), d.finish()])
    assert d.fallback_blocks == 0
    assert d.pll_locked_once
    # t_freq pinned at center + dev_max (clamped, timing.c:83-86).
    t_max = float(cfg.timing_freq) + float(cfg.timing_dev_max)
    assert abs(d.mm_omega - t_max) < 1e-6, (d.mm_omega, t_max)
