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

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1,
                            converge="bitwise")
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
    """OQPSK turbo in 'symbols' mode: the dual-slot state machine's parity
    is part of the carry, so the fixpoint handles it like any other loop
    state (gauge mode has its own test below)."""
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
    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1,
                            converge="symbols")
    assert res.converged
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 4
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))


def test_turbo_non_convergence_reported():
    """max_passes too low for the boundary carries to propagate: the result
    must report converged=False with a nonzero residual, while the symbols
    remain a valid demodulation. (With a single pass every chunk past the
    first acquires cold, so each may lock in a different Costas quadrant —
    the QPSK phase ambiguity — which is exactly why callers get a
    `converged` flag to act on.)"""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    # Chunks long enough that even a cold-started chunk re-locks within the
    # chunk (the p_err EMA needs ~3300 fires to fall from 1000 to the lock
    # threshold at pole 0.001 — pll.c:7,36,117).
    n = chunks * 8 * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=18.0, seed=31)
    x = x[:n]

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=1)
    assert not res.converged
    assert res.passes == 1
    assert res.max_residual > 0.0
    assert not res.fell_back

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    # Cold-started chunk boundaries may add/drop a few fires relative to the
    # sequential pass; counts stay close, the stream still ends locked, and
    # the soft symbols sit at the AGC-settled constellation magnitude.
    assert abs(len(res.symbols) - len(seq)) <= 2 * chunks
    assert res.symbols["locked_once"][-1] == 1
    tail_mag = np.hypot(res.symbols["re"], res.symbols["im"])[-500:]
    assert 100.0 < float(np.median(tail_mag)) < 300.0


def test_turbo_flagged_chunk_falls_back_sequential():
    """A recording whose signal onset trips the candidate window (silence
    boosts the AGC gain, then a half-symrate tone lands a >8 rad timing
    correction — see tests/test_adversarial.py) must flag inside turbo's
    batched pass and trigger the sequential fallback, ending identical to
    StreamDemodulator (whose own safety net handles the same block)."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    L = cfg.block_len
    quiet = 5 * L
    t = np.arange(3 * L)
    # 2e7 (not the 2e6 of test_adversarial): whether the onset's M&M retard
    # clears the window depends on the PLL sweep phase at onset, and turbo
    # lanes reach the onset with a different (chained) sweep position than
    # the sequential path — 10x margin trips regardless of phase.
    tone = (2.0e7 * np.exp(
        1j * 2 * np.pi * (cfg.symrate / 2) / cfg.samplerate * t)
    ).astype(np.complex64)
    x = np.concatenate([np.zeros(quiet, np.complex64), tone])

    res = demod_array_turbo(cfg, x, chunks=4, max_passes=5)
    assert res.fell_back

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert d.fallback_blocks >= 1
    np.testing.assert_array_equal(res.symbols["re"], seq["re"])
    np.testing.assert_array_equal(res.symbols["im"], seq["im"])


def test_turbo_gauge_converges_in_constant_passes():
    """The gauge mode (the QPSK default): warmup acquisition + one-shot
    quadrant resolution converge in O(1) passes regardless of the chunk
    count — the whole point of the gauge machinery (demod/turbo.py module
    docstring). Decisions and lock telemetry match the sequential
    demodulator exactly once locked; soft values agree within loop noise."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=18.0, seed=31)
    x = x[:n + 5000]                      # exercise the gauge-rotated tail

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    assert res.converged, res.max_residual
    assert res.passes <= 3, res.passes    # O(1), NOT O(chunks)
    assert not res.fell_back

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 8
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                  seq["locked_once"][skip:])
    # Soft values: gauge converges on stable DECISIONS while the slow
    # p_freq integrator is still a pass or two from its asymptote, so the
    # int8 levels sit a little further from the sequential trajectory than
    # the bitwise mode's (MAD < 2); ~4 quanta on a ~65 constellation is
    # well inside the 18 dB channel noise.
    q = lambda v: np.trunc(np.clip(v * 0.5, -127, 127))
    mad = np.mean(np.abs(q(res.symbols["re"]) - q(seq["re"])))
    assert mad < 4.0, mad


def test_turbo_gauge_slow_state_propagation_blocks_convergence():
    """Chunks much shorter than the p_err EMA memory: decisions stabilize
    while the lock state is still propagating one chunk per pass — the
    entry-residual criterion must keep convergence undeclared until the
    trajectory settles (GAUGE_ENTRY_TOL in demod/turbo.py). With only two
    passes allowed this recording must therefore report converged=False."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    n = chunks * 2 * cfg.block_len        # 2 blocks/chunk: EMA >> chunk
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=22.0, seed=21)
    x = x[:n]
    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=2)
    assert not res.converged
    assert res.max_residual > 0.0


def test_turbo_gauge_fused_equals_loop(monkeypatch):
    """The fused single-dispatch gauge program (demod/turbo.py
    _fused_gauge_fn) must reproduce the per-pass host loop: same
    convergence verdict, same pass count, and the same decision stream.
    (Soft values may differ in the last float32 bit: the loop does its
    gauge bookkeeping in host float64, the fused program in device
    float32 — decisions are compared, not raw floats.)"""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=18.0, seed=31)
    x = x[:n]

    fused = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    monkeypatch.setenv("METEOR_DEMOD_NO_FUSED", "1")
    loop = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)

    assert fused.converged == loop.converged
    assert fused.passes == loop.passes
    assert len(fused.symbols) == len(loop.symbols)
    np.testing.assert_array_equal(np.sign(fused.symbols["re"]),
                                  np.sign(loop.symbols["re"]))
    np.testing.assert_array_equal(np.sign(fused.symbols["im"]),
                                  np.sign(loop.symbols["im"]))
    np.testing.assert_array_equal(fused.symbols["locked_once"],
                                  loop.symbols["locked_once"])


def test_turbo_gauge_fused_oqpsk_equals_loop(monkeypatch):
    """The fused gauge program's OQPSK branch (device-side parity
    cross-check and warmup-grid substitution) must reproduce the per-pass
    host loop at the decision level, including identical gauges — the
    assembly re-pairing consumes both identically."""
    cfg = DemodConfig(samplerate=240000, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=120.0, amplitude=6000.0, snr_db=18.0,
                     seed=33)
    x = x[:n]

    fused = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    monkeypatch.setenv("METEOR_DEMOD_NO_FUSED", "1")
    loop = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)

    assert fused.converged == loop.converged
    assert fused.passes == loop.passes
    np.testing.assert_array_equal(np.asarray(fused.gauges),
                                  np.asarray(loop.gauges))
    assert np.any(np.asarray(fused.gauges) % 2), fused.gauges
    assert len(fused.symbols) == len(loop.symbols)
    np.testing.assert_array_equal(np.sign(fused.symbols["re"]),
                                  np.sign(loop.symbols["re"]))
    np.testing.assert_array_equal(np.sign(fused.symbols["im"]),
                                  np.sign(loop.symbols["im"]))
    np.testing.assert_array_equal(fused.symbols["locked_once"],
                                  loop.symbols["locked_once"])


def test_turbo_gauge_fused_continuation_resumes_loop():
    """When the fused program's two passes do not converge and budget
    remains, fused_gauge_run must hand the pass-3 entries to the per-pass
    loop (gauge_fixpoint resume=...) instead of giving up at pass 2: with
    chunks shorter than the p_err EMA memory the third pass runs, and the
    result is still a valid demodulation."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    n = chunks * 2 * cfg.block_len        # 2 blocks/chunk: EMA >> chunk
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=22.0, seed=21)
    x = x[:n]
    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=3)
    assert res.passes == 3                # pass 3 ran on the resumed loop
    assert not res.fell_back
    assert res.symbols["locked_once"][-1] == 1


def test_turbo_gauge_oqpsk():
    """OQPSK gauge mode (the OQPSK default): the coupled quadrant x
    half-symbol-labeling gauge group is resolved in O(1) passes, and
    assembly re-pairs the global half-value stream with insert/drop
    stitches at odd-parity boundaries (demod/turbo.py
    _assemble_oqpsk_gauge). Decisions must match the sequential
    demodulator exactly past acquisition, including through the
    final-lane-gauge sequential tail."""
    cfg = DemodConfig(samplerate=240000, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=120.0, amplitude=6000.0, snr_db=18.0,
                     seed=33)
    x = x[:n + 5000]                      # exercise the odd-gauge tail path

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    assert res.converged, res.max_residual
    assert res.passes <= 3, res.passes    # O(1), NOT O(chunks)
    assert not res.fell_back
    # The whole point is resolving nontrivial gauges: this seed must
    # produce at least one odd-parity (label-shifting) lane, or the
    # re-pairing machinery went untested.
    assert res.gauges is not None and np.any(np.asarray(res.gauges) % 2), \
        res.gauges

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 8
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                  seq["locked_once"][skip:])


def test_turbo_gauge_oqpsk_fractional_ratio():
    """OQPSK gauge mode at the production LRPT ratio 230.4 ksps / 80 ksym/s
    (2.88 samples/symbol — NOT an integer). Regression: sim.synth_psk's old
    fallback grid rounded this ratio to an effective 79.2 kbaud — a 1%
    symbol-clock error, 40x the demod's M&M clamp — so every acquisition
    landed in a different marginal pseudo-lock and the gauge fixpoint
    (correctly) never converged. With the exact rational synth grid the
    coupled quadrant/half-symbol gauge group must resolve in O(1) passes
    and match the sequential demodulator exactly."""
    cfg = DemodConfig(samplerate=230400, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks, kb = 4, 45            # chunk long enough to mature the warmup
                                  # freq integrator (default_warmup_blocks)
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=400.0, amplitude=6000.0, snr_db=18.0,
                     seed=5)
    x = x[:n]

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    assert res.converged, res.max_residual
    assert res.passes <= 3, res.passes

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 8
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                  seq["locked_once"][skip:])


def test_turbo_strict_falls_back_when_not_converged():
    """strict=True (the CLI -T contract): a fixpoint that cannot report
    convergence (max_passes=1 in gauge mode) must fall back to the exact
    sequential demodulation instead of emitting the best-effort assembly."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 4
    n = chunks * 4 * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=22.0, seed=21)
    x = x[:n]

    res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=1, strict=True)
    assert res.fell_back and not res.converged

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    np.testing.assert_array_equal(res.symbols["re"], seq["re"])
    np.testing.assert_array_equal(res.symbols["im"], seq["im"])


def test_turbo_noise_only_input():
    """Pure AWGN (no signal): the PLL never locks, warmup estimates are
    meaningless, and the gauge fixpoint must either converge on the
    (empty, nothing-emitted-before-lock) decision stream or report
    non-convergence — never crash or claim a lock. With strict=True a
    FULLY unverified run redoes the file sequentially (bitwise-equal
    symbols); a bounded fallback keeps the verified prefix, whose raw
    float symbols may differ from the sequential program at FMA level —
    the product-level contract (the writer gates emission on locked_once,
    main.c:312, so the CLI writes NOTHING for noise) holds either way."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    rng = np.random.default_rng(7)
    n = 4 * 8 * cfg.block_len
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64) * 900.0

    res = demod_array_turbo(cfg, x, chunks=4, max_passes=4, strict=True)
    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert not seq["locked_once"].any()
    assert not res.symbols["locked_once"].any()
    if res.fell_back and res.fallback_samples == n:
        np.testing.assert_array_equal(res.symbols["re"], seq["re"])
        np.testing.assert_array_equal(res.symbols["im"], seq["im"])
    elif res.fell_back:
        # Bounded fallback: cost strictly below a full redo, symbol count
        # within the usual chunk-boundary slack.
        assert 0 < res.fallback_samples < n
        assert abs(len(res.symbols) - len(seq)) <= 2 * 4


def test_turbo_strict_bounded_fallback_resumes_from_prefix(monkeypatch):
    """strict=True with a non-converged fixpoint must NOT redo the whole
    file: the verified prefix of chunk lanes is accepted and the exact
    sequential path resumes from that boundary's carry, so the fallback
    cost is proportional to the divergent SUFFIX (VERDICT r2 item 4). The
    convergence verdict is poisoned from lane P onward on an otherwise
    converged run; the sequential work is counted through the pipeline."""
    from meteor_demod_tpu.demod import pipeline, turbo

    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks, kb, P = 8, 16, 6
    chunk_len = kb * cfg.block_len
    n = chunks * chunk_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=150.0, amplitude=6000.0,
                     snr_db=18.0, seed=31)
    x = x[:n]

    real_run = turbo.fused_gauge_run

    def poisoned(*a, **k):
        f_np, outs, K, passes, conv, resid, lane_ok, stats = \
            real_run(*a, **k)
        assert conv, "fixture must converge before poisoning"
        ok = np.ones(chunks, bool)
        ok[P:] = False
        return f_np, outs, K, passes, False, max(resid, 0.5), ok, stats

    monkeypatch.setattr(turbo, "fused_gauge_run", poisoned)

    fed = []
    real_sd = pipeline.StreamDemodulator

    class CountingSD(real_sd):
        def process(self, samples):
            fed.append(len(samples))
            return super().process(samples)

    monkeypatch.setattr(pipeline, "StreamDemodulator", CountingSD)

    res = turbo.demod_array_turbo(cfg, x, chunks=chunks, max_passes=4,
                                  strict=True)
    assert res.fell_back and not res.converged
    # Cost proportionality: exactly the divergent suffix is re-demodulated.
    assert res.fallback_samples == n - P * chunk_len
    assert sum(fed) == n - P * chunk_len

    d = real_sd(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 8
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                  seq["locked_once"][skip:])


def test_turbo_strict_bounded_fallback_oqpsk(monkeypatch):
    """The bounded strict fallback through the OQPSK gauge assembly: the
    suffix is demodulated in the prefix-exit lane's own gauge and joins
    the global half-value re-pairing as the tail stream, exactly like the
    sub-multiple tail of a converged run."""
    from meteor_demod_tpu.demod import turbo

    cfg = DemodConfig(samplerate=240000, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks, kb, P = 8, 16, 5
    chunk_len = kb * cfg.block_len
    n = chunks * chunk_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=120.0, amplitude=6000.0, snr_db=18.0,
                     seed=33)
    x = x[:n]

    real_run = turbo.fused_gauge_run

    def poisoned(*a, **k):
        f_np, outs, K, passes, conv, resid, lane_ok, stats = \
            real_run(*a, **k)
        assert conv, "fixture must converge before poisoning"
        ok = np.ones(chunks, bool)
        ok[P:] = False
        return f_np, outs, K, passes, False, max(resid, 0.5), ok, stats

    monkeypatch.setattr(turbo, "fused_gauge_run", poisoned)

    res = turbo.demod_array_turbo(cfg, x, chunks=chunks, max_passes=4,
                                  strict=True)
    assert res.fell_back and not res.converged
    assert res.fallback_samples == n - P * chunk_len

    d = StreamDemodulator(cfg)
    seq = np.concatenate([d.process(x), d.finish()])
    assert len(res.symbols) == len(seq)
    skip = len(seq) // 8
    np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                  np.sign(seq["re"][skip:]))
    np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                  np.sign(seq["im"][skip:]))
    np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                  seq["locked_once"][skip:])


def test_turbo_gauge_doppler_ramp():
    """Gauge turbo on a MOVING carrier — the reference's actual operating
    regime (a LEO pass ramps the carrier; pll.c:99-106's frequency
    integrator exists to track it). The gauge warmup lanes acquire on a
    PAST carrier value (each chunk's warmup sees signal from one chunk
    earlier), so the fixpoint must pull the per-chunk carrier estimates
    forward. Measured on this geometry (8 chunks x 16 blocks, 0.14 s per
    chunk): the realistic LEO peak rate (31 Hz/s, sim.leo_doppler_hz)
    converges in the static 2 passes; stress rates grow the pass count
    roughly +1 per ~200 Hz/s (100 -> 3, 300 -> 4, 500 -> 5) as the
    integrator state propagates one chunk per pass. Decisions and lock
    telemetry stay EXACTLY equal to the sequential demod in all cases."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    for ramp, max_p, exp_p in ((31.0, 4, 2), (300.0, 6, 4)):
        x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                         cfg.samplerate, carrier_hz=100.0,
                         carrier_ramp_hz_s=ramp, amplitude=6000.0,
                         snr_db=18.0, seed=31)
        x = x[:n]
        res = demod_array_turbo(cfg, x, chunks=chunks, max_passes=max_p)
        assert res.converged, (ramp, res.max_residual)
        assert res.passes <= exp_p, (ramp, res.passes)
        assert not res.fell_back

        d = StreamDemodulator(cfg)
        seq = np.concatenate([d.process(x), d.finish()])
        assert len(res.symbols) == len(seq)
        skip = len(seq) // 8
        np.testing.assert_array_equal(np.sign(res.symbols["re"][skip:]),
                                      np.sign(seq["re"][skip:]))
        np.testing.assert_array_equal(np.sign(res.symbols["im"][skip:]),
                                      np.sign(seq["im"][skip:]))
        np.testing.assert_array_equal(res.symbols["locked_once"][skip:],
                                      seq["locked_once"][skip:])
