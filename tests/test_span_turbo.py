"""Streaming span turbo: chunk-parallel demod of buffered mid-stream spans.

demod_span_turbo (demod/turbo.py) continues an ongoing stream from its
EXACT carry: lane 0 is the stream state, warmup + gauge resolution align
the other lanes, and the strict-turbo acceptance (verified lane prefix)
guarantees decision-final output; anything unverified is left for the
sequential path. The VERDICT r2 item 5 workload: file-backed / bursty
single streams (/root/reference/README.md:75-92) at far above the
per-block dispatch rate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod import turbo
from meteor_demod_tpu.demod.pipeline import StreamDemodulator, egress
from meteor_demod_tpu.demod.turbo import demod_span_turbo
from meteor_demod_tpu.dsp.fir import iq_to_f32
from meteor_demod_tpu.sim import synth_psk


def _cfg():
    return DemodConfig(samplerate=230400, block_len=2048, symrate=72000.0)


def _signal(cfg, n, seed=11, carrier=300.0):
    x, _ = synth_psk(int(n / cfg.osf) + 64, cfg.samplerate,
                     symrate=cfg.symrate, carrier_hz=carrier,
                     amplitude=6000.0, snr_db=18.0, seed=seed)
    return x[:n]


def test_span_stream_matches_sequential():
    """StreamDemodulator(span_turbo=True) fed in arbitrary pieces must
    emit the same number of symbols with identical signs as the plain
    sequential stream — spans, the chained path, and the oracle tail all
    interleaving. Cold start included: the first span's lane 0 entry is
    the cold initial state, exactly like demod_array_turbo's."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    span_n = C * kb * L
    n = 2 * span_n + 5 * L + 777
    x = _signal(cfg, n)

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    out = []
    pos = 0
    rng = np.random.default_rng(0)
    while pos < n:
        m = int(rng.integers(10000, 400000))
        out.append(d.process(x[pos:pos + m]))
        pos += m
    out.append(d.finish())
    out = np.concatenate(out)

    assert d.spans_run >= 2
    assert d.span_fallbacks == 0
    assert len(out) == len(ref)
    np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
    np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))
    np.testing.assert_array_equal(out["locked_once"], ref["locked_once"])


def test_span_stdin_sized_chunks_run_spans():
    """Per-chunk feeding at the CLI's stdin granularity (~8k samples per
    read, far below the chained-dispatch span) must still accumulate and
    run spans: span mode BUFFERS sub-span input instead of draining it
    through the sequential paths (the r4 advisor finding — small-chunk
    feeds previously gave spans_run == 0 and the span machinery never
    executed from the CLI). Output must match the sequential reference
    sign-for-sign, with the tail drained at finish()."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    span_n = C * kb * L
    n = 2 * span_n + 3 * L + 917
    x = _signal(cfg, n, seed=31)

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    out = []
    emitted_before_first_span = None
    for pos in range(0, n, 8192):     # the CLI stdin read granularity
        out.append(d.process(x[pos:pos + 8192]))
        if emitted_before_first_span is None and d.spans_run:
            emitted_before_first_span = sum(len(o) for o in out[:-1])
    out.append(d.finish())
    out = np.concatenate(out)

    assert d.spans_run >= 2
    assert d.span_fallbacks == 0
    # Span mode buffers: nothing was emitted through a sequential drain
    # before the first span ran.
    assert emitted_before_first_span == 0
    assert len(out) == len(ref)
    np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
    np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))
    np.testing.assert_array_equal(out["locked_once"], ref["locked_once"])


def test_span_turbo_exit_carry_continues_stream():
    """The exit carry returned by demod_span_turbo (rotated into the
    emitted gauge) must continue the stream seamlessly: demodulating the
    suffix sequentially from it yields the same decisions as the
    all-sequential path."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    nwarm = 30
    span_n = C * kb * L
    tail_n = 6 * L
    n = nwarm * L + span_n + tail_n
    x = _signal(cfg, n, seed=13)
    xf = iq_to_f32(x)

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan")
    head = d.process(x[:nwarm * L])
    d.sync()
    head = np.concatenate([head] + d._backlog) if d._backlog else head
    d._backlog = []
    assert d.pll_locked

    res = demod_span_turbo(cfg, egress(d._carry),
                           xf[nwarm * L:nwarm * L + span_n],
                           chunks=C, backend="scan")
    assert res.converged and res.verified_lanes == C
    assert res.consumed == span_n

    d2 = StreamDemodulator(cfg, backend="scan")
    d2._carry = jax.tree_util.tree_map(jnp.asarray, res.exit_carry)
    tail = np.concatenate([d2.process(x[nwarm * L + span_n:]),
                           d2.finish()])

    out = np.concatenate([head, res.symbols, tail])
    assert len(out) == len(ref)
    np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
    np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))


def test_span_stream_oqpsk_matches_sequential():
    """OQPSK span streaming: the accepted prefix additionally shrinks to
    an even-gauge boundary (demod_span_turbo docstring) so the exit carry
    rotates by pure sign flips; unconsumed lanes stay buffered for the
    next span. The emitted half-symbol pairing and the stream hand-off
    must match the sequential reference sign-for-sign."""
    cfg = DemodConfig(samplerate=230400, block_len=2048, symrate=80000.0,
                      oqpsk=True)
    L = cfg.block_len
    C, kb = 8, 8
    span_n = C * kb * L
    n = 2 * span_n + 4 * L + 501
    x, _ = synth_psk(int(n / cfg.osf) + 64, cfg.samplerate,
                     symrate=cfg.symrate, oqpsk=True, carrier_hz=220.0,
                     amplitude=6000.0, snr_db=18.0, seed=29)
    x = x[:n]

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    # Feed span-sized bursts so the span path (not the chained drain
    # between small feeds) sees the buffer; the tail goes in fragments.
    out = [d.process(x[:span_n]), d.process(x[span_n:2 * span_n])]
    pos = 2 * span_n
    rng = np.random.default_rng(1)
    while pos < n:
        m = int(rng.integers(10000, 60000))
        out.append(d.process(x[pos:pos + m]))
        pos += m
    out.append(d.finish())
    out = np.concatenate(out)

    assert d.spans_run >= 2
    assert len(out) == len(ref)
    np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
    np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))
    np.testing.assert_array_equal(out["locked_once"], ref["locked_once"])


def test_span_unverified_prefix_bounded_fallback(monkeypatch):
    """A span whose fixpoint verdict fails from lane P onward must consume
    only the verified prefix; the stream re-demodulates the suffix through
    its normal sequential path, and the total output still matches the
    all-sequential reference sign-for-sign (the strict-turbo bounded
    fallback contract, applied to streaming)."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb, P = 8, 8, 5
    span_n = C * kb * L
    n = span_n + 3 * L
    x = _signal(cfg, n, seed=17)

    real_run = turbo.fused_gauge_run

    def poisoned(*a, **k):
        f_np, outs, K, passes, conv, resid, lane_ok, stats = \
            real_run(*a, **k)
        assert conv, "fixture must converge before poisoning"
        ok = np.ones(C, bool)
        ok[P:] = False
        return f_np, outs, K, passes, False, max(resid, 0.5), ok, stats

    monkeypatch.setattr(turbo, "fused_gauge_run", poisoned)

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    out = np.concatenate([d.process(x), d.finish()])

    assert d.spans_run == 1
    assert len(out) == len(ref)
    np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
    np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))


def test_span_all_unverified_falls_back_whole_span(monkeypatch):
    """P == 0 (nothing verified) must consume nothing and leave the whole
    span to the sequential path — output equals the sequential reference
    and the fallback counter records the rejection."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    span_n = C * kb * L
    x = _signal(cfg, span_n, seed=19)

    real_run = turbo.fused_gauge_run

    def poisoned(*a, **k):
        f_np, outs, K, passes, conv, resid, lane_ok, stats = \
            real_run(*a, **k)
        return f_np, outs, K, passes, False, 1.0, np.zeros(C, bool), stats

    monkeypatch.setattr(turbo, "fused_gauge_run", poisoned)

    d_ref = StreamDemodulator(cfg, backend="scan")
    ref = np.concatenate([d_ref.process(x), d_ref.finish()])

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    out = np.concatenate([d.process(x), d.finish()])

    assert d.spans_run == 1 and d.span_fallbacks == 1
    assert len(out) == len(ref)
    np.testing.assert_array_equal(out["re"], ref["re"])
    np.testing.assert_array_equal(out["im"], ref["im"])


def test_span_fused_equals_loop(monkeypatch):
    """demod_span_turbo's fused single-dispatch path (ext_init
    _fused_gauge_fn) must reproduce the per-pass loop: same verdict and
    pass count, same decision stream, same exit-carry decisions (soft
    values may differ in the last float32 bit — the loop's gauge
    bookkeeping is host float64, the fused program's device float32)."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    nwarm = 30
    span_n = C * kb * L
    x = _signal(cfg, nwarm * L + span_n, seed=23)
    xf = iq_to_f32(x)

    d = StreamDemodulator(cfg, backend="scan")
    d.process(x[:nwarm * L])
    d.sync()
    carry0 = egress(d._carry)
    span = xf[nwarm * L:]

    fused = demod_span_turbo(cfg, carry0, span, chunks=C, backend="scan")
    monkeypatch.setenv("METEOR_DEMOD_NO_FUSED", "1")
    loop = demod_span_turbo(cfg, carry0, span, chunks=C, backend="scan")

    assert fused.converged == loop.converged
    assert fused.passes == loop.passes
    assert fused.consumed == loop.consumed == span_n
    assert len(fused.symbols) == len(loop.symbols)
    np.testing.assert_array_equal(np.sign(fused.symbols["re"]),
                                  np.sign(loop.symbols["re"]))
    np.testing.assert_array_equal(np.sign(fused.symbols["im"]),
                                  np.sign(loop.symbols["im"]))
    for name in ("locked", "locked_once", "slot"):
        assert int(getattr(fused.exit_carry, name)) == \
            int(getattr(loop.exit_carry, name)), name


def test_span_noise_only_stream_never_claims_lock():
    """Pure AWGN through StreamDemodulator's span mode: the PLL never
    locks, warmup estimates are meaningless, and the span fixpoint must
    either verify honestly or fall back to the sequential path — never
    crash or claim a lock. The product-level contract (the writer gates
    emission on locked_once, main.c:312) holds regardless of which path
    each span took."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    n = C * kb * L + 3 * L
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64) * 900.0

    d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                          span_chunks=C, span_blocks=kb)
    out = np.concatenate([d.process(x), d.finish()])
    assert d.spans_run == 1
    assert not out["locked_once"].any()
    # Sanity: symbol count stays near the timing-nominal rate (the gate
    # free-runs on noise), whichever path produced it.
    nominal = n / cfg.osf
    assert abs(len(out) - nominal) < 0.05 * nominal + 64


def test_span_stream_doppler_ramp():
    """Span turbo on a MOVING carrier (VERDICT r4 item 1c): the span's
    warmup lanes acquire on carrier values up to a span (~1.1 s) stale,
    and the speculative successor-span entry state extrapolates a carrier
    that keeps ramping underneath it. At the realistic LEO peak rate
    (31 Hz/s) and at a 10x stress rate the strict verified-prefix
    acceptance must still hold the output sign-identical to the
    sequential stream, with zero span fallbacks at the realistic rate."""
    cfg = _cfg()
    L = cfg.block_len
    C, kb = 8, 8
    span_n = C * kb * L
    n = 2 * span_n + 5 * L + 777
    for ramp, max_fb in ((31.0, 0), (310.0, 2)):
        x, _ = synth_psk(int(n / cfg.osf) + 64, cfg.samplerate,
                         symrate=cfg.symrate, carrier_hz=200.0,
                         carrier_ramp_hz_s=ramp, amplitude=6000.0,
                         snr_db=18.0, seed=41)
        x = x[:n]

        d_ref = StreamDemodulator(cfg, backend="scan")
        ref = np.concatenate([d_ref.process(x), d_ref.finish()])

        d = StreamDemodulator(cfg, backend="scan", span_turbo=True,
                              span_chunks=C, span_blocks=kb)
        out = []
        pos = 0
        rng = np.random.default_rng(1)
        while pos < n:
            m = int(rng.integers(10000, 400000))
            out.append(d.process(x[pos:pos + m]))
            pos += m
        out.append(d.finish())
        out = np.concatenate(out)

        assert d.spans_run >= 2, (ramp, d.spans_run)
        assert d.span_fallbacks <= max_fb, (ramp, d.span_fallbacks)
        assert len(out) == len(ref)
        np.testing.assert_array_equal(np.sign(out["re"]), np.sign(ref["re"]))
        np.testing.assert_array_equal(np.sign(out["im"]), np.sign(ref["im"]))
        np.testing.assert_array_equal(out["locked_once"], ref["locked_once"])
