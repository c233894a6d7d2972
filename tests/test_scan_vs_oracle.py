"""The central correctness property: the vectorized per-symbol scan must
reproduce the sequential per-tick recurrence when both consume the same FIR
outputs (SURVEY.md section 7, hard part 1).

Exactness contract: the *decision structure* — which ticks fire, how many
symbols are produced, slot sequencing, and lock transitions — must match the
scalar oracle exactly. Symbol *values* match to float32-FMA tolerance: XLA
contracts a*b+c into fused multiply-adds (1-ulp differences in the AGC gain
EMA, amplified by the sample magnitude), which is backend-dependent and
cannot be bit-matched from numpy; the loops are contractive so the
difference stays bounded at ~1e-4 relative."""

import numpy as np
import jax.numpy as jnp
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod import scalar
from meteor_demod_tpu.demod.pipeline import (StreamDemodulator, demod_array,
                                             carry_to_scalar_state)
from meteor_demod_tpu.dsp.fir import make_fir_banks, polyphase_fir_block
from meteor_demod_tpu.sim import synth_psk


def oracle_with_conv_fir(cfg, x):
    """Run the scalar oracle block-by-block on conv-computed FIR outputs, so
    its inputs are bit-identical to what the scan consumes."""
    from meteor_demod_tpu.dsp.fir import f32_to_iq, iq_to_f32
    banks = make_fir_banks(cfg)
    st = scalar.initial_state(cfg)
    tail = jnp.zeros((cfg.taps - 1, 2), dtype=jnp.float32)
    out = []
    L = cfg.block_len
    for i in range(0, len(x) - len(x) % L, L):
        block = x[i:i + L]
        F, tail = polyphase_fir_block(jnp.asarray(iq_to_f32(block)), tail,
                                      banks)
        syms, st = scalar.demod_stream_np(cfg, block, st,
                                          F=f32_to_iq(np.asarray(F)))
        out.append(syms)
    return np.concatenate(out), st


def _signal(cfg, n_samples, oqpsk=False, seed=3, carrier_hz=80.0):
    nsym = int(n_samples * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=oqpsk, carrier_hz=carrier_hz, amplitude=6000.0,
                     snr_db=25.0, seed=seed, dc_offset=30 + 20j)
    return x[:n_samples]


@pytest.mark.parametrize("mode", ["qpsk", "oqpsk"])
def test_scan_matches_oracle_bitexact(mode, qpsk_cfg, oqpsk_cfg):
    cfg = oqpsk_cfg if mode == "oqpsk" else qpsk_cfg
    n = 3 * cfg.block_len
    x = _signal(cfg, n, oqpsk=(mode == "oqpsk"))

    ref_syms, ref_state = oracle_with_conv_fir(cfg, x)

    d = StreamDemodulator(cfg)
    got = np.concatenate([d.process(x), d.finish()])
    assert d.fallback_blocks == 0

    # Decision structure: same symbol count (same fire ticks), same lock
    # transition history.
    assert len(got) == len(ref_syms), (len(got), len(ref_syms))
    np.testing.assert_array_equal(got["locked_once"], ref_syms["locked_once"])

    # Values: float32-FMA tolerance (see module docstring).
    np.testing.assert_allclose(got["re"], ref_syms["re"], rtol=5e-4, atol=0.05)
    np.testing.assert_allclose(got["im"], ref_syms["im"], rtol=5e-4, atol=0.05)

    st = carry_to_scalar_state(cfg, d._carry)
    for k in ("t_phase", "t_freq", "t_prev", "p_phase", "p_freq", "p_err",
              "agc_gain", "inphase", "updown"):
        np.testing.assert_allclose(
            np.float32(st[k]), np.float32(ref_state[k]), rtol=5e-4, atol=1e-3,
            err_msg=k)
    assert st["locked"] == ref_state["locked"]
    assert st["slot"] == ref_state["slot"]
    np.testing.assert_allclose(st["agc_bias"], ref_state["agc_bias"],
                               rtol=5e-4, atol=0.05)


def test_chunk_invariance(qpsk_cfg):
    """Feeding the stream in odd-sized chunks must not change the output."""
    cfg = qpsk_cfg
    x = _signal(cfg, 2 * cfg.block_len + 777)

    d1 = StreamDemodulator(cfg)
    out1 = np.concatenate([d1.process(x), d1.finish()])

    d2 = StreamDemodulator(cfg)
    parts = []
    pos = 0
    rng = np.random.default_rng(0)
    while pos < len(x):
        take = int(rng.integers(1, 5000))
        parts.append(d2.process(x[pos:pos + take]))
        pos += take
    parts.append(d2.finish())
    out2 = np.concatenate(parts)

    np.testing.assert_array_equal(out1["re"], out2["re"])
    np.testing.assert_array_equal(out1["im"], out2["im"])


def test_block_size_invariance():
    """Different block lengths must produce the same symbol stream."""
    cfg_a = DemodConfig(samplerate=230400, block_len=2048)
    cfg_b = DemodConfig(samplerate=230400, block_len=4096)
    x = _signal(cfg_a, 8192)
    out_a = demod_array(cfg_a, x)
    out_b = demod_array(cfg_b, x)
    assert len(out_a) == len(out_b)
    # FIR conv accumulation order can differ per block size; allow float slop.
    np.testing.assert_allclose(out_a["re"], out_b["re"], rtol=1e-3, atol=0.3)
    np.testing.assert_allclose(out_a["im"], out_b["im"], rtol=1e-3, atol=0.3)


def test_demod_locks_on_clean_signal(qpsk_cfg):
    cfg = qpsk_cfg
    x = _signal(cfg, 6 * cfg.block_len, carrier_hz=50.0)
    d = StreamDemodulator(cfg)
    d.process(x)
    assert d.pll_locked_once
    assert d.pll_locked
    # Carrier estimate should be near the injected 50 Hz.
    assert abs(d.carrier_freq_hz() - 50.0) < 25.0
    # Symbol rate estimate near 72k.
    assert abs(d.symbol_rate_hz() - cfg.symrate) < 50.0


def test_chunk_invariance_with_chained_path(qpsk_cfg):
    """A small chunk (leaving blocks in flight) followed by a chained-span
    chunk must keep the symbol stream in order (regression: sync() inside
    process() once deferred in-flight symbols BEHIND the chained span's)."""
    cfg = qpsk_cfg
    chain = 8
    n = (3 + 2 * chain) * cfg.block_len + 777
    x = _signal(cfg, n, seed=5)

    d1 = StreamDemodulator(cfg)
    one_shot = np.concatenate([d1.process(x), d1.finish()])

    d2 = StreamDemodulator(cfg)
    parts = [d2.process(x[:3 * cfg.block_len]),          # leaves 2 in flight
             d2.process(x[3 * cfg.block_len:]),          # triggers chaining
             d2.finish()]
    mixed = np.concatenate(parts)

    assert len(mixed) == len(one_shot)
    # Order must match; values may differ between the chained and per-block
    # programs by FMA-ordering noise only.
    skip = len(one_shot) // 4
    np.testing.assert_array_equal(np.sign(mixed["re"][skip:]),
                                  np.sign(one_shot["re"][skip:]))
    np.testing.assert_array_equal(np.sign(mixed["im"][skip:]),
                                  np.sign(one_shot["im"][skip:]))
    mad = np.mean(np.abs(mixed["re"][skip:] - one_shot["re"][skip:]))
    assert mad < 1.0, mad


def test_oqpsk_split_symbol_boundaries_match_oracle(oqpsk_cfg):
    """OQPSK pairing re-aligns at block entry with a completion pre-fire
    when a symbol straddles the boundary (carry slot==2). Run enough
    blocks that both boundary parities occur, assert the pre-fire path was
    actually exercised, and require oracle-exact decisions throughout."""
    import jax
    from meteor_demod_tpu.demod.scan import make_block_demod
    from meteor_demod_tpu.demod.state import init_carry
    from meteor_demod_tpu.dsp.fir import iq_to_f32

    cfg = oqpsk_cfg
    n_blocks = 10
    x = _signal(cfg, n_blocks * cfg.block_len, oqpsk=True, seed=11)
    xf = iq_to_f32(x)

    demod = jax.jit(make_block_demod(cfg))
    carry = init_carry(cfg)
    split_boundaries = 0
    outs = []
    for b in range(n_blocks):
        if b and int(carry.slot) == 2:
            split_boundaries += 1
        carry, o = demod(carry, xf[b * cfg.block_len:(b + 1) * cfg.block_len])
        m = np.asarray(o.valid).astype(bool)
        outs.append((np.asarray(o.sym_re)[m], np.asarray(o.sym_im)[m],
                     np.asarray(o.locked_once)[m]))
    assert int(carry.flags) == 0
    assert split_boundaries >= 1, "no boundary exercised the pre-fire"

    ref_syms, _ = oracle_with_conv_fir(cfg, x)
    got_re = np.concatenate([r for r, _, _ in outs])
    got_im = np.concatenate([i for _, i, _ in outs])
    got_lo = np.concatenate([l for _, _, l in outs])
    assert len(got_re) == len(ref_syms)
    np.testing.assert_array_equal(got_lo, ref_syms["locked_once"])
    # Values: compare only the first blocks — past ~6 blocks the scan's and
    # the oracle's independently-accumulated FMA noise (~1e-4 on t_phase)
    # flips an occasional gate tick, for QPSK and OQPSK alike (a property
    # of ANY two float32 implementations, same as vs the C binary; the
    # golden tests bound it at the SNR level). Per-block decisions ARE
    # exact given the same entry carry — asserted by the 3-block bitwise
    # test above and the count/lock equality over all 10 blocks here.
    n4 = sum(len(r) for r, _, _ in outs[:4])
    np.testing.assert_allclose(got_re[:n4], ref_syms["re"][:n4],
                               rtol=5e-4, atol=0.05)
    np.testing.assert_allclose(got_im[:n4], ref_syms["im"][:n4],
                               rtol=5e-4, atol=0.05)
