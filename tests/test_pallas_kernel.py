"""Pallas block-demod kernel vs the XLA scan path (interpret mode on CPU).

The kernel (kernels/block_demod.py) must reproduce the scan path's decision
structure exactly — same fire ticks, same symbol count, same lock
transitions, same integer state — with symbol values and float state equal
to float32-FMA tolerance (see tests/test_scan_vs_oracle.py for why values
are not bit-compared)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.scan import make_block_demod
from meteor_demod_tpu.demod.state import batch_carry
from meteor_demod_tpu.dsp.fir import iq_to_f32
from meteor_demod_tpu.kernels.block_demod import make_pallas_batch_demod
from meteor_demod_tpu.sim import synth_psk


@pytest.mark.parametrize("mode", ["qpsk", "oqpsk"])
def test_pallas_matches_scan(mode):
    oq = mode == "oqpsk"
    # Small block keeps interpret-mode runtime sane; group=4 does not divide
    # steps_per_block, so the dead-step grid padding is exercised too.
    cfg = DemodConfig(samplerate=230400, block_len=1024,
                      symrate=80000.0 if oq else 72000.0, oqpsk=oq)
    B = 4
    x = np.stack([
        synth_psk(500, cfg.samplerate, symrate=cfg.symrate, oqpsk=oq,
                  carrier_hz=60.0 + 30 * b, amplitude=6000.0, snr_db=22.0,
                  seed=b, dc_offset=25 - 10j)[0][:cfg.block_len]
        for b in range(B)])
    xf = iq_to_f32(x)

    ref_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    pal_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4)

    rc, ro = ref_fn(batch_carry(cfg, B), xf)
    pc, po = pal_fn(batch_carry(cfg, B), jnp.asarray(xf))

    np.testing.assert_array_equal(np.asarray(ro.valid), np.asarray(po.valid))
    np.testing.assert_array_equal(np.asarray(ro.locked_once),
                                  np.asarray(po.locked_once))
    m = np.asarray(ro.valid).astype(bool)
    assert m.sum() > 50
    np.testing.assert_allclose(np.asarray(po.sym_re)[m],
                               np.asarray(ro.sym_re)[m], rtol=5e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(po.sym_im)[m],
                               np.asarray(ro.sym_im)[m], rtol=5e-4, atol=0.05)
    for k in rc._fields:
        a, b = np.asarray(getattr(rc, k)), np.asarray(getattr(pc, k))
        if a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3, err_msg=k)
    assert int(np.asarray(pc.flags).sum()) == 0


def test_pallas_chains_across_blocks():
    """Carry produced by the kernel feeds the next kernel call exactly."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    B = 2
    x = np.stack([
        synth_psk(1200, cfg.samplerate, carrier_hz=80.0, amplitude=6000.0,
                  snr_db=22.0, seed=9 + b)[0][:2 * cfg.block_len]
        for b in range(B)])
    xf = iq_to_f32(x)

    ref_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    pal_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4)

    rc, po1 = ref_fn(batch_carry(cfg, B), xf[:, :cfg.block_len])
    rc, ro2 = ref_fn(rc, xf[:, cfg.block_len:])
    pcar, _ = pal_fn(batch_carry(cfg, B), jnp.asarray(xf[:, :cfg.block_len]))
    pcar, po2 = pal_fn(pcar, jnp.asarray(xf[:, cfg.block_len:]))

    np.testing.assert_array_equal(np.asarray(ro2.valid), np.asarray(po2.valid))
    m = np.asarray(ro2.valid).astype(bool)
    np.testing.assert_allclose(np.asarray(po2.sym_re)[m],
                               np.asarray(ro2.sym_re)[m], rtol=5e-4, atol=0.1)


def test_pallas_sublane_packed_matches_flat():
    """The sublane-packed layout (R stream groups x lanes — production runs
    R = batch/128) must be decision-identical to the flat R=1 layout and to
    the scan path: packing only changes register geometry, not math.
    Exercised at lanes=4 so interpret mode stays cheap."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    B = 8
    x = np.stack([
        synth_psk(500, cfg.samplerate, carrier_hz=60.0 + 20 * b,
                  amplitude=6000.0, snr_db=22.0, seed=b)[0][:cfg.block_len]
        for b in range(B)])
    xf = iq_to_f32(x)

    flat_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4)
    packed_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4,
                                        lanes=4)               # R=2
    ref_fn = jax.jit(jax.vmap(make_block_demod(cfg)))

    fc, fo = flat_fn(batch_carry(cfg, B), jnp.asarray(xf))
    pc, po = packed_fn(batch_carry(cfg, B), jnp.asarray(xf))
    rc, ro = ref_fn(batch_carry(cfg, B), xf)

    np.testing.assert_array_equal(np.asarray(fo.valid), np.asarray(po.valid))
    np.testing.assert_array_equal(np.asarray(ro.valid), np.asarray(po.valid))
    np.testing.assert_array_equal(np.asarray(fo.locked_once),
                                  np.asarray(po.locked_once))
    # Values: the two layouts compile to different XLA programs whose FMA
    # contraction may differ, so symbols agree to float32-FMA tolerance
    # (same bound as kernel-vs-scan), decisions bitwise above.
    np.testing.assert_allclose(np.asarray(fo.sym_re), np.asarray(po.sym_re),
                               rtol=5e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(fo.sym_im), np.asarray(po.sym_im),
                               rtol=5e-4, atol=0.05)
    for k in fc._fields:
        a, b = np.asarray(getattr(fc, k)), np.asarray(getattr(pc, k))
        if a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3,
                                       err_msg=k)


@pytest.mark.parametrize("mode", ["qpsk", "oqpsk"])
def test_pallas_dma_windows_match_scan(mode):
    """The DMA-streaming window path (in-kernel async row-span copies of
    the tick-major FIR array — the TPU production path) must reproduce the
    scan path's decision structure exactly, like the gather path."""
    oq = mode == "oqpsk"
    cfg = DemodConfig(samplerate=230400, block_len=1024,
                      symrate=80000.0 if oq else 72000.0, oqpsk=oq)
    B = 4
    x = np.stack([
        synth_psk(500, cfg.samplerate, symrate=cfg.symrate, oqpsk=oq,
                  carrier_hz=60.0 + 30 * b, amplitude=6000.0, snr_db=22.0,
                  seed=b, dc_offset=25 - 10j)[0][:cfg.block_len]
        for b in range(B)])
    xf = iq_to_f32(x)

    ref_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    dma_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4,
                                     windows="dma")

    rc, ro = ref_fn(batch_carry(cfg, B), xf)
    pc, po = dma_fn(batch_carry(cfg, B), jnp.asarray(xf))

    np.testing.assert_array_equal(np.asarray(ro.valid), np.asarray(po.valid))
    np.testing.assert_array_equal(np.asarray(ro.locked_once),
                                  np.asarray(po.locked_once))
    m = np.asarray(ro.valid).astype(bool)
    assert m.sum() > 50
    np.testing.assert_allclose(np.asarray(po.sym_re)[m],
                               np.asarray(ro.sym_re)[m], rtol=5e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(po.sym_im)[m],
                               np.asarray(ro.sym_im)[m], rtol=5e-4, atol=0.05)
    for k in rc._fields:
        a, b = np.asarray(getattr(rc, k)), np.asarray(getattr(pc, k))
        if a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3, err_msg=k)
    assert int(np.asarray(pc.flags).sum()) == 0


def test_pallas_dma_chains_across_blocks():
    """DMA-path carry feeds the next call exactly (block-boundary spans and
    FIR tail handling are the parts the gather path does differently)."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    B = 2
    x = np.stack([
        synth_psk(1200, cfg.samplerate, carrier_hz=80.0, amplitude=6000.0,
                  snr_db=22.0, seed=9 + b)[0][:2 * cfg.block_len]
        for b in range(B)])
    xf = iq_to_f32(x)

    ref_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    dma_fn = make_pallas_batch_demod(cfg, B, interpret=True, group=4,
                                     windows="dma")

    rc, _ = ref_fn(batch_carry(cfg, B), xf[:, :cfg.block_len])
    rc, ro2 = ref_fn(rc, xf[:, cfg.block_len:])
    pc, _ = dma_fn(batch_carry(cfg, B), jnp.asarray(xf[:, :cfg.block_len]))
    pc, po2 = dma_fn(pc, jnp.asarray(xf[:, cfg.block_len:]))

    np.testing.assert_array_equal(np.asarray(ro2.valid), np.asarray(po2.valid))
    m = np.asarray(ro2.valid).astype(bool)
    np.testing.assert_allclose(np.asarray(po2.sym_re)[m],
                               np.asarray(ro2.sym_re)[m], rtol=5e-4, atol=0.1)


@pytest.mark.parametrize("mode,windows,pargate,tight", [
    ("qpsk", "gather", False, False), ("qpsk", "dma", False, False),
    ("oqpsk", "gather", False, False), ("oqpsk", "dma", False, False),
    # Parallel gate B (config.pargate_bounds): same contract as the serial
    # locked kernel — decisions/ints bit-equal to the wide program, floats
    # within ULP, zero flags on a clean locked fixture (which also pins
    # that the static kA-candidate bound covers the locked envelope).
    ("oqpsk", "gather", True, False), ("oqpsk", "dma", True, False),
    # The serving-tier envelope (locked_jitter_rad=0.5/drift_frac=0.25,
    # the config.serving() values): narrower windows/slices must stay
    # flag-free and decision-identical on a clean locked stream.
    ("qpsk", "dma", False, True), ("oqpsk", "dma", True, True),
    ("oqpsk", "dma", False, True),
])
def test_pallas_locked_geometry_bitwise_when_locked(mode, windows, pargate,
                                                    tight, monkeypatch):
    """The LOCKED-mode kernel (narrow window + verified offset gate,
    kernels/block_demod.py _geom) must match the wide kernel on a
    carrier-locked flag-free stream to the framework's cross-program
    contract: decision structure (valid/locked_once, integer state) and
    flags BIT-equal, float values within a few ULP — an unflagged locked
    step selects the same FIR rows and runs the same mathematical ops, but
    the two programs have different shapes so XLA/Mosaic may fuse FMAs
    differently (same reason scan-vs-kernel values aren't bit-compared,
    see module docstring). Lock is acquired through the (fast, jitted)
    scan backend; both kernels then demodulate the same next blocks from
    the identical carry."""
    if pargate:
        monkeypatch.setenv("METEOR_DEMOD_PARGATE", "1")
    oq = mode == "oqpsk"
    knobs = (dict(locked_jitter_rad=0.5, locked_drift_frac=0.25)
             if tight else {})
    cfg = DemodConfig(samplerate=230400, block_len=1024,
                      symrate=80000.0 if oq else 72000.0, oqpsk=oq,
                      **knobs)
    B = 4
    nwarm, ntest = 15, 2   # QPSK fixture locks at block 13 (scan backend)
    n = (nwarm + ntest) * cfg.block_len
    x = np.stack([
        synth_psk(int(n / cfg.osf) + 64, cfg.samplerate, symrate=cfg.symrate,
                  oqpsk=oq, carrier_hz=60.0 + 30 * b, amplitude=6000.0,
                  snr_db=22.0, seed=50 + b)[0][:n]
        for b in range(B)])
    xf = iq_to_f32(x)

    scan_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    carry = batch_carry(cfg, B)
    for k in range(nwarm):
        carry, _ = scan_fn(carry, xf[:, k * cfg.block_len:
                                     (k + 1) * cfg.block_len])
    carry = jax.tree_util.tree_map(np.asarray, carry)
    assert np.all(carry.locked == 1), "fixture must be locked"

    wide = make_pallas_batch_demod(cfg, B, interpret=True, windows=windows)
    lock = make_pallas_batch_demod(cfg, B, interpret=True, windows=windows,
                                   locked=True)
    cw = cl = jax.tree_util.tree_map(jnp.asarray, carry)

    # p_err is an EMA of |e| — it integrates the per-step cross-program
    # FMA-fusion ULPs of the Costas error over the whole block (every
    # other float leaf is overwritten, not accumulated), so it gets a
    # proportionally wider bound (6 measured worst-case with the r4
    # saturated tanh LUT; decisions/ints stay bit-equal).
    def assert_ulp(a, b, name, ulps=4, mask=None):
        if name == "p_err":
            ulps = 8
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.float32:
            d = np.abs(a.view(np.int32).astype(np.int64)
                       - b.view(np.int32).astype(np.int64))
            d = np.where(a == b, 0, d)        # +-0.0 view as 2^31 apart
            if mask is not None:
                d = np.where(mask, d, 0)
            assert int(d.max(initial=0)) <= ulps, (name, int(d.max()))
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)

    for k in range(nwarm, nwarm + ntest):
        blk = jnp.asarray(xf[:, k * cfg.block_len:(k + 1) * cfg.block_len])
        cw, ow = wide(cw, blk)
        cl, ol = lock(cl, blk)
        assert int(np.asarray(cl.flags).sum()) == 0
        # Float symbol values compare on FIRED rows only: a non-fired
        # row's sym_re/sym_im is dead padding (consumers select by
        # `valid`, demod/pipeline.py) recomputed by each program in its
        # own fusion context, so it carries fusion noise with no
        # feedback path; the carry comparison below pins the state
        # trajectory itself to <= 4 ulp on every step.
        fired = np.asarray(ow.valid).astype(bool)
        for name in ow._fields:
            assert_ulp(getattr(ow, name), getattr(ol, name), name,
                       mask=fired)
        for name in cw._fields:
            assert_ulp(getattr(cw, name), getattr(cl, name), name)
        assert int(np.asarray(ow.valid).sum()) > 100


def test_pallas_locked_gate_guard_flags_out_of_envelope():
    """A timing-phase excursion beyond the locked envelope (lock loss,
    signal dropout, clock step) must trip the locked kernel's in-step
    verification (early-fire guard -> FLAG_WINDOW_MISS) rather than
    silently diverge; the flag routes the block to the exact oracle
    fallback like any other flagged block (tests/test_fleet_recovery.py).

    The timing gate is self-correcting — a phase step shifts only the
    block's FIRST fire (handled by the full-gate entry prologue) and the
    residual after that fire is what later steps see — so the excursion is
    chosen (+5.5 rad on this fixture) to leave a post-entry residual
    within k0*tf of the fire threshold: the next fire lands at k <= k0,
    exactly the region the offset gate skips, and the guard must catch
    it. The same excursion must NOT flag the wide kernel — it is inside
    the wide gate's range — which pins the flag on the locked geometry's
    guard, not on a generic window miss."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    assert cfg.gate_offset_locked > 0   # guard exists for this config
    B = 4
    nwarm = 15   # QPSK fixture locks at block 13 (scan backend)
    n = (nwarm + 1) * cfg.block_len
    x = np.stack([
        synth_psk(int(n / cfg.osf) + 64, cfg.samplerate,
                  carrier_hz=60.0 + 30 * b, amplitude=6000.0,
                  snr_db=22.0, seed=50 + b)[0][:n]
        for b in range(B)])
    xf = iq_to_f32(x)

    scan_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    carry = batch_carry(cfg, B)
    for k in range(nwarm):
        carry, _ = scan_fn(carry, xf[:, k * cfg.block_len:
                                     (k + 1) * cfg.block_len])
    carry = jax.tree_util.tree_map(np.asarray, carry)
    assert np.all(carry.locked == 1)
    carry = carry._replace(t_phase=carry.t_phase + np.float32(5.5))
    blk = jnp.asarray(xf[:, nwarm * cfg.block_len:])

    wide = make_pallas_batch_demod(cfg, B, interpret=True)
    cwide, _ = wide(jax.tree_util.tree_map(jnp.asarray, carry), blk)
    assert int(np.asarray(cwide.flags).sum()) == 0

    lock = make_pallas_batch_demod(cfg, B, interpret=True, locked=True)
    cl, _ = lock(jax.tree_util.tree_map(jnp.asarray, carry), blk)
    assert int((np.asarray(cl.flags) != 0).sum()) == B


def test_pallas_spec_allfire_flags_nonfire_in_envelope_region():
    """The LOCKED kernel's all-fire speculative steps (steps <
    cfg.steps_always_fire; kernels/block_demod.py _make_step spec=True)
    must FLAG a stream whose gate does not fire there, never silently
    assume the fire. A large negative timing-phase excursion (clock step /
    dropout artifact) pushes the fire threshold beyond the candidate
    range for several symbols: legal for the wide gate (non-fire consumes
    min(rem, K) ticks and retries), but out of the all-fire envelope —
    the speculative step must raise FLAG_WINDOW_MISS so the oracle
    fallback replays the block exactly."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    assert cfg.steps_always_fire > 16   # spec arms engage for this config
    B = 4
    nwarm = 15   # QPSK fixture locks at block 13 (scan backend)
    n = (nwarm + 1) * cfg.block_len
    x = np.stack([
        synth_psk(int(n / cfg.osf) + 64, cfg.samplerate,
                  carrier_hz=60.0 + 30 * b, amplitude=6000.0,
                  snr_db=22.0, seed=50 + b)[0][:n]
        for b in range(B)])
    xf = iq_to_f32(x)

    scan_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    carry = batch_carry(cfg, B)
    for k in range(nwarm):
        carry, _ = scan_fn(carry, xf[:, k * cfg.block_len:
                                     (k + 1) * cfg.block_len])
    carry = jax.tree_util.tree_map(np.asarray, carry)
    assert np.all(carry.locked == 1)
    # t_phase := -12.7 rad exactly (excursion magnitude depends on the
    # entry residual, so pin it absolutely): the entry prologue's full
    # gate can't fire (diff = 2*pi + 12.7 = 19.0 > K*tf = 9.42) and
    # consumes K ticks; spec step 1 still sees diff = 9.56 > K*tf -> a
    # spec-region NON-FIRE (the all-fire guard). The wide gate eats the
    # same two non-fires and then fires at tick 48 with window coord
    # c = 54 < W = 80 every following step — the wide kernel stays
    # clean, pinning the flag on the locked kernel's in-step
    # verification, not a generic window miss.
    carry = carry._replace(
        t_phase=np.full_like(carry.t_phase, np.float32(-12.7)))
    blk = jnp.asarray(xf[:, nwarm * cfg.block_len:])

    wide = make_pallas_batch_demod(cfg, B, interpret=True)
    cwide, _ = wide(jax.tree_util.tree_map(jnp.asarray, carry), blk)
    assert int(np.asarray(cwide.flags).sum()) == 0

    lock = make_pallas_batch_demod(cfg, B, interpret=True, locked=True)
    cl, _ = lock(jax.tree_util.tree_map(jnp.asarray, carry), blk)
    assert int((np.asarray(cl.flags) != 0).sum()) == B


def test_pallas_tau0_banded_window():
    """tau0-banded locked window (config.tau0_band, VERDICT r4 item 3):
    when a dispatch's streams share a narrow first-fire band — the
    tau0-sorted serving-group policy — the locked kernel runs with the
    tau0 fold shrunk from ceil(ticks_per_fire)+1 rows to band+1, anchoring
    the window base at the dispatch's own minimum predicted tau0 (a
    runtime scalar input, so one compiled program serves every group).
    In-band: decisions/ints bit-equal to the full-W locked kernel, floats
    within ULP, zero flags. Out-of-band lanes trip FLAG_WINDOW_MISS (the
    usual exact-fallback net) instead of producing wrong output."""
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    B = 4
    nwarm, ntest = 15, 2
    n = (nwarm + ntest) * cfg.block_len
    # Broadcast fixture: identical carry per lane == a perfectly sorted
    # tau0 group (band spread 0), the shape the serving host constructs.
    x0 = synth_psk(int(n / cfg.osf) + 64, cfg.samplerate, carrier_hz=90.0,
                   amplitude=6000.0, snr_db=22.0, seed=50)[0][:n]
    xf = iq_to_f32(np.stack([x0] * B))

    scan_fn = jax.jit(jax.vmap(make_block_demod(cfg)))
    carry = batch_carry(cfg, B)
    for k in range(nwarm):
        carry, _ = scan_fn(carry, xf[:, k * cfg.block_len:
                                     (k + 1) * cfg.block_len])
    carry = jax.tree_util.tree_map(np.asarray, carry)
    assert np.all(carry.locked == 1)

    import dataclasses
    cfgb = dataclasses.replace(cfg.serving(), tau0_band=4)
    assert cfgb.window_locked_asym < cfg.serving().window_locked_asym
    full = make_pallas_batch_demod(cfg.serving(), B, interpret=True,
                                   windows="dma", locked=True)
    band = make_pallas_batch_demod(cfgb, B, interpret=True,
                                   windows="dma", locked=True)
    cf = cb = jax.tree_util.tree_map(jnp.asarray, carry)
    for k in range(nwarm, nwarm + ntest):
        blk = jnp.asarray(xf[:, k * cfg.block_len:(k + 1) * cfg.block_len])
        cf, of = full(cf, blk)
        cb, ob = band(cb, blk)
        assert int(np.asarray(cb.flags).sum()) == 0
        np.testing.assert_array_equal(np.asarray(of.valid),
                                      np.asarray(ob.valid))
        np.testing.assert_array_equal(np.asarray(of.locked_once),
                                      np.asarray(ob.locked_once))
        m = np.asarray(of.valid).astype(bool)
        np.testing.assert_allclose(np.asarray(ob.sym_re)[m],
                                   np.asarray(of.sym_re)[m],
                                   rtol=5e-4, atol=0.05)
        for name in ("locked", "locked_once", "slot", "tick"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cf, name)), np.asarray(getattr(cb, name)),
                err_msg=name)

    # Band-violating lane: shift one lane's timing phase by ~half a
    # symbol (the largest tau0 excursion a sorted group can see before
    # re-sorting). The safety contract is FLAG-OR-EXACT: the lane either
    # trips FLAG_WINDOW_MISS (out the window) or — when the window's
    # delta margins still cover the excursion, as at this geometry —
    # stays decision-exact vs the full-W locked kernel. Silent wrongness
    # is the only failure mode being excluded.
    bad = dict(carry._asdict())
    tp = bad["t_phase"].copy()
    tp[2] = np.float32(np.mod(tp[2] + np.pi, 2 * np.pi))
    bad["t_phase"] = tp
    from meteor_demod_tpu.demod.state import DemodCarry
    cbad = jax.tree_util.tree_map(jnp.asarray, DemodCarry(**bad))
    blk = jnp.asarray(xf[:, nwarm * cfg.block_len:
                         (nwarm + 1) * cfg.block_len])
    c2, o2 = band(cbad, blk)
    c2f, o2f = full(cbad, blk)
    flags = np.asarray(c2.flags)
    ok_lanes = flags == 0
    np.testing.assert_array_equal(np.asarray(o2.valid)[ok_lanes],
                                  np.asarray(o2f.valid)[ok_lanes])
    np.testing.assert_array_equal(np.asarray(o2.locked_once)[ok_lanes],
                                  np.asarray(o2f.locked_once)[ok_lanes])
    # And the full-W run itself must be flag-free here (the excursion is
    # inside the FULL tau0 fold by construction).
    assert int(np.asarray(c2f.flags).sum()) == 0
