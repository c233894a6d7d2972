"""Sweep rescue: escaping the acquisition dead zone the reference shares.

The reference's upward-first acquisition sweep (pll.c:109-130) has a
measured dead zone: a small-NEGATIVE carrier offset traps the loop in a
stable false equilibrium near 0 Hz where the mean Costas feedback cancels
the sweep step — -195 Hz @ 25 dB never locks (68 s measured on chip, and
the C binary shares the stall: tests/test_golden_reference.py pins the
parity-on-failure). A downward pass from the +fmax rail captures every
in-range carrier (measured ~4 s transit at the sweep's 825 Hz/s).

The rescue is pure orchestration — after `sweep_rescue_s` seconds of
unlocked signal the HOST kicks the carry (p_freq=+fmax, updown=-1), the
same splice mechanism parking uses; no kernel/scan/oracle change, and the
default (0 = off) keeps exact reference acquisition behavior.
"""

import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import StreamDemodulator
from meteor_demod_tpu.parallel.mesh import FleetDemodulator
from meteor_demod_tpu.sim import synth_psk


@pytest.fixture(scope="module")
def cfg():
    return DemodConfig(samplerate=230400, block_len=2048)


def _dead_zone_signal(cfg, seconds, seed=11, carrier=-195.0, snr=25.0):
    n = int(seconds * cfg.samplerate)
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=carrier,
                     amplitude=6000.0, snr_db=snr, seed=seed)
    return x[:n]


def test_stream_rescue_locks_dead_zone(cfg):
    """Single stream at -195 Hz: never locks bare (the pinned reference
    stall), locks with --sweep-rescue within the kick + downward-transit
    budget; and the rescue never fires on a signal that locks normally."""
    x = _dead_zone_signal(cfg, 7.0)
    bare = StreamDemodulator(cfg)
    bare.process(x)
    bare.finish()
    assert not bare.pll_locked_once, "fixture must be in the dead zone"

    d = StreamDemodulator(cfg, sweep_rescue_s=1.5)
    # Feed in CLI-sized pieces so the kick check runs between chunks.
    L = 8 * cfg.block_len
    for i in range(0, len(x), L):
        d.process(x[i:i + L])
    d.finish()
    assert d.pll_locked_once, "rescue kick did not capture the carrier"
    assert abs(d.carrier_freq_hz() + 195.0) < 30.0

    # A clean +300 Hz signal locks before the rescue budget: identical
    # output to the rescue-free demodulator (the kick never fires).
    y, _ = synth_psk(72000 * 2, cfg.samplerate, carrier_hz=300.0,
                     amplitude=6000.0, snr_db=20.0, seed=1)
    a = StreamDemodulator(cfg)
    b = StreamDemodulator(cfg, sweep_rescue_s=1.5)
    sa = [a.process(y), a.finish()]
    sb = [b.process(y), b.finish()]
    for va, vb in zip(sa, sb):
        np.testing.assert_array_equal(va, vb)


def test_fleet_rescue_kicks_device_lane(cfg):
    """Fleet with one dead-zone stream (parking off): the lane gets
    kicked at the rescue deadline and locks; other streams bit-identical
    to a rescue-free fleet (the kick touches only the stalled lane)."""
    n_streams, victim = 8, 3
    seconds = 7.0
    n_blocks = int(seconds * cfg.samplerate / cfg.block_len)
    data = np.stack([
        _dead_zone_signal(cfg, seconds) if i == victim else
        _dead_zone_signal(cfg, seconds, seed=70 + i,
                          carrier=60.0 + 15.0 * i, snr=22.0)
        for i in range(n_streams)])

    base = FleetDemodulator(cfg, n_streams, park=False)
    fleet = FleetDemodulator(cfg, n_streams, park=False,
                             sweep_rescue_s=1.5)
    others = [i for i in range(n_streams) if i != victim]
    for b in range(n_blocks):
        blk = data[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        ref = base.process_blocks(blk)
        got = fleet.process_blocks(blk)
        for name in ("sym_re", "sym_im", "valid", "locked_once"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name))[others],
                np.asarray(getattr(ref, name))[others],
                err_msg=f"block {b} {name}")
    from meteor_demod_tpu.demod.pipeline import egress
    locked = np.asarray(egress(fleet.carry.locked))
    base_locked = np.asarray(egress(base.carry.locked))
    assert not base_locked[victim], "fixture must be in the dead zone"
    assert locked[victim], "rescued lane did not lock"
    assert int(locked.sum()) == n_streams


def test_fleet_rescue_kicks_parked_host_carry(cfg):
    """A dead-zone stream that PARKS still gets rescued: the park worker
    applies the kick to the host carry, the host demod locks, and the
    stream unparks with its exact post-rescue state."""
    n_streams, victim = 8, 5
    seconds = 8.0
    n_blocks = int(seconds * cfg.samplerate / cfg.block_len)
    data = np.stack([
        _dead_zone_signal(cfg, seconds) if i == victim else
        _dead_zone_signal(cfg, seconds, seed=70 + i,
                          carrier=60.0 + 15.0 * i, snr=22.0)
        for i in range(n_streams)])
    fleet = FleetDemodulator(cfg, n_streams, park_after=8,
                             sweep_rescue_s=2.0)
    parked_seen = False
    import time
    for b in range(n_blocks):
        fleet.process_blocks(
            data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        parked_seen = parked_seen or victim in fleet._parked
        if fleet._parked:
            fleet.wait_parked_drained()
    assert parked_seen, "fixture: the victim should have parked"
    fleet.wait_parked_drained()
    if victim in fleet._parked:
        assert bool(fleet._parked[victim].locked), \
            "parked host demod did not lock after the kick"
    else:
        # Already unparked — the device lane carries the locked state.
        from meteor_demod_tpu.demod.pipeline import egress
        assert np.asarray(egress(fleet.carry.locked))[victim]
