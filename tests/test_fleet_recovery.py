"""Fleet flagged-stream recovery: the always-exact contract on the mesh.

The reference's per-sample path is always exact (demod.c:23-48); the fleet
fast path prematerializes candidate windows, so a pathological stream trips
FLAG_WINDOW_MISS on the REAL signal path — no poisoned internals. The trip
case: five blocks of silence (the AGC gain integrates up by
AGC_GAIN_POLE * AGC_TARGET per fire with no signal, agc.c:21), then an
absurd-amplitude float tone at HALF the symbol rate appearing at full
power: its Q component alternates sign every symbol, so consecutive M&M
errors reinforce while the boosted gain makes |err| ~ 2e5, retarding the
timing NCO by ~alpha_t*|err| > 8 rad — beyond the 4-rad jitter budget the
candidate window is sized for (config.py max_ticks_per_step) — and a fire
lands outside the window. FleetDemodulator must then re-demodulate that
stream's block through the exact scalar oracle and splice the corrected
symbols and carry back, ending bit-identical to StreamDemodulator on every
stream.
"""

import numpy as np

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import StreamDemodulator
from meteor_demod_tpu.parallel.mesh import FleetDemodulator
from meteor_demod_tpu.sim import synth_psk

HUGE_AMP = 2.0e6
FLAGGED = 3
QUIET_BLOCKS = 5      # silence first, so the AGC gain integrates up to ~31
FLAG_BLOCK = QUIET_BLOCKS  # ... and the tone-onset block trips the window


def _mixed_fleet(cfg, n_streams, n_blocks):
    xs = []
    for i in range(n_streams):
        n = n_blocks * cfg.block_len
        if i == FLAGGED:
            quiet = QUIET_BLOCKS * cfg.block_len
            t = np.arange(n - quiet)
            tone = (HUGE_AMP * np.exp(
                1j * 2 * np.pi * (cfg.symrate / 2) / cfg.samplerate * t)
            ).astype(np.complex64)
            x = np.concatenate([np.zeros(quiet, np.complex64), tone])
        else:
            x, _ = synth_psk(
                int(n * cfg.symrate / cfg.samplerate) + 64,
                cfg.samplerate, carrier_hz=60.0 + 35.0 * i, amplitude=6000.0,
                snr_db=22.0, seed=90 + i)
        xs.append(x[:n])
    return np.stack(xs)


def test_fleet_recovers_flagged_stream_exactly():
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n_streams, n_blocks = 8, 7
    data = _mixed_fleet(cfg, n_streams, n_blocks)

    fleet = FleetDemodulator(cfg, n_streams)
    fleet_syms = [[] for _ in range(n_streams)]
    flagged_per_block = []
    for b in range(n_blocks):
        outs = fleet.process_blocks(
            data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        flagged_per_block.append(fleet.flagged_streams().tolist())
        valid = np.asarray(outs.valid).astype(bool)
        for i in range(n_streams):
            m = valid[i]
            fleet_syms[i].append(np.stack(
                [np.asarray(outs.sym_re)[i][m],
                 np.asarray(outs.sym_im)[i][m]], axis=-1))

    # The pathological stream flags on the tone-onset block (AGC transient),
    # then its corrected carry keeps the fast path exact afterwards.
    expect = [[FLAGGED] if b == FLAG_BLOCK else [] for b in range(n_blocks)]
    assert flagged_per_block == expect, flagged_per_block
    assert fleet.recovered_streams == 1
    # Post-recovery telemetry reflects the corrected state.
    assert int(fleet.telemetry["flags"]) == 0

    # Every stream, flagged or not, must end bit-identical to the sequential
    # StreamDemodulator (whose own safety net routes the same flagged block
    # to the same oracle from the same pre-block carry).
    for i in range(n_streams):
        d = StreamDemodulator(cfg)
        seq = np.concatenate(
            [d.process(data[i]), d.finish()])
        expected_fallback = 1 if i == FLAGGED else 0
        assert d.fallback_blocks == expected_fallback, i
        got = np.concatenate(fleet_syms[i])
        assert got.shape[0] == len(seq), i
        np.testing.assert_array_equal(got[:, 0], seq["re"], err_msg=f"s{i}")
        np.testing.assert_array_equal(got[:, 1], seq["im"], err_msg=f"s{i}")


def test_fleet_recovery_between_telemetry_ticks():
    """With telemetry_every=K the flag block (block 5, not a multiple of
    K=4) is a NON-tick block: recovery must still trigger from the
    per-block per-stream flags, splice the exact oracle result, and leave
    the (stale, last-tick) telemetry untouched — the corrected state flows
    into the next tick's psum instead."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n_streams, n_blocks, K = 8, 7, 4
    assert FLAG_BLOCK % K != 0
    data = _mixed_fleet(cfg, n_streams, n_blocks)

    fleet = FleetDemodulator(cfg, n_streams, telemetry_every=K)
    ref = FleetDemodulator(cfg, n_streams)
    tel_prev_tick = None
    for b in range(n_blocks):
        blk = data[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        outs = fleet.process_blocks(blk)
        router = ref.process_blocks(blk)
        if b == FLAG_BLOCK - 1:        # the tick at block 4 (K=4)
            tel_prev_tick = {k: np.asarray(v).copy()
                             for k, v in fleet.telemetry.items()}
        if b == FLAG_BLOCK:
            assert fleet.flagged_streams().tolist() == [FLAGGED]
            # Non-tick recovery leaves telemetry at the last tick's values.
            for k, v in tel_prev_tick.items():
                np.testing.assert_array_equal(
                    np.asarray(fleet.telemetry[k]), v, err_msg=k)
        for name in outs._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(outs, name)),
                np.asarray(getattr(router, name)),
                err_msg=f"block {b} field {name}")
    assert fleet.recovered_streams == 1
    # The final carry is bit-identical to the per-block fleet's.
    for k, v in fleet.carry._asdict().items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(getattr(ref.carry, k)), err_msg=k)


def test_fleet_sticky_flags_without_recovery():
    """recover_flagged=False preserves the report-only behavior: flags stay
    sticky and the stream remains suspect."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n_streams, n_blocks = 8, 7
    data = _mixed_fleet(cfg, n_streams, n_blocks)
    fleet = FleetDemodulator(cfg, n_streams, recover_flagged=False)
    for b in range(n_blocks):
        fleet.process_blocks(
            data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        expect = [FLAGGED] if b >= FLAG_BLOCK else []   # sticky once tripped
        assert fleet.flagged_streams().tolist() == expect, b
    assert fleet.recovered_streams == 0
    assert int(fleet.telemetry["flags"]) != 0


def test_multihost_fleet_recovers_flagged_stream_exactly():
    """The always-exact contract holds through MultiHostFleet too: its
    local-row recovery must end bit-identical to StreamDemodulator for a
    flagged stream (single-process view of the global mesh; the 2-process
    rendezvous path is covered by tests/test_multihost.py)."""
    from meteor_demod_tpu.parallel.multihost import MultiHostFleet
    import jax

    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n_devices = len(jax.devices())
    spd = 1
    n_streams = n_devices * spd
    n_blocks = 7
    data = _mixed_fleet(cfg, n_streams, n_blocks)

    fleet = MultiHostFleet(cfg, spd)
    assert fleet.n_streams == n_streams
    got = {i: [] for i in range(n_streams)}
    flagged_seen = 0
    for b in range(n_blocks):
        outs = fleet.process_local_blocks(
            data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        flagged_seen += len(fleet.flagged_local_streams())
        for i in range(n_streams):
            m = np.asarray(outs.valid[i]).astype(bool)
            got[i].append((np.asarray(outs.sym_re[i])[m],
                           np.asarray(outs.sym_im[i])[m]))
    assert flagged_seen >= 1
    assert fleet.recovered_streams == flagged_seen
    assert int(fleet.telemetry["flags"]) == 0

    for i in range(n_streams):
        d = StreamDemodulator(cfg)
        seq = np.concatenate(
            [d.process(data[i]), d.finish()])
        re = np.concatenate([r for r, _ in got[i]])
        im = np.concatenate([q for _, q in got[i]])
        np.testing.assert_array_equal(re, seq["re"], err_msg=f"stream {i}")
        np.testing.assert_array_equal(im, seq["im"], err_msg=f"stream {i}")
