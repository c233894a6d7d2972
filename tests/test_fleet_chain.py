"""Chained fleet dispatch: K blocks per device call (mesh.py chain_blocks).

The bench headlines are measured with 16-block chained dispatches (one
upload/readback per chain); FleetDemodulator(chain_blocks=K) makes that
shape available through the production serving API. The chained program
wraps the batch demod in an in-program lax.scan — a DIFFERENT compiled
program, so float values drift within cross-program loop noise (XLA
contracts FMAs differently; the same contract as the -T turbo paths,
tests/test_turbo.py) while the DECISION STRUCTURE — fire pattern (valid),
lock history (locked_once), and post-lock symbol signs — must match the
unchained fleet exactly, including through a flagged-stream oracle
recovery (flags are OR-sticky across the chain) and a parked straggler
(the host worker is fed the chain's sub-blocks individually, so the
host-path continuation stays BITWISE).
"""

import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.parallel.mesh import FleetDemodulator
from meteor_demod_tpu.sim import synth_psk


@pytest.fixture(scope="module")
def cfg():
    return DemodConfig(samplerate=230400, block_len=2048)


def _fleet_data(cfg, n_streams, n_blocks, noise_stream=None):
    xs = []
    for i in range(n_streams):
        n = n_blocks * cfg.block_len
        if i == noise_stream:
            rng = np.random.default_rng(99)
            xs.append((500.0 * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n))
                       ).astype(np.complex64))
        else:
            x, _ = synth_psk(
                int(n * cfg.symrate / cfg.samplerate) + 64,
                cfg.samplerate, carrier_hz=60.0 + 15.0 * i,
                amplitude=6000.0, snr_db=22.0, seed=70 + i)
            xs.append(x[:n])
    return np.stack(xs)


def _cat_ref_outs(ref_outs, K):
    """Step-concatenate K consecutive unchained outputs per chain."""
    chains = []
    for c in range(len(ref_outs) // K):
        grp = ref_outs[c * K:(c + 1) * K]
        chains.append({
            name: np.concatenate(
                [np.asarray(getattr(o, name)) for o in grp], axis=1)
            for name in ("sym_re", "sym_im", "valid", "locked_once")})
    return chains


def _assert_decisions(got, want, streams, msg, values="slots"):
    """Cross-program contract: valid/locked_once bitwise; fired float
    values within loop noise; post-lock signs exact. values="order"
    compares fired values in firing order instead of slot-aligned (the
    oracle recovery left-justifies a recovered stream's rows across the
    whole chain)."""
    for name in ("valid", "locked_once"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name))[streams],
            want[name][streams], err_msg=f"{msg} {name}")
    for s in streams:
        gv = np.asarray(got.valid)[s].astype(bool)
        wv = want["valid"][s].astype(bool)
        for name in ("sym_re", "sym_im"):
            g = np.asarray(getattr(got, name))[s]
            w = want[name][s]
            g = g[gv] if values == "order" else g[wv]
            w = w[wv]
            # Values: bounded normalized RMS error. Per-symbol closeness
            # degrades slowly over a run (the AGC gain is a pole-1e-4
            # integrator, so cross-program float drift accumulates into a
            # small gain offset), but the energy-normalized error stays
            # small while the decisions are identical.
            if g.size:
                nrms = (np.sqrt(np.mean((g - w) ** 2))
                        / max(np.sqrt(np.mean(w ** 2)), 1e-9))
                assert nrms < 0.05, (
                    f"{msg} stream {s} {name}: normalized RMS {nrms:.4f}")
            # Post-lock decisions: exact sign agreement — the -T
            # contract (identical sign-level decision stream).
            lo = want["locked_once"][s][wv].astype(bool)
            np.testing.assert_array_equal(
                np.sign(g[lo]), np.sign(w[lo]),
                err_msg=f"{msg} stream {s} {name} signs")


def test_chain_decision_equals_unchained(cfg):
    n_streams, K, n_chains = 8, 4, 4
    n_blocks = K * n_chains
    data = _fleet_data(cfg, n_streams, n_blocks)

    ref = FleetDemodulator(cfg, n_streams, park=False)
    ref_outs = [ref.process_blocks(
        data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        for b in range(n_blocks)]

    fleet = FleetDemodulator(cfg, n_streams, park=False, chain_blocks=K)
    L = K * cfg.block_len
    all_streams = list(range(n_streams))
    for c, want in enumerate(_cat_ref_outs(ref_outs, K)):
        got = fleet.process_blocks(data[:, c * L:(c + 1) * L])
        _assert_decisions(got, want, all_streams, f"chain {c}")
    # Carry: decision leaves exact, float leaves within loop noise.
    from meteor_demod_tpu.demod.pipeline import egress
    a = egress(fleet.carry)._asdict()
    b = egress(ref.carry)._asdict()
    for k in ("locked", "locked_once", "flags", "slot"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    for k in ("p_freq", "t_freq", "agc_gain"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)
    # Telemetry after the last chain matches the unchained tick.
    assert int(fleet.telemetry["locked_streams"]) == int(
        ref.telemetry["locked_streams"])


def test_chain_recovery_decisions(cfg):
    """A mid-chain FLAG_WINDOW_MISS (sticky flags) triggers the oracle
    recovery over the whole chain; decisions still match the unchained
    fleet (the recovered stream's rows are left-justified across the
    chain, so its fired values compare in firing order)."""
    from tests.test_fleet_recovery import _mixed_fleet, FLAGGED
    n_streams, K = 8, 3
    n_blocks = 9                       # trip block 5 is mid-chain 1
    data = _mixed_fleet(cfg, n_streams, n_blocks)

    ref = FleetDemodulator(cfg, n_streams, park=False)
    ref_outs = [ref.process_blocks(
        data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        for b in range(n_blocks)]
    assert ref.recovered_streams > 0, "fixture must trip a flag"

    fleet = FleetDemodulator(cfg, n_streams, park=False, chain_blocks=K)
    L = K * cfg.block_len
    others = [s for s in range(n_streams) if s != FLAGGED]
    from meteor_demod_tpu.demod import scalar
    from meteor_demod_tpu.demod.pipeline import (
        egress, numpy_carry_to_scalar_state)
    for c, want in enumerate(_cat_ref_outs(ref_outs, K)):
        entry = {k: np.asarray(v)[FLAGGED]
                 for k, v in egress(fleet.carry)._asdict().items()}
        pre_recovered = fleet.recovered_streams
        got = fleet.process_blocks(data[:, c * L:(c + 1) * L])
        _assert_decisions(got, want, others, f"chain {c}")
        if fleet.recovered_streams == pre_recovered:
            continue
        # The flagged stream's recovered rows must be BITWISE the scalar
        # oracle over the whole chain span from the chain-entry carry
        # (the chained recovery's contract; its value trajectory
        # legitimately differs from the unchained fleet's because the
        # oracle entry state has a different device/oracle history on
        # this pathological signal).
        st = numpy_carry_to_scalar_state(cfg, entry)
        sym, st = scalar.demod_stream_np(
            cfg, data[FLAGGED, c * L:(c + 1) * L], st)
        gv = np.asarray(got.valid)[FLAGGED].astype(bool)
        assert int(gv.sum()) == len(sym), f"chain {c} flagged count"
        np.testing.assert_array_equal(
            np.asarray(got.sym_re)[FLAGGED][gv], sym["re"],
            err_msg=f"chain {c} flagged oracle re")
        np.testing.assert_array_equal(
            np.asarray(got.sym_im)[FLAGGED][gv], sym["im"],
            err_msg=f"chain {c} flagged oracle im")
    assert fleet.recovered_streams > 0


def test_chain_parked_straggler_exact(cfg):
    """Parking under chained dispatch: the noise stream parks, its host
    continuation (fed K sub-blocks per dispatch) drains as the BITWISE
    B=1 replay (same per-block host program), and live streams match the
    unchained fleet's decisions."""
    from meteor_demod_tpu.demod.backend import jit_batch_demod
    from meteor_demod_tpu.demod.pipeline import egress
    from meteor_demod_tpu.demod.state import DemodCarry
    from meteor_demod_tpu.dsp.fir import iq_to_f32

    n_streams, K, straggler = 8, 2, 5
    n_blocks = 16
    data = _fleet_data(cfg, n_streams, n_blocks, noise_stream=straggler)

    ref = FleetDemodulator(cfg, n_streams, park=False)
    ref_outs = [ref.process_blocks(
        data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        for b in range(n_blocks)]

    fleet = FleetDemodulator(cfg, n_streams, park_after=2, chain_blocks=K)
    L = K * cfg.block_len
    outs = [fleet.process_blocks(data[:, c * L:(c + 1) * L])
            for c in range(n_blocks // K)]
    assert straggler in fleet._parked
    others = [i for i in range(n_streams) if i != straggler]
    for c, want in enumerate(_cat_ref_outs(ref_outs, K)):
        _assert_decisions(outs[c], want, others, f"chain {c}")

    # The parked host path replays the exact same per-block program as
    # the B=1 scan reference, so the drain is BITWISE (not just
    # decision-equal): the chain only changes how sub-blocks are queued.
    fleet.wait_parked_drained()
    drained = fleet.parked_output(straggler)
    n_parked = fleet._parked[straggler].blocks_fed
    first = n_blocks - n_parked
    fn = jit_batch_demod(cfg, 1, "scan")
    chk = FleetDemodulator(cfg, n_streams, park=False, chain_blocks=K)
    for c in range(first // K):
        chk.process_blocks(data[:, c * L:(c + 1) * L])
    leaves = {k: np.asarray(v)[straggler]
              for k, v in egress(chk.carry)._asdict().items()}
    carry = DemodCarry(**{k: np.asarray(v)[None] for k, v in leaves.items()})
    ref_rows = {k: [] for k in ("sym_re", "sym_im", "valid", "locked_once")}
    for b in range(first, n_blocks):
        blk = iq_to_f32(data[straggler,
                             b * cfg.block_len:(b + 1) * cfg.block_len])
        carry, o = fn(carry, blk[None])
        for k in ref_rows:
            ref_rows[k].append(np.asarray(getattr(o, k))[0])
    for k in ref_rows:
        np.testing.assert_array_equal(
            drained[k], np.concatenate(ref_rows[k]), err_msg=k)
