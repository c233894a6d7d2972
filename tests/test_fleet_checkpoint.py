"""Fleet / serving checkpoint-resume (io/checkpoint.py fleet section).

The reference has no checkpointing and no fleets; the single-stream carry
checkpoint (tests/test_io_cli.py) extends to serving deployments here: a
FleetDemodulator's device carry plus ALL host-side policy state (parking,
lock streaks, program-switch inputs, deferred parked symbols) round-trips
through one .npz, and a resumed fleet's subsequent output is BIT-IDENTICAL
to the uninterrupted original — including a parked straggler's host-path
continuation and a ServingFleet's tau0-sorted assignment/banding.
"""

import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.io.checkpoint import (
    load_fleet_checkpoint, load_serving_checkpoint,
    save_fleet_checkpoint, save_serving_checkpoint)
from meteor_demod_tpu.parallel.mesh import FleetDemodulator
from meteor_demod_tpu.parallel.serving import ServingFleet
from meteor_demod_tpu.sim import synth_psk


@pytest.fixture(scope="module")
def cfg():
    return DemodConfig(samplerate=230400, block_len=2048)


def _mixed_data(cfg, n_streams, n_blocks, straggler=None, seed0=70):
    xs = []
    for i in range(n_streams):
        if i == straggler:
            rng = np.random.default_rng(99)
            n = n_blocks * cfg.block_len
            xs.append((500.0 * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n))
                       ).astype(np.complex64))
        else:
            x, _ = synth_psk(
                int(n_blocks * cfg.block_len * cfg.symrate / cfg.samplerate)
                + 64, cfg.samplerate, carrier_hz=60.0 + 15.0 * i,
                amplitude=6000.0, snr_db=22.0, seed=seed0 + i)
            xs.append(x[:n_blocks * cfg.block_len])
    return np.stack(xs)


def _run(fleet, data, lo, hi):
    cfg = fleet.cfg
    return [fleet.process_blocks(
        data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        for b in range(lo, hi)]


def _assert_outs_equal(got, ref, msg=""):
    for name in ("sym_re", "sym_im", "valid", "locked_once"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            err_msg=f"{msg} {name}")


def test_fleet_checkpoint_resume_bitwise(cfg, tmp_path):
    """Locked fleet with one parked straggler: save mid-run, resume, and
    every subsequent block (device lanes AND the straggler's host-path
    drain) is bit-identical to the uninterrupted fleet."""
    n_streams, n_blocks, cut, straggler = 8, 16, 9, 5
    data = _mixed_data(cfg, n_streams, n_blocks, straggler)

    ref = FleetDemodulator(cfg, n_streams, park_after=3)
    ref_outs = _run(ref, data, 0, n_blocks)

    fleet = FleetDemodulator(cfg, n_streams, park_after=3)
    _run(fleet, data, 0, cut)
    assert straggler in fleet._parked, "fixture: straggler must be parked"
    ckpt = str(tmp_path / "fleet.npz")
    save_fleet_checkpoint(ckpt, fleet)

    resumed = load_fleet_checkpoint(ckpt)
    assert resumed.n_streams == n_streams
    assert straggler in resumed._parked
    # Policy counters / switch inputs survived the round-trip.
    assert resumed._block_idx == fleet._block_idx
    assert resumed._active_locked == fleet._active_locked
    assert resumed.telemetry is not None
    assert int(resumed.telemetry["locked_streams"]) == int(
        fleet.telemetry["locked_streams"])
    res_outs = _run(resumed, data, cut, n_blocks)
    for b, (got, want) in enumerate(zip(res_outs, ref_outs[cut:])):
        _assert_outs_equal(got, want, f"block {cut + b}")

    # The straggler's host-path drain: rows saved pre-checkpoint plus the
    # resumed continuation equal the uninterrupted fleet's full drain.
    ref.wait_parked_drained()
    resumed.wait_parked_drained()
    want = ref.parked_output(straggler)
    got = resumed.parked_output(straggler)
    for k in ("sym_re", "sym_im", "valid", "locked_once"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_fleet_checkpoint_chain_roundtrip_bitwise(cfg, tmp_path):
    """chain_blocks>1 round-trips through the checkpoint (structural
    ctor kwarg + restore_state fn-cache clear): the resumed chained
    fleet's continuation is bitwise the uninterrupted one."""
    n_streams, K, n_chains, cut = 8, 2, 8, 5
    data = _mixed_data(cfg, n_streams, K * n_chains)
    L = K * cfg.block_len

    def run(fleet, lo, hi):
        return [fleet.process_blocks(data[:, c * L:(c + 1) * L])
                for c in range(lo, hi)]

    ref = FleetDemodulator(cfg, n_streams, park=False, chain_blocks=K)
    ref_outs = run(ref, 0, n_chains)
    fleet = FleetDemodulator(cfg, n_streams, park=False, chain_blocks=K)
    run(fleet, 0, cut)
    ckpt = str(tmp_path / "chain.npz")
    save_fleet_checkpoint(ckpt, fleet)
    resumed = load_fleet_checkpoint(ckpt)
    assert resumed.chain_blocks == K
    res_outs = run(resumed, cut, n_chains)
    for c, (got, want) in enumerate(zip(res_outs, ref_outs[cut:])):
        _assert_outs_equal(got, want, f"chain {cut + c}")


def test_fleet_checkpoint_save_does_not_mutate(cfg, tmp_path):
    """save_fleet_checkpoint must be a pure snapshot: the live fleet's
    pending parked rows still drain afterwards."""
    n_streams, cut, straggler = 8, 9, 5
    data = _mixed_data(cfg, n_streams, cut, straggler)
    fleet = FleetDemodulator(cfg, n_streams, park_after=3)
    _run(fleet, data, 0, cut)
    assert straggler in fleet._parked
    save_fleet_checkpoint(str(tmp_path / "a.npz"), fleet)
    drained = fleet.parked_output(straggler)
    assert len(drained["valid"]) > 0


def test_serving_checkpoint_resume_bitwise(cfg, tmp_path):
    """ServingFleet: save AFTER the tau0 sort (assignment + banding are
    live), resume, outputs bit-identical and the assignment/banding
    state round-trips."""
    from tests.test_serving import _clustered_fleet
    n_streams, group, n_blocks, cut = 16, 8, 16, 11
    data = _clustered_fleet(cfg, n_streams, n_blocks)

    ref = ServingFleet(cfg, n_streams, group_size=group, band=8)
    ref_outs = _run(ref, data, 0, n_blocks)

    serving = ServingFleet(cfg, n_streams, group_size=group, band=8)
    _run(serving, data, 0, cut)
    assert serving.sorted_once, "fixture: sort must have happened"
    ckpt = str(tmp_path / "serving.npz")
    save_serving_checkpoint(ckpt, serving)

    resumed = load_serving_checkpoint(ckpt)
    assert resumed.assignment() == serving.assignment()
    assert resumed.banded_groups() == serving.banded_groups()
    assert resumed.sorted_once
    res_outs = _run(resumed, data, cut, n_blocks)
    for b, (got, want) in enumerate(zip(res_outs, ref_outs[cut:])):
        _assert_outs_equal(got, want, f"block {cut + b}")


def test_multihost_checkpoint_resume_bitwise(cfg, tmp_path):
    """MultiHostFleet per-process checkpoint: save mid-run (single
    process over the 8-device mesh — the 2-process bit-identity of the
    underlying step is pinned by tests/test_multihost.py), resume, and
    subsequent local rows are bit-identical to the uninterrupted run."""
    from meteor_demod_tpu.io.checkpoint import (
        load_multihost_checkpoint, save_multihost_checkpoint)
    from meteor_demod_tpu.parallel.multihost import MultiHostFleet
    spd, n_blocks, cut = 1, 10, 6
    import jax
    n_streams = spd * len(jax.devices())
    data = _mixed_data(cfg, n_streams, n_blocks, seed0=40)

    def run(fleet, lo, hi):
        return [fleet.process_local_blocks(
            data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
            for b in range(lo, hi)]

    ref = MultiHostFleet(cfg, spd, telemetry_every=2)
    ref_outs = run(ref, 0, n_blocks)

    fleet = MultiHostFleet(cfg, spd, telemetry_every=2)
    run(fleet, 0, cut)
    ckpt = str(tmp_path / "mh.npz")
    save_multihost_checkpoint(ckpt, fleet)
    resumed = load_multihost_checkpoint(ckpt)
    assert resumed._block_idx == cut
    assert resumed.telemetry_every == 2
    res_outs = run(resumed, cut, n_blocks)
    for b, (got, want) in enumerate(zip(res_outs, ref_outs[cut:])):
        _assert_outs_equal(got, want, f"block {cut + b}")
    assert int(resumed.telemetry["locked_streams"]) == int(
        ref.telemetry["locked_streams"])


def test_fleet_checkpoint_rejects_wrong_kind(cfg, tmp_path):
    n_streams = 8
    data = _mixed_data(cfg, n_streams, 2)
    fleet = FleetDemodulator(cfg, n_streams)
    _run(fleet, data, 0, 2)
    p = str(tmp_path / "f.npz")
    save_fleet_checkpoint(p, fleet)
    with pytest.raises(ValueError):
        load_serving_checkpoint(p)
    # The single-stream loader rejects kind-tagged files with a clear
    # error instead of a confusing KeyError deep in reconstruction.
    from meteor_demod_tpu.io.checkpoint import load_checkpoint
    with pytest.raises(ValueError, match="fleet checkpoint"):
        load_checkpoint(p)
