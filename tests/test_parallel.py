"""Mesh-sharded fleet demodulation tests on the virtual 8-device CPU mesh.

Numerical invariant (SURVEY.md section 4, item 3): N-shard output must be
bit-for-bit identical to single-device output — sharding the stream axis
never changes any stream's symbols, because streams are independent and the
per-device program is the same vmapped block demodulator.
"""

import jax
import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.scan import jit_batch_block_demod
from meteor_demod_tpu.demod.state import batch_carry
from meteor_demod_tpu.parallel.mesh import FleetDemodulator, make_mesh
from meteor_demod_tpu.sim import synth_psk


@pytest.fixture(scope="module")
def cfg():
    return DemodConfig(samplerate=230400, block_len=2048)


def _fleet_blocks(cfg, n_streams, n_blocks, seed0=40):
    xs = []
    for i in range(n_streams):
        x, _ = synth_psk(
            int(n_blocks * cfg.block_len * cfg.symrate / cfg.samplerate) + 64,
            cfg.samplerate, carrier_hz=50.0 + 40.0 * i, amplitude=6000.0,
            snr_db=22.0, seed=seed0 + i)
        xs.append(x[:n_blocks * cfg.block_len])
    return np.stack(xs)  # (n_streams, n_blocks * block_len)


def test_fleet_matches_unsharded(cfg):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must force 8 virtual devices"
    n_streams, n_blocks = 8, 2
    data = _fleet_blocks(cfg, n_streams, n_blocks)

    fleet = FleetDemodulator(cfg, n_streams, mesh=make_mesh())
    fleet_out = []
    for b in range(n_blocks):
        blk = data[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        fleet_out.append(fleet.process_blocks(blk))

    # Unsharded reference: same vmapped program on one device.
    from meteor_demod_tpu.dsp.fir import iq_to_f32
    fn = jit_batch_block_demod(cfg)
    carry = batch_carry(cfg, n_streams)
    ref_out = []
    for b in range(n_blocks):
        blk = iq_to_f32(data[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        carry, outs = fn(carry, blk)
        ref_out.append(outs)

    for got, ref in zip(fleet_out, ref_out):
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
        np.testing.assert_array_equal(np.asarray(got.sym_re),
                                      np.asarray(ref.sym_re))
        np.testing.assert_array_equal(np.asarray(got.sym_im),
                                      np.asarray(ref.sym_im))

    # Per-stream carry equality too (everything, not just emitted symbols).
    for k, v in fleet.carry._asdict().items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(getattr(carry, k)), err_msg=k)


def test_fleet_telemetry_psum(cfg):
    n_streams = 8
    data = _fleet_blocks(cfg, n_streams, 1, seed0=60)
    fleet = FleetDemodulator(cfg, n_streams)
    outs = fleet.process_blocks(data[:, :cfg.block_len])
    tel = {k: int(np.asarray(v)) if np.asarray(v).ndim == 0 else v
           for k, v in fleet.telemetry.items()}
    # psum over the mesh must equal the host-side reduction over all streams.
    assert tel["symbols"] == int(np.asarray(outs.valid).sum())
    assert tel["flags"] == 0
    assert 0 <= tel["locked_streams"] <= n_streams
    # Per-stream safety flags exposed for recovery routing.
    assert fleet.stream_flags.shape == (n_streams,)
    assert fleet.flagged_streams().size == 0


def test_fleet_telemetry_amortized_matches_per_block(cfg):
    """telemetry_every=K (the reference polls getters at the UI refresh
    interval, main.c:231-237, not per buffer) must not change ANY stream's
    output or carry — the collective-free program is the same demod minus
    the psum — and telemetry must update exactly on the refresh ticks
    (blocks 0, K, 2K, ...) while staying at the last tick's values in
    between."""
    n_streams, n_blocks, K = 8, 5, 3
    data = _fleet_blocks(cfg, n_streams, n_blocks, seed0=80)

    ref = FleetDemodulator(cfg, n_streams)
    amo = FleetDemodulator(cfg, n_streams, telemetry_every=K)
    tel_seen = []
    for b in range(n_blocks):
        blk = data[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        r = ref.process_blocks(blk)
        a = amo.process_blocks(blk)
        for name in r._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(r, name)),
                err_msg=f"block {b} field {name}")
        # Between ticks the amortized fleet reports the LAST tick's
        # telemetry; on ticks it must equal the per-block fleet's.
        if b % K == 0:
            for k in ref.telemetry:
                np.testing.assert_array_equal(
                    np.asarray(amo.telemetry[k]),
                    np.asarray(ref.telemetry[k]), err_msg=f"tick {b} {k}")
        tel_seen.append({k: np.asarray(v).copy()
                         for k, v in amo.telemetry.items()})
        # Per-stream flags ride every block regardless of ticks.
        assert amo.stream_flags.shape == (n_streams,)
    # Non-tick blocks kept the tick values (symbols count frozen).
    assert (tel_seen[1]["symbols"] == tel_seen[0]["symbols"]
            and tel_seen[2]["symbols"] == tel_seen[0]["symbols"])
    assert tel_seen[3]["symbols"] != tel_seen[0]["symbols"]
    # Carry equality: the two fleets are in the identical state.
    for k, v in amo.carry._asdict().items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(getattr(ref.carry, k)), err_msg=k)


def test_fleet_rejects_bad_shapes(cfg):
    fleet = FleetDemodulator(cfg, 8)
    with pytest.raises(ValueError):
        fleet.process_blocks(np.zeros((4, cfg.block_len), dtype=np.complex64))
    with pytest.raises(ValueError):
        FleetDemodulator(cfg, 3)   # not divisible by 8 devices


def test_time_sharded_fir_matches_single_device():
    """Overlap-save FIR sharded along time with ppermute halos must equal
    the one-device result exactly (SURVEY.md section 5 sequence-parallel
    plan)."""
    import jax.numpy as jnp
    from meteor_demod_tpu.dsp.fir import (iq_to_f32, make_fir_banks,
                                          polyphase_fir_block)
    from meteor_demod_tpu.parallel.timeshard import make_sharded_fir, time_mesh
    from meteor_demod_tpu.sim import synth_psk

    cfg = DemodConfig(samplerate=230400, block_len=2048)
    n_dev = len(jax.devices())
    L = n_dev * cfg.block_len
    x, _ = synth_psk(int(L * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=120.0, amplitude=6000.0,
                     snr_db=25.0, seed=77)
    xf = iq_to_f32(x[:L])

    mesh = time_mesh()
    F_sharded = make_sharded_fir(cfg, mesh)(
        jax.device_put(xf, jax.NamedSharding(mesh, jax.P("time"))))

    banks = make_fir_banks(cfg)
    tail = jnp.zeros((cfg.taps - 1, 2), dtype=jnp.float32)
    F_single, _ = polyphase_fir_block(jnp.asarray(xf), tail, banks)

    np.testing.assert_array_equal(np.asarray(F_sharded),
                                  np.asarray(F_single))
