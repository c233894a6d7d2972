"""Mesh-sharded turbo: ONE recording across N devices == 1 device, bitwise.

demod_array_turbo with a mesh shards the chunk axis over devices via
shard_map (demod/turbo.py _chunk_fn). Chunks are independent within a pass
and the boundary hand-off happens in the host-side shift, so sharding must
not change a single bit of the result — same convergence trajectory, same
symbols. This is the sequence-parallel analogue of
tests/test_parallel.py::test_fleet_matches_unsharded.
"""

import jax
import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.turbo import demod_array_turbo, make_chunk_mesh
from meteor_demod_tpu.sim import synth_psk


@pytest.fixture(scope="module")
def recording():
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks = 8
    n = chunks * 2 * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=180.0, amplitude=6000.0,
                     snr_db=22.0, seed=51)
    return cfg, chunks, x[:n]


def test_mesh_turbo_equals_single_device(recording):
    cfg, chunks, x = recording
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"

    single = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1)
    meshed = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1,
                               mesh=make_chunk_mesh())

    assert single.converged and meshed.converged
    assert single.passes == meshed.passes
    np.testing.assert_array_equal(meshed.symbols["re"], single.symbols["re"])
    np.testing.assert_array_equal(meshed.symbols["im"], single.symbols["im"])
    np.testing.assert_array_equal(meshed.symbols["locked_once"],
                                  single.symbols["locked_once"])


def test_mesh_turbo_oqpsk_gauge_equals_single_device():
    """The OQPSK fused gauge path (one-dispatch fixpoint + global
    half-value re-pairing) sharded over 8 devices must match 1 device at
    the DECISION level: same symbol count, gauges, signs and lock
    telemetry. Bitwise float equality across the two program shapes is not
    the contract here: the single-device program batches all 8 lanes while
    the mesh runs batch-1 shards, and XLA:CPU rounds e.g. the AGC sqrt
    differently between the two vector widths — a 1-ulp warmup t_phase
    difference then drifts one lane's soft values within loop noise (the
    same tolerance gauge convergence itself is defined by). The bitwise
    sharding claim is covered by test_mesh_turbo_equals_single_device,
    whose fused program is shape-identical per lane; the mesh-sharded
    PER-PASS loop (the continuation path after a non-converged fused run)
    is covered by test_mesh_turbo_loop_equals_single_device below."""
    cfg = DemodConfig(samplerate=240000, symrate=80000.0, oqpsk=True,
                      block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, symrate=cfg.symrate, oqpsk=True,
                     carrier_hz=120.0, amplitude=6000.0, snr_db=18.0,
                     seed=33)
    x = x[:n]

    single = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    meshed = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4,
                               mesh=make_chunk_mesh())
    assert single.converged and meshed.converged
    # Pass counts may differ by one for the same reason the soft values
    # drift: a decision-level wobble in one lane can defer the fingerprint
    # match a pass. Both must stay O(1).
    assert single.passes <= 3 and meshed.passes <= 3
    np.testing.assert_array_equal(np.asarray(meshed.gauges),
                                  np.asarray(single.gauges))
    assert len(meshed.symbols) == len(single.symbols)
    np.testing.assert_array_equal(np.sign(meshed.symbols["re"]),
                                  np.sign(single.symbols["re"]))
    np.testing.assert_array_equal(np.sign(meshed.symbols["im"]),
                                  np.sign(single.symbols["im"]))
    np.testing.assert_array_equal(meshed.symbols["locked_once"],
                                  single.symbols["locked_once"])


def test_mesh_turbo_auto_and_validation(recording):
    cfg, chunks, x = recording
    # "auto" picks the full local mesh when chunks divide evenly ...
    auto = demod_array_turbo(cfg, x, chunks=chunks, max_passes=chunks + 1,
                             mesh="auto")
    assert auto.converged
    # ... and an explicit mesh that does not divide the chunks is rejected.
    with pytest.raises(ValueError):
        demod_array_turbo(cfg, x, chunks=6, mesh=make_chunk_mesh())


def test_mesh_turbo_loop_equals_single_device(monkeypatch):
    """The mesh-sharded PER-PASS gauge loop (gauge_fixpoint over
    _chunk_fn_packed with shard_map — the production continuation path
    when the fused 2-pass program does not converge) against 1 device.
    Decision-level contract, like the OQPSK test above: the per-device
    batch width differs (1 vs 8 lanes), so XLA:CPU vector-width rounding
    makes bitwise equality across the two program shapes the wrong claim;
    both must converge in O(1) passes with identical gauges and signs.
    Needs chunks long enough for the warmup to lock (unlike the tiny
    shared `recording` fixture, whose 2-block chunks leave gauge mode to
    the bitwise O(chunks) propagation)."""
    cfg = DemodConfig(samplerate=230400, block_len=2048)
    chunks, kb = 8, 16
    n = chunks * kb * cfg.block_len
    x, _ = synth_psk(int(n * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=180.0, amplitude=6000.0,
                     snr_db=18.0, seed=52)
    x = x[:n]
    monkeypatch.setenv("METEOR_DEMOD_NO_FUSED", "1")

    single = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4)
    meshed = demod_array_turbo(cfg, x, chunks=chunks, max_passes=4,
                               mesh=make_chunk_mesh())
    assert single.converged and meshed.converged
    assert single.passes <= 3 and meshed.passes <= 3
    np.testing.assert_array_equal(np.asarray(meshed.gauges),
                                  np.asarray(single.gauges))
    assert len(meshed.symbols) == len(single.symbols)
    np.testing.assert_array_equal(np.sign(meshed.symbols["re"]),
                                  np.sign(single.symbols["re"]))
    np.testing.assert_array_equal(np.sign(meshed.symbols["im"]),
                                  np.sign(single.symbols["im"]))
    np.testing.assert_array_equal(meshed.symbols["locked_once"],
                                  single.symbols["locked_once"])
