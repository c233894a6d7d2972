"""Benchmark: IQ demod throughput on the default 230 ksps QPSK config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N, ...}

Headline: fleet throughput per chip — 128 concurrent streams (BASELINE.json
configs[4]), the production serving shape. Extra fields report single-stream
throughput (configs[0]) and real-time multiples at 230 ksps.

Methodology: the block demodulator is chained K blocks per dispatch with an
outer lax.scan, so the measurement sees device throughput, not host/tunnel
round-trip latency. No buffer donation (donation wedges the tunneled PJRT
backend — see CLAUDE.md); only the safety flags are fetched at the end
(through the egress copy, see demod/pipeline.py) as the dispatch fence.

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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _make_signal(cfg, n_samples, seed=0):
    nsym = int(n_samples * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, carrier_hz=400.0,
                     amplitude=6000.0, snr_db=18.0, seed=seed)
    return x[:n_samples]


def _bench(cfg, batch, seconds):
    """Returns samples/sec through the chained block demod.

    On TPU the Pallas recurrence kernel is the product fast path; elsewhere
    (CPU smoke runs) the XLA scan path is used."""
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
        return carry, outs.valid.sum()

    # No donation: the carry is a handful of scalars (copy cost ~0), and
    # donated buffers have been observed to wedge the second dispatch on the
    # tunneled PJRT backend.
    fn = jax.jit(chained)

    x = _make_signal(cfg, CHAIN * cfg.block_len)
    blocks = iq_to_f32(x.reshape(CHAIN, cfg.block_len))      # (K, L, 2)
    if batch:
        blocks = np.broadcast_to(blocks[:, None],
                                 (CHAIN, batch, cfg.block_len, 2)).copy()
        carry0 = batch_carry(cfg, batch)
    else:
        carry0 = init_carry(cfg)
    blocks = jnp.asarray(blocks)

    def sync(c):
        """Hard barrier: device->host readback of the safety flags.
        (block_until_ready returns before execution completes on the
        tunneled PJRT backend, so a transfer is the only honest fence.)"""
        return int(np.sum(egress(c.flags)))

    t0 = time.time()
    carry, nsym = fn(carry0, blocks)                          # compile+run
    assert sync(carry) == 0
    log(f"compile+first dispatch (batch={batch}): {time.time()-t0:.1f}s")

    # Calibrate, then run a fixed dispatch count (an open-ended timed loop
    # would enqueue async dispatches far faster than the device drains them).
    t0 = time.perf_counter()
    carry, nsym = fn(carry, blocks)
    assert sync(carry) == 0
    dt1 = time.perf_counter() - t0
    n_calls = max(3, min(100, int(seconds / dt1)))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry, nsym = fn(carry, blocks)
    assert sync(carry) == 0
    dt = time.perf_counter() - t0
    per_call = CHAIN * cfg.block_len * (batch or 1)
    sps = n_calls * per_call / dt
    log(f"batch={batch}: {n_calls} dispatches, {sps/1e6:.2f} Msamples/s")
    return sps


def main():
    t_start = time.time()
    dev = jax.devices()[0]
    cfg = DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN)
    fleet_batch = 128
    fleet_sps = _bench(cfg, batch=fleet_batch, seconds=3.0)
    # Secondary configs (BASELINE.json configs[1]/[3] and single-stream) run
    # only while budget remains — the remote compile service is erratic — and
    # tolerate failure without sinking the headline.
    def maybe(name, cfg2, batch, budget_s):
        if time.time() - t_start > budget_s:
            log(f"skipping {name}: out of time budget")
            return None
        try:
            return _bench(cfg2, batch=batch, seconds=2.0)
        except Exception as e:    # noqa: BLE001 - report partial results
            log(f"{name} bench failed: {e}")
            return None

    single_sps = maybe("single-stream", cfg, None, 240)
    oqpsk_sps = maybe(
        "oqpsk-fleet",
        DemodConfig(samplerate=SAMPLERATE, symrate=80000.0, oqpsk=True,
                    block_len=BLOCK_LEN), fleet_batch, 330)
    hifi_sps = maybe(
        "hifi-fleet",
        DemodConfig(samplerate=SAMPLERATE, rrc_order=64, interp=10,
                    block_len=BLOCK_LEN), fleet_batch, 420)

    value = fleet_sps / 1e6
    print(json.dumps({
        "metric": "iq_demod_Msamples_per_s_per_chip_230ksps_qpsk_128stream_fleet",
        "value": round(value, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(value / BASELINE_MSPS, 1),
        "fleet_batch": fleet_batch,
        "fleet_realtime_x_per_chip": round(fleet_sps / REALTIME_SPS, 1),
        "single_stream_msamples_per_s":
            round(single_sps / 1e6, 3) if single_sps else None,
        "single_stream_realtime_x":
            round(single_sps / REALTIME_SPS, 1) if single_sps else None,
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
