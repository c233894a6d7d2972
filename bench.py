"""Benchmark: IQ demod throughput on the default 230 ksps QPSK config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N, ...}

Headline: single-stream Msamples/s through the full block demodulator
(BASELINE.json configs[0]). Extra fields report the batched fleet throughput
(configs[4] shape, one chip) and the real-time multiple at 230 ksps.

Baseline: the reference's implied full-load single-core throughput,
~0.66 Msamples/s (BASELINE.md, derived from README.md:71-76: real-time
230 ksps at ~35% of a Pi Zero core).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.scan import make_block_demod
from meteor_demod_tpu.demod.state import init_carry, batch_carry
from meteor_demod_tpu.sim import synth_psk

BASELINE_MSPS = 0.66
SAMPLERATE = 230400
REALTIME_SPS = 230400.0


def _make_signal(cfg, n_samples, seed=0):
    nsym = int(n_samples * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, carrier_hz=400.0,
                     amplitude=6000.0, snr_db=18.0, seed=seed)
    return x[:n_samples]


def _time_stream(fn, carry, blocks, n_iters):
    """Chain carry through blocks n_iters times; returns seconds/iter-block."""
    carry, outs = fn(carry, blocks[0])       # warmup / compile
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(n_iters):
        carry, outs = fn(carry, blocks[i % len(blocks)])
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / n_iters, carry


def bench_single(cfg, seconds=3.0):
    fn = jax.jit(make_block_demod(cfg), donate_argnums=(0,))
    x = _make_signal(cfg, 8 * cfg.block_len)
    blocks = [jnp.asarray(x[i:i + cfg.block_len])
              for i in range(0, len(x), cfg.block_len)]
    dt, _ = _time_stream(fn, init_carry(cfg), blocks, 8)
    n_iters = max(8, int(seconds / dt))
    dt, carry = _time_stream(fn, init_carry(cfg), blocks, n_iters)
    assert int(np.asarray(carry.flags)) == 0
    return cfg.block_len / dt


def bench_fleet(cfg, batch, seconds=3.0):
    fn = jax.jit(jax.vmap(make_block_demod(cfg)), donate_argnums=(0,))
    x = _make_signal(cfg, 2 * cfg.block_len)
    blk = np.stack([np.roll(x[:cfg.block_len], 7 * b) for b in range(batch)])
    blocks = [jnp.asarray(blk), jnp.asarray(np.conj(blk))]
    dt, _ = _time_stream(fn, batch_carry(cfg, batch), blocks, 4)
    n_iters = max(4, int(seconds / dt))
    dt, carry = _time_stream(fn, batch_carry(cfg, batch), blocks, n_iters)
    assert int(np.asarray(carry.flags).sum()) == 0
    return batch * cfg.block_len / dt


def main():
    dev = jax.devices()[0]
    cfg = DemodConfig(samplerate=SAMPLERATE, block_len=32768)
    single_sps = bench_single(cfg)
    fleet_batch = 64
    fleet_sps = bench_fleet(cfg, fleet_batch)

    value = single_sps / 1e6
    print(json.dumps({
        "metric": "iq_demod_throughput_230ksps_qpsk_single_stream",
        "value": round(value, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(value / BASELINE_MSPS, 2),
        "realtime_x": round(single_sps / REALTIME_SPS, 1),
        "fleet_batch": fleet_batch,
        "fleet_msamples_per_s_per_chip": round(fleet_sps / 1e6, 3),
        "fleet_realtime_x_per_chip": round(fleet_sps / REALTIME_SPS, 1),
        "device": str(dev.platform),
        "block_len": cfg.block_len,
    }))


if __name__ == "__main__":
    main()
