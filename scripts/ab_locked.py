"""A/B: wide vs LOCKED-mode kernel geometry, fleet shape, real chip.

Measures the chained fleet demod (bench.py methodology: device-resident
blocks, CHAIN blocks/dispatch, best-of-3 windows, egress fence) with the
wide and the locked program from the same locked warm carry, for the three
fleet configs (QPSK / OQPSK / hi-fi). Prints one JSON line per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import egress
from meteor_demod_tpu.demod.state import batch_carry
from meteor_demod_tpu.dsp.fir import iq_to_f32
from meteor_demod_tpu.kernels.block_demod import make_pallas_batch_demod
from meteor_demod_tpu.sim import synth_psk

SAMPLERATE = 230400
BLOCK_LEN = 8192
CHAIN = 16
BATCH = 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def _sync(c):
    return int(np.sum(egress(c.flags)))


def _fn(cfg, locked):
    demod = make_pallas_batch_demod(cfg, BATCH, locked=locked)

    def chained(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, jnp.sum(outs.valid)

    return jax.jit(chained)


def run(name, cfg):
    nsym = int(CHAIN * cfg.block_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=400.0, amplitude=6000.0,
                     snr_db=18.0, seed=0)
    bl = iq_to_f32(x[:CHAIN * cfg.block_len].reshape(CHAIN, cfg.block_len))
    blocks = jnp.broadcast_to(jnp.asarray(bl)[:, None],
                              (CHAIN, BATCH, cfg.block_len, 2)) + 0.0
    res = {"config": name, "K": cfg.gate_candidates,
           "k0": cfg.gate_offset_locked, "W": cfg.window_common,
           "W_locked": cfg.window_locked_asym}
    # Warm with the wide program until locked (production acquisition).
    wide = _fn(cfg, False)
    carry = batch_carry(cfg, BATCH)
    t0 = time.time()
    carry, _ = wide(carry, blocks)
    assert _sync(carry) == 0
    log(f"{name}: wide compile+warm {time.time()-t0:.1f}s")
    locked_n = int(np.sum(egress(carry.locked)))
    log(f"{name}: locked streams after warm: {locked_n}/{BATCH}")
    res["locked_streams"] = locked_n

    per_call = CHAIN * cfg.block_len * BATCH
    for tag, locked in (("wide", False), ("locked", True)):
        fn = _fn(cfg, locked)
        t0 = time.time()
        c, _ = fn(carry, blocks)
        flags = _sync(c)
        log(f"{name}/{tag}: compile+dispatch {time.time()-t0:.1f}s "
            f"flags={flags}")
        res[f"{tag}_flags"] = flags
        t0 = time.perf_counter()
        c, _ = fn(carry, blocks)
        _sync(c)
        dt1 = time.perf_counter() - t0
        n_calls = max(3, min(60, int(2.0 / dt1)))
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            cc = carry
            for _ in range(n_calls):
                cc, _ = fn(cc, blocks)
            _sync(cc)
            rates.append(n_calls * per_call / (time.perf_counter() - t0))
        res[f"{tag}_msps"] = round(max(rates) / 1e6, 1)
        res[f"{tag}_spread"] = [round(r / 1e6, 1) for r in sorted(rates)]
        log(f"{name}/{tag}: best {max(rates)/1e6:.1f} Msps")
    print(json.dumps(res), flush=True)


def main():
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")
    run("qpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN))
    run("oqpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                             symrate=80000.0, oqpsk=True))
    run("hifi", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                            rrc_order=64, interp=10))


if __name__ == "__main__":
    main()
