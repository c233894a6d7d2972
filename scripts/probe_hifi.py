"""Per-step cost attribution for the LOCKED hi-fi kernel, real chip.

The hi-fi fleet (fir-order 64, oversamp 10) runs ~0.67x the QPSK rate
after the r4 serving tier (docs/PERF.md); this probe attributes the
per-step cost by timing TIMING-ONLY ablations of the single-fire step
(METEOR_DEMOD_ABLATE, kernels/block_demod.py _make_step) from the same
locked warm carry:

  none     the production serving-tier locked program (baseline)
  selw32   the (W, B) window select reads a 32-row sub-slice
           -> upper bound on what any select narrowing can buy
  rowa     the AGC/sqrt chain deleted (z used raw)
  notanh   both Costas tanh-LUT lookups replaced by one sub
  nogate   the gate's compare/min tree replaced by a constant fire
  all      all four -> the floor; remainder is shared step cost

Every ablation BREAKS correctness (values/flags are garbage); the grid,
shapes and op structure are the production ones, so the timing deltas are
honest. Also times the QPSK serving program unablated for the ratio
denominator. One JSON line with Msamples/s per ablation.

Run on the TPU: `python scripts/probe_hifi.py [hifi-only]`
(both configs by default; `hifi-only` skips the QPSK sweep).
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

ABLATIONS = ["", "selw32", "rowa", "notanh", "nogate",
             "selw32,rowa,notanh,nogate"]


def log(m):
    print(m, file=sys.stderr, flush=True)


def _sync(c):
    return int(np.sum(egress(c.flags)))


def _fn(cfg, locked):
    c = cfg.serving() if locked else cfg
    demod = make_pallas_batch_demod(c, BATCH, locked=locked)

    def chained(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, jnp.sum(outs.valid)

    return jax.jit(chained)


def run(name, cfg, ablations):
    nsym = int(CHAIN * cfg.block_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=400.0, amplitude=6000.0,
                     snr_db=18.0, seed=0)
    bl = iq_to_f32(x[:CHAIN * cfg.block_len].reshape(CHAIN, cfg.block_len))
    blocks = jnp.broadcast_to(jnp.asarray(bl)[:, None],
                              (CHAIN, BATCH, cfg.block_len, 2)) + 0.0
    wide = _fn(cfg, False)
    carry = batch_carry(cfg, BATCH)
    t0 = time.time()
    carry, _ = wide(carry, blocks)
    assert _sync(carry) == 0
    log(f"{name}: wide warm {time.time()-t0:.1f}s, "
        f"locked {int(np.sum(egress(carry.locked)))}/{BATCH}")

    per_call = CHAIN * cfg.block_len * BATCH
    sv = cfg.serving()
    res = {"config": name, "W_locked": sv.window_locked_asym,
           "K": sv.gate_candidates, "k0": sv.gate_offset_locked}
    for ab in ablations:
        os.environ["METEOR_DEMOD_ABLATE"] = ab
        try:
            fn = _fn(cfg, True)
            t0 = time.time()
            c, _ = fn(carry, blocks)
            _sync(c)
            log(f"[{name}/{ab or 'none'}] compile+dispatch "
                f"{time.time()-t0:.1f}s")
            t0 = time.perf_counter()
            c, _ = fn(carry, blocks)
            _sync(c)
            n_calls = max(3, min(60, int(2.0 / (time.perf_counter() - t0))))
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                cc = carry
                for _ in range(n_calls):
                    cc, _ = fn(cc, blocks)
                _sync(cc)
                rates.append(n_calls * per_call
                             / (time.perf_counter() - t0))
            res[ab or "none"] = round(max(rates) / 1e6, 1)
            log(f"[{name}/{ab or 'none'}] best {max(rates)/1e6:.1f} Msps")
        finally:
            os.environ.pop("METEOR_DEMOD_ABLATE", None)
    print(json.dumps(res), flush=True)


def main():
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")
    run("hifi", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                            rrc_order=64, interp=10), ABLATIONS)
    if "hifi-only" not in sys.argv[1:]:
        run("qpsk", DemodConfig(samplerate=SAMPLERATE,
                                block_len=BLOCK_LEN), ABLATIONS)


if __name__ == "__main__":
    main()
