"""A/B: round-4 locked-geometry levers on the real chip (VERDICT r3 items
1 and 5).

From the same locked warm carry (bench.py methodology: device-resident
blocks, CHAIN blocks/dispatch, best-of-3 windows, egress fence), measures
the LOCKED fleet program variants:

- base:    the r3 serving geometry (locked_jitter_rad=1.0, drift_frac=1.0)
- pargate: + parallel gate B over the feasible kA candidates (OQPSK only;
           config.pargate_bounds, METEOR_DEMOD_PARGATE=1) — measured
           REJECT, kept for re-measurement
- tight:   locked_jitter_rad=0.5, locked_drift_frac=0.5
- tight2:  locked_jitter_rad=0.5, locked_drift_frac=0.25 — the SHIPPED
           serving tier (config.serving())
- b256:    base geometry at batch 256 — measured REJECT (and the locked
           OQPSK b256 program crashes the remote AOT compiler)

Out-of-envelope streams flag into the exact oracle fallback; a variant
must stay flag-free on the bench fixture or it is a REJECT. main() runs
the tight/tight2 comparison by default; edit the per-config variant
lists to re-measure the historical levers (results in docs/PERF.md).
Prints one JSON line per config. Run: `python scripts/ab_locked_r4.py`
(~10-20 min warm, longer on first compiles).
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
TIGHT = dict(locked_jitter_rad=0.5, locked_drift_frac=0.5)
TIGHT2 = dict(locked_jitter_rad=0.5, locked_drift_frac=0.25)


def log(m):
    print(m, file=sys.stderr, flush=True)


def _sync(c):
    return int(np.sum(egress(c.flags)))


def _fn(cfg, locked, batch=BATCH, pargate=False):
    if pargate:
        os.environ["METEOR_DEMOD_PARGATE"] = "1"
    try:
        demod = make_pallas_batch_demod(cfg, batch, locked=locked)
    finally:
        os.environ.pop("METEOR_DEMOD_PARGATE", None)

    def chained(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, jnp.sum(outs.valid)

    return jax.jit(chained)


def _measure(tag, fn, carry, blocks, per_call, res):
    t0 = time.time()
    c, _ = fn(carry, blocks)
    flags = _sync(c)
    log(f"  {tag}: compile+dispatch {time.time()-t0:.1f}s flags={flags}")
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
    log(f"  {tag}: best {max(rates)/1e6:.1f} Msps")


def _warm(cfg, batch, blocks):
    wide = _fn(cfg, False, batch)
    carry = batch_carry(cfg, batch)
    t0 = time.time()
    carry, _ = wide(carry, blocks)
    assert _sync(carry) == 0
    locked_n = int(np.sum(egress(carry.locked)))
    log(f"  wide warm {time.time()-t0:.1f}s, locked {locked_n}/{batch}")
    assert locked_n == batch
    return carry


def _blocks(cfg, batch):
    nsym = int(CHAIN * cfg.block_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=400.0, amplitude=6000.0,
                     snr_db=18.0, seed=0)
    bl = iq_to_f32(x[:CHAIN * cfg.block_len].reshape(CHAIN, cfg.block_len))
    return jnp.broadcast_to(jnp.asarray(bl)[:, None],
                            (CHAIN, batch, cfg.block_len, 2)) + 0.0


def run(name, cfg, variants):
    log(f"== {name} ==")
    cfg_t = DemodConfig(**{**cfg.__dict__, **TIGHT})
    cfg_t2 = DemodConfig(**{**cfg.__dict__, **TIGHT2})
    res = {"config": name,
           "W_locked_base": cfg.window_locked_asym,
           "W_locked_tight": cfg_t.window_locked_asym,
           "W_locked_tight2": cfg_t2.window_locked_asym,
           "slices_tight2": cfg_t2.locked_pair_slices,
           "slices_base": cfg.locked_pair_slices,
           "slices_tight": cfg_t.locked_pair_slices,
           "k0_base": cfg.gate_offset_locked,
           "k0_tight": cfg_t.gate_offset_locked,
           "pargate_bounds": cfg.pargate_bounds}
    blocks = _blocks(cfg, BATCH)
    carry = _warm(cfg, BATCH, blocks)
    per_call = CHAIN * cfg.block_len * BATCH
    for tag in variants:
        try:
            if tag == "b256":
                blocks2 = _blocks(cfg, 256)
                carry2 = _warm(cfg, 256, blocks2)
                _measure("b256", _fn(cfg, True, 256), carry2, blocks2,
                         2 * per_call, res)
                continue
            c = (cfg_t2 if tag.startswith("tight2")
                 else cfg_t if tag.startswith("tight") else cfg)
            pg = tag.endswith("pargate")
            _measure(tag, _fn(c, True, BATCH, pargate=pg), carry, blocks,
                     per_call, res)
        except Exception as e:   # noqa: BLE001 — erratic remote compiles
            log(f"  {tag}: FAILED {e}")
            res[f"{tag}_error"] = str(e)[:200]
    print(json.dumps(res), flush=True)


def main():
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "oqpsk"):
        # b256 dropped here: the locked OQPSK kernel at batch 256 crashes
        # the remote AOT compiler (array.h limits<=dim check, SIGABRT) —
        # an upstream compiler bug; the wide b256 program compiles fine.
        run("oqpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                                 symrate=80000.0, oqpsk=True),
            ["tight", "tight2"])
    if which in ("all", "hifi"):
        run("hifi", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                                rrc_order=64, interp=10),
            ["tight", "tight2"])
    if which in ("all", "qpsk"):
        run("qpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN),
            ["tight", "tight2"])


if __name__ == "__main__":
    main()
