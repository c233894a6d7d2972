"""Decompose the sequential single-stream floor (VERDICT r3 item 7).

The genuinely-live single stream (sample-at-a-time input, bench.py
single_stream_*) runs CHAIN blocks per dispatch through the broadcast-lane
locked kernel (demod/backend.py make_single_demod) at ~8.5 Msamp/s — the
one workload within ~13x of the reference C program. PERF.md claims the
floor is "irreducible per-block serial latency"; this script measures the
decomposition behind that claim:

  t_dispatch(CHAIN) = a + b * CHAIN   over CHAIN in {4, 16, 32}
    a: per-DISPATCH cost — host Python + tunnel RPC + queueing (the link)
    b: per-BLOCK on-device cost — the serial step chain itself

plus the bare link round trip (tiny-egress RTT, the floor of `a`), and
derives what the same program would sustain behind a PCIe-class link
(a ~ 0.1 ms): rate_pcie = block_len / b.

Run on the TPU: `python scripts/probe_single_stream.py` (~3 min warm).
Result recorded in docs/PERF.md ("Single-stream floor decomposition").
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
from meteor_demod_tpu.demod.backend import make_single_demod
from meteor_demod_tpu.demod.pipeline import egress
from meteor_demod_tpu.demod.state import init_carry
from meteor_demod_tpu.dsp.fir import iq_to_f32
from meteor_demod_tpu.sim import synth_psk

SAMPLERATE = 230400
BLOCK_LEN = 8192
CHAINS = (4, 16, 32)


def log(m):
    print(m, file=sys.stderr, flush=True)


def _sync(c):
    return int(np.sum(egress(c.flags)))


def _chained(cfg, chain, locked):
    demod = make_single_demod(cfg, "pallas", locked=locked)

    def fn(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, jnp.sum(outs.valid)

    return jax.jit(fn)


def main():
    cfg = DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN)
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")

    # Bare link round trip: the floor of the per-dispatch constant.
    z = jnp.zeros(8, jnp.int32)
    for _ in range(3):
        _ = int(np.sum(egress(z)))
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        _ = int(np.sum(egress(z)))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = 1e3 * np.median(rtts)
    log(f"bare egress RTT: median {rtt_ms:.2f} ms "
        f"(p10 {1e3*np.percentile(rtts,10):.2f}, "
        f"p90 {1e3*np.percentile(rtts,90):.2f})")

    # Locked warm carry via the wide chained program (as the hosts do).
    nmax = max(CHAINS)
    nsym = int(nmax * cfg.block_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, carrier_hz=400.0,
                     amplitude=6000.0, snr_db=18.0, seed=4)
    bl = iq_to_f32(x[:nmax * cfg.block_len].reshape(nmax, cfg.block_len))
    blocks_all = jnp.asarray(bl) + 0.0
    carry = init_carry(cfg)
    wide = _chained(cfg, 16, locked=False)
    carry, _ = wide(carry, blocks_all[:16])
    assert _sync(carry) == 0
    assert int(np.asarray(egress(carry.locked))) == 1
    log("locked")

    rows = []
    for chain in CHAINS:
        fn = _chained(cfg, chain, locked=True)
        blocks = blocks_all[:chain]
        t0 = time.time()
        c, _ = fn(carry, blocks)
        assert _sync(c) == 0
        log(f"chain={chain}: compile+dispatch {time.time()-t0:.1f}s")
        t0 = time.perf_counter()
        c, _ = fn(carry, blocks)
        _sync(c)
        dt1 = time.perf_counter() - t0
        n_calls = max(4, min(120, int(2.0 / dt1)))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            cc = carry
            for _ in range(n_calls):
                cc, _ = fn(cc, blocks)
            _sync(cc)
            dt = (time.perf_counter() - t0) / n_calls
            best = dt if best is None else min(best, dt)
        rows.append((chain, best))
        log(f"chain={chain}: {best*1e3:.2f} ms/dispatch, "
            f"{chain*cfg.block_len/best/1e6:.2f} Msamp/s")

    ch = np.array([r[0] for r in rows], float)
    tt = np.array([r[1] for r in rows], float)
    b, a = np.polyfit(ch, tt, 1)           # t = a + b*chain
    rate_now = cfg.block_len / (a / 16 + b)
    rate_device = cfg.block_len / b
    rate_pcie = cfg.block_len / (1e-4 / 16 + b)
    out = dict(
        bare_rtt_ms=round(rtt_ms, 2),
        per_dispatch_ms=round(a * 1e3, 2),
        per_block_device_ms=round(b * 1e3, 3),
        chains={str(c): round(t * 1e3, 2) for c, t in rows},
        seq_rate_chain16_msps=round(rate_now / 1e6, 2),
        device_only_rate_msps=round(rate_device / 1e6, 2),
        pcie_link_rate_msps=round(rate_pcie / 1e6, 2),
        dispatch_share_chain16=round((a / 16) / (a / 16 + b), 3),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
