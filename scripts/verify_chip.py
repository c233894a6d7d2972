"""On-chip cross-backend parity: compiled Mosaic kernel vs the scalar oracle.

The CI suite proves scan ≡ oracle (bit-exact decisions) and kernel ≡ scan
in Pallas INTERPRET mode — but interpret mode executes through XLA:CPU,
so it cannot witness what the real Mosaic compiler does with FMA
contraction on the chip. This script closes that gap: it runs the WIDE
and LOCKED compiled kernels on the TPU, block-chained from cold start
through acquisition into lock, and compares every block's outputs against
the numpy scalar oracle (demod/scalar.py — the executable spec) fed the
SAME device-computed FIR values the kernel consumed
(dsp/fir.polyphase_fir_block_tmajor, egressed per block).

Checks, per config (qpsk / oqpsk / hifi) and per program (wide / locked):
  - per-block symbol COUNTS and locked_once bit-equal
  - safety flags zero (clean fixtures; the locked envelope must hold
    through cold acquisition)
  - replicated lanes bit-identical
  - zero SIGN disagreements on lock-gated symbols
  - value drift bounded: the median |kernel - oracle| is FMA noise
    (~3e-5 on the +-134 scale); a small tail (measured ~1.6%) differs by
    up to ~0.2 rad of phase — Mosaic FMA contraction drifts the loop
    trajectories by ULPs, and when that crosses a timing-gate boundary
    the fire lands one tick off the oracle's. Count-exact, sign-exact,
    decoder-irrelevant; the strict turbo/fallback contracts only ever
    compare the kernel against ITSELF (deterministic), so no product
    path depends on cross-backend tick identity. (On XLA:CPU — scan and
    interpret-mode kernel — decisions AND values are bit-exact; the CI
    suite pins that.)

Prints one JSON line per (config, program). Exit code 0 iff all pass.
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
from meteor_demod_tpu.demod import scalar
from meteor_demod_tpu.demod.pipeline import egress
from meteor_demod_tpu.demod.state import batch_carry
from meteor_demod_tpu.dsp.fir import (make_fir_banks, f32_to_iq, iq_to_f32,
                                      polyphase_fir_block_tmajor)
from meteor_demod_tpu.kernels.block_demod import make_pallas_batch_demod
from meteor_demod_tpu.sim import synth_psk

B = 128          # kernel batch (DMA path needs the full lane width)
DISTINCT = 8     # distinct streams; tiled B//DISTINCT times across lanes
NBLOCKS = 6
BLOCK_LEN = 8192
SAMPLERATE = 230400


def log(m):
    print(m, file=sys.stderr, flush=True)


def _streams(cfg, seed0):
    n = NBLOCKS * cfg.block_len
    xs = []
    for i in range(DISTINCT):
        nsym = int(n * cfg.symrate / cfg.samplerate) + 64
        x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                         oqpsk=cfg.oqpsk, carrier_hz=60.0 + 45.0 * i,
                         amplitude=6000.0, snr_db=20.0, seed=seed0 + i)
        xs.append(x[:n])
    return np.stack(xs)                                    # (DISTINCT, n)


def _ulp_diff(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = np.abs(a.view(np.int32).astype(np.int64)
               - b.view(np.int32).astype(np.int64))
    return np.where(a == b, 0, d)


def run(name, cfg, locked):
    xs = _streams(cfg, seed0=100)
    xf = iq_to_f32(xs)                                     # (D, n, 2)
    L = cfg.block_len
    banks = make_fir_banks(cfg)

    # Locked runs verify the SHIPPED serving-tier program (config.serving:
    # tight envelope + spec-gate shrink), the one production dispatches —
    # switching wide -> locked once every stream reports lock, exactly
    # like the production hosts (the serving envelope is sized for steady
    # state, not the acquisition transient).
    fn_wide = jax.jit(make_pallas_batch_demod(cfg, B))
    fn_locked = (jax.jit(make_pallas_batch_demod(cfg.serving(), B,
                                                 locked=True))
                 if locked else None)
    all_locked = False
    # Device FIR identical to the kernel's internal one (same program
    # family/layout): tick-major over the batch.
    fir = jax.jit(lambda xt, tail: polyphase_fir_block_tmajor(xt, tail,
                                                              banks))

    rep = B // DISTINCT
    carry = batch_carry(cfg, B)
    states = [scalar.initial_state(cfg) for _ in range(DISTINCT)]
    tail_t = jnp.zeros((cfg.taps - 1, B, 2), jnp.float32)

    max_ulp = 0
    max_abs = 0.0
    flip_mag = 0.0
    sign_flips = 0
    nsym_total = 0
    rep_mismatch = 0
    diffs = []
    for k in range(NBLOCKS):
        blk_d = xf[:, k * L:(k + 1) * L]                   # (D, L, 2)
        blk = np.repeat(blk_d, rep, axis=0)                # (B, L, 2)
        xt = jnp.asarray(blk).transpose(1, 0, 2)           # (L, B, 2)
        Ft, tail_t = fir(xt, tail_t)
        Ft_np = np.asarray(egress(Ft))                     # (T, 2, B)

        use = fn_locked if (locked and all_locked) else fn_wide
        carry, outs = use(carry, jnp.asarray(blk))
        o = egress(outs)
        c_np = egress(carry)
        assert int(c_np.flags.sum()) == 0, f"{name}: flags at block {k}"
        all_locked = int(c_np.locked.sum()) == B

        for d in range(DISTINCT):
            lane = d * rep
            F_c = f32_to_iq(Ft_np[:, :, lane])
            syms, states[d] = scalar.demod_stream_np(
                cfg, xs[d, k * L:(k + 1) * L], states[d], F=F_c)
            v = np.asarray(o.valid[lane], bool)
            assert int(v.sum()) == len(syms), (
                f"{name} blk {k} stream {d}: oracle {len(syms)} symbols, "
                f"kernel {int(v.sum())}")
            kre, kim = o.sym_re[lane][v], o.sym_im[lane][v]
            ore = syms["re"].astype(np.float32)
            oim = syms["im"].astype(np.float32)
            # Value drift is meaningful only on LOCK-GATED symbols (the
            # set the product emits, io/writer.py): pre-lock the Costas
            # sweep makes the phase trajectory chaotic, so ULP-level FMA
            # differences rotate pre-lock garbage arbitrarily.
            g = syms["locked_once"].astype(bool)
            kre, kim, ore, oim = kre[g], kim[g], ore[g], oim[g]
            max_ulp = max(max_ulp, int(_ulp_diff(kre, ore).max(initial=0)),
                          int(_ulp_diff(kim, oim).max(initial=0)))
            max_abs = max(max_abs, float(np.abs(kre - ore).max(initial=0)),
                          float(np.abs(kim - oim).max(initial=0)))
            diffs.append(np.abs(np.concatenate([kre - ore, kim - oim])))
            fr = np.signbit(kre) != np.signbit(ore)
            fi = np.signbit(kim) != np.signbit(oim)
            sign_flips += int(fr.sum()) + int(fi.sum())
            if fr.any():
                flip_mag = max(flip_mag, float(np.abs(ore[fr]).max()))
            if fi.any():
                flip_mag = max(flip_mag, float(np.abs(oim[fi]).max()))
            lo = np.asarray(o.locked_once[lane][v])
            np.testing.assert_array_equal(
                lo, syms["locked_once"],
                err_msg=f"{name} blk {k} stream {d}: locked_once")
            nsym_total += len(syms)
            # Replicated lanes must be bit-identical to their template.
            for r in range(1, rep):
                for f in ("sym_re", "sym_im", "valid", "locked_once"):
                    if not np.array_equal(getattr(o, f)[lane],
                                          getattr(o, f)[lane + r]):
                        rep_mismatch += 1

    lockedn = int(np.asarray(egress(carry.locked)).sum())
    dall = np.concatenate(diffs) if diffs else np.zeros(1)
    stats = {"p50": float(np.percentile(dall, 50)),
             "p99": float(np.percentile(dall, 99)),
             "p999": float(np.percentile(dall, 99.9)),
             "n_gt1": int((dall > 1).sum()), "n": len(dall)}
    log(f"{name}: diff stats {stats}")
    frac_gt1 = stats["n_gt1"] / max(stats["n"], 1)
    res = {"config": name, "program": "locked" if locked else "wide",
           "blocks": NBLOCKS, "streams": DISTINCT, "symbols": nsym_total,
           "counts_and_lock_equal": True, "sign_flips_locked": sign_flips,
           "value_diff_p50": round(stats["p50"], 6),
           "value_diff_p99": round(stats["p99"], 3),
           "frac_gt1": round(frac_gt1, 4),
           "max_value_abs_diff": round(max_abs, 4),
           "replica_mismatches": rep_mismatch,
           "locked_streams": lockedn,
           "ok": (rep_mismatch == 0 and sign_flips == 0
                  # p50 bound: well under one int8 OUTPUT LSB (= 2.0 in
                  # these units, pipeline.quantize_symbols /2 scaling).
                  and stats["p50"] < 0.1 and frac_gt1 < 0.05)}
    print(json.dumps(res), flush=True)
    return res["ok"]


def main():
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")
    ok = True
    for name, cfg in [
        ("qpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN)),
        ("oqpsk", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                              symrate=80000.0, oqpsk=True)),
        ("hifi", DemodConfig(samplerate=SAMPLERATE, block_len=BLOCK_LEN,
                             rrc_order=64, interp=10)),
    ]:
        for locked in (False, True):
            t0 = time.time()
            ok = run(name, cfg, locked) and ok
            log(f"{name}/{'locked' if locked else 'wide'}: "
                f"{time.time()-t0:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
