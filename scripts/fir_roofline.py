"""FIR roofline + precision/layout levers (VERDICT r3 item 3).

The north star (BASELINE.json) asks that "the RRC FIR and
rotation/interpolation kernels hit speed-of-light on a single chip". This
script states that roofline honestly for the Toeplitz-matmul FIR
(dsp/fir.py, replacing /root/reference/filter.c:45-65) and measures the
named levers:

Analytical ceilings (v5e, defaults: taps=65, interp=5, chunk=128, U=192):
  - useful FLOPs/sample  = interp*taps*2*2          = 1300
  - issued FLOPs/sample  = interp*U*2*2             = 3840 (banded padding,
    utilization taps/U = 0.34 — the padding buys gather-free windows)
  - HBM bytes/sample     ~ 8 (x in) + 40 (F out)    = 48
  - MXU f32-HIGHEST peak ~ bf16_peak/6 ~ 197/6 ~ 33 TFLOP/s (6-pass bf16x3
    on both operands); HBM ~ 819 GB/s
  -> compute ceiling (issued)  ~ 8.5 Gsamp/s at HIGHEST, ~51 at bf16
     memory  ceiling            ~ 17 Gsamp/s

Measured variants (speed + max rel error vs the per-sample oracle):
  - block FIR (polyphase_fir_block) at HIGHEST / HIGH (bf16x3) / DEFAULT
    (bf16) matmul precision
  - tick-major fleet FIR (polyphase_fir_block_tmajor): the production
    lax.scan-of-chunk-matmuls, vs a single BATCHED dot_general +
    transpose (trades the serial chunk chain for one relayout)

Run on the TPU: `python scripts/fir_roofline.py`. Results -> docs/PERF.md
("FIR roofline"); accepted levers land in dsp/fir.py.
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
from meteor_demod_tpu.dsp.fir import (make_fir_banks, _toeplitz_weight,
                                      _FIR_CHUNK, fir_reference_np,
                                      iq_to_f32)
from meteor_demod_tpu.sim import synth_psk

SAMPLERATE = 230400
N_SINGLE = 1 << 21          # block-FIR fixture length
L_FLEET = 8192              # fleet FIR block
B_FLEET = 128

PREC = {"highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}


def log(m):
    print(m, file=sys.stderr, flush=True)


def _block_fir(banks, precision):
    """polyphase_fir_block's TPU path with a precision knob (probe copy)."""
    interp, taps = np.shape(banks)
    ch = _FIR_CHUNK
    # numpy, NOT a device array: trace-time constants must fold at trace
    # (a captured device buffer measured 12x slower on this backend —
    # CLAUDE.md "trace-time constants must be numpy").
    wm_np = _toeplitz_weight(np.asarray(banks), ch)

    def fir(x, tail):
        L = x.shape[0]
        xin = jnp.concatenate([tail, x])
        k = L // ch
        a = xin[:L].reshape(k, ch, 2)
        ext = jnp.concatenate([a[1:, :taps - 1],
                               xin[None, L:L + taps - 1]], axis=0)
        win = jnp.concatenate([a, ext], axis=1)
        out = jax.lax.dot_general(
            win, jnp.asarray(wm_np), (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        return out.transpose(0, 2, 1).reshape(L, interp, 2)

    return fir


def _tmajor_scan(banks, precision):
    """polyphase_fir_block_tmajor's TPU path (probe copy, precision knob)."""
    interp, taps = np.shape(banks)
    ch = _FIR_CHUNK
    wm_t_np = _toeplitz_weight(np.asarray(banks), ch).T

    def fir(x, tail_t):
        L, Bb = x.shape[0], x.shape[1]
        xin = jnp.concatenate([tail_t, x])
        k = L // ch
        u_len = ch + taps - 1
        a = xin[:L].reshape(k, ch, Bb, 2)
        ext = jnp.concatenate([a[1:, :taps - 1],
                               xin[None, L:L + taps - 1]], axis=0)
        win = jnp.concatenate([a, ext], axis=1)
        winf = win.transpose(0, 1, 3, 2).reshape(k, u_len, 2 * Bb)

        def chunk_dot(_, rhs):
            return None, jax.lax.dot_general(
                jnp.asarray(wm_t_np), rhs, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)

        _, out = jax.lax.scan(chunk_dot, None, winf)
        return out.reshape(L * interp, 2, Bb)

    return fir


def _tmajor_batched(banks, precision):
    """Alternative: ONE batched dot_general over the chunk axis, then a
    relayout transpose into tick-major — trades the scan's k serial small
    matmuls for one big matmul + one (k, 2B, O) -> (k, O, 2B) transpose."""
    interp, taps = np.shape(banks)
    ch = _FIR_CHUNK
    wm_np2 = _toeplitz_weight(np.asarray(banks), ch)            # (U, O)

    def fir(x, tail_t):
        L, Bb = x.shape[0], x.shape[1]
        xin = jnp.concatenate([tail_t, x])
        k = L // ch
        u_len = ch + taps - 1
        a = xin[:L].reshape(k, ch, Bb, 2)
        ext = jnp.concatenate([a[1:, :taps - 1],
                               xin[None, L:L + taps - 1]], axis=0)
        win = jnp.concatenate([a, ext], axis=1)
        winf = win.transpose(0, 1, 3, 2).reshape(k, u_len, 2 * Bb)
        out = jax.lax.dot_general(
            winf, jnp.asarray(wm_np2), (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)      # (k, 2B, O)
        return out.transpose(0, 2, 1).reshape(L * interp, 2, Bb)

    return fir


def _time(fn, args, n_bytes_hint, samples, seconds=2.0):
    # Compile+warm FIRST, then calibrate n_calls on a warm dispatch — a
    # dt1 that includes compile collapses n_calls to 3 and the ~27 ms
    # egress fence then dominates the window (the r4 probe's first runs
    # measured exactly that, 3-12x low).
    jfn = jax.jit(lambda x, t: jnp.sum(fn(x, t)))
    float(np.asarray(egress(jfn(*args))))                # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(egress(jfn(*args))))
    dt1 = time.perf_counter() - t0
    n_calls = max(30, min(300, int(seconds / max(dt1 - 0.025, 1e-4))))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = None
        for _ in range(n_calls):
            s = jfn(*args)
        float(np.asarray(egress(s)))
        rates.append(n_calls * samples / (time.perf_counter() - t0))
    return max(rates)


def main():
    cfg = DemodConfig(samplerate=SAMPLERATE, block_len=L_FLEET)
    banks = make_fir_banks(cfg)
    interp, taps = banks.shape
    ch = _FIR_CHUNK
    U = ch + taps - 1

    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")

    # ---- error fixture: small, vs the per-sample oracle ------------------
    xe, _ = synth_psk(4000, cfg.samplerate, carrier_hz=300.0,
                      amplitude=6000.0, snr_db=18.0, seed=11)
    xe = xe[:4 * ch]
    xef = iq_to_f32(xe)
    tail0 = np.zeros((taps - 1, 2), np.float32)
    ref = fir_reference_np(xe, np.zeros(taps - 1, np.complex64), banks)
    scale = np.abs(ref).max()

    def err_of(fir):
        F = np.asarray(egress(jax.jit(fir)(jnp.asarray(xef),
                                           jnp.asarray(tail0))))
        got = F[..., 0] + 1j * F[..., 1]
        return float(np.abs(got - ref).max() / scale)

    # ---- fixtures ---------------------------------------------------------
    xs, _ = synth_psk(int(N_SINGLE / cfg.osf) + 64, cfg.samplerate,
                      carrier_hz=300.0, amplitude=6000.0, snr_db=18.0,
                      seed=12)
    x1 = jnp.asarray(iq_to_f32(xs[:N_SINGLE]))
    t1 = jnp.zeros((taps - 1, 2), jnp.float32)
    xfl = jnp.zeros((L_FLEET, B_FLEET, 2), jnp.float32) + x1[:L_FLEET, None]
    tfl = jnp.zeros((taps - 1, B_FLEET, 2), jnp.float32)

    out = {"taps": int(taps), "interp": int(interp), "chunk": ch, "U": U,
           "useful_flops_per_sample": int(interp * taps * 4),
           "issued_flops_per_sample": int(interp * U * 4),
           "hbm_bytes_per_sample": 48}
    for pname, prec in PREC.items():
        fir = _block_fir(banks, prec)
        sps = _time(fir, (x1, t1), 0, N_SINGLE)
        e = err_of(fir)
        out[f"block_{pname}_msps"] = round(sps / 1e6, 1)
        out[f"block_{pname}_issued_tflops"] = round(
            sps * interp * U * 4 / 1e12, 2)
        out[f"block_{pname}_maxrelerr"] = float(f"{e:.2e}")
        log(f"block/{pname}: {sps/1e6:.0f} Msamp/s, "
            f"{sps*interp*U*4/1e12:.1f} issued TFLOP/s, err {e:.2e}")

    samples_fleet = L_FLEET * B_FLEET
    for vname, maker in (("scan", _tmajor_scan), ("batched", _tmajor_batched)):
        for pname in ("highest", "high"):
            fir = maker(banks, PREC[pname])
            sps = _time(fir, (xfl, tfl), 0, samples_fleet)
            out[f"tmajor_{vname}_{pname}_msps"] = round(sps / 1e6, 1)
            log(f"tmajor/{vname}/{pname}: {sps/1e6:.0f} Msamp/s")

    # tick-major value parity of the batched variant vs the scan variant
    # (HIGHEST): the chunk matmul contraction order is fixed per chunk in
    # both, so they should be bitwise equal.
    a = np.asarray(egress(jax.jit(_tmajor_scan(banks, PREC["highest"]))(
        xfl, tfl)))
    b = np.asarray(egress(jax.jit(_tmajor_batched(banks, PREC["highest"]))(
        xfl, tfl)))
    out["tmajor_batched_bitwise_equal"] = bool((a == b).all())
    out["tmajor_batched_maxreldiff"] = float(
        f"{np.abs(a - b).max() / max(1e-9, np.abs(a).max()):.2e}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
