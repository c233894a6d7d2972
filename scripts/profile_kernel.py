"""Scripted kernel profiling: per-step cost + window traffic of one chained
fleet dispatch, replacing hand-collected PERF.md numbers.

Prints one JSON line with per-block ms, per-step us, and the derived
window-stream bytes/bandwidth so the roofline balance (serial-chain latency
vs HBM) is recomputed from measurement on every run. Optionally captures a
jax.profiler trace of one dispatch (--trace DIR) for Perfetto/XProf.

Measurement discipline (see CLAUDE.md): one TPU process, no donation,
device->host readback as the only honest fence, fixed dispatch counts,
device-resident data.

Usage:
  python scripts/profile_kernel.py [--config qpsk|oqpsk|hifi]
      [--batch 128] [--chain 16] [--seconds 3] [--trace DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(name: str, block_len: int):
    from meteor_demod_tpu.config import DemodConfig
    if name == "qpsk":
        return DemodConfig(samplerate=230400, block_len=block_len)
    if name == "oqpsk":
        return DemodConfig(samplerate=230400, symrate=80000.0, oqpsk=True,
                           block_len=block_len)
    if name == "hifi":
        return DemodConfig(samplerate=230400, rrc_order=64, interp=10,
                           block_len=block_len)
    raise SystemExit(f"unknown config {name!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="qpsk")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--block", type=int, default=8192)
    ap.add_argument("--group", type=int, default=None,
                    help="kernel steps per grid iteration (G; default 8)")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of one dispatch")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--locked", action="store_true",
                    help="time the LOCKED serving-tier geometry "
                         "(config.serving: narrow asymmetric window, "
                         "offset/spec gates); lock is acquired with the "
                         "wide program first — the serving envelope is "
                         "sized for steady state, not cold acquisition")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import jax.numpy as jnp
    from meteor_demod_tpu.demod.backend import make_batch_demod
    from meteor_demod_tpu.demod.pipeline import egress
    from meteor_demod_tpu.demod.state import batch_carry
    from meteor_demod_tpu.dsp.fir import iq_to_f32
    from meteor_demod_tpu.sim import synth_psk

    cfg = make_cfg(args.config, args.block)
    if args.locked:
        # The shipped locked program is the serving tier (config.serving:
        # tight envelope + spec-gate shrink) — profile what production
        # dispatches.
        cfg = cfg.serving()
    B, chain = args.batch, args.chain
    if args.group is not None:
        # --group tunes the Pallas kernel's step grouping — it has no
        # meaning for the scan backend, so require the TPU rather than
        # crash inside a CPU pallas_call.
        if jax.devices()[0].platform != "tpu":
            raise SystemExit("--group requires the TPU (Pallas kernel); "
                             "run without --group for the CPU scan backend")
        from meteor_demod_tpu.kernels.block_demod import \
            make_pallas_batch_demod
        demod = make_pallas_batch_demod(cfg, B, group=args.group,
                                        locked=args.locked)
    else:
        demod = make_batch_demod(cfg, B, locked=args.locked)

    def chained(carry, blocks):
        carry, outs = jax.lax.scan(demod, carry, blocks)
        return carry, outs.valid.sum()

    fn = jax.jit(chained)

    nsym = int(chain * cfg.block_len * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, symrate=cfg.symrate,
                     oqpsk=cfg.oqpsk, carrier_hz=400.0, amplitude=6000.0,
                     snr_db=18.0, seed=0)
    bl = iq_to_f32(x[:chain * cfg.block_len].reshape(chain, cfg.block_len))
    blocks = jnp.asarray(np.broadcast_to(
        bl[:, None], (chain, B, cfg.block_len, 2)).copy())
    carry = batch_carry(cfg, B)

    def sync(c):
        return int(np.sum(egress(c.flags)))   # the only honest fence

    if args.locked:
        # Acquire lock with the WIDE program first, as the production
        # hosts do — the serving-tier locked envelope is sized for
        # steady state, not cold acquisition.
        wide = jax.jit(lambda c, b: jax.lax.scan(
            make_batch_demod(cfg, B, locked=False), c, b))
        carry, _ = wide(carry, blocks)
        assert sync(carry) == 0

    t0 = time.time()
    carry, _ = fn(carry, blocks)
    assert sync(carry) == 0
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    carry, _ = fn(carry, blocks)
    assert sync(carry) == 0
    dt1 = time.perf_counter() - t0
    n_calls = max(3, min(100, int(args.seconds / dt1)))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry, _ = fn(carry, blocks)
    assert sync(carry) == 0
    dt = (time.perf_counter() - t0) / n_calls

    if args.trace:
        with jax.profiler.trace(args.trace):
            carry, _ = fn(carry, blocks)
            sync(carry)
        print(f"trace written to {args.trace}", file=sys.stderr)

    # Derived geometry/roofline numbers, per the window path actually
    # compiled (kernels/block_demod.py `windows` selection).
    S = cfg.steps_per_block
    G = args.group or 8
    S_pad = -(-S // G) * G
    n_grid = S_pad // G
    W = cfg.window_locked_asym if args.locked else cfg.window_common
    on_tpu = jax.devices()[0].platform == "tpu"
    mode = os.environ.get("METEOR_DEMOD_WINDOWS") or (
        "dma" if on_tpu and B % 128 == 0 else "gather")
    if mode == "dma":
        offsets = np.asarray(cfg.window_offsets, dtype=np.int64)
        offsets_pad = np.concatenate(
            [offsets, np.full(S_pad - S, offsets[-1], np.int64)])
        og = offsets_pad.reshape(n_grid, G)
        span = int(W + (og[:, -1] - og[:, 0]).max())
        span = min(-(-span // 8) * 8, cfg.block_ticks)
        # read-only in-kernel span copies of the tick-major FIR array
        win_bytes = n_grid * span * B * 4 * 2
    else:
        # prematerialized (S_pad, W, B) tiles: written by the gather AND
        # re-read by the kernel
        win_bytes = S_pad * W * B * 4 * 2 * 2
    block_ms = dt * 1e3 / chain
    step_us = dt * 1e6 / (chain * S)
    hbm_gbps = 819.0                           # v5e HBM ~819 GB/s
    win_ms_at_hbm = win_bytes / (hbm_gbps * 1e9) * 1e3
    sps = chain * cfg.block_len * B / dt

    print(json.dumps({
        "config": args.config, "locked": args.locked,
        "batch": B, "chain": chain,
        "block_len": cfg.block_len, "device": jax.devices()[0].platform,
        "windows": mode,
        "compile_plus_first_dispatch_s": round(compile_s, 1),
        "msamples_per_s": round(sps / 1e6, 2),
        "block_ms": round(block_ms, 3),
        "step_us": round(step_us, 3),
        "steps_per_block": S,
        "window_rows": W,
        "gate_candidates": cfg.gate_candidates,
        "window_stream_mb_per_block": round(win_bytes / 1e6, 1),
        "window_stream_ms_at_hbm": round(win_ms_at_hbm, 3),
        "latency_vs_hbm_ratio": round(block_ms / max(win_ms_at_hbm, 1e-9), 1),
        "dispatches": n_calls,
    }))


if __name__ == "__main__":
    main()
