"""Weak-scaling harness: fixed per-device fleet load vs device count.

Runs the fleet demodulator with a FIXED number of streams per device on
meshes of growing size and reports per-device throughput and efficiency
vs the 1-device run. Weak scaling is the BASELINE.md target (>=80% at >=2
hosts): streams are independent, the only collective is the tiny telemetry
psum, so per-device work is invariant by construction (proven bitwise in
tests/test_multihost.py::test_weak_scaling_work_invariance) and efficiency
is bounded by input-feed bandwidth and host contention, not by the step.

On a dev box this exercises virtual CPU devices, which SHARE the host's
cores — wall-clock efficiency then measures core contention, not the
design; the honest reading is the per-device-work invariance plus the
multi-process rendezvous test. On a real pod slice, run with --no-force to
use the actual chips.

Usage:
  python scripts/weak_scaling.py [--devices 1,2,4,8] [--spd 8]
      [--block 4096] [--steps 4] [--no-force]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--spd", type=int, default=8,
                    help="streams per device (fixed per-device load)")
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--no-force", action="store_true",
                    help="use real devices instead of a virtual CPU mesh")
    args = ap.parse_args()
    sizes = [int(s) for s in args.devices.split(",")]

    if not args.no_force:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={max(sizes)}"
            ).strip()
    import jax
    if not args.no_force:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from meteor_demod_tpu.config import DemodConfig
    from meteor_demod_tpu.parallel.mesh import FleetDemodulator, make_mesh
    from meteor_demod_tpu.sim import synth_psk

    ncore = len(os.sched_getaffinity(0))
    cfg = DemodConfig(samplerate=230400, block_len=args.block)
    data = {}

    def stream_block(g):
        x, _ = synth_psk(int(cfg.block_len / cfg.osf) + 64, cfg.samplerate,
                         carrier_hz=40.0 + 7.0 * g, amplitude=6000.0,
                         snr_db=22.0, seed=700 + g)
        return x[:cfg.block_len]

    rows = []
    for k in sizes:
        n = args.spd * k
        blocks = np.stack([stream_block(g) for g in range(n)])
        fleet = FleetDemodulator(cfg, n, mesh=make_mesh(jax.devices()[:k]))
        fleet.process_blocks(blocks)              # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.steps):
            fleet.process_blocks(blocks)
        dt = (time.perf_counter() - t0) / args.steps
        sps = n * cfg.block_len / dt
        rows.append(dict(devices=k, streams=n,
                         msps_total=round(sps / 1e6, 2),
                         msps_per_device=round(sps / 1e6 / k, 2),
                         step_ms=round(dt * 1e3, 1)))
        print(f"devices={k:2d} streams={n:3d} "
              f"{rows[-1]['msps_total']:8.2f} Msamp/s total  "
              f"{rows[-1]['msps_per_device']:6.2f} /device  "
              f"step {rows[-1]['step_ms']:7.1f} ms", file=sys.stderr)

    # Efficiency is relative to the SMALLEST run in this invocation — the
    # key names the actual baseline device count so a --devices list that
    # omits 1 cannot masquerade as a vs-1-device number.
    base_row = min(rows, key=lambda r: r["devices"])
    base = base_row["msps_per_device"]
    key = f"efficiency_vs_{base_row['devices']}dev"
    for r in rows:
        r[key] = round(r["msps_per_device"] / base, 3)
    print(json.dumps({"host_cores": ncore,
                      "forced_virtual_cpu": not args.no_force,
                      "block_len": args.block, "spd": args.spd,
                      "rows": rows}))


if __name__ == "__main__":
    main()
