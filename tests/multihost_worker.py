"""Worker process for tests/test_multihost.py (not a test module).

Joins a 2-process jax.distributed CPU job (4 virtual devices per process,
8 global), runs one MultiHostFleet block step on its local stream rows, and
dumps its local outputs + the global telemetry for the parent to compare
against the single-process reference.

Usage: python multihost_worker.py <process_id> <port> <out.npz>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, port, outpath = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from meteor_demod_tpu.config import DemodConfig
    from meteor_demod_tpu.parallel.multihost import (MultiHostFleet,
                                                     init_distributed)
    from meteor_demod_tpu.sim import synth_psk

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8
    # Calling again must be a harmless no-op (the narrowed error filter).
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)

    cfg = DemodConfig(samplerate=230400, block_len=1024)
    fleet = MultiHostFleet(cfg, streams_per_device=2)
    sl = fleet.local_stream_slice()

    # Deterministic per-GLOBAL-stream fixtures; each process synthesizes
    # only its own rows (exactly how a real multi-host feed works).
    rows = []
    for g in range(sl.start, sl.stop):
        x, _ = synth_psk(400, cfg.samplerate, carrier_hz=40.0 + 10.0 * g,
                         amplitude=6000.0, snr_db=22.0, seed=70 + g)
        rows.append(x[:cfg.block_len])
    outs = fleet.process_local_blocks(np.stack(rows))

    np.savez(outpath,
             start=sl.start, stop=sl.stop,
             sym_re=outs.sym_re, sym_im=outs.sym_im, valid=outs.valid,
             locked_once=outs.locked_once,
             **{f"tel_{k}": v for k, v in fleet.telemetry.items()})
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
