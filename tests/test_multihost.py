"""Multi-host + weak-scaling evidence (SURVEY.md §5 distributed backend).

1. Weak-scaling work invariance: the fleet with a FIXED per-device stream
   count must produce bit-identical per-stream output on 1/2/4/8-device
   meshes — each device always runs the same program on the same shapes, so
   scaling adds devices, never changes work. (The wall-clock side of weak
   scaling is measured by scripts/weak_scaling.py; see docs/SCALING.md.)

2. A REAL 2-process jax.distributed rendezvous (CPU, 4 virtual devices per
   process, Gloo collectives): both processes run the same MultiHostFleet
   step; their local output rows must be bit-identical to the
   single-process 8-device run on the same data, and both must see the
   same fleet-global psum telemetry.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.parallel.mesh import FleetDemodulator, make_mesh
from meteor_demod_tpu.sim import synth_psk


def _stream_fixture(cfg, g):
    x, _ = synth_psk(400, cfg.samplerate, carrier_hz=40.0 + 10.0 * g,
                     amplitude=6000.0, snr_db=22.0, seed=70 + g)
    return x[:cfg.block_len]


def test_weak_scaling_work_invariance():
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    spd = 2
    data = np.stack([_stream_fixture(cfg, g) for g in range(16)])

    per_stream = {}
    for k in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:k])
        fleet = FleetDemodulator(cfg, spd * k, mesh=mesh)
        outs = fleet.process_blocks(data[:spd * k])
        for s in range(spd * k):
            row = (np.asarray(outs.sym_re)[s], np.asarray(outs.sym_im)[s],
                   np.asarray(outs.valid)[s])
            if s in per_stream:
                for a, b in zip(per_stream[s], row):
                    np.testing.assert_array_equal(a, b,
                                                  err_msg=f"stream {s} k={k}")
            else:
                per_stream[s] = row
    assert len(per_stream) == 16


def test_two_process_distributed_fleet(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outfiles = [], []
    for pid in (0, 1):
        out = tmp_path / f"w{pid}.npz"
        outfiles.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env))
    for p in procs:
        stdout, _ = p.communicate(timeout=280)
        assert p.returncode == 0, stdout.decode()[-3000:]

    # Single-process reference: same 16 streams on this process's 8 devices
    # (same per-device batch of 2 -> the identical SPMD program).
    cfg = DemodConfig(samplerate=230400, block_len=1024)
    data = np.stack([_stream_fixture(cfg, g) for g in range(16)])
    ref = FleetDemodulator(cfg, 16)
    ref_outs = ref.process_blocks(data)

    seen = np.zeros(16, dtype=bool)
    for out in outfiles:
        z = np.load(out)
        sl = slice(int(z["start"]), int(z["stop"]))
        seen[sl] = True
        np.testing.assert_array_equal(z["sym_re"],
                                      np.asarray(ref_outs.sym_re)[sl])
        np.testing.assert_array_equal(z["sym_im"],
                                      np.asarray(ref_outs.sym_im)[sl])
        np.testing.assert_array_equal(z["valid"],
                                      np.asarray(ref_outs.valid)[sl])
        # Fleet-global telemetry: identical psums in every process.
        for k in ("locked_streams", "locked_once_streams", "symbols",
                  "flags"):
            assert int(z[f"tel_{k}"]) == int(ref.telemetry[k]), k
        np.testing.assert_allclose(float(z["tel_mean_agc_gain"]),
                                   float(ref.telemetry["mean_agc_gain"]),
                                   rtol=1e-6)
    assert seen.all(), "workers did not cover all 16 global streams"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
