"""End-to-end exercise of the turbo locked->wide auto-fallback, real chip.

The fused turbo's fixpoint passes run the LOCKED kernel and rerun the wide
variant when any lane trips a safety flag (demod/turbo.py fused_gauge_run).
The flag-free path is covered by every turbo bench/test; this script
proves the FLAGGED path end-to-end with a real signal: one sample
DROPPED every 1560 (a sampler-rate error of ~2.6x the timing clamp).
t_freq rails at its +-2^-12 clamp (timing.c:83-86) while the M&M phase
corrections keep fires ON the symbols, so the fires drift ~(rate -
clamp) * block_ticks ~ 16 ticks per block against the static window
offsets — past the LOCKED budget (window_delta_locked = drift@clamp +
1-rad jitter + margin; measured on chip: locked flags 128/128 streams at
this rate, wide 0/128) but inside the WIDE budget (4-rad jitter term).
Single isolated timing steps do NOT flag either program — the NCO phase
is internal state, so input timing steps surface as gradual in-envelope
M&M corrections (also measured).

Asserts:
  1. the clean recording converges with ZERO wide reruns (locked passes
     accepted);
  2. the glitched recording triggers EXACTLY ONE locked->wide rerun
     (LOCKED_PASS_WIDE_RERUNS increments), and
  3. its symbols bit-equal a METEOR_DEMOD_TURBO_LOCKED=0 (wide-only) run
     of the same recording — the rerun is invisible in the output.
(The glitched recording does not CONVERGE in 4 passes even with wide
passes — a sustained beyond-clamp rate error keeps the slow freq
integrator drifting between chunk entries; that is the turbo's honest
verdict on an out-of-spec sampler, and the strict CLI path then takes
the exact sequential fallback. Convergence is not what this script
tests; the locked->wide rerun mechanism is.)

Prints one JSON line; exit 0 iff all hold.
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
from meteor_demod_tpu.demod import turbo
from meteor_demod_tpu.demod.pipeline import egress
from meteor_demod_tpu.demod.turbo import demod_array_turbo
from meteor_demod_tpu.sim import synth_psk


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    _ = int(np.sum(egress(jnp.zeros(8, jnp.int32))))
    log(f"claim: {time.time()-t0:.1f}s")

    cfg = DemodConfig(samplerate=230400, block_len=8192)
    # chunks=128 keeps the cached B=128 Pallas kernels (a new batch
    # width costs a 10-40 min remote Mosaic compile on this relay); kb
    # only changes the outer scan length (cheap recompile).
    chunks, kb = 128, 16
    n = chunks * kb * cfg.block_len
    nsym = int(n * cfg.symrate / cfg.samplerate) + 64
    x, _ = synth_psk(nsym, cfg.samplerate, carrier_hz=300.0,
                     amplitude=6000.0, snr_db=20.0, seed=11)
    clean = x[:n]
    # Sampler-rate error at ~2.6x the timing clamp: locked-envelope
    # violation on every lane, wide-envelope clean (see module
    # docstring).
    drop_every = 1560
    need = n + n // drop_every + 16
    g, _ = synth_psk(int(need * cfg.symrate / cfg.samplerate) + 64,
                     cfg.samplerate, carrier_hz=300.0, amplitude=6000.0,
                     snr_db=20.0, seed=12)
    keep = np.ones(need, bool)
    keep[np.arange(drop_every, need, drop_every)] = False
    glitch = g[:need][keep][:n]

    os.environ.pop("METEOR_DEMOD_TURBO_LOCKED", None)
    turbo.LOCKED_PASS_WIDE_RERUNS = 0
    r_clean = demod_array_turbo(cfg, clean, chunks=chunks, max_passes=4)
    clean_reruns = turbo.LOCKED_PASS_WIDE_RERUNS
    log(f"clean: conv={r_clean.converged} passes={r_clean.passes} "
        f"reruns={clean_reruns}")

    turbo.LOCKED_PASS_WIDE_RERUNS = 0
    r_gl = demod_array_turbo(cfg, glitch, chunks=chunks, max_passes=4)
    gl_reruns = turbo.LOCKED_PASS_WIDE_RERUNS
    log(f"glitch: conv={r_gl.converged} passes={r_gl.passes} "
        f"fell_back={r_gl.fell_back} reruns={gl_reruns}")

    os.environ["METEOR_DEMOD_TURBO_LOCKED"] = "0"
    r_wide = demod_array_turbo(cfg, glitch, chunks=chunks, max_passes=4)
    os.environ.pop("METEOR_DEMOD_TURBO_LOCKED", None)

    same = (len(r_gl.symbols) == len(r_wide.symbols)
            and np.array_equal(r_gl.symbols["re"], r_wide.symbols["re"])
            and np.array_equal(r_gl.symbols["im"], r_wide.symbols["im"]))
    res = {
        "clean_converged": bool(r_clean.converged),
        "clean_wide_reruns": clean_reruns,
        "glitch_converged": bool(r_gl.converged),
        "glitch_fell_back": bool(r_gl.fell_back),
        "glitch_wide_reruns": gl_reruns,
        "glitch_equals_wide_only_run": bool(same),
        "ok": (r_clean.converged and clean_reruns == 0
               and gl_reruns == 1 and same),
    }
    print(json.dumps(res), flush=True)
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
