"""On-chip check: turbo with the LOCKED warmup+passes is bit-equal to wide.

The fused gauge turbo runs its warmup AND fixpoint passes in the locked
kernel geometry (demod/turbo.py `_fused_gauge_fn`); warmup entries are cold
by construction, so this drives a clean cold-start acquisition through the
locked envelope on every lane and asserts, for QPSK and OQPSK:

  1. zero locked->wide reruns (no lane tripped a warmup or pass flag),
  2. the emitted PRODUCT byte stream — the int8-quantized soft symbols
     (pipeline.quantize_symbols semantics) plus the locked_once gating —
     is BIT-equal to a wide-only run (METEOR_DEMOD_TURBO_LOCKED=0); the
     raw float values are allowed their cross-program FMA-fusion ULPs
     (backend.py: locked vs wide agree to a few ULP inside the envelope),
  3. both runs converge in the O(1) two-pass budget.

Run on the TPU: `python scripts/verify_locked_warmup.py` (~2 min warm).
Result recorded in docs/PERF.md ("Locked-pass turbo").
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.sim import synth_psk
from meteor_demod_tpu.demod import turbo as T


def one_mode(oqpsk: bool) -> None:
    name = "oqpsk" if oqpsk else "qpsk"
    symrate = 80000.0 if oqpsk else 72000.0
    cfg = DemodConfig(samplerate=230400, symrate=symrate, oqpsk=oqpsk,
                      block_len=8192)
    nsym = int(16e6 * symrate / 230400)
    # Fixture shape follows bench.py's turbo recording (400 Hz offset,
    # 18 dB, amplitude 6000) — the geometry the 2-pass warmup length was
    # tuned for — but with 16 Msamples of UNIQUE signal (no chunk tiling).
    # chunks=64 keeps kb ~30 so the full 8-block warmup fits under the
    # kb/2 cap (default_warmup_blocks).
    x, _ = synth_psk(nsym, 230400.0, symrate=symrate, oqpsk=oqpsk,
                     carrier_hz=400.0, amplitude=6000.0, snr_db=18.0,
                     seed=7)
    print(f"[{name}] {x.size / 1e6:.1f} Msamples, {nsym / 1e6:.2f} Msym")

    os.environ.pop("METEOR_DEMOD_TURBO_LOCKED", None)
    r0 = T.LOCKED_PASS_WIDE_RERUNS
    t0 = time.perf_counter()
    locked = T.demod_array_turbo(cfg, x, chunks=64)
    t_locked = time.perf_counter() - t0
    reruns = T.LOCKED_PASS_WIDE_RERUNS - r0

    # try/finally: an assertion or chip error mid-run must not leave the
    # process env mutated (one_mode may be imported and reused).
    os.environ["METEOR_DEMOD_TURBO_LOCKED"] = "0"
    try:
        t0 = time.perf_counter()
        wide = T.demod_array_turbo(cfg, x, chunks=64)
        t_wide = time.perf_counter() - t0
    finally:
        os.environ.pop("METEOR_DEMOD_TURBO_LOCKED", None)

    assert locked.converged and wide.converged, (
        f"[{name}] converged: locked={locked.converged} wide={wide.converged}")
    assert reruns == 0, f"[{name}] locked run tripped {reruns} wide rerun(s)"
    n = locked.symbols["re"].size
    assert n == wide.symbols["re"].size
    # Compare the EMITTED byte streams through the product quantizer itself
    # (pipeline.quantize_symbols) so this verifier can never drift from the
    # product's int8 semantics.
    from meteor_demod_tpu.demod.pipeline import quantize_symbols
    pairs = [("locked_once", locked.symbols["locked_once"],
              wide.symbols["locked_once"]),
             ("product bytes", quantize_symbols(locked.symbols),
              quantize_symbols(wide.symbols))]
    for f, a, b in pairs:
        ndiff = int(np.count_nonzero(a != b))
        assert ndiff == 0, (
            f"[{name}] {f} differs on {ndiff}/{a.size} entries ({n} symbols)")
    print(f"[{name}] OK: {n / 1e6:.2f}M symbols bit-equal, "
          f"passes={locked.passes}/{wide.passes}, reruns=0, "
          f"wall locked {t_locked:.1f}s / wide {t_wide:.1f}s "
          f"(incl. host synth upload; throughput numbers are bench.py's)")


if __name__ == "__main__":
    one_mode(False)
    one_mode(True)
    print("locked warmup verification: ALL OK")
