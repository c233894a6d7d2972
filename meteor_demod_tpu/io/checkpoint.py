"""Checkpoint / resume: serialize the demodulator state mid-stream.

The reference has no checkpointing (SURVEY.md section 5) — its closest
analogue is the partial-ring flush at EOF (main.c:321-322). In the TPU
framework the scan carry (FIR delay-line tail, PLL phase/freq/err/locked,
timing phase/freq/prev, AGC gain/bias, OQPSK inphase/slot) IS a complete,
exact checkpoint: demodulation resumed from a saved carry is sample-for-sample
identical to an uninterrupted run. This module serializes that carry (plus
the sub-block pending buffer and host-side counters) to a single .npz file.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from ..config import DemodConfig
from ..demod.pipeline import StreamDemodulator
from ..demod.state import DemodCarry

_FORMAT_VERSION = 1


def save_checkpoint(path: str, demod: StreamDemodulator) -> None:
    """Serialize a StreamDemodulator's complete state to `path` (.npz).

    Drains the dispatch pipeline first (demod.sync()) so the carry is
    flag-verified and the in-flight blocks' symbols are not lost — they are
    returned by the next process()/finish() call."""
    from ..demod.pipeline import egress, _SYM_DTYPE
    demod.sync()
    carry = {f"carry_{k}": np.asarray(v)
             for k, v in egress(demod._carry)._asdict().items()}
    backlog = (np.concatenate(demod._backlog) if demod._backlog
               else np.zeros(0, dtype=_SYM_DTYPE))
    meta = dict(version=_FORMAT_VERSION,
                cfg=dataclasses.asdict(demod.cfg),
                symbols_out=demod.symbols_out,
                fallback_blocks=demod.fallback_blocks)
    np.savez(path,
             meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             pending=demod._pending,
             backlog_re=backlog["re"], backlog_im=backlog["im"],
             backlog_lo=backlog["locked_once"],
             **carry)


def load_checkpoint(path: str) -> StreamDemodulator:
    """Reconstruct a StreamDemodulator exactly as saved."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        cfg = DemodConfig(**meta["cfg"])
        d = StreamDemodulator(cfg)
        leaves = {k[len("carry_"):]: jnp.asarray(z[k])
                  for k in z.files if k.startswith("carry_")}
        d._carry = DemodCarry(**leaves)
        d._pending = np.asarray(z["pending"], dtype=np.complex64)
        if "backlog_re" in z.files and len(z["backlog_re"]):
            from ..demod.pipeline import _SYM_DTYPE
            backlog = np.zeros(len(z["backlog_re"]), dtype=_SYM_DTYPE)
            backlog["re"] = z["backlog_re"]
            backlog["im"] = z["backlog_im"]
            backlog["locked_once"] = z["backlog_lo"]
            d._backlog = [backlog]
        d.symbols_out = int(meta["symbols_out"])
        d.fallback_blocks = int(meta["fallback_blocks"])
        d._publish_telemetry()
    return d
