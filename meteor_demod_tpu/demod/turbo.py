"""Turbo mode: one long recording demodulated at fleet throughput.

The per-symbol recurrence serializes a single stream (SURVEY.md §5,
sequence parallelism). Turbo mode breaks the serialization by mapping C
time-chunks of ONE recording onto the batch lanes of the (Pallas) block
demodulator and iterating the chunk-boundary carries to a fixpoint:

  pass p:  f[i] = Demod(g[i], chunk_i)         for all i in parallel
           g'[0] = exact initial state; g'[i+1] = f[i]
  stop when g' == g bitwise (then, by induction from chunk 0, every chunk
  started from its exact sequential carry and the result equals the
  sequential demodulation bit-for-bit), or after `max_passes`.

Two facts make few-pass convergence work:
- The FIR delay-line tail at every chunk boundary is known exactly from the
  input data itself — it never participates in the iteration.
- The loop states (PLL phase/freq, AGC gain/bias, timing phase) are
  contractive once locked: a cold-started chunk re-acquires within the
  chunk, so after 2-3 passes each chunk starts from a near-exact carry and
  symbol decisions match the sequential result; with long chunks the
  iteration reaches the bitwise fixpoint.

If the fixpoint is not reached, the result is still a valid demodulation
whose soft symbols agree with the sequential path to within the loop noise
(the `converged` flag and residuals report the state); callers needing
bit-exactness can keep iterating or fall back to StreamDemodulator.
"""

from __future__ import annotations

import dataclasses
import math


import numpy as np
import jax
import jax.numpy as jnp

from ..config import DemodConfig
from ..dsp.fir import f32_to_iq, iq_to_f32
from .backend import make_batch_demod
from .pipeline import egress, _SYM_DTYPE
from .state import DemodCarry, batch_carry


@dataclasses.dataclass
class TurboResult:
    symbols: np.ndarray          # structured (re, im, locked_once)
    converged: bool              # bitwise carry fixpoint reached
    passes: int                  # passes executed
    max_residual: float          # largest |g' - g| float-leaf residual, last pass
    fell_back: bool = False      # True if safety flags forced a sequential redo


def _chunk_fn(cfg: DemodConfig, chunks: int, kb: int, backend: str):
    demod = make_batch_demod(cfg, chunks, backend)

    def run(carry, blocks):      # blocks: (kb, C, L, 2)
        return jax.lax.scan(demod, carry, blocks)

    return jax.jit(run)


def demod_array_turbo(cfg: DemodConfig, x: np.ndarray, chunks: int = 32,
                      max_passes: int = 4,
                      backend: str = "auto") -> TurboResult:
    """Demodulate a full recording with chunk-parallel fixpoint iteration.

    Args:
      cfg: demod configuration.
      x: (N,) complex64 (or (N, 2) float32) samples.
      chunks: time chunks == batch lanes (the parallelism degree).
      max_passes: fixpoint iteration cap; worst-case cost is
        max_passes * (N / chunks) block-demod work.
      backend: recurrence backend ('auto' picks Pallas on TPU).
    """
    cfg.validate()
    if np.iscomplexobj(x):
        xf = iq_to_f32(np.asarray(x, dtype=np.complex64))
    else:
        xf = np.ascontiguousarray(x, dtype=np.float32)
    N = len(xf)
    L = cfg.block_len
    taps = cfg.taps

    def _sequential(tag_converged=True):
        from .pipeline import StreamDemodulator
        d = StreamDemodulator(cfg, backend=backend)
        syms = np.concatenate([d.process(f32_to_iq(xf)), d.finish()])
        return TurboResult(symbols=syms, converged=tag_converged, passes=0,
                           max_residual=0.0, fell_back=True)

    # Turbo covers whole chunks only; the sub-multiple tail is demodulated
    # sequentially from the (exact) final chunk carry — no zero padding, no
    # spurious pad symbols.
    kb = N // (chunks * L)
    if kb == 0:
        return _sequential()
    chunk_len = kb * L
    turbo_n = chunks * chunk_len
    xt = xf[:turbo_n]

    # (kb, C, L, 2): block k of chunk c = xt[c*chunk_len + k*L : ... + L]
    blocks = jnp.asarray(
        xt.reshape(chunks, kb, L, 2).transpose(1, 0, 2, 3))

    # Exact FIR tails at every chunk boundary, straight from the data.
    tails = np.zeros((chunks, taps - 1, 2), np.float32)
    for c in range(1, chunks):
        tails[c] = xt[c * chunk_len - (taps - 1):c * chunk_len]
    tails_j = jnp.asarray(tails)

    g = batch_carry(cfg, chunks)._replace(fir_tail=jnp.asarray(tails))
    run = _chunk_fn(cfg, chunks, kb, backend)

    def shift(f: DemodCarry) -> DemodCarry:
        """g'[0] = exact initial, g'[i+1] = f[i]; tails stay data-exact."""
        init0 = batch_carry(cfg, 1)
        shifted = jax.tree_util.tree_map(
            lambda a0, a: jnp.concatenate([a0, a[:-1]], axis=0), init0, f)
        return shifted._replace(fir_tail=tails_j,
                                tick=jnp.zeros_like(shifted.tick))

    converged = False
    passes = 0
    max_residual = float("inf")
    outs = None
    f = None
    for _ in range(max_passes):
        f, outs = run(g, blocks)
        g_new = shift(f)
        passes += 1
        g_np, gn_np = egress((g, g_new))
        residual = 0.0
        same = True
        for a, b in zip(jax.tree_util.tree_leaves(g_np),
                        jax.tree_util.tree_leaves(gn_np)):
            if not np.array_equal(a, b):
                same = False
                if np.issubdtype(a.dtype, np.floating):
                    residual = max(residual,
                                   float(np.max(np.abs(a - b))))
                else:
                    residual = max(residual, 1.0)
        max_residual = residual
        if same:
            converged = True
            break
        g = g_new

    # Safety net: any flagged chunk invalidates the fast-path result for the
    # affected stream positions — redo the whole recording sequentially (the
    # sequential driver routes flagged blocks to the exact scalar oracle).
    f_np = egress(f)
    if int(np.asarray(f_np.flags).sum()) != 0:
        return _sequential(tag_converged=False)

    # Assemble symbols in stream order from the final pass.
    o = egress(outs)
    sym_re = np.asarray(o.sym_re)        # (kb, C, S)
    sym_im = np.asarray(o.sym_im)
    valid = np.asarray(o.valid).astype(bool)
    lonce = np.asarray(o.locked_once)
    parts = []
    for c in range(chunks):
        m = valid[:, c, :].reshape(-1)
        n_val = int(m.sum())
        s = np.zeros(n_val, dtype=_SYM_DTYPE)
        s["re"] = sym_re[:, c, :].reshape(-1)[m]
        s["im"] = sym_im[:, c, :].reshape(-1)[m]
        s["locked_once"] = lonce[:, c, :].reshape(-1)[m]
        parts.append(s)

    # Sequential tail from the last chunk's final carry (exact when the
    # fixpoint converged; within loop noise otherwise).
    if turbo_n < N:
        from .pipeline import StreamDemodulator
        d = StreamDemodulator(cfg, backend=backend)
        d._carry = jax.tree_util.tree_map(lambda a: jnp.asarray(a[-1]), f_np)
        parts.append(d.process(f32_to_iq(xf[turbo_n:])))
        parts.append(d.finish())

    return TurboResult(symbols=np.concatenate(parts), converged=converged,
                      passes=passes, max_residual=max_residual)
