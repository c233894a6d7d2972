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
import functools
import math


import numpy as np
import jax
import jax.numpy as jnp

from ..config import DemodConfig
from ..dsp.fir import f32_to_iq, iq_to_f32
from .backend import make_batch_demod
from .pipeline import egress, _SYM_DTYPE
from .state import DemodCarry, batch_carry


def make_chunk_mesh(devices=None, axis_name: str = "chunks"):
    """1-D mesh over which demod_array_turbo shards the chunk axis."""
    from jax.sharding import Mesh
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))


@dataclasses.dataclass
class TurboResult:
    symbols: np.ndarray          # structured (re, im, locked_once)
    converged: bool              # bitwise carry fixpoint reached
    passes: int                  # passes executed
    max_residual: float          # largest |g' - g| float-leaf residual, last pass
    fell_back: bool = False      # True if safety flags forced a sequential redo


@functools.lru_cache(maxsize=16)
def _chunk_fn(cfg: DemodConfig, chunks: int, kb: int, backend: str,
              mesh=None, axis_name: str = "chunks"):
    """Jitted (carry, blocks) -> (carry', outs) over all chunks.

    Single device: the batched block demodulator under an outer lax.scan.
    With a mesh: the chunk axis is sharded over the devices with shard_map —
    ONE recording then uses the whole slice, the TPU-native answer to the
    reference's strictly sequential sample loop (demod.c:23-48). Each device
    runs the same per-shard program on chunks/n_dev lanes; there is no
    cross-device traffic inside a pass (the carry hand-off between
    neighboring chunks happens in the host-side shift between passes)."""
    if mesh is None:
        demod = make_batch_demod(cfg, chunks, backend)

        def run(carry, blocks):      # blocks: (kb, C, L, 2)
            return jax.lax.scan(demod, carry, blocks)

        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    n_dev = mesh.devices.size
    demod = make_batch_demod(cfg, chunks // n_dev, backend)

    def run_local(carry, blocks):    # per-shard: (kb, C/n_dev, L, 2)
        return jax.lax.scan(demod, carry, blocks)

    sharded = shard_map(run_local, mesh=mesh,
                        in_specs=(P(axis_name), P(None, axis_name)),
                        out_specs=(P(axis_name), P(None, axis_name)),
                        check_vma=False)
    return jax.jit(sharded)


def make_device_shift_cmp(cfg: DemodConfig):
    """Jitted fixpoint-shift + convergence check, fully on device.

    (f, g, tails) -> (g_new, same, residual): g_new is the shifted carry
    (g'[0] = exact initial, g'[i+1] = f[i], data-exact FIR tails, tick
    reset); `same` is bitwise g_new == g over every leaf; `residual` the
    largest float-leaf |difference|. Lets a fixpoint driver keep everything
    device-resident and fetch only two scalars per pass (the host-side
    shift in demod_array_turbo transfers the whole carry each pass — fine
    for correctness, wasteful on high-latency host links)."""
    init_np = jax.tree_util.tree_map(np.asarray, batch_carry(cfg, 1))

    @jax.jit
    def shift_cmp(f: DemodCarry, g: DemodCarry, tails):
        g_new = jax.tree_util.tree_map(
            lambda a0, a: jnp.concatenate([jnp.asarray(a0), a[:-1]], axis=0),
            init_np, f)
        g_new = g_new._replace(fir_tail=tails,
                               tick=jnp.zeros_like(g_new.tick))
        same = jnp.array(True)
        residual = jnp.float32(0.0)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_new)):
            eq = jnp.all(a == b)
            same = jnp.logical_and(same, eq)
            if jnp.issubdtype(a.dtype, jnp.floating):
                residual = jnp.maximum(residual,
                                       jnp.max(jnp.abs(a - b)))
            else:
                residual = jnp.maximum(
                    residual, jnp.where(eq, 0.0, 1.0))
        return g_new, same, residual

    return shift_cmp


@functools.lru_cache(maxsize=4)
def _fingerprint_fn():
    """Jitted decision fingerprint of a BlockOutput: (n_valid, checksum).

    The checksum folds the int8-quantized symbol values (exactly the bytes
    the product emits, pipeline.quantize_symbols semantics) and the valid
    pattern with positional weights into one int32 (wrapping). Two passes
    with equal fingerprints produced identical quantized output streams up
    to hash collision — the 'decisions stable' convergence criterion."""

    @jax.jit
    def fp(outs):
        q = lambda v: jnp.trunc(
            jnp.clip(v * np.float32(0.5), -127.0, 127.0)).astype(jnp.int32)
        v = outs.valid.astype(jnp.int32).reshape(-1)
        qre = q(outs.sym_re).reshape(-1)
        qim = q(outs.sym_im).reshape(-1)
        w = jnp.arange(v.shape[0], dtype=jnp.int32) % 8191 + 1
        cs = jnp.sum(v * w * (3 * qre + 5 * qim + 7), dtype=jnp.int32)
        return jnp.sum(v), cs

    return fp


def demod_array_turbo(cfg: DemodConfig, x: np.ndarray, chunks: int = 32,
                      max_passes: int = 4,
                      backend: str = "auto",
                      mesh=None,
                      converge: str = "bitwise") -> TurboResult:
    """Demodulate a full recording with chunk-parallel fixpoint iteration.

    Args:
      cfg: demod configuration.
      x: (N,) complex64 (or (N, 2) float32) samples.
      chunks: time chunks == batch lanes (the parallelism degree).
      max_passes: fixpoint iteration cap; worst-case cost is
        max_passes * (N / chunks) block-demod work.
      backend: recurrence backend ('auto' picks Pallas on TPU).
      mesh: None for single-device; "auto" shards the chunk axis over all
        local devices (when >1 and chunks divides evenly); or an explicit
        1-D jax.sharding.Mesh. N-device output is bit-identical to
        1-device output (tests/test_turbo_mesh.py).
      converge: stopping criterion. "bitwise": iterate until the boundary
        carries reach the exact fixpoint — result provably equals the
        sequential chaining of the same program, but exactness propagates
        only one chunk per pass, so worst case needs chunks+1 passes.
        "symbols": stop when two consecutive passes produce identical
        int8-quantized output (the product's actual emission) — the
        practical offline mode (CLI -T): decisions are stable after 2-4
        passes once every chunk is locked; soft symbols agree with the
        sequential path within loop noise (tests/test_turbo.py). Needs
        max_passes >= 2 to be able to report convergence.
    """
    cfg.validate()
    if converge not in ("bitwise", "symbols"):
        raise ValueError(f"converge {converge!r}")
    if mesh == "auto":
        devs = jax.devices()
        mesh = (make_chunk_mesh(devs)
                if len(devs) > 1 and chunks % len(devs) == 0 else None)
    if mesh is not None and chunks % mesh.devices.size != 0:
        raise ValueError(f"chunks {chunks} not divisible by mesh size "
                         f"{mesh.devices.size}")
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
    blocks_np = xt.reshape(chunks, kb, L, 2).transpose(1, 0, 2, 3)

    # Exact FIR tails at every chunk boundary, straight from the data.
    tails = np.zeros((chunks, taps - 1, 2), np.float32)
    for c in range(1, chunks):
        tails[c] = xt[c * chunk_len - (taps - 1):c * chunk_len]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        c_shard = NamedSharding(mesh, P(axis))
        b_shard = NamedSharding(mesh, P(None, axis))
        put_carry = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), c_shard), t)
        blocks = jax.device_put(blocks_np, b_shard)
    else:
        put_carry = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        blocks = jnp.asarray(blocks_np)

    init_np = jax.tree_util.tree_map(np.asarray, batch_carry(cfg, 1))
    g_np = jax.tree_util.tree_map(
        np.array, batch_carry(cfg, chunks)._replace(fir_tail=tails))
    run = _chunk_fn(cfg, chunks, kb, backend, mesh)

    def shift_np(f: DemodCarry) -> DemodCarry:
        """g'[0] = exact initial, g'[i+1] = f[i]; tails stay data-exact.
        Pure host numpy: the per-pass convergence check already round-trips
        the (tiny) carry, so the neighbor hand-off costs nothing extra and
        needs no cross-device collective."""
        shifted = jax.tree_util.tree_map(
            lambda a0, a: np.concatenate([a0, a[:-1]], axis=0), init_np, f)
        return shifted._replace(fir_tail=tails,
                                tick=np.zeros_like(shifted.tick))

    converged = False
    passes = 0
    max_residual = float("inf")
    outs = None
    f_np = None
    prev_fp = None
    for _ in range(max_passes):
        f, outs = run(put_carry(g_np), blocks)
        f_np = egress(f)
        g_new = shift_np(f_np)
        passes += 1
        residual = 0.0
        same = True
        for a, b in zip(jax.tree_util.tree_leaves(g_np),
                        jax.tree_util.tree_leaves(g_new)):
            if not np.array_equal(a, b):
                same = False
                if np.issubdtype(a.dtype, np.floating):
                    residual = max(residual,
                                   float(np.max(np.abs(a - b))))
                else:
                    residual = max(residual, 1.0)
        max_residual = residual
        if same:
            converged = True          # bitwise fixpoint implies both modes
            break
        if converge == "symbols":
            fp = tuple(int(v) for v in egress(_fingerprint_fn()(outs)))
            if fp == prev_fp:
                converged = True
                break
            prev_fp = fp
        g_np = g_new

    # Safety net: any flagged chunk invalidates the fast-path result for the
    # affected stream positions — redo the whole recording sequentially (the
    # sequential driver routes flagged blocks to the exact scalar oracle).
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
