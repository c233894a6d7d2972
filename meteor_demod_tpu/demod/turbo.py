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
  chunk, so each chunk quickly starts from a near-exact carry and symbol
  decisions match the sequential result.

One loop state is NOT contractive: the Costas quadrant. A QPSK signal is
invariant under 90-degree rotations (pll.c's tanh detector has the same
symmetry), so every cold-started chunk locks in an arbitrary quadrant, and
the naive fixpoint resolves that gauge only one chunk per pass — O(chunks)
passes. The `gauge` convergence mode (the default for QPSK) removes the
serialization entirely:

  1. warmup: each lane demodulates a short window of REAL data preceding
     its chunk from cold, producing w[c] — an estimate of the true state at
     its own chunk start, in the lane's own arbitrary quadrant gauge.
  2. pass 1 runs every chunk from w[c]; decisions are already correct
     up to each lane's gauge.
  3. the per-boundary quadrant k[c] = round((f[c-1].p_phase -
     w[c].p_phase) / (pi/2)) is measured from two estimates of the SAME
     physical boundary state; all cumulative gauges are then resolved in
     ONE host-side O(chunks) scan, not one chunk per pass.
  4. refinement passes enter each lane with its predecessor's exit carry
     rotated INTO the lane's own gauge — a tiny perturbation — so the
     fixpoint contracts in O(1) passes; convergence is declared when two
     consecutive passes emit the identical decision stream (sign-level
     fingerprint) and every gauge residual is far from the pi/4 decision
     boundary.
  5. assembly rotates lane c's symbols by the cumulative quadrant K[c]
     (exact sign/swap ops, no rounding) into chunk 0's gauge — the same
     gauge the sequential demodulator would have used.

If the fixpoint is not reached, the result is still a valid demodulation
whose soft symbols agree with the sequential path to within the loop noise
(the `converged` flag and residuals report the state); callers needing
bit-exactness can keep iterating or fall back to StreamDemodulator.
"""

from __future__ import annotations

import dataclasses
import functools
import os


import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import DemodConfig
from ..dsp.fir import f32_to_iq, iq_to_f32
from .backend import make_batch_demod
from .pipeline import egress, _SYM_DTYPE
from .state import (BlockOutput, DemodCarry, batch_carry,
                    batch_carry_np)


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
    gauges: np.ndarray | None = None  # per-lane cumulative quadrant K (gauge mode)
    # Samples re-demodulated sequentially by a fallback (0 on the fast
    # path). The strict-mode bounded fallback resumes from the last
    # verified chunk boundary, so this is proportional to the divergent
    # SUFFIX, not the whole recording (tests/test_turbo.py).
    fallback_samples: int = 0


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


_HALF_PI = np.float32(np.pi / 2)
_TWO_PI = np.float32(2 * np.pi)
# Gauge residuals must sit far from the pi/4 quantization boundary for the
# quadrant measurement to be trustworthy; pi/8 leaves a 2x margin over the
# worst residual observed at 6 dB SNR (~0.26 rad).
GAUGE_DELTA_TOL = float(np.pi / 8)
# A stable decision fingerprint is only trustworthy if no future lock
# transition can invalidate it: with chunks shorter than the p_err EMA
# memory, decisions look stable for a pass or two while the lock state is
# still propagating one chunk per pass. The gate: every lane's entry p_err
# must be either safely below the lock threshold (no flip possible — the
# slow p_freq/p_err asymptotics that keep crawling for many passes cannot
# change decisions from there) or settled to relative tolerance.
GAUGE_PERR_SAFE = 0.7 * float(C.LOCK_THRESH)
GAUGE_ENTRY_TOL = 5e-3


def _lane_fp_body(outs):
    """Per-lane decision fingerprint of a BlockOutput (traceable body).

    Folds the sign bits (the decoded hard decisions), the valid pattern and
    the locked_once telemetry with positional weights into TWO wrapping
    int32 checksums per chunk lane (independent weight moduli and
    coefficient sets — a collision must fool both, making the probability
    of a silently suppressed mismatch ~2^-64-scale), plus the per-lane
    valid count. Two passes with equal fingerprints emitted identical
    decision streams up to that collision bound. Signs, not int8 levels:
    quantization LSBs keep twitching at loop-noise amplitude long after
    the decisions are stable.
    """
    v = outs.valid.astype(jnp.int32)              # (kb, C, S)
    sr = jnp.where(outs.sym_re >= 0, 1, -1) * v
    si = jnp.where(outs.sym_im >= 0, 1, -1) * v
    lo = outs.locked_once.astype(jnp.int32)
    kb, _, S = v.shape
    idx = jnp.arange(kb * S, dtype=jnp.int32).reshape(kb, 1, S)
    w = idx % 8191 + 1
    cs = jnp.sum(w * (7 * v + 3 * sr + 5 * si + 11 * lo), axis=(0, 2))
    w2 = idx % 8087 + 1
    cs2 = jnp.sum(w2 * (13 * v + 17 * sr + 19 * si + 23 * lo), axis=(0, 2))
    return jnp.sum(v, axis=(0, 2)), cs, cs2


# Packed carry layout for the gauge fixpoint's per-pass host round-trips:
# every device<->host transfer on the tunneled backend costs a round trip
# PER ARRAY, so the ~19-leaf carry pytree is packed into three arrays
# (float leaves (NF, C), int leaves (NI, C), FIR tail) in each direction.
_INT_FIELDS = ("locked", "locked_once", "slot", "tick", "flags")
_FLOAT_FIELDS = tuple(n for n in DemodCarry._fields
                      if n not in _INT_FIELDS + ("fir_tail",))


def pack_carry_np(c: DemodCarry):
    fl = np.stack([np.asarray(getattr(c, n), np.float32)
                   for n in _FLOAT_FIELDS])
    il = np.stack([np.asarray(getattr(c, n), np.int32)
                   for n in _INT_FIELDS])
    return fl, il, np.asarray(c.fir_tail, np.float32)


def unpack_carry_np(fl, il, tail) -> DemodCarry:
    kw = {n: np.asarray(fl)[i] for i, n in enumerate(_FLOAT_FIELDS)}
    kw.update({n: np.asarray(il)[i] for i, n in enumerate(_INT_FIELDS)})
    return DemodCarry(fir_tail=np.asarray(tail), **kw)


def _unpack_j(pc):
    """Traced packed carry (fl (NF, C), il (NI, C), tail) -> DemodCarry."""
    fl, il, tail = pc
    kw = {n: fl[i] for i, n in enumerate(_FLOAT_FIELDS)}
    kw.update({n: il[i] for i, n in enumerate(_INT_FIELDS)})
    return DemodCarry(fir_tail=tail, **kw)


def _pack_j(c):
    return (jnp.stack([getattr(c, n) for n in _FLOAT_FIELDS]),
            jnp.stack([getattr(c, n) for n in _INT_FIELDS]),
            c.fir_tail)


@functools.lru_cache(maxsize=16)
def _chunk_fn_packed(cfg: DemodConfig, chunks: int, kb: int, backend: str,
                     mesh=None, axis_name: str = "chunks"):
    """Jitted (packed_carry, blocks) -> (packed_carry', outs, lane_fp).

    The gauge-fixpoint runner: same chunk-lane demod as _chunk_fn, but the
    carry crosses the host link packed (see pack_carry_np) and the per-lane
    decision fingerprint is fused into the program — one dispatch and one
    egress per pass instead of a dispatch per fingerprint and a round trip
    per carry leaf. `outs` stays device-resident for the final assembly."""
    unpack_j, pack_j = _unpack_j, _pack_j

    if mesh is None:
        demod = make_batch_demod(cfg, chunks, backend)

        def run(pc, blocks):         # blocks: (kb, C, L, 2)
            c, outs = jax.lax.scan(demod, unpack_j(pc), blocks)
            return pack_j(c), outs, _lane_fp_body(outs)

        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    n_dev = mesh.devices.size
    demod = make_batch_demod(cfg, chunks // n_dev, backend)

    def run_local(pc, blocks):       # per-shard: (kb, C/n_dev, L, 2)
        c, outs = jax.lax.scan(demod, unpack_j(pc), blocks)
        return pack_j(c), outs, _lane_fp_body(outs)

    lane = P(None, axis_name)
    sharded = shard_map(
        run_local, mesh=mesh,
        in_specs=((lane, lane, P(axis_name)), lane),
        out_specs=((lane, lane, P(axis_name)),
                   BlockOutput(sym_re=lane, sym_im=lane, valid=lane,
                               locked_once=lane),
                   (P(axis_name),) * 3),
        check_vma=False)
    return jax.jit(sharded)


def _gauge_measure(f, w, cfg=None):
    """Per-boundary quadrant between chunk c-1's exit and chunk c's own
    warmup estimate of the same physical state (host numpy, O(chunks)).

    QPSK: the gauge group is the Costas quadrant alone. OQPSK (cfg given
    and cfg.oqpsk): a pi/2 carrier rotation only yields a stable lock
    together with a half-symbol shift of the I/Q labeling (the half-symbol
    FIRE grid is the same for every lane — timing locks to the eye
    pattern; only which instants are called I vs Q shifts), so the group
    is still Z4 with timing parity == k mod 2. The parity is measured
    independently from the ticks-to-next-Q-fire of the two estimates and
    must agree with the quadrant measurement; a mismatch poisons delta so
    the convergence test cannot pass on that boundary.

    Returns (k, delta, K): k[c-1] is the signed quadrant count at boundary
    c, delta the leftover radians after removing it (loop noise — small iff
    both estimates track the carrier), and K[c] the cumulative quadrant
    rotating lane c's outputs into chunk 0's gauge."""
    diff = np.asarray(f.p_phase, np.float64)[:-1] - np.asarray(
        w.p_phase, np.float64)[1:]
    k = np.round(diff / _HALF_PI).astype(np.int64)
    delta = diff - k * float(_HALF_PI)
    if cfg is not None and cfg.oqpsk:
        # Ticks until the next symbol-completing (Q) fire: t_phase runs
        # 0 -> pi (I fire) -> 2*pi (Q fire, reset) regardless of slot.
        nq = lambda c: ((2 * np.pi - np.asarray(c.t_phase, np.float64))
                        / np.asarray(c.t_freq, np.float64))
        h2 = np.pi / float(cfg.timing_freq)          # half-symbol in ticks
        m = np.round((nq(f)[:-1] - nq(w)[1:]) / h2).astype(np.int64)
        # The instant correction (one fire's p_freq, ~1e-2 rad) is far
        # below the pi/8 delta tolerance and cannot move the pi/2
        # quantization; only the parity consistency matters.
        delta = np.where((k - m) % 2 == 0, delta, np.pi)
    K = np.concatenate([[0], np.cumsum(k)])
    return k, delta, K


def _gauge_shift_np(init_np, f, w, k, tails, cfg=None):
    """Pass p+1 entry carries: predecessor exits rotated into each lane's
    OWN gauge (host numpy).

    Lane 0 gets the exact initial state; lane c gets f[c-1] with p_phase
    rotated by -k[c]*pi/2 so the entry matches the gauge lane c locked in
    at pass 1 — the entry is then a tiny perturbation of the lane's own
    previous entry and the fixpoint contracts in O(1) passes. t_prev (the
    previous symbol's Q, a gauge-dependent quantity) rotates exactly for
    even quadrants; odd quadrants would need the unstored I component, so
    the lane's own warmup estimate — the same physical symbol in the right
    gauge — stands in. Everything else in the carry is gauge-invariant.
    FIR tails are data-exact; tick and flags reset per pass.

    OQPSK (cfg given and cfg.oqpsk): an odd quadrant also shifts the lane's
    I/Q labeling by half a symbol, so EVERY grid-dependent leaf (slot,
    t_phase, inphase, t_prev, p_phase) comes from the lane's own warmup
    estimate — the same physical state in the lane's labeling — while the
    contractive, gauge-invariant leaves (t_freq, p_freq, p_err, lock
    state, sweep direction, AGC — AGC acts on the raw pre-mix FIR output,
    which no gauge touches) refine from the predecessor's exit. Even
    quadrants keep the grid: k%4==2 negates the pending half-symbol
    `inphase` along with t_prev (the constellation flips sign)."""
    oqpsk = cfg is not None and cfg.oqpsk
    g = jax.tree_util.tree_map(
        lambda a0, a: np.concatenate([a0, a[:-1]], axis=0), init_np, f)
    pp = g.p_phase.copy()
    pp[1:] = np.mod(pp[1:].astype(np.float64) - k * float(_HALF_PI),
                    2 * np.pi).astype(np.float32)
    km = k % 4
    flip = km == 2
    odd = (km % 2) == 1
    tp = g.t_prev.copy()
    tp[1:][flip] = -tp[1:][flip]
    tp[1:][odd] = w.t_prev[1:][odd]
    g = g._replace(p_phase=pp, t_prev=tp, fir_tail=tails,
                   tick=np.zeros_like(g.tick),
                   flags=np.zeros_like(g.flags))
    if oqpsk:
        ip = g.inphase.copy()
        ip[1:][flip] = -ip[1:][flip]
        sub = lambda a, b: np.concatenate(
            [a[:1], np.where(odd, b[1:], a[1:])], axis=0)
        g = g._replace(
            inphase=sub(ip, w.inphase),
            slot=sub(g.slot, w.slot),
            t_phase=sub(g.t_phase, w.t_phase),
            p_phase=sub(g.p_phase, w.p_phase))
    return g


def rotate_quadrant(re, im, r):
    """Multiply symbols by e^{-j*r*pi/2} — exact sign/swap ops, no
    rounding. r = cumulative gauge K[c] (any sign)."""
    r = int(r) % 4
    if r == 0:
        return re, im
    if r == 1:
        return im, -re
    if r == 2:
        return -re, -im
    return -im, re


# Gauge-0 value of a lane's emitted components, by K % 4 (rows) — the sign
# pattern of m = m0 * e^{j K pi/2} evaluated at the component's half-symbol
# instant: column 0 multiplies sym_re (the lane's stored I half), column 1
# multiplies sym_im (the lane's Q half). For even K the lane's labels match
# gauge 0 and this is plain rotation by K*pi/2 restricted to the stored
# components; for odd K the lane's "I" sits on a gauge-0 Q instant and vice
# versa, so the signed values land on the SHIFTED grid and must be re-paired
# (_assemble_oqpsk_gauge).
_OQ_SIGNS = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)


def _assemble_oqpsk_gauge(sym_re, sym_im, valid, lonce, K, exit_slot,
                          exit_inphase, exit_lonce, tail_syms):
    """Gauge-mode OQPSK assembly: global half-symbol re-pairing.

    OQPSK's gauge group couples the Costas quadrant with the I/Q labeling
    of the shared half-symbol fire grid (see _gauge_measure): a lane with
    odd cumulative gauge K[c] calls gauge-0 Q instants "I" and vice versa,
    so rotating its output into chunk 0's gauge does not map symbol ->
    symbol. Instead each emitted pair is split into its two half-symbol
    VALUES, the values are rotated into gauge 0 (the _OQ_SIGNS flips), and
    the global half-value stream is re-paired on chunk 0's grid.

    At each odd-parity boundary exactly one of two stitches applies,
    decided by the predecessor's exit slot:
      - slot==2 (a stored I half pending): that half-value was never
        emitted — lane c-1 holds it unemitted in its carry, and lane c's
        opposite labeling treats the instant as an already-completed Q.
        Insert it from the exit carry's `inphase` (exact), rotated by
        K[c-1].
      - slot==1: the predecessor's final Q instant is ALSO covered by lane
        c's completion pre-fire (whose sym_re came from the lane's warmup
        state). Drop lane c's duplicate first half-value and keep the
        predecessor's in-chunk exact one.
    Even-parity boundaries continue seamlessly through the shifted carry
    (slot/inphase hand-off), exactly like the sequential demodulator.

    The sub-multiple tail (tail_syms, may be None) was demodulated in the
    LAST lane's gauge with its carry untouched; its symbols join the
    half-value stream before pairing. A trailing unpaired half-value is
    dropped — the sequential demodulator likewise never emits a pending I.

    locked_once per re-paired symbol is taken at the Q half (the update
    instant, matching scan.py's do_update semantics)."""
    chunks = sym_re.shape[1]
    vals, los = [], []
    for c in range(chunks):
        m = valid[:, c, :].reshape(-1).astype(bool)
        re = sym_re[:, c, :].reshape(-1)[m]
        im = sym_im[:, c, :].reshape(-1)[m]
        lo = lonce[:, c, :].reshape(-1)[m]
        sr, si = _OQ_SIGNS[int(K[c]) % 4]
        v = np.empty(2 * len(re), np.float32)
        v[0::2] = sr * re
        v[1::2] = si * im
        l2 = np.repeat(lo, 2)
        if c > 0 and (int(K[c]) - int(K[c - 1])) % 2:
            if int(exit_slot[c - 1]) == 2:
                sp = _OQ_SIGNS[int(K[c - 1]) % 4][0]
                v = np.concatenate(
                    [[sp * np.float32(exit_inphase[c - 1])], v])
                l2 = np.concatenate(
                    [[np.int32(exit_lonce[c - 1])], l2])
            elif len(v):
                v = v[1:]
                l2 = l2[1:]
        vals.append(v)
        los.append(l2)
    if tail_syms is not None and len(tail_syms):
        sr, si = _OQ_SIGNS[int(K[-1]) % 4]
        v = np.empty(2 * len(tail_syms), np.float32)
        v[0::2] = sr * tail_syms["re"]
        v[1::2] = si * tail_syms["im"]
        vals.append(v)
        los.append(np.repeat(tail_syms["locked_once"], 2))
    F = np.concatenate(vals) if vals else np.zeros(0, np.float32)
    L2 = np.concatenate(los) if los else np.zeros(0, np.int64)
    n = len(F) // 2
    s = np.zeros(n, dtype=_SYM_DTYPE)
    s["re"] = F[0:2 * n:2]
    s["im"] = F[1:2 * n:2]
    s["locked_once"] = L2[1:2 * n:2]
    return s


def build_warmup(xf, chunks, chunk_len, kb_w, L, taps):
    """Warmup inputs: lane c demodulates the kb_w blocks of REAL data
    preceding its chunk (the tail of chunk c-1), with the data-exact FIR
    tail before that. Lane 0 re-demodulates its own prefix — its warmup
    result is discarded (the exact initial state is used instead).

    Returns (wblocks (kb_w, C, L, 2), wtails (C, taps-1, 2)) numpy."""
    V = kb_w * L
    wseg = np.zeros((chunks, V, 2), np.float32)
    wtails = np.zeros((chunks, taps - 1, 2), np.float32)
    for c in range(chunks):
        s0 = c * chunk_len - V if c else 0
        wseg[c] = xf[s0:s0 + V]
        if s0 >= taps - 1:
            wtails[c] = xf[s0 - (taps - 1):s0]
    return wseg.reshape(chunks, kb_w, L, 2).transpose(1, 0, 2, 3), wtails


def default_warmup_blocks(L, kb):
    """Warmup length: enough for a cold lane to lock AND for the slow freq
    integrator to mature. Lock alone needs ~2500-3500 fires (p_err EMA from
    its 1000 init to the 85 threshold at pole 1e-3, pll.c:7,36,117) —
    ~11k samples at the 230.4k/72k default — but a young integrator leaves
    a systematic phase lag vs the full-chunk exits, costing one extra
    verification pass at larger carrier offsets; 65536 samples (~20k
    fires) measured 2-pass convergence at a 400 Hz offset. Capped at half
    the chunk so warmup never dominates a pass."""
    return max(1, min(max(kb // 2, 1), -(-65536 // L)))


def _decisions_settled(g_new, g_prev):
    """Can re-running from g_new change any future DECISION vs g_prev?

    Value-level drift (phases, freq integrator, AGC) is guarded by the sign
    fingerprint itself — if it flipped a symbol, the fingerprint would
    differ. What the fingerprint cannot see is a PENDING transition: a lock
    state still propagating down the chunk chain. So the gate is (a) the
    integer lock/slot leaves are identical between consecutive entries, and
    (b) every lane's entry p_err is either safely below the lock threshold
    (no future flip possible) or settled to relative tolerance.

    Returns (settled, resid) with resid the worst p_err relative change
    among unsafe lanes (diagnostic)."""
    for name in ("locked", "locked_once", "slot", "flags"):
        if not np.array_equal(np.asarray(getattr(g_new, name)),
                              np.asarray(getattr(g_prev, name))):
            return False, 1.0
    a = np.asarray(g_new.p_err, np.float64)
    b = np.asarray(g_prev.p_err, np.float64)
    safe = np.logical_and(a < GAUGE_PERR_SAFE, b < GAUGE_PERR_SAFE)
    rel = np.abs(a - b) / np.maximum(1.0, a + b)
    unsafe_rel = rel[~safe]
    resid = float(np.max(unsafe_rel)) if len(unsafe_rel) else 0.0
    return resid < GAUGE_ENTRY_TOL, resid


def _lane_ok_np(fp, prev_fp, k, k_prev, delta, g_new, g_prev):
    """Per-lane convergence diagnostics for the bounded strict fallback.

    lane_ok[c] is True when every criterion the GLOBAL convergence test
    applies holds restricted to lane c: its decision fingerprint matched
    the previous pass, its entry is settled (_decisions_settled per lane),
    and its entry boundary's gauge measurement is stable and far from the
    pi/4 decision boundary. all(lane_ok) together with k-stability over
    every boundary is exactly the global test, so a converged run has
    lane_ok all-True; on a non-converged run the longest all-True PREFIX
    is decision-final by the same induction that justifies accepting a
    fully converged run (lane 0's entry is exact; each verified boundary
    hands a verified entry to the next lane)."""
    C = len(g_new.p_err)
    if prev_fp is None:
        return np.zeros(C, bool)
    fp_eq = np.array([a == b for a, b in zip(fp, prev_fp)], dtype=bool)
    ieq = np.ones(C, bool)
    for name in ("locked", "locked_once", "slot", "flags"):
        ieq &= np.asarray(getattr(g_new, name)) == np.asarray(
            getattr(g_prev, name))
    a = np.asarray(g_new.p_err, np.float64)
    b = np.asarray(g_prev.p_err, np.float64)
    safe = np.logical_and(a < GAUGE_PERR_SAFE, b < GAUGE_PERR_SAFE)
    rel = np.abs(a - b) / np.maximum(1.0, a + b)
    settled = ieq & (safe | (rel < GAUGE_ENTRY_TOL))
    bnd = np.ones(C, bool)
    if C > 1:
        stable = np.abs(delta) < GAUGE_DELTA_TOL
        if k_prev is not None:
            stable &= (k - k_prev) % 4 == 0
        else:
            stable[:] = False
        bnd[1:] = stable
    return fp_eq & settled & bnd


def verified_prefix(lane_ok) -> int:
    """Length of the leading all-True run of lane_ok (0 if none)."""
    if lane_ok is None or not len(lane_ok):
        return 0
    false_at = np.nonzero(~np.asarray(lane_ok, bool))[0]
    return int(false_at[0]) if len(false_at) else len(lane_ok)


def finish_warmup_carry(cfg, wf: DemodCarry, tails_np,
                        init_np: DemodCarry | None = None) -> DemodCarry:
    """Warmup exit carry -> gauge anchor w (numpy): lane 0 is replaced by
    the exact initial state (lane 0 IS the sequential start; its warmup on
    its own prefix is discarded), fir_tail becomes the data-exact main
    tails, tick and flags reset. Shared by demod_array_turbo and
    bench.py's device-resident variant so the warmup contract lives in one
    place. init_np: the exact lane-0 entry with (1,) leaves — cold start
    by default; a mid-stream carry for the span-turbo path
    (demod_span_turbo)."""
    if init_np is None:
        init_np = batch_carry_np(cfg, 1)
    w = jax.tree_util.tree_map(
        lambda a, a0: np.concatenate([np.asarray(a0), np.asarray(a)[1:]],
                                     axis=0),
        wf, init_np)
    return w._replace(fir_tail=tails_np,
                      tick=np.zeros_like(w.tick),
                      flags=np.zeros_like(w.flags))


def gauge_fixpoint(cfg, run, put_packed, blocks, w_np, tails_np, max_passes,
                   resume=None, init_np=None):
    """Shared gauge-mode fixpoint driver (demod_array_turbo and bench.py).

    run: a _chunk_fn_packed runner — jitted (packed_carry, blocks) ->
    (packed_carry', outs, lane_fp) over all chunk lanes.
    put_packed: places a (fl, il, tail) packed carry on device (sharded for
    the mesh case).
    w_np: numpy warmup carry (lane 0 already replaced by the exact initial
    state, fir_tail/tick/flags already reset) — the per-lane gauge anchor.
    blocks stays wherever the caller put it (device-resident is fine); per
    pass the host link carries one dispatch and one six-array egress (the
    packed carry + the three fingerprint vectors).

    Convergence (all of, see the tolerance constants above): decision
    fingerprints identical to the previous pass, quadrant assignment stable
    mod 4, every gauge residual far from the pi/4 boundary, and no pending
    lock transition that could flip future decisions (_decisions_settled).

    resume: optional (g_np, prev_fp, k_prev, passes_done) continuing a
    fixpoint whose first passes ran elsewhere (the fused 2-pass program,
    _fused_gauge_fn); the loop then starts at pass passes_done+1 with the
    given entries and measures gauges against them, exactly as if the
    earlier passes had run here.

    Returns (f_np, outs, K, passes, converged, max_resid, lane_ok): outs
    is the LAST pass's device-side BlockOutput, K the cumulative per-lane
    quadrants rotating it into chunk 0's gauge, max_resid the larger of
    the gauge and settling residuals, lane_ok the per-lane convergence
    diagnostics of the last pass (_lane_ok_np — all-True iff converged;
    its leading all-True prefix backs the bounded strict fallback).

    init_np: exact lane-0 entry with (1,) leaves (default cold start; a
    mid-stream carry for demod_span_turbo)."""
    if init_np is None:
        init_np = batch_carry_np(cfg, 1)
    g_np = w_np
    prev_fp = None
    converged = False
    passes = 0
    max_resid = float("inf")
    f_np = outs = None
    k = np.zeros(0, np.int64)
    k_prev = None
    lane_ok = None
    # Provably-exact entry lanes (see _fused_gauge_fn's lock-transition
    # note): lane 0's entry is exact by construction; exactness propagates
    # one lane per pass through IDENTITY gauge boundaries only (k%4==0 —
    # any real rotation perturbs float32 state at ulp level). A lane
    # containing a lock transition is accepted only when its entry was
    # provably exact, because the in-chunk lock-edge instant is sensitive
    # to ulp-level entry drift that the decision fingerprint is stable
    # under.
    C_l = len(np.asarray(w_np.p_err))
    exact_used = np.zeros(C_l, bool)
    exact_used[0] = True
    if resume is not None:
        g_np, prev_fp, k_prev, passes = resume
        k = k_prev
        # Resume comes from the fused 2-pass program: its pass-3 entries
        # g_np were built from f2 exits, so lane 1 is exact iff its gauge
        # boundary is even (f2[0] ran from the exact lane-0 entry).
        if C_l > 1 and len(k_prev):
            exact_used[1] = int(k_prev[0]) % 4 == 0
    for p in range(passes, max_passes):
        pf, outs, fpv = run(put_packed(pack_carry_np(g_np)), blocks)
        (fl, il, tail), fp_vecs = egress((pf, fpv))
        f_np = unpack_carry_np(fl, il, tail)
        passes += 1
        # Gauge anchor: pass 1 measures against the warmup states (their
        # phase can lag systematically — the warmup's freq integrator is
        # younger than the full-chunk exit's — so that measurement is only
        # a best-effort initializer). Later passes measure against the
        # entries actually used: entry[c] carries the applied rotation, so
        # the diff still yields the FULL per-boundary quadrant, but now
        # between same-maturity states — delta collapses to pass-to-pass
        # drift, and a pass-1 quadrant mistake shows up as k changing.
        k, delta, _ = _gauge_measure(f_np, w_np if p == 0 else g_np, cfg)
        # Boundaries handing over an UNLOCKED exit are forced to the
        # identity gauge (pre-lock lanes have no pinned gauge; the raw
        # predecessor exit is the true trajectory — see _fused_gauge_fn),
        # and lanes containing a lock transition this pass demand a
        # provably-exact entry (exact_used above).
        trans = np.logical_or(
            np.asarray(g_np.locked) != np.asarray(f_np.locked),
            np.asarray(g_np.locked_once) != np.asarray(f_np.locked_once))
        if C_l > 1:
            k = np.where(np.asarray(f_np.locked)[:-1] == 0, 0, k)
        ok_trans = np.logical_or(~trans, exact_used)
        max_delta = float(np.max(np.abs(delta))) if len(delta) else 0.0
        fp = tuple(tuple(int(x) for x in t) for t in zip(*fp_vecs))
        g_new = _gauge_shift_np(init_np, f_np, w_np, k, tails_np, cfg)
        settled, resid = _decisions_settled(g_new, g_np)
        lane_ok = np.logical_and(
            _lane_ok_np(fp, prev_fp, k, k_prev, delta, g_new, g_np),
            ok_trans)
        max_resid = max(max_delta, resid)
        k_stable = k_prev is not None and not np.any((k - k_prev) % 4)
        if prev_fp is not None and fp == prev_fp and k_stable \
                and max_delta < GAUGE_DELTA_TOL and settled \
                and bool(np.all(ok_trans)):
            converged = True
            break
        prev_fp = fp
        k_prev = k
        g_np = g_new
        # Propagate entry exactness into the entries just built for the
        # next pass: lane c's new entry is exact iff its predecessor's
        # entry was exact this pass AND the rotation into lane c's gauge
        # is even (exact).
        nxt = np.zeros_like(exact_used)
        nxt[0] = True
        if C_l > 1:
            nxt[1:] = exact_used[:-1] & (np.asarray(k) % 4 == 0)
        exact_used = nxt
    K = np.concatenate([[0], np.cumsum(k)])
    if lane_ok is None:
        lane_ok = np.zeros(len(np.asarray(f_np.p_err)), bool)
    if converged:
        lane_ok = np.ones_like(lane_ok)
    return f_np, outs, K, passes, converged, max_resid, lane_ok


# ---------------------------------------------------------------------------
# Fused gauge turbo: warmup + pass 1 + gauge shift + pass 2 + convergence
# detection in ONE jitted program. The per-pass host round-trips of the
# loop above (dispatch latency + one egress per pass on the tunneled
# backend) cost ~3x the device compute at the default geometry; here the
# whole O(1)-pass fixpoint runs device-side and a single flattened egress
# returns the exit carry, quadrants, fingerprints and convergence stats.
# The math mirrors gauge_fixpoint step for step (float32 on device instead
# of the host's float64 gauge bookkeeping — the entries it perturbs are
# estimates, and the decision fingerprint criterion is unchanged).
# ---------------------------------------------------------------------------

def _lane_fp_block(outs, kblk):
    """One block's contribution to the per-lane decision fingerprint.

    Identical math to _lane_fp_body evaluated incrementally: weights for
    block k are ((k*S + s) % modulus) + 1, and int32 wrapping addition is
    associative/commutative, so summing per-block contributions equals the
    stacked-outs checksums bit for bit. S is taken from the output itself:
    OQPSK blocks emit steps_per_block + 1 rows (the completion pre-fire is
    prepended, scan.py demod_block)."""
    v = outs.valid.astype(jnp.int32)               # (C, S)
    S = v.shape[1]
    sr = jnp.where(outs.sym_re >= 0, 1, -1) * v
    si = jnp.where(outs.sym_im >= 0, 1, -1) * v
    lo = outs.locked_once.astype(jnp.int32)
    idx = jnp.arange(S, dtype=jnp.int32)[None, :] + kblk * S
    w = idx % 8191 + 1
    cs = jnp.sum(w * (7 * v + 3 * sr + 5 * si + 11 * lo), axis=1)
    w2 = idx % 8087 + 1
    cs2 = jnp.sum(w2 * (13 * v + 17 * sr + 19 * si + 23 * lo), axis=1)
    return jnp.sum(v, axis=1), cs, cs2


def _gauge_measure_j(f, w, cfg=None):
    """Traced _gauge_measure (without the cumulative K). Device float32
    instead of the host's float64 bookkeeping; OQPSK parity cross-check
    as in _gauge_measure."""
    diff = f.p_phase[:-1] - w.p_phase[1:]
    k = jnp.round(diff / _HALF_PI).astype(jnp.int32)
    delta = diff - k.astype(jnp.float32) * _HALF_PI
    if cfg is not None and cfg.oqpsk:
        nq = lambda c: (_TWO_PI - c.t_phase) / c.t_freq
        h2 = np.float32(np.pi / float(cfg.timing_freq))
        m = jnp.round((nq(f)[:-1] - nq(w)[1:]) / h2).astype(jnp.int32)
        delta = jnp.where((k - m) % 2 == 0, delta, np.float32(np.pi))
    return k, delta


def _gauge_shift_j(init, f, w, k, tails, cfg=None):
    """Traced _gauge_shift_np: next-pass entries in each lane's own gauge."""
    g = jax.tree_util.tree_map(
        lambda a0, a: jnp.concatenate([a0, a[:-1]], axis=0), init, f)
    rot = jnp.mod(g.p_phase[1:] - k.astype(jnp.float32) * _HALF_PI, _TWO_PI)
    pp = jnp.concatenate([g.p_phase[:1], rot])
    km = k % 4
    flip = km == 2
    odd = km % 2 == 1
    tp_rest = jnp.where(flip, -g.t_prev[1:], g.t_prev[1:])
    tp_rest = jnp.where(odd, w.t_prev[1:], tp_rest)
    tp = jnp.concatenate([g.t_prev[:1], tp_rest])
    g = g._replace(p_phase=pp, t_prev=tp, fir_tail=tails,
                   tick=jnp.zeros_like(g.tick),
                   flags=jnp.zeros_like(g.flags))
    if cfg is not None and cfg.oqpsk:
        # Odd quadrants shift the lane's I/Q labeling: every grid-dependent
        # leaf comes from the lane's own warmup estimate (see
        # _gauge_shift_np's docstring for the full argument).
        ip_rest = jnp.where(flip, -g.inphase[1:], g.inphase[1:])
        ip = jnp.concatenate([g.inphase[:1], ip_rest])
        sub = lambda a, b: jnp.concatenate(
            [a[:1], jnp.where(odd, b[1:], a[1:])], axis=0)
        g = g._replace(
            inphase=sub(ip, w.inphase),
            slot=sub(g.slot, w.slot),
            t_phase=sub(g.t_phase, w.t_phase),
            p_phase=sub(g.p_phase, w.p_phase))
    return g


def _settled_lanes_j(g_new, g_prev):
    """Traced per-lane _decisions_settled pieces. Returns (settled_l (C,)
    bool, ieq aggregate bool, resid f32 aggregate)."""
    ieq_l = jnp.ones_like(g_new.locked, jnp.bool_)
    for name in ("locked", "locked_once", "slot", "flags"):
        ieq_l = jnp.logical_and(
            ieq_l, getattr(g_new, name) == getattr(g_prev, name))
    a, b = g_new.p_err, g_prev.p_err
    safe = jnp.logical_and(a < np.float32(GAUGE_PERR_SAFE),
                           b < np.float32(GAUGE_PERR_SAFE))
    rel = jnp.abs(a - b) / jnp.maximum(np.float32(1.0), a + b)
    settled_l = jnp.logical_and(
        ieq_l, jnp.logical_or(safe, rel < np.float32(GAUGE_ENTRY_TOL)))
    ieq = jnp.all(ieq_l)
    resid = jnp.max(jnp.where(safe, np.float32(0.0), rel))
    resid = jnp.where(ieq, resid, np.float32(1.0))
    return settled_l, ieq, resid


def _settled_j(g_new, g_prev):
    """Traced _decisions_settled. Returns (settled bool, resid f32)."""
    settled_l, ieq, resid = _settled_lanes_j(g_new, g_prev)
    return jnp.logical_and(ieq, resid < np.float32(GAUGE_ENTRY_TOL)), resid


def _bc_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _quantize_j(v):
    """Traced int8 soft-symbol quantization — EXACTLY the product's
    emission math (pipeline.quantize_symbols / main.c:305-306: clamp(v/2,
    +-127) truncated toward zero), so device-packed bytes are bit-identical
    to quantizing the float egress on the host."""
    return jnp.trunc(
        jnp.clip(v * np.float32(0.5), -127.0, 127.0)).astype(jnp.int8)


def _pack_outs_j(outs):
    """Traced BlockOutput (kb, C, S) -> ONE flat int8 payload.

    Layout: [qre | qim interleaved last-dim (kb*C*S*2 bytes)] ++
    [2-bit (valid | locked_once<<1) codes, 4 slots/byte, S padded to a
    multiple of 4]. A single buffer means a single device->host transfer
    — the relay link charges a fixed ~70 ms per transfer on top of its
    ~50 MB/s stream rate (docs/PERF.md), and the payload is ~1/6 the raw
    float egress. Decode: _unpack_outs_np."""
    qsym = jnp.stack([_quantize_j(outs.sym_re),
                      _quantize_j(outs.sym_im)], axis=-1)
    code = (outs.valid + 2 * outs.locked_once).astype(jnp.int32)
    kb, C, S = code.shape
    S4 = -(-S // 4) * 4
    code = jnp.pad(code, ((0, 0), (0, 0), (0, S4 - S)))
    w = np.array([1, 4, 16, 64], np.int32)
    packed = jnp.sum(code.reshape(kb, C, S4 // 4, 4) * w, axis=-1)
    return jnp.concatenate([qsym.reshape(-1),
                            packed.astype(jnp.int8).reshape(-1)])


def _unpack_outs_np(buf, kb, C, S):
    """Host decode of _pack_outs_j: (sym_re i8, sym_im i8, valid bool,
    lonce i32), each (kb, C, S)."""
    buf = np.asarray(buf)
    n2 = kb * C * S * 2
    qsym = buf[:n2].reshape(kb, C, S, 2)
    S4 = -(-S // 4) * 4
    codes = buf[n2:].view(np.uint8).reshape(kb, C, S4 // 4)
    code = ((codes[..., None] >> np.array([0, 2, 4, 6], np.uint8)) & 3)
    code = code.reshape(kb, C, S4)[:, :, :S]
    return (qsym[..., 0], qsym[..., 1],
            (code & 1).astype(bool), (code >> 1).astype(np.int32))


@functools.lru_cache(maxsize=8)
def _fused_gauge_fn(cfg: DemodConfig, chunks: int, kb: int, kb_w: int,
                    backend: str, mesh=None, axis_name: str = "chunks",
                    ext_init: bool = False, pack_outs: bool = False,
                    locked_passes: bool = False):
    """Jitted fused gauge turbo (see the section comment above).

    (pw0, wblocks, blocks, tails) -> (small_vec, g3_pc, w_pc, outs2)
    where small_vec is ONE flat f32 vector carrying the pass-2 exit carry,
    per-boundary quadrants k2, fingerprints, convergence stats (int
    payloads bitcast, not value-cast — see _unpack_small) and each lane's
    last emitted symbol value, so the happy path costs a single host
    round-trip; g3_pc / w_pc (next-pass entries and the gauge anchor)
    serve the rare not-converged continuation and the device-resident
    outs2 the final assembly. The exact initial state for lane 0 is baked
    in as a trace-time constant — unless ext_init, which prepends a packed
    (1,)-leaf exact entry to the signature ((pinit, pw0, ...)) so the SAME
    compiled program serves every mid-stream span (demod_span_turbo)
    without a retrace per carry.

    pack_outs=True replaces the raw float32/int32 outs2 with its
    device-quantized form (qsym (kb, C, S, 2) int8 carrying the EXACT
    int8 soft bytes the product emits — pipeline.quantize_symbols
    semantics — and qflags (kb, C, S) int8 = valid | locked_once << 1).
    Quantization commutes bit-for-bit with the host-side gauge rotation
    (sign flips/swaps of trunc-toward-zero values), so the emitted byte
    stream is identical to quantizing the float egress on the host, at
    ~1/5 the device->host transfer volume (the span path's dominant cost
    on a slow link)."""
    n_dev = 1 if mesh is None else mesh.devices.size
    demod = make_batch_demod(cfg, chunks // n_dev, backend)
    # locked_passes: the fixpoint passes run the LOCKED kernel geometry
    # (narrow window + offset gate + all-fire spec arms) — pass entries
    # are warmed/gauge-shifted carries, locked in steady state, and the
    # clean cold-start acquisition of lane 0 stays inside the locked
    # envelope (measured flag-free on chip). Decisions are bit-identical
    # to the wide program whenever no lane flags; a flagged lane kills
    # lane_ok/convergence and fused_gauge_run reruns the wide variant —
    # never wrong output, one wasted dispatch on adversarial input. The
    # WARMUP runs the same locked geometry: its entries are cold by
    # construction, but a clean cold-start acquisition stays inside the
    # locked envelope (measured flag-free on chip — docs/PERF.md), and a
    # warmup flag on a used lane (1..) folds into `flagged` below so an
    # envelope violation still forces the wide rerun. Correctness never
    # depends on warmup exactness (it only seeds the fixpoint; the
    # fp1 == fp2 convergence test guards the output), so the fold is
    # purely to keep the locked-run invariant uniform.
    # Envelope tiers (config.serving): the PASSES run the serving-tier
    # locked geometry — their entries are warmed/gauge-shifted carries in
    # locked steady state, exactly the regime the tight envelope is sized
    # for (+10% OQPSK / +3% QPSK measured, docs/PERF.md r4) — while the
    # WARMUP keeps the roomy default envelope: its entries are cold by
    # construction and the acquisition transient's timing excursions
    # exceed the serving budget (the r3 flag-free-warmup measurement was
    # made at the 1.0 rad envelope).
    demod_p = (make_batch_demod(cfg.serving(), chunks // n_dev, backend,
                                locked=True)
               if locked_passes else demod)
    demod_w = (make_batch_demod(cfg, chunks // n_dev, backend, locked=True)
               if locked_passes else demod)

    def warm_phase(c, blocks):
        c2, _ = jax.lax.scan(lambda cc, x: (demod_w(cc, x)[0], None),
                             c, blocks)
        return c2

    def _pass_body(cc, x):
        c, kblk, fn, fcs, fcs2 = cc
        c2, outs = demod_p(c, x)
        n, cs, cs2 = _lane_fp_block(outs, kblk)
        return (c2, kblk + 1, fn + n, fcs + cs, fcs2 + cs2), outs

    def pass_fp(c, blocks):
        z = jnp.zeros(c.p_phase.shape[0], jnp.int32)
        (c2, _, fn, fcs, fcs2), _ = jax.lax.scan(
            lambda cc, x: (_pass_body(cc, x)[0], None),
            (c, jnp.int32(0), z, z, z), blocks)
        return c2, (fn, fcs, fcs2)

    def _last_valid_block(outs, lre, lim):
        """Fold one block's last VALID (sym_re, sym_im) per lane into the
        running (lre, lim) — gives each lane's final emitted symbol value
        without touching the bulk outs egress (the QPSK span exit carry
        needs the last emitted Q, demod_span_turbo)."""
        v = outs.valid.astype(jnp.bool_)                     # (C, S)
        has = jnp.any(v, axis=1)
        idx = v.shape[1] - 1 - jnp.argmax(v[:, ::-1], axis=1)
        r = jnp.take_along_axis(outs.sym_re, idx[:, None], axis=1)[:, 0]
        i = jnp.take_along_axis(outs.sym_im, idx[:, None], axis=1)[:, 0]
        return jnp.where(has, r, lre), jnp.where(has, i, lim)

    def pass_fp_outs(c, blocks):
        z = jnp.zeros(c.p_phase.shape[0], jnp.int32)
        zf = jnp.zeros(c.p_phase.shape[0], jnp.float32)

        def body(cc, x):
            (st, outs) = _pass_body(cc[:5], x)
            lre, lim = _last_valid_block(outs, cc[5], cc[6])
            return st + (lre, lim), outs

        (c2, _, fn, fcs, fcs2, lre, lim), outs = jax.lax.scan(
            body, (c, jnp.int32(0), z, z, z, zf, zf), blocks)
        return c2, outs, (fn, fcs, fcs2), (lre, lim)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        lane = P(axis_name)
        blk = P(None, axis_name)
        warm_phase = shard_map(warm_phase, mesh=mesh, in_specs=(lane, blk),
                               out_specs=lane, check_vma=False)
        pass_fp = shard_map(pass_fp, mesh=mesh, in_specs=(lane, blk),
                            out_specs=(lane, (lane,) * 3), check_vma=False)
        pass_fp_outs = shard_map(
            pass_fp_outs, mesh=mesh, in_specs=(lane, blk),
            out_specs=(lane, blk, (lane,) * 3, (lane,) * 2),
            check_vma=False)

    def fused(pw0, wblocks, blocks, tails, pinit=None):
        init = (batch_carry(cfg, 1) if pinit is None
                else _unpack_j(pinit))                 # leaves (1, ...)
        w_raw = warm_phase(_unpack_j(pw0), wblocks)
        # Warmup safety flags on USED lanes (lane 0's warmup output is
        # discarded — replaced by the exact initial state below). Sticky
        # bitmask, cleared before the passes, so capture it here. Only the
        # LOCKED warmup folds its flags into `flagged` (a locked-envelope
        # violation must force the wide rerun); the wide warmup keeps the
        # original discard semantics — its output is an estimate, and the
        # wide program is already the tolerance tier of last resort.
        wflag = (jnp.concatenate([jnp.zeros(1, jnp.bool_),
                                  w_raw.flags[1:] != 0])
                 if locked_passes else jnp.zeros(chunks, jnp.bool_))
        # finish_warmup_carry, traced: lane 0 <- exact initial state.
        w = jax.tree_util.tree_map(
            lambda a0, a: jnp.concatenate([a0, a[1:]], axis=0), init, w_raw)
        w = w._replace(fir_tail=tails, tick=jnp.zeros_like(w.tick),
                       flags=jnp.zeros_like(w.flags))

        f1, fp1 = pass_fp(w, blocks)
        k1, _ = _gauge_measure_j(f1, w, cfg)
        # Boundaries handing over an UNLOCKED exit are forced to the
        # IDENTITY gauge (k := 0): a pre-lock lane has no pinned gauge (the
        # quadrant only becomes meaningful once the PLL locks), and the
        # raw predecessor exit IS the true trajectory. This extends the
        # exactness chain (see the ok_trans note below) through the whole
        # acquisition region one lane per pass, so the lane containing the
        # lock edge eventually runs from a provably-exact entry and its
        # in-chunk lock-edge instant is the sequential one — any nonzero
        # rotation perturbs float32 state at ulp level, which is enough to
        # move a lock edge by a couple of fires. Mid-stream locked spans
        # have no unlocked exits and are unaffected; acquisition spans pay
        # one extra pass per pre-lock lane.
        if chunks > 1:
            k1 = jnp.where(f1.locked[:-1] == 0, 0, k1)
        g2 = _gauge_shift_j(init, f1, w, k1, tails, cfg)

        f2, outs2, fp2, (lre, lim) = pass_fp_outs(g2, blocks)
        k2, delta2 = _gauge_measure_j(f2, g2, cfg)
        if chunks > 1:
            k2 = jnp.where(f2.locked[:-1] == 0, 0, k2)
        trans = jnp.logical_or(g2.locked != f2.locked,
                               g2.locked_once != f2.locked_once)
        g3 = _gauge_shift_j(init, f2, w, k2, tails, cfg)

        settled_l, ieq, resid = _settled_lanes_j(g3, g2)
        settled = jnp.logical_and(ieq, resid < np.float32(GAUGE_ENTRY_TOL))
        fp_eq_l = functools.reduce(
            jnp.logical_and, [a == b for a, b in zip(fp1, fp2)])
        fp_eq = jnp.all(fp_eq_l)
        k_st = jnp.all((k2 - k1) % 4 == 0)
        maxd = jnp.max(jnp.abs(delta2)) if chunks > 1 else jnp.float32(0.0)
        # Safety flags (FLAG_WINDOW_MISS / FLAG_UNCONSUMED) in the warmup
        # or EITHER pass invalidate the lane: a flagged lane's values are
        # outside the kernel's exactness envelope, and a deterministic
        # flag repeats across passes so the fingerprint alone cannot see
        # it.
        flagged = functools.reduce(jnp.logical_or, [
            wflag, f1.flags != 0, f2.flags != 0])
        # A lane whose chunk contains a LOCK TRANSITION (locked /
        # locked_once changed between its entry and its exit) is only
        # decision-final if its entry is provably the TRUE sequential
        # carry: the in-chunk lock-threshold crossing instant shifts by a
        # few fires under ulp-level entry perturbation (the p_err EMA
        # crosses 85 a step early/late), which decision fingerprints are
        # stable under but the emitted locked_once telemetry is not.
        # Exactness propagates from lane 0 (its entry IS exact) through
        # IDENTITY gauge boundaries only (k % 4 == 0): odd quadrants
        # substitute the warmup's t_prev (the unstored I component — a
        # permanent approximation), and k%4==2 rotates p_phase by pi /
        # flips t_prev, whose float32 rounding perturbs the within-lane
        # trajectory at ulp level — enough to move a lock edge. After
        # pass 2, provably-exact entries are lane 0 and
        # lane 1-iff-k1[0]%4==0; transitions anywhere else reject the
        # lane (bounded strict fallback covers the lock region
        # sequentially — acquisition happens once per stream, so this
        # costs at most one partial span).
        if chunks > 1:
            entry_exact = jnp.concatenate([
                jnp.ones(1, jnp.bool_),
                jnp.logical_and(k1 % 4 == 0,
                                jnp.arange(chunks - 1) == 0)])
        else:
            entry_exact = jnp.ones(1, jnp.bool_)
        ok_trans = jnp.logical_or(jnp.logical_not(trans), entry_exact)
        conv = functools.reduce(jnp.logical_and, [
            fp_eq, k_st, maxd < np.float32(GAUGE_DELTA_TOL), settled,
            jnp.logical_not(jnp.any(flagged)), jnp.all(ok_trans)])
        sti = jnp.stack([conv, settled, fp_eq, k_st]).astype(jnp.int32)
        # Per-lane diagnostics for the bounded strict fallback (the traced
        # mirror of _lane_ok_np): lane c also needs its entry boundary's
        # gauge stable and clear of the pi/4 decision margin.
        bnd = jnp.logical_and(jnp.abs(delta2) < np.float32(GAUGE_DELTA_TOL),
                              (k2 - k1) % 4 == 0)
        lane_ok = functools.reduce(jnp.logical_and, [
            fp_eq_l, settled_l, jnp.logical_not(flagged), ok_trans,
            jnp.concatenate([jnp.ones(1, jnp.bool_), bnd])])
        lane_ok = jnp.where(conv, jnp.bool_(True), lane_ok)

        fl, il, tail = _pack_j(f2)
        small = jnp.concatenate([
            fl.reshape(-1), _bc_f32(il).reshape(-1), tail.reshape(-1),
            _bc_f32(k2), _bc_f32(fp2[0]), _bc_f32(fp2[1]), _bc_f32(fp2[2]),
            _bc_f32(lane_ok.astype(jnp.int32)),
            _bc_f32(flagged.astype(jnp.int32)),
            _bc_f32(sti), jnp.stack([maxd, resid]), lre, lim])
        if pack_outs:
            return small, _pack_j(g3), _pack_j(w), _pack_outs_j(outs2)
        return small, _pack_j(g3), _pack_j(w), outs2

    if ext_init:
        return jax.jit(lambda pinit, pw0, wblocks, blocks, tails: fused(
            pw0, wblocks, blocks, tails, pinit=pinit))
    return jax.jit(fused)


def _unpack_small(cfg, chunks, small):
    """Host decode of the fused program's flat f32 vector -> (f2 DemodCarry,
    k2, fp2 tuple, stats dict)."""
    C = chunks
    nf, ni, nt = len(_FLOAT_FIELDS), len(_INT_FIELDS), (cfg.taps - 1) * 2
    v = np.asarray(small, np.float32)
    o = 0
    fl = v[o:o + nf * C].reshape(nf, C); o += nf * C
    il = v[o:o + ni * C].view(np.int32).reshape(ni, C); o += ni * C
    tail = v[o:o + C * nt].reshape(C, cfg.taps - 1, 2); o += C * nt
    k2 = v[o:o + C - 1].view(np.int32).astype(np.int64); o += C - 1
    fp_n = v[o:o + C].view(np.int32); o += C
    fp_cs = v[o:o + C].view(np.int32); o += C
    fp_cs2 = v[o:o + C].view(np.int32); o += C
    lane_ok = v[o:o + C].view(np.int32).astype(bool); o += C
    flagged = v[o:o + C].view(np.int32).astype(bool); o += C
    sti = v[o:o + 4].view(np.int32); o += 4
    maxd, resid = float(v[o]), float(v[o + 1]); o += 2
    last_re = v[o:o + C].copy(); o += C
    last_im = v[o:o + C].copy(); o += C
    f2 = unpack_carry_np(fl, il, tail)
    stats = dict(converged=bool(sti[0]), settled=bool(sti[1]),
                 fp_eq=bool(sti[2]), k_stable=bool(sti[3]),
                 max_delta=maxd, resid=resid, lane_ok=lane_ok,
                 flagged=flagged, flag_any=bool(flagged.any()),
                 n_valid=fp_n.copy(), last_re=last_re, last_im=last_im)
    return f2, k2, (fp_n, fp_cs, fp_cs2), stats


# Times a locked-pass fused run tripped a safety flag and was rerun wide
# (observability; exercised end-to-end by scripts/verify_turbo_fallback.py).
LOCKED_PASS_WIDE_RERUNS = 0


def fused_gauge_run(cfg, chunks, kb, kb_w, backend, mesh, put_packed,
                    w0_np, wblocks, blocks, tails_dev, tails_np,
                    max_passes, pw0_dev=None, init_np=None,
                    pack_outs=False):
    """Run the fused 2-pass gauge turbo; continue on the per-pass loop in
    the rare not-converged case (shared by demod_array_turbo and bench.py).

    w0_np: numpy warmup entry carry (warmup FIR tails installed); wblocks /
    blocks / tails_dev already placed on device (sharded under a mesh).
    pw0_dev: optionally the packed warmup carry already on device (skips
    the per-call pack+upload for callers that reuse it).
    init_np: exact lane-0 entry with (1,) leaves (cold start by default; a
    mid-stream carry for demod_span_turbo — passed as a runtime input so
    the compiled program is reused across spans).
    Returns the gauge_fixpoint contract (f_np, outs, K, passes, converged,
    max_resid, lane_ok) plus a trailing `stats` dict (None on the
    not-converged continuation) carrying per-lane n_valid and each lane's
    last emitted symbol value — enough for demod_span_turbo to finalize
    the exit carry WITHOUT touching the bulk outs egress. With
    pack_outs=True `outs` is the device-quantized (qsym, qflags) pair
    (see _fused_gauge_fn); the continuation path (rare) always returns
    the raw BlockOutput.

    On TPU the warmup and fixpoint passes run the LOCKED kernel geometry
    (locked_passes, ~1.4x the wide pass rate); if any lane trips a safety
    flag — outside the locked envelope, adversarial input — the whole
    fused program is rerun with wide warmup + passes (never wrong output,
    one wasted dispatch). METEOR_DEMOD_TURBO_LOCKED=0 disables."""
    locked_ok = (jax.default_backend() == "tpu"
                 and backend in ("auto", "pallas")
                 and os.environ.get("METEOR_DEMOD_TURBO_LOCKED") != "0")
    if pw0_dev is None:
        pw0_dev = put_packed(pack_carry_np(w0_np))
    pinit_dev = (tuple(map(jnp.asarray, pack_carry_np(init_np)))
                 if init_np is not None else None)
    for locked_passes in ([True, False] if locked_ok else [False]):
        fused = _fused_gauge_fn(cfg, chunks, kb, kb_w, backend, mesh,
                                ext_init=init_np is not None,
                                pack_outs=pack_outs,
                                locked_passes=locked_passes)
        if pinit_dev is not None:
            small, g3_pc, w_pc, outs2 = fused(pinit_dev, pw0_dev, wblocks,
                                              blocks, tails_dev)
        else:
            small, g3_pc, w_pc, outs2 = fused(pw0_dev, wblocks, blocks,
                                              tails_dev)
        f2, k2, fp2, stats = _unpack_small(cfg, chunks, egress(small))
        if not (locked_passes and stats["flag_any"]):
            break
        # Locked-envelope violation on some lane: rerun with wide passes
        # (observability counter — scripts/verify_turbo_fallback.py).
        global LOCKED_PASS_WIDE_RERUNS
        LOCKED_PASS_WIDE_RERUNS += 1
    max_resid = max(stats["max_delta"], stats["resid"])
    if stats["converged"] or max_passes <= 2:
        K = np.concatenate([[0], np.cumsum(k2)])
        return (f2, outs2, K, 2, stats["converged"], max_resid,
                stats["lane_ok"], stats)
    # Not converged with budget left: continue the per-pass loop from the
    # fused program's pass-3 entries and gauge anchor.
    run = _chunk_fn_packed(cfg, chunks, kb, backend, mesh)
    g3 = unpack_carry_np(*egress(g3_pc))
    w_np = unpack_carry_np(*egress(w_pc))
    prev_fp = tuple(tuple(int(x) for x in t) for t in zip(*fp2))
    return gauge_fixpoint(cfg, run, put_packed, blocks, w_np, tails_np,
                          max_passes, resume=(g3, prev_fp, k2, 2),
                          init_np=init_np) + (None,)


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
                      converge: str = "auto",
                      warmup_blocks: int | None = None,
                      strict: bool = False) -> TurboResult:
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
      converge: stopping criterion. "auto" picks "gauge".
        "gauge" (the default): warmup acquisition per lane, one-shot gauge
        resolution, then iterate until two consecutive passes emit the
        identical sign-level decision stream — O(1) passes independent of
        chunks (typically 2-3; see the module docstring). For OQPSK the
        gauge group couples the quadrant with the half-symbol I/Q
        labeling; assembly re-pairs the half-value stream globally
        (_assemble_oqpsk_gauge). Needs max_passes >= 2 to be able to
        report convergence.
        "bitwise": iterate until the boundary carries reach the exact
        fixpoint — result provably equals the sequential chaining of the
        same program, but exactness propagates only one chunk per pass, so
        worst case needs chunks+1 passes.
        "symbols": stop when two consecutive passes produce identical
        int8-quantized output (the product's actual emission); O(chunks)
        passes when lanes lock in different gauges. Needs max_passes >= 2.
      warmup_blocks: gauge-mode warmup length in blocks (default: enough
        samples for cold carrier lock, see default_warmup_blocks).
      strict: if True, a non-converged fixpoint falls back to the exact
        sequential demodulation instead of returning the best-effort
        assembly. The resulting contract: DECISION-exact when converged
        (the emitted sign-level decision stream equals the sequential
        path's; int8 soft values can differ by loop-noise LSBs), exact
        sequential otherwise — the closest chunk-parallel analogue of the
        reference's always-exact per-sample path
        (/root/reference/demod.c:23-48). The fallback is BOUNDED: it
        accepts the verified prefix of chunk lanes (every per-lane
        convergence criterion held — _lane_ok_np) and resumes the
        sequential path from that boundary's carry, so its cost is
        proportional to the divergent suffix (TurboResult.fallback_samples
        reports it); only a fully unverified run redoes the whole file.
        The CLI -T path sets this; library callers who prefer speed can
        inspect `converged` themselves.
    """
    cfg.validate()
    if converge == "auto":
        converge = "gauge"
    if converge not in ("bitwise", "symbols", "gauge"):
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
                           max_residual=0.0, fell_back=True,
                           fallback_samples=N)

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

    init_np = batch_carry_np(cfg, 1)
    K = None
    lane_ok = None

    if converge == "gauge":
        kb_w = min(warmup_blocks or default_warmup_blocks(L, kb), kb)
        wblocks_np, wtails = build_warmup(xt, chunks, chunk_len, kb_w, L,
                                          taps)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            lane_shard = NamedSharding(mesh, P(None, axis))
            put_packed = lambda pc: (jax.device_put(pc[0], lane_shard),
                                     jax.device_put(pc[1], lane_shard),
                                     jax.device_put(pc[2], c_shard))
            wblocks = jax.device_put(wblocks_np, b_shard)
            tails_dev = jax.device_put(tails, c_shard)
        else:
            put_packed = lambda pc: tuple(map(jnp.asarray, pc))
            wblocks = jnp.asarray(wblocks_np)
            tails_dev = jnp.asarray(tails)
        w0_np = jax.tree_util.tree_map(
            np.array, batch_carry_np(cfg, chunks)._replace(fir_tail=wtails))
        no_fused = os.environ.get("METEOR_DEMOD_NO_FUSED", "").lower() \
            not in ("", "0", "false", "no")
        if max_passes >= 2 and not no_fused:
            # Fused fast path: warmup + both passes + convergence detection
            # in one dispatch and one small egress (see _fused_gauge_fn).
            (f_np, outs, K, passes, converged, max_residual,
             lane_ok, _) = fused_gauge_run(
                cfg, chunks, kb, kb_w, backend, mesh, put_packed, w0_np,
                wblocks, blocks, tails_dev, tails, max_passes)
        else:
            run_w = _chunk_fn_packed(cfg, chunks, kb_w, backend, mesh)
            run_g = _chunk_fn_packed(cfg, chunks, kb, backend, mesh)
            wpf, _, _ = run_w(put_packed(pack_carry_np(w0_np)), wblocks)
            w_np = finish_warmup_carry(cfg, unpack_carry_np(*egress(wpf)),
                                       tails)
            (f_np, outs, K, passes, converged, max_residual,
             lane_ok) = gauge_fixpoint(
                cfg, run_g, put_packed, blocks, w_np, tails, max_passes)
    else:
        run = _chunk_fn(cfg, chunks, kb, backend, mesh)
        g_np = jax.tree_util.tree_map(
            np.array, batch_carry_np(cfg, chunks)._replace(fir_tail=tails))

        def shift_np(f: DemodCarry) -> DemodCarry:
            """g'[0] = exact initial, g'[i+1] = f[i]; tails stay
            data-exact. Pure host numpy: the per-pass convergence check
            already round-trips the (tiny) carry, so the neighbor hand-off
            costs nothing extra and needs no cross-device collective."""
            shifted = jax.tree_util.tree_map(
                lambda a0, a: np.concatenate([a0, a[:-1]], axis=0),
                init_np, f)
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
                converged = True      # bitwise fixpoint implies both modes
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

    # Strict contract: a non-converged fixpoint may carry decision-level
    # errors near chunk boundaries — but only from the FIRST unverified
    # lane onward. Accept the verified prefix (decision-final by the same
    # induction that justifies a converged run, see _lane_ok_np) and
    # resume the exact sequential path from its boundary carry, so the
    # fallback cost is proportional to the divergent suffix, not the
    # whole recording. P == 0 (or a non-gauge converge mode) degenerates
    # to the full sequential redo.
    P = chunks
    if strict and not converged:
        P = verified_prefix(lane_ok)
        if P == 0:
            return _sequential(tag_converged=False)
    fallback_n = N - P * chunk_len if strict and not converged else 0

    # Assemble symbols in stream order from the final pass; in gauge mode
    # rotate each lane's symbols into chunk 0's gauge (exact sign/swap).
    o = egress(outs)
    sym_re = np.asarray(o.sym_re)        # (kb, C, S)
    sym_im = np.asarray(o.sym_im)
    valid = np.asarray(o.valid).astype(bool)
    lonce = np.asarray(o.locked_once)
    tail_start = P * chunk_len           # == turbo_n when P == chunks

    if K is not None and cfg.oqpsk:
        # OQPSK gauge assembly: the sequential tail/suffix continues in
        # lane P-1's gauge (carry untouched — rotating an odd-gauge carry
        # would need grid-dependent surgery), then the whole half-value
        # stream is re-paired globally (see _assemble_oqpsk_gauge).
        tail_syms = None
        if tail_start < N:
            from .pipeline import StreamDemodulator
            tail_c = jax.tree_util.tree_map(
                lambda a: np.asarray(a[P - 1]), f_np)
            d = StreamDemodulator(cfg, backend=backend)
            d._carry = jax.tree_util.tree_map(jnp.asarray, tail_c)
            tail_syms = np.concatenate(
                [d.process(f32_to_iq(xf[tail_start:])), d.finish()])
        syms = _assemble_oqpsk_gauge(
            sym_re[:, :P], sym_im[:, :P], valid[:, :P], lonce[:, :P],
            K[:P], np.asarray(f_np.slot)[:P], np.asarray(f_np.inphase)[:P],
            np.asarray(f_np.locked_once)[:P], tail_syms)
        return TurboResult(symbols=syms, converged=converged, passes=passes,
                           max_residual=max_residual, gauges=K,
                           fell_back=fallback_n > 0,
                           fallback_samples=fallback_n)
    parts = []
    for c in range(P):
        m = valid[:, c, :].reshape(-1)
        n_val = int(m.sum())
        s = np.zeros(n_val, dtype=_SYM_DTYPE)
        re = sym_re[:, c, :].reshape(-1)[m]
        im = sym_im[:, c, :].reshape(-1)[m]
        if K is not None:
            re, im = rotate_quadrant(re, im, K[c])
        s["re"] = re
        s["im"] = im
        s["locked_once"] = lonce[:, c, :].reshape(-1)[m]
        parts.append(s)

    # Sequential tail/suffix from lane P-1's exit carry (exact when the
    # fixpoint converged / the prefix verified; within loop noise
    # otherwise).
    if tail_start < N:
        from .pipeline import StreamDemodulator
        tail_c = jax.tree_util.tree_map(lambda a: np.asarray(a[P - 1]),
                                        f_np)
        if K is not None and int(K[P - 1]) % 4 != 0:
            # Rotate the carry into chunk 0's gauge so the tail continues
            # the emitted stream: symbols transform by e^{-j K pi/2}, so
            # the NCO phase shifts by +K pi/2 (scan.py mixes with
            # e^{-j p_phase}). t_prev (previous symbol Q, gauge 0) is the
            # last assembled symbol's Q — searched across chunks, since
            # the final chunk may have emitted nothing.
            pp = np.mod(float(tail_c.p_phase)
                        + (int(K[P - 1]) % 4) * float(_HALF_PI),
                        2 * np.pi)
            prev_q = next((float(p["im"][-1]) for p in reversed(parts)
                           if len(p)), 0.0)
            tail_c = tail_c._replace(p_phase=np.float32(pp),
                                     t_prev=np.float32(prev_q))
        d = StreamDemodulator(cfg, backend=backend)
        d._carry = jax.tree_util.tree_map(jnp.asarray, tail_c)
        parts.append(d.process(f32_to_iq(xf[tail_start:])))
        parts.append(d.finish())

    return TurboResult(symbols=np.concatenate(parts), converged=converged,
                       passes=passes, max_residual=max_residual, gauges=K,
                       fell_back=fallback_n > 0,
                       fallback_samples=fallback_n)


# ---------------------------------------------------------------------------
# Span turbo: the chunk-parallel fixpoint applied to a BOUNDED mid-stream
# span — the streaming answer to the single-stream serialization
# (StreamDemodulator's per-block chain runs at per-dispatch latency; a
# buffered span of a file-backed or bursty input can instead ride the
# C-lane batch program: warmup + O(1) gauge passes for C*kb blocks of
# output, a ~C/passes-fold throughput win at the same exactness contract
# as strict turbo).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SpanResult:
    """demod_span_turbo outcome.

    symbols covers the ACCEPTED prefix only (consumed samples); the caller
    demodulates the rest of the span through its normal sequential path
    (exact oracle semantics) and keeps feeding from there.
    """
    symbols: np.ndarray              # structured (re, im, locked_once)
    exit_carry: DemodCarry | None    # numpy scalar leaves; None if P == 0
    consumed: int                    # samples covered by the accepted prefix
    passes: int
    converged: bool
    verified_lanes: int              # P — accepted chunk-lane prefix length


def demod_span_turbo(cfg: DemodConfig, carry0: DemodCarry, xf: np.ndarray,
                     chunks: int = 32, max_passes: int = 4,
                     backend: str = "auto",
                     warmup_blocks: int | None = None,
                     blocks_dev=None, wblocks_dev=None) -> SpanResult:
    """Demodulate a mid-stream span chunk-parallel from an EXACT carry.

    The span continues an ongoing stream: lane 0's entry is `carry0`
    (numpy scalar leaves — the stream's authoritative state, including its
    FIR tail), lanes 1..C-1 warm up on the real data preceding their
    chunk and the one-shot gauge resolution + fingerprint fixpoint of
    demod_array_turbo's gauge mode (O(1) passes) aligns their quadrants to
    the stream's. Acceptance is the strict-turbo contract
    (tests/test_turbo.py): the verified chunk-lane prefix is
    decision-final by induction from the exact lane-0 entry
    (_lane_ok_np); its symbols are emitted rotated into the stream's
    gauge (exact sign/swap) and the exit carry at the prefix boundary —
    rotated likewise — continues the stream. A non-verified suffix is NOT
    consumed; the caller re-demodulates it sequentially (so worst case
    costs one redundant pass over the span, never wrong output). Safety
    flags anywhere reject the whole span the same way.

    OQPSK: accepted lane prefixes are additionally shrunk to the longest
    one ending at an EVEN cumulative gauge (K[P-1] % 2 == 0). An
    odd-gauge exit swaps the half-symbol I/Q labeling — finalizing it
    mid-stream would need the global re-pairing surgery documented in
    _assemble_oqpsk_gauge — while an even-gauge exit carry rotates by
    pure sign flips (p_phase += K*pi/2; t_prev/inphase *= _OQ_SIGNS),
    exactly like QPSK. Lane gauges are near-uniform, so the shrink
    discards ~1 lane in expectation (geometric, p=1/2); the unconsumed
    lanes stay buffered and join the caller's next span — never
    re-demodulated sequentially.

    xf: (N, 2) float32 span with N == chunks * kb * cfg.block_len for an
    integer kb >= 2 (the caller sizes spans; no tail handling here).

    blocks_dev / wblocks_dev: optionally the (kb, C, L, 2) main and
    (kb_w, C, L, 2) warmup block arrays already ON DEVICE — bench.py's
    device-resident variant (the ~MB/s relay link is not representative
    of a production NIC; same rationale as _bench_turbo). They must match
    xf's content.
    """
    return span_finish(cfg, span_submit(
        cfg, carry0, xf, chunks=chunks, max_passes=max_passes,
        backend=backend, warmup_blocks=warmup_blocks,
        blocks_dev=blocks_dev, wblocks_dev=wblocks_dev))


@dataclasses.dataclass
class SpanPending:
    """In-flight span (span_submit -> span_finish).

    Acceptance is decided from the fused program's SMALL egress alone —
    exit_carry / consumed are final at submit time, so a pipelined caller
    (StreamDemodulator span mode, bench.py) can dispatch the NEXT span
    from exit_carry while this span's bulk symbol payload (`outs`, still
    device-resident) transfers and assembles in span_finish, overlapping
    the link with the device compute of the successor span."""
    outs: object          # device flat int8 payload | BlockOutput (jax/np)
    f_np: object          # pass-2 exit carries, numpy leaves
    K: np.ndarray         # cumulative gauges (C,)
    passes: int
    converged: bool
    P: int                # accepted lane prefix
    consumed: int         # samples covered by the accepted prefix
    exit_carry: object    # DemodCarry | None (final; feeds the next span)
    dims: tuple = None    # (kb, C, S) of the packed payload


def span_submit(cfg: DemodConfig, carry0: DemodCarry, xf: np.ndarray,
                chunks: int = 32, max_passes: int = 4,
                backend: str = "auto",
                warmup_blocks: int | None = None,
                blocks_dev=None, wblocks_dev=None) -> SpanPending:
    """Dispatch one span's fused gauge fixpoint and decide acceptance.

    Returns once the small vector (exit carries, gauges, per-lane
    convergence, last emitted symbol values) is back; the bulk symbol
    payload stays ON DEVICE in .outs (device-quantized int8, _quantize_j)
    until span_finish. See demod_span_turbo for the contract."""
    cfg.validate()
    N = len(xf)
    L = cfg.block_len
    taps = cfg.taps
    kb = N // (chunks * L)
    if kb * chunks * L != N or kb < 2:
        raise ValueError(f"span length {N} != chunks*kb*L with kb >= 2")
    chunk_len = kb * L
    carry0 = jax.tree_util.tree_map(np.asarray, carry0)

    tails = np.zeros((chunks, taps - 1, 2), np.float32)
    tails[0] = carry0.fir_tail
    for c in range(1, chunks):
        tails[c] = xf[c * chunk_len - (taps - 1):c * chunk_len]

    kb_w = min(warmup_blocks or default_warmup_blocks(L, kb), kb)
    wblocks_np, wtails = build_warmup(xf, chunks, chunk_len, kb_w, L, taps)
    if blocks_dev is None:
        # The (kb, C, L, 2) reorder is a ~N-byte strided host copy — only
        # pay it when the blocks actually need uploading.
        blocks_dev = jnp.asarray(
            xf.reshape(chunks, kb, L, 2).transpose(1, 0, 2, 3))
    if wblocks_dev is None:
        wblocks_dev = jnp.asarray(wblocks_np)

    init_np = jax.tree_util.tree_map(lambda a: np.asarray(a)[None], carry0)
    put_packed = lambda pc: tuple(map(jnp.asarray, pc))
    w0_np = jax.tree_util.tree_map(
        np.array, batch_carry_np(cfg, chunks)._replace(fir_tail=wtails))
    no_fused = os.environ.get("METEOR_DEMOD_NO_FUSED", "").lower() \
        not in ("", "0", "false", "no")
    if max_passes >= 2 and not no_fused:
        # Fused fast path: warmup + both passes + convergence detection in
        # ONE dispatch and one small egress — spans are latency-sensitive
        # (the per-pass host round trips of the loop below would dominate
        # a bounded span on a high-latency link). The stream carry enters
        # as a runtime input (ext_init), so every span reuses the same
        # compiled program.
        f_np, outs, K, passes, converged, _, lane_ok, stats = \
            fused_gauge_run(
                cfg, chunks, kb, kb_w, backend, None, put_packed, w0_np,
                wblocks_dev, blocks_dev, jnp.asarray(tails), tails,
                max_passes, init_np=init_np, pack_outs=True)
    else:
        run_w = _chunk_fn_packed(cfg, chunks, kb_w, backend, None)
        run_g = _chunk_fn_packed(cfg, chunks, kb, backend, None)
        wpf, _, _ = run_w(put_packed(pack_carry_np(w0_np)), wblocks_dev)
        w_np = finish_warmup_carry(cfg, unpack_carry_np(*egress(wpf)),
                                   tails, init_np=init_np)
        f_np, outs, K, passes, converged, _, lane_ok = gauge_fixpoint(
            cfg, run_g, put_packed, blocks_dev, w_np, tails,
            max_passes, init_np=init_np)
        stats = None

    # Per-lane safety flags mask into the acceptance diagnostics instead
    # of rejecting the whole span: the verified-prefix induction only
    # needs every ACCEPTED lane flag-free (a flagged lane's own exit is
    # suspect, so it and everything after it stay unconsumed; the prefix
    # before it is untainted — the same reasoning as lane_ok itself).
    flags_np = np.asarray(f_np.flags)
    lane_ok = np.asarray(lane_ok, bool) & (flags_np == 0)
    converged = bool(converged) and bool(np.all(flags_np == 0))
    P = verified_prefix(lane_ok)
    if cfg.oqpsk:
        # Odd-gauge exits swap the half-symbol labeling (see
        # demod_span_turbo's docstring): shrink to the longest even-gauge
        # boundary.
        while P > 0 and int(K[P - 1]) % 2 != 0:
            P -= 1
    if P == 0:
        return SpanPending(None, f_np, K, passes, converged, 0, 0, None)

    if stats is None:
        # Rare continuation path: outs is a raw float BlockOutput and no
        # last-symbol stats exist — materialize here (submit is
        # synchronous on this path).
        outs = jax.tree_util.tree_map(np.asarray, egress(outs))

    exit_c = jax.tree_util.tree_map(lambda a: np.asarray(a)[P - 1], f_np)
    kexit = int(K[P - 1]) % 4
    if cfg.oqpsk:
        if kexit:                            # even by construction: signs
            s = _OQ_SIGNS[kexit][0]
            exit_c = exit_c._replace(
                p_phase=np.float32(np.mod(
                    float(exit_c.p_phase) + kexit * float(_HALF_PI),
                    2 * np.pi)),
                t_prev=np.float32(s * float(exit_c.t_prev)),
                inphase=np.float32(s * float(exit_c.inphase)))
    elif kexit:
        # Rotate the exit carry into the stream's gauge (see
        # demod_array_turbo's tail continuation for the derivation):
        # symbols transform by e^{-j K pi/2} -> NCO phase shifts by
        # +K pi/2; t_prev becomes the last EMITTED symbol's Q.
        pp = np.mod(float(exit_c.p_phase) + kexit * float(_HALF_PI),
                    2 * np.pi)
        prev_q = _span_last_q(cfg, carry0, outs, K, P, stats)
        exit_c = exit_c._replace(p_phase=np.float32(pp),
                                 t_prev=np.float32(prev_q))
    exit_c = exit_c._replace(tick=np.int32(0), flags=np.int32(0))
    S_out = cfg.steps_per_block + (1 if cfg.oqpsk else 0)
    return SpanPending(outs, f_np, K, passes, converged, P,
                       P * chunk_len, exit_c, dims=(kb, chunks, S_out))


def _span_last_q(cfg, carry0, outs, K, P, stats):
    """Q component of the last symbol the accepted prefix emits, in the
    stream's gauge — the exit carry's t_prev (timing.c:65-66 keeps the
    previous symbol's Q). From the small-vector stats when available (no
    bulk egress); from the materialized float outs otherwise."""
    if stats is not None:
        nz = np.nonzero(stats["n_valid"][:P] > 0)[0]
        if len(nz) == 0:
            return float(carry0.t_prev)
        c = int(nz[-1])
        return float(rotate_quadrant(stats["last_re"][c],
                                     stats["last_im"][c], K[c])[1])
    valid = np.asarray(outs.valid).astype(bool)
    for c in reversed(range(P)):
        idx = np.nonzero(valid[:, c, :].reshape(-1))[0]
        if len(idx):
            re = np.asarray(outs.sym_re)[:, c, :].reshape(-1)[idx[-1]]
            im = np.asarray(outs.sym_im)[:, c, :].reshape(-1)[idx[-1]]
            return float(rotate_quadrant(re, im, K[c])[1])
    return float(carry0.t_prev)


def _assemble_qpsk_gauge(sym_re, sym_im, valid, lonce, K, scale=1.0):
    """Vectorized QPSK gauge assembly: rotate each lane into chunk 0's
    gauge (exact sign/swap, rotate_quadrant) and emit lane-major
    chronological order. `scale` maps stored values to the soft-symbol
    float scale (2.0 for the device-quantized int8 path: q =
    trunc(clip(v/2)) means 2q re-quantizes to q bit-exactly downstream)."""
    kb, P, S = sym_re.shape
    r = (np.asarray(K[:P]).astype(np.int64) % 4)
    swap = (r % 2 == 1)[:, None]
    sre = np.where(r < 2, 1.0, -1.0).astype(np.float32)[:, None]
    sim = np.where((r == 1) | (r == 2), -1.0, 1.0).astype(np.float32)[:, None]
    re_l = sym_re.transpose(1, 0, 2).reshape(P, -1).astype(np.float32)
    im_l = sym_im.transpose(1, 0, 2).reshape(P, -1).astype(np.float32)
    re_rot = sre * np.where(swap, im_l, re_l)
    im_rot = sim * np.where(swap, re_l, im_l)
    m = valid.transpose(1, 0, 2).reshape(-1)
    s = np.zeros(int(m.sum()), dtype=_SYM_DTYPE)
    s["re"] = re_rot.reshape(-1)[m] * np.float32(scale)
    s["im"] = im_rot.reshape(-1)[m] * np.float32(scale)
    s["locked_once"] = lonce.transpose(1, 0, 2).reshape(-1)[m]
    return s


def span_finish(cfg: DemodConfig, pending: SpanPending) -> SpanResult:
    """Transfer the accepted prefix's symbol payload and assemble it.

    The device->host transfer here is the span path's dominant link cost;
    a pipelined caller overlaps it with the next span's compute by
    calling span_submit for the successor first."""
    empty = np.zeros(0, dtype=_SYM_DTYPE)
    if pending.P == 0:
        return SpanResult(empty, None, 0, pending.passes,
                          pending.converged, 0)
    P, K, f_np = pending.P, pending.K, pending.f_np
    o = pending.outs
    if not hasattr(o, "sym_re"):
        buf = np.asarray(egress(o))          # ONE flat int8 transfer
        sym_re, sym_im, valid, lonce = _unpack_outs_np(buf, *pending.dims)
        scale = 2.0
    else:
        if not isinstance(jax.tree_util.tree_leaves(o)[0], np.ndarray):
            o = jax.tree_util.tree_map(np.asarray, egress(o))
        sym_re = np.asarray(o.sym_re)        # (kb, C, S) float32
        sym_im = np.asarray(o.sym_im)
        valid = np.asarray(o.valid).astype(bool)
        lonce = np.asarray(o.locked_once)
        scale = 1.0
    if cfg.oqpsk:
        symbols = _assemble_oqpsk_gauge(
            sym_re[:, :P].astype(np.float32) * np.float32(scale),
            sym_im[:, :P].astype(np.float32) * np.float32(scale),
            valid[:, :P], lonce[:, :P],
            K[:P], np.asarray(f_np.slot)[:P], np.asarray(f_np.inphase)[:P],
            np.asarray(f_np.locked_once)[:P], None)
    else:
        symbols = _assemble_qpsk_gauge(
            sym_re[:, :P], sym_im[:, :P], valid[:, :P], lonce[:, :P],
            K, scale=scale)
    return SpanResult(symbols, pending.exit_carry, pending.consumed,
                      pending.passes, pending.converged, P)
