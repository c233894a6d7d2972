"""Pallas TPU kernel: the per-symbol demod recurrence for a block of streams.

Why a kernel: the XLA `lax.scan` path (demod/scan.py) pays multiple
microseconds of fixed overhead per scan step (loop machinery + one dispatch
of ~200 tiny VPU ops per step), which caps throughput at a few Msamples/s
per chip. This kernel runs the identical per-FIRE recurrence inside a single
Mosaic program: states live in VMEM scratch, the candidate-window tiles
stream HBM->VMEM through the automatic grid pipeline (double-buffered), and
every step is a handful of fused VPU ops over window tiles plus per-state
rows.

Stream packing: a VPU vreg is (8 sublanes, 128 lanes). B = 128 streams fill
the lane dimension; R further stream GROUPS fill the sublanes, so one
kernel instance advances batch = R*128 streams and every per-state row op
is an (R, 128) tile — a FULL vreg per 8 stream-groups instead of the 1/8
occupancy of a (1, 128) row. The per-step serial chain length barely grows
(the K/W/32-row masked reductions turn into pure vreg add-trees with no
cross-sublane shuffles), so throughput scales with R until the window
stream hits HBM bandwidth.

Layout (see demod/scan.py for the algorithm itself, and the reference C
citations there; S_pad = steps padded to a multiple of the group size G):
  w_re, w_im      (S_pad, W, R, B) f32  per-step candidate FIR windows,
                                        streamed as (G, W, R, B) tiles
  base            (S_pad, 1, B) i32  window tick origin per step (common
                                     to all streams)
  carry in/out    (NF, R, B) f32 + (NI, R, B) i32  packed DemodCarry leaves
  outputs         (S_pad, R, B) sym_re/sym_im f32, valid/locked_once i32

The numeric recurrence is op-for-op the same as demod/scan.py's step
(including the closed-form FMA-proof timing gate); the decision structure
(which ticks fire, lock transitions) is bit-identical under XLA:CPU
(interpret mode — pinned by the CI suite), symbol values agree to
float32-FMA tolerance. On the real chip, Mosaic's FMA contraction drifts
the loop-state trajectories by ULPs, which can move an occasional fire by
one tick relative to the host oracle (measured ~1.6% of symbols, zero
sign disagreements on lock-gated output — scripts/verify_chip.py);
per-block symbol counts and lock telemetry stay bit-equal, and every
product contract that needs exactness (turbo fingerprints, strict
fallback, flag replay) compares the kernel against ITSELF, which is
deterministic.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import DemodConfig
from ..demod.state import (DemodCarry, BlockOutput, FLAG_WINDOW_MISS,
                           FLAG_UNCONSUMED)
from ..dsp.fir import make_fir_banks, polyphase_fir_block

_F32 = np.float32
_TWO_PI = _F32(2 * np.pi)
_PI = _F32(np.pi)

# Packed state rows. Float block:
F_TPHASE, F_TFREQ, F_TPREV, F_PPHASE, F_PFREQ, F_PERR, F_UPDOWN, \
    F_GAIN, F_BIASRE, F_BIASIM, F_INPHASE = range(11)
NF = 16   # padded to a full sublane tile
# Int block:
I_LOCKED, I_LOCKED_ONCE, I_SLOT, I_TICK, I_FLAGS = range(5)
NI = 8

# fast_sin fixed point constants (dsp/sincos.py, sincos.c:18-19)
_Q = 14
_SC_A = 1 << _Q
_SC_B = int((2 - 3.14159 / 4) * (1 << _Q))
_SC_C = _SC_B - (1 << _Q)
_PHASE_SCALE = _F32(65536.0 / (2 * np.pi))
_INV_Q = _F32(1.0 / (1 << _Q))


def _fast_sin_rows(fx):
    """fast_sin on (1, B) f32 rows using i32 shift arithmetic only.

    Identical to dsp/sincos.py but with the int16 wrap expressed as
    (x << 16) >> 16 (arithmetic), avoiding narrow integer dtypes in Mosaic.
    """
    xi = (fx * _PHASE_SCALE).astype(jnp.int32)
    x16 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(xi, 16), 16)
    sign = x16 < 0
    x = (x16 & 0x7FFF) - (1 << _Q)
    x2 = jax.lax.shift_right_arithmetic(x * x, _Q)
    y = _SC_B - jax.lax.shift_right_arithmetic(x2 * _SC_C, _Q)
    y = _SC_A - jax.lax.shift_right_arithmetic(x2 * y, _Q)
    y = jnp.where(sign, -y, y)
    return y.astype(jnp.float32) * _INV_Q


# tanh LUT saturation split: 13 of the 32 table entries are EXACTLY
# +-1.0f (f32 rounds tanh(|x| >= 10) to 1.0 — the distance 2e^-2|x| is
# under half an ulp), so the masked-sum lookup only needs the interior
# rows; the saturated tails resolve with two compares. Bounds derived
# from the table itself so the split can never drift from it.
from ..dsp.loops import TANH_TABLE as _TANH_TABLE_NP
_TT = np.asarray(_TANH_TABLE_NP, dtype=np.float32)
_SAT_LO = int(np.argmax(np.abs(_TT) < 1.0))
_SAT_HI = int(len(_TT) - np.argmax(np.abs(_TT[::-1]) < 1.0))
assert np.all(_TT[:_SAT_LO] == -1.0) and np.all(_TT[_SAT_HI:] == 1.0)
_N_INNER = _SAT_HI - _SAT_LO


def _lut_tanh_rows(v, tiota, table_col):
    """Truncating tanh lookup (pll.c:153-159) on (R, B) state rows.

    tiota: (_N_INNER, R, B) loop-invariant iota holding the INTERIOR row
    indices [_SAT_LO, _SAT_HI); table_col: (_N_INNER, 1, B) — the numpy
    tanh table's interior rows enter the kernel as an input block (Pallas
    kernels cannot capture array constants). Evaluated as a masked sum
    over the interior tile — exactly one entry is selected per in-range
    stream, so the sum is bit-exact (x + 0 never rounds) — with the
    saturated tails (entries that are EXACTLY +-1.0f, see _SAT_LO/_SAT_HI)
    folded into two compares. Per-element values are identical to a full
    32-row table lookup; in locked steady state |v| ~ 134 >> 16, so the
    hot path always takes the saturated branch and the interior rows are
    pure overlap-hidden work (13 fewer rows x 2 LUTs per step than the
    r3 full-table sum)."""
    idx = jnp.clip(jnp.trunc(v), -16.0, 15.0).astype(jnp.int32) + 16
    sel = tiota == idx                 # (_N_INNER, R, B), idx broadcast
    inner = jnp.sum(jnp.where(sel, table_col, _F32(0.0)), axis=0)
    return jnp.where(idx < _SAT_LO, _F32(-1.0),
                     jnp.where(idx >= _SAT_HI, _F32(1.0), inner))


def _geom(cfg: DemodConfig, locked: bool):
    """Kernel gate/window geometry: (k0, K, W, delta). LOCKED mode narrows
    the candidate window and offsets the gate candidates by k0 (see
    config.gate_offset_locked / window_delta_locked); decisions are
    bitwise-identical to the wide geometry whenever they stay inside the
    locked envelope, and flag into the oracle fallback otherwise."""
    if locked:
        # ASYMMETRIC base: delta_locked rows below the nominal fire tick,
        # the rest (tau0 coverage) above it — tau0 is one-sided, so the
        # r2 symmetric common window wasted ~ticks_per_fire dead low
        # rows (config.window_locked_asym).
        return (cfg.gate_offset_locked, cfg.gate_candidates,
                cfg.window_locked_asym, cfg.window_delta_locked)
    return (0, cfg.gate_candidates, cfg.window_common,
            cfg.window_delta_common)


def _make_step(cfg: DemodConfig, R: int, B: int, W: int | None = None,
               k0: int = 0, spec: bool = False,
               kspec: tuple | None = None) -> Callable:
    """Shared per-step recurrence body for both kernel variants.

    Returns step(st, tiles, wre, wim, base_j, live) -> (st', out) where st
    is the 16-tuple of (R, B) state tiles in packed-row order, tiles the
    loop-invariant (kiota, ksB, wc, tiota, table_col) tuple, wre/wim the
    (W, R, B) candidate window for this step, base_j the window's tick
    origin (scalar or (R, B)), live the dead-step mask, and out the
    (sym_re, sym_im, valid, locked_once) tiles.

    With k0 > 0 the gate evaluates only candidates (k0, K]: the
    LOCKED-mode decision speculation. One extra compare verifies in-step
    that the true fire cannot sit at k <= k0 — if it could, the step
    flags and the oracle fallback replays the block exactly. Non-fire
    consumption stays min(rem, K), so an unflagged offset step is
    bit-identical to the full-gate step (fl(k*tf) is monotone in k).
    NOTE: k0 > 0 assumes a fire interval's phase history — a block's
    FIRST step (arbitrary entry phase, k* uniform in
    [1, ticks_per_fire+1]) must run a k0 == 0 step (the kernel's entry
    prologue).

    spec=True builds the ALL-FIRE speculative body (only valid for steps
    < cfg.steps_always_fire, where every in-envelope stream provably
    fires): the fire is assumed, which deletes the non-fire consumption
    arithmetic (integer ops — exact) and drops the `& fired` mask from
    the (W, R, B) window select — the single largest tile op (the one-hot
    select/sum is exact in any evaluation order, x + 0 never rounds).
    One compare verifies the assumption (k_min < K_eff, i.e. the gate
    really fires within the candidate range and rem); a violating stream
    is out of envelope and raises FLAG_WINDOW_MISS, routing the block to
    the exact oracle fallback.

    kspec=(k0s, Ks) (spec only) narrows the gate to the all-fire
    candidate range cfg.gate_spec_bounds: in the spec region the fire
    follows a previous fire with an in-envelope phase residual, so only
    ~half the offset-gate candidates are feasible — skipped low
    candidates are verified by the same `early` compare as k0, and a
    non-fire (fire above the range) flags via ~fired. Decisions are
    bitwise-identical for in-envelope streams (fl(k*tf) monotone).

    CRITICAL: every FLOAT state update keeps its gated where() form with
    the real computed `fired` predicate, even though the predicate is
    provably true for unflagged streams. Removing a where() changes the
    producer expression's fusion context and XLA may then FMA-contract a
    mul+add it previously rounded separately (measured: the AGC bias
    update drifts 1 ULP the moment its where() is dropped), which breaks
    the cross-program bit-exact decision contract (demod/scalar.py module
    docstring). Only integer, boolean, and one-hot-masked-sum
    simplifications are rounding-neutral; float graphs must stay
    byte-identical to the gated body. The `live` argument is ignored
    (speculative steps are never grid padding)."""
    a_t, b_t = cfg.timing_gains
    a_p, b_p = cfg.pll_gains
    t_center = cfg.timing_freq
    t_dev = cfg.timing_dev_max
    fmax = cfg.pll_fmax
    block_ticks = cfg.block_ticks
    K = cfg.gate_candidates
    if W is None:
        W = cfg.window_common
    K_eff = K - k0
    if kspec is not None:
        assert spec, "kspec applies to the all-fire spec body only"
        k0, K_eff = kspec
    k0_f = _F32(k0)
    oqpsk = cfg.oqpsk
    # Perf-probe ablations (scripts/probe_hifi.py): TIMING-ONLY variants
    # that break correctness, used to attribute the single-fire step's
    # per-step cost on chip — never set in production. "selw32": the
    # window select reads a 32-row sub-slice; "rowa": the AGC/sqrt chain
    # is deleted (z used raw); "notanh": both Costas LUT lookups replaced
    # by a sub; "nogate": the gate's compare/min tree replaced by a
    # constant fire at k0+8.
    _ablate = frozenset(
        os.environ.get("METEOR_DEMOD_ABLATE", "").split(",")) - {""}

    bias_keep = _F32(1.0 - C.AGC_BIAS_POLE)
    bias_pole = _F32(C.AGC_BIAS_POLE)
    gain_pole = _F32(C.AGC_GAIN_POLE)
    agc_target = _F32(C.AGC_TARGET)
    err_keep = _F32(1.0 - C.ERR_POLE)
    err_pole = _F32(C.ERR_POLE)
    sweep = _F32(C.SWEEP_STEP)
    half_pi = _F32(np.pi / 2)

    def step(st, tiles, wre, wim, base_j, live):
        (tp, tf, prev, pp, pf, perr, updown, gain, bias_re, bias_im,
         inphase, locked, lonce, slot, t, flags) = st
        kiota, ksB, wc, tiota, table_col = tiles

        if oqpsk:
            thresh = slot.astype(jnp.float32) * _PI
        else:
            thresh = jnp.full_like(tp, _TWO_PI)

        # ---- closed-form timing gate (scan.py docstring item 4) ----------
        diff = thresh - tp                          # (R, B)
        rem = block_ticks - t                       # (R, B) i32
        prod = ksB * tf                             # (K_eff, R, B)
        if "nogate" in _ablate:
            # Timing probe: constant in-range fire (an out-of-range
            # constant makes `fired` statically False and XLA then DCEs
            # the whole gated update chain, inflating the ablation).
            k_min = jnp.full_like(t, min(8, K_eff - 1))
        else:
            ok = jnp.logical_and(prod >= diff,
                                 ksB <= rem.astype(jnp.float32))
            kcand = jnp.where(ok, kiota, K_eff)
            k_min = jnp.min(kcand, axis=0)
        if spec:
            # All-fire speculation: assume the gate fires; verify, don't
            # gate. A non-firing stream here is out of envelope (see
            # config.steps_always_fire) — flag it, values are then
            # don't-care (the oracle fallback replays the block). Integer
            # simplifications only; `fired` still gates every float
            # update below (see docstring CRITICAL note).
            fired = k_min < K_eff
            k_idx = k_min
            prod_sel = jnp.sum(jnp.where(kiota == k_idx, prod, _F32(0.0)),
                               axis=0)
            consumed = k_min + 1 + k0
        else:
            fired = jnp.logical_and(k_min < K_eff, live)
            nf = jnp.minimum(rem, K)                # non-fire consumption
            k_idx = jnp.where(fired, k_min, nf - 1 - k0)
            k_idx = jnp.where(live, k_idx, -1 - k0)
            # Selected precomputed product: add is never fused with the
            # mul.
            prod_sel = jnp.sum(jnp.where(kiota == k_idx, prod, _F32(0.0)),
                               axis=0)
            consumed = jnp.where(fired, k_min + 1 + k0,
                                 jnp.where(live, nf, 0))
        if k0 and not spec:
            # Block-end tail shorter than the skipped candidates: consume
            # rem ticks with the same bare-mul product fl(rem*tf) the wide
            # gate would have selected (x + 0 never rounds, so adding the
            # masked term is exact).
            tail = jnp.logical_and(jnp.logical_and(~fired, live),
                                   jnp.logical_and(nf <= k0, nf > 0))
            prod_sel = prod_sel + jnp.where(
                tail, nf.astype(jnp.float32) * tf, _F32(0.0))
        if k0:
            # In-step verification of the skipped candidates: the wide gate
            # fires at some k <= k0 iff fl(min(k0, rem)*tf) >= diff (fl(k*tf)
            # is monotone in k and a fire needs k <= rem ticks) — outside
            # the locked envelope. Flag; the oracle fallback replays the
            # block. Fires blocked by rem (k > rem) don't fire in the wide
            # gate either, so they need no flag.
            m_f = jnp.minimum(k0_f, rem.astype(jnp.float32))
            early = jnp.logical_and(m_f >= _F32(1.0), m_f * tf >= diff)
            if not spec:
                early = jnp.logical_and(live, early)
        else:
            early = jnp.zeros_like(k_min, dtype=jnp.bool_)
        tau = t + consumed - 1
        tp = tp + prod_sel
        t = t + consumed

        # ---- select fired tick from the (W, R, B) window tile ------------
        c = tau - base_j                           # (R, B) window coord
        if "selw32" in _ablate:    # timing probe: 32-row select sub-slice
            wre_s, wim_s, wc_s = wre[0:32], wim[0:32], wc[:32]
        else:
            wre_s, wim_s, wc_s = wre, wim, wc
        if spec:
            sel = wc_s == c                        # (W, R, B); fired assumed
        else:
            sel = jnp.logical_and(wc_s == c, fired)  # (W, R, B)
        z_re = jnp.sum(jnp.where(sel, wre_s, _F32(0.0)), axis=0)
        z_im = jnp.sum(jnp.where(sel, wim_s, _F32(0.0)), axis=0)
        if spec:
            miss = jnp.logical_or(
                jnp.logical_or(c < 0, c >= W),
                jnp.logical_or(early, ~fired))
        else:
            miss = jnp.logical_or(
                jnp.logical_and(fired, jnp.logical_or(c < 0, c >= W)),
                early)

        # ---- AGC (agc.c:12-25) -------------------------------------------
        if "rowa" in _ablate:      # timing probe: delete the AGC/sqrt chain
            bias_re_n, bias_im_n, gain_n = bias_re, bias_im, gain
            zr, zi = z_re, z_im
        else:
            bias_re_n = bias_re * bias_keep + bias_pole * z_re
            bias_im_n = bias_im * bias_keep + bias_pole * z_im
            zr = (z_re - bias_re_n) * gain
            zi = (z_im - bias_im_n) * gain
            mag = jnp.sqrt(zr * zr + zi * zi)
            gain_n = jnp.maximum(_F32(0.0),
                                 gain + gain_pole * (agc_target - mag))

        # ---- PLL mix (pll.c:50-97) ---------------------------------------
        # sin and cos as ONE (2R, B) fast_sin tile (elementwise Q14 int
        # recurrence — bit-identical per element, half the serial ops).
        sc2 = _fast_sin_rows(jnp.concatenate([-pp, -pp + half_pi], axis=0))
        sn, cs = sc2[0:R], sc2[R:2 * R]
        mre = zr * cs - zi * sn
        mim = zr * sn + zi * cs
        pp_adv = pp + pf
        pp_adv = jnp.where(pp_adv >= _TWO_PI, pp_adv - _TWO_PI, pp_adv)

        # ---- assemble symbol (OQPSK: demod.c:62-87) ----------------------
        if oqpsk:
            assert not spec, "OQPSK speculation lives in the paired step"
            is1 = slot == 1
            fire1 = jnp.logical_and(fired, is1)
            do_update = jnp.logical_and(fired, ~is1)
            sym_re = inphase                   # previous half-symbol I
            sym_im = mim
            inphase = jnp.where(fire1, mre, inphase)
            slot = jnp.where(fired, jnp.where(is1, 2, 1), slot)
        else:
            do_update = fired
            sym_re = mre
            sym_im = mim

        # ---- M&M retiming (timing.c:59-95) -------------------------------
        sgn_prev = jnp.where(prev < 0, _F32(-1.0), _F32(1.0))
        sgn_cur = jnp.where(sym_im < 0, _F32(-1.0), _F32(1.0))
        err_t = sgn_prev * sym_im - sgn_cur * prev
        fd = jnp.clip((tf - t_center) - b_t * err_t, -t_dev, t_dev)
        tp = jnp.where(do_update, tp - (_TWO_PI + a_t * err_t), tp)
        tf = jnp.where(do_update, t_center + fd, tf)
        prev = jnp.where(do_update, sym_im, prev)

        # ---- Costas update (pll.c:99-130) --------------------------------
        if "notanh" in _ablate:    # timing probe: delete both LUT lookups
            e = sym_re - sym_im
        else:
            e = (_lut_tanh_rows(sym_re, tiota, table_col) * sym_im
                 - _lut_tanh_rows(sym_im, tiota, table_col) * sym_re)
        pp_upd = jnp.fmod(pp_adv + a_p * e, _TWO_PI)
        pf_upd = pf + b_p * e
        err_upd = perr * err_keep + jnp.abs(e) * err_pole
        lock_now = jnp.logical_and(err_upd < _F32(C.LOCK_THRESH),
                                   locked == 0)
        unlock_now = jnp.logical_and(err_upd > _F32(C.UNLOCK_THRESH),
                                     locked == 1)
        locked_upd = jnp.where(lock_now, 1,
                               jnp.where(unlock_now, 0, locked))
        lonce_upd = jnp.maximum(lonce, lock_now.astype(jnp.int32))
        pf_upd = jnp.where(locked_upd == 0, pf_upd + sweep * updown,
                           pf_upd)
        updown_upd = jnp.where(pf_upd >= fmax, _F32(-1.0),
                               jnp.where(pf_upd <= -fmax, _F32(1.0),
                                         updown))
        pf_upd = jnp.clip(pf_upd, -fmax, fmax)

        # ---- gated register updates (spec: same where() forms — the
        # predicates are provably true for unflagged streams but their
        # presence keeps the float producers' rounding identical to the
        # gated body; see docstring CRITICAL note) -------------------------
        pp = jnp.where(do_update, pp_upd, jnp.where(fired, pp_adv, pp))
        pf = jnp.where(do_update, pf_upd, pf)
        perr = jnp.where(do_update, err_upd, perr)
        locked = jnp.where(do_update, locked_upd, locked)
        lonce_out = jnp.where(do_update, lonce_upd, lonce)
        lonce = lonce_out
        updown = jnp.where(do_update, updown_upd, updown)
        gain = jnp.where(fired, gain_n, gain)
        bias_re = jnp.where(fired, bias_re_n, bias_re)
        bias_im = jnp.where(fired, bias_im_n, bias_im)
        valid = do_update.astype(jnp.int32)
        flags = flags | jnp.where(miss, FLAG_WINDOW_MISS, 0)

        st_new = (tp, tf, prev, pp, pf, perr, updown, gain, bias_re,
                  bias_im, inphase, locked, lonce, slot, t, flags)
        out = (sym_re, sym_im, valid, lonce_out)
        return st_new, out

    return step


def _make_paired_step_tiles(cfg: DemodConfig, R: int, B: int,
                            W: int | None = None,
                            spec: bool = False,
                            slices: tuple | None = None,
                            pargate: bool = False,
                            kspec: tuple | None = None) -> Callable:
    """OQPSK paired-fire step on (R, B) tiles — the kernel mirror of
    demod/scan.py's _make_paired_step (see its docstring for the pairing
    semantics and the alignment invariant). Fire-for-fire float op order
    matches the single-fire body, so decisions are bit-identical to the
    scan path.

    spec=True builds the ALL-FIRE speculative body (steps <
    cfg.steps_always_fire only): entry slot == 1 and both half-fires are
    assumed (verified — a violation flags into the oracle fallback),
    which deletes the attempt gating, the non-fire k_idx arithmetic
    (integers — exact), and the `& fired` masks on both (W, R, B) window
    selects (one-hot select/sum is exact in any order). Every FLOAT
    update keeps its gated where() form with the real predicates — see
    _make_step's CRITICAL note: dropping a where() changes the producer's
    fusion context and XLA may FMA-contract differently, breaking the
    bit-exact decision contract. `live` is ignored.

    pargate=True (spec only, R == 1): transaction B's gate is evaluated
    for EVERY feasible transaction-A fire candidate kA in
    cfg.pargate_bounds as one (K, KA, B) tile — work that depends only on
    the step's ENTRY state, so the compiler can overlap it with
    transaction A's whole chain — and the resolved kA then one-hot
    selects B's fire tick (compare + masked sum over KA sublane rows).
    This removes gate B's compare/min chain from the serial A->B
    dependency (docs/PERF.md r3 close-out, the named untried lever).
    Float ops match the serial gate expression-for-expression (the
    per-candidate diffB is the same sub, the one-hot sums are exact), so
    decisions are bit-identical; a resolved kA outside the static bound
    flags FLAG_WINDOW_MISS -> exact oracle fallback.

    NOTE: the bound assumes a fire interval's phase history (|tp
    residual| <= locked_jitter_rad after the previous fire), which a
    block's FIRST paired step does NOT have — its A fire lands at the
    entry offset tau0 in [1, ticks_per_fire + jitter], below k_loA for
    early entries (measured: every stream flags at step 0 without this) —
    so the kernel factories run step 0 with the serial-gate spec body,
    exactly like the QPSK offset gate's k0 == 0 entry prologue
    (_make_step docstring)."""
    a_t, b_t = cfg.timing_gains
    a_p, b_p = cfg.pll_gains
    t_center = cfg.timing_freq
    t_dev = cfg.timing_dev_max
    fmax = cfg.pll_fmax
    block_ticks = cfg.block_ticks
    K = cfg.gate_candidates
    if W is None:
        W = cfg.window_common
    # kspec=(k0s, Ks): narrow BOTH transactions' gates to the all-fire
    # candidate range (cfg.gate_spec_bounds — OQPSK pays the gate twice
    # per step, so this halves 2x16 candidate rows to 2x~7). Skipped low
    # candidates are verified per transaction (the `early` compare folds
    # into defer -> FLAG_WINDOW_MISS); fires above the range defer and
    # flag in the spec region. See _make_step's kspec note.
    if kspec is not None:
        assert spec and not pargate
        k0p, Kp = kspec
    else:
        k0p, Kp = 0, cfg.gate_candidates
    k0p_f = _F32(k0p)
    if pargate:
        assert spec and R == 1, "pargate applies to the spec body at R == 1"
        k_loA, KA = cfg.pargate_bounds
    # Perf-probe ablations (scripts/probe_oqpsk.py): TIMING-ONLY variants
    # that break correctness, used to attribute per-step cost on chip —
    # never set in production. "selw32": both window selects read a
    # 32-row sub-slice; "rowb": transaction B reuses A's AGC/mix values
    # (deletes B's serial row chain); "gateb": B reuses A's gate decision.
    _ablate = frozenset(
        os.environ.get("METEOR_DEMOD_ABLATE", "").split(",")) - {""}

    bias_keep = _F32(1.0 - C.AGC_BIAS_POLE)
    bias_pole = _F32(C.AGC_BIAS_POLE)
    gain_pole = _F32(C.AGC_GAIN_POLE)
    agc_target = _F32(C.AGC_TARGET)
    err_keep = _F32(1.0 - C.ERR_POLE)
    err_pole = _F32(C.ERR_POLE)
    sweep = _F32(C.SWEEP_STEP)
    half_pi = _F32(np.pi / 2)

    def step(st, tiles, wre, wim, base_j, live):
        (tp, tf, prev, pp, pf, perr, updown, gain, bias_re, bias_im,
         inphase, locked, lonce, slot, t, flags) = st
        kiota, ksB, wc, tiota, table_col = tiles
        # Per-transaction select slices (config.locked_pair_slices): each
        # half-fire's one-hot select reads only its own 8-aligned
        # sub-range of the step window. Aligned static slices are free
        # (address math, no relayout); out-of-slice fires flag.
        if "selw32" in _ablate:
            oA, WA, oB, WB = 0, 32, 0, 32
        elif slices is not None:
            oA, WA, oB, WB = slices
        else:
            oA, WA, oB, WB = 0, W, 0, W
        winA = (wre[oA:oA + WA], wim[oA:oA + WA], wc[:WA], oA, WA)
        winB = (wre[oB:oB + WB], wim[oB:oB + WB], wc[:WB], oB, WB)

        def fire(thresh, tpv, tv, attempt):
            rem = block_ticks - tv
            diffv = thresh - tpv
            prod = ksB * tf                             # (Kp, R, B)
            ok = jnp.logical_and(prod >= diffv,
                                 ksB <= rem.astype(jnp.float32))
            kcand = jnp.where(ok, kiota, Kp)
            k_min = jnp.min(kcand, axis=0)
            fired_raw = k_min < Kp
            if spec:
                # All-fire speculation: attempt/live statically true; a
                # non-fire is out of envelope -> defer flags it. Integer
                # simplifications only (see _make_step's CRITICAL note).
                fired = fired_raw
                k_idx = k_min
                defer = ~fired_raw
                t_n = tv + k_min + 1 + k0p
            else:
                fired = jnp.logical_and(jnp.logical_and(fired_raw, attempt),
                                        live)
                k_idx = jnp.where(fired, k_min, jnp.minimum(rem, Kp) - 1)
                k_idx = jnp.where(jnp.logical_and(attempt, live), k_idx, -1)
                defer = jnp.logical_and(
                    jnp.logical_and(jnp.logical_and(~fired_raw, attempt),
                                    live),
                    rem > Kp)
                t_n = jnp.where(jnp.logical_and(attempt, live),
                                tv + k_idx + 1, tv)
            prod_sel = jnp.sum(jnp.where(kiota == k_idx, prod, _F32(0.0)),
                               axis=0)
            tau = tv + k_idx + k0p if spec else tv + k_idx
            tp_n = tpv + prod_sel
            if k0p:
                # In-step verification of the skipped candidates, same
                # compare as _make_step's offset gate: a wide-gate fire at
                # k <= k0p is out of the spec envelope -> defer -> flag.
                m_f = jnp.minimum(k0p_f, rem.astype(jnp.float32))
                early = jnp.logical_and(m_f >= _F32(1.0), m_f * tf >= diffv)
                defer = jnp.logical_or(defer, early)
            return fired, tau, tp_n, t_n, defer

        def select(tau, fired, win):
            wre_s, wim_s, wc_s, off, Wf = win
            c = tau - base_j - off
            if spec:
                sel = wc_s == c                         # (Wf, R, B)
                miss = jnp.logical_or(c < 0, c >= Wf)
            else:
                sel = jnp.logical_and(wc_s == c, fired)  # (Wf, R, B)
                miss = jnp.logical_and(fired,
                                       jnp.logical_or(c < 0, c >= Wf))
            z_re = jnp.sum(jnp.where(sel, wre_s, _F32(0.0)), axis=0)
            z_im = jnp.sum(jnp.where(sel, wim_s, _F32(0.0)), axis=0)
            return z_re, z_im, miss

        # ---- transaction A: the I half-fire ------------------------------
        # Spec verification: every steady-state paired step enters at
        # slot == 1 (I half-fire, then Q) and both transactions fire.
        # Verified, not assumed silently — a violation flags into the
        # exact oracle fallback.
        misalign = (slot != 1) if spec else False
        threshA = slot.astype(jnp.float32) * _PI
        firedA, tauA, tp1, t1, deferA = fire(threshA, tp, t, slot > 0)
        # Both transactions' PLL mix phases are known right after gate A
        # (ppA/pp1 are adds off the entry state), so all four fast_sin
        # evaluations run as ONE (4R, B) tile — the elementwise Q14 int
        # recurrence is ~10 serial ops either way, on 4 rows instead of
        # one at a time (values bit-identical per element).
        ppA = pp + pf
        ppA = jnp.where(ppA >= _TWO_PI, ppA - _TWO_PI, ppA)
        pp1 = jnp.where(firedA, ppA, pp)
        sc4 = _fast_sin_rows(jnp.concatenate(
            [-pp, -pp + half_pi, -pp1, -pp1 + half_pi], axis=0))
        snA, csA = sc4[0:R], sc4[R:2 * R]
        snB, csB = sc4[2 * R:3 * R], sc4[3 * R:4 * R]
        zAre, zAim, missA = select(tauA, firedA, winA)
        biasAre = bias_re * bias_keep + bias_pole * zAre
        biasAim = bias_im * bias_keep + bias_pole * zAim
        zrA = (zAre - biasAre) * gain
        ziA = (zAim - biasAim) * gain
        magA = jnp.sqrt(zrA * zrA + ziA * ziA)
        gainA = jnp.maximum(_F32(0.0),
                            gain + gain_pole * (agc_target - magA))
        mreA = zrA * csA - ziA * snA

        gain1 = jnp.where(firedA, gainA, gain)
        bre1 = jnp.where(firedA, biasAre, bias_re)
        bim1 = jnp.where(firedA, biasAim, bias_im)
        is1A = slot == 1
        inphase1 = jnp.where(jnp.logical_and(firedA, is1A), mreA, inphase)
        slotB = jnp.where(firedA, jnp.where(is1A, 2, 1), slot)

        # ---- transaction B: the Q fire -----------------------------------
        threshB = slotB.astype(jnp.float32) * _PI
        par_oob = False
        if "gateb" in _ablate:    # timing probe: reuse A's gate decision
            firedB, tauB, tp2, t2, deferB = firedA, tauA, tp1, t1, deferA
        elif pargate:
            # Parallel gate B (see docstring): the (K, KA, B) candidate
            # tile depends only on the entry state (tp, t, tf), so it
            # schedules alongside transaction A's serial chain. Serial-B
            # float expressions are reproduced per candidate: diffB_a is
            # the same `thresh - (tp + prod[kA])` sub (threshB == 2*pi
            # statically in the verified slot==1 spec regime; slot
            # misalignment flags via `misalign`), the rem compare is
            # integer-exact, and the resolved-kA / resolved-kB picks are
            # one-hot masked sums (x + 0 never rounds).
            prod2 = ksB[:, 0] * tf[0]                       # (K, B)
            ki2 = kiota[:, 0]                               # (K, B)
            aiota2 = (jax.lax.broadcasted_iota(jnp.int32, (KA, B), 0)
                      + k_loA)                              # absolute kA
            # Per-candidate A product through the one-hot masked-sum FMA
            # fence (x + 0 never rounds; the sum node keeps tp + prod[kA]
            # from contracting into an FMA — same idiom as the serial
            # gate's prod_sel, see _make_step's CRITICAL note).
            selK = ki2[:, None] == aiota2[None]             # (K, KA, B)
            prodA2 = jnp.sum(jnp.where(selK, prod2[:, None], _F32(0.0)),
                             axis=0)                        # (KA, B)
            tp1_a = tp[0] + prodA2
            diffB_a = _TWO_PI - tp1_a
            rem_a = ((block_ticks - t[0]) - (aiota2 + 1)
                     ).astype(jnp.float32)                  # (KA, B)
            okB = jnp.logical_and(prod2[:, None] >= diffB_a[None],
                                  ksB[:, 0][:, None] <= rem_a[None])
            kcB = jnp.where(okB, ki2[:, None], K)           # (K, KA, B)
            kminB_a = jnp.min(kcB, axis=0)                  # (KA, B)
            # ---- resolve with A's fired candidate (serial: 3 tile ops)
            kA = (tauA - t)[0]                              # (B,)
            selA = aiota2 == kA[None]
            kminB = jnp.sum(jnp.where(selA, kminB_a, 0),
                            axis=0)[None]                   # (1, B)
            par_oob = jnp.logical_or(kA < k_loA,
                                     kA >= k_loA + KA)[None]
            firedB = kminB < K
            prod_selB = jnp.sum(jnp.where(kiota == kminB, ksB * tf,
                                          _F32(0.0)), axis=0)
            tauB = t1 + kminB
            tp2 = tp1 + prod_selB
            t2 = t1 + kminB + 1
            deferB = ~firedB
        else:
            firedB, tauB, tp2, t2, deferB = fire(threshB, tp1, t1, firedA)
        zBre, zBim, missB = select(tauB, firedB, winB)
        if "rowb" in _ablate:     # timing probe: reuse A's AGC/mix chain
            biasBre, biasBim, gainB = biasAre, biasAim, gainA
            mimB, ppB = mreA, ppA
        else:
            biasBre = bre1 * bias_keep + bias_pole * zBre
            biasBim = bim1 * bias_keep + bias_pole * zBim
            zrB = (zBre - biasBre) * gain1
            ziB = (zBim - biasBim) * gain1
            magB = jnp.sqrt(zrB * zrB + ziB * ziB)
            gainB = jnp.maximum(_F32(0.0),
                                gain1 + gain_pole * (agc_target - magB))
            mimB = zrB * snB + ziB * csB
            ppB = pp1 + pf
            ppB = jnp.where(ppB >= _TWO_PI, ppB - _TWO_PI, ppB)

        gain2 = jnp.where(firedB, gainB, gain1)
        bre2 = jnp.where(firedB, biasBre, bre1)
        bim2 = jnp.where(firedB, biasBim, bim1)
        pp2 = jnp.where(firedB, ppB, pp1)
        slot_f = jnp.where(firedB, jnp.where(slotB == 1, 2, 1), slotB)

        # ---- the symbol + ONE update block (Q fires only) ----------------
        do_update = jnp.logical_and(firedB, slotB == 2)
        sym_re = inphase1
        sym_im = mimB

        sgn_prev = jnp.where(prev < 0, _F32(-1.0), _F32(1.0))
        sgn_cur = jnp.where(sym_im < 0, _F32(-1.0), _F32(1.0))
        err_t = sgn_prev * sym_im - sgn_cur * prev
        tp_f = jnp.where(do_update, tp2 - (_TWO_PI + a_t * err_t), tp2)
        fd = jnp.clip((tf - t_center) - b_t * err_t, -t_dev, t_dev)
        tf_f = jnp.where(do_update, t_center + fd, tf)
        prev_f = jnp.where(do_update, sym_im, prev)

        e = (_lut_tanh_rows(sym_re, tiota, table_col) * sym_im
             - _lut_tanh_rows(sym_im, tiota, table_col) * sym_re)
        pp_upd = jnp.fmod(pp2 + a_p * e, _TWO_PI)
        pf_upd = pf + b_p * e
        err_upd = perr * err_keep + jnp.abs(e) * err_pole
        lock_now = jnp.logical_and(err_upd < _F32(C.LOCK_THRESH),
                                   locked == 0)
        unlock_now = jnp.logical_and(err_upd > _F32(C.UNLOCK_THRESH),
                                     locked == 1)
        locked_upd = jnp.where(lock_now, 1,
                               jnp.where(unlock_now, 0, locked))
        lonce_upd = jnp.maximum(lonce, lock_now.astype(jnp.int32))
        pf_upd = jnp.where(locked_upd == 0, pf_upd + sweep * updown,
                           pf_upd)
        updown_upd = jnp.where(pf_upd >= fmax, _F32(-1.0),
                               jnp.where(pf_upd <= -fmax, _F32(1.0),
                                         updown))
        pf_upd = jnp.clip(pf_upd, -fmax, fmax)

        pp_n = jnp.where(do_update, pp_upd, pp2)
        pf_n = jnp.where(do_update, pf_upd, pf)
        perr_n = jnp.where(do_update, err_upd, perr)
        locked_n = jnp.where(do_update, locked_upd, locked)
        lonce_out = jnp.where(do_update, lonce_upd, lonce)
        updown_n = jnp.where(do_update, updown_upd, updown)
        miss = jnp.logical_or(jnp.logical_or(missA, missB), deferB)
        if spec:
            # deferA (A non-fire) and misalign are out-of-envelope in the
            # all-fire regime; the gated body tolerates both (A defers the
            # pair to the next step). par_oob: the resolved kA fell outside
            # the static pargate candidate range — B's parallel-gate values
            # are then don't-care, so flag into the exact fallback.
            miss = jnp.logical_or(miss,
                                  jnp.logical_or(deferA, misalign))
            if pargate:
                miss = jnp.logical_or(miss, par_oob)
        flags_n = flags | jnp.where(miss, FLAG_WINDOW_MISS, 0)

        st_new = (tp_f, tf_f, prev_f, pp_n, pf_n, perr_n, updown_n,
                  gain2, bre2, bim2, inphase1, locked_n, lonce_out,
                  slot_f, t2, flags_n)
        if "dumpc" in _ablate:    # timing/diag probe: export window coords
            out = ((tauA - base_j).astype(jnp.float32),
                   (tauB - base_j).astype(jnp.float32),
                   firedA.astype(jnp.int32) + 2 * firedB.astype(jnp.int32),
                   lonce_out)
        else:
            out = (sym_re, sym_im, do_update.astype(jnp.int32), lonce_out)
        return st_new, out

    return step


def _load_states(fs_ref, is_ref):
    return (fs_ref[F_TPHASE], fs_ref[F_TFREQ], fs_ref[F_TPREV],
            fs_ref[F_PPHASE], fs_ref[F_PFREQ], fs_ref[F_PERR],
            fs_ref[F_UPDOWN], fs_ref[F_GAIN], fs_ref[F_BIASRE],
            fs_ref[F_BIASIM], fs_ref[F_INPHASE], is_ref[I_LOCKED],
            is_ref[I_LOCKED_ONCE], is_ref[I_SLOT], is_ref[I_TICK],
            is_ref[I_FLAGS])


def _store_states(fs_ref, is_ref, st):
    (tp, tf, prev, pp, pf, perr, updown, gain, bias_re, bias_im,
     inphase, locked, lonce, slot, t, flags) = st
    fs_ref[F_TPHASE] = tp
    fs_ref[F_TFREQ] = tf
    fs_ref[F_TPREV] = prev
    fs_ref[F_PPHASE] = pp
    fs_ref[F_PFREQ] = pf
    fs_ref[F_PERR] = perr
    fs_ref[F_UPDOWN] = updown
    fs_ref[F_GAIN] = gain
    fs_ref[F_BIASRE] = bias_re
    fs_ref[F_BIASIM] = bias_im
    fs_ref[F_INPHASE] = inphase
    is_ref[I_LOCKED] = locked
    is_ref[I_LOCKED_ONCE] = lonce
    is_ref[I_SLOT] = slot
    is_ref[I_TICK] = t
    is_ref[I_FLAGS] = flags


def _make_tiles(R, B, K_eff, W, table_ref, k0=0):
    kiota = jax.lax.broadcasted_iota(jnp.int32, (K_eff, R, B), 0)
    ksB = (kiota + 1 + k0).astype(jnp.float32)
    wc = jax.lax.broadcasted_iota(jnp.int32, (W, R, B), 0)
    # Interior tanh rows only (see _lut_tanh_rows saturation split).
    tiota = (jax.lax.broadcasted_iota(jnp.int32, (_N_INNER, R, B), 0)
             + _SAT_LO)
    table_col = table_ref[_SAT_LO:_SAT_HI, :][:, None, :]  # (_N_INNER,1,B)
    return kiota, ksB, wc, tiota, table_col


def _assemble_outs(res, S, batch, oqpsk) -> BlockOutput:
    """Kernel results -> BlockOutput (batch, S[+1]): per-step rows
    truncated to S, with the OQPSK completion pre-fire's symbol prepended
    (stream order: the pre-fire is the block's first fire)."""
    sym_re, sym_im, valid, lonce = (a[:S] for a in res[:4])
    if oqpsk:
        psr, psi, pv, plo = res[4], res[5], res[6], res[7]
        cat = lambda p, a: jnp.concatenate([p, a], axis=0)
        sym_re, sym_im = cat(psr, sym_re), cat(psi, sym_im)
        valid, lonce = cat(pv, valid), cat(plo, lonce)
    n = sym_re.shape[0]
    tr = lambda a: a.transpose(1, 2, 0).reshape(batch, n)
    return BlockOutput(sym_re=tr(sym_re), sym_im=tr(sym_im),
                       valid=tr(valid), locked_once=tr(lonce))


def _kernel_prefire(cfg, R, B, pre_step, tiles, fs_ref, is_ref,
                    wre0, wim0, base0, pre_sr, pre_si, pre_v, pre_l):
    """OQPSK block-entry completion pre-fire (see scan.py demod_block): a
    symbol split across the block boundary left slot==2; run one masked
    single-fire transaction so the paired scan enters aligned, and emit
    its symbol into the dedicated (1, R, B) pre-output row. A deferred
    completion leaves slot==2 and flags (alignment invariant broken —
    oracle fallback recomputes)."""
    st0 = _load_states(fs_ref, is_ref)
    pend = st0[13] == 2
    st1, outp = pre_step(st0, tiles, wre0, wim0, base0, True)
    stm = tuple(jnp.where(pend, a, b) for a, b in zip(st1, st0))
    flags = stm[15] | jnp.where(jnp.logical_and(pend, stm[13] == 2),
                                FLAG_WINDOW_MISS, 0)
    _store_states(fs_ref, is_ref, stm[:15] + (flags,))
    pre_sr[0] = jnp.where(pend, outp[0], _F32(0.0))
    pre_si[0] = jnp.where(pend, outp[1], _F32(0.0))
    pre_v[0] = outp[2] * pend.astype(jnp.int32)
    pre_l[0] = jnp.where(pend, outp[3], st0[12])


def _make_kernel(cfg: DemodConfig, R: int, B: int, G: int,
                 tanh_table: np.ndarray, locked: bool = False) -> Callable:
    """Kernel processing G symbol steps per grid iteration for R*B streams,
    consuming prematerialized (G, W, R, B) window tiles.

    Grouping amortizes the per-grid-step costs (window-tile DMA issue,
    output-block bookkeeping) that dominate over the arithmetic; loop states
    live in registers across the G inner steps and touch VMEM scratch once
    per grid iteration. Grid steps past S pad the grid to a multiple of G
    and are dead (`live` masks every effect), so the decision trajectory is
    identical to the per-step scan path.

    locked=True uses the narrow window + offset gate (_geom) and the
    ALL-FIRE speculative step bodies for the first cfg.steps_always_fire
    steps (every in-envelope stream provably fires there — see the spec
    notes on _make_step/_make_paired_step_tiles): the grid splits into
    three exclusive pl.when arms — s == 0 (entry prologue: QPSK full-gate
    step 0 / OQPSK completion pre-fire, then speculative steps), the
    speculative middle grids, and the gated tail grids (block-end
    non-fires and the dead grid padding). Each arm loads/stores the VMEM
    state once.
    """
    k0, K, W, _ = _geom(cfg, locked)
    S = cfg.steps_per_block
    S_pad = -(-S // G) * G
    n_grid = S_pad // G
    block_ticks = cfg.block_ticks
    oqpsk = cfg.oqpsk
    make_paired = _make_paired_step_tiles
    pair_sl = cfg.locked_pair_slices if locked else None
    step = (make_paired(cfg, R, B, W, slices=pair_sl) if oqpsk
            else _make_step(cfg, R, B, W, k0))
    pre_step = _make_step(cfg, R, B, W) if oqpsk else None
    entry_step = _make_step(cfg, R, B, W) if locked and not oqpsk else None
    # Speculative middle-grid bound: spec arms cover grids [0, s_spec);
    # the last grid is always gated (block-end non-fires + dead padding).
    # METEOR_DEMOD_SPEC=0 disables the all-fire arms (A/B benching).
    s_spec = (min(cfg.steps_always_fire // G, n_grid - 1)
              if locked and os.environ.get("METEOR_DEMOD_SPEC") != "0"
              else 0)
    pg = (oqpsk and R == 1
          and os.environ.get("METEOR_DEMOD_PARGATE") == "1")
    ks = cfg.gate_spec_bounds if (locked and not pg) else None
    spec_step = ((make_paired(cfg, R, B, W, spec=True, slices=pair_sl,
                              pargate=pg, kspec=ks)
                  if oqpsk
                  else _make_step(cfg, R, B, W, k0, spec=True, kspec=ks))
                 if s_spec > 0 else None)
    # Step 0 enters at an arbitrary phase offset, outside pargate's kA
    # bound and the spec-gate shrink — it runs the full-gate serial spec
    # body with FULL-K tiles (see _make_paired_step_tiles).
    spec_step_entry = (make_paired(cfg, R, B, W, spec=True, slices=pair_sl)
                       if s_spec > 0 and oqpsk and (pg or ks is not None)
                       else None)
    if ks is not None:
        k0s, Ks = ks
    else:
        k0s, Ks = k0, cfg.gate_candidates - k0

    def kernel(*refs):
        if oqpsk:
            (base_ref, wre_ref, wim_ref, fin_ref, iin_ref, table_ref,
             symre_ref, symim_ref, valid_ref, lout_ref,
             pre_sr, pre_si, pre_v, pre_l,
             fout_ref, iout_ref, fs_ref, is_ref) = refs
        else:
            (base_ref, wre_ref, wim_ref, fin_ref, iin_ref, table_ref,
             symre_ref, symim_ref, valid_ref, lout_ref,
             fout_ref, iout_ref, fs_ref, is_ref) = refs
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            fs_ref[...] = fin_ref[...]
            is_ref[...] = iin_ref[...]
            if oqpsk:
                _kernel_prefire(cfg, R, B, pre_step,
                                _make_tiles(R, B, K, W, table_ref),
                                fs_ref, is_ref, wre_ref[0], wim_ref[0],
                                base_ref[0], pre_sr, pre_si, pre_v, pre_l)
            elif entry_step is not None:
                st0 = _load_states(fs_ref, is_ref)
                st1, out0 = entry_step(
                    st0, _make_tiles(R, B, K, W, table_ref),
                    wre_ref[0], wim_ref[0], base_ref[0], True)
                _store_states(fs_ref, is_ref, st1)
                (symre_ref[0], symim_ref[0], valid_ref[0],
                 lout_ref[0]) = out0

        def run_group(body, j0=0):
            st = _load_states(fs_ref, is_ref)
            for j in range(j0, G):
                st, out = body(st, j)
                symre_ref[j], symim_ref[j], valid_ref[j], lout_ref[j] = out
            _store_states(fs_ref, is_ref, st)

        if spec_step is not None:
            tiles_s = _make_tiles(R, B, Ks, W, table_ref, k0s)
            spec_body = lambda st, j: spec_step(
                st, tiles_s, wre_ref[j], wim_ref[j], base_ref[j], True)
            spec_body_entry = lambda st, j: (
                spec_step_entry(st, _make_tiles(R, B, K, W, table_ref),
                                wre_ref[j], wim_ref[j], base_ref[j], True)
                if spec_step_entry is not None and j == 0
                else spec_step(st, tiles_s, wre_ref[j], wim_ref[j],
                               base_ref[j], True))

            @pl.when(s == 0)
            def _():
                # Step 0 ran in the prologue (QPSK entry / OQPSK pre-fire
                # alignment); OQPSK's own step 0 is a normal paired step
                # (serial-gate body under pargate — arbitrary entry phase).
                run_group(spec_body_entry, j0=0 if oqpsk else 1)

            @pl.when(jnp.logical_and(s > 0, s < s_spec))
            def _():
                run_group(spec_body)

            @pl.when(s >= s_spec)
            def _():
                tiles = _make_tiles(R, B, K - k0, W, table_ref, k0)
                run_group(lambda st, j: step(
                    st, tiles, wre_ref[j], wim_ref[j], base_ref[j],
                    (s * G + j) < S))
        else:
            st = _load_states(fs_ref, is_ref)
            tiles = _make_tiles(R, B, K - k0, W, table_ref, k0)

            for j in range(G):
                live = (s * G + j) < S
                if entry_step is not None and j == 0:
                    # Step 0 ran in the entry prologue; keep its output row.
                    live = jnp.logical_and(live, s > 0)
                    st, out = step(st, tiles, wre_ref[j], wim_ref[j],
                                   base_ref[j], live)

                    @pl.when(s > 0)
                    def _(out=out, j=j):
                        (symre_ref[j], symim_ref[j], valid_ref[j],
                         lout_ref[j]) = out
                else:
                    st, out = step(st, tiles, wre_ref[j], wim_ref[j],
                                   base_ref[j], live)
                    (symre_ref[j], symim_ref[j], valid_ref[j],
                     lout_ref[j]) = out

            _store_states(fs_ref, is_ref, st)

        # ---- final iteration: unconsumed-tick flags + carry out ----------
        @pl.when(s == n_grid - 1)
        def _():
            unconsumed = is_ref[I_TICK] < block_ticks
            is_ref[I_FLAGS] = (is_ref[I_FLAGS]
                               | jnp.where(unconsumed, FLAG_UNCONSUMED, 0))
            is_ref[I_TICK] = jnp.zeros((R, B), jnp.int32)
            fout_ref[...] = fs_ref[...]
            iout_ref[...] = is_ref[...]

    return kernel


def _make_dma_demod(cfg: DemodConfig, batch: int, interpret: bool, G: int,
                    tanh_table, banks, locked: bool = False) -> Callable:
    """Wrapper for the DMA-streaming kernel (see _make_kernel_dma)."""
    from ..dsp.fir import polyphase_fir_block_tmajor
    S = cfg.steps_per_block
    B = batch
    S_pad = -(-S // G) * G
    n_grid = S_pad // G
    _, _, W, delta = _geom(cfg, locked)
    T = cfg.block_ticks
    offsets = np.asarray(cfg.window_offsets, dtype=np.int64)      # (S,)
    offsets_pad = np.concatenate(
        [offsets, np.full(S_pad - S, offsets[-1], np.int64)])
    og = offsets_pad.reshape(n_grid, G)
    span = int(W + (og[:, -1] - og[:, 0]).max())
    span = min(-(-span // 8) * 8, T)
    # Per-group span start rows and per-step offsets within the span; the
    # clips shift edge windows inward (strictly wider effective coverage
    # than the gather path's row clamping — a fire outside still flags).
    gstart = np.clip(og[:, 0] - delta, 0, T - span).astype(np.int32)
    offw = np.clip(offsets_pad - delta - np.repeat(gstart, G),
                   0, span - W).astype(np.int32)
    # Grids whose windows the edge clips SHIFTED (static): the paired
    # step's per-transaction select slices assume the unshifted base, so
    # sliced spec bodies only run on shift-free grids (s_slice_hi) — the
    # edge grids keep the full-window bodies.
    shift = (offsets_pad - delta) - (np.repeat(gstart, G) + offw)
    grid_clean = (shift.reshape(n_grid, G) == 0).all(axis=1)
    s_slice_hi = int(np.argmin(grid_clean[1:]) + 1
                     if not grid_clean[1:].all() else n_grid)
    kernel = _make_kernel_dma(cfg, B, G, span, n_grid, locked, s_slice_hi)

    oqpsk = cfg.oqpsk
    pre_specs = ([pl.BlockSpec((1, 1, B), lambda s, g, o: (0, 0, 0))] * 4
                 if oqpsk else [])
    pre_shapes = ([jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1, B), jnp.int32)]
                  if oqpsk else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                   # Ft
            pl.BlockSpec((NF, 1, B), lambda s, g, o: (0, 0, 0)),
            pl.BlockSpec((NI, 1, B), lambda s, g, o: (0, 0, 0)),
            pl.BlockSpec((32, B), lambda s, g, o: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, B), lambda s, g, o: (s, 0, 0)),
            pl.BlockSpec((G, 1, B), lambda s, g, o: (s, 0, 0)),
            pl.BlockSpec((G, 1, B), lambda s, g, o: (s, 0, 0)),
            pl.BlockSpec((G, 1, B), lambda s, g, o: (s, 0, 0)),
        ] + pre_specs + [
            pl.BlockSpec((NF, 1, B), lambda s, g, o: (0, 0, 0)),
            pl.BlockSpec((NI, 1, B), lambda s, g, o: (0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NF, 1, B), jnp.float32),
            pltpu.VMEM((NI, 1, B), jnp.int32),
            pltpu.VMEM((2 * span, 2, B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((S_pad, 1, B), jnp.int32),
        ] + pre_shapes + [
            jax.ShapeDtypeStruct((NF, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((NI, 1, B), jnp.int32),
        ],
        interpret=interpret,
    )
    table_np = np.broadcast_to(
        np.asarray(tanh_table, dtype=np.float32)[:, None], (32, B)).copy()

    banded = locked and cfg.tau0_band is not None
    og0 = og[:, 0].astype(np.int32)
    tpf_ceil = int(np.ceil(cfg.ticks_per_fire))

    def demod(carry: DemodCarry, x: jnp.ndarray):
        xt = x.transpose(1, 0, 2)                        # (L, B, 2)
        tail_t = carry.fir_tail.transpose(1, 0, 2)       # (taps-1, B, 2)
        Ft, new_tail_t = polyphase_fir_block_tmajor(xt, tail_t, banks)
        f_in, i_in = _pack_carry(carry._replace(
            tick=jnp.zeros_like(carry.tick)), 1, B)
        if banded:
            # tau0-banded window base (config.tau0_band): anchor at this
            # DISPATCH's minimum predicted first-fire tick, computed from
            # the carry — gstart/offw are runtime scalar-prefetch inputs,
            # so the band floor costs nothing and the compiled program is
            # shared by every tau0 group. tau0 = ceil((2pi - t_phase) /
            # t_freq) (the scan gate's closed form, QPSK threshold); the
            # -1 slack absorbs the float ceil boundary. A lane outside
            # [t_lo, t_lo + tau0_band] fires outside [0, W) and flags
            # into the exact oracle fallback.
            diff = np.float32(2.0 * np.pi) - carry.t_phase
            tau0 = jnp.ceil(diff / carry.t_freq)
            t_lo = jnp.clip(jnp.min(tau0).astype(jnp.int32) - 1,
                            0, tpf_ceil)
            gs = jnp.clip(jnp.asarray(og0) - delta + t_lo,
                          0, T - span).astype(jnp.int32)
            ow = jnp.clip(jnp.asarray(offsets_pad.astype(np.int32))
                          - delta + t_lo - jnp.repeat(gs, G),
                          0, span - W).astype(jnp.int32)
            res = call(gs, ow, Ft, f_in, i_in, jnp.asarray(table_np))
        else:
            res = call(jnp.asarray(gstart), jnp.asarray(offw), Ft, f_in,
                       i_in, jnp.asarray(table_np))
        f_out, i_out = res[-2:]
        carry1 = _unpack_carry(f_out, i_out,
                               new_tail_t.transpose(1, 0, 2))
        outs = _assemble_outs(res, S, batch, oqpsk)
        return carry1, outs

    return demod


def _make_kernel_dma(cfg: DemodConfig, B: int, G: int, span: int,
                     n_grid: int, locked: bool = False,
                     s_slice_hi: int = 0) -> Callable:
    """Kernel variant that streams the tick-major FIR array itself.

    The gather path materializes (S_pad, W, B) candidate windows host-side
    — ~25x the raw FIR data (W=96 rows per step at ~13-tick step spacing)
    written AND re-read through HBM, which measures 2.5x the kernel's own
    runtime (docs/PERF.md). Here the kernel instead double-buffers a
    (span, 2, B) row span of the FIR array Ft (T, 2, B) per G-step group
    with explicit async copies: consecutive steps' windows overlap almost
    entirely inside a group, so HBM traffic drops to ~span/(G*step) ~ 2x
    the raw FIR data. Each step's (W, B) window is a dynamic row-slice of
    the VMEM span (leading dims are untiled — address math, no relayout).
    Per-group span starts and per-step row offsets are static host numpy,
    delivered via scalar prefetch. locked=True: narrow window + offset
    gate, full-gate entry prologue, and the ALL-FIRE speculative step
    bodies for the leading cfg.steps_always_fire steps in a three-arm
    grid (see _make_kernel)."""
    k0, K, W, _ = _geom(cfg, locked)
    S = cfg.steps_per_block
    block_ticks = cfg.block_ticks
    oqpsk = cfg.oqpsk
    # Unlike the gather path (whose per-ROW clamp keeps the window coord c
    # true at block edges), the DMA span clips SHIFT edge windows inward —
    # so the per-transaction select slices (config.locked_pair_slices)
    # only apply on shift-free grids [1, s_slice_hi) inside the spec
    # region; edge grids (s == 0, the clipped tail, the gated arm) run
    # full-window bodies.
    pair_sl = cfg.locked_pair_slices if locked else None
    step = (_make_paired_step_tiles(cfg, 1, B, W) if oqpsk
            else _make_step(cfg, 1, B, W, k0))
    pre_step = _make_step(cfg, 1, B, W) if oqpsk else None
    entry_step = _make_step(cfg, 1, B, W) if locked and not oqpsk else None
    s_spec = (min(cfg.steps_always_fire // G, n_grid - 1)
              if locked and os.environ.get("METEOR_DEMOD_SPEC") != "0"
              else 0)
    # Parallel gate B for the OQPSK spec bodies (A/B lever, docs/PERF.md):
    # METEOR_DEMOD_PARGATE=1 opts in (and disables the spec-gate shrink —
    # pargate's candidate math assumes the full gate tile).
    pg = oqpsk and os.environ.get("METEOR_DEMOD_PARGATE") == "1"
    # Spec-gate shrink (config.gate_spec_bounds): the all-fire bodies'
    # gate evaluates only the feasible candidate range.
    ks = cfg.gate_spec_bounds if (locked and not pg) else None
    spec_step = ((_make_paired_step_tiles(cfg, 1, B, W, spec=True,
                                          pargate=pg, kspec=ks) if oqpsk
                  else _make_step(cfg, 1, B, W, k0, spec=True, kspec=ks))
                 if s_spec > 0 else None)
    s_sl = min(s_slice_hi, s_spec)
    spec_step_sl = (_make_paired_step_tiles(cfg, 1, B, W, spec=True,
                                            slices=pair_sl, pargate=pg,
                                            kspec=ks)
                    if s_spec > 0 and oqpsk and pair_sl is not None
                    and s_sl > 1 else None)
    # Pargate and the spec-gate shrink both assume a fire interval's
    # phase history, which the block's FIRST paired step lacks (entry at
    # arbitrary phase offset) — OQPSK step 0 runs the full-gate serial
    # spec body with FULL-K tiles.
    spec_step_entry = (_make_paired_step_tiles(cfg, 1, B, W, spec=True)
                       if s_spec > 0 and oqpsk and (pg or ks is not None)
                       else None)
    # Spec-body gate tile geometry (tiles_s): kspec when shrunk, else the
    # offset-gate geometry the spec body inherits.
    if ks is not None:
        k0s, Ks = ks
    else:
        k0s, Ks = k0, cfg.gate_candidates - k0

    def kernel(*refs):
        if oqpsk:
            (gstart_ref, offw_ref, ft_ref, fin_ref, iin_ref, table_ref,
             symre_ref, symim_ref, valid_ref, lout_ref,
             pre_sr, pre_si, pre_v, pre_l,
             fout_ref, iout_ref, fs_ref, is_ref, buf_ref, sem_ref) = refs
        else:
            (gstart_ref, offw_ref, ft_ref, fin_ref, iin_ref, table_ref,
             symre_ref, symim_ref, valid_ref, lout_ref,
             fout_ref, iout_ref, fs_ref, is_ref, buf_ref, sem_ref) = refs
        s = pl.program_id(0)

        def span_copy(i, slot):
            return pltpu.make_async_copy(
                ft_ref.at[pl.ds(gstart_ref[i], span)],
                buf_ref.at[pl.ds(slot * span, span)],
                sem_ref.at[slot])

        @pl.when(s == 0)
        def _():
            fs_ref[...] = fin_ref[...]
            is_ref[...] = iin_ref[...]
            span_copy(0, 0).start()

        @pl.when(s + 1 < n_grid)
        def _():
            span_copy(s + 1, (s + 1) % 2).start()

        slot = jax.lax.rem(s, 2)
        span_copy(s, slot).wait()

        @pl.when(s == 0)
        def _():
            # After the slot-0 span is resident (gstart[0] == 0, so rows
            # [0, W) are the block's first ticks).
            if oqpsk:
                _kernel_prefire(cfg, 1, B, pre_step,
                                _make_tiles(1, B, K, W, table_ref),
                                fs_ref, is_ref,
                                buf_ref[0:W, 0:1, :], buf_ref[0:W, 1:2, :],
                                gstart_ref[0], pre_sr, pre_si, pre_v, pre_l)
            elif entry_step is not None:
                off0 = offw_ref[0]
                st0 = _load_states(fs_ref, is_ref)
                st1, out0 = entry_step(
                    st0, _make_tiles(1, B, K, W, table_ref),
                    buf_ref[pl.ds(off0, W), 0:1, :],
                    buf_ref[pl.ds(off0, W), 1:2, :],
                    gstart_ref[0] + off0, True)
                _store_states(fs_ref, is_ref, st1)
                (symre_ref[0], symim_ref[0], valid_ref[0],
                 lout_ref[0]) = out0

        def window_j(j):
            off = offw_ref[s * G + j]
            rowbase = slot * span + off
            wre = buf_ref[pl.ds(rowbase, W), 0:1, :]     # (W, 1, B)
            wim = buf_ref[pl.ds(rowbase, W), 1:2, :]
            return wre, wim, gstart_ref[s] + off         # scalar tick origin

        def run_group(body, j0=0):
            st = _load_states(fs_ref, is_ref)
            for j in range(j0, G):
                st, out = body(st, j)
                symre_ref[j], symim_ref[j], valid_ref[j], lout_ref[j] = out
            _store_states(fs_ref, is_ref, st)

        if spec_step is not None:
            tiles_s = _make_tiles(1, B, Ks, W, table_ref, k0s)

            def spec_body(st, j):
                wre, wim, base_j = window_j(j)
                return spec_step(st, tiles_s, wre, wim, base_j, True)

            def spec_body_entry(st, j):
                # OQPSK step 0 enters at an arbitrary phase offset: the
                # full-gate serial spec body with FULL-K tiles (neither
                # pargate's kA bound nor the spec-gate shrink holds).
                wre, wim, base_j = window_j(j)
                if spec_step_entry is not None and j == 0:
                    return spec_step_entry(
                        st, _make_tiles(1, B, K, W, table_ref),
                        wre, wim, base_j, True)
                return spec_step(st, tiles_s, wre, wim, base_j, True)

            @pl.when(s == 0)
            def _():
                # Step 0 ran in the prologue (QPSK entry / OQPSK pre-fire
                # alignment); OQPSK's own step 0 is a normal paired step.
                run_group(spec_body_entry, j0=0 if oqpsk else 1)

            if spec_step_sl is not None:
                # Sliced-select spec body on shift-free grids only (the
                # edge clips shift windows; see factory comment).
                def spec_sl_body(st, j):
                    wre, wim, base_j = window_j(j)
                    return spec_step_sl(st, tiles_s, wre, wim, base_j,
                                        True)

                @pl.when(jnp.logical_and(s > 0, s < s_sl))
                def _():
                    run_group(spec_sl_body)

                if s_sl < s_spec:
                    @pl.when(jnp.logical_and(s >= s_sl, s < s_spec))
                    def _():
                        run_group(spec_body)
            else:
                @pl.when(jnp.logical_and(s > 0, s < s_spec))
                def _():
                    run_group(spec_body)

            @pl.when(s >= s_spec)
            def _():
                tiles = _make_tiles(1, B, K - k0, W, table_ref, k0)

                def gated_body(st, j):
                    wre, wim, base_j = window_j(j)
                    return step(st, tiles, wre, wim, base_j,
                                (s * G + j) < S)

                run_group(gated_body)
        else:
            st = _load_states(fs_ref, is_ref)
            tiles = _make_tiles(1, B, K - k0, W, table_ref, k0)

            for j in range(G):
                live = (s * G + j) < S
                wre, wim, base_j = window_j(j)
                if entry_step is not None and j == 0:
                    # Step 0 ran in the entry prologue; keep its output
                    # row.
                    live = jnp.logical_and(live, s > 0)
                    st, out = step(st, tiles, wre, wim, base_j, live)

                    @pl.when(s > 0)
                    def _(out=out, j=j):
                        (symre_ref[j], symim_ref[j], valid_ref[j],
                         lout_ref[j]) = out
                else:
                    st, out = step(st, tiles, wre, wim, base_j, live)
                    (symre_ref[j], symim_ref[j], valid_ref[j],
                     lout_ref[j]) = out

            _store_states(fs_ref, is_ref, st)

        @pl.when(s == n_grid - 1)
        def _():
            unconsumed = is_ref[I_TICK] < block_ticks
            is_ref[I_FLAGS] = (is_ref[I_FLAGS]
                               | jnp.where(unconsumed, FLAG_UNCONSUMED, 0))
            is_ref[I_TICK] = jnp.zeros((1, B), jnp.int32)
            fout_ref[...] = fs_ref[...]
            iout_ref[...] = is_ref[...]

    return kernel


def _pack_carry(carry: DemodCarry, R: int, B: int):
    """DemodCarry (leaves (R*B,)) -> ((NF, R, B) f32, (NI, R, B) i32)."""
    sh = (1, R, B)
    rs = lambda a: a.reshape(sh)
    zf = jnp.zeros(sh, jnp.float32)
    f = jnp.concatenate([
        rs(carry.t_phase), rs(carry.t_freq), rs(carry.t_prev),
        rs(carry.p_phase), rs(carry.p_freq), rs(carry.p_err),
        rs(carry.updown), rs(carry.agc_gain),
        rs(carry.agc_bias_re), rs(carry.agc_bias_im),
        rs(carry.inphase),
    ] + [zf] * (NF - 11), axis=0)
    zi = jnp.zeros(sh, jnp.int32)
    i = jnp.concatenate([
        rs(carry.locked), rs(carry.locked_once), rs(carry.slot),
        rs(carry.tick), rs(carry.flags),
    ] + [zi] * (NI - 5), axis=0)
    return f, i


def _unpack_carry(f, i, fir_tail) -> DemodCarry:
    """(NF, R, B)/(NI, R, B) -> DemodCarry with flat (R*B,) leaves."""
    fl = f.reshape(f.shape[0], -1)
    il = i.reshape(i.shape[0], -1)
    return DemodCarry(
        t_phase=fl[F_TPHASE], t_freq=fl[F_TFREQ], t_prev=fl[F_TPREV],
        p_phase=fl[F_PPHASE], p_freq=fl[F_PFREQ], p_err=fl[F_PERR],
        locked=il[I_LOCKED], locked_once=il[I_LOCKED_ONCE],
        updown=fl[F_UPDOWN], agc_gain=fl[F_GAIN],
        agc_bias_re=fl[F_BIASRE], agc_bias_im=fl[F_BIASIM],
        inphase=fl[F_INPHASE], slot=il[I_SLOT], tick=il[I_TICK],
        fir_tail=fir_tail, flags=il[I_FLAGS])


def make_pallas_batch_demod(cfg: DemodConfig, batch: int,
                            interpret: bool = False,
                            group: int | None = None,
                            lanes: int | None = None,
                            windows: str = "auto",
                            locked: bool = False) -> Callable:
    """Batched block demodulator with the Pallas recurrence kernel.

    Returns demod(carry, x) -> (carry', BlockOutput) where carry leaves have
    a leading (batch,) axis and x is (batch, block_len, 2) float32 — the same
    contract as jax.vmap(make_block_demod(cfg)). `group` symbol steps run
    per grid iteration (see _make_kernel).

    `windows` selects how candidate windows reach the kernel: "gather"
    prematerializes (S_pad, W, batch) tiles host-side (the portable path);
    "dma" streams row spans of the tick-major FIR array with in-kernel
    async copies (~10x less HBM traffic, see _make_kernel_dma); "auto"
    picks dma on TPU, gather elsewhere.

    `lanes` opts into the sublane-packed layout (R = batch/lanes stream
    groups in the sublanes — see the module docstring). Measured on a v5e,
    explicit packing is ~20% SLOWER than the flat layout at every R in
    2..8 (Mosaic already tiles (W, batch) efficiently and the kernel is
    throughput- not occupancy-bound — docs/PERF.md), so the default is the
    flat R=1 layout; the packed path stays for tests and future hardware.

    `locked` selects the LOCKED-mode geometry (narrow candidate window +
    offset gate with an in-step verification guard; _geom): decisions are
    bit-identical to the wide program while they stay inside the locked
    envelope (values agree to cross-program FMA-fusion tolerance, a few
    ULP), and FLAG_WINDOW_MISS routes the block to the
    exact oracle fallback otherwise. Hosts switch to it when every stream
    in the batch is carrier-locked (demod/pipeline.py, parallel/mesh.py).
    """
    cfg.validate()
    from ..dsp.loops import TANH_TABLE
    banks = make_fir_banks(cfg)
    # Default step grouping: G=16 measured best for the LOCKED serving
    # geometry on chip (QPSK 1161->1189 Msamp/s, OQPSK 778->792, hi-fi
    # 717->728; G=32 flat, G=64 worse), G=8 for the wide program (r2
    # sweep: G=16 neutral, G=4 worse). Interpret mode keeps G=8 - the
    # body is unrolled G times and CPU-interpret compile time scales
    # with it.
    if group is None:
        group = 16 if locked and not interpret else 8
    S, G = cfg.steps_per_block, group
    _, _, W, delta = _geom(cfg, locked)
    if windows == "auto":
        # DMA spans need the lane dim aligned to the 128-lane vreg tiling
        # (Mosaic rejects slicing a (span, 2, B) VMEM ref otherwise), so
        # small batches — e.g. the single live stream of the CLI — stay on
        # the gather path.
        windows = os.environ.get("METEOR_DEMOD_WINDOWS") or (
            "dma" if jax.default_backend() == "tpu" and batch % 128 == 0
            else "gather")
    if windows == "dma":
        if lanes is not None:
            raise ValueError("lanes (sublane packing) applies to the "
                             "gather window path only")
        return _make_dma_demod(cfg, batch, interpret, G, TANH_TABLE, banks,
                               locked)
    if lanes is not None:
        if batch % lanes:
            raise ValueError(f"batch {batch} not divisible by lanes {lanes}")
        R, B = batch // lanes, lanes
    else:
        R, B = 1, batch
    S_pad = -(-S // G) * G
    block_ticks = cfg.block_ticks
    offsets = np.asarray(cfg.window_offsets, dtype=np.int32)      # (S,)
    offsets_pad = np.concatenate(
        [offsets, np.full(S_pad - S, offsets[-1], np.int32)])     # (S_pad,)
    # Stream-independent window row indices into the (T, B) FIR array —
    # static, so the extraction is a row-gather with constant indices.
    row_idx = np.clip(offsets_pad[:, None] - delta
                      + np.arange(W, dtype=np.int32)[None, :],
                      0, block_ticks - 1).reshape(-1)             # (S_pad*W,)
    base_np = (offsets_pad - delta).astype(np.int32)              # (S_pad,)
    kernel = _make_kernel(cfg, R, B, G, TANH_TABLE, locked)

    oqpsk = cfg.oqpsk
    pre_specs = ([pl.BlockSpec((1, R, B), lambda s: (0, 0, 0))] * 4
                 if oqpsk else [])
    pre_shapes = ([jax.ShapeDtypeStruct((1, R, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, R, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, R, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, R, B), jnp.int32)]
                  if oqpsk else [])
    grid_spec = pl.GridSpec(
        grid=(S_pad // G,),
        scratch_shapes=[
            pltpu.VMEM((NF, R, B), jnp.float32),
            pltpu.VMEM((NI, R, B), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((G, 1, B), lambda s: (s, 0, 0)),      # base
            pl.BlockSpec((G, W, R, B), lambda s: (s, 0, 0, 0)),  # w_re
            pl.BlockSpec((G, W, R, B), lambda s: (s, 0, 0, 0)),  # w_im
            pl.BlockSpec((NF, R, B), lambda s: (0, 0, 0)),
            pl.BlockSpec((NI, R, B), lambda s: (0, 0, 0)),
            pl.BlockSpec((32, B), lambda s: (0, 0)),   # tanh LUT column
        ],
        out_specs=[
            pl.BlockSpec((G, R, B), lambda s: (s, 0, 0)),
            pl.BlockSpec((G, R, B), lambda s: (s, 0, 0)),
            pl.BlockSpec((G, R, B), lambda s: (s, 0, 0)),
            pl.BlockSpec((G, R, B), lambda s: (s, 0, 0)),
        ] + pre_specs + [
            pl.BlockSpec((NF, R, B), lambda s: (0, 0, 0)),
            pl.BlockSpec((NI, R, B), lambda s: (0, 0, 0)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, R, B), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, R, B), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, R, B), jnp.int32),
            jax.ShapeDtypeStruct((S_pad, R, B), jnp.int32),
        ] + pre_shapes + [
            jax.ShapeDtypeStruct((NF, R, B), jnp.float32),
            jax.ShapeDtypeStruct((NI, R, B), jnp.int32),
        ],
        interpret=interpret,
    )

    fir = jax.vmap(lambda x, tail: polyphase_fir_block(x, tail, banks))
    table_np = np.broadcast_to(
        np.asarray(TANH_TABLE, dtype=np.float32)[:, None], (32, B)).copy()

    def demod(carry: DemodCarry, x: jnp.ndarray):
        F, new_tail = fir(x, carry.fir_tail)       # (batch, L, interp, 2)
        Ft = F.reshape(batch, -1, 2).transpose(1, 0, 2)   # (T, batch, 2)
        # Static row-gather: (S_pad*W, batch) windows, reshaped per step
        # with the stream axis split (R sublane groups, B lanes).
        w_re = jnp.take(Ft[:, :, 0], row_idx,
                        axis=0).reshape(S_pad, W, R, B)
        w_im = jnp.take(Ft[:, :, 1], row_idx,
                        axis=0).reshape(S_pad, W, R, B)

        f_in, i_in = _pack_carry(carry._replace(
            tick=jnp.zeros_like(carry.tick)), R, B)

        # base[s] = offsets[s] - delta, common to all streams.
        base = jnp.broadcast_to(jnp.asarray(base_np)[:, None, None],
                                (S_pad, 1, B))

        res = call(base, w_re, w_im, f_in, i_in, jnp.asarray(table_np))
        f_out, i_out = res[-2:]
        carry1 = _unpack_carry(f_out, i_out, new_tail)
        outs = _assemble_outs(res, S, batch, oqpsk)
        return carry1, outs

    return demod
