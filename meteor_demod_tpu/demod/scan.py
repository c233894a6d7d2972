"""The per-symbol scan: timing gate, AGC, Costas PLL, and M&M retiming.

TPU-native restructuring of the reference's per-sample pull pipeline
(demod.c:23-91). Key observations that shape the design:

1. Every feedback state (AGC gain/bias, PLL phase/freq, timing freq, M&M
   prev) mutates ONLY when the timing gate fires — once per symbol for QPSK,
   twice for OQPSK. So the sequential recurrence is per-FIRE, ~16x sparser
   than per-sample-tick.
2. The FIR outputs ("ticks") have no feedback, so a whole block of them is
   computed densely up front (dsp/fir.py).
3. Which tick a scan step consumes is data-dependent but tightly bounded:
   the timing NCO frequency is clamped to center*(1 +- 2**-12) (timing.c:7),
   so fire k of a block lands within a small static window around
   tau0_hat + round(k * ticks_per_fire). We prematerialize those windows as
   scan inputs — the scan body then contains NO dynamic indexing: the fired
   tick is selected from the window by a compare-mask-sum.
4. The timing gate is evaluated in closed form: fire at candidate
   k* = min{k in [1, K] : fl(k*tf) >= fl(thresh - tp)} and advance the phase
   by the SELECTED precomputed product fl(k* * tf) (see
   config.gate_candidates and demod/scalar.py's module docstring). Every op
   is a bare IEEE multiply/subtract/compare/add — no multiply-add pattern —
   so the fire ticks are bit-identical across the numpy oracle, this scan,
   and the Mosaic kernel regardless of FMA contraction. The C binary's
   per-tick accumulation (and double-precision retime) differs by bounded
   rounding; parity with the C program is within the SNR bound (golden
   tests), as for any float32 implementation.

Every step of the scan body is a handful of float32/int32 scalar ops and is
fully vectorizable over a batch axis with vmap (the batched demodulator puts
independent streams — or overlapping time-shards of one stream — in VPU
lanes).
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import DemodConfig
from ..dsp.fir import make_fir_banks, polyphase_fir_block
from ..dsp.sincos import fast_sin, fast_cos
from ..dsp.loops import costas_error, mm_error
from .state import DemodCarry, BlockOutput, FLAG_WINDOW_MISS, FLAG_UNCONSUMED

_F32 = np.float32
_TWO_PI = _F32(2 * np.pi)
_PI = _F32(np.pi)


def _make_symbol_step(cfg: DemodConfig) -> Callable:
    a_t, b_t = cfg.timing_gains
    a_p, b_p = cfg.pll_gains
    t_center = cfg.timing_freq
    t_dev = cfg.timing_dev_max
    fmax = cfg.pll_fmax
    block_ticks = cfg.block_ticks
    K = cfg.gate_candidates
    ks = np.arange(1, K + 1, dtype=np.float32)     # (K,)
    kiota = np.arange(K, dtype=np.int32)           # (K,)
    oqpsk = cfg.oqpsk

    bias_keep = _F32(1.0 - C.AGC_BIAS_POLE)
    bias_pole = _F32(C.AGC_BIAS_POLE)
    gain_pole = _F32(C.AGC_GAIN_POLE)
    agc_target = _F32(C.AGC_TARGET)
    err_keep = _F32(1.0 - C.ERR_POLE)
    err_pole = _F32(C.ERR_POLE)
    sweep = _F32(C.SWEEP_STEP)

    def step(carry: DemodCarry, xs):
        w_re, w_im, w_idx = xs  # (W,) f32, (W,) f32, (W,) int32 tick ids

        # ---- closed-form timing gate (see module docstring item 4) ---------
        t = carry.tick
        tp = carry.t_phase
        tf = carry.t_freq
        if oqpsk:
            thresh = carry.slot.astype(jnp.float32) * _PI
        else:
            thresh = _TWO_PI
        diff = thresh - tp
        rem = block_ticks - t
        prod = ks * tf                                  # (K,)
        ok = jnp.logical_and(prod >= diff,
                             ks <= rem.astype(jnp.float32))
        fired = jnp.any(ok)
        k_idx = jnp.where(fired, jnp.argmax(ok).astype(jnp.int32),
                          jnp.minimum(rem, K) - 1)
        # Phase advances by the SELECTED product — never a fresh mul+add,
        # so no FMA can change the rounding.
        prod_sel = jnp.sum(jnp.where(kiota == k_idx, prod, _F32(0.0)))
        tau = t + k_idx
        tp = tp + prod_sel
        t = t + k_idx + 1

        # ---- select the fired tick's FIR output from the window ------------
        sel = jnp.logical_and(w_idx == tau, fired)
        z_re = jnp.sum(jnp.where(sel, w_re, jnp.zeros_like(w_re)))
        z_im = jnp.sum(jnp.where(sel, w_im, jnp.zeros_like(w_im)))
        miss = jnp.logical_and(fired, ~jnp.any(sel))

        # ---- AGC (agc.c:12-25) ---------------------------------------------
        bias_re = carry.agc_bias_re * bias_keep + bias_pole * z_re
        bias_im = carry.agc_bias_im * bias_keep + bias_pole * z_im
        zr = (z_re - bias_re) * carry.agc_gain
        zi = (z_im - bias_im) * carry.agc_gain
        mag = jnp.sqrt(zr * zr + zi * zi)
        gain = carry.agc_gain + gain_pole * (agc_target - mag)
        gain = jnp.maximum(_F32(0.0), gain)

        # ---- PLL mix (pll.c:50-97): NCO rotate, one phase advance per fire -
        s = fast_sin(-carry.p_phase)
        cs = fast_cos(-carry.p_phase)
        mre = zr * cs - zi * s
        mim = zr * s + zi * cs
        pp = carry.p_phase + carry.p_freq
        pp = jnp.where(pp >= _TWO_PI, pp - _TWO_PI, pp)

        # ---- assemble the symbol -------------------------------------------
        if oqpsk:
            # Slot 1 stores I at the half-symbol point; slot 2 completes the
            # symbol with Q and runs the loop updates (demod.c:62-87).
            is1 = carry.slot == 1
            fire1 = jnp.logical_and(fired, is1)
            do_update = jnp.logical_and(fired, ~is1)
            inphase = jnp.where(fire1, mre, carry.inphase)
            sym_re = carry.inphase
            sym_im = mim
            slot = jnp.where(fired,
                             jnp.where(is1, jnp.full_like(carry.slot, 2),
                                       jnp.ones_like(carry.slot)),
                             carry.slot)
        else:
            do_update = fired
            inphase = carry.inphase
            sym_re = mre
            sym_im = mim
            slot = carry.slot

        # ---- M&M retiming (timing.c:59-95) ----------------------------------
        err_t = mm_error(carry.t_prev, sym_im)
        prev_new = jnp.where(do_update, sym_im, carry.t_prev)
        tp_upd = tp - (_TWO_PI + a_t * err_t)
        fd = jnp.clip((tf - t_center) - b_t * err_t, -t_dev, t_dev)
        tf_upd = t_center + fd
        tp = jnp.where(do_update, tp_upd, tp)
        tf = jnp.where(do_update, tf_upd, tf)

        # ---- Costas update: loop filter, lock detect, sweep (pll.c:99-130) --
        e = costas_error(sym_re, sym_im)
        pp_upd = jnp.fmod(pp + a_p * e, _TWO_PI)
        pf = carry.p_freq + b_p * e
        err_upd = carry.p_err * err_keep + jnp.abs(e) * err_pole
        lock_now = jnp.logical_and(err_upd < _F32(C.LOCK_THRESH),
                                   carry.locked == 0)
        unlock_now = jnp.logical_and(err_upd > _F32(C.UNLOCK_THRESH),
                                     carry.locked == 1)
        locked_upd = jnp.where(lock_now, jnp.ones_like(carry.locked),
                               jnp.where(unlock_now,
                                         jnp.zeros_like(carry.locked),
                                         carry.locked))
        locked_once_upd = jnp.maximum(carry.locked_once,
                                      lock_now.astype(jnp.int32))
        pf = jnp.where(locked_upd == 0, pf + sweep * carry.updown, pf)
        updown_upd = jnp.where(pf >= fmax, _F32(-1.0),
                               jnp.where(pf <= -fmax, _F32(1.0), carry.updown))
        pf = jnp.clip(pf, -fmax, fmax)

        # ---- gate state writes ----------------------------------------------
        new = DemodCarry(
            t_phase=tp,
            t_freq=tf,
            t_prev=prev_new,
            p_phase=jnp.where(do_update, pp_upd,
                              jnp.where(fired, pp, carry.p_phase)),
            p_freq=jnp.where(do_update, pf, carry.p_freq),
            p_err=jnp.where(do_update, err_upd, carry.p_err),
            locked=jnp.where(do_update, locked_upd, carry.locked),
            locked_once=jnp.where(do_update, locked_once_upd,
                                  carry.locked_once),
            updown=jnp.where(do_update, updown_upd, carry.updown),
            agc_gain=jnp.where(fired, gain, carry.agc_gain),
            agc_bias_re=jnp.where(fired, bias_re, carry.agc_bias_re),
            agc_bias_im=jnp.where(fired, bias_im, carry.agc_bias_im),
            inphase=inphase,
            slot=slot,
            tick=t,
            fir_tail=carry.fir_tail,
            flags=carry.flags | jnp.where(miss, FLAG_WINDOW_MISS, 0),
        )
        out = BlockOutput(
            sym_re=sym_re,
            sym_im=sym_im,
            valid=do_update.astype(jnp.int32),
            locked_once=jnp.where(do_update, locked_once_upd,
                                  carry.locked_once),
        )
        return new, out

    return step


def make_block_demod(cfg: DemodConfig) -> Callable:
    """Build demod_block(carry, x_block) -> (carry', BlockOutput).

    Single-stream; batch with jax.vmap. Pure function of (carry, block), so
    any block can be deterministically recomputed (free checkpoint/resume and
    retry semantics).
    """
    cfg.validate()
    # Closure constants stay numpy: jnp constants would live on the default
    # device and some PJRT backends cannot copy them back for embedding at
    # trace time (device->host transfer of trace constants is Unimplemented
    # on the axon TPU plugin).
    banks = make_fir_banks(cfg)
    step = _make_symbol_step(cfg)
    S = cfg.steps_per_block
    W = cfg.window
    delta = cfg.window_delta
    offsets = np.asarray(cfg.window_offsets)           # (S,)
    win_range = np.arange(W, dtype=np.int32)           # (W,)
    block_ticks = cfg.block_ticks
    if cfg.oqpsk:
        thresh0 = lambda slot: slot.astype(jnp.float32) * _PI
    else:
        thresh0 = lambda slot: jnp.full_like(slot, _TWO_PI, dtype=jnp.float32)

    def demod_block(carry: DemodCarry, x_block: jnp.ndarray):
        """x_block: (L, 2) float32 re/im pairs."""
        F, new_tail = polyphase_fir_block(x_block, carry.fir_tail, banks)
        F_flat = F.reshape(-1, 2)                      # (ticks, 2) tick-ordered

        # Predicted first fire tick from the carried NCO state.
        th0 = thresh0(carry.slot)
        tau0 = jnp.ceil((th0 - carry.t_phase) / carry.t_freq) - 1
        tau0 = jnp.maximum(0, tau0).astype(jnp.int32)
        idx = tau0 + offsets[:, None] - delta + win_range[None, :]  # (S, W)
        cidx = jnp.clip(idx, 0, block_ticks - 1)
        w_re = jnp.take(F_flat[:, 0], cidx, axis=0)
        w_im = jnp.take(F_flat[:, 1], cidx, axis=0)

        carry0 = carry._replace(tick=jnp.zeros_like(carry.tick))
        carry1, outs = jax.lax.scan(step, carry0, (w_re, w_im, idx))

        unconsumed = carry1.tick < block_ticks
        carry1 = carry1._replace(
            tick=jnp.zeros_like(carry1.tick),
            fir_tail=new_tail,
            flags=carry1.flags | jnp.where(unconsumed, FLAG_UNCONSUMED, 0),
        )
        return carry1, outs

    return demod_block


@functools.lru_cache(maxsize=16)
def jit_batch_block_demod(cfg: DemodConfig) -> Callable:
    """Cached batched (vmapped over leading axis) jitted block demodulator."""
    return jax.jit(jax.vmap(make_block_demod(cfg)))
