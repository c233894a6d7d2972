"""Golden-output tests against the compiled reference demodulator.

Builds dbdexter-dev/meteor_demod from /root/reference (cmake, TUI off), runs
both demodulators over synthesized QPSK/OQPSK fixtures with carrier offset +
noise + DC bias, and scores the int8 soft-symbol streams against each other
(SURVEY.md section 4, item 1 — this is the BASELINE.json correctness metric).

Expected relationship: identical decision structure and near-identical values
(float32 rounding only), with one known divergence — the reference's EOF
flush has an fwrite size/nmemb swap that writes 2*ring_idx bytes (duplicating
stale ring content) where ring_idx are pending (main.c:321-322); we emit the
sane partial ring, so our stream is a prefix-aligned subset at the tail.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig
from meteor_demod_tpu.demod.pipeline import StreamDemodulator, quantize_symbols
from meteor_demod_tpu.io.wav import read_sample_blocks
from meteor_demod_tpu.io.writer import SymbolWriter
from meteor_demod_tpu.sim import synth_psk, write_wav, write_raw

REF_SRC = "/root/reference"
REF_BIN = "/tmp/refbuild/meteor_demod"


@pytest.fixture(scope="session")
def ref_binary():
    if not os.path.exists(REF_BIN):
        if not os.path.exists(os.path.join(REF_SRC, "CMakeLists.txt")):
            pytest.skip("reference source not available")
        if shutil.which("cmake") is None:
            pytest.skip("cmake not available")
        os.makedirs("/tmp/refbuild", exist_ok=True)
        subprocess.run(
            ["cmake", "-DCMAKE_BUILD_TYPE=Release", "-DENABLE_TUI=OFF",
             REF_SRC],
            cwd="/tmp/refbuild", check=True, capture_output=True)
        subprocess.run(["make", "-j4"], cwd="/tmp/refbuild", check=True,
                       capture_output=True)
    return REF_BIN


def run_ours(cfg: DemodConfig, path: str, bps: int, out_path: str) -> np.ndarray:
    """Run our demodulator with the reference's exact I/O semantics
    (32 KiB chunking, lock-gated 512-symbol rings, partial flush)."""
    d = StreamDemodulator(cfg)
    with open(path, "rb") as f:
        if path.endswith(".wav"):
            f.seek(44)
        with open(out_path, "wb") as fo:
            w = SymbolWriter(fo)
            for chunk in read_sample_blocks(f, bps):
                syms = d.process(chunk)
                w.feed(quantize_symbols(syms), syms["locked_once"])
            syms = d.finish()
            w.feed(quantize_symbols(syms), syms["locked_once"])
            w.flush_partial()
    return np.fromfile(out_path, dtype=np.int8)


def run_ref(ref_binary, args, out_path):
    subprocess.run([ref_binary, "-B", "-q", "-o", out_path] + args,
                   check=True, capture_output=True, timeout=120)
    return np.fromfile(out_path, dtype=np.int8)


def score(ref: np.ndarray, ours: np.ndarray, skip_frac=0.2):
    """Prefix-align and compare, skipping the acquisition transient."""
    n = min(len(ref), len(ours))
    assert n > 20000, (len(ref), len(ours))
    a = ref[:n].astype(np.float32)
    b = ours[:n].astype(np.float32)
    s = int(n * skip_frac)
    sign_agree = float(np.mean(np.sign(a[s:]) == np.sign(b[s:])))
    mad = float(np.mean(np.abs(a[s:] - b[s:])))
    return sign_agree, mad


def test_golden_qpsk_wav16(ref_binary, tmp_path):
    x, _ = synth_psk(32000, 230400, carrier_hz=300.0, amplitude=6000.0,
                     snr_db=20.0, seed=11, dc_offset=40 - 25j,
                     timing_offset=0.3)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, [wav], str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400), wav, 16,
                    str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad
    # Symbol counts match up to the reference's EOF double-flush quirk.
    assert abs(len(ref) - len(ours)) <= 2 * 1024


def test_golden_qpsk_raw8(ref_binary, tmp_path):
    # Positive carrier offset: the acquisition sweep walks upward first
    # (pll.c:126-128), so a negative offset would need ~fmax/1e-6 symbols.
    x, _ = synth_psk(32000, 230400, carrier_hz=450.0, amplitude=95.0,
                     snr_db=18.0, seed=12)
    raw = str(tmp_path / "g.raw")
    write_raw(raw, x, 8)
    ref = run_ref(ref_binary, ["-s", "230400", "--bps", "8", raw],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400), raw, 8,
                    str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad


def test_golden_oqpsk(ref_binary, tmp_path):
    x, _ = synth_psk(36000, 240000, symrate=80000.0, oqpsk=True,
                     carrier_hz=200.0, amplitude=6000.0, snr_db=20.0, seed=13)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 240000, 16)
    ref = run_ref(ref_binary, ["-m", "oqpsk", "-r", "80k", wav],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=240000, symrate=80000.0,
                                oqpsk=True), wav, 16, str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.995, sign_agree
    assert mad < 1.0, mad


def test_golden_qpsk_hifi(ref_binary, tmp_path):
    """configs[3]: fir-order 64, oversamp 10 (kernel-bound stress shape)."""
    x, _ = synth_psk(32000, 230400, carrier_hz=250.0, amplitude=6000.0,
                     snr_db=20.0, seed=14)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, ["-f", "64", "-O", "10", wav],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400, rrc_order=64, interp=10),
                    wav, 16, str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad


@pytest.mark.parametrize("bw", [2.0, 4.0])
def test_golden_hifi_pll_bw_sweep(ref_binary, tmp_path, bw):
    """configs[3] 'pll-bw variants' on the hi-fi geometry (fir-order 64,
    oversamp 10, -b 2 / 4), each pinned against the C binary.

    Only INTEGER bandwidths are testable: the reference's human_to_float
    truncates through an int (utils.c:62-83), so `-b 0.5` silently becomes
    bw 0 — zero loop gains, the PLL never locks (verified: at -b 0.5 the
    C binary emits a late false-locked stream uncorrelated with its own
    -b 1 decode, while DemodConfig(pll_bw=0.5) here tracks genuinely —
    its symbol stream correlates perfectly with the bw-1 decode). Our CLI
    reproduces the truncation quirk bit-for-bit (utils.py, tested); the
    sub-1.0 API-only row is measured in bench.py's hifi_pllbw sweep."""
    x, _ = synth_psk(32000, 230400, carrier_hz=250.0, amplitude=6000.0,
                     snr_db=20.0, seed=17)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, ["-f", "64", "-O", "10", "-b", str(bw), wav],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400, rrc_order=64, interp=10,
                                pll_bw=bw),
                    wav, 16, str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad


def test_oqpsk_230p4k_reference_crashes_we_decode(ref_binary, tmp_path):
    """OQPSK at 230.4 ksps — the README's own rtl_sdr capture rate
    (/root/reference/README.md:75) and this framework's production
    serving shape — SEGFAULTS the reference on EVERY input (any seed,
    carrier, default or hi-fi knobs): at osf 2.88 its OQPSK loop state
    blows up to NaN and lut_tanh indexes the table with (int)NaN
    (pll.c:153-158 guards val>15 / val<-16 but NaN falls through both
    compares; AddressSanitizer pins the wild read at pll.c:158 via
    compute_error <- pll_update_estimate <- demod_oqpsk). The golden
    OQPSK parity test above therefore runs at 240 ksps (osf 3.0), where
    the reference is healthy.

    This test pins BOTH sides of the divergence: (a) the upstream crash
    (if a fixed reference ever lands, this assert flips and the combo
    should graduate to a golden comparison), and (b) OUR decode of the
    same recording against the synthesized ground-truth symbols —
    perfect hard-decision correlation modulo the OQPSK gauge group
    (quadrant x conjugate), via full FFT cross-correlation (the lag
    absorbs lock time and pipeline latency)."""
    x, sym = synth_psk(32000, 230400, symrate=80000.0, oqpsk=True,
                       carrier_hz=220.0, amplitude=6000.0, snr_db=20.0,
                       seed=18)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    proc = subprocess.run(
        [ref_binary, "-B", "-q", "-o", str(tmp_path / "ref.s"),
         "-m", "oqpsk", "-r", "80k", wav],
        capture_output=True, timeout=120)
    assert proc.returncode != 0, (
        "reference no longer crashes on OQPSK @ 230.4k — "
        "promote this combo to a golden comparison test")

    ours = run_ours(DemodConfig(samplerate=230400, symrate=80000.0,
                                oqpsk=True),
                    wav, 16, str(tmp_path / "ours.s"))
    tx = (np.sign(sym[:, 0]) + 1j * np.sign(sym[:, 1])).astype(np.complex64)
    z = ours.astype(np.float32).reshape(-1, 2)
    z = (np.sign(z[:, 0]) + 1j * np.sign(z[:, 1])).astype(np.complex64)
    best = 0.0
    for zz in (z, np.conj(z)):
        L = len(tx) + len(zz)
        c = np.abs(np.fft.ifft(np.fft.fft(tx, L)
                               * np.conj(np.fft.fft(zz, L)))) / len(zz)
        best = max(best, float(c.max()))
    # |+-1 +- 1j| symbols: perfect alignment scores 2.0.
    assert best / 2.0 > 0.999, best


def test_golden_qpsk_doppler_ramp(ref_binary, tmp_path):
    """Linear carrier ramp — the moving-satellite regime the reference's
    2nd-order PLL exists for (pll.c:99-106 frequency integrator). 800 Hz/s
    is a stress rate (a real 137 MHz LEO pass peaks ~31 Hz/s; the compressed
    rate sweeps ~355 Hz across this 0.44 s fixture, genuinely exercising the
    integrator against a moving target). Probed empirically: both
    demodulators hold lock through 800 Hz/s and both drop out at the same
    higher rates (~1.2 kHz/s emits a half-length stream on BOTH sides)."""
    x, _ = synth_psk(32000, 230400, carrier_hz=200.0, carrier_ramp_hz_s=800.0,
                     amplitude=6000.0, snr_db=20.0, seed=21)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, [wav], str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400), wav, 16,
                    str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad
    # Both sides kept lock through the ramp (not just the initial ring).
    assert len(ours) > 40000, len(ours)


def test_golden_oqpsk_doppler_ramp(ref_binary, tmp_path):
    """OQPSK under a 400 Hz/s carrier ramp (at 240 ksps where the reference
    is healthy — see the 230.4k crash pin below)."""
    x, _ = synth_psk(36000, 240000, symrate=80000.0, oqpsk=True,
                     carrier_hz=150.0, carrier_ramp_hz_s=400.0,
                     amplitude=6000.0, snr_db=20.0, seed=22)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 240000, 16)
    ref = run_ref(ref_binary, ["-m", "oqpsk", "-r", "80k", wav],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=240000, symrate=80000.0,
                                oqpsk=True), wav, 16, str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad
    assert len(ours) > 50000, len(ours)


def test_golden_leo_pass_profile(ref_binary, tmp_path):
    """Realistic LEO S-curve Doppler (sim.leo_doppler_hz: 820 km Meteor-M
    overhead pass at 137.9 MHz), time-compressed 20x so the 0.46 s fixture
    traverses the closest-approach knee: carrier sweeps +155 -> -155 Hz
    through zero, peak slope ~620 Hz/s (real pass: ±3.4 kHz at ~31 Hz/s).
    Crossing ZERO from above also exercises the sweep-catch on a signal the
    upward-first acquisition (pll.c:126-128) must meet mid-motion."""
    n_sym = 36000
    # Two-step synth: first call sizes the sample grid for the profile.
    x0, _ = synth_psk(n_sym, 230400, carrier_hz=0.0, amplitude=6000.0,
                      snr_db=20.0, seed=23)
    from meteor_demod_tpu.sim import leo_doppler_hz
    prof = leo_doppler_hz(len(x0), 230400, t_ca_s=len(x0) / 230400 / 2,
                          time_scale=20.0)
    x, _ = synth_psk(n_sym, 230400, carrier_hz=0.0, amplitude=6000.0,
                     snr_db=20.0, seed=23, carrier_profile=prof)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, [wav], str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400), wav, 16,
                    str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad
    assert len(ours) > 50000, len(ours)


def test_golden_negative_carrier_sweep_wrap(ref_binary, tmp_path):
    """NEGATIVE carrier offset — the acquisition sweep's worst case: it
    walks upward first (pll.c:126-128), must hit +fmax, flip direction
    (pll.c:128's updown) and come back down. At the default +-3.4 kHz
    band that takes ~12 s of signal, so the fixture shrinks the band with
    -d 500 (freq_max 500 Hz): -350 Hz is then reached after ~1.7 s and
    both demodulators lock late via the SAME wrap trajectory. The long
    cold acquisition accumulates cross-implementation float drift, so the
    two sides may lock in different Costas quadrants (observed: ours one
    quadrant off) — a genuine ambiguity, not a defect — and parity is
    asserted modulo the 4-fold rotation: symbol agreement 1.0 at the best
    quadrant."""
    x, _ = synth_psk(130000, 230400, carrier_hz=-350.0, amplitude=6000.0,
                     snr_db=20.0, seed=61)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, ["-d", "500", wav], str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400,
                                freq_max=500 * 2 * np.pi / 72000.0),
                    wav, 16, str(tmp_path / "ours.s"))
    n = min(len(ref), len(ours)) // 2 * 2
    # Locked only after the wrap: most of the file is pre-lock, the
    # emitted tail is the locked portion.
    assert n > 40000, (len(ref), len(ours))
    za = ref[:n].astype(np.float32).reshape(-1, 2)
    zb = ours[:n].astype(np.float32).reshape(-1, 2)
    za = za[:, 0] + 1j * za[:, 1]
    zb = zb[:, 0] + 1j * zb[:, 1]
    s = int(len(za) * 0.2)
    best_sa, best_mad = 0.0, np.inf
    for k in range(4):
        zr = zb * (1j) ** k
        sa = float(np.mean(
            (np.sign(zr.real[s:]) == np.sign(za.real[s:]))
            & (np.sign(zr.imag[s:]) == np.sign(za.imag[s:]))))
        if sa > best_sa:
            best_sa = sa
            best_mad = float(np.mean(np.abs(zr.real[s:] - za.real[s:])))
    assert best_sa > 0.999, best_sa
    assert best_mad < 0.5, best_mad


def test_acquisition_dead_zone_near_zero_negative(ref_binary, tmp_path):
    """BOTH implementations share an acquisition DEAD ZONE at small
    NEGATIVE carrier offsets (found by the r5 diverse acquisition bench:
    a -195 Hz / 25 dB stream never locked in 68 s while -583 Hz and every
    positive offset locked fine). The upward-first sweep (pll.c:126-128)
    must wrap +fmax and come back, but near-zero negative carriers bias
    the loop's b_p*e term against the sweep so p_freq stalls in a limit
    cycle below +fmax and the wrap never completes. Verified here on 20 s
    of clean signal: the C binary emits only its false-lock ring
    (~1k symbols of 1.44M transmitted) and our demodulator's locked_once
    stays 0 — faithful parity on the failure, not just on success. (The
    r5 fleet is not PINNED by such a stream: the parking policy moves it
    off the hot path, bench fleet_acquisition_diverse; and the opt-in
    sweep rescue — --sweep-rescue / sweep_rescue_s,
    tests/test_sweep_rescue.py — escapes the zone entirely by restarting
    the sweep from +fmax downward, which the reference cannot do.) If
    upstream ever fixes the sweep, the ref assertion flips and this zone
    should be re-characterized."""
    fs = 230400
    x, _ = synth_psk(int(20 * 72000), fs, carrier_hz=-195.3,
                     amplitude=6000.0, snr_db=25.0, seed=40)
    wav = str(tmp_path / "dz.wav")
    write_wav(wav, x, fs, 16)
    ref = run_ref(ref_binary, [wav], str(tmp_path / "ref.s"))
    assert len(ref) <= 4 * 1024, (
        "reference now locks in the near-zero negative dead zone — "
        "re-characterize and fix our acquisition to match")

    import jax
    from meteor_demod_tpu.demod.backend import jit_batch_demod
    from meteor_demod_tpu.demod.state import batch_carry
    from meteor_demod_tpu.dsp.fir import iq_to_f32
    cfg = DemodConfig(samplerate=fs, block_len=8192)
    fn = jit_batch_demod(cfg, 1, "scan")
    carry = batch_carry(cfg, 1)
    n_blocks = len(x) // cfg.block_len
    for b in range(n_blocks):
        blk = iq_to_f32(x[b * cfg.block_len:(b + 1) * cfg.block_len])
        carry, _ = fn(carry, blk[None])
    assert int(np.asarray(carry.locked_once)[0]) == 0, (
        "we lock where the reference does not — behavior diverged")


def test_golden_qpsk_float32(ref_binary, tmp_path):
    """32-bit float WAV samples (wavfile.c:66-68)."""
    x, _ = synth_psk(32000, 230400, carrier_hz=350.0, amplitude=5000.0,
                     snr_db=20.0, seed=15)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 32)
    ref = run_ref(ref_binary, [wav], str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400), wav, 32,
                    str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad


def test_golden_freq_delta_and_pll_bw(ref_binary, tmp_path):
    """-d (max carrier deviation, Hz->rad/sym) and -b (PLL bandwidth):
    both demodulators under non-default loop settings."""
    x, _ = synth_psk(32000, 230400, carrier_hz=500.0, amplitude=6000.0,
                     snr_db=20.0, seed=16)
    wav = str(tmp_path / "g.wav")
    write_wav(wav, x, 230400, 16)
    ref = run_ref(ref_binary, ["-d", "2k", "-b", "2", wav],
                  str(tmp_path / "ref.s"))
    ours = run_ours(DemodConfig(samplerate=230400, pll_bw=2.0,
                                freq_max=2000 * 2 * np.pi / 72000.0),
                    wav, 16, str(tmp_path / "ours.s"))
    sign_agree, mad = score(ref, ours)
    assert sign_agree > 0.999, sign_agree
    assert mad < 0.5, mad
