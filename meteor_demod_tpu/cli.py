"""Command-line frontend with the reference's exact flag surface.

Replicates main.c's getopt_long interface and semantics (main.c:19,35-51,
82-198): same short/long options, human_to_float suffix parsing, `--stdout`
implying batch+quiet, stdin forcing batch mode, WAV-header autodetection with
raw fallback, default LRPT_<datetime>.s output name, and the batch status
line format (main.c:247-263). Unknown `-m` values silently keep QPSK
(main.c:103-105).

The worker/UI split (worker pthread main.c:218 + status loop main.c:221-267)
maps to a Python worker thread running the jitted block demodulator while the
main thread renders status — the TPU does the DSP, so the GIL is idle.
"""

from __future__ import annotations

import getopt
import sys
import threading

import numpy as np

from . import __version__
from .config import DemodConfig
from .demod.pipeline import StreamDemodulator, quantize_symbols
from .io.wav import open_input, read_sample_blocks
from .io.writer import SymbolWriter
from .utils import gen_fname, human_to_float

SHORTOPTS = "Bb:d:f:hm:o:O:qR:r:s:S:T:v"
LONGOPTS = [
    "batch", "pll-bw=", "freq-delta=", "fir-order=", "help", "mode=",
    "output=", "oversamp=", "quiet", "refresh-rate=", "symrate=", "stdout",
    "samplerate=", "bps=", "version", "turbo=", "checkpoint=",
    "sweep-rescue=",
]

USAGE = """Usage: {pname} [options] file_in
   -B, --batch             Disable TUI and all control characters (aka "script-friendly mode")
   -m, --mode <mode>       Specify the signal modulation scheme (default: qpsk, valid modes: qpsk, oqpsk)
   -o, --output <file>     Output decoded symbols to <file>
   -q, --quiet             Do not print status information
   -r, --symrate <rate>    Set the symbol rate to <rate> (default: 72000)
   -R, --refresh-rate <ms> Refresh the status screen every <ms> ms (default: 50ms in TUI mode, 2000ms in batch mode)
   -s, --samplerate <samp> Force the input samplerate to <samp> (default: auto)
       --bps <bps>         Force the input bits per sample to <bps> (default: 16)
       --stdout            Write output symbols to stdout (implies -B, -q)

   -h, --help              Print this help screen
   -v, --version           Print version info

Advanced options:
   -b, --pll-bw <bw>       Set the PLL bandwidth to <bw> (default: 1)
   -d, --freq-delta <freq> Set the maximum carrier deviation to <freq> (default: +-3.5kHz)
   -f, --fir-order <ord>   Set the RRC filter order to <ord> (default: 32)
   -O, --oversamp <mult>   Set the interpolation factor to <mult> (default: 5)

TPU extensions (not in the reference):
   -T, --turbo <chunks>    Offline chunk-parallel demodulation of the whole
                           file across <chunks> batch lanes (0 picks the
                           chunk count automatically). Decision-exact when
                           the fixpoint converges; a non-converged run
                           resumes the exact sequential path from the last
                           verified chunk boundary (worst case: the whole
                           file sequentially). With stdin input the same
                           machinery applies to buffered spans: input
                           BUFFERS until a span fills (~18 s of live
                           230 ksps input per span at the defaults — the
                           -T latency trade vs the per-block live path),
                           while the span programs pre-compile in the
                           background (~6 s, hidden behind the buffering),
                           so each span's output latency is data-dependent
                           only
       --checkpoint <file> Resume the demodulator state from <file> if it
                           exists and save the state there at EOF: split
                           captures (e.g. rtl_sdr segments of one pass)
                           demodulate as ONE continuous stream — the
                           concatenated .s outputs are decision-identical
                           to a single-file run (exact carry resume; int8
                           levels within cross-program loop noise, the -T
                           contract). Split at 32 KiB multiples: the
                           ingest drops partial trailing chunks
                           (reference parity). Not combinable with -T
       --sweep-rescue <s>  Escape the acquisition sweep's dead zone: after
                           <s> seconds of unlocked signal, restart the
                           sweep from +fmax downward (a full downward
                           pass captures every in-range carrier; the
                           reference's upward-first sweep measurably
                           stalls near small negative offsets and never
                           locks — pll.c:109-130). 0 (default) disables
                           the kick for exact reference acquisition
                           behavior
"""


def usage(pname: str) -> None:
    sys.stderr.write(USAGE.format(pname=pname))


def _atoi(s: str) -> int:
    """C atoi: parse leading integer, 0 on failure."""
    s = s.strip()
    out = ""
    for i, ch in enumerate(s):
        if ch.isdigit() or (ch in "+-" and i == 0):
            out += ch
        else:
            break
    try:
        return int(out)
    except ValueError:
        return 0


class Options:
    def __init__(self):
        self.pll_bw = 1.0
        self.rrc_order = 32
        self.interp_factor = 5
        self.quiet = False
        self.symrate = 72000.0
        self.freq_max_delta = -1.0
        self.oqpsk = False
        self.batch = False
        self.update_interval = -1
        self.bps = 0
        self.samplerate = -1
        self.stdout_mode = False
        self.output_fname = None
        self.input_path = None
        self.turbo_chunks: int | None = None     # None = off, 0 = auto
        self.checkpoint_path: str | None = None
        self.sweep_rescue_s = 0.0                # 0 = off (ref parity)


def parse_args(argv: list[str]) -> Options | int:
    """Returns Options, or an int exit code for -h/-v/errors."""
    pname = argv[0] if argv else "meteor_demod"
    opts = Options()
    try:
        parsed, rest = getopt.getopt(argv[1:], SHORTOPTS, LONGOPTS)
    except getopt.GetoptError:
        usage(pname)
        return 1
    for flag, val in parsed:
        if flag == "--stdout":
            opts.stdout_mode = True
        elif flag in ("-b", "--pll-bw"):
            opts.pll_bw = human_to_float(val)
        elif flag in ("-B", "--batch"):
            opts.batch = True
        elif flag in ("-d", "--freq-delta"):
            opts.freq_max_delta = human_to_float(val)
        elif flag in ("-f", "--fir-order"):
            opts.rrc_order = _atoi(val)
        elif flag in ("-h", "--help"):
            usage(pname)
            return 0
        elif flag in ("-m", "--mode"):
            if val == "oqpsk":           # anything else keeps QPSK
                opts.oqpsk = True
        elif flag in ("-o", "--output"):
            opts.output_fname = val
        elif flag in ("-O", "--oversamp"):
            opts.interp_factor = _atoi(val)
        elif flag in ("-q", "--quiet"):
            opts.quiet = True
        elif flag in ("-R", "--refresh-rate"):
            opts.update_interval = _atoi(val)
        elif flag in ("-r", "--symrate"):
            opts.symrate = human_to_float(val)
        elif flag in ("-s", "--samplerate"):
            opts.samplerate = int(human_to_float(val))
        elif flag in ("-S", "--bps"):
            opts.bps = _atoi(val)
        elif flag in ("-T", "--turbo"):
            opts.turbo_chunks = _atoi(val)
        elif flag == "--checkpoint":
            opts.checkpoint_path = val
        elif flag == "--sweep-rescue":
            opts.sweep_rescue_s = human_to_float(val)
        elif flag in ("-v", "--version"):
            sys.stderr.write(f"meteor_demod_tpu v{__version__}\n")
            return 0

    # Hz -> rad/symbol (main.c:136); negative keeps the pll default. A zero
    # symrate is caught later by DemodConfig.validate with a clean error.
    if opts.symrate > 0:
        opts.freq_max_delta = opts.freq_max_delta * 2 * np.pi / opts.symrate

    if not rest:
        usage(pname)
        return 1
    opts.input_path = rest[0]

    if opts.output_fname is None:
        opts.output_fname = gen_fname()
    if opts.update_interval < 0:
        opts.update_interval = 2000 if opts.batch else 50
    if opts.stdout_mode:
        opts.batch = True
        opts.quiet = True
    return opts


class DemodRunner:
    """Worker-side demod loop shared by batch and TUI frontends
    (thread_process, main.c:284-329)."""

    def __init__(self, opts: Options, demod: StreamDemodulator,
                 samples_file, soft_file, bps: int, file_len: int):
        self.opts = opts
        self.demod = demod
        self.samples_file = samples_file
        self.writer = SymbolWriter(soft_file)
        self.bps = bps
        self.file_len = file_len
        self.bytes_read = 0
        self.done = threading.Event()
        self.stop = threading.Event()

    def run(self) -> None:
        # File input: accumulate chunks up to one chained-dispatch span so
        # the stream driver's multi-block fast path engages. Live stdin keeps
        # per-chunk delivery — batching would add ~0.3 s of latency to the
        # symbol stream and telemetry (the reference's own buffering is one
        # 32 KiB read, ~36 ms).
        if self.opts.input_path == "-":
            span = 1
        else:
            span = self.demod.cfg.block_len * self.demod.chain_blocks
        buf = []
        buffered = 0
        try:
            for chunk in read_sample_blocks(self.samples_file, self.bps):
                if self.stop.is_set():
                    break
                self.bytes_read += len(chunk) * 2 * self.bps // 8
                buf.append(chunk)
                buffered += len(chunk)
                if buffered >= span:
                    self._emit(self.demod.process(np.concatenate(buf)))
                    buf, buffered = [], 0
            if buf:
                self._emit(self.demod.process(np.concatenate(buf)))
            self._emit(self.demod.finish())
            self.writer.flush_partial()
        finally:
            self.done.set()

    def _emit(self, symbols: np.ndarray) -> None:
        if len(symbols):
            self.writer.feed(quantize_symbols(symbols),
                             symbols["locked_once"])

    # -- status values (main.c:231-232, 250-258) ----------------------------
    def progress_pct(self) -> float:
        if not self.file_len:
            return 0.0
        return 100.0 * self.bytes_read / self.file_len

    def status_tuple(self):
        d = self.demod
        return (self.progress_pct(), d.carrier_freq_hz(), d.symbol_rate_hz(),
                d.pll_locked)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv) if argv is None else argv
    # Backend override (e.g. METEOR_DEMOD_PLATFORM=cpu to demodulate without
    # a TPU). Applied through the config API because some environments pin
    # jax_platforms at interpreter start, overriding the JAX_PLATFORMS env.
    import os
    import jax
    platform = os.environ.get("METEOR_DEMOD_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # Persistent compilation cache: demod programs are identical across
    # invocations, and (remote) TPU compiles can take minutes.
    if not jax.config.jax_compilation_cache_dir:
        cache = os.environ.get(
            "METEOR_DEMOD_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "meteor_demod_tpu", "jax"))
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except OSError:
            pass        # unwritable HOME: run without the persistent cache
    opts = parse_args(argv)
    if isinstance(opts, int):
        return opts

    try:
        samples_file, info, is_stdin = open_input(opts.input_path)
    except OSError:
        sys.stderr.write("Could not open input file\n")
        return 1
    if is_stdin:
        opts.batch = True                      # main.c:155-157
    samplerate, bps = opts.samplerate, opts.bps
    if info is not None:
        samplerate, bps = info.samplerate, info.bps
    if samplerate < 0:
        sys.stderr.write("Could not auto-detect sample rate. "
                         "Please specify it with -s <samplerate>\n")
        usage(argv[0])
        return 1
    if not bps:
        sys.stderr.write("Could not auto-detect bits per sample, "
                         "assuming 16\n")
        bps = 16

    if opts.stdout_mode:
        soft_file = sys.stdout.buffer
    else:
        try:
            soft_file = open(opts.output_fname, "wb")
        except OSError:
            sys.stderr.write("Could not open output file\n")
            return 1

    cfg = DemodConfig(
        samplerate=samplerate, symrate=opts.symrate,
        interp=opts.interp_factor, rrc_order=opts.rrc_order,
        pll_bw=opts.pll_bw, oqpsk=opts.oqpsk,
        freq_max=opts.freq_max_delta)
    try:
        cfg.validate()
    except ValueError as e:
        sys.stderr.write(f"Invalid configuration: {e}\n")
        return 1

    if opts.sweep_rescue_s > 0 and opts.turbo_chunks is not None:
        sys.stderr.write("--sweep-rescue is ignored with -T/--turbo (the "
                         "turbo paths run whole spans; acquisition kicks "
                         "apply to the sequential/live path only)\n")
    if opts.checkpoint_path is not None and opts.turbo_chunks is not None:
        sys.stderr.write("--checkpoint cannot be combined with -T/--turbo "
                         "(the turbo path is whole-file)\n")
        return 1

    if opts.turbo_chunks is not None and not is_stdin:
        return _run_turbo(opts, cfg, samples_file, soft_file, bps)

    # stdin + -T: the whole file is never in hand, so apply the turbo
    # machinery to buffered SPANS instead (see demod_span_turbo):
    # live/piped inputs that burst ahead of real time are demodulated
    # chunk-parallel, with the sequential path as the verified-prefix
    # fallback.
    span_turbo = opts.turbo_chunks is not None
    span_chunks = (opts.turbo_chunks or 32) if span_turbo else 32
    demod = StreamDemodulator(cfg, span_turbo=span_turbo,
                              span_chunks=max(2, span_chunks),
                              sweep_rescue_s=opts.sweep_rescue_s)
    if opts.checkpoint_path is not None and os.path.exists(
            opts.checkpoint_path):
        from .io.checkpoint import load_checkpoint
        resumed = load_checkpoint(opts.checkpoint_path)
        if resumed.cfg != cfg:
            sys.stderr.write(
                f"checkpoint {opts.checkpoint_path} was written with a "
                f"different configuration; refusing to resume\n")
            return 1
        demod = resumed
        # The loader builds a default StreamDemodulator; re-apply the
        # session policy flags (the carry/counters stay as saved).
        demod.sweep_rescue_s = float(opts.sweep_rescue_s)
        if not opts.quiet:
            print(f"Resumed from {opts.checkpoint_path} "
                  f"({demod.symbols_out} symbols so far)",
                  file=sys.stderr if opts.stdout_mode else sys.stdout)
    if span_turbo:
        # Overlap the span program compile (+ chip claim) with the live
        # input's buffering period, so the first span's latency is
        # data-dependent only (StreamDemodulator.prewarm_span_async).
        demod.prewarm_span_async()

    # File length probe (main.c:190-193).
    file_len = 0
    if not is_stdin:
        try:
            pos = samples_file.tell()
            samples_file.seek(0, 2)
            file_len = max(0, samples_file.tell() - pos)
            samples_file.seek(pos)
        except OSError:
            file_len = 0

    runner = DemodRunner(opts, demod, samples_file, soft_file, bps, file_len)

    if not opts.quiet:
        print(f"Input: {opts.input_path}, output: "
              f"{'stdout' if opts.stdout_mode else opts.output_fname}",
              file=sys.stderr if opts.stdout_mode else sys.stdout)

    from .profiling import maybe_trace

    worker = threading.Thread(target=runner.run, daemon=True)
    with maybe_trace():
        worker.start()
        try:
            if not opts.batch:
                from .ui.tui import run_tui
                run_tui(runner, opts.update_interval)
            elif not opts.quiet:
                _batch_status_loop(runner, opts)
            else:
                runner.done.wait()
        except KeyboardInterrupt:
            pass
        finally:
            # Signal the worker on EVERY exit path (a non-KeyboardInterrupt
            # exception in the UI loop must not leave join() waiting on a
            # worker that is still streaming), then never exit while the
            # span prewarm is mid-claim/mid-compile (a killed daemon
            # thread wedges the tunneled chip; the worker's finish()
            # normally joined it already).
            runner.stop.set()
            worker.join()
            demod.join_prewarm()

    if opts.checkpoint_path is not None:
        from .io.checkpoint import save_checkpoint
        save_checkpoint(opts.checkpoint_path, demod)
        if not opts.quiet:
            print(f"Checkpoint saved to {opts.checkpoint_path}",
                  file=sys.stderr if opts.stdout_mode else sys.stdout)

    if not opts.stdout_mode:
        soft_file.close()
    if not is_stdin:
        samples_file.close()
    return 0


def _run_turbo(opts: Options, cfg: DemodConfig, samples_file, soft_file,
               bps: int) -> int:
    """Offline chunk-parallel demodulation of the whole file (-T <chunks>).

    Reads all samples, runs demod_array_turbo across the batch lanes of
    every local device (chunk axis sharded over the mesh when more than one
    device is present), and writes the usual lock-gated int8 soft-symbol
    stream."""
    from .demod.turbo import demod_array_turbo
    from .io.wav import decode_iq, FILE_BUFFER_SIZE

    raw = samples_file.read()
    # Reference ingest parity (wav_read reads full 32 KiB buffers and
    # discards a short trailing read, wavfile.c:50-80): -T must demodulate
    # exactly the bytes the batch path consumes, or the two modes emit
    # different symbol streams for the same file.
    raw = raw[:len(raw) - len(raw) % FILE_BUFFER_SIZE]
    x = decode_iq(raw, bps)
    chunks = opts.turbo_chunks
    if chunks == 0:
        # Auto: fill the batch lanes (128/device, the kernel's saturation
        # point — docs/PERF.md) but keep chunks long enough for the gauge
        # warmup to mature (~32 blocks; default_warmup_blocks targets
        # 65536 samples). Short recordings get fewer, longer chunks. The
        # count snaps down to a multiple of the device count so mesh="auto"
        # engages on multi-device hosts for mid-size recordings too.
        import jax
        n_dev = len(jax.devices())
        chunks = int(np.clip(len(x) // (32 * cfg.block_len),
                             1, 128 * n_dev))
        if chunks >= n_dev:
            chunks -= chunks % n_dev
    if not opts.quiet:
        print(f"Turbo: {len(x)} samples across {chunks} lanes",
              file=sys.stderr if opts.stdout_mode else sys.stdout)
    res = demod_array_turbo(cfg, x, chunks=chunks, mesh="auto",
                            strict=True)
    w = SymbolWriter(soft_file)
    w.feed(quantize_symbols(res.symbols), res.symbols["locked_once"])
    w.flush_partial()
    if not opts.quiet:
        print(f"Turbo: {len(res.symbols)} symbols, passes={res.passes}, "
              f"converged={res.converged}",
              file=sys.stderr if opts.stdout_mode else sys.stdout)
    return 0


def _batch_status_loop(runner: DemodRunner, opts: Options) -> None:
    """Periodic status line (main.c:247-263)."""
    interval = opts.update_interval / 1000.0
    while not runner.done.is_set():
        pct, freq_hz, rate_hz, locked = runner.status_tuple()
        lead = "\n" if opts.batch else "\033[1K\r"
        sys.stdout.write(
            f"{lead}({pct:5.1f}%) Carrier: {freq_hz:+7.1f} Hz, "
            f"Symbol rate: {rate_hz:.1f} Hz, "
            f"Locked: {'Yes' if locked else 'No'}")
        sys.stdout.flush()
        runner.done.wait(interval)
    sys.stdout.write("\n")
