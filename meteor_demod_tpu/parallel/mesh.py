"""Device-mesh scale-out: fleet demodulation over `jax.sharding`.

The reference is a single-process, single-stream program (SURVEY.md §2,
"Parallelism & distribution inventory"); its only concurrency is a UI thread.
The TPU-native scale story replaces that with:

- **Batch (fleet) parallelism**: many independent recordings/channels demodulate
  concurrently. Each stream's carry and sample blocks get a leading `streams`
  axis, sharded over the mesh with `shard_map`. Per-device work is the vmapped
  block demodulator; VPU lanes hold the batch. No cross-device traffic in the
  hot loop — collectives appear only in fleet telemetry reductions (psum over
  ICI), mirroring how the reference's UI thread polls DSP getters
  (main.c:231-237) without touching the hot path.
- **Multi-host**: the same code runs under `jax.distributed` with a global mesh;
  streams shard across hosts over DCN, telemetry psum rides ICI within a slice.

A mesh with a second `time` axis is reserved for sequence-parallel FIR
(overlap-save halo exchange via `collective_permute`) — see parallel/timeshard.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DemodConfig
from ..demod.pipeline import egress

from ..demod.state import DemodCarry, init_carry
from ..dsp.fir import iq_to_f32


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis_name: str = "streams") -> Mesh:
    """1-D fleet mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))


def fleet_carry(cfg: DemodConfig, n_streams: int, mesh: Mesh,
                axis_name: str = "streams") -> DemodCarry:
    """Initial per-stream carry, sharded over the mesh's stream axis."""
    c = init_carry(cfg)
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            np.broadcast_to(np.asarray(x), (n_streams,) + x.shape).copy(),
            sharding),
        c)


def shard_blocks(blocks: np.ndarray, mesh: Mesh,
                 axis_name: str = "streams") -> jax.Array:
    """Place a (n_streams, block_len, 2) f32 sample batch on the mesh."""
    return jax.device_put(blocks, NamedSharding(mesh, P(axis_name)))


@functools.lru_cache(maxsize=16)
def make_fleet_demod(cfg: DemodConfig, mesh: Mesh,
                     axis_name: str = "streams",
                     backend: str = "auto",
                     locked: bool = False,
                     telemetry: bool = True) -> Callable:
    """Build the jitted fleet step: (carry, blocks) -> (carry', outs, telemetry).

    carry leaves and blocks have a leading `streams` axis sharded over the
    mesh. telemetry is a small replicated dict reduced with psum — the only
    collective in the step, equivalent to the reference's cross-thread
    telemetry reads (main.c:231-237) but aggregated fleet-wide.

    telemetry=False builds the COLLECTIVE-FREE step (returns an empty
    telemetry dict): the reference polls its DSP getters at the UI refresh
    interval (main.c:231-237, -R 50/2000 ms), not per processed buffer —
    fleets mirror that by dispatching this program between refresh ticks
    (FleetDemodulator/MultiHostFleet telemetry_every), so the hot loop has
    ZERO cross-device traffic and no lockstep barrier (docs/SCALING.md,
    telemetry amortization)."""
    from ..demod.backend import default_backend, make_batch_demod
    if (backend if backend != "auto" else default_backend()) == "scan":
        locked = False                 # scan has no locked geometry

    def step(carry: DemodCarry, blocks: jnp.ndarray):
        # Inside shard_map the step sees the per-device shard; its leading
        # dim (n_streams / n_devices) picks the right batched builder.
        demod = make_batch_demod(cfg, blocks.shape[0], backend, locked)
        carry, outs = demod(carry, blocks)
        if not telemetry:
            return carry, outs, {}
        tel = {
            "locked_streams": jax.lax.psum(
                jnp.sum(carry.locked), axis_name),
            "locked_once_streams": jax.lax.psum(
                jnp.sum(carry.locked_once), axis_name),
            "symbols": jax.lax.psum(
                jnp.sum(outs.valid.astype(jnp.int32)), axis_name),
            "mean_agc_gain": jax.lax.pmean(
                jnp.mean(carry.agc_gain), axis_name),
            "flags": jax.lax.psum(jnp.sum(carry.flags), axis_name),
        }
        return carry, outs, tel

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()),
        check_vma=False)
    return jax.jit(sharded)


class FleetDemodulator:
    """Demodulate a fleet of independent IQ streams across a device mesh.

    TPU-native equivalent of running N reference processes (BASELINE.json
    configs[4]): feed aligned (n_streams, block_len) blocks, collect
    per-stream symbols + fleet telemetry.
    """

    def __init__(self, cfg: DemodConfig, n_streams: int,
                 mesh: Mesh | None = None, axis_name: str = "streams",
                 backend: str = "auto", recover_flagged: bool = True,
                 telemetry_every: int = 1):
        cfg.validate()
        self.cfg = cfg
        self.axis_name = axis_name
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        n_dev = self.mesh.devices.size
        if n_streams % n_dev != 0:
            raise ValueError(
                f"n_streams {n_streams} must be divisible by mesh size {n_dev}")
        if telemetry_every < 1:
            raise ValueError("telemetry_every must be >= 1")
        self.n_streams = n_streams
        self._backend = backend
        # Telemetry amortization: the fleet-global psum (the step's only
        # collective) runs every telemetry_every-th block — the reference
        # polls its getters at the UI refresh interval (main.c:231-237),
        # not per buffer. Blocks in between dispatch the collective-free
        # program; self.telemetry then holds the last refresh-tick values
        # (per-stream outputs and safety flags stay per-block regardless —
        # they are sharded readbacks, not collectives). Program switching
        # (wide<->locked) decides on refresh-tick telemetry only, so it
        # stays consistent across processes in the multi-host mirror.
        self.telemetry_every = telemetry_every
        self._block_idx = 0
        self._fns = {}
        self._get_fn(locked=False, telemetry=True)   # eager first build
        self.carry = fleet_carry(cfg, n_streams, self.mesh, axis_name)
        self.telemetry = None
        self.stream_flags = None
        # When True (default), any stream whose block trips a safety flag is
        # re-demodulated through the exact scalar oracle from its pre-block
        # carry and its outputs/carry are spliced back — the fleet then has
        # the same always-exact contract as StreamDemodulator (the reference
        # per-sample path is always exact, demod.c:23-48).
        self.recover_flagged = recover_flagged
        self.recovered_streams = 0

    def _get_fn(self, locked: bool, telemetry: bool) -> Callable:
        key = (locked, telemetry)
        if key not in self._fns:
            # Steady-state locked dispatch uses the serving-tier envelope
            # (config.serving(): tighter windows, +3-10% measured).
            cfg = self.cfg.serving() if locked else self.cfg
            self._fns[key] = make_fleet_demod(
                cfg, self.mesh, self.axis_name, self._backend,
                locked=locked, telemetry=telemetry)
        return self._fns[key]

    def process_blocks(self, blocks: np.ndarray):
        """blocks: (n_streams, block_len) complex64 (or (..., 2) float32)
        -> per-stream BlockOutput (numpy, via egress)."""
        if np.iscomplexobj(blocks):
            blocks = iq_to_f32(blocks)
        if blocks.shape != (self.n_streams, self.cfg.block_len, 2):
            raise ValueError(
                f"expected {(self.n_streams, self.cfg.block_len, 2)},"
                f" got {blocks.shape}")
        blocks = np.ascontiguousarray(blocks, dtype=np.float32)
        prev_carry = self.carry
        x = shard_blocks(blocks, self.mesh, self.axis_name)
        tel_tick = (self._block_idx % self.telemetry_every) == 0
        self._block_idx += 1
        # LOCKED-mode program switching (kernels/block_demod.py): once
        # every stream is carrier-locked, blocks dispatch through the
        # narrow-window/offset-gate kernel — decision-identical while
        # inside the locked envelope; excursions flag into the per-stream
        # oracle recovery below. Decided on refresh-tick telemetry.
        locked = (self.telemetry is not None
                  and int(self.telemetry["locked_streams"]) == self.n_streams
                  and int(self.telemetry["flags"]) == 0)
        fn = self._get_fn(locked, tel_tick)
        self.carry, outs, telemetry = fn(self.carry, x)
        if tel_tick:
            outs, self.telemetry, self.stream_flags = egress(
                (outs, telemetry, self.carry.flags))
        else:
            outs, self.stream_flags = egress((outs, self.carry.flags))
        if self.recover_flagged and np.any(self.stream_flags):
            outs = self._recover(prev_carry, blocks, outs,
                                 update_telemetry=tel_tick)
        return outs

    def _recover(self, prev_carry: DemodCarry, blocks: np.ndarray, outs,
                 update_telemetry: bool = True):
        """Re-demodulate every flagged stream's block with the exact scalar
        oracle (from the pre-block carry), splice the corrected symbols into
        `outs` (left-justified in the step slots — chronological order, which
        is all BlockOutput consumers rely on), and write the corrected carry
        back to the device mesh. Flags are cleared: a nonzero stream_flags
        entry always refers to the block just processed."""
        from ..demod import scalar
        from ..demod.pipeline import (numpy_carry_to_scalar_state,
                                      scalar_state_to_numpy_carry)
        from ..dsp.fir import f32_to_iq

        flagged = np.nonzero(np.asarray(self.stream_flags))[0]
        prev_np = egress(prev_carry)._asdict()
        cur = {k: np.array(v) for k, v in egress(self.carry)._asdict().items()}
        outs = outs.__class__(*(np.array(v) for v in outs))
        S = outs.sym_re.shape[1]
        for i in flagged:
            st = numpy_carry_to_scalar_state(
                self.cfg, {k: v[i] for k, v in prev_np.items()})
            sym, st = scalar.demod_stream_np(
                self.cfg, f32_to_iq(blocks[i]), st)
            n = len(sym)
            if n > S:
                raise RuntimeError(
                    f"stream {i}: oracle produced {n} symbols > {S} slots")
            for k, v in scalar_state_to_numpy_carry(self.cfg, st).items():
                cur[k][i] = v
            outs.sym_re[i] = 0.0
            outs.sym_im[i] = 0.0
            outs.valid[i] = 0
            outs.sym_re[i, :n] = sym["re"]
            outs.sym_im[i, :n] = sym["im"]
            outs.valid[i, :n] = 1
            outs.locked_once[i, :n] = sym["locked_once"]
            outs.locked_once[i, n:] = st["locked_once"]
        self.recovered_streams += len(flagged)

        sharding = NamedSharding(self.mesh, P(self.axis_name))
        self.carry = DemodCarry(
            **{k: jax.device_put(v, sharding) for k, v in cur.items()})
        if not update_telemetry:
            # Between refresh ticks self.telemetry keeps the last tick's
            # values (the recovery corrected the carry, so the next tick's
            # psum reflects the spliced state).
            return outs
        # Re-derive the fleet telemetry from the corrected host state (the
        # psum values were computed before the splice).
        self.telemetry = {
            "locked_streams": np.int32(cur["locked"].sum()),
            "locked_once_streams": np.int32(cur["locked_once"].sum()),
            "symbols": np.int32(outs.valid.sum()),
            "mean_agc_gain": np.float32(cur["agc_gain"].mean()),
            "flags": np.int32(0),
        }
        return outs

    def flagged_streams(self) -> np.ndarray:
        """Indices of streams that tripped a safety flag in the last block.

        With recover_flagged (the default) these streams have already been
        re-demodulated exactly and their carry/output corrected — the indices
        are reported for observability. With recover_flagged=False the flags
        are sticky and the stream's fast-path output is suspect from the
        flagged block onward."""
        if self.stream_flags is None:
            return np.zeros(0, dtype=np.int64)
        return np.nonzero(np.asarray(self.stream_flags))[0]
