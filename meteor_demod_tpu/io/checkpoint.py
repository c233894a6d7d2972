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


def _pack_rows(rows: list, arrays: dict, prefix: str) -> int:
    """Pack a list of symbol-row dicts (sym_re/sym_im/valid/locked_once
    arrays) into flat npz arrays under `prefix`. Row boundaries are not
    semantic (consumers concatenate, parked_output), so rows are stored
    concatenated."""
    keys = ("sym_re", "sym_im", "valid", "locked_once")
    for k in keys:
        arrays[f"{prefix}{k}"] = (
            np.concatenate([np.asarray(r[k]) for r in rows]) if rows
            else np.zeros(0, np.float32 if k.startswith("sym") else np.int32))
    return len(rows)


def _unpack_rows(z, prefix: str) -> list:
    keys = ("sym_re", "sym_im", "valid", "locked_once")
    if f"{prefix}valid" not in z.files or not len(z[f"{prefix}valid"]):
        return []
    return [{k: np.asarray(z[f"{prefix}{k}"]) for k in keys}]


def _wait_parked_drained(fleet, timeout_s: float = 60.0) -> None:
    """Block until the host park worker has processed every fed block —
    the parked carries are then exact through the last block."""
    import time
    if not fleet._parked:
        return
    deadline = time.monotonic() + timeout_s
    while True:
        with fleet._plock:
            if all(p.blocks_done == p.blocks_fed
                   for p in fleet._parked.values()):
                return
        if time.monotonic() > deadline:
            raise TimeoutError("park worker did not drain within timeout")
        time.sleep(0.02)


def _fleet_state(fleet) -> tuple[dict, dict]:
    """(json-able meta, npz arrays) capturing a FleetDemodulator exactly.
    Non-mutating: pending parked rows are copied, not drained."""
    from ..demod.pipeline import egress
    _wait_parked_drained(fleet)
    arrays = {f"carry_{k}": np.asarray(v)
              for k, v in egress(fleet.carry)._asdict().items()}
    arrays["unlock_streak"] = fleet._unlock_streak
    arrays["flap_count"] = fleet._flap_count
    if fleet._last_locked_vec is not None:
        arrays["last_locked_vec"] = np.asarray(fleet._last_locked_vec)
    if fleet._lonce_vec is not None:
        arrays["lonce_vec"] = np.asarray(fleet._lonce_vec)
    if getattr(fleet, "_agc_vec", None) is not None:
        arrays["agc_vec"] = np.asarray(fleet._agc_vec)
    if fleet.stream_flags is not None:
        arrays["stream_flags"] = np.asarray(fleet.stream_flags)
    tel = None
    if fleet.telemetry is not None:
        tel = {k: float(v) for k, v in fleet.telemetry.items()}
    parked_meta = {}
    if fleet._parked:
        with fleet._plock:
            for i, p in fleet._parked.items():
                pm = dict(locked=bool(p.locked),
                          locked_streak=int(p.locked_streak),
                          blocks_fed=int(p.blocks_fed),
                          blocks_done=int(p.blocks_done))
                for k, v in p.carry.items():
                    arrays[f"parked_{i}_carry_{k}"] = np.asarray(v)
                _pack_rows(list(p.out_rows), arrays, f"parked_{i}_rows_")
                parked_meta[str(i)] = pm
    retired = []
    for i, rows in fleet._retired_rows.items():
        _pack_rows(list(rows), arrays, f"retired_{i}_rows_")
        retired.append(int(i))
    meta = dict(
        cfg=dataclasses.asdict(fleet.cfg),
        n_streams=fleet.n_streams,
        axis_name=fleet.axis_name,
        backend=fleet._backend,
        recover_flagged=fleet.recover_flagged,
        telemetry_every=fleet.telemetry_every,
        park=fleet.park_enabled, park_after=fleet.park_after,
        unpark_after=fleet.unpark_after, park_max=fleet.park_max,
        flap_park=fleet.flap_park,
        tick_idx=fleet._tick_idx, block_idx=fleet._block_idx,
        active_locked=(None if fleet._active_locked is None
                       else int(fleet._active_locked)),
        wide_latch=bool(fleet._wide_latch),
        use_banded=bool(fleet.use_banded),
        banded_cfg=(dataclasses.asdict(fleet.banded_cfg)
                    if fleet.banded_cfg is not None else None),
        recovered_streams=int(fleet.recovered_streams),
        telemetry=tel, parked=parked_meta, retired=retired)
    return meta, arrays


def _restore_fleet(meta: dict, z, arrays_prefix: str = "", mesh=None):
    """Build a FleetDemodulator exactly as captured by _fleet_state."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as jP
    from ..parallel.mesh import FleetDemodulator, _ParkedStream
    from ..demod.state import DemodCarry
    cfg = DemodConfig(**meta["cfg"])
    fleet = FleetDemodulator(
        cfg, meta["n_streams"], mesh=mesh, axis_name=meta["axis_name"],
        backend=meta["backend"], recover_flagged=meta["recover_flagged"],
        telemetry_every=meta["telemetry_every"], park=meta["park"],
        park_after=meta["park_after"], unpark_after=meta["unpark_after"],
        park_max=meta["park_max"], flap_park=meta["flap_park"])
    p = arrays_prefix
    sharding = NamedSharding(fleet.mesh, jP(fleet.axis_name))
    fleet.carry = DemodCarry(**{
        k[len(p) + len("carry_"):]: jax.device_put(np.asarray(z[k]),
                                                   sharding)
        for k in z.files
        if k.startswith(f"{p}carry_")})
    fleet._unlock_streak = np.asarray(z[f"{p}unlock_streak"]).copy()
    fleet._flap_count = np.asarray(z[f"{p}flap_count"]).copy()
    if f"{p}last_locked_vec" in z.files:
        fleet._last_locked_vec = np.asarray(z[f"{p}last_locked_vec"]).copy()
    if f"{p}lonce_vec" in z.files:
        fleet._lonce_vec = np.asarray(z[f"{p}lonce_vec"]).copy()
    if f"{p}agc_vec" in z.files:
        fleet._agc_vec = np.asarray(z[f"{p}agc_vec"]).copy()
    if f"{p}stream_flags" in z.files:
        fleet.stream_flags = np.asarray(z[f"{p}stream_flags"]).copy()
    if meta["telemetry"] is not None:
        fleet.telemetry = {
            k: (np.float32(v) if k == "mean_agc_gain" else np.int32(v))
            for k, v in meta["telemetry"].items()}
    fleet._tick_idx = int(meta["tick_idx"])
    fleet._block_idx = int(meta["block_idx"])
    fleet._active_locked = meta["active_locked"]
    fleet._wide_latch = bool(meta["wide_latch"])
    fleet.use_banded = bool(meta["use_banded"])
    if meta["banded_cfg"] is not None:
        fleet.banded_cfg = DemodConfig(**meta["banded_cfg"])
    fleet.recovered_streams = int(meta["recovered_streams"])
    for i_s, pm in meta["parked"].items():
        i = int(i_s)
        leaves = {k[len(f"{p}parked_{i}_carry_"):]: np.asarray(z[k]).copy()
                  for k in z.files
                  if k.startswith(f"{p}parked_{i}_carry_")}
        fleet._ensure_worker()
        ps = _ParkedStream(leaves)
        ps.locked = bool(pm["locked"])
        ps.locked_streak = int(pm["locked_streak"])
        ps.blocks_fed = int(pm["blocks_fed"])
        ps.blocks_done = int(pm["blocks_done"])
        ps.out_rows = _unpack_rows(z, f"{p}parked_{i}_rows_")
        fleet._parked[i] = ps
    for i in meta["retired"]:
        rows = _unpack_rows(z, f"{p}retired_{i}_rows_")
        if rows:
            fleet._retired_rows[int(i)] = rows
    return fleet


def save_fleet_checkpoint(path: str, fleet) -> None:
    """Serialize a FleetDemodulator (device carry + all host-side policy
    and parking state) to `path` (.npz). The park worker is drained first
    so parked host carries are exact through the last fed block; pending
    deferred symbol rows are saved, not dropped. Resuming from the file
    is bit-identical to continuing the original fleet (tested)."""
    meta, arrays = _fleet_state(fleet)
    meta = dict(version=_FORMAT_VERSION, kind="fleet", fleet=meta)
    np.savez(path,
             meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             **arrays)


def load_fleet_checkpoint(path: str, mesh=None):
    """Reconstruct a FleetDemodulator exactly as saved. `mesh` must have
    the same size as at save time (default: a fresh all-device mesh)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if meta["version"] != _FORMAT_VERSION or meta.get("kind") != "fleet":
            raise ValueError("not a fleet checkpoint")
        return _restore_fleet(meta["fleet"], z, mesh=mesh)


def save_serving_checkpoint(path: str, serving) -> None:
    """Serialize a ServingFleet: every group's fleet state plus the
    stream->(group,lane) assignment, banding flags, and stream-keyed
    deferred rows."""
    arrays = {}
    groups_meta = []
    for g, f in enumerate(serving.groups):
        gm, ga = _fleet_state(f)
        gm["use_banded"] = bool(f.use_banded)   # per-group banding flag
        groups_meta.append(gm)
        for k, v in ga.items():
            arrays[f"g{g}_{k}"] = v
    arrays["group_of"] = serving._group_of
    arrays["lane_of"] = serving._lane_of
    deferred = {}
    for s, rows in serving._deferred.items():
        _pack_rows(list(rows), arrays, f"deferred_{s}_rows_")
        deferred[str(s)] = True
    meta = dict(version=_FORMAT_VERSION, kind="serving",
                cfg=dataclasses.asdict(serving.cfg),
                n_streams=serving.n_streams,
                group_size=serving.group_size, band=serving.band,
                sorted_once=bool(serving.sorted_once),
                resort_wanted=bool(serving._resort_wanted),
                deferred=sorted(int(s) for s in deferred),
                groups=groups_meta)
    np.savez(path,
             meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             **arrays)


def load_serving_checkpoint(path: str, mesh=None):
    """Reconstruct a ServingFleet exactly as saved."""
    from ..parallel.serving import ServingFleet
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if (meta["version"] != _FORMAT_VERSION
                or meta.get("kind") != "serving"):
            raise ValueError("not a serving checkpoint")
        cfg = DemodConfig(**meta["cfg"])
        serving = ServingFleet(cfg, meta["n_streams"],
                               group_size=meta["group_size"],
                               band=meta["band"], mesh=mesh)
        for g, gm in enumerate(meta["groups"]):
            f = _restore_fleet(gm, z, arrays_prefix=f"g{g}_",
                               mesh=serving.mesh)
            f.banded_cfg = serving.groups[g].banded_cfg
            f.use_banded = bool(gm["use_banded"])
            serving.groups[g] = f
        serving._group_of = np.asarray(z["group_of"]).copy()
        serving._lane_of = np.asarray(z["lane_of"]).copy()
        serving.sorted_once = bool(meta["sorted_once"])
        serving._resort_wanted = bool(meta["resort_wanted"])
        for s in meta["deferred"]:
            rows = _unpack_rows(z, f"deferred_{s}_rows_")
            if rows:
                serving._deferred[int(s)] = rows
    return serving


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
