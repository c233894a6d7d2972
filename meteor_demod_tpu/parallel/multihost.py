"""Multi-host fleet: the same shard_map demod on an N-process global mesh.

The reference is a single-process program; scaling it out means running N
copies (SURVEY.md §2, parallelism inventory). The TPU-native equivalent is
ONE logical fleet over the global device mesh of a multi-process job:

- `init_distributed` performs the jax.distributed rendezvous (DCN).
- `MultiHostFleet` is each process's view of the global FleetDemodulator:
  the carry and sample blocks are global arrays assembled from
  process-local rows (`jax.make_array_from_process_local_data`), the step
  is the same jitted shard_map program as parallel/mesh.py (SPMD: every
  process executes it over its local devices), per-stream outputs come back
  from the locally addressable shards, and the psum telemetry is replicated
  so every process sees fleet-global numbers.

Streams never move between hosts after input distribution: the demod hot
loop is host-local, only the (tiny) telemetry reduction crosses ICI/DCN.
Weak scaling is therefore bounded by input-feed bandwidth, not compute —
measured evidence in docs/SCALING.md and tests/test_multihost.py (a real
2-process CPU rendezvous whose fleet output is bit-identical to the
single-process run).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import DemodConfig
from ..demod.state import DemodCarry, init_carry
from ..dsp.fir import iq_to_f32
from .mesh import make_fleet_demod, make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed; a no-op if already initialized.

    Arguments default to JAX's env-based discovery (JAX_COORDINATOR_ADDRESS
    etc. / TPU pod runtime metadata). Initialization errors propagate —
    a failed rendezvous must not be silently ignored."""
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


class MultiHostFleet:
    """Per-process handle on one global fleet across all hosts' devices.

    Each process feeds `process_local_blocks` the sample rows for ITS
    devices' streams (`local_stream_slice` says which global rows those
    are) and gets back those streams' BlockOutput plus the fleet-global
    telemetry. Global stream order follows `jax.devices()` order.
    """

    def __init__(self, cfg: DemodConfig, streams_per_device: int,
                 backend: str = "auto", axis_name: str = "streams"):
        cfg.validate()
        self.cfg = cfg
        self.axis_name = axis_name
        self.mesh = make_mesh(jax.devices(), axis_name=axis_name)
        self.spd = streams_per_device
        self.n_streams = streams_per_device * len(jax.devices())
        self.n_local = streams_per_device * len(jax.local_devices())
        self._sharding = NamedSharding(self.mesh, P(axis_name))
        self._fn = make_fleet_demod(cfg, self.mesh, axis_name, backend)
        c = init_carry(cfg)
        self.carry = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                self._sharding,
                np.broadcast_to(np.asarray(x),
                                (self.n_local,) + x.shape).copy()),
            c)
        self.telemetry = None

    def local_stream_slice(self) -> slice:
        """Global stream rows owned by this process (its devices' shards)."""
        devs = list(self.mesh.devices.flat)
        mine = [i for i, d in enumerate(devs)
                if d.process_index == jax.process_index()]
        lo, hi = min(mine), max(mine)
        assert mine == list(range(lo, hi + 1)), (
            "process devices are not contiguous in the mesh")
        return slice(lo * self.spd, (hi + 1) * self.spd)

    def process_local_blocks(self, local_blocks: np.ndarray):
        """local_blocks: (n_local, block_len) complex64 (or (..,2) float32)
        -> this process's rows of the fleet BlockOutput (numpy)."""
        if np.iscomplexobj(local_blocks):
            local_blocks = iq_to_f32(local_blocks)
        local_blocks = np.ascontiguousarray(local_blocks, dtype=np.float32)
        want = (self.n_local, self.cfg.block_len, 2)
        if local_blocks.shape != want:
            raise ValueError(f"expected {want}, got {local_blocks.shape}")
        x = jax.make_array_from_process_local_data(self._sharding,
                                                   local_blocks)
        self.carry, outs, telemetry = self._fn(self.carry, x)
        # Telemetry is replicated (P()): every process reads the global psum.
        self.telemetry = jax.tree_util.tree_map(np.asarray,
                                                jax.device_get(telemetry))
        return jax.tree_util.tree_map(self._local_rows, outs)

    @staticmethod
    def _local_rows(arr) -> np.ndarray:
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def global_fleet(cfg: DemodConfig, streams_per_device: int = 128,
                 backend: str = "auto") -> MultiHostFleet:
    """MultiHostFleet over all devices of the (possibly multi-host) job."""
    return MultiHostFleet(cfg, streams_per_device, backend=backend)
