from .mesh import (FleetDemodulator, fleet_carry, make_fleet_demod, make_mesh,
                   shard_blocks)
from .multihost import global_fleet, init_distributed
from .timeshard import make_sharded_fir, time_mesh

__all__ = ["FleetDemodulator", "fleet_carry", "make_fleet_demod", "make_mesh",
           "shard_blocks", "make_sharded_fir", "time_mesh",
           "global_fleet", "init_distributed"]
