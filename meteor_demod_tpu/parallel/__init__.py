from .mesh import (FleetDemodulator, fleet_carry, make_fleet_demod, make_mesh,
                   shard_blocks)

__all__ = ["FleetDemodulator", "fleet_carry", "make_fleet_demod", "make_mesh",
           "shard_blocks"]
