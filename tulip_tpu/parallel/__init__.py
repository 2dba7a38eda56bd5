"""Multi-chip parallel solving: block-angular LPs with a distributed
Schur complement, and mesh utilities."""

from .block_angular import (BlockAngularLPData, make_block_angular,
                            block_angular_to_dense, pad_scenarios,
                            shard_scenarios)

__all__ = [
    "BlockAngularLPData",
    "make_block_angular",
    "block_angular_to_dense",
    "pad_scenarios",
    "shard_scenarios",
]
