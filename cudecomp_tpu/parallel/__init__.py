"""Parallel subpackage: shard_map helpers and collective exchange strategies."""

from cudecomp_tpu.parallel.collectives import (
    shard_map_fn,
    exchange_all_to_all,
    exchange_ring,
    EXCHANGES,
)

__all__ = [
    "shard_map_fn",
    "exchange_all_to_all",
    "exchange_ring",
    "EXCHANGES",
]
