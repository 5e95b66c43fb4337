"""Mesh + data-parallel training (GSPMD exact mode / shard_map local mode)."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated_sharding,
)
from .seqmodel import (
    data_seq_mesh,
    seq_mesh,
    time_sharded_decode,
    time_sharded_encode,
)
from .seqpar import SEQ_AXIS, time_sharded_scan
from .seqtrain import build_seq_train_step, seq_batch_sharding, seq_replicated
from .sharding import build_sharded_train_step, replicate_state, shard_batch

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_multihost",
    "build_sharded_train_step",
    "replicate_state",
    "shard_batch",
    "SEQ_AXIS",
    "time_sharded_scan",
    "seq_mesh",
    "data_seq_mesh",
    "time_sharded_encode",
    "time_sharded_decode",
    "build_seq_train_step",
    "seq_batch_sharding",
    "seq_replicated",
]
