from .mesh import (TrainState, make_mesh, make_train_step, shard_batch,
                   shard_by_slots, shard_state_to_mesh, tp_spec)
from .seqpar import seq_parallel_infer

__all__ = ["make_mesh", "make_train_step", "shard_batch", "TrainState",
           "shard_by_slots", "shard_state_to_mesh", "tp_spec",
           "seq_parallel_infer"]
