"""Multi-host (multi-process) data parallelism over a global device mesh.

The reference tops out at single-machine torch DataParallel
(puresound/task/base.py:226-229). Single-host mesh training (mesh.py) is
its direct TPU equivalent; this module generalizes the SAME mesh/step code
to a pod slice spanning hosts: each process owns its local chips, the mesh
is built over `jax.devices()` (global), and every process runs the one
SPMD program in lockstep — XLA routes the gradient all-reduce over
ICI/DCN from the shardings alone, exactly as on one host.

What changes vs single-host is only *placement* and *I/O*:

- batches:   each process loads its slice of the global batch
             (`DataLoader(shard=(process_id, n_processes))`) and
             `jax.make_array_from_process_local_data` assembles the global
             array (mesh.shard_batch branches here automatically).
- state:     replicated leaves are built from identical host copies on
             every process (mesh.replicate_to_mesh / shard_state_to_mesh).
- host I/O:  checkpoints, TensorBoard, and eval-audio logging run on the
             primary process only; replicated arrays read back with
             np.asarray on any process (they are fully addressable).

Launch (one command per host, same argv apart from --process_id):

    python egs/ns/main.py conf.yaml --action train \
        --coordinator host0:1234 --num_processes 2 --process_id {0,1}

Tested with 2 CPU processes x 2 virtual devices each (Gloo collectives);
on TPU pods the same flags ride the PJRT distributed runtime.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               platform: Optional[str] = None) -> None:
    """Join the multi-process JAX runtime. Must run before first device use.

    platform="cpu" forces the host backend first (the env var is ignored by
    some PJRT plugins; jax.config is authoritative). No-op for 1 process.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side I/O (ckpt/TB/eval audio)."""
    return process_index() == 0


def global_put(mesh, tree, spec_fn):
    """Assemble global arrays from process-local leaves.

    spec_fn(leaf) -> PartitionSpec. For sharded specs each process passes
    its LOCAL slice (the rows its addressable devices own); for replicated
    specs every process passes the identical full value.
    """
    import jax
    from jax.sharding import NamedSharding

    def put(x):
        if x is None or not hasattr(x, "shape"):
            return x
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec_fn(x)), np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def host_local(tree):
    """Read a replicated global pytree back to host numpy (any process).
    Use to hand params to single-process paths (eval-audio logging) or to
    checkpoint serialization on the primary."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)
