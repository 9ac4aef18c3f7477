"""Multi-host deployment: jax.distributed over DCN + host-local cameras.

The reference's multi-machine story is four docker containers sharing one
ROS master over TCP (docker-compose.yml:3-54, SURVEY.md §2.4): topics cross
hosts through TCPROS. The TPU-native equivalent is a multi-host JAX program:
every host runs this same process, `initialize()` wires them through the
coordinator, and the per-host camera streams become one global array whose
``data`` axis spans all hosts — XLA routes any cross-host collective over
DCN, intra-host traffic over ICI.

Placement rule (scaling-book): streams that share a chip's pipeline never
communicate, so the stream axis shards across hosts for free; only flow-net
training gradients (dp all-reduce) and spatial halos (ppermute) generate
traffic, and both stay inside a host when the mesh is laid out host-major
(the default here: `create_mesh` reshapes jax.devices(), which enumerates
devices host-by-host).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import create_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host program (idempotent). With no arguments, JAX
    auto-detects the cluster (TPU pod metadata); arguments are for explicit
    setups (e.g. CPU fleets or tests)."""
    # NOTE: must run before anything touches the XLA backend — do not call
    # jax.devices()/process_count() here.
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax without is_initialized
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_stream_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL hosts' devices, host-major so the model
    axis (spatial halos / tp collectives) never crosses DCN when
    model_parallel divides the per-host device count."""
    return create_mesh(len(jax.devices()), model_parallel=model_parallel)


def distribute_streams(mesh: Mesh, local_batch):
    """Assemble each host's camera frames into one global array.

    ``local_batch``: pytree of (n_local, ...) host-local arrays (this
    host's cameras). Returns a pytree of global jax.Arrays with leading
    dimension n_local * process_count, sharded P('data') — every host
    addresses only its own shard, no frame ever crosses DCN.
    """
    n_proc = jax.process_count()

    def one(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        sharding = NamedSharding(mesh, P(("data",)))
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(one, local_batch)


def host_local_results(global_tree):
    """The inverse view: this host's shard of a P('data') output pytree as
    numpy (for the host-side export/visualization shim)."""
    def one(x):
        # Model-axis replication means several local devices hold the same
        # data shard: keep one copy per distinct index.
        seen = set()
        parts = []
        for s in sorted(
            x.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        ):
            key = tuple(
                (sl.start, sl.stop)
                for sl in s.index
                if isinstance(sl, slice)
            )
            if key in seen:
                continue
            seen.add(key)
            parts.append(np.asarray(s.data))
        return np.concatenate(parts, axis=0)

    return jax.tree_util.tree_map(one, global_tree)
