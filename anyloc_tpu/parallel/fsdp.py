"""FSDP-style optimizer-state sharding over the ``data`` axis.

The dvgl training slice (reference ``dvgl_benchmark/train.py:106-206``)
keeps the model AND its Adam moments replicated per GPU (DataParallel).
On a TPU mesh that wastes HBM linearly in device count: Adam holds two
f32 moments per trainable parameter, so a replicated trunk + head costs
``3x params`` per chip. The ZeRO-1/FSDP observation is that the moments
are only ever read/written elementwise with the gradients — they can be
sharded over the data axis with NO extra collectives, because under GSPMD
the elementwise optimizer update simply runs on each moment shard while
gradients (already psum-replicated by the data-parallel loss) are sliced
for free by XLA.

Usage (see ``__graft_entry__.dryrun_multichip`` and
``tests/test_sharding.py``):

    shardings = fsdp_shardings(opt_state, mesh)           # moments sharded
    opt_state = jax.device_put(opt_state, shardings)
    step = fsdp_train_step(train_step, state_shardings)   # pins outputs

``fsdp_shardings`` shards each large leaf along its largest
mesh-divisible dimension and replicates the rest (scalars, counts, odd
shapes). Parameters themselves stay replicated — at AnyLoc's model scale
(<= 1.1B frozen trunk, small trainable heads) parameter FSDP buys nothing
over tp_split (parallel/tp.py), which already shards the trunk where it
matters.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_shardings(
    tree: Any, mesh: Mesh, axis: str = "data", min_size: int = 1 << 10
) -> Any:
    """A sharding pytree for ``tree``: each leaf with >= ``min_size``
    elements is sharded along its LARGEST dimension divisible by the mesh
    axis size; everything else (scalars, step counts, small biases,
    non-divisible shapes) is replicated."""
    n = mesh.shape[axis]

    def one(x):
        shape = getattr(x, "shape", ())
        size = getattr(x, "size", 0)
        if n > 1 and size >= min_size:
            for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
                if shape[d] % n == 0 and shape[d] >= n:
                    spec = [None] * len(shape)
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(one, tree)


def fsdp_train_step(train_step, state_shardings: Any):
    """Re-jit a ``(state, batch) -> (state, loss)`` train step with the
    output state pinned to ``state_shardings`` — keeps the Adam moments
    sharded across steps instead of letting layout propagation drift them
    back to replicated."""
    return jax.jit(
        lambda state, batch: train_step(state, batch),
        out_shardings=(state_shardings, None),
    )


def state_bytes_per_device(state: Any) -> int:
    """Bytes of a (possibly sharded) train-state pytree actually held on
    device 0 (for the footprint assertions in tests and the dryrun) — the
    sibling of ``parallel.tp.params_bytes_per_device`` for whole states."""
    from anyloc_tpu.parallel.tp import params_bytes_per_device

    return params_bytes_per_device(state)
