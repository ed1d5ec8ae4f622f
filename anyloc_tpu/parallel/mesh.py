"""Device-mesh construction helpers.

Axis conventions used throughout the framework:
  * ``data``  — shards images / descriptor sets / the retrieval database
                (the VPR workload is data-parallel-dominant: SURVEY.md §2.4);
  * ``model`` — tensor-parallel axis for the ViT trunk (attention heads and
                MLP hidden sharded; used when ViT-G at high resolution
                exceeds per-chip HBM or to cut latency).

Within a slice the axes map onto ICI; across slices (multi-pod) the outer
``data`` axis rides DCN — same recipe as the scaling-book: pick a mesh,
annotate shardings, let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (jax.distributed) — the reference has no
    multi-node story at all (SURVEY.md §5 distributed row); on TPU pods this
    is one call with env-var autodetection, after which ``jax.devices()``
    spans the pod and every mesh in this module is pod-wide."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def get_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def local_mesh(n: Optional[int] = None) -> Mesh:
    """1-D data mesh over n local devices (default: all)."""
    return get_mesh(n_data=n, n_model=1)


def data_sharding(mesh: Mesh, *, axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard array dimension ``axis`` over the mesh's data axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` to a multiple (sharding needs even splits).
    Returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n
