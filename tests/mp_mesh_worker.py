"""Worker process for the multi-process mesh test (not a test module).

Launched twice by ``test_sharding.py::test_multiprocess_mesh_two_processes``
as ``python mp_mesh_worker.py <process_id> <port>``. Each process owns 4
virtual CPU devices; ``init_distributed`` joins them into one 8-device
global mesh whose ``data`` axis spans the process boundary, so the k-means
``psum`` and the retrieval ``all_gather`` ride the cross-process (DCN-
analogue, Gloo) transport instead of the single-process ICI emulation the
rest of the suite uses. Prints ``MP_MESH_OK`` on success.

Reference has no multi-node story at all (SURVEY.md §5 distributed row);
this proves the half of the framework's claim that the in-process virtual
mesh cannot: collectives across real process boundaries.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

process_id, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Self-heal to a 4-local-CPU-device backend even if a site hook already
# initialized a backend (same order-sensitive dance as __graft_entry__).
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from anyloc_tpu.parallel import get_mesh, init_distributed  # noqa: E402

init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=process_id,
)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4, jax.local_devices()

import numpy as np  # noqa: E402

from anyloc_tpu.ops.kmeans import kmeans_fit  # noqa: E402
from anyloc_tpu.ops.retrieval import top_k_search  # noqa: E402
from anyloc_tpu.parallel import (  # noqa: E402
    kmeans_fit_sharded, top_k_search_sharded)

mesh = get_mesh(n_data=8, n_model=1)
# The point of the test: the data axis must actually cross processes.
assert len({d.process_index for d in mesh.devices.flat}) == 2, (
    [d.process_index for d in mesh.devices.flat])

rng = np.random.default_rng(0)  # same data on both processes
x = rng.standard_normal((1000, 16)).astype(np.float32)
key = jax.random.PRNGKey(3)
single, _ = kmeans_fit(key, x, 8, mode="cosine", max_iters=20)
sharded = kmeans_fit_sharded(key, x, 8, mesh, mode="cosine", max_iters=20)
np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                           atol=1e-4)

db = rng.standard_normal((1003, 32)).astype(np.float32)
qu = db[rng.choice(1003, 16, replace=False)]
s_sh, i_sh = top_k_search_sharded(db, qu, 5, mesh)
s_1d, i_1d = top_k_search(db, qu, 5)
np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_1d))
np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_1d), atol=1e-5)

# compressed engine across the process boundary: PQ codes shard over the
# 2-process mesh, the ADC partials all_gather over Gloo
from anyloc_tpu.ops.pq import pq_fit  # noqa: E402
from anyloc_tpu.parallel import pq_search_sharded  # noqa: E402

dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
pq_index = pq_fit(dbn, 8, method="cosine")
qun = dbn[:8]
s_p1, i_p1 = pq_index.search(qun, 5)
s_ps, i_ps = pq_search_sharded(pq_index, qun, 5, mesh)
np.testing.assert_array_equal(np.asarray(i_ps), np.asarray(i_p1))
np.testing.assert_allclose(np.asarray(s_ps), np.asarray(s_p1), atol=1e-5)

print(f"MP_MESH_OK proc={process_id}", flush=True)
jax.distributed.shutdown()
