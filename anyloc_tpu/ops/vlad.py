"""TPU-native VLAD aggregation.

Reimplements the reference's unsupervised VLAD (AnyLoc/AnyLoc
``utilities.py:624-1008``, duplicated in ``demo/utilities.py:106-490``) as a
batched, jit-compiled kernel with the same public API surface
(``VLAD.fit / fit_and_generate / generate / generate_multi / generate_res_vec``).

The math, per image with descriptors ``x [N, D]``, centers ``c [C, D]``:

  hard:  a[n, k] = one_hot(argmax_k sim(x_n, c_k))          (sim per dist_mode)
  soft:  a[n, k] = softmax_k(temp * cos(x_n, c_k))
  V[k]   = sum_n a[n, k] * (x_n - c_k)                      (residual sum)
  V[k]   = V[k] / ||V[k]||        if intra_norm             (zero-safe)
  out    = flatten(V) / ||flatten(V)||                      -> [C * D]

TPU-first reformulation (vs the reference's per-image Python loop over
``used_clusters`` with boolean-mask scatter, ``utilities.py:854-861``):
the residual sum factorizes as

  V[b, k] = einsum('nk,nd->kd', a[b], x[b]) - (sum_n a[b, n, k]) * c[k]

so the hot op is a single ``[C, N] @ [N, D]`` matmul per image (MXU) and the
``[B, N, C, D]`` residual tensor (materialized by the reference,
``utilities.py:961``) never exists. A fused Pallas kernel for the whole
aggregate lives in ``anyloc_tpu.ops.pallas.vlad_kernel``; this module is the
XLA reference path and the public API.

Parity notes (verified against the reference semantics):
  * ``norm_descs`` L2-normalizes inputs before residuals (utilities.py:959-960);
  * hard labels are computed with the k-means distance mode
    (``kmeans.predict``, utilities.py:849);
  * soft assignment always uses cosine similarity regardless of dist_mode
    (utilities.py:870-875);
  * empty clusters contribute an all-zero block (utilities.py:840 zeros init);
  * intra-norm and the final norm use torch-F.normalize eps semantics;
  * output layout is cluster-major: out[k*D:(k+1)*D] (utilities.py:861).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT, l2_normalize
from anyloc_tpu.ops.kmeans import KMeans, _similarity


def _save_npz_atomic(path: str, **arrays) -> None:
    """Publish an .npz atomically (tmp + os.replace): a killed run or a
    concurrent writer can never leave a torn cache file that poisons every
    resume — the same contract as utils/desc_cache.py."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    np.savez(tmp, **arrays)          # np.savez appends .npz to the target
    os.replace(tmp + ".npz", path)


def _load_npz_or_none(path: str):
    """Dict of arrays, or None when the file is missing/torn (a torn cache
    is a MISS to recompute, never a crash)."""
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------

def vlad_assign(
    descs: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    vlad_mode: str = "hard",
    dist_mode: str = "cosine",
    soft_temp: float = 1.0,
) -> jnp.ndarray:
    """Assignment weights ``a`` of shape [..., N, C] for descs [..., N, D]."""
    n_clusters = centers.shape[0]
    if vlad_mode == "hard":
        sim = _similarity(descs.reshape(-1, descs.shape[-1]), centers, dist_mode)
        labels = jnp.argmax(sim, axis=-1)
        a = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)
        return a.reshape(*descs.shape[:-1], n_clusters)
    elif vlad_mode == "soft":
        # Reference uses cosine similarity for soft assignment regardless of
        # the k-means dist mode (utilities.py:870-875).
        dn = l2_normalize(descs)
        cn = l2_normalize(centers)
        cos = jnp.einsum("...nd,cd->...nc", dn, cn, precision=EXACT)
        return jax.nn.softmax(soft_temp * cos, axis=-1)
    raise ValueError(f"Unknown vlad_mode: {vlad_mode}")


@functools.partial(
    jax.jit,
    static_argnames=("vlad_mode", "dist_mode", "intra_norm", "norm_descs",
                     "impl", "soft_temp"),
    # soft_temp is STATIC: the fused Pallas kernel bakes it into the kernel
    # closure, and a traced scalar there raises "pallas_call captures
    # constants" on TPU (round-5 review, confirmed on device). It is a
    # config float — one compile per value is the correct trade.
)
def vlad_aggregate(
    descs: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    vlad_mode: str = "hard",
    dist_mode: str = "cosine",
    intra_norm: bool = True,
    norm_descs: bool = True,
    soft_temp: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Batched VLAD. descs [B, N, D] (or [N, D]), centers [C, D] -> [B, C*D].

    ``mask`` (optional, [B, N]) zeroes padded tokens so shape-bucketed batches
    of variable-size images can share one compiled program.

    ``impl``: "auto" routes unmasked batches through the fused Pallas kernel
    on TPU (~14x faster than the XLA lowering at the SOTA shape); "xla"
    forces the reference XLA path (CPU, masked batches).
    """
    squeeze = descs.ndim == 2
    if squeeze:
        descs = descs[None]
    if (
        impl in ("auto", "pallas")
        and mask is None
        and jax.default_backend() == "tpu"  # pltpu kernels are TPU-only
    ):
        from anyloc_tpu.ops.pallas.vlad_kernel import vlad_aggregate_fused

        out = vlad_aggregate_fused(
            descs,
            centers,
            dist_mode=dist_mode,
            intra_norm=intra_norm,
            norm_descs=norm_descs,
            vlad_mode=vlad_mode,
            soft_temp=soft_temp,
        )
        return out[0] if squeeze else out
    b, n, d = descs.shape
    c = centers.shape[0]
    descs = descs.astype(jnp.float32)
    centers = centers.astype(jnp.float32)

    x = l2_normalize(descs) if norm_descs else descs
    # NOTE: hard assignment in the reference runs kmeans.predict on the *raw*
    # descriptors (utilities.py:849) while residuals use normalized ones. For
    # cosine dist_mode these give identical labels (cosine is scale-invariant);
    # we assign on the normalized copy which also matches euclidean-on-normed
    # pipelines. Documented deviation only for euclidean + norm_descs.
    a = vlad_assign(
        x, centers, vlad_mode=vlad_mode, dist_mode=dist_mode, soft_temp=soft_temp
    )  # [B, N, C]
    if mask is not None:
        a = a * mask[..., None].astype(a.dtype)

    wsum = jnp.einsum("bnc,bnd->bcd", a, x, preferred_element_type=jnp.float32, precision=EXACT)
    acount = jnp.sum(a, axis=1)  # [B, C]
    if vlad_mode == "hard":
        # V[b,k,:] = sum_n a[b,n,k]*x[b,n,:] - (sum_n a[b,n,k]) * centers[k,:]
        v = wsum - acount[..., None] * centers[None, :, :]
    else:
        # Reference soft mode (utilities.py:880-884) multiplies the weight for
        # cluster k with the residuals to *all* centers and sums over both the
        # descriptor and the center axes:
        #   V[k] = sum_q a[q,k] * sum_c (x_q - c_c)
        #        = C * (sum_q a[q,k] x_q) - (sum_q a[q,k]) * sum_c c_c
        # We reproduce that exactly (documented reference behavior, not the
        # textbook per-cluster soft residual).
        center_sum = jnp.sum(centers, axis=0)  # [D]
        v = c * wsum - acount[..., None] * center_sum[None, None, :]
    if intra_norm:
        v = l2_normalize(v, axis=-1)
    out = v.reshape(b, c * d)
    out = l2_normalize(out, axis=-1)
    return out[0] if squeeze else out


def vlad_residuals(
    descs: jnp.ndarray, centers: jnp.ndarray, *, norm_descs: bool = True
) -> jnp.ndarray:
    """Full residual tensor [..., N, C, D] (reference ``generate_res_vec``,
    utilities.py:928-972). Only for API parity / visualization — the main
    aggregation path never materializes this."""
    x = l2_normalize(descs) if norm_descs else descs
    return x[..., :, None, :] - centers[None, :, :]


# ---------------------------------------------------------------------------
# Stateful wrapper with the reference's API + array-native caching
# ---------------------------------------------------------------------------

class VLAD:
    """API-compatible stand-in for the reference ``VLAD`` class
    (utilities.py:624-1008) backed by the batched jitted kernel.

    Differences from the reference (by design):
      * caches are ``.npz`` arrays instead of pickled ``.pt`` tensors
        (``c_centers.npz`` for the vocabulary, ``<id>_v.npz`` per-image
        global descriptors — smaller than the reference's residual/label
        caches and sufficient to resume);
        ``fit`` can also *read* a PyTorch ``c_centers.pt`` (via torch, if
        installed) so reference-exported vocabularies load for strict parity;
      * ``generate_multi`` is one batched device call, not a Python loop.
    """

    def __init__(
        self,
        num_clusters: int,
        desc_dim: Optional[int] = None,
        intra_norm: bool = True,
        norm_descs: bool = True,
        dist_mode: str = "cosine",
        vlad_mode: str = "hard",
        soft_temp: float = 1.0,
        cache_dir: Optional[str] = None,
        seed: int = 42,
    ) -> None:
        self.num_clusters = num_clusters
        self.desc_dim = desc_dim
        self.intra_norm = intra_norm
        self.norm_descs = norm_descs
        self.mode = dist_mode
        self.vlad_mode = str(vlad_mode).lower()
        assert self.vlad_mode in ("soft", "hard")
        self.soft_temp = soft_temp
        self.seed = seed
        self.c_centers: Optional[jnp.ndarray] = None
        self.kmeans: Optional[KMeans] = None
        self.cache_dir = cache_dir
        if self.cache_dir is not None:
            self.cache_dir = os.path.abspath(os.path.expanduser(self.cache_dir))
            os.makedirs(self.cache_dir, exist_ok=True)

    # -- caching ----------------------------------------------------------
    def _centers_paths(self):
        return (
            f"{self.cache_dir}/c_centers.npz",
            f"{self.cache_dir}/c_centers.pt",
        )

    def can_use_cache_vlad(self) -> bool:
        if self.cache_dir is None or not os.path.exists(self.cache_dir):
            return False
        npz, pt = self._centers_paths()
        if os.path.exists(npz):
            return True
        if os.path.exists(pt):
            import importlib.util

            # a reference-exported .pt is only usable when torch can read
            # it — otherwise fit() must refit instead of crashing on import
            return importlib.util.find_spec("torch") is not None
        return False

    def can_use_cache_ids(
        self,
        cache_ids: Union[List[str], str, None],
        only_residuals: bool = False,
    ) -> bool:
        """Mirror of utilities.py:710-746 over this class's cache layout.
        We cache the final global descriptor per image (``<id>_v.npz``) and,
        for the residual API, the residual tensor (``<id>_r.npz``) —
        ``only_residuals`` checks the latter, matching what
        ``generate_res_vec(cache_id=...)`` actually reads/writes."""
        if not self.can_use_cache_vlad() or cache_ids is None:
            return False
        if isinstance(cache_ids, str):
            cache_ids = [cache_ids]
        suffix = "_r.npz" if only_residuals else "_v.npz"
        return all(
            os.path.exists(f"{self.cache_dir}/{cid}{suffix}")
            for cid in cache_ids
        )

    def _load_cached_centers(self) -> Optional[jnp.ndarray]:
        npz, pt = self._centers_paths()
        if os.path.exists(npz):
            z = _load_npz_or_none(npz)
            if z is not None and "centers" in z:
                return jnp.asarray(z["centers"], dtype=jnp.float32)
            if not os.path.exists(pt):
                return None  # torn npz, no .pt fallback
        # Reference-exported vocabulary (torch pickle) for strict parity runs.
        import torch  # local import: torch is optional at runtime

        t = torch.load(pt, map_location="cpu")
        return jnp.asarray(t.detach().cpu().numpy(), dtype=jnp.float32)

    # -- fitting ----------------------------------------------------------
    def fit(self, train_descs=None) -> None:
        """Build (or load) the vocabulary. ``train_descs``: [num_desc, D] or
        None when a cached vocabulary exists (utilities.py:749-791)."""
        self.kmeans = KMeans(self.num_clusters, mode=self.mode, seed=self.seed)
        if self.can_use_cache_vlad():
            centers = self._load_cached_centers()
            if centers is None and train_descs is None:
                raise ValueError(
                    f"cached vocabulary at {self.cache_dir} is unreadable "
                    "(torn write?) and no training descriptors were given")
            if centers is not None:
                if centers.shape[0] != self.num_clusters:
                    raise ValueError(
                        f"cached vocabulary at {self.cache_dir} has "
                        f"{centers.shape[0]} clusters but this VLAD is "
                        f"configured for {self.num_clusters} — wrong cache "
                        "directory?")
                if (self.desc_dim is not None
                        and int(centers.shape[1]) != self.desc_dim):
                    raise ValueError(
                        f"cached vocabulary dim {centers.shape[1]} != "
                        f"configured desc_dim {self.desc_dim}")
                self.c_centers = centers
                self.kmeans.centroids = self.c_centers
                if self.desc_dim is None:
                    self.desc_dim = int(self.c_centers.shape[1])
                return
        if train_descs is None:
            raise ValueError("No training descriptors given and no cache")
        train_descs = jnp.asarray(train_descs, dtype=jnp.float32)
        if self.desc_dim is None:
            self.desc_dim = int(train_descs.shape[1])
        if self.norm_descs:
            train_descs = l2_normalize(train_descs)
        self.kmeans.fit(train_descs)
        self.c_centers = self.kmeans.centroids
        if self.cache_dir is not None:
            _save_npz_atomic(
                self._centers_paths()[0], centers=np.asarray(self.c_centers)
            )

    def fit_and_generate(self, train_descs) -> jnp.ndarray:
        """[num_imgs, N, D] -> fit on all descriptors, return [num_imgs, C*D]."""
        train_descs = jnp.asarray(train_descs, dtype=jnp.float32)
        all_descs = train_descs.reshape(-1, train_descs.shape[-1])
        self.fit(all_descs)
        return self.generate_multi(train_descs)

    # -- generation -------------------------------------------------------
    def aggregate(self, descs: jnp.ndarray, mask=None) -> jnp.ndarray:
        """Device-resident aggregation: [B, N, D] (device or host) ->
        [B, C*D] *device* array — no host round-trip. This is the serving
        path's public entry point (DescriptorEngine fuses it into the
        extraction dispatch); ``generate``/``generate_multi`` wrap it with
        host conversion and per-image caching."""
        assert self.c_centers is not None, "Call fit() before generate()"
        return vlad_aggregate(
            descs,
            self.c_centers,
            vlad_mode=self.vlad_mode,
            dist_mode=self.mode,
            intra_norm=self.intra_norm,
            norm_descs=self.norm_descs,
            soft_temp=self.soft_temp,
            mask=mask,
        )

    # backward-compat alias (pre-public name)
    _aggregate = aggregate

    def vocab_key(self) -> str:
        """Short digest identifying the fitted vocabulary + aggregation
        params — cache keys for derived artifacts must include this so a
        refit (different vocab set / sub-sampling / settings) can never
        silently serve stale descriptors."""
        assert self.c_centers is not None, "Call fit() first"
        import hashlib

        h = hashlib.sha1(np.asarray(self.c_centers, np.float32).tobytes())
        h.update(
            f"{self.vlad_mode}_{self.mode}_{self.intra_norm}_"
            f"{self.norm_descs}_{self.soft_temp}".encode()
        )
        return h.hexdigest()[:12]

    def _v_path(self, cache_id: str) -> str:
        return f"{self.cache_dir}/{cache_id}_v.npz"

    def _load_v(self, cache_id) -> Optional[np.ndarray]:
        """Cached per-image descriptor, or None (missing/torn = miss)."""
        if cache_id is None or self.cache_dir is None:
            return None
        z = _load_npz_or_none(self._v_path(cache_id))
        return None if z is None or "vlad" not in z else z["vlad"]

    def _save_v(self, cache_id, vlad) -> None:
        if cache_id is not None and self.cache_dir is not None:
            _save_npz_atomic(self._v_path(cache_id), vlad=np.asarray(vlad))

    def generate(self, query_descs, cache_id: Optional[str] = None) -> jnp.ndarray:
        """[N, D] -> [C*D]. ``cache_id`` stores/loads the global descriptor
        (the reference caches residuals+labels; we cache the result, which is
        strictly smaller and sufficient to resume — SURVEY.md §5 checkpoint)."""
        hit = self._load_v(cache_id)
        if hit is not None:
            return jnp.asarray(hit)
        out = self._aggregate(jnp.asarray(query_descs, dtype=jnp.float32))
        self._save_v(cache_id, out)
        return out

    def generate_multi(self, multi_query, cache_ids=None) -> jnp.ndarray:
        """[B, N, D] (or list of [N_i, D]) -> [B, C*D].

        A rectangular batch is one device call. A ragged list is bucketed by
        token count (XLA static shapes) and processed bucket-per-call.
        """
        if isinstance(multi_query, (list, tuple)) and not all(
            q.shape == multi_query[0].shape for q in multi_query
        ):
            return self._generate_ragged(list(multi_query), cache_ids)
        # Serve fully-cached requests without recomputation (resume path;
        # a torn file is a miss and the batch recomputes).
        if cache_ids is not None and self.cache_dir is not None:
            hits = [self._load_v(cid) for cid in cache_ids]
            if all(h is not None for h in hits):
                return jnp.asarray(np.stack(hits))
        batch = jnp.asarray(np.stack([np.asarray(q) for q in multi_query]))
        out = self._aggregate(batch)
        if cache_ids is not None and self.cache_dir is not None:
            for cid, v in zip(cache_ids, out):
                self._save_v(cid, v)
        return out

    def _generate_ragged(self, queries: List, cache_ids) -> jnp.ndarray:
        """Pad to per-bucket max token count and mask — one compile per bucket
        size instead of per image."""
        if cache_ids is None:
            cache_ids = [None] * len(queries)
        d = queries[0].shape[-1]
        lengths = [int(q.shape[0]) for q in queries]
        # Bucket boundaries: powers-of-two style to bound compilations.
        def bucket(n):
            b = 64
            while b < n:
                b *= 2
            return b

        out = np.zeros((len(queries), self.num_clusters * d), dtype=np.float32)
        by_bucket = {}
        for i, q in enumerate(queries):
            hit = self._load_v(cache_ids[i]) if self.cache_dir is not None \
                else None
            if hit is not None and hit.shape == out[i].shape:
                out[i] = hit  # resume path: cached images skip the device
                continue
            by_bucket.setdefault(bucket(lengths[i]), []).append(i)
        for bsize, idxs in by_bucket.items():
            padded = np.zeros((len(idxs), bsize, d), dtype=np.float32)
            mask = np.zeros((len(idxs), bsize), dtype=np.float32)
            for j, i in enumerate(idxs):
                padded[j, : lengths[i]] = np.asarray(queries[i], dtype=np.float32)
                mask[j, : lengths[i]] = 1.0
            res = self._aggregate(jnp.asarray(padded), mask=jnp.asarray(mask))
            for j, i in enumerate(idxs):
                out[i] = np.asarray(res[j])
                self._save_v(cache_ids[i], out[i])
        return jnp.asarray(out)

    # -- residual API (parity with utilities.py:928-1008) ------------------
    def generate_res_vec(self, query_descs, cache_id: Optional[str] = None):
        assert self.c_centers is not None
        if cache_id is not None and self.cache_dir is not None:
            z = _load_npz_or_none(f"{self.cache_dir}/{cache_id}_r.npz")
            if z is not None and "res" in z:
                return jnp.asarray(z["res"])
        q = jnp.asarray(query_descs, dtype=jnp.float32)
        res = vlad_residuals(q, self.c_centers, norm_descs=self.norm_descs)
        if cache_id is not None and self.cache_dir is not None:
            _save_npz_atomic(f"{self.cache_dir}/{cache_id}_r.npz",
                             res=np.asarray(res))
        return res

    def generate_multi_res_vec(self, multi_query, cache_ids=None):
        return jnp.stack([self.generate_res_vec(q) for q in multi_query])
