"""ctypes bindings + on-demand build of the native C++ helpers
(``native/nnsearch.cpp``): exact NN search (FAISS IndexFlat stand-in) and
Recall@K accumulation for host-side retrieval where a device round-trip
doesn't pay (small query batches, CPU-only deployments).

The shared library builds lazily with g++ -O3 and caches next to the source;
everything degrades gracefully to the numpy path when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "nnsearch.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libnnsearch.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-pthread", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.nn_search.argtypes = [f32p, i64, i64, f32p, i64, i64, ctypes.c_int,
                              f32p, i64p]
    lib.nn_search.restype = None
    lib.nn_search_mt.argtypes = [f32p, i64, i64, f32p, i64, i64, ctypes.c_int,
                                 f32p, i64p, ctypes.c_int]
    lib.nn_search_mt.restype = None
    lib.recall_at_k.argtypes = [i64p, i64, i64, i64p, i64p, i64p, i64, i64,
                                i64, i64p]
    lib.recall_at_k.restype = None
    lib.ivf_search_mt.argtypes = [f32p, i64, i64, f32p, i64, i64p, i64p,
                                  f32p, i64, i64, i64, ctypes.c_int,
                                  f32p, i64p, ctypes.c_int]
    lib.ivf_search_mt.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------- image pipeline
_IP_SRC = os.path.join(os.path.dirname(_SRC), "imagepipe.cpp")
_IP_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libimagepipe.so")
_ip_lib: Optional[ctypes.CDLL] = None


def get_imagepipe() -> Optional[ctypes.CDLL]:
    """The native decode+resize+normalize pipeline (native/imagepipe.cpp) —
    the DataLoader-worker equivalent. Needs libjpeg/libpng dev headers to
    build; callers fall back to PIL when unavailable."""
    global _ip_lib
    if _ip_lib is not None:
        return _ip_lib
    try:
        if not os.path.exists(_IP_LIB_PATH) or (
            os.path.getmtime(_IP_LIB_PATH) < os.path.getmtime(_IP_SRC)
        ):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", _IP_SRC, "-o", _IP_LIB_PATH,
                   "-ljpeg", "-lpng"]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(_IP_LIB_PATH)
    except Exception:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), i64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, f32p, i64p, ctypes.c_int,
    ]
    lib.decode_batch.restype = i64
    lib.decode_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_void_p,
    ]
    lib.decode_probe.restype = ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.decode_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), i64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p, i64p, ctypes.c_int,
    ]
    lib.decode_batch_u8.restype = i64
    try:
        lib.decode_bytes_u8.argtypes = [
            ctypes.c_char_p, i64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_bytes_u8.restype = ctypes.c_int
    except AttributeError:
        # stale prebuilt .so without the newer symbol (mtime check skipped
        # the rebuild): keep the batch entry points working; the bytes
        # wrapper below degrades to its PIL-fallback contract
        pass
    _ip_lib = lib
    return _ip_lib


def imagepipe_available() -> bool:
    return get_imagepipe() is not None


def decode_batch(
    paths: Sequence[str],
    out_hw: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    n_threads: int = 0,
    antialias: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEG/PNG files -> normalized channels-last f32 [N, H, W, 3]
    on a native thread pool. Returns (batch, ok_mask); failed files decode
    to zeros with ok=0. antialias=False is tensor-mode torchvision bilinear
    (the reference pipelines' semantics, matching
    transforms.resize_tensor_bilinear); True is the PIL/antialiased
    convention (demo-style PIL resizes)."""
    lib = get_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable (no g++/libjpeg?)")
    h, w = out_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    ok = np.zeros(n, np.int64)
    # fsencode, not str.encode: directory listings can contain
    # surrogate-escaped non-UTF-8 names that open() accepts
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.decode_batch(
        arr, n, h, w, int(antialias),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        out, ok, n_threads,
    )
    return out, ok.astype(bool)


def decode_batch_u8(
    paths: Sequence[str],
    out_hw: Tuple[int, int],
    n_threads: int = 0,
    antialias: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEG/PNG files -> resized uint8 RGB [N, H, W, 3] (no
    normalization) — the low-bandwidth host->device transfer format (1/4 the
    bytes of the f32 pipeline; normalization runs on-device). Same bilinear
    resize as ``decode_batch``, rounded to 8 bits."""
    lib = get_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable (no g++/libjpeg?)")
    h, w = out_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    ok = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.decode_batch_u8(arr, n, h, w, int(antialias), out, ok, n_threads)
    return out, ok.astype(bool)


def decode_image(path: str) -> np.ndarray:
    """Raw decode of one JPEG/PNG file to uint8 RGB [H, W, 3] (no resize /
    normalization) — the native counterpart of ``PIL.Image.open().convert(
    'RGB')``, bit-identical for JPEG (same libjpeg IDCT). Two-call probe
    protocol of ``decode_probe``: dims first, then pixels."""
    lib = get_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable (no g++/libjpeg?)")
    w, h = ctypes.c_int(), ctypes.c_int()
    p = os.fsencode(path)
    if not lib.decode_probe(p, ctypes.byref(w), ctypes.byref(h), None):
        raise ValueError(f"failed to decode {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if not lib.decode_probe(
        p, ctypes.byref(w), ctypes.byref(h), out.ctypes.data_as(ctypes.c_void_p)
    ):
        raise ValueError(f"failed to decode {path}")
    return out


def decode_bytes_u8(
    data: bytes,
    *,
    size_hw: Optional[Tuple[int, int]] = None,
    max_edge: int = 0,
    antialias: bool = False,
) -> Optional[np.ndarray]:
    """Decode one in-memory JPEG/PNG and resize to uint8 RGB [H, W, 3] —
    the serving daemon's per-request fast path (bytes arrive over HTTP and
    never touch disk; serve_http._preprocess uint8 branch). ``size_hw``
    forces an exact output; otherwise the longest edge is capped at
    ``max_edge`` with a truncating scale (the daemon's `int(h * sc)`).
    Returns None when the native library is unavailable or the buffer does
    not decode — callers fall back to PIL."""
    lib = get_imagepipe()
    if lib is None or not hasattr(lib, "decode_bytes_u8"):
        return None  # unavailable or stale .so: caller falls back to PIL
    if size_hw is not None:
        fh, fw = int(size_hw[0]), int(size_hw[1])
        cap = max(fh, fw)
    else:
        fh = fw = 0
        if max_edge <= 0:
            raise ValueError("need size_hw or max_edge")
        # output dims never exceed max_edge: a scaled image is capped to
        # it, and an unscaled one had longest edge <= max_edge already
        cap = max_edge
    import ctypes as ct

    out = np.empty((cap, cap, 3), np.uint8)  # C writes only [got_h*got_w*3]
    gh, gw = ct.c_int(), ct.c_int()
    if not lib.decode_bytes_u8(data, len(data), fh, fw, int(max_edge),
                               int(antialias), out, ct.byref(gh),
                               ct.byref(gw)):
        return None
    return out.reshape(-1)[: gh.value * gw.value * 3].reshape(
        gh.value, gw.value, 3).copy()


def nn_search(
    db: np.ndarray, qu: np.ndarray, k: int, method: str = "cosine",
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k on host. Conventions match ops.retrieval.top_k_search
    (cosine -> IP descending; l2 -> squared distances ascending).
    ``n_threads`` 0 = hardware concurrency; queries split across threads,
    results are thread-count-invariant."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native nnsearch unavailable (no g++?)")
    db = np.ascontiguousarray(db, np.float32)
    qu = np.ascontiguousarray(qu, np.float32)
    k = min(k, db.shape[0])
    scores = np.empty((qu.shape[0], k), np.float32)
    idx = np.empty((qu.shape[0], k), np.int64)
    lib.nn_search_mt(db, db.shape[0], db.shape[1], qu, qu.shape[0], k,
                     0 if method == "cosine" else 1, scores, idx, n_threads)
    return scores, idx


def ivf_build(db: np.ndarray, n_cells: Optional[int] = None,
              n_iters: int = 20, seed: int = 0,
              method: str = "cosine") -> Tuple[np.ndarray, np.ndarray]:
    """Host IVF build: vectorized numpy Lloyd (BLAS matmuls) -> (cells
    [n_cells, d], CSR (indptr [n_cells+1], rows [n_db])). The inverted-file
    structure FAISS IndexIVFFlat uses, for the host search path."""
    db = np.ascontiguousarray(db, np.float32)
    n, d = db.shape
    if n_cells is None:
        n_cells = max(1, int(np.sqrt(n)))
    n_cells = min(n_cells, n)
    rng = np.random.default_rng(seed)
    pts = db
    if method == "cosine":
        pts = db / np.maximum(np.linalg.norm(db, axis=1, keepdims=True), 1e-12)
    cells = pts[rng.choice(n, n_cells, replace=False)].copy()

    def assign(c):
        if method == "cosine":
            cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                                1e-12)
            return np.argmax(pts @ cn.T, axis=1)
        d2 = -2.0 * (pts @ c.T) + np.sum(c ** 2, 1)[None]
        return np.argmin(d2, axis=1)

    for _ in range(n_iters):
        labels = assign(cells)
        counts = np.bincount(labels, minlength=n_cells).astype(np.float64)
        sums = np.zeros((n_cells, d), np.float64)
        np.add.at(sums, labels, pts)
        nz = counts > 0
        cells[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
    # final assignment with the FINAL centroids (a stale assignment would
    # place rows in cells the search-time probe never ranks first)
    labels = assign(cells)
    if method == "cosine":
        # unit-norm centroids: ivf_search_mt probes by raw q.c; normalizing
        # makes that ranking equal the assignment geometry argmax q^.c^
        cells = (cells / np.maximum(
            np.linalg.norm(cells, axis=1, keepdims=True), 1e-12)
        ).astype(np.float32)
    order = np.argsort(labels, kind="stable").astype(np.int64)
    indptr = np.zeros(n_cells + 1, np.int64)
    np.cumsum(np.bincount(labels, minlength=n_cells), out=indptr[1:])
    return cells, (indptr, order)


def ivf_search(
    db: np.ndarray, qu: np.ndarray, k: int, cells: np.ndarray,
    csr: Tuple[np.ndarray, np.ndarray], n_probe: int = 8,
    method: str = "cosine", n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host IVF probed search (native, threaded). Conventions match
    nn_search; full probe (n_probe >= n_cells) equals exact search."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native nnsearch unavailable (no g++?)")
    db = np.ascontiguousarray(db, np.float32)
    qu = np.ascontiguousarray(qu, np.float32)
    cells = np.ascontiguousarray(cells, np.float32)
    indptr, rows = (np.ascontiguousarray(a, np.int64) for a in csr)
    k = min(k, db.shape[0])
    scores = np.empty((qu.shape[0], k), np.float32)
    idx = np.empty((qu.shape[0], k), np.int64)
    lib.ivf_search_mt(db, db.shape[0], db.shape[1], cells, cells.shape[0],
                      indptr, rows, qu, qu.shape[0], k, n_probe,
                      0 if method == "cosine" else 1, scores, idx, n_threads)
    return scores, idx


def recall_at_k(
    retrieved: np.ndarray,
    gt_pos: Sequence[np.ndarray],
    top_k: Sequence[int],
    sub_sample_db: int = 1,
    sub_sample_qu: int = 1,
) -> dict:
    """Native Recall@K over CSR-packed ground truth."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native nnsearch unavailable (no g++?)")
    retrieved = np.ascontiguousarray(retrieved, np.int64)
    n_qu, max_k = retrieved.shape
    indptr = np.zeros(len(gt_pos) + 1, np.int64)
    for i, g in enumerate(gt_pos):
        indptr[i + 1] = indptr[i] + len(g)
    data = (np.concatenate([np.asarray(g, np.int64) for g in gt_pos])
            if indptr[-1] else np.zeros(0, np.int64))
    ks = np.asarray(sorted(top_k), np.int64)
    hits = np.zeros(len(ks), np.int64)
    lib.recall_at_k(retrieved, n_qu, max_k, indptr, data, ks, len(ks),
                    sub_sample_db, sub_sample_qu, hits)
    return {int(k): int(h) for k, h in zip(ks, hits)}
