"""Dataset download/format tooling — the ``datasets_vg/`` layer of the
reference (util.py, format_*.py, map_builder.py), rebuilt without the
unavailable deps (utm / staticmap / requests are optional imports).

  * ``download_heavy_file`` — resilient download with exponential backoff
    (util.py:19-52 semantics; requires network egress, absent on TPU pods);
  * ``build_utm_filename`` / ``format_image_dir`` — the
    ``@utm_east@utm_north@...@.jpg`` naming convention every vg_bench layout
    dataset uses (e.g. datasets_vg/format_pitts30k.py);
  * ``latlon_to_utm`` — WGS84 -> UTM (own implementation; the 'utm' pip
    package isn't in this image);
  * ``build_map_from_dataset`` — dataset map figure from the UTM/GPS
    coordinates parsed out of filenames (map_builder.py:107-163; matplotlib
    scatter instead of downloading OSM tiles).
"""

from __future__ import annotations

import glob
import math
import os
import re
import shutil
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

RETRY_SECONDS = 2


def get_distance(coords_a, coords_b) -> float:
    return math.sqrt(
        (float(coords_b[0]) - float(coords_a[0])) ** 2
        + (float(coords_b[1]) - float(coords_a[1])) ** 2
    )


def download_heavy_file(url: str, output_path: str, attempts: int = 10) -> None:
    """Retry-with-backoff download (util.py:19-52). Needs egress."""
    import requests

    if os.path.exists(output_path):
        return
    os.makedirs("tmp", exist_ok=True)
    tmp = os.path.join("tmp", f"tmp_{int(time.time() * 1000)}")
    for attempt in range(attempts):
        try:
            req = requests.get(url, stream=True)
            req.raise_for_status()  # a 404 page must not be saved as data
            total = int(req.headers.get("content-length", 0))
            got = 0
            with open(tmp, "wb") as f:
                for chunk in req.iter_content(1 << 20):
                    f.write(chunk)
                    got += len(chunk)
            if total and got != total:
                raise RuntimeError(f"short read {got}/{total}")
            break
        except Exception:
            if os.path.exists(tmp):
                os.remove(tmp)
            if attempt < attempts - 1:
                time.sleep(min(RETRY_SECONDS ** attempt, 60))
    else:
        raise RuntimeError(f"couldn't download {output_path} from {url}")
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    shutil.move(tmp, output_path)


def is_valid_timestamp(ts: str) -> bool:
    """YYYYMMDD_hhmmss with all fields left-to-right optional (util.py:54+)."""
    return bool(re.fullmatch(r"(\d{4}(\d{2}(\d{2}(_(\d{2})(\d{2})?(\d{2})?)?)?)?)?", ts))


# ---------------------------------------------------------------------------
# UTM conversion (WGS84 -> UTM, standard Karney-free series approximation —
# the same math the 'utm' pip package implements)
# ---------------------------------------------------------------------------

def latlon_to_utm(lat: float, lon: float) -> Tuple[float, float, int, str]:
    """-> (easting, northing, zone_number, zone_letter)."""
    a = 6378137.0
    f = 1 / 298.257223563
    k0 = 0.9996
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    zone = int((lon + 180) / 6) + 1
    letters = "CDEFGHJKLMNPQRSTUVWXX"
    letter = letters[int((lat + 80) / 8)] if -80 <= lat <= 84 else "Z"
    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    phi = math.radians(lat)
    lam = math.radians(lon)
    n = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    t = math.tan(phi) ** 2
    c = ep2 * math.cos(phi) ** 2
    aa = math.cos(phi) * (lam - lon0)
    m = a * (
        (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024) * math.sin(2 * phi)
        + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * math.sin(4 * phi)
        - (35 * e2 ** 3 / 3072) * math.sin(6 * phi)
    )
    easting = k0 * n * (
        aa + (1 - t + c) * aa ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * ep2) * aa ** 5 / 120
    ) + 500000.0
    northing = k0 * (
        m + n * math.tan(phi) * (
            aa ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * aa ** 4 / 24
            + (61 - 58 * t + t ** 2 + 600 * c - 330 * ep2) * aa ** 6 / 720
        )
    )
    if lat < 0:
        northing += 10000000.0
    return easting, northing, zone, letter


# ---------------------------------------------------------------------------
# vg_bench filename convention
# ---------------------------------------------------------------------------

def build_utm_filename(
    utm_east: float,
    utm_north: float,
    heading: float = 0.0,
    timestamp: str = "",
    note: str = "",
    extension: str = "jpg",
) -> str:
    """``@utm_east@utm_north@...@.jpg`` (the 23-field convention; unused
    fields empty — matches the formatters in datasets_vg/format_*.py)."""
    fields = [f"{utm_east:.2f}", f"{utm_north:.2f}", "", "", "", "", "", "",
              "", f"{heading:.2f}", "", "", "", "", timestamp, note, ""]
    return "@" + "@".join(fields) + f"@.{extension}"


def parse_utm_filename(name: str) -> Tuple[float, float]:
    parts = os.path.basename(name).split("@")
    return float(parts[1]), float(parts[2])


def format_image_dir(
    src_dir: str,
    dst_dir: str,
    coords: Sequence[Tuple[float, float]],
    is_latlon: bool = False,
    move: bool = False,
    extension: str = "jpg",
) -> List[str]:
    """Rename/copy a directory of images into the vg_bench convention given
    per-image coordinates (the shared core of format_pitts30k/format_*)."""
    from anyloc_tpu.data.base import natsorted

    srcs = natsorted(glob.glob(os.path.join(src_dir, f"*.{extension}")))
    assert len(srcs) == len(coords), (len(srcs), len(coords))
    os.makedirs(dst_dir, exist_ok=True)
    out = []
    for src, (x, y) in zip(srcs, coords):
        if is_latlon:
            x, y, _, _ = latlon_to_utm(x, y)
        dst = os.path.join(dst_dir, build_utm_filename(x, y, extension=extension))
        (shutil.move if move else shutil.copy2)(src, dst)
        out.append(dst)
    return out


# ---------------------------------------------------------------------------
# Map rendering
# ---------------------------------------------------------------------------

def build_map_from_dataset(
    dataset_folder: str,
    output_path: Optional[str] = None,
    extension: str = "jpg",
):
    """Scatter-plot the database/query UTM positions parsed from filenames
    (map_builder.py:107-163 without OSM tile downloads). Returns the figure
    path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = {}
    for split in ("database", "queries"):
        paths = glob.glob(
            os.path.join(dataset_folder, "**", split, f"*.{extension}"),
            recursive=True,
        )
        if paths:
            groups[split] = np.array([parse_utm_filename(p) for p in paths])
    fig, ax = plt.subplots(figsize=(8, 8))
    colors = {"database": "tab:blue", "queries": "tab:red"}
    for split, xy in groups.items():
        ax.scatter(xy[:, 0], xy[:, 1], s=4, alpha=0.6,
                   color=colors[split], label=f"{split} ({len(xy)})")
    ax.set_xlabel("UTM east (m)")
    ax.set_ylabel("UTM north (m)")
    ax.legend()
    ax.set_aspect("equal")
    name = os.path.basename(os.path.normpath(dataset_folder))
    out = output_path or os.path.join(dataset_folder, f"map_{name}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out
