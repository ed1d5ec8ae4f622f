"""Per-dataset download + format recipes — the ``datasets_vg/download_*.py``
layer (reference datasets_vg/: st_lucia, svox, eynsham, nordland,
san_francisco downloads; format_pitts30k/250k/mapillary/tokyo247 formatters).

Each recipe = (archive URLs, post-format callable). Downloads need network
egress (absent on locked-down TPU pods — run on a CPU host and mount the
result); formatting works on already-downloaded archives.
"""

from __future__ import annotations

import os
import zipfile
from typing import Callable, Dict, List, NamedTuple, Optional

from anyloc_tpu.data.tools import download_heavy_file  # noqa: F401


class DatasetRecipe(NamedTuple):
    urls: List[str]
    note: str


# Public archive locations (from the reference's download scripts).
RECIPES: Dict[str, DatasetRecipe] = {
    "st_lucia": DatasetRecipe(
        ["https://hpc-cloud-share.qut.edu.au/index.php/s/lwmrAGDGODI5SDi/download"],
        "10 day/afternoon drives; videos -> frames at GPS rate",
    ),
    "svox": DatasetRecipe(
        ["https://drive.google.com/uc?id=16iuk44c-fnSmgXJK8rC31MvIJkmcKeKf"],
        "multi-weather Oxford-area; gdown required",
    ),
    "eynsham": DatasetRecipe(
        ["https://www.robots.ox.ac.uk/~mobile/IJRR_2008_Dataset/images.tar"],
        "grayscale Ladybug captures",
    ),
    "nordland": DatasetRecipe(
        ["https://cloudstor.aarnet.edu.au/plus/s/2LiJb3s1NcjCLY9/download"],
        "season-aligned train journeys; summer=db winter=queries",
    ),
    "san_francisco": DatasetRecipe(
        ["https://stacks.stanford.edu/file/druid:vn158kj2087/PCIs.tar"],
        "SF landmark PCIs; queries from a separate visit",
    ),
    "pitts30k": DatasetRecipe(
        [],
        "obtain via the NetVLAD authors' agreement; then format_pitts(mat)",
    ),
}


def download_dataset(name: str, out_dir: str) -> List[str]:
    recipe = RECIPES[name]
    if not recipe.urls:
        raise RuntimeError(f"{name}: {recipe.note}")
    paths = []
    for i, url in enumerate(recipe.urls):
        dst = os.path.join(out_dir, name, f"archive_{i}")
        download_heavy_file(url, dst)
        paths.append(dst)
    return paths


def extract_archive(path: str, out_dir: str) -> None:
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    else:
        import tarfile

        with tarfile.open(path) as t:
            t.extractall(out_dir)


def format_pitts(mat_path: str, images_root: str, out_root: str,
                 split: str = "test") -> None:
    """Format pitts30k/250k from the NetVLAD .mat ground truth into the
    vg_bench layout (format_pitts30k.py recipe): read dbImageFns/qImageFns +
    utmDb/utmQ from the split .mat, copy into
    images/<split>/{database,queries} with @utm@ names."""
    from scipy.io import loadmat

    from anyloc_tpu.data.tools import build_utm_filename

    m = loadmat(mat_path)["dbStruct"].item()  # (1,1) struct array
    db_fns = [str(f[0].item()) for f in m[1]]
    utm_db = m[2].T
    # query filenames live under queries_real/ (format_pitts30k.py:51)
    q_fns = [os.path.join("queries_real", str(f[0].item())) for f in m[3]]
    utm_q = m[4].T
    import shutil

    for sub, fns, utms in (("database", db_fns, utm_db),
                           ("queries", q_fns, utm_q)):
        dst_dir = os.path.join(out_root, "images", split, sub)
        os.makedirs(dst_dir, exist_ok=True)
        for fn, (e, n) in zip(fns, utms):
            src = os.path.join(images_root, fn)
            dst = os.path.join(dst_dir, build_utm_filename(float(e), float(n)))
            shutil.copy2(src, dst)
