"""Build dist/owdp_etl_spark.zip for spark-submit --py-files.

Pure-Python package, no native deps: the zip is importable directly
from executors' PYTHONPATH (Spark adds --py-files archives to it)."""

from __future__ import annotations

import os
import zipfile

PKG = "oregonwaterdataportal_etl_spark"


def build(out_path: str | None = None) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = out_path or os.path.join(here, "dist", "owdp_etl_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(here, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, here))
    return out_path


if __name__ == "__main__":
    print(build())
