#!/usr/bin/env python
"""Build dist/themis_search_engine_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(HERE, "themis_search_engine_spark")


def make_dist(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(HERE, "dist")
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "themis_search_engine_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, HERE)
                    zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    print(make_dist())
