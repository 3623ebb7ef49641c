"""The --py-files dist zip must match the source tree byte-for-byte —
a stale zip means executors run OLD code against a newer driver (the
exact failure ADVICE r3 flagged when the pyarrow.fs routing landed after
the zip was built). Rebuild with scripts/make_dist.py."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "themis_search_engine_spark.zip")
PKG = os.path.join(REPO, "themis_search_engine_spark")


def test_dist_zip_matches_tree():
    assert os.path.exists(ZIP), "dist zip missing — run scripts/make_dist.py"
    with zipfile.ZipFile(ZIP) as zf:
        names = [
            n for n in zf.namelist()
            if n.endswith(".py")
            and n.startswith("themis_search_engine_spark/")
        ]
        assert names, "zip holds no package modules"
        stale, missing = [], []
        for n in names:
            src = os.path.join(REPO, n)
            if not os.path.exists(src):
                missing.append(n)
            elif zf.read(n) != open(src, "rb").read():
                stale.append(n)
        # and every tree module must be IN the zip
        absent = []
        zipped = set(names)
        for root, _, files in os.walk(PKG):
            for f in files:
                if not f.endswith(".py"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), REPO)
                if rel.replace(os.sep, "/") not in zipped:
                    absent.append(rel)
        assert not stale and not missing and not absent, (
            f"dist zip out of date — rerun scripts/make_dist.py "
            f"(stale={stale[:5]}, deleted={missing[:5]}, "
            f"unzipped={absent[:5]})"
        )
