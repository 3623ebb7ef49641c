#!/usr/bin/env python
"""Large-sf correctness soak: the driver's CORRECTNESS gate, rerun at a
bigger scale factor (default the largest present under /root/testdata).

The per-round oracle gate runs at sf=0.01; skew/memory cliffs live above
it. This re-runs every registered query AND its DuckDB oracle SQL at the
soak sf, compares rows + schema + 6-dp values exactly like the driver
(and tests/test_driver_contract.py), and writes a CORRECTNESS-style JSON
artifact (CORRECTNESS_SOAK_<sf>.json at the repo root).

Usage: python scripts/soak_correctness.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v + 0.0:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from themis_search_engine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SOAK_DIR", "/root/testdata/sf0.1"
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    spark = get_spark("themis-soak")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_SOAK_ONLY")
    if only:  # targeted re-check: comma-separated query names
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in names}
    out: dict[str, dict] = {}
    for name, q in qs.items():
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = q(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            if name in osql:
                res = con.execute(osql[name])
                dcols = [d[0].lower() for d in res.description]
                drows = res.fetchall()
                rec = {
                    "rows_match": len(srows) == len(drows),
                    "schema_match": sorted(scols) == sorted(dcols),
                    "hash_match": _normalize(scols, srows)
                    == _normalize(dcols, drows),
                    "spark_rows": len(srows),
                    "oracle_rows": len(drows),
                    "err": None,
                }
            else:
                rec = {
                    "rows_match": len(srows) >= 0,
                    "schema_match": True,
                    "hash_match": None,  # rows-only (no SQL oracle)
                    "spark_rows": len(srows),
                    "oracle_rows": None,
                    "err": None,
                }
        except Exception as e:  # record, keep soaking
            rec = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and (
            rec["hash_match"] is not False
        )
        print(f"{name}: {'ok' if ok else 'FAIL'} {rec['sec']}s", flush=True)

    # subset runs must never clobber the full-registry artifact
    suffix = "_subset" if only else ""
    path = os.path.join(HERE, f"CORRECTNESS_SOAK_{tag}{suffix}.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": out}, fh, indent=1)
    bad = [
        k for k, v in out.items()
        if not (v["rows_match"] and v["schema_match"]
                and v["hash_match"] is not False)
    ]
    print(json.dumps({"soak_sf": tag, "total": len(out), "failed": bad}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
