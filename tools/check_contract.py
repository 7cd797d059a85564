"""Local replica of the graft driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet at sf0.01, compare row count + (sorted-by-name) schema + order-
insensitive value hash. Run before handing over a round.

Usage: python tools/check_contract.py [--sf /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    """Driver-faithful cell canonicalization: the graft driver compares
    values after a pandas round-trip, where dtype differences are VISIBLE
    (DuckDB HUGEINT sums come back float64 and print '56.0' while a Spark
    long prints '56'). So: floats via repr (keeps the '.0'), ints via str —
    deliberately STRICTER than a `%.6g` collapse, matching the driver."""
    import datetime

    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL" if v is None else "NaN"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(rows: list[dict], cols: list[str]) -> str:
    lines = sorted(
        "|".join(norm_cell(r[c]) for c in cols) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    # dim-dependent oracles (plane-weight literals) must be generated
    # against the SAME sf dir the queries run on
    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf

    import duckdb

    import __spark_entry__ as entrymod
    from antnre_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passes, rows_only = [], [], []

    for name, fn in queries.items():
        if args.only and name not in args.only.split(","):
            continue
        try:
            sdf = fn(spark, args.sf)
            scols = sorted(sdf.columns)
            # pandas round-trip, like the driver: dtype differences visible
            spdf = sdf.toPandas()
            srows = spdf.to_dict("records")
        except Exception:
            failures.append((name, "SPARK ERROR:\n" + traceback.format_exc()))
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            continue
        try:
            opdf = con.execute(oracles[name]).fetch_df()
            ocols_raw = list(opdf.columns)
            orows = opdf.to_dict("records")
        except Exception:
            failures.append((name, "DUCKDB ERROR:\n" + traceback.format_exc()))
            continue
        ocols = sorted(ocols_raw)
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if scols != ocols:
            problems.append(f"schema spark={scols} duckdb={ocols}")
        else:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value hash spark={sh} duckdb={oh}")
                # show first differing normalized lines for debugging
                sset = sorted(
                    "|".join(norm_cell(r[c]) for c in scols) for r in srows
                )
                oset = sorted(
                    "|".join(norm_cell(r[c]) for c in ocols) for r in orows
                )
                diffs = [
                    f"  spark: {a}\n  duck : {b}"
                    for a, b in zip(sset, oset)
                    if a != b
                ][:3]
                only_s = [x for x in sset if x not in set(oset)][:2]
                only_o = [x for x in oset if x not in set(sset)][:2]
                problems.append(
                    "first diffs:\n" + "\n".join(diffs)
                    + ("\n  only-spark: " + " ; ".join(only_s) if only_s else "")
                    + ("\n  only-duck : " + " ; ".join(only_o) if only_o else "")
                )
        if problems:
            failures.append((name, "; ".join(problems)))
        else:
            passes.append((name, len(srows)))

    print(f"\nPASS ({len(passes)}):")
    for n, c in passes:
        print(f"  {n}: {c} rows")
    if rows_only:
        print(f"ROWS-ONLY ({len(rows_only)}):")
        for n, c in rows_only:
            print(f"  {n}: {c} rows")
    if failures:
        print(f"FAIL ({len(failures)}):")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
