"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()``
through DuckDB on the same sf dir, then compares row count, column
names, and values (column-name-sorted, row-order-insensitive, floats
exact-first with a reported max-abs-diff on mismatch).

Usage: python scripts/selfcheck.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted(
        df.itertuples(index=False, name=None),
        key=lambda t: tuple((v is None, str(_as_tuple(v))) for v in t),
    )
    return rows


def _as_tuple(v):
    """Array-valued cells arrive as list (Spark) vs np.ndarray (DuckDB);
    compare them as tuples so `!=` stays scalar."""
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_as_tuple(x) for x in v)
    return v


def values_match(a, b) -> tuple[bool, float]:
    if len(a) != len(b):
        return False, float("inf")
    maxdiff = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, float("inf")
        for va, vb in zip(ra, rb):
            va, vb = _as_tuple(va), _as_tuple(vb)
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    maxdiff = max(maxdiff, abs(va - vb))
            elif va != vb:
                return False, float("inf")
    return maxdiff == 0.0, maxdiff


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # Deliberately a VANILLA session (no zestdb confs) — the driver's
    # correctness gate constructs its own; round 1 failed 39 rows on a
    # conf only our factory set. queries() must work on any session.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("selfcheck").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    if name_filter:
        qs = {k: v for k, v in qs.items() if any(f in k for f in name_filter)}

    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {ex}")
            failures.append(name)
            continue
        status = []
        if name in oracles:
            try:
                odf = con.execute(oracles[name]).fetchdf()
            except Exception as ex:  # noqa: BLE001
                print(f"FAIL {name}: oracle error {ex}")
                failures.append(name)
                continue
            if sorted(sdf.columns) != sorted(odf.columns):
                status.append(f"SCHEMA spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            elif len(sdf) != len(odf):
                status.append(f"ROWS spark={len(sdf)} oracle={len(odf)}")
            else:
                ok, maxdiff = values_match(normalize(sdf), normalize(odf))
                if not ok:
                    status.append(f"VALUES maxdiff={maxdiff:.3e}")
        else:
            status.append("(rows-only)")
        dt = time.time() - t0
        if status and not status[0].startswith("("):
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name} rows={len(sdf)} {status[0] if status else ''} [{dt:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
