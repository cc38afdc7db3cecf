"""Z-order layout (functions/layout.py): key math, content
preservation, and the property the op exists for — multi-column FILE
SKIPPING, asserted against real parquet footer stats.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from zestdb_spark.functions import layout

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    df = (
        spark.read.parquet(f"{_SF}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_ms"),
        )
        .cache()
    )
    df.count()
    return df


def test_key_bits_interleave(spark):
    """Hand-checkable 2-col key: with bits=2 and bounds (0,3) both
    columns scale to themselves; x=0b10, y=0b01 interleaves to
    y1 x1 y0 x0 = 0 1 1 0 — wait, bit b of col i lands at b*2+i:
    x bits at 0,2; y bits at 1,3 → x=2 (bits 10) → bit0=0,bit1=1 →
    positions 0→0, 2→1; y=1 → bit0=1→position 1, bit1=0→position 3:
    key = 0b0110 = 6."""
    df = spark.createDataFrame([(2, 1)], "x long, y long")
    got = df.select(
        layout.zorder_key_col(["x", "y"], {"x": (0, 3), "y": (0, 3)}, bits=2).alias(
            "z"
        )
    ).collect()[0]["z"]
    assert got == 6


def test_key_handles_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5)], "x long, y long"  # y degenerate (lo == hi)
    )
    rows = df.select(
        layout.zorder_key_col(["x", "y"], {"x": (0, 3), "y": (5, 5)}, 2).alias("z")
    ).collect()
    # null→0; y degenerate contributes 0 bits, x=3 lands at positions
    # 0 and 2 → 0b101
    assert [r["z"] for r in rows] == [0, 5]


def test_layout_preserves_content(orders, tmp_path):
    out = str(tmp_path / "z")
    layout.zorder_layout(orders, ["o_custkey", "o_ms"], n_files=8).write.parquet(out)
    a = orders.groupBy().agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    got = orders.sparkSession.read.parquet(out)
    b = got.groupBy().agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    assert (a["n"], a["s"]) == (b["n"], b["s"])
    assert "zkey" not in got.columns  # helper column dropped


def _overlapping_files(path: str, box: dict[str, tuple[int, int]]) -> int:
    """Files whose parquet footer min/max overlap the predicate box —
    the exact signal a stats-pruning reader uses to skip IO."""
    n = 0
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or name not in box:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        if all(
            mins.get(c, box[c][0]) <= hi and maxs.get(c, box[c][1]) >= lo
            for c, (lo, hi) in box.items()
        ):
            n += 1
    return n


def test_zorder_skips_files_on_both_dimensions(orders, tmp_path):
    """The reason to z-order: against an orderkey-sorted layout
    (uncorrelated with the predicate columns — every file overlaps
    everything) a 2-D box must overlap strictly fewer z-ordered
    files; and against a custkey-sorted layout, a DATE-ONLY predicate
    (which custkey sorting cannot skip for) must overlap fewer
    z-ordered files too."""
    n_files = 8
    spark = orders.sparkSession
    base = str(tmp_path / "by_orderkey")
    bycust = str(tmp_path / "by_custkey")
    zdir = str(tmp_path / "zorder")
    (orders.repartitionByRange(n_files, "o_orderkey")
           .sortWithinPartitions("o_orderkey").write.parquet(base))
    (orders.repartitionByRange(n_files, "o_custkey")
           .sortWithinPartitions("o_custkey").write.parquet(bycust))
    layout.zorder_layout(orders, ["o_custkey", "o_ms"], n_files).write.parquet(zdir)

    lo_c, hi_c = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).collect()[0]
    lo_t, hi_t = orders.agg(F.min("o_ms"), F.max("o_ms")).collect()[0]
    # a ~quarter-span box in each dimension
    box2d = {
        "o_custkey": (lo_c, lo_c + (hi_c - lo_c) // 4),
        "o_ms": (lo_t, lo_t + (hi_t - lo_t) // 4),
    }
    t_only = {"o_ms": (lo_t, lo_t + (hi_t - lo_t) // 8)}

    assert _overlapping_files(base, box2d) == n_files  # uncorrelated: no skip
    z2 = _overlapping_files(zdir, box2d)
    assert z2 < n_files, f"zorder must skip on the 2-D box (overlap {z2})"
    zt = _overlapping_files(zdir, t_only)
    ct = _overlapping_files(bycust, t_only)
    assert zt < ct, f"zorder({zt}) must beat custkey-sort({ct}) on date-only"

    # and the data read through the box is identical regardless of layout
    cond = (
        F.col("o_custkey").between(*box2d["o_custkey"])
        & F.col("o_ms").between(*box2d["o_ms"])
    )
    assert (
        spark.read.parquet(zdir).filter(cond).count()
        == orders.filter(cond).count()
    )


def test_stable_bounds_keep_keys_comparable(orders):
    """Incremental-write posture: fixing bounds at table creation must
    make the key a pure per-row function — two disjoint halves keyed
    with the SAME bounds produce identical keys to keying the union."""
    bounds = layout.zorder_bounds(orders, ["o_custkey", "o_ms"])
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 1)
    whole = {
        r["o_orderkey"]: r["zkey"]
        for r in layout.with_zorder_key(
            orders, ["o_custkey", "o_ms"], bounds=bounds
        ).select("o_orderkey", "zkey").collect()
    }
    parts = {}
    for half in (a, b):
        for r in layout.with_zorder_key(
            half, ["o_custkey", "o_ms"], bounds=bounds
        ).select("o_orderkey", "zkey").collect():
            parts[r["o_orderkey"]] = r["zkey"]
    assert parts == whole


def test_rejects_too_many_bits(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="exceeds 63"):
        layout.zorder_key_col(["x", "y"], {"x": (0, 1), "y": (0, 1)}, bits=32)


def test_zorder_clamps_rows_outside_pinned_bounds(spark):
    """ADVICE r9: under pinned bounds (incremental writes), a late row
    outside the creation-time bounds must scale to the EDGE bucket —
    not sign-extend into an arbitrary key pattern."""
    from zestdb_spark.functions import layout

    df = spark.createDataFrame(
        [(1, -50), (2, 0), (3, 100), (4, 150)], "id long, x long"
    )
    bounds = {"x": (0, 100)}
    keys = {
        r["id"]: r["zkey"]
        for r in layout.with_zorder_key(df, ["x"], bits=4, bounds=bounds).collect()
    }
    assert keys[1] == keys[2] == 0      # below lo → lo bucket
    assert keys[4] == keys[3] == 15     # above hi → hi bucket
    assert 0 <= keys[3] <= 15


def test_zorder_rejects_overflowing_span(spark):
    """(hi − lo) × (2^bits − 1) past BIGINT would wrap silently under
    Spark's non-ANSI arithmetic (while an oracle raises) — rejected at
    plan time with a usable bits hint."""
    from zestdb_spark.functions import layout

    bad = {"x": (0, 2**50)}
    with pytest.raises(ValueError, match="overflows BIGINT"):
        layout.zorder_key_col(["x"], bad, bits=16)
    # the suggested regime works: a coarser key for a huge span
    col = layout.zorder_key_col(["x"], bad, bits=12)
    assert col is not None
