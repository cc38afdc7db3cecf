"""Spark SQL entry point — the third front-end (SURVEY.md §7.1 step 7).

Registers the engine tables (and optionally the driver testdata
mappings) as temp views so plain ``spark.sql`` works against the same
data the path/ZestQL front-ends query. Catalyst produces identical
plans either way; this is for users who prefer SQL.

Also registers ``zest_*`` helper SQL: the reference's window reads as
parameterizable SQL strings.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from zestdb_spark.storage import ZestStore


def register_store_views(store: ZestStore) -> list[str]:
    """Expose every engine table as a temp view (ts_numeric, ts_blob,
    kv_json, kv_text, kv_binary, catalog_items, audit)."""
    names = ["ts_numeric", "ts_blob", "kv_json", "kv_text", "kv_binary", "catalog_items", "audit"]
    for name in names:
        store.load(name).createOrReplaceTempView(name)
    return names


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose the driver testdata parquet + the engine-table mappings
    (events→ts_numeric etc., io/fixtures.py) as temp views."""
    from zestdb_spark.io import fixtures

    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        fixtures.read_parquet(spark, f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    fixtures.ts_numeric_from_events(spark, sf_dir).createOrReplaceTempView("ts_numeric_events")
    fixtures.ts_blob_from_events(spark, sf_dir).createOrReplaceTempView("ts_blob_events")
    fixtures.ts_numeric_from_lineitem(spark, sf_dir).createOrReplaceTempView("ts_numeric_lineitem")
    return tables + ["ts_numeric_events", "ts_blob_events", "ts_numeric_lineitem"]


def last_n_sql(view: str, ids: list[str], n: int) -> str:
    """Reference ``last/n`` as SQL over a ts view (per-series top-k with
    the engine's deterministic tie-break). Series ids are DATA, not
    SQL: quotes are doubled so an id like "o'brien" renders as a valid
    literal instead of breaking (or rewriting) the statement."""
    id_list = ", ".join("'" + i.replace("'", "''") + "'" for i in ids)
    return f"""
      SELECT series_id, timestamp, value, tag_name, tag_value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY series_id
          ORDER BY timestamp DESC, value DESC, tag_name DESC NULLS LAST,
                   tag_value DESC NULLS LAST, series_id DESC) AS rn
        FROM {view} WHERE series_id IN ({id_list})
      ) WHERE rn <= {int(n)}
    """
