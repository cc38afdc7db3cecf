"""Generic manifested tables end-to-end: the lakehouse face of the
engine for YOUR corpus data — the walkthrough a user follows to put an
arbitrary DataFrame under the same ACID/table-format guarantees the
engine's own TS/KV tables enjoy.

    create_table          (schema + stats choice persisted, v0 commit)
      │ append_table      (lock-free CAS commit)
      │ merge_table       (keyed upsert, hit-file-only rewrite)
      │ delete_table_rows (predicate DELETE, NULL rows kept)
      │ optimize_table    (Z-ORDER clustered OPTIMIZE + vacuum)
      │ load(version=)    (time travel across all of the above)
      │ changes()         (net row diff between any two versions)
      ▼ zest_changes      (exactly-once streaming follow)

Run:  python examples/lakehouse_tables.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-step row counts and
the table history). Every step is one atomic manifest commit; a crash
anywhere leaves the table at the previous version.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str) -> dict:
    from zestdb_spark.storage import ZestStore

    store = ZestStore(spark, tempfile.mkdtemp(prefix="zest_lake_"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", F.length("text").alias("text_len")
    )
    out: dict = {}

    store.create_table(
        "corpus_docs",
        docs.filter(F.col("doc_id") % 2 == 1),
        stats_cols=("doc_id", "text_len"),
    )
    out["created"] = store.load("corpus_docs").count()

    store.append_table("corpus_docs", docs.filter(F.col("doc_id") % 2 == 0))
    out["after_append"] = store.load("corpus_docs").count()

    # keyed upsert: re-label the first 10 docs' source
    fixes = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("source", F.lit("curated"))
    )
    out["merge_touched_files"] = store.merge_table(
        "corpus_docs", fixes, key_cols=("doc_id",)
    )

    # predicate delete: drop empty documents
    out["delete_touched_files"] = store.delete_table_rows(
        "corpus_docs", "text_len = 0"
    )
    out["after_delete"] = store.load("corpus_docs").count()

    # cluster for multi-column file skipping, then prove time travel
    store.optimize_table(
        "corpus_docs",
        target_files=4,
        zorder_by=("text_len", "doc_id"),
        vacuum_retention_s=3600,  # keep history readable for the demo
    )
    out["after_optimize"] = store.load("corpus_docs").count()
    v0 = store.history("corpus_docs")[-1].version
    out["v0_rows"] = store.load("corpus_docs", version=v0).count()
    out["history_ops"] = [s.op for s in store.history("corpus_docs")]
    out["curated"] = (
        store.load("corpus_docs").filter(F.col("source") == "curated").count()
    )
    return out


def main() -> None:
    from zestdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse_tables")
    for k, v in run(spark, sf_dir).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
