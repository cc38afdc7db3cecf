"""Stage decomposition of the MinHash-LSH family at the bench sf.

Times each pipeline prefix with the noop sink (guide §1.4) so the
incremental cost of every stage is visible: shingle array build,
hashed-shingle explode, 64-min signature agg, banding, candidate band
join, exact verification. Interleaved min-of-N cycles per stage.

Usage: python scripts/minhash_decomp.py [sf_dir] [cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from zestdb_spark.functions import dedup  # noqa: E402
from zestdb_spark.io import fixtures  # noqa: E402
from zestdb_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("minhash_decomp")

    def docs():
        fixtures.harden_session(spark)
        return fixtures.read_parquet(spark, f"{sf_dir}/documents.parquet")

    k, num_hashes, bands = 3, 64, 16
    rows_per_band = num_hashes // bands

    def stage_shingle():
        return dedup._spread(docs()).select(
            "doc_id", dedup._shingle_array(k).alias("sh")
        )

    def stage_hashed():
        return stage_shingle().select("doc_id", dedup._hashed_shingle_explode())

    def stage_sig():
        return stage_hashed().groupBy("doc_id").agg(
            *dedup._minhash_agg_cols(num_hashes)
        )

    def stage_banded():
        return dedup._banded_rows(stage_sig(), bands, rows_per_band)

    def stage_candidates():
        banded = dedup._banded_rows(stage_sig(), bands, rows_per_band)
        ca = banded.select(F.col("doc_id").alias("id_a"), "band", "sig")
        cb = banded.select(F.col("doc_id").alias("id_b"), "band", "sig")
        return (
            ca.join(cb, ["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def stage_full():
        return dedup.minhash_lsh_pairs(docs(), k, num_hashes, bands, 0.8)

    def stage_tokens():
        return dedup._spread(docs()).select(
            "doc_id",
            F.filter(F.split("text", " "), lambda t: t != "").alias("w"),
        )

    def stage_split_only():
        return dedup._spread(docs()).select(
            "doc_id", F.split("text", " ").alias("w")
        )

    stages = [
        ("split_only", stage_split_only),
        ("tokens_filtered", stage_tokens),
        ("shingle_array", stage_shingle),
        ("hashed_explode", stage_hashed),
        ("signatures", stage_sig),
        ("banded", stage_banded),
        ("candidates", stage_candidates),
        ("full_pairs", stage_full),
    ]

    best: dict[str, float] = {n: float("inf") for n, _ in stages}
    # warm
    for n, fn in stages:
        spark.catalog.clearCache()
        noop(fn())
    for _ in range(cycles):
        for n, fn in stages:
            spark.catalog.clearCache()
            best[n] = min(best[n], noop(fn()))
    for n, _ in stages:
        print(f"{n}: {best[n]:.3f}")


if __name__ == "__main__":
    main()
