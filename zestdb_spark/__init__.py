"""zestdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of me-box/zestdb (ReasonML IoT time-series +
key-value server), re-expressed Spark-first.

The reference's query surface (URI-path pipelines of window → filter →
aggregate over per-series time-series data, a three-format KV store, a
Hypercat catalog, pub/sub observation) is rebuilt on DataFrame / Spark SQL
/ Structured Streaming so that the same logical queries scale from one
node to a 100 TB cluster via Catalyst + Tungsten, with no custom physical
operators.

Layout:
  schema.py      — canonical StructTypes for the five engine tables
  session.py     — SparkSession factory tuned for the target
  storage.py     — table-backed store (parquet), ingest validation, upsert
  serializers.py — reference-shaped JSON results at the API edge
  plans/         — QueryPlan dataclass, URI-path + ZestQL front-ends,
                   plan → DataFrame compiler
  operators/     — window reads, tag filters, aggregates, KV, catalog,
                   deletes
  functions/     — scale extensions: dedup, similarity search, text
                   analysis, multimodal plumbing
  streaming/     — observation (pub/sub) layer on Structured Streaming
  io/            — driver-testdata → engine-table fixtures
"""

__version__ = "0.1.0"
