"""Custom data sources (SURVEY.md §7.3 "maybe-later custom DSv2").

``tail_source`` — per-series limit pushdown into the scan, the one
access pattern the native parquet reader cannot prune for.
``changes_source`` — streaming append feed over the snapshot-manifest
log: manifest versions as exactly-once Structured Streaming offsets.
"""

from zestdb_spark.sources.changes_source import ZestChangesDataSource
from zestdb_spark.sources.tail_source import ZestTailDataSource
from zestdb_spark.sources.tail_source import register as _register_tail

__all__ = ["ZestChangesDataSource", "ZestTailDataSource", "register"]


def register(spark) -> None:
    """Idempotently register every custom source on a session."""
    _register_tail(spark)
    spark.dataSource.register(ZestChangesDataSource)
