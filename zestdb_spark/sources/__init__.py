"""Custom data sources (SURVEY.md §7.3 "maybe-later custom DSv2").

``tail_source`` — per-series limit pushdown into the scan, the one
access pattern the native parquet reader cannot prune for.
"""

from zestdb_spark.sources.tail_source import ZestTailDataSource, register

__all__ = ["ZestTailDataSource", "register"]
