from zestdb_spark.operators import ts_read, ts_filter, ts_agg, kv, catalog, ts_delete  # noqa: F401
