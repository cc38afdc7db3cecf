from zestdb_spark.operators import (  # noqa: F401
    catalog,
    kv,
    temporal,
    ts_agg,
    ts_delete,
    ts_filter,
    ts_read,
)
