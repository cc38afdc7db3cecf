from zestdb_spark.streaming.observe import ObserverRegistry  # noqa: F401
