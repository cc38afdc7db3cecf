from zestdb_spark.io import fixtures  # noqa: F401
