from zestdb_spark.functions import dedup, similarity, textstats, multimodal  # noqa: F401
