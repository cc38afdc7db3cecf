from zestdb_spark.plans.plan import QueryPlan, Window  # noqa: F401
from zestdb_spark.plans.paths import compile_path, plan_to_path  # noqa: F401
from zestdb_spark.plans.compile import plan_to_dataframe  # noqa: F401
