"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated in pairs from shared
``QueryPlan`` objects (zestdb_spark/corpus.py) so Spark execution and
the DuckDB oracle are structurally identical. Extension operators
(dedup / similarity / text analysis) add hand-written pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zestdb_spark.corpus import plan_to_duckdb_sql
from zestdb_spark.io import fixtures
from zestdb_spark.plans import compile_path, plan_to_dataframe

# --------------------------------------------------------------------------
# ZestDB URI-path corpus: name → (path, source). Every §2 read operator:
# windows {latest,earliest,last/n,first/n,since,range,length} × filters
# {none, equals, contains, missing-tag} × aggs {none + all 7} × ids
# {single, multi} over both the events mapping and the lineitem volume
# mapping, plus blob reads.
# Time constants: events span Jan 2024 (epoch-ms), lineitem ships 1994-98.
_T_JAN10 = 1704844800000  # 2024-01-10
_T_JAN15 = 1705276800000  # 2024-01-15
_T_JAN20 = 1705708800000  # 2024-01-20
_T_1996 = 820454400000  # 1996-01-01
_T_1997 = 852076800000  # 1997-01-01

_EVENTS = ("events", fixtures.ts_numeric_from_events, fixtures.TS_NUMERIC_FROM_EVENTS_SQL)
_LINEITEM = (
    "lineitem",
    fixtures.ts_numeric_from_lineitem,
    fixtures.TS_NUMERIC_FROM_LINEITEM_SQL,
)
_BLOB = ("blob", fixtures.ts_blob_from_events, fixtures.TS_BLOB_FROM_EVENTS_SQL)

PATH_CORPUS: dict[str, tuple[str, tuple]] = {
    # windows
    "ts_latest_single": ("/ts/click/latest", _EVENTS),
    "ts_latest_multi": ("/ts/click,view,error/latest", _EVENTS),
    "ts_earliest_multi": ("/ts/signup,purchase/earliest", _EVENTS),
    "ts_last_n_single": ("/ts/click/last/100", _EVENTS),
    "ts_last_n_multi": ("/ts/click,view/last/50", _EVENTS),
    "ts_first_n_multi": ("/ts/error,signup/first/25", _EVENTS),
    "ts_last_overcount": ("/ts/signup/last/1000000", _EVENTS),
    "ts_since": (f"/ts/view/since/{_T_JAN15}", _EVENTS),
    "ts_range": (f"/ts/purchase/range/{_T_JAN10}/{_T_JAN20}", _EVENTS),
    "ts_range_point": (f"/ts/purchase/range/{_T_JAN15}/{_T_JAN15}", _EVENTS),
    "ts_length_multi": ("/ts/click,view/length", _EVENTS),
    "ts_missing_series": ("/ts/never_written/last/10", _EVENTS),
    # filters
    "filter_equals": (f"/ts/click/since/{_T_JAN10}/filter/k/equals/42", _EVENTS),
    "filter_contains": ("/ts/view/last/200/filter/k/contains/7", _EVENTS),
    "filter_missing_tag": ("/ts/click/last/100/filter/zz/equals/1", _EVENTS),
    "filter_equals_multi": (
        f"/ts/click,view,error/range/{_T_JAN10}/{_T_JAN20}/filter/k/equals/7",
        _EVENTS,
    ),
    # aggregates (bare and filtered)
    "agg_count": (f"/ts/click/since/{_T_JAN15}/count", _EVENTS),
    "agg_min": (f"/ts/click,view/range/{_T_JAN10}/{_T_JAN20}/min", _EVENTS),
    "agg_max": ("/ts/error/last/500/max", _EVENTS),
    "agg_sum": (f"/ts/purchase/range/{_T_JAN10}/{_T_JAN15}/sum", _EVENTS),
    "agg_mean": (f"/ts/view/since/{_T_JAN20}/mean", _EVENTS),
    "agg_median": (f"/ts/click,view/range/{_T_JAN10}/{_T_JAN20}/median", _EVENTS),
    "agg_sd": (f"/ts/error/since/{_T_JAN10}/sd", _EVENTS),
    "agg_filtered_sum": (
        f"/ts/click,view/range/{_T_JAN10}/{_T_JAN20}/filter/k/equals/7/sum",
        _EVENTS,
    ),
    "agg_filtered_median": (
        "/ts/click/last/1000/filter/k/contains/3/median",
        _EVENTS,
    ),
    "agg_empty_window": (
        f"/ts/click/range/{_T_JAN15}/{_T_JAN15}/filter/k/equals/zzz/mean",
        _EVENTS,
    ),
    "agg_sd_single_row": ("/ts/click/latest/sd", _EVENTS),
    # blob store
    "blob_last_n": ("/ts/blob/click,view/last/20", _BLOB),
    "blob_since": (f"/ts/blob/error/since/{_T_JAN20}", _BLOB),
    "blob_length": ("/ts/blob/click/length", _BLOB),
    # lineitem volume mapping (bench-weight queries)
    "li_last_n_multi": ("/ts/li_A,li_N,li_R/last/100", _LINEITEM),
    "li_since_filter": (
        f"/ts/li_A/since/{_T_1996}/filter/status/equals/F",
        _LINEITEM,
    ),
    "li_range_sum": (f"/ts/li_N,li_R/range/{_T_1996}/{_T_1997}/sum", _LINEITEM),
    "li_range_median": (f"/ts/li_A/range/{_T_1996}/{_T_1997}/median", _LINEITEM),
    "li_length": ("/ts/li_A,li_N,li_R/length", _LINEITEM),
}


def _make_path_query(path: str, load) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return plan_to_dataframe(compile_path(path), load(spark, sf_dir))

    return run


# ------------------------------------------------------------- KV / catalog

def _kv_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zestdb_spark.operators import kv

    return kv.keys(fixtures.kv_json_from_nation(spark, sf_dir), "ASIA")


def _kv_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zestdb_spark.operators import kv

    return kv.count(fixtures.kv_json_from_nation(spark, sf_dir), "AMERICA")


def _kv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zestdb_spark.operators import kv

    return kv.read(fixtures.kv_json_from_nation(spark, sf_dir), "EUROPE", "NATION_13")


def _catalog_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fixtures.catalog_items_from_tables(spark, sf_dir)


_KV_SQL = {
    "kv_keys": (
        f"WITH kv AS ({fixtures.KV_JSON_FROM_NATION_SQL}) "
        "SELECT key FROM kv WHERE id = 'ASIA'"
    ),
    "kv_count": (
        f"WITH kv AS ({fixtures.KV_JSON_FROM_NATION_SQL}) "
        "SELECT count(*) AS count FROM kv WHERE id = 'AMERICA'"
    ),
    "kv_read": (
        f"WITH kv AS ({fixtures.KV_JSON_FROM_NATION_SQL}) "
        "SELECT value FROM kv WHERE id = 'EUROPE' AND key = 'NATION_13'"
    ),
    "catalog_get": fixtures.CATALOG_ITEMS_SQL,
}

# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2): per-series top-100 → tag filter →
    max, i.e. /ts/click,view/last/100/filter/k/equals/7/max."""
    src = fixtures.ts_numeric_from_events(spark, "/root/testdata/sf0.001")
    plan = compile_path("/ts/click,view/last/100/filter/k/equals/7/max")
    return plan_to_dataframe(plan, src)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (path, (_, load, _sql)) in PATH_CORPUS.items():
        out[name] = _make_path_query(path, load)
    out["kv_keys"] = _kv_keys
    out["kv_count"] = _kv_count
    out["kv_read"] = _kv_read
    out["catalog_get"] = _catalog_get
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (path, (_, _load, sql)) in PATH_CORPUS.items():
        out[name] = plan_to_duckdb_sql(compile_path(path), sql)
    out.update(_KV_SQL)
    return out
