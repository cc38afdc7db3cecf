"""Query corpus + DuckDB oracle-SQL generation.

Every URI-path query in the correctness corpus is described ONCE as a
``QueryPlan``; this module lowers it two ways:
- ``plan_to_dataframe`` (plans/compile.py) → the Spark execution, and
- ``plan_to_duckdb_sql`` (here) → the equivalent ANSI SQL for DuckDB.

Both lowerings share the same deterministic tie-break total order
(operators/ts_read.py ``_DESC_ORDER``/``_ASC_ORDER``), so per-series
top-k picks identical row SETS even with timestamp collisions — the
reference's own sort is unstable on ties (SURVEY.md §2.5), we pin it.
"""

from __future__ import annotations

from zestdb_spark.plans.plan import QueryPlan

# DuckDB ORDER BY mirroring operators/ts_read.py. NULLS are explicit:
# DuckDB defaults to NULLS LAST for ASC (Spark: NULLS FIRST).
_DESC_SQL = (
    '"timestamp" DESC, value DESC, tag_name DESC NULLS LAST, '
    "tag_value DESC NULLS LAST, series_id DESC"
)
_ASC_SQL = (
    '"timestamp" ASC, value ASC, tag_name ASC NULLS FIRST, '
    "tag_value ASC NULLS FIRST, series_id ASC"
)
_BLOB_DESC_SQL = '"timestamp" DESC, data DESC, series_id DESC'
_BLOB_ASC_SQL = '"timestamp" ASC, data ASC, series_id ASC'

# sum/mean accumulate in DECIMAL(38,6) and sd floor-quantizes to 6 dp,
# mirroring operators/ts_agg.py's determinism strategy.
_EXACT_SUM = "CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
_AGG_SQL = {
    "sum": _EXACT_SUM,
    "count": "CAST(count(value) AS DOUBLE)",  # float count, src/numeric.re:41
    "min": "min(value)",
    "max": "max(value)",
    "mean": f"{_EXACT_SUM} / count(value)",
    "median": "median(value)",
    "sd": "floor(stddev_samp(value) * 1000000.0) / 1000000.0",
}


def plan_to_duckdb_sql(plan: QueryPlan, source_sql: str) -> str:
    """Lower ``plan`` to DuckDB SQL over ``source_sql`` (a SELECT that
    yields the ts-shaped rows, e.g. fixtures.TS_NUMERIC_FROM_EVENTS_SQL)."""
    blob = plan.store == "blob"
    cols = (
        'series_id, "timestamp", data'
        if blob
        else 'series_id, "timestamp", value, tag_name, tag_value'
    )
    ids_in = ", ".join(f"'{i}'" for i in plan.ids)
    sel = f"SELECT {cols} FROM ts WHERE series_id IN ({ids_in})"

    w = plan.window
    if w.op == "length":
        return (
            f"WITH ts AS ({source_sql}) "
            f"SELECT count(*) AS length FROM ({sel})"
        )

    desc_sql = _BLOB_DESC_SQL if blob else _DESC_SQL
    asc_sql = _BLOB_ASC_SQL if blob else _ASC_SQL
    if w.op in ("latest", "last"):
        n = 1 if w.op == "latest" else w.n
        win = (
            f"SELECT {cols} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY series_id ORDER BY {desc_sql}) AS rn "
            f"FROM ({sel})) WHERE rn <= {n}"
        )
    elif w.op in ("earliest", "first"):
        n = 1 if w.op == "earliest" else w.n
        win = (
            f"SELECT {cols} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY series_id ORDER BY {asc_sql}) AS rn "
            f"FROM ({sel})) WHERE rn <= {n}"
        )
    elif w.op == "since":
        win = f'{sel} AND "timestamp" >= {w.from_ms}'
    elif w.op == "range":
        win = f'{sel} AND "timestamp" BETWEEN {w.from_ms} AND {w.to_ms}'
    else:  # pragma: no cover
        raise ValueError(f"unknown window op {w.op!r}")

    body = f"SELECT * FROM ({win})"
    if plan.filter is not None:
        op, tag, val = plan.filter
        if op == "equals":
            body += f" WHERE tag_name = '{tag}' AND tag_value = '{val}'"
        else:  # contains — literal substring (src/filter.re:17-29)
            body += (
                f" WHERE tag_name = '{tag}' AND contains(tag_value, '{val}')"
            )

    if plan.agg is not None:
        return (
            f"WITH ts AS ({source_sql}) "
            f"SELECT {_AGG_SQL[plan.agg]} AS result FROM ({body})"
        )
    return f"WITH ts AS ({source_sql}) {body}"
