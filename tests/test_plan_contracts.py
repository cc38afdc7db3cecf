"""Physical-plan CONTRACTS for the headline operators — the properties
SCALE.md's shuffle audit and BASELINE.md's perf story rest on, pinned
against the actual `explain("formatted")` output so a refactor that
silently adds a shuffle, drops a pushed filter, or un-prunes a scan
fails here rather than surfacing as a 100 TB regression.

These run at sf0.001 (plan shape is scale-invariant)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ops(plan: str, name: str) -> int:
    """Count NUMBERED operator nodes — the tree and detail sections both
    mention operator names, so raw substring counts double-count."""
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def _shuffles(plan: str) -> int:
    return plan.count("hashpartitioning(")


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_top_k_pushes_partial_limit_below_exchange(spark, qs):
    plan = _plan(qs["li_last_n_multi"](spark, SF))
    # WindowGroupLimit appears BOTH below (Partial) and above (Final)
    # the single exchange: each map task ships at most k rows per group
    assert _ops(plan, "WindowGroupLimit") == 2
    assert _shuffles(plan) == 1


def test_scan_is_pruned_and_filter_pushed(spark, qs):
    plan = _plan(qs["li_since_filter"](spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # the scan reads only what the query needs, never all 16 columns
    assert len(read_cols) <= 5
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_span_scrub_single_gram_build(spark, qs):
    plan = _plan(qs["dedup_spans"](spark, SF))
    # one gram build (2 scans total: gram side + final join side),
    # two shuffles (gram window + per-doc rollup)
    assert _ops(plan, "Scan parquet") == 2
    assert _shuffles(plan) == 2


def test_revenue_join_broadcasts_the_dim(spark, qs):
    plan = _plan(qs["an_revenue_join"](spark, SF))
    # customer is dim-sized → broadcast; the fact⋈fact join shuffles
    assert "BroadcastHashJoin" in plan


def test_asof_join_is_single_shuffle(spark, qs):
    # union + last-ignorenulls window: ONE exchange, no range-join blowup
    plan = _plan(qs["tmp_asof_join"](spark, SF))
    assert _shuffles(plan) == 1


def test_rollup_aggregates_map_side(spark, qs):
    plan = _plan(qs["tmp_rollup_hour"](spark, SF))
    # partial aggregation before the exchange (map-side combine)
    assert _shuffles(plan) == 1
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "q",
    [
        "pipe_clean_corpus",
        "ev_retention",
        "an_mad",
        "dedup_minhash",
        "dedup_cross",
        # the MG candidate set is capacity × tasks in the worst case —
        # tens of millions of rows at cluster scale, past any broadcast
        # budget; the recount join must be AQE-decided
        "sk_heavy_hitters",
    ],
)
def test_no_forced_broadcast_on_data_dependent_sets(spark, qs, q):
    # These joins' small sides grow with the data (dup lists, per-user
    # cohorts, per-series stats) — a hint-forced broadcast bypasses
    # Spark's size safety net and OOMs at crawl scale. The logical plan
    # must carry NO ResolvedHint; AQE still broadcasts at runtime when
    # the set is actually small (that shows up physically, which is
    # fine and desired — this pins the absence of the FORCED hint).
    analyzed = qs[q](spark, SF)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_chunked_sessionize_no_forced_broadcast(spark):
    # the keys×chunks offset summary is bounded only when chunk_ms is
    # sized per the docstring — a hint-forced broadcast would bypass
    # Spark's size safety net for a data-dependent set. AQE still
    # broadcasts it at runtime when it is actually small.
    from zestdb_spark.operators import temporal

    df = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "cast(user_id as string) as series_id",
        "unix_millis(cast(ts as timestamp)) as timestamp",
        "value",
    )
    out = temporal.sessionize(df, gap_ms=3_600_000, chunk_ms=86_400_000)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_unigram_broadcasts_vocab(spark, qs):
    plan = _plan(qs["text_unigram"](spark, SF))
    # the count table and the 1-row total both arrive by broadcast —
    # the doc-side token stream is never shuffled by a join key
    assert _ops(plan, "BroadcastExchange") == 2
    assert _ops(plan, "SortMergeJoin") == 0
    assert _shuffles(plan) <= 3
