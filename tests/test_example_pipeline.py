"""The examples/pretraining_pipeline.py walkthrough must keep running
end-to-end — it is the composition surface a reference user adopts
first, so a break in any stage's contract shows up here even if the
stage's own unit tests still pass in isolation."""

from __future__ import annotations

import importlib.util
import os


def test_example_pipeline_runs_and_narrows(spark):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "pretraining_pipeline.py"
    )
    spec = importlib.util.spec_from_file_location("example_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    counts = mod.run(spark, "/root/testdata/sf0.001")
    # each filter stage narrows (or holds) and nothing collapses to 0
    assert (
        counts["raw"]
        >= counts["rule_gated"]
        >= counts["probe_kept"]
        >= counts["deduped"]
        >= counts["decontaminated"]
        > 0
    )
    # the probe cut keeps roughly half of the gated docs (median split)
    assert counts["probe_kept"] >= counts["rule_gated"] * 0.4
    assert counts["bpe_merges"] > 0
    assert counts["unigram_pieces"] > 0
    assert counts["unigram_tokens"] > 0
    assert counts["sequences"] > 0
    # the shard plan places every packed sequence exactly once
    assert counts["sharded"] == counts["sequences"]


def test_example_ann_ladder_runs_with_sane_recall(spark):
    """The retrieval-ladder walkthrough must keep running end-to-end,
    with every tier's recall in a sane band: refine tiers above their
    pinned harness floors' neighborhood on THIS single query (looser
    than the 20-query harness floors — one query is noisier), and
    every approximate tier <= exact."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "ann_ladder.py"
    )
    spec = importlib.util.spec_from_file_location("example_ann_ladder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    r = mod.run(spark, "/root/testdata/sf0.001")
    assert r["exact"] == 1.0
    for tier in ("ivf_probe8", "pq_refine", "ivfpq_refine", "bq_refine"):
        assert 0.3 <= r[tier] <= 1.0, f"{tier} recall out of band: {r[tier]}"
    # the batch faces answer the SAME query identically to their
    # per-query siblings (the plans are pinned equal by test)
    assert r["knn_join_probe8"] == r["ivf_probe8"]
    assert 0.3 <= r["knn_join_pq_refine"] <= 1.0


def test_example_lakehouse_tables_runs(spark):
    """The generic-table walkthrough must keep running end-to-end with
    its documented invariants: append grows, delete shrinks by the
    empty docs, optimize preserves content, v0 time travel still reads
    the create, merge relabels exactly the 10 keys."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "lakehouse_tables.py"
    )
    spec = importlib.util.spec_from_file_location("example_lakehouse", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    assert out["after_append"] > out["created"] > 0
    assert out["after_delete"] <= out["after_append"]
    assert out["after_optimize"] == out["after_delete"]
    assert out["v0_rows"] == out["created"]
    assert out["curated"] == 10
    assert out["history_ops"][0] == "optimize"
    assert set(out["history_ops"]) >= {"create", "append", "merge", "optimize"}
