"""redact_pii / url_stats semantics on text that actually contains
emails, long digit runs, and URLs (the driver corpus mostly doesn't,
so its oracle pass alone would be vacuous). Each case is checked
against the exact DuckDB SQL the driver oracle runs, plus hand-counted
expectations."""

from __future__ import annotations

import duckdb
import pytest

from zestdb_spark.functions import textstats

DOCS = [
    (0, ""),
    (1, "contact bob.smith+x@mail.example.org or root@a.io today"),
    (2, "call 5551234567 ext 12345 ref 999999"),  # 6+ digits twice, 12345 kept
    (3, "see https://docs.example.com/a/b and http://example.com plus https://docs.example.com/z"),
    (4, "no pii here at all"),
    (5, "edge@case.c x@y.zz 123456"),  # 1-letter TLD not an email; x@y.zz is
    (6, "<p>hello &amp; welcome</p> <br/> plain &lt;tag&gt; text"),
    (7, "a < b and b > c stay; <DIV CLASS='x'>inner</DIV>"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _duck(name: str):
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    out = con.execute(entry.oracle_sql()[name]).fetchall()
    con.close()
    return sorted(out)


def test_redact_pii(docs):
    rows = {r["doc_id"]: r for r in textstats.redact_pii(docs).collect()}
    assert rows[1]["text"] == "contact <EMAIL> or <EMAIL> today"
    assert rows[1]["n_redactions"] == 2
    # 5551234567 and 999999 redacted; the 5-digit 12345 survives
    assert rows[2]["text"] == "call <NUMBER> ext 12345 ref <NUMBER>"
    assert rows[2]["n_redactions"] == 2
    assert rows[4]["text"] == DOCS[4][1] and rows[4]["n_redactions"] == 0
    # edge@case.c has a 1-letter TLD → not matched; x@y.zz is; 123456 is
    assert rows[5]["text"] == "edge@case.c <EMAIL> <NUMBER>"
    assert rows[5]["n_redactions"] == 2
    assert sorted(tuple(r) for r in textstats.redact_pii(docs).collect()) == _duck(
        "text_redact"
    )


def test_url_stats(docs):
    rows = {r["doc_id"]: r for r in textstats.url_stats(docs).collect()}
    assert rows[3]["n_urls"] == 3
    assert rows[3]["domains"] == ["docs.example.com", "example.com"]
    assert rows[0]["n_urls"] == 0 and rows[0]["domains"] == []
    spark_rows = sorted(
        (r["doc_id"], r["n_urls"], tuple(r["domains"]))
        for r in textstats.url_stats(docs).collect()
    )
    duck_rows = sorted((a, b, tuple(c)) for a, b, c in _duck("text_url_stats"))
    assert spark_rows == duck_rows


def test_strip_markup(docs):
    rows = {r["doc_id"]: r for r in textstats.strip_markup(docs).collect()}
    # tags drop, entities single-decode, whitespace collapses
    assert rows[6]["text"] == "hello & welcome plain <tag> text"
    assert rows[6]["n_tags"] == 3
    # a bare '<' with no '>' is not a tag; '<DIV ...>' is
    assert rows[7]["text"] == "a < b and b > c stay; inner"
    assert rows[7]["n_tags"] == 2
    assert rows[4]["text"] == "no pii here at all" and rows[4]["n_tags"] == 0
    assert rows[0]["text"] == "" and rows[0]["n_tags"] == 0
    spark_rows = sorted(
        (r["doc_id"], r["text"], r["n_tags"])
        for r in textstats.strip_markup(docs).collect()
    )
    assert spark_rows == _duck("text_strip_markup")
