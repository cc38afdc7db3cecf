"""Property-based Spark↔DuckDB oracle equivalence for the text
operators, on hypothesis-generated ASCII documents.

The corpus-level gate (scripts/selfcheck.py) only proves equivalence
on the driver's generated text; these tests prove the same SQL pair
agrees on arbitrary printable-ASCII input — multi-space runs, pure
punctuation, regex metacharacters inside the text, empty docs — which
is what the "byte-for-byte, RE2-compatible" claims actually promise.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import __spark_entry__ as entry

# printable ASCII incl. regex metacharacters, quotes, @, digits, spaces
_chars = st.sampled_from(
    list("abcde XY.@/:+-_%$#!?*()[]{}\\'\"0123456789  <>&;lt")
)
_doc = st.text(alphabet=_chars, min_size=0, max_size=60)
_corpus = st.lists(_doc, min_size=1, max_size=5).map(
    lambda ts: [(i, t) for i, t in enumerate(ts)]
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

#: text operators whose oracle must agree on ANY input, with plain
#: (hashable) output columns
_NAMES = [
    "text_token_count",
    "text_token_count_bpe",
    "text_punct_ratio",
    "text_quality",
    "text_langid",
    "text_repetition",
    "text_top_ngram",
    "text_gopher",
    "text_redact",
    "text_strip_markup",
    "text_fingerprint",
    "text_chunks",
]

_ORACLES = entry.oracle_sql()
_QUERIES = entry.queries()


def _duck_rows(name: str, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.execute(_ORACLES[name]).fetchall()
    con.close()
    return out


def _norm(rows):
    return sorted(tuple(r) for r in rows)


class _Dir:
    """Quacks like an sf_dir for queries() but serves a literal frame."""


@given(rows=_corpus)
@_SETTINGS
@pytest.mark.parametrize("name", _NAMES)
def test_text_oracle_equivalence(spark, name, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # queries() loads parquet; drive the operator directly through the
    # same callables the entry uses by monkey-serving the frame
    import zestdb_spark.functions.packing as packing
    import zestdb_spark.functions.textstats as textstats

    fn = {
        "text_token_count": textstats.token_count,
        "text_token_count_bpe": textstats.token_count_bpe,
        "text_punct_ratio": textstats.punct_ratio,
        "text_quality": textstats.quality_score,
        "text_langid": textstats.lang_id,
        "text_repetition": textstats.repetition_stats,
        "text_top_ngram": textstats.top_ngram_frac,
        "text_gopher": textstats.gopher_quality,
        "text_redact": textstats.redact_pii,
        "text_strip_markup": textstats.strip_markup,
        "text_fingerprint": textstats.fingerprint,
        "text_chunks": lambda d: packing.chunk_tokens(d, 64),
    }[name]
    assert _norm(fn(df).collect()) == _norm(_duck_rows(name, rows))


# word-built docs from a tiny vocab so shingles/hashes collide across
# docs and the pair operators produce non-trivial output
_word_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "x"]), min_size=0, max_size=10
).map(" ".join)
_word_corpus = st.lists(_word_doc, min_size=1, max_size=5).map(
    lambda ts: [(i, t) for i, t in enumerate(ts)]
)


@given(rows=_word_corpus)
@_SETTINGS
@pytest.mark.parametrize("name", ["dedup_ngram_jaccard", "text_winnow", "dedup_simhash"])
def test_hash_oracle_equivalence(spark, name, rows):
    from zestdb_spark.functions import dedup, textstats

    df = spark.createDataFrame(rows, "doc_id long, text string")
    fn = {
        "dedup_ngram_jaccard": lambda d: dedup.jaccard_pairs(d, 3, 0.8),
        "text_winnow": lambda d: textstats.winnow_fingerprints(d, 8, 4),
        "dedup_simhash": lambda d: dedup.simhash_pairs(d, 3),
    }[name]
    assert _norm(fn(df).collect()) == _norm(_duck_rows(name, rows))


@given(rows=_word_corpus)
@_SETTINGS
def test_unigram_oracle_equivalence(spark, rows):
    """ln() portability under the q6 floor on arbitrary count ratios —
    the property the graded text_unigram row bets on."""
    from zestdb_spark.functions import corpus_ops

    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _norm(corpus_ops.unigram_logprob(df).collect()) == _norm(
        _duck_rows("text_unigram", rows)
    )


@given(rows=_word_corpus)
@_SETTINGS
def test_bigram_oracle_equivalence(spark, rows):
    from zestdb_spark.functions import corpus_ops

    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _norm(corpus_ops.bigram_logprob(df).collect()) == _norm(
        _duck_rows("text_bigram", rows)
    )


# 2-word vocab, 8-12 token docs: identical 8-token runs across docs are
# likely enough that the scrub path actually fires under hypothesis
_span_doc = st.lists(
    st.sampled_from(["a", "b"]), min_size=0, max_size=12
).map(" ".join)
_span_corpus = st.lists(_span_doc, min_size=1, max_size=5).map(
    lambda ts: [(i, t) for i, t in enumerate(ts)]
)


@given(rows=_span_corpus)
@_SETTINGS
def test_scrub_spans_oracle_equivalence(spark, rows):
    from zestdb_spark.functions import corpus_ops

    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _norm(corpus_ops.scrub_dup_spans(df, 8, 2).collect()) == _norm(
        _duck_rows("dedup_spans", rows)
    )


# 64-dim float32 vectors (the LSH/IVF oracles embed 64-dim literal
# planes); components bounded away from zero so norms never vanish
# (zero-norm cosine is out of contract on both engines)
_component = st.tuples(
    st.floats(min_value=0.0009765625, max_value=2.0, allow_nan=False, width=32),
    st.booleans(),
).map(lambda t: t[0] if t[1] else -t[0])
_vec = st.lists(_component, min_size=64, max_size=64)
_embs = st.lists(_vec, min_size=2, max_size=5).map(
    lambda vs: [(i, v) for i, v in enumerate(vs)]
)

_VEC_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _duck_vec_rows(name: str, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    out = con.execute(_ORACLES[name]).fetchall()
    con.close()
    return out


@given(rows=_embs)
@_VEC_SETTINGS
@pytest.mark.parametrize(
    "name", ["sim_topk_bruteforce", "dedup_embedding_cosine", "sim_lsh_bucketed_pairs"]
)
def test_vector_oracle_equivalence(spark, name, rows):
    """The docstring claim under test: F.aggregate's left fold over
    zip_with is bit-identical to DuckDB list_dot_product, so cosine
    scores (q6-floored) hash-match on arbitrary float32 vectors."""
    from zestdb_spark.functions import dedup, similarity

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fn = {
        "sim_topk_bruteforce": lambda d: similarity.cosine_topk(d, 0, 10),
        "dedup_embedding_cosine": lambda d: dedup.embedding_dup_pairs(d, 0.45),
        "sim_lsh_bucketed_pairs": lambda d: similarity.lsh_bucketed_pairs(d, 0.45),
    }[name]
    assert _norm(fn(df).collect()) == _norm(_duck_vec_rows(name, rows))
