"""Property-based tests (hypothesis) for the packing and hygiene
operators: a Python list model re-derives the expected output for
arbitrary generated corpora and Spark must agree exactly.

Invariants that unit examples can't sweep:
- chunk_tokens: chunks reassemble every doc; all chunks but the last
  are exactly chunk_size.
- pack_spans: blocks partition the concatenated stream (every block
  full except the last), spans per doc are contiguous and complete,
  and the result is invariant to the bucket size used by the
  distributed prefix sum.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.functions import packing

# small token alphabet with repeats; docs of 0..12 tokens; extra spaces
_doc_text = st.lists(
    st.sampled_from(["a", "bb", "ccc", "d"]), min_size=0, max_size=12
).map(" ".join)

_corpus = st.lists(_doc_text, min_size=0, max_size=8).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    schema = "doc_id long, text string"
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


@given(rows=_corpus, c=st.integers(min_value=1, max_value=5))
@_SETTINGS
def test_chunks_reassemble(spark, rows, c):
    got = packing.chunk_tokens(_df(spark, rows), c).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert chunks == []
            continue
        # full chunks except possibly the last; reassembly is exact
        assert [r["n_tokens"] for r in chunks[:-1]] == [c] * (len(chunks) - 1)
        assert 1 <= chunks[-1]["n_tokens"] <= c
        assert " ".join(r["chunk_text"] for r in chunks) == " ".join(toks)


@given(rows=_corpus, s=st.integers(min_value=1, max_value=7),
       bucket=st.sampled_from([1, 2, 4096]))
@_SETTINGS
def test_pack_spans_model(spark, rows, s, bucket):
    got = sorted(
        tuple(r) for r in packing.pack_spans(_df(spark, rows), s, bucket=bucket).collect()
    )
    # Python model: concatenate in doc_id order, cut every s tokens
    expected = []
    off = 0
    for doc_id, text in sorted(rows):
        n = len([t for t in text.split(" ") if t])
        if n == 0:
            continue
        pos = 0
        while pos < n:
            block = (off + pos) // s
            take = min(n - pos, (block + 1) * s - (off + pos))
            expected.append((block, doc_id, pos, (off + pos) % s, take))
            pos += take
        off += n
    assert got == sorted(expected)


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=(1 << 62)),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    s=st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_pack_spans_adversarial_sparse_ids(spark, ids, s):
    """Doc ids sparse across the full int64 range (far past 2^53, where
    double math would corrupt bucketing and offsets): the packed spans
    must still match the exact Python model at the default bucket —
    the level-2 prefix sum sees one subtotal row per distinct
    doc_id div 4096, however far apart the ids are."""
    rows = [(i, "a b c"[: 2 * ((i % 3) + 1) - 1]) for i in ids]
    got = sorted(tuple(r) for r in packing.pack_spans(_df(spark, rows), s).collect())
    expected = []
    off = 0
    for doc_id, text in sorted(rows):
        n = len(text.split(" "))
        pos = 0
        while pos < n:
            block = (off + pos) // s
            take = min(n - pos, (block + 1) * s - (off + pos))
            expected.append((block, doc_id, pos, (off + pos) % s, take))
            pos += take
        off += n
    assert got == sorted(expected)
