"""Arrow kernel: scan-local per-document query-term counts (guide §4.2).

Computes the BM25 base projection ``(doc_id, dl, tf0..tf{n-1})`` in one
``mapInArrow`` pass: ``dl`` is the count of non-empty tokens of
``split(text, ' ')`` and ``tf_i`` the count of tokens equal to query
term i. The JVM expression path evaluates one interpreted higher-order
``filter`` over the token array PER TERM per document (plus the size
pass) — measured as ~75% of the whole bm25 cost at sf1. Here the split,
the equality compares and the per-row segmented counts are single
vectorized pyarrow/numpy calls over the whole batch.

Values are BIT-IDENTICAL to the expression path
(``F.size(F.filter(split, ...))``): integer counts of the same token
multiset — pyarrow ``split_pattern(' ')`` and Spark ``split`` on the
single-space pattern produce identical token lists (consecutive spaces
yield empty tokens both ways; the non-empty predicate drops them from
``dl`` and query terms are non-empty so empties can never match a
``tf``), string equality is exact byte equality in both engines, and a
NULL text maps to NULL counts exactly like ``size(NULL) = NULL`` under
the non-legacy ``sizeOfNull`` default. Parity is pinned by
tests/test_token_count_kernel.py over adversarial token shapes.

Row contract: exactly one output row per input row (unlike the minhash
kernel there is no row-dropping — bm25 scores every doc, including
zero-score ones filtered later).

100 TB posture: per-batch bounded memory, no driver state, no shuffle;
the Python boundary crosses (doc_id, text) once — only the columns the
function needs (guide §4.1).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Iterator

import numpy as np


@lru_cache(maxsize=None)
def stats_schema(num_terms: int) -> str:
    """Matches the expression projection's types: F.size → int."""
    return "doc_id long, dl int, " + ", ".join(
        f"tf{i} int" for i in range(num_terms)
    )


def make_token_stats_fn(terms: tuple[str, ...]) -> Callable:
    """mapInArrow function: (doc_id, text) batches → (doc_id, dl, tf*)."""
    terms = tuple(terms)

    def compute(it: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            nrows = batch.num_rows
            if nrows == 0:
                continue
            doc_id = batch.column(0)
            text = batch.column(1)
            # null text → null counts (size(NULL) = NULL); flatten
            # skips null lists so those rows simply receive no tokens,
            # and the mask marks them null in every output column.
            mask = (
                np.asarray(pc.is_null(text)) if text.null_count else None
            )
            toks = pc.split_pattern(text, " ")
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            dl = np.bincount(
                parent[nonempty], minlength=nrows
            ).astype(np.int32)
            cols = [doc_id, pa.array(dl, mask=mask)]
            for term in terms:
                eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
                tf = np.bincount(parent[eq], minlength=nrows).astype(
                    np.int32
                )
                cols.append(pa.array(tf, mask=mask))
            names = ["doc_id", "dl"] + [f"tf{i}" for i in range(len(terms))]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return compute
