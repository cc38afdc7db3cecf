"""Deterministic sf1 fixture generator — a 10x scale-up of the
driver's read-only sf0.1 testdata, for the sf>=1 performance evidence
VERDICT r10 #1 asked for (every perf claim above 2x rested on the
sf0.1 floor-domination argument; this buys a reading where data cost
dominates the per-query scheduling floor).

Design: COPY SEMANTICS chosen so each measured operator scales the way
a real 10x corpus would —

- ``documents``: 10 copies; copy c > 0 suffixes EVERY whitespace token
  with ``q{c}``. Token-level suffixing is position-independent, so
  WITHIN a copy every pairwise shingle-Jaccard is exactly the
  original's (dup structure per copy preserved), while ACROSS copies
  shingle overlap is zero (no artificial 100x near-dup blowup: pair
  output is exactly 10x sf0.1's). n_chars is recomputed from the new
  text.
- ``embeddings``: copy c rolls each vector by c dimensions (np.roll —
  an orthogonal permutation: norms and within-copy cosines preserved
  EXACTLY, cross-copy cosines scatter like unrelated vectors on this
  near-isotropic fixture). vec_id offset per copy.
- ``lineitem``/``orders``: fact tables 10x with ``*_orderkey`` offset
  per copy (the fact-fact join key stays consistent); dimension keys
  (partkey/suppkey/custkey) UNCHANGED — the star-schema posture where
  facts grow and dims don't, so e.g. distinct-partkey cardinality
  stays while scan volume 10xes.
- ``events``: 10 copies, event_id offset, ts jittered +c ms (no 10-way
  timestamp ties), user_id UNCHANGED (the %5 tag pattern and per-user
  event growth are preserved).
- dimension tables (region nation customer supplier part): copied
  verbatim.

Everything is pure pyarrow+numpy (no Spark, no RNG — all perturbations
are closed-form in (row key, copy)). Output dir default
/tmp/zest_sf1; regenerate any time with:

    python scripts/gen_sf.py [out_dir] [copies] [--skew]

``--skew`` (VERDICT r11 #1) keeps the same volume but Zipf-ifies the
hot keys real crawl data skews on — the uniform twin validates volume
scaling, this twin validates distribution:

- ``events``: copies 1-3 force event_type='click' → one series holds
  ~44% of all rows (window-partition hot key for sessionize and the
  per-series top-k reads).
- ``lineitem``: copies 1-3 force l_returnflag='N' → the li_N series
  holds ~55% of rows (the salted top-k's target shape).
- ``documents``: copy 1's first SKEW_HOT_DOCS docs become near-copies
  of one base document (full base text + one unique trailing token) —
  one ~800-doc near-dup clique = one hot LSH bucket in every band and
  one giant connected component for keep_canonical.
- ``embeddings``: copy 1's first SKEW_HOT_VECS vectors become tiny
  closed-form perturbations of one base vector — one IVF mega-cell
  with ~5000 mutually-near-duplicate members for SemDeDup's in-cell
  quadratic kernel.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
KEY_OFFSET = 10_000_000

#: --skew knobs: hot-clique/mega-cell sizes chosen so the QUADRATIC
#: output they imply stays collectable (800 near-dup docs → ~320k
#: pairs; 5000 near-dup vectors → 12.5M in-cell cosine pairs through
#: the Arrow kernel) while still being ~10^3x the median cluster size.
SKEW_HOT_DOCS = 800
SKEW_HOT_VECS = 5000
SKEW_HOT_COPIES = (1, 2, 3)  # copies whose key column collapses to one value


def _copies_concat(tables: list[pa.Table]) -> pa.Table:
    return pa.concat_tables(tables).combine_chunks()


def _with_cols(t: pa.Table, **cols) -> pa.Table:
    for name, arr in cols.items():
        t = t.set_column(t.schema.get_field_index(name), name, arr)
    return t


def gen_documents(src: pa.Table, copies: int, skew: bool = False) -> pa.Table:
    texts = src.column("text").to_pylist()
    out = [src]
    for c in range(1, copies):
        suf = f"q{c}"
        new_texts = [
            " ".join(tok + suf for tok in txt.split(" ")) for txt in texts
        ]
        if skew and c == 1:
            # hot near-dup clique: the copy's first SKEW_HOT_DOCS docs
            # all become base-doc + one unique trailing token — word
            # 3-shingle Jaccard between any two ≈ n/(n+2) ≈ 0.96, so
            # every LSH band buckets them together AND exact verify
            # keeps the pairs (a real boilerplate cluster, not an
            # adversarial hash collision)
            base = new_texts[0]
            for i in range(min(SKEW_HOT_DOCS, len(new_texts))):
                new_texts[i] = f"{base} hot{i}{suf}"
        out.append(
            _with_cols(
                src,
                doc_id=pc.add(src.column("doc_id"), c * KEY_OFFSET),
                text=pa.array(new_texts, pa.string()),
                n_chars=pa.array(
                    [len(t) for t in new_texts], pa.int64()
                ),
            )
        )
    return _copies_concat(out)


def gen_embeddings(src: pa.Table, copies: int, skew: bool = False) -> pa.Table:
    vecs = np.asarray(src.column("embedding").to_pylist(), dtype=np.float32)
    d = vecs.shape[1]
    out = [src]
    for c in range(1, copies):
        rolled = np.roll(vecs, c, axis=1)
        # beyond d copies a bare roll wraps (roll d ≡ identity ⇒ copy d
        # would EXACTLY duplicate copy 0 — an artificial super-linear
        # near-dup blowup). Compose each roll generation g = c // d
        # with the Walsh sign pattern sign_i = (−1)^popcount(i & g):
        # a diagonal ±1 orthogonal transform (norms and within-copy
        # cosines still exact), distinct per g, identity at g = 0 (so
        # sf1's 10-copy output is byte-identical to before) — d·d
        # distinct transforms, supporting copies ≤ 4096 here.
        g = c // d
        if g:
            rolled = rolled * np.where(
                (np.array([bin(i & g).count("1") for i in range(d)]) % 2),
                np.float32(-1.0),
                np.float32(1.0),
            )
        if skew and c == 1:
            # IVF mega-cell: the copy's first SKEW_HOT_VECS vectors
            # become closed-form micro-perturbations of one base
            # vector (mutual cosines ≈ 1) — IVF assigns them all to
            # one centroid and SemDeDup's per-cell kernel sees one
            # ~n²/2-pair cell instead of uniform cells
            n = min(SKEW_HOT_VECS, len(rolled))
            d = rolled.shape[1]
            base = rolled[0].copy()
            hot = np.tile(base, (n, 1))
            idx = np.arange(n) % d
            hot[np.arange(n), idx] += (np.arange(n, dtype=np.float32) + 1.0) * 1e-3
            rolled[:n] = hot
        out.append(
            _with_cols(
                src,
                vec_id=pc.add(src.column("vec_id"), c * KEY_OFFSET),
                embedding=pa.array(
                    [row for row in rolled.tolist()],
                    pa.list_(pa.float32()),
                ),
            )
        )
    return _copies_concat(out)


def gen_lineitem(src: pa.Table, copies: int, skew: bool = False) -> pa.Table:
    out = [src]
    for c in range(1, copies):
        t = _with_cols(
            src, l_orderkey=pc.add(src.column("l_orderkey"), c * KEY_OFFSET)
        )
        if skew and c in SKEW_HOT_COPIES:
            # hot series: the li_N series ends up holding most rows —
            # the per-series top-k / salted-window stress shape
            t = _with_cols(
                t,
                l_returnflag=pa.array(["N"] * t.num_rows, pa.string()),
            )
        out.append(t)
    return _copies_concat(out)


def gen_orders(src: pa.Table, copies: int, skew: bool = False) -> pa.Table:
    out = [src]
    for c in range(1, copies):
        out.append(
            _with_cols(
                src, o_orderkey=pc.add(src.column("o_orderkey"), c * KEY_OFFSET)
            )
        )
    return _copies_concat(out)


def gen_events(src: pa.Table, copies: int, skew: bool = False) -> pa.Table:
    ts = src.column("ts")
    unit = ts.type.unit  # timestamp[us] in current testdata
    per_ms = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    if per_ms is None:
        raise SystemExit("second-resolution events.ts cannot take a ms jitter")
    raw = ts.cast(pa.int64())
    out = [src]
    for c in range(1, copies):
        t = _with_cols(
            src,
            event_id=pc.add(src.column("event_id"), c * KEY_OFFSET),
            ts=pc.add(raw, c * per_ms).cast(pa.timestamp(unit)),
        )
        if skew and c in SKEW_HOT_COPIES:
            # hot series: 'click' ends up holding ~(1 + 4·|hot|/copies)
            # /5 of all rows — the window-partition hot key for
            # sessionize and the per-series reads
            t = _with_cols(
                t,
                event_type=pa.array(["click"] * t.num_rows, pa.string()),
            )
        out.append(t)
    return _copies_concat(out)


_GENERATORS = {
    "documents": gen_documents,
    "embeddings": gen_embeddings,
    "lineitem": gen_lineitem,
    "orders": gen_orders,
    "events": gen_events,
}

_VERBATIM = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    out_dir = args[0] if args else ("/tmp/zest_sf1skew" if skew else "/tmp/zest_sf1")
    copies = int(args[1]) if len(args) > 1 else 10
    os.makedirs(out_dir, exist_ok=True)
    for name in _VERBATIM:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{out_dir}/{name}.parquet")
        print(f"{name}: {src.num_rows} rows (verbatim)")
    for name, gen in _GENERATORS.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        big = gen(src, copies, skew=skew)
        # row groups sized like the source so Spark's split planning
        # sees comparable granularity per byte
        pq.write_table(big, f"{out_dir}/{name}.parquet", row_group_size=1 << 20)
        print(f"{name}: {src.num_rows} -> {big.num_rows} rows"
              + (" (skewed)" if skew else ""))


if __name__ == "__main__":
    main()
