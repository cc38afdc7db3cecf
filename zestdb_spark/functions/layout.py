"""Multi-dimensional data layout: Z-order (Morton) clustering.

Extension beyond the reference surface (the reference's shard walk is
clustered on time alone — timeseries.re:64-111; the store's `compact`
already range-clusters each leaf by timestamp). This module is the
MULTI-column face of the same idea for corpus/lakehouse tables: at
100 TB the dominant cost of every selective query is the files it
does NOT read, and min/max file skipping only works on columns the
layout actually clusters. Sorting by one column gives perfect skipping
on it and none on anything else; interleaving the bits of k columns
(Morton order — the public recipe behind Delta's OPTIMIZE ZORDER BY
and the classic UB-tree literature) gives every interleaved column
bounded min/max spans per file, so a 2-D box predicate prunes on BOTH
dimensions.

Everything is integer arithmetic on BIGINT — deterministic and
replayable in ANSI SQL (the DuckDB oracle runs the identical
expression), and the key computation is pure whole-stage codegen
(shifts, masks, ORs — no UDFs, no shuffles beyond the final range
partition).

Scale shape: ``zorder_bounds`` is one global min/max aggregate (a
model-sized collect — 2 longs per column); ``with_zorder_key`` is
scan-local; ``zorder_layout`` pays exactly ONE range-partition
shuffle — the same price as any sorted write — and emits files whose
per-column min/max stats are tight on every clustered column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per clustering column, one aggregate pass.
    Columns must be integral (cast dates to epoch days / timestamps to
    ms upstream); NULLs are ignored here and sort to z-key 0."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        out[c] = (int(lo) if lo is not None else 0,
                  int(hi) if hi is not None else 0)
    return out


def zorder_key_col(
    cols: list[str], bounds: dict[str, tuple[int, int]], bits: int = 16
) -> Column:
    """The Morton key as one BIGINT column expression.

    Per column: CLAMP to the bounds, then scale to ``[0, 2^bits)``
    with INTEGER math — ``((clamp(x) − lo) · (2^bits − 1)) div
    (hi − lo)`` — exact with no double rounding (the product stays in
    BIGINT), NULL and degenerate (lo == hi) columns scale to 0. The
    clamp matters under PINNED bounds (the documented
    incremental-write posture): a late row outside the creation-time
    bounds scales to the nearest edge bucket instead of producing a
    negative/over-range value whose sign bits would interleave into an
    arbitrary key pattern. Then interleave: bit b of column i lands at
    position ``b·k + i``.

    ``bits · len(cols)`` must fit a signed BIGINT (≤ 63), and
    ``(hi − lo) · (2^bits − 1)`` must fit one too — above that the
    product would wrap silently under Spark's non-ANSI arithmetic
    (while an oracle engine raises), so it is rejected here at plan
    time: reduce ``bits`` for columns spanning more than
    ``2^63 / 2^bits`` (≈1.4e14 at bits=16)."""
    k = len(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * k > 63:
        raise ValueError(f"bits={bits} x {k} cols exceeds 63 key bits")
    mask = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[c]
        span = hi - lo
        if span > (2**63 - 1) // mask:
            raise ValueError(
                f"zorder column {c!r} spans {span} — (span x {mask}) "
                f"overflows BIGINT; use bits <= "
                f"{max(1, ((2**63 - 1) // span).bit_length() - 1)} for "
                "this span"
            )
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
        else:
            # BIGINT div BIGINT: `div` is Spark SQL's integral division
            # (DuckDB's `//`) — both truncate, and the operands are
            # non-negative by construction (clamp first), so they
            # agree exactly
            x = f"least(greatest(CAST(`{c}` AS BIGINT), {lo}L), {hi}L)"
            scaled.append(
                F.expr(f"(({x} - {lo}L) * {mask}L) div {span}L")
            )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, sc in enumerate(scaled):
            bit = F.shiftright(sc, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    # NULL in any clustered column nulls the whole key — pin to 0 so
    # null rows cluster together at the low end instead of vanishing
    return F.coalesce(z, F.lit(0).cast("long"))


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """df + ``zkey`` (BIGINT Morton key over ``cols``). Pass precomputed
    ``bounds`` to keep the key stable across incremental writes (the
    Delta-style posture: fix the bounds when the table is created, so
    late files interleave into the same space)."""
    b = bounds if bounds is not None else zorder_bounds(df, cols)
    return df.withColumn("zkey", zorder_key_col(cols, b, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition into ``n_files``
    splits of the Morton key and sort within each — every output file
    covers a compact z-curve segment, so its min/max on EVERY
    clustered column is a bounded sub-span (the file-skipping
    property). One shuffle; the ``zkey`` helper column is dropped
    before the write."""
    keyed = with_zorder_key(df, cols, bits, bounds)
    return (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )
