"""Reference-shaped JSON results at the API edge (SURVEY.md §1.2).

The engine keeps everything as DataFrames; only this module renders the
reference's wire shapes (docs/README.md:118):
- row reads  → ``[{"timestamp": <int_ms>, "data": {...}}, ...]``
  (src/timeseries/timeseries.re:233-240)
- aggregates → ``{"result": <float>}`` or ``{}`` on empty input
  (src/numeric.re:22-27)
- length     → ``{"length": <int>}`` (timeseries.re:321)
- KV count   → ``{"count": <int>}``; KV keys → array of strings
  (src/keyvalue/keyvalue.re:35-36, keys.re:32-45)

The ``iter_*`` generators stream with ``toLocalIterator``;
``rows_to_json`` necessarily buffers the rendered rows (one JSON array
string has to exist in full before it can be returned), so it is for
API-SIZED results only — top-k reads and aggregates, the shapes the
reference's wire protocol actually returns. A full-corpus result
belongs in a DataFrame write, never in this module.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame


def _row_data(row: dict[str, Any]) -> dict[str, Any]:
    """Rebuild the reference's data dict: {"value": v[, tag: tagval]}."""
    data: dict[str, Any] = {"value": row["value"]}
    if row.get("tag_name") is not None:
        data[row["tag_name"]] = row["tag_value"]
    return data


def _stream(df: DataFrame):
    """``toLocalIterator`` over ONE partition: the iterator otherwise
    pays one driver⇄executor round trip PER PARTITION (~0.1 s each —
    a result left at 32 shuffle partitions costs ~3-7 s of pure
    latency for a handful of rows; measured round 9, the whole
    api-edge read budget). ``coalesce(1)`` merges post-shuffle
    partitions in partition-index order inside one task, so a
    range-sorted result stays globally sorted and the stream still
    never materializes on the driver."""
    return df.coalesce(1).toLocalIterator()


def _shape_ts(d: dict[str, Any]) -> dict[str, Any]:
    return {"timestamp": d["timestamp"], "data": _row_data(d)}


def _shape_blob(d: dict[str, Any]) -> dict[str, Any]:
    return {"timestamp": d["timestamp"], "data": json.loads(d["data"])}


def iter_ts_rows(df: DataFrame) -> Iterator[dict[str, Any]]:
    """Numeric-TS result rows → reference row dicts, streamed."""
    return (_shape_ts(row.asDict()) for row in _stream(df))


def iter_blob_rows(df: DataFrame) -> Iterator[dict[str, Any]]:
    return (_shape_blob(row.asDict()) for row in _stream(df))


def rows_to_json(df: DataFrame, blob: bool = False) -> str:
    """API-sized by contract (see module docstring) — the JSON array
    must exist in full anyway, so ``collect()`` beats the local
    iterator's per-batch protocol round trips (~0.3 s on a top-k
    read). The ``iter_*`` generators share the same row shaping for
    callers that truly stream."""
    shape = _shape_blob if blob else _shape_ts
    return json.dumps([shape(r.asDict()) for r in df.collect()])


def aggregate_to_json(df: DataFrame) -> str:
    """1-row {result} frame → ``{"result": x}``; empty/NULL/NaN → ``{}``.

    NULL arises from aggregating zero rows (and from stddev_samp over a
    single row, where Oml returns nan — both render as the reference's
    empty-object result, src/numeric.re:26)."""
    rows = df.collect()  # 1 row by construction
    if not rows or rows[0]["result"] is None:
        return "{}"
    val = rows[0]["result"]
    if isinstance(val, float) and math.isnan(val):
        return "{}"
    return json.dumps({"result": float(val)})


def length_to_json(df: DataFrame) -> str:
    rows = df.collect()
    return json.dumps({"length": int(rows[0]["length"]) if rows else 0})


def count_to_json(df: DataFrame) -> str:
    rows = df.collect()
    return json.dumps({"count": int(rows[0]["count"]) if rows else 0})


def keys_to_json(df: DataFrame) -> str:
    return json.dumps([r["key"] for r in _stream(df)])
