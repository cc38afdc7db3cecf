"""Custom stateful streaming operator (beyond-reference capability).

The reference has no stateful stream processing at all (SURVEY.md
§2.10: its streaming is stateless pub/sub fan-out). This module adds
the canonical Spark shape for custom per-key streaming state —
``applyInPandasWithState`` — with a running per-series anomaly/stats
tracker: each micro-batch updates (count, sum, min, max, last_ts) per
series and emits the updated snapshot, surviving across batches in the
state store.

At scale: state is partitioned by series_id in the streaming state
store (RocksDB-backed on a real cluster), so 1000 executors each own
their key range; the pandas function sees one series' rows per call.

Works on a batch DataFrame too (groupBy.applyInPandas with the same
function body) — the streaming test drives it through a real
readStream/writeStream cycle with two appended batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

OUTPUT_SCHEMA = (
    "series_id string, n long, sum_value double, min_value double, "
    "max_value double, last_ts long"
)
STATE_SCHEMA = "n long, sum_value double, min_value double, max_value double, last_ts long"


def _update_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Per-series state update: fold this batch's rows into the running
    (n, sum, min, max, last_ts) and emit the new snapshot."""
    if state.exists:
        n, s, mn, mx, last = state.get
    else:
        n, s, mn, mx, last = 0, 0.0, None, None, None

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        bmn, bmx = float(pdf["value"].min()), float(pdf["value"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
        bl = int(pdf["timestamp"].max())
        last = bl if last is None else max(last, bl)

    state.update((n, s, mn, mx, last))
    yield pd.DataFrame(
        {
            "series_id": [key[0]],
            "n": [n],
            "sum_value": [s],
            "min_value": [mn],
            "max_value": [mx],
            "last_ts": [last],
        }
    )


def running_series_stats(stream_df):
    """Attach the stateful tracker to a streaming ts_numeric frame →
    one updated (series_id, n, sum, min, max, last_ts) row per series
    per micro-batch that touched it."""
    return stream_df.groupBy("series_id").applyInPandasWithState(
        _update_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
