"""Logical query plan.

The reference's IR is ``(id_list, window-op + args, fn closure list)``
produced by pattern-matching the URI path (src/server.re:260-510; the
fn table at :217-258). We reify it as a small dataclass that both
front-ends (URI path, ZestQL) lower into, and that the compiler turns
into a DataFrame — the declarative hand-off point to Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional

WindowOp = Literal["latest", "earliest", "last", "first", "since", "range", "length"]
FilterOp = Literal["equals", "contains"]
AggOp = Literal["sum", "count", "min", "max", "mean", "median", "sd"]

VALID_AGGS = ("sum", "count", "min", "max", "mean", "median", "sd")
VALID_FILTERS = ("equals", "contains")


@dataclass(frozen=True)
class Window:
    op: WindowOp
    n: Optional[int] = None        # last/first
    from_ms: Optional[int] = None  # since/range
    to_ms: Optional[int] = None    # range


@dataclass(frozen=True)
class QueryPlan:
    """One reference query: ids × window × (≤1 filter) × (≤1 aggregate).

    ``store`` selects the table family: 'numeric' (filter/agg allowed) or
    'blob' (windows/length only — docs/README.md:50)."""

    ids: tuple[str, ...]
    window: Window
    store: Literal["numeric", "blob"] = "numeric"
    filter: Optional[tuple[FilterOp, str, str]] = field(default=None)  # (op, tag, val)
    agg: Optional[AggOp] = None

    @property
    def descending(self) -> bool:
        """Presentation order: the reference renders latest/last AND
        since/range newest-first (timeseries.re:168-175 and :409,:429 —
        return_data(~sort=`Last)); only earliest/first render
        oldest-first."""
        return self.window.op in ("latest", "last", "since", "range")
