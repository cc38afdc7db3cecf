"""Tag filters (SURVEY.md §2.2 P1-P2).

Reference semantics (src/filter.re):
- ``equals(tag, val)``: keep rows whose data dict has ``tag`` exactly
  equal to ``val`` (string compare); rows missing the tag are DROPPED
  (the OCaml ``Not_found`` handler returns false, src/filter.re:9-14).
- ``contains(tag, val)``: literal (non-regex, case-sensitive) substring
  match via ``Str.regexp_string`` (src/filter.re:17-29).

In the engine's single-tag layout a row "has tag t" iff
``tag_name = t``; NULL tag_name rows never match — which is precisely
Spark's null-comparison semantics, so a plain conjunction implements the
dropped-row rule with no special casing, stays inside whole-stage
codegen, and pushes down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_equals(df: DataFrame, tag: str, val: str) -> DataFrame:
    return df.filter((F.col("tag_name") == tag) & (F.col("tag_value") == val))


def tag_contains(df: DataFrame, tag: str, val: str) -> DataFrame:
    # F.contains / Column.contains is a literal substring test (maps to
    # the CONTAINS expression), matching Str.regexp_string semantics.
    return df.filter((F.col("tag_name") == tag) & F.col("tag_value").contains(val))
