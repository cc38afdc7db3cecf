"""Hypercat catalog operators (SURVEY.md §2.12 M1-M2).

Reference: dataset catalog stored in the JSON KV under id "//cat"
(src/hc.re:47); items are {href, item-metadata: [{rel, val}...]} and a
POST is validated then upserted by href (src/hc.re:20-51); GET splices
the items into the base-cat envelope (src/hc.re:59-79).

The engine stores items relationally as (href, item_metadata ARRAY of
rel/val STRUCTs) — schema.CATALOG_ITEMS — and renders the envelope only
at the API edge.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zestdb_spark import serializers
from zestdb_spark.errors import BadRequest

REL_DESCRIPTION = "urn:X-hypercat:rels:hasDescription:en"
REL_CONTENT_TYPE = "urn:X-hypercat:rels:isContentType"

#: Catalogue self-description (reference src/base-cat.json semantics).
BASE_CAT: dict[str, Any] = {
    "catalogue-metadata": [
        {"rel": REL_DESCRIPTION, "val": "engine catalogue"},
        {"rel": REL_CONTENT_TYPE, "val": "application/vnd.hypercat.catalogue+json"},
    ],
    "items": [],
}


def validate_item(item: dict[str, Any]) -> None:
    """Structural validation per src/hc.re:20-41: href present,
    item-metadata is a rel/val list containing the description and
    content-type rels. Raises BadRequest (→ CoAP 128) otherwise."""
    if not isinstance(item, dict):
        # a JSON array/string/number payload must be a validation error
        # (CoAP 128), not an AttributeError escaping the request path
        raise BadRequest("catalog item must be a JSON object")
    if not isinstance(item.get("href"), str) or not item["href"]:
        raise BadRequest("catalog item missing href")
    md = item.get("item-metadata")
    if not isinstance(md, list) or not md:
        raise BadRequest("catalog item missing item-metadata")
    rels = set()
    for pair in md:
        if not isinstance(pair, dict) or "rel" not in pair or "val" not in pair:
            raise BadRequest("item-metadata entries must be {rel, val}")
        rels.add(pair["rel"])
    if REL_DESCRIPTION not in rels:
        raise BadRequest("item-metadata missing description rel")
    if REL_CONTENT_TYPE not in rels:
        raise BadRequest("item-metadata missing content-type rel")


def item_row(item: dict[str, Any]) -> "tuple[str, list[tuple[str, str]]]":
    """Canonical (href, [(rel, val), ...]) row for a VALIDATED item.
    Non-string vals keep their JSON form ('true', '1.5'), not a Python
    repr ('True') — the client must read back what it wrote. Shared by
    the distributed upsert and storage's driver-side fast path so the
    two can never disagree on coercion."""

    def _val(v: Any) -> str:
        return v if isinstance(v, str) else json.dumps(v)

    return (
        item["href"],
        [(p["rel"], _val(p["val"])) for p in item["item-metadata"]],
    )


def upsert_item(items: DataFrame, item: dict[str, Any]) -> DataFrame:
    """POST /cat — validate + upsert by href (src/hc.re:43-51)."""
    validate_item(item)
    spark = items.sparkSession
    new = spark.createDataFrame([item_row(item)], items.schema)
    return items.filter(F.col("href") != item["href"]).unionByName(new)


def flatten(items: DataFrame) -> DataFrame:
    """(href, item_metadata) → flat (href, rel, val) rows — the
    relational projection used by analytics and the oracle corpus."""
    return items.select(
        "href", F.explode("item_metadata").alias("md")
    ).select("href", F.col("md.rel").alias("rel"), F.col("md.val").alias("val"))


def render(items: DataFrame) -> str:
    """GET /cat — splice items into the envelope (src/hc.re:59-79).
    Driver-side by design: catalogs are control-plane small."""
    cat = dict(BASE_CAT)
    cat["items"] = [
        {
            "href": r["href"],
            "item-metadata": [{"rel": p["rel"], "val": p["val"]} for p in r["item_metadata"]],
        }
        for r in serializers._stream(items)
    ]
    return json.dumps(cat)
