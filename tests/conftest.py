from __future__ import annotations

import pytest

from zestdb_spark.schema import TS_BLOB, TS_NUMERIC
from zestdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


#: Hand-computed fixture mirroring FIXTURES.md §1 — timestamp ties within
#: and across series, untagged rows, shared-prefix tag values, negatives,
#: n=1 and n=2 series, and one never-written series ("ghost").
TS_ROWS = [
    ("sensor1", 1000, 1.0, "room", "lounge"),
    ("sensor1", 1000, 2.5, "room", "kitchen"),  # same-ms tie
    ("sensor1", 2000, 43.0, "serial", "A001"),
    ("sensor1", 3000, 7.0, None, None),  # untagged
    ("sensor1", 4000, -1.5, "room", "lounge"),
    ("sensor2", 1000, 44.0, "serial", "SN0042"),
    ("sensor2", 2000, -3.2, None, None),
    ("sensor2", 5000, 10.0, "serial", "SN0099"),
    ("single", 1500, 99.0, "room", "lounge"),  # n=1 series
    ("pair", 1000, 5.0, "unit", "c"),  # n=2 series
    ("pair", 9000, 6.0, "unit", "c"),
]


@pytest.fixture(scope="session")
def ts(spark):
    return spark.createDataFrame(TS_ROWS, TS_NUMERIC).cache()


BLOB_ROWS = [
    ("b1", 1000, '{"foo":"bar"}'),
    ("b1", 2000, '{"nested":{"a":[1,2]}}'),
    ("b2", 1500, '{"value":1}'),
]


@pytest.fixture(scope="session")
def blob(spark):
    return spark.createDataFrame(BLOB_ROWS, TS_BLOB).cache()
