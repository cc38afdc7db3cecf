"""Parser-robustness fuzz for the ZestQL front-end: for ARBITRARY
input text, parse() must either return a Statement or raise the typed
BadRequest — never an IndexError/KeyError/AttributeError escaping the
grammar layer (an API edge turns BadRequest into a 4xx; anything else
would be a 500). Plus a generative grammar round-trip: every
statement assembled from the grammar's own productions parses."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.errors import BadRequest
from zestdb_spark.plans import zestql

_SETTINGS = settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_NOW = 1_700_000_000_000

# adversarial soup: grammar keywords, quotes, numbers, junk
_token = st.sampled_from(
    ["get", "post", "observe", "connect", "disconnect", "key", "host",
     "from", "to", "where", "is", "last", "first", "since", "range",
     "mode", "for", "sum", "max", '"a,b"', '"', "'", "5", "-3", "2.5",
     "min", "h", "d", ";", "(", "🤖", "\\", '"unterminated', "1e999"]
)


@given(st.lists(_token, max_size=8).map(" ".join))
@_SETTINGS
def test_arbitrary_token_soup_never_escapes_badrequest(text):
    try:
        zestql.parse(text, _NOW)
    except BadRequest:
        pass  # the typed grammar error — correct


@given(st.text(max_size=40))
@_SETTINGS
def test_arbitrary_text_never_escapes_badrequest(text):
    try:
        zestql.parse(text, _NOW)
    except BadRequest:
        pass


# the reference grammar (test/zestql/parser.mly): GET func? from tag?
# (since|range|last) — the window is REQUIRED and the tag precedes it;
# units are suffixed (1s, 10sec, 1m, 24h, 1d) per the test corpus
_series = st.sampled_from(['"s1"', '"a,b,c"', '"x-1"'])
_agg = st.sampled_from(["", " sum", " count", " min", " max", " mean", " sd"])
_win = st.sampled_from(
    [" last 5", " last 1000", " since 1s", " since 10sec", " since 1m",
     " since 24h", " since 1d", " range 1s to 0s", " range 3d to 1d"]
)
_tag = st.sampled_from(["", ' where "room" is "lounge"'])


@given(series=_series, win=_win, tag=_tag, agg=_agg)
@_SETTINGS
def test_generated_get_statements_parse(series, win, tag, agg):
    stmt = f"get{agg} from {series}{tag}{win};"
    out = zestql.parse(stmt, _NOW)
    assert out is not None
