"""ACL shim (M4) + parser robustness properties."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from zestdb_spark.auth import AclValidator, Grant, Token, path_matches
from zestdb_spark.errors import BadRequest, Unauthorized, ZestError
from zestdb_spark.plans import compile_path
from zestdb_spark.plans import zestql as zql


def test_path_matching_rules():
    # src/token.re:3-13 semantics
    assert path_matches("/ts/a", "/ts/a")
    assert not path_matches("/ts/a", "/ts/a/latest")  # exact is exact
    assert path_matches("/ts/*", "/ts/a/latest")
    # reference rule (token.re:3-13): /ts/* requires a longer path,
    # so the bare prefix itself does NOT match
    assert not path_matches("/ts/*", "/ts")
    assert not path_matches("/ts/*", "/kv/a")
    assert path_matches("*", "/anything/at/all")


def test_token_grants():
    tok = Token([Grant("GET", "/ts/*"), Grant("*", "/kv/home/*")])
    assert tok.allows("GET", "/ts/s1/latest")
    assert not tok.allows("POST", "/ts/s1")
    assert tok.allows("DELETE", "/kv/home/x")
    assert not tok.allows("GET", "/cat")


def test_acl_validator_deny_and_mint():
    acl = AclValidator()
    acl.mint("t1", [("GET", "/ts/*")])
    acl.check("GET", "/ts/a/latest", "t1")  # no raise
    with pytest.raises(Unauthorized):
        acl.check("POST", "/ts/a", "t1")
    with pytest.raises(Unauthorized):
        acl.check("GET", "/ts/a/latest", "unknown-token")
    acl.revoke("t1")
    with pytest.raises(Unauthorized):
        acl.check("GET", "/ts/a/latest", "t1")


def test_engine_acl_denies_and_audits(spark, tmp_path):
    from zestdb_spark.api import ZestEngine

    acl = AclValidator()
    acl.mint("reader", [("GET", "/ts/*")])
    eng = ZestEngine(spark, str(tmp_path / "store2"), acl=acl)
    with pytest.raises(Unauthorized):
        eng.post("/ts/s1/at/1000", {"value": 1.0}, token="reader")
    # denial was audited with code 129
    codes = [r["code"] for r in eng.store.load("audit").collect()]
    assert 129 in codes
    # a granted read works (empty table → empty result)
    assert eng.get("/ts/s1/last/5", token="reader") == "[]"


# ---------------------------------------------------- parser robustness

_path_text = st.text(
    alphabet=st.sampled_from(list("/abcdefgh0123456789,.*_-")), max_size=40
)


@given(path=_path_text)
@settings(max_examples=300, deadline=None)
def test_compile_path_never_crashes(path):
    """Any input either compiles or raises BadRequest — never another
    exception (the reference replies 128, it doesn't crash)."""
    try:
        compile_path(path)
    except BadRequest:
        pass


_zql_text = st.text(
    alphabet=st.sampled_from(list('abcdefgh0123456789 ";,.*_-')), max_size=60
)


@given(stmt=_zql_text)
@settings(max_examples=300, deadline=None)
def test_zestql_parse_never_crashes(stmt):
    try:
        zql.parse(stmt, 10**12)
    except ZestError:
        pass
