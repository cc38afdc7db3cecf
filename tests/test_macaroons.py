"""Macaroon mint/verify parity with src/token.re + utils/mint.re
(HMAC-chain construction per the public libmacaroons spec)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from zestdb_spark import macaroons as M
from zestdb_spark.auth import MacaroonValidator
from zestdb_spark.errors import Unauthorized

KEY = "s3cret"
CTX = ["path = /ts/sensor1/latest", "method = GET", "target = zest-1"]


def _mint(path="path = /ts/sensor1/latest", meth="method = GET", target="target = zest-1"):
    return M.mint_token(
        id="tok1", location="zest", path=path, meth=meth, target=target, key=KEY
    )


def test_roundtrip_and_verify():
    tok = _mint()
    m = M.Macaroon.deserialize(tok)
    assert m.location == "zest" and m.identifier == "tok1"
    assert m.caveats == ("path = /ts/sensor1/latest", "method = GET", "target = zest-1")
    assert m.verify_signature(KEY)
    assert M.is_valid(tok, KEY, CTX)


def test_wrong_key_rejected():
    assert not M.is_valid(_mint(), "other-key", CTX)


def test_tampered_caveat_rejected():
    m = M.Macaroon.deserialize(_mint())
    # swap a caveat without re-signing → chain mismatch
    forged = M.Macaroon(
        m.location, m.identifier, m.signature, ("path = *",) + m.caveats[1:]
    )
    assert not forged.verify_signature(KEY)
    assert not M.is_valid(forged.serialize(), KEY, CTX)


def test_caveat_must_match_context():
    tok = _mint(meth="method = POST")
    assert not M.is_valid(tok, KEY, CTX)  # GET request, POST-only token


def test_wildcard_caveat_prefix_rule():
    # token.re:3-13: trailing-star caveat matches longer context strings
    tok = _mint(path="path = /ts/sensor1/*")
    assert M.is_valid(tok, KEY, CTX)
    # but never the bare prefix itself (length guard)
    assert not M.is_valid(
        _mint(path="path = /ts/sensor1/latest/extra*"), KEY, CTX
    )


def test_garbage_tokens_rejected():
    for junk in ("", "not-base64!!!", "AAAA", _mint()[:-10]):
        assert not M.is_valid(junk, KEY, CTX)


def test_observe_caveat():
    tok = M.mint_token(
        id="t",
        location="zest",
        path="path = /ts/a",
        meth="method = GET",
        target="target = zest-1",
        key=KEY,
        observe="observe = data",
    )
    ctx = ["path = /ts/a", "method = GET", "observe = data", "target = zest-1"]
    assert M.is_valid(tok, KEY, ctx)
    assert not M.is_valid(tok, KEY, CTX)  # missing observe attr


def test_validator_enforces_and_empty_key_accepts():
    v = MacaroonValidator("", "zest-1")
    v.check("GET", "/anything", None)  # unset key = permissive (server.re:812)

    v = MacaroonValidator(KEY, "zest-1")
    tok = _mint()
    v.check("GET", "/ts/sensor1/latest", tok)
    with pytest.raises(Unauthorized):
        v.check("POST", "/ts/sensor1/latest", tok)
    with pytest.raises(Unauthorized):
        v.check("GET", "/ts/other", tok)
    with pytest.raises(Unauthorized):
        v.check("GET", "/ts/sensor1/latest", None)


def test_validator_wrong_target_identity():
    v = MacaroonValidator(KEY, "other-server")
    with pytest.raises(Unauthorized):
        v.check("GET", "/ts/sensor1/latest", _mint())


@given(
    ident=st.text(min_size=1, max_size=40).filter(lambda s: "\n" not in s),
    loc=st.text(min_size=1, max_size=40).filter(lambda s: "\n" not in s),
    caveats=st.lists(
        st.text(min_size=1, max_size=60).filter(lambda s: "\n" not in s),
        max_size=5,
    ),
    key=st.text(min_size=1, max_size=32),
)
def test_serialize_roundtrip_property(ident, loc, caveats, key):
    m = M.Macaroon.create(loc, ident, key)
    for c in caveats:
        m = m.add_first_party_caveat(c)
    out = M.Macaroon.deserialize(m.serialize())
    assert out == m
    assert out.verify_signature(key)
    assert not out.verify_signature(key + "x")
