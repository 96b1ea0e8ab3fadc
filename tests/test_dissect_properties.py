"""Property-based tests for the dissect kernel (hypothesis): the
native-regex compilation must agree with the Python reference kernel on
arbitrary inputs, and parsing must never throw."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from beats_spark.dissect import Tokenizer, TokenizerError

# delimiter alphabet excludes %{} to keep generated tokenizers valid
_DELIM = st.text(alphabet=" -=:/|,;[](){}<>\t", min_size=1, max_size=3).filter(
    lambda s: "%" not in s
)
_KEY = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_MSG = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@st.composite
def tokenizers(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    parts = []
    lead = draw(_DELIM) if draw(st.booleans()) else ""
    parts.append(lead)
    keys = draw(
        st.lists(_KEY, min_size=n, max_size=n, unique=True)
    )
    for i in range(n):
        parts.append("%{" + keys[i] + "}")
        if i < n - 1:
            parts.append(draw(_DELIM))
    if draw(st.booleans()):
        parts.append(draw(_DELIM))
    return "".join(parts)


@given(tok=tokenizers(), msg=_MSG)
@settings(max_examples=300, deadline=None)
def test_kernel_never_throws(tok, msg):
    t = Tokenizer(tok)
    out = t.dissect(msg)
    assert out is None or isinstance(out, dict)


@given(tok=tokenizers(), msg=_MSG)
@settings(max_examples=300, deadline=None)
def test_native_regex_agrees_with_kernel(tok, msg):
    """For native-compilable tokenizers, the compiled Java-style regex
    (evaluated here with Python re, same lazy semantics) must accept
    exactly the messages the reference kernel accepts, with identical
    captures."""
    t = Tokenizer(tok)
    if not t.native_compilable:
        return
    kernel = t.dissect(msg)
    pattern = (
        t.regex()
        .replace("\\Q", "")
        .replace("\\E", "")  # crude: our delimiters contain no regex metachars after re.escape below
    )
    # rebuild with re.escape for the python engine instead of \Q..\E
    parts = ["^"]
    n = len(t.fields)
    for i, f in enumerate(t.fields):
        if i == 0:
            parts[0] = "^" + re.escape(t.delimiters[0])
        has_trailing = i + 1 < len(t.delimiters)
        if i == n - 1 and not has_trailing:
            parts.append("(.*)$")
        else:
            parts.append("(.*?)")
            parts.append(re.escape(t.delimiters[i + 1]))
    m = re.match("".join(parts), msg, re.S) if msg else None
    if kernel is None:
        assert m is None, (tok, msg, kernel, m and m.groups())
    else:
        assert m is not None, (tok, msg, kernel)
        got = {}
        for f, g in zip(t.fields, m.groups()):
            if f.saveable:
                got[f.key] = g
        assert got == kernel, (tok, msg, got, kernel)


@given(msg=_MSG)
@settings(max_examples=100, deadline=None)
def test_append_join_roundtrip(msg):
    """%{+k} %{+k} reassembles the two halves with the separating
    delimiter (dissect.go append semantics)."""
    t = Tokenizer("%{+k} %{+k}")
    out = t.dissect(msg)
    if out is not None:
        a, _, b = msg.partition(" ")
        assert out["k"] == a + " " + b
