r"""Go-RE2 → Java regex compatibility shim for user-config patterns.

Beats compiles user-supplied patterns (multiline.pattern,
include/exclude_lines, the regexp condition) with Go's regexp package
(libbeat/common/match/matcher.go), i.e. RE2 syntax. RE2 treats a `{`
that does not open a valid repetition quantifier as a LITERAL brace —
the logstash module's multiline pattern `^((\[...\])|({.+}))`
(module/logstash/log/config/log.yml:9) relies on that. Java's
java.util.regex (what Spark's `rlike` compiles) instead throws
"Illegal repetition".

`jvm_safe` escapes exactly those non-quantifier `{` so the pattern
compiles on the JVM with identical semantics. Escape- and
character-class-aware; `{n}`, `{n,}`, `{n,m}` quantifiers pass
through untouched. A dangling `}` is already legal-and-literal in
Java, so only `{` needs care.
"""

from __future__ import annotations

import re

_QUANT = re.compile(r"\{\d+(,\d*)?\}")


def jvm_safe(pattern: str) -> str:
    """Escape bare (non-quantifier) `{` so Go-RE2 patterns compile
    under java.util.regex with unchanged meaning."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
        elif c == "{" and not _QUANT.match(pattern, i):
            out.append("\\{")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)
