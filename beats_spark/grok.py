"""Grok pattern compiler: %{SYNTAX:semantic:type} → one anchored JVM
regex + a regexp_extract battery.

The BASELINE north-star names "vectorized grok/regex parse" as the
parse analog alongside dissect; the reference ships dissect (Logstash/
ES ingest carry grok), so this is the grok half: a pattern library +
compiler in the spirit of logstash-patterns-core, emitting expressions
that stay in whole-stage codegen — one rlike for the match predicate,
one regexp_extract per captured field, types via try_cast.

Pattern syntax:
    %{SYNTAX}                 match, no capture
    %{SYNTAX:name}            capture as string field `name`
    %{SYNTAX:name:int}        capture + cast (int|long|float|double|bool)
Base patterns may reference other patterns (expanded recursively);
custom patterns merge via the `extra_patterns` argument / processor
config. Every base pattern below is RE2-compatible (no lookaround, no
backreferences) so the same regex runs under Java regex AND RE2-family
engines (DuckDB oracles, Go).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.regex import jvm_safe

from beats_spark.fields import add_flag, field_col, put_fields
from beats_spark.processors.base import Processor, register
from beats_spark.processors.shape import _set_error

# RE2-safe core of the logstash-patterns-core base set
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "YEAR": r"\d\d(?:\d\d)?",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9]",
    "HOUR": r"2[0123]|[01]?\d",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:[:.,]\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}"
        r"(?::%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "IPV4": (
        r"(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})){3}"
    ),
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}(?:%\w+)?",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|"
        r"[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
        r"[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?"
    ),
    # no-backreference quoted string (logstash QS uses backrefs)
    "QUOTEDSTRING": r"\"[^\"]*\"|'[^']*'",
    "QS": r"\"[^\"]*\"|'[^']*'",
    "HTTPDATE": r"%{MONTHDAY}/\w{3}/%{YEAR}:%{TIME} [+-]\d{4}",
    "MONTH": (
        r"\b(?:[Jj]an(?:uary)?|[Ff]eb(?:ruary)?|[Mm]ar(?:ch)?|[Aa]pr(?:il)?|"
        r"[Mm]ay|[Jj]un(?:e)?|[Jj]ul(?:y)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|"
        r"[Oo]ct(?:ober)?|[Nn]ov(?:ember)?|[Dd]ec(?:ember)?)\b"
    ),
    # classic BSD syslog header time: month, space-padded day, time
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "SYSLOGHOST": r"%{IPORHOST}",
    "PATH": r"(?:/[\w_%!$@:.,~-]+)+",
    "URIPATH": r"(?:/[\w_%!$@:.,~-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    # syslog tag / process name: printable US-ASCII minus '[' and '\'
    "PROG": r"[\x21-\x5a\x5d-\x7e]+",
    # RFC5424 pieces (logstash-patterns-core linux-syslog set): PRI is
    # a composite carrying its own named capture, like the apache ones
    "NONNEGINT": r"\b\d+\b",
    "SYSLOG5424PRINTASCII": r"[!-~]+",
    "SYSLOG5424PRI": r"<%{NONNEGINT:syslog5424_pri}>",
    # mongo patterns (logstash-patterns-core mongodb set)
    "MONGO3_SEVERITY": r"\w",
    "MONGO3_COMPONENT": r"%{WORD}",
    # java patterns (logstash-patterns-core java set, sans backrefs)
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVALOGMESSAGE": r".*",
    # composite access-log shapes (logstash-patterns-core httpd set,
    # minus the backreference-dependent QS)
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": (
        r"%{COMMONAPACHELOG} \"%{DATA:referrer}\" \"%{DATA:agent}\""
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")

# Oniguruma named captures, the second capture syntax ES grok accepts
# alongside %{NAME:field} (used by e.g. the kafka module pipeline's
# (?'kafka.log.trace.full'.*)). Field names may contain dots — illegal
# in Java's (?<name>...) — so the compiler rewrites the opener to a
# plain '(' and tracks the name itself. Names must start with a letter,
# which keeps lookbehind (?<= / (?<! out of the match.
_ONIG_OPEN = r"\(\?(?:<([A-Za-z][\w.\[\]@]*)>|'([A-Za-z][\w.\[\]@]*)')"
_TOKEN = re.compile(_GROK_REF.pattern + "|" + _ONIG_OPEN)

_GROK_TYPES = {
    "int": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "boolean": "boolean",
}


class GrokError(ValueError):
    pass


def _neutralize_captures(text: str) -> str:
    """Rewrite bare capturing '(' to '(?:' in pattern text so user
    patterns / pattern_definitions containing their own groups cannot
    shift the compiler's regexp_extract group numbering. Escape- and
    character-class-aware: '\\(' and '[(]' stay literal; '(?...)'
    constructs pass through."""
    out: list[str] = []
    i, n = 0, len(text)
    in_class = False
    while i < n:
        c = text[i]
        if c == "\\" and i + 1 < n:
            out.append(text[i : i + 2])
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
        elif c == "(" and (i + 1 >= n or text[i + 1] != "?"):
            out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand a grok expression into (regex, captures) where captures
    is an ordered [(field_name, cast_type|None)] matching regex group
    numbers 1..N. Named references expand recursively; only
    %{NAME:field} forms produce groups (plain %{NAME} expands to a
    non-capturing group), so group numbering is wholly ours."""
    library = dict(GROK_PATTERNS)
    if extra_patterns:
        library.update(extra_patterns)
    captures: list[tuple[str, str | None]] = []

    # ES grok is Oniguruma: its MULTILINE option ('m') means
    # dot-matches-newline (Ruby semantics), and ^/$ are ALWAYS
    # line-anchored. Translate a leading (?m)/(?im)… flag group to
    # Java as dot-all + multiline-anchors so e.g. the kafka module's
    # "(?m)…%{JAVALOGMESSAGE:message}…$[ \n]*(?'trace'.*)" captures a
    # multi-line java stacktrace the way the reference pipeline does.
    flags = re.match(r"^\(\?([a-z]+)\)", pattern)
    if flags and "m" in flags.group(1) and "s" not in flags.group(1):
        pattern = f"(?s{flags.group(1)})" + pattern[flags.end():]

    def expand(pat: str, depth: int) -> str:
        if depth > 20:
            raise GrokError("grok: pattern recursion too deep (cycle?)")

        def one(m: re.Match) -> str:
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name is None:
                # Oniguruma named capture: the body and its ')' stay in
                # the text; emitting a bare '(' here keeps group order
                # correct relative to any nested %{...:field} refs
                captures.append((m.group(4) or m.group(5), None))
                return "("
            body = library.get(name)
            if body is None:
                raise GrokError(f"grok: unknown pattern %{{{name}}}")
            if field:
                if typ is not None and typ not in _GROK_TYPES:
                    raise GrokError(f"grok: unknown type {typ!r} for {field}")
                # append BEFORE expanding: the outer '(' precedes any
                # nested captures inside composite patterns, and group
                # numbers follow '(' order
                captures.append((field, _GROK_TYPES.get(typ or "", None)))
                inner = expand(body, depth + 1)
                return f"({inner})"
            inner = expand(body, depth + 1)
            return f"(?:{inner})"

        # %{...} refs contain no parens, so neutralizing the whole text
        # first only touches literal segments and library/user bodies —
        # the compiler's own capture parens are emitted afterwards.
        # (neutralize passes every '(?...' construct through, so the
        # Oniguruma openers survive to be rewritten here)
        return _TOKEN.sub(one, _neutralize_captures(pat))

    regex = expand(pattern, 0)
    # Java regex recurses once per iteration of an alternation loop:
    # the ES modules' GREEDYMULTILINE idiom "(.|\n)*" StackOverflows
    # the JVM at a few thousand chars of input. Rewrite the
    # single-char-alternation loop to the equivalent dot-all loop,
    # which Java matches iteratively. (The neutralizer has already
    # turned '(' into '(?:' here.)
    for loop in ("(?:.|\n)", "(?:\n|.)"):
        for q in ("*", "+"):
            regex = regex.replace(loop + q, f"(?s:.{q})")
    # Oniguruma (like Go RE2) treats a '{' that opens no valid
    # quantifier as a literal (the logstash slowlog pipeline's ruby-
    # hash pattern "{:plugin_params=>…}" relies on it); Java throws.
    # Escape those after expansion so library quantifiers survive.
    regex = jvm_safe(regex)
    try:
        n_groups = re.compile(regex).groups
    except re.error:
        n_groups = None  # Java-only construct; group audit unavailable
    if n_groups is not None and n_groups != len(captures):
        raise GrokError(
            f"grok: expanded regex has {n_groups} capture groups but the "
            f"compiler emitted {len(captures)} — a pattern injected its own "
            "capturing '(' (use '(?:' for grouping)"
        )
    return regex, captures


def grok_columns(
    src: Column,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    anchored: bool = True,
) -> tuple[Column, dict[str, Column]]:
    """(matched_predicate, {field: value Column}) — all JVM-side:
    rlike + one regexp_extract per capture, casts via try_cast."""
    regex, captures = compile_grok(pattern, extra_patterns)
    if anchored and not regex.startswith("^"):
        regex = "^" + regex
    matched = src.isNotNull() & src.rlike(regex)
    # regexp_extract numbers OUR groups 1..N, but expanded sub-patterns
    # contain only non-capturing groups, so indices line up with the
    # capture order
    values: dict[str, Column] = {}
    for i, (field, typ) in enumerate(captures):
        g = F.when(matched, F.nullif(F.regexp_extract(src, regex, i + 1), F.lit("")))
        if typ is not None:
            g = g.try_cast(typ)
        values[field] = g
    return matched, values


@register
class Grok(Processor):
    """Grok parse processor (the Logstash/ES-ingest grok analog named
    by the BASELINE north-star next to dissect; the reference's
    filebeat configs hand grok work to ES ingest pipelines —
    elasticsearch/client.go pipeline selector — so a standalone engine
    needs it in-process).

    cfg: field (default "message"), patterns (list — FIRST matching
    pattern wins, like Logstash's match list), pattern (single),
    pattern_definitions (custom sub-patterns), target_prefix ("" =
    root), ignore_failure, anchored (default True: patterns must match
    from the start — set False for ES-ingest parity, whose Oniguruma
    grok SEARCHES the input, e.g. the kafka module's timestamp pattern
    matching after a leading '['). Failure appends
    `grok_parse_failure` to the flags column and sets the error column
    unless ignore_failure."""

    name = "grok"

    def apply(self, df: DataFrame) -> DataFrame:
        src = field_col(df, self.cfg.get("field", "message"))
        if src is None:
            return _set_error(df, F.lit(True), "grok: missing field")
        pats = self.cfg.get("patterns") or (
            [self.cfg["pattern"]] if self.cfg.get("pattern") else []
        )
        if not pats:
            raise GrokError("grok: no pattern configured")
        extra = self.cfg.get("pattern_definitions")
        tp = self.cfg.get("target_prefix", "")
        prefix = (tp + ".") if tp else ""
        anchored = self.cfg.get("anchored", True)
        compiled = [
            grok_columns(src.cast("string"), p, extra, anchored=anchored)
            for p in pats
        ]
        matched_any: Column = F.lit(False)
        fields: dict[str, Column] = {}
        for matched, values in compiled:
            # first-match-wins: a later pattern only fills fields for
            # rows no earlier pattern matched
            take = matched & ~matched_any
            for k, v in values.items():
                prev = fields.get(k)
                # no explicit otherwise on first occurrence: an untyped
                # NULL literal would coerce typed captures to string
                fields[k] = (
                    F.when(take, v) if prev is None else F.when(take, v).otherwise(prev)
                )
            matched_any = matched_any | matched
        # Materialize every capture (and the match predicate) in ONE
        # projection from the ORIGINAL source before any put_field: a
        # capture that overwrites the source field itself (ES grok's
        # in-place `message` overwrite, e.g. kafka/icinga pipelines)
        # would otherwise poison later captures in the same stage —
        # withColumn re-resolves `message` against the updated plan.
        tmp = {f"__grok_{i}__": v for i, v in enumerate(fields.values())}
        tmp["__grok_matched__"] = F.coalesce(matched_any, F.lit(False))
        df = df.withColumns(tmp)
        writes: dict[str, Column] = {}
        for i, k in enumerate(fields):
            v = F.col(f"__grok_{i}__")
            cur = field_col(df, prefix + k)
            if cur is not None:
                # ES grok only ADDS fields: a failed match (or a
                # matching pattern that lacks this capture) leaves a
                # pre-existing field untouched — never nulls it (the
                # in-place `message` overwrite contract: kafka stage-2
                # keeps the stage-1 message when no [component] head
                # matches and on_failure only sets component)
                v = F.coalesce(v, cur)
            writes[prefix + k] = v
        # one batched projection: per-put_field withField chains make
        # the optimizer re-inline quadratically (see fields.put_fields)
        df = put_fields(df, writes)
        failed = ~F.col("__grok_matched__")
        df = add_flag(df, "grok_parse_failure", failed)
        if not self.cfg.get("ignore_failure", False):
            df = _set_error(df, failed, "grok: no pattern matched")
        return df.drop(*tmp)
