"""PII/secret scrubbing for training corpora: classify + redact
emails, long hex secrets, IPv4 literals, phone numbers from document
text before training.

The generalization of the reference's replace processor
(libbeat/processors/actions/replace.go — regex find/replace on one
field) to a corpus-scrubbing pass: a fixed, ordered battery of
portable patterns, per-class match counts, and a single chained
regexp_replace for the redacted text.

Patterns are deliberately restricted to the Java-regex ∩ RE2 subset
(no lookaround, no backrefs) so the DuckDB oracle twin evaluates the
IDENTICAL expressions, and every count is an integer — exact
cross-engine parity.

Scale shape: pure per-row regexp_count/regexp_replace Column
expressions — the corpus scan stays in whole-stage codegen, no
shuffle, no Python. Pattern order matters for redaction (email before
ipv4 so an IP-shaped mail domain redacts as one email; secret before
phone so digits inside a hex run aren't re-matched); counts are
independent per-class scans of the ORIGINAL text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class -> (pattern, replacement); insertion order = redaction order
PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "secret": (r"\b[A-Fa-f0-9]{32,}\b", "<SECRET>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
}


def redaction_counts(col: Column, classes: tuple[str, ...] | None = None) -> dict[str, Column]:
    """Per-class match counts over the original text (independent
    scans — overlapping classes each count their own matches).
    classes=None means the full battery; an explicit empty tuple is a
    no-op, not all-classes."""
    names = tuple(PATTERNS) if classes is None else classes
    return {name: F.regexp_count(col, F.lit(PATTERNS[name][0])) for name in names}


def redact(col: Column, classes: tuple[str, ...] | None = None) -> Column:
    """Chained regexp_replace in PATTERNS order."""
    out = col
    for name in tuple(PATTERNS) if classes is None else classes:
        pat, rep = PATTERNS[name]
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub(
    df: DataFrame,
    text_col: str = "text",
    classes: tuple[str, ...] | None = None,
    out_col: str = "text_redacted",
) -> DataFrame:
    """Adds `out_col` (redacted text) and an `n_<class>` count column
    per pattern class."""
    c = F.col(text_col)
    out = df
    for name, expr in redaction_counts(c, classes).items():
        out = out.withColumn(f"n_{name}", expr)
    return out.withColumn(out_col, redact(c, classes))


def patterns_sql() -> dict[str, tuple[str, str]]:
    """The same battery for the DuckDB twin (RE2 evaluates these
    patterns identically; caller wraps in regexp_extract_all /
    regexp_replace(..., 'g'))."""
    return dict(PATTERNS)
