"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All native Column expressions (split/filter/aggregate) — no Python in
the hot path; a 100 TB documents scan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "des", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
}

_WORD_SEP = r"\s+"


def _ws_trim(col: Column) -> Column:
    """Strip ALL leading/trailing whitespace — F.trim strips only
    spaces, which would leave \\t/\\n edges and make token_count
    diverge from size(words()) (ADVICE r02). DuckDB oracles use the
    same regexp_replace(..., 'g')."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def words(col: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (split on a
    leading/trailing separator yields empties)."""
    return F.filter(F.split(_ws_trim(col), _WORD_SEP), lambda w: w != "")


def token_count(col: Column) -> Column:
    """Whitespace token count — HOF-free: after a full whitespace trim,
    split-on-\\s+ yields an empty token ONLY for the empty string, so
    the filter in words() reduces to one when() (HOF lambdas evaluate
    interpreted; this runs on every doc of the primary scan)."""
    t = _ws_trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WORD_SEP))
    )


# BPE-ish subword pre-tokenizer: GPT-2-style contractions + word/number/
# punct classes (a regex analog of the tiktoken pattern)
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp_extract_all, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(f"({_BPE_RE})"), 1))


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of whitespace tokens equal to a stopword — as one
    regexp_count (codegen) instead of filter-HOF token equality: a
    token equals a stopword iff the word appears bounded by
    whitespace/edges, and Java-regex backtracking makes prefix
    alternatives safe (longest-first ordering as belt-and-braces)."""
    sw = sorted(STOPWORDS[lang], key=len, reverse=True)
    pat = r"(?:(?<=\s)|^)(?:" + "|".join(sw) + r")(?:(?=\s)|$)"
    return F.regexp_count(F.lower(col), F.lit(pat))


def language_id(col: Column, default: str = "und") -> Column:
    """Stopword-hit argmax over the supported languages; ties broken by
    language-code order (deterministic). Documents with zero hits in
    every language → `default`."""
    langs = sorted(STOPWORDS)
    hits = {lang: stopword_hits(col, lang) for lang in langs}
    best: Column = F.lit(default)
    best_hits: Column = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties → apply last
        h = hits[lang]
        better = h >= best_hits
        best = F.when(h > 0, F.when(better, F.lit(lang)).otherwise(best)).otherwise(best)
        best_hits = F.when(better & (h > 0), h).otherwise(best_hits)
    return best


def quality_features(col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword ratio features (the classic quality
    filters of C4/Gopher-style pipelines), each a native expression."""
    n_chars = F.length(col)
    n_words = token_count(col)
    mean_word_len = F.when(
        n_words > 0,
        (n_chars - (n_words - 1)).cast("double") / n_words.cast("double"),
    )
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"([\.,;:!\?])"), 1))
    n_digits = F.size(F.regexp_extract_all(col, F.lit(r"([0-9])"), 1))
    en_sw = stopword_hits(col, "en")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.round(mean_word_len, 6),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(n_digits.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            en_sw.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: penalize too-short docs, extreme
    punctuation/digit density, no stopwords. Deterministic arithmetic."""
    f = quality_features(col)
    length_ok = F.least(f["n_words"].cast("double") / F.lit(20.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["digit_ratio"] * 5)
    sw_ok = F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    return F.round((length_ok + punct_pen + digit_pen + sw_ok) / 4, 6)


def doc_fingerprint(col: Column, mod: int = (1 << 31) - 1, base: int = 257) -> Column:
    """Rolling polynomial hash over the document's words — a stable
    64-bit content fingerprint (same value ⇒ near-certain duplicate).
    fold(acc*base + xxhash(word)) mod p, all JVM-side."""
    return F.aggregate(
        words(col),
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            acc * F.lit(base) + F.pmod(F.xxhash64(w), F.lit(mod)), F.lit(mod)
        ),
    )


ALL_REPETITION_SIGNALS = ("dup_word", "dup_line", "dup_line_char", "top2", "dup3")


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    signals: tuple[str, ...] = ALL_REPETITION_SIGNALS,
) -> DataFrame:
    """Gopher-style repetition signals per document (the "repetitious
    text" quality filters of Rae et al. 2021 §A1.1, adapted to integer
    ppm so every signal has an exact DuckDB oracle twin):

    - dup_word_ppm      1 - distinct words / words
    - dup_line_ppm      1 - distinct lines / lines (empty lines ignored)
    - dup_line_char_ppm chars in lines occurring >1 time / line chars
    - top2_ppm          chars of the most frequent word 2-gram / chars
                        (ties broken by gram asc — deterministic)
    - dup3_ppm          chars in 3-grams occurring >1 time / 3-gram chars

    Scale shape: up to three exploded aggregates, each keyed
    (doc_id, unit) — grams/lines never cross documents, so there is no
    hot key and every groupBy is map-side combined; the join back to
    the corpus is on the id only (≤5 ints/doc). Array signals
    (dup_word/dup_line) are per-row array ops in the scan stage, no
    shuffle. `signals` selects a subset: only the exploded aggregates
    a requested signal needs are planned (a funnel that reads
    dup_word+top2 skips the 3-gram AND line explodes entirely).
    """
    unknown = set(signals) - set(ALL_REPETITION_SIGNALS)
    if unknown:
        raise ValueError(f"unknown repetition signals: {sorted(unknown)}")
    from beats_spark.training.curate import word_ngrams_all

    did = F.col(id_col)
    text = F.col(text_col)
    ws = words(text)
    nl_trim = F.regexp_replace(text, r"^\n+|\n+$", "")
    lines = F.when(F.length(nl_trim) == 0, F.array().cast("array<string>")).otherwise(
        F.split(nl_trim, r"\n+")
    )

    def ppm(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, F.round(num.cast("double") * 1e6 / den.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    base_cols = [
        did.alias("__id"),
        F.length(text).alias("__n_chars"),
        F.size(ws).alias("__n_words"),
    ]
    if "dup_word" in signals:
        base_cols.append(F.size(F.array_distinct(ws)).alias("__nw_d"))
    if "dup_line" in signals:
        base_cols += [
            F.size(lines).alias("__nl"),
            F.size(F.array_distinct(lines)).alias("__nl_d"),
        ]
    base = df.select(*base_cols)
    sig = base

    if "dup_line_char" in signals:
        # per-line multiplicity → chars in duplicated lines
        line_counts = (
            df.select(did.alias("__id"), F.explode(lines).alias("l"))
            .groupBy("__id", "l")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        line_chars = line_counts.groupBy("__id").agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("l")).otherwise(F.lit(0))
            ).alias("__dup_line_chars"),
            F.sum(F.col("c") * F.length("l")).alias("__line_chars"),
        )
        sig = sig.join(line_chars, "__id", "left")

    if "top2" in signals:
        # most frequent word 2-gram (count desc, gram asc)
        from pyspark.sql.window import Window

        g2 = (
            df.select(did.alias("__id"), F.explode(word_ngrams_all(text, 2)).alias("g"))
            .groupBy("__id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top2 = (
            g2.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__id").orderBy(F.desc("c"), F.asc("g"))
                ),
            )
            .filter(F.col("__rn") == 1)
            .select("__id", (F.col("c") * F.length("g")).alias("__top2_chars"))
        )
        sig = sig.join(top2, "__id", "left")

    if "dup3" in signals:
        # chars in repeated 3-grams / total 3-gram chars
        g3 = (
            df.select(did.alias("__id"), F.explode(word_ngrams_all(text, 3)).alias("g"))
            .groupBy("__id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        dup3 = g3.groupBy("__id").agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(F.lit(0))
            ).alias("__dup3_chars"),
            F.sum(F.col("c") * F.length("g")).alias("__g3_chars"),
        )
        sig = sig.join(dup3, "__id", "left")

    out_cols = [F.col("__id").alias(id_col)]
    if "dup_word" in signals:
        out_cols.append(
            ppm(F.col("__n_words") - F.col("__nw_d"), F.col("__n_words")).alias(
                "dup_word_ppm"
            )
        )
    if "dup_line" in signals:
        out_cols.append(
            ppm(F.col("__nl") - F.col("__nl_d"), F.col("__nl")).alias("dup_line_ppm")
        )
    if "dup_line_char" in signals:
        out_cols.append(
            ppm(
                F.coalesce(F.col("__dup_line_chars"), F.lit(0)),
                F.coalesce(F.col("__line_chars"), F.lit(0)),
            ).alias("dup_line_char_ppm")
        )
    if "top2" in signals:
        out_cols.append(
            ppm(
                F.coalesce(F.col("__top2_chars"), F.lit(0)), F.col("__n_chars")
            ).alias("top2_ppm")
        )
    if "dup3" in signals:
        out_cols.append(
            ppm(
                F.coalesce(F.col("__dup3_chars"), F.lit(0)),
                F.coalesce(F.col("__g3_chars"), F.lit(0)),
            ).alias("dup3_ppm")
        )
    return df.join(sig.select(*out_cols), id_col)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    out = df
    for name, expr in quality_features(c).items():
        out = out.withColumn(name, expr)
    return (
        out.withColumn("n_tokens_ws", token_count(c))
        .withColumn("n_tokens_bpe", bpe_token_count(c))
        .withColumn("lang_pred", language_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )


def cooccurrence_pairs(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
) -> DataFrame:
    """Skip-gram co-occurrence counts: every unordered word pair whose
    positions are ≤ `window` apart inside a document, normalized as
    (lexicographic min, max) — the counting pass behind PMI phrase
    mining / word-association tables (word2vec's context window,
    counted exactly).

    Scale shape: pairs generate INSIDE the row as `window` shifted-
    slice zips — zip_with(ws[1:n−d], ws[1+d:n], pair) for each offset
    d — one vectorized pass per offset over a bounded n_words·window
    struct array (the q24 token-window shape), then one (w_a, w_b)
    groupBy. Facts carry two short strings per generated row into the
    exchange; no self-join anywhere.

    PERF (measured 61s → sub-second at sf0.1): the obvious nested
    transform with element_at(ws, i) per pair re-evaluates the whole
    tokenize expression for EVERY element access (ws here is an
    expression, not a materialized column, and interpreted HOF
    lambdas don't cache it) — O(n_words²) splits per doc. The
    shifted-slice form touches ws a fixed 2·window times per row."""
    ws = words(F.col(text_col))
    n = F.size(ws)

    def pairs_at(d: int) -> Column:
        ln = F.greatest(n - F.lit(d), F.lit(0))
        a = F.slice(ws, 1, ln)
        b = F.slice(ws, 1 + d, ln)
        return F.zip_with(
            a,
            b,
            lambda x, y: F.struct(
                F.least(x, y).alias("w_a"), F.greatest(x, y).alias("w_b")
            ),
        )

    pairs = F.concat(*[pairs_at(d) for d in range(1, window + 1)])
    exploded = df.select(F.explode(pairs).alias("p")).select(
        F.col("p.w_a").alias("w_a"), F.col("p.w_b").alias("w_b")
    )
    return exploded.groupBy("w_a", "w_b").agg(
        F.count(F.lit(1)).alias("n_pair")
    )


# --- Unicode normalization / text cleanup --------------------------------------
#
# The preprocessing stage every web-scale text pipeline runs before
# tokenization (C4, CCNet, RefinedWeb all normalize before anything
# hashes or dedups): strip non-printing control bytes, collapse
# whitespace runs, trim, then Unicode canonical composition (NFC,
# UAX #15) so "e + COMBINING ACUTE" and precomposed "é" stop being
# distinct tokens/shingle families. Everything except NFC itself is a
# JVM regexp chain inside whole-stage codegen; NFC has no Spark
# builtin, so it is an Arrow-batched pandas UDF with a C-speed
# str.isascii() fast path (web corpora are mostly ASCII; those rows
# never enter unicodedata).

# C0 controls except \t \n \r, plus DEL — the bytes that survive in
# real crawl text but carry no content (form feeds from PDFs, BELs
# from terminal logs). ASCII-only ranges, so Java regex and RE2 read
# the class identically.
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def nfc_udf() -> "F.udf":
    """Arrow-batched NFC normalizer (string → string). ASCII rows —
    the overwhelming majority of a web corpus — short-circuit on
    str.isascii() (a C-level flag check) and never touch unicodedata.
    Python's unicodedata and DuckDB's utf8proc both implement UAX #15
    canonical composition, so oracle twins agree byte-for-byte on
    assigned codepoints (probed: combining acute/ring compose, the
    compositionless q+U+0301 stays decomposed, in both engines)."""
    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()

    @F.pandas_udf("string")
    def nfc(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda t: t
            if t is None or t.isascii()
            else unicodedata.normalize("NFC", t)
        )

    return nfc


def normalize_text(col: Column, nfc: bool = True) -> Column:
    """control-strip → whitespace-run collapse → trim → NFC.

    Stage order matters only in that the collapse must see the text
    after control removal (a control byte between two spaces would
    otherwise shield the run); NFC commutes with all three (it never
    creates or destroys ASCII whitespace/controls) and runs LAST so
    the JVM stages stay one codegen span with the single
    ArrowEvalPython on top. DuckDB twin:
    nfc_normalize(trim(regexp_replace(regexp_replace(t, ctl, '', 'g'),
    '\\s+', ' ', 'g'))) — RE2 needs the 'g' flag (DuckDB replaces
    first-match by default; Spark replaces all)."""
    c = F.regexp_replace(col, CONTROL_CLASS, "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return nfc_udf()(c) if nfc else c
