"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting.

All pure column expressions (JVM-side, whole-stage-codegen'd): at 100 TB
these run inside the scan stage with zero Python cost. The occurrence
counter uses the length-difference trick — ``(len(s) -
len(replace(s, t, ''))) / len(t)`` — which has bit-identical semantics
in Spark and ANSI SQL, keeping every operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Public knowledge (most-frequent function words per language).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "une"),
    "de": ("der", "die", "und", "das", "ein"),
}

#: Characters counted as punctuation by the quality scorer.
_PUNCT_CLASS = r"[^.,!?;:]"


def occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of ``needle`` (length trick)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def token_count(col: Column) -> Column:
    """Whitespace token count; blank/NULL-safe (0 for empty text)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def punct_count(col: Column) -> Column:
    """Number of punctuation characters ``.,!?;:`` in the text."""
    return F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))


def stopword_hits(col: Column, lang: str) -> Column:
    """Total occurrences of the language's stopwords as whole words.

    Counts `` word `` with padded text so boundaries need no regex —
    the same expression is ANSI-SQL (oracle-parity safe).
    """
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    total = F.lit(0)
    for w in STOPWORDS[lang]:
        total = total + occurrences(padded, f" {w} ")
    return total


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1].

    Blend of: non-trivial length, moderate mean token length, and
    punctuation presence — the standard cheap pre-filter shape used by
    large-scale corpus pipelines (length/punct/stopword ratios).
    """
    n_tok = token_count(col)
    n_chars = F.length(col)
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    tok_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_count(col) > 0, 1.0).otherwise(0.0)
    return (0.5 * len_ok + 0.3 * tok_ok + 0.2 * punct_ok).cast("double")


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit score per candidate language."""
    return {lang: stopword_hits(col, lang) for lang in STOPWORDS}


def lang_id(col: Column, default: str = "und") -> Column:
    """Pick the language with the most stopword hits (ties: lang order).

    Deterministic argmax over :data:`STOPWORDS`; returns ``default``
    when no stopword of any language appears (e.g. non-Latin scripts).
    """
    scores = lang_scores(col)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    # Iterate in fixed order; strict > keeps the earliest max (stable).
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


#: Greedy subword pattern: ≤4-letter alpha chunks, single digits,
#: single non-space symbols — a cheap BPE-piece-count estimator.
BPE_ISH_PATTERN = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_estimate(col: Column) -> Column:
    """Estimated BPE token count via the subword regex (JVM-side).

    Within ~15% of real GPT-2-family tokenizers on English prose; the
    point is a deterministic, engine-portable budget estimate, not
    tokenizer fidelity.
    """
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    Exact-dup detection key (same role as a rolling content hash but
    collision-safe and available in every SQL engine for the oracle).
    """
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized.cast("binary"))


def with_text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis profile as columns."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_punct": punct_count(c),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )


def winnowing_fingerprint_rows(
    df: "DataFrame", id_col: str, text_col: str, *, k: int = 8, w: int = 4
) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS scheme): rolling char k-gram hashes → min per sliding
    window of ``w`` → distinct ``(_id, _fp)`` rows.

    The selected mins are the classic rolling-hash fingerprint set:
    ~2/(w+1) of the grams, position-robust (an edit only perturbs
    nearby windows). All codegen-friendly primitives — explode +
    substring + md5-prefix hash + one window (single shuffle on doc
    id) + distinct; the same expressions are ANSI-SQL so the operator
    is oracle-checkable (hash = first 15 hex digits of md5 as bigint,
    bit-identical in Spark ``conv`` and DuckDB hex cast).
    """
    from pyspark.sql import Window as W

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_grams = F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1))
    grams = (
        df.select(F.col(id_col).alias("_id"), norm.alias("_norm"))
        .select("_id", "_norm", F.explode(F.sequence(F.lit(1), n_grams)).alias("_pos"))
        .select(
            "_id",
            "_pos",
            F.conv(F.substring(F.md5(F.col("_norm").substr(F.col("_pos"), F.lit(k))), 1, 15), 16, 10)
            .cast("bigint")
            .alias("_h"),
        )
    )
    win = W.partitionBy("_id").orderBy("_pos").rowsBetween(0, w - 1)
    return (
        grams.select("_id", F.min("_h").over(win).alias("_fp"))
        .dropDuplicates(["_id", "_fp"])
    )


#: Tiny polarity lexicon for lexicon-based sentiment scoring over the
#: synthetic corpus vocabulary (the classic count-positive-minus-negative
#: scheme of large-scale Spark sentiment pipelines — PAPERS.md, "Large
#: Scale Sentiment Analysis on Twitter with Spark", EDBT 2016). Swap the
#: word lists for a real lexicon (AFINN/VADER) on natural text.
SENTIMENT_LEXICON: dict[str, tuple[str, ...]] = {
    "pos": ("fast", "value", "merge"),
    "neg": ("slow", "big", "stale"),
}


def sentiment_hits(col: Column, polarity: str) -> Column:
    """Word-boundary hit count against one polarity's lexicon."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    hits = [occurrences(padded, f" {w} ") for w in SENTIMENT_LEXICON[polarity]]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def sentiment_score(col: Column) -> Column:
    """(pos - neg) / (pos + neg + 1) in [-1, 1]; +1 smooths empty docs.

    Pure integer counting + one division — codegen all the way, and
    bit-identical in ANSI SQL for the oracle.
    """
    pos, neg = sentiment_hits(col, "pos"), sentiment_hits(col, "neg")
    return (pos - neg) / (pos + neg + F.lit(1))
