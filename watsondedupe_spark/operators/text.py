"""Text analysis operators: language-id, quality, tokens, fingerprints.

All column expressions are Spark built-ins (whole-stage codegen); the
DataFrame-level operators add at most one shuffle (the per-doc groupBy
in winnowing). The oracle-pinned variants live in
``queries/llm_pipeline.py``; these are the general, tunable forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "ist", "zu"),
    "fr": ("le", "la", "de", "et", "est", "un"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def alpha_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+"), 0)).cast("long")


def est_bpe_tokens(text: Column) -> Column:
    """chars/4 heuristic — the standard quick estimate for BPE vocab."""
    return F.ceil(F.length(text) / 4.0).cast("long")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[^a-zA-Z0-9 ]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def stopword_ratio(text: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("double") / F.size(toks)


def avg_token_len(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / F.size(tokens(text))


def quality_score(text: Column, full_tokens: int = 50) -> Column:
    """Composite [0, ~1.5] score: enough tokens, low punctuation noise,
    natural stopword density."""
    return (
        F.least(F.lit(1.0), token_count(text) / float(full_tokens))
        * (1.0 - punct_ratio(text))
        * (0.5 + stopword_ratio(text))
    )


def lang_scores(text: Column, markers=None) -> dict[str, Column]:
    markers = markers or LANG_MARKERS
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in markers.items()
    }


def predict_lang(df: DataFrame, text_col: str, markers=None) -> DataFrame:
    """Append per-language marker scores and an argmax ``pred_lang``
    column (deterministic first-wins tie-break in key order)."""
    scores = lang_scores(F.col(text_col), markers)
    out = df
    for lang, col in scores.items():
        out = out.withColumn(f"score_{lang}", col)
    langs = list(scores)
    pred = None
    for lang in reversed(langs):
        cond_cols = [F.col(f"score_{lang}") >= F.col(f"score_{other}") for other in langs if other != lang]
        cond = cond_cols[0]
        for c in cond_cols[1:]:
            cond = cond & c
        pred = F.when(cond, lang) if pred is None else F.when(cond, lang).otherwise(pred)
    # reversed iteration means earlier keys win ties (outermost WHEN last)
    return out.withColumn("pred_lang", pred)


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints: md5 over char k-grams, minimum per
    sliding window of ``window`` positions, distinct per document.

    Returns (id, fp) rows — the classic local-fingerprint set used for
    plagiarism/overlap detection; ``n_fingerprints ~ 2*len/(window+1)``.
    """
    kg = (
        df.select(
            F.col(id_col).alias("id"),
            F.length(text_col).alias("n"),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - k + 1)).alias("pos"),
            F.col(text_col).alias("__t"),
        )
        .select("id", "n", "pos", F.md5(F.expr(f"substr(__t, pos, {k})")).alias("h"))
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        kg.select("id", "n", "pos", F.min("h").over(w).alias("fp"))
        .filter(F.col("pos") <= F.col("n") - k + 1 - (window - 1))
        .select("id", "fp")
        .distinct()
    )
