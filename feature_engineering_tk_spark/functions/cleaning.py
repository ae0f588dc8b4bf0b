"""Corpus hygiene: PII scrubbing and repetition (quality) signals.

Standard large-corpus cleaning steps a training-data pipeline runs
between dedup and tokenization:

- :func:`scrub_pii` — regex redaction of emails / IPv4s / phone-like
  strings to typed placeholder tokens. Pure ``regexp_replace`` column
  expressions (JVM, whole-stage codegen); patterns are deliberately
  alternation-free so the Java-regex and RE2 (DuckDB oracle) engines
  agree match-for-match.
- :func:`repetition_features` — Gopher-style repetition signals: for
  each n in ``ns``, the fraction of the document's n-grams occupied by
  its single most-frequent n-gram (high ⇒ boilerplate/spam), plus the
  duplicate-line fraction. Explode → partial-aggregatable groupBy per
  doc; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# alternation-free patterns, identical semantics under Java regex and RE2
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, column: str, out: str | None = None) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-like digit runs."""
    c: Column = F.col(column)
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out or column, c)


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-doc repetition signals (Gopher quality-rule family):

    - ``top{n}gram_frac``: occurrences of the most frequent n-gram /
      total n-grams (1/num_ngrams for a repetition-free doc).
    - ``dup_line_frac``: 1 - distinct lines / total lines.
    """
    from feature_engineering_tk_spark.operators.dedup import _norm_text, _shingles

    # NULL text must not silently drop the doc (explode of a null array
    # yields no rows, and an inner join would erase it from the output,
    # letting it bypass downstream quality filters): coalesce to '' and
    # LEFT-join the per-n aggregates back, filling 0.0 (repetition-free
    # sentinel) for docs too short to have any n-gram.
    text = F.coalesce(F.col(text_col), F.lit(""))
    out = df.select(id_col)
    for n in ns:
        grams = df.select(F.col(id_col), F.explode(_shingles(text, n)).alias("_g"))
        per = (
            grams.groupBy(id_col, "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy(id_col)
            .agg(
                (F.max("_c").cast("double") / F.sum("_c")).alias(f"top{n}gram_frac")
            )
        )
        out = out.join(per, id_col, "left").fillna({f"top{n}gram_frac": 0.0})
    lines = F.split(text, r"\n")
    dup_line = (
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
    )
    return out.join(df.select(F.col(id_col), dup_line.alias("dup_line_frac")), id_col)
