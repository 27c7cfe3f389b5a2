"""Text-analysis column builders (all JVM-side built-ins, no Python UDFs).

Everything here stays inside whole-stage codegen: split/transform/
aggregate/regexp are Catalyst expressions, so these run vectorized on
executors and scale linearly with input — the hot path for a 100 TB
document corpus never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic stopword list shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
# Kept to a dialect-neutral subset so Java regex (Spark) and RE2-ish
# (DuckDB) agree.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 131


def words(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def n_words(col: str = "text") -> Column:
    return F.size(words(col)).cast("bigint")


def n_tokens(col: str = "text") -> Column:
    return F.regexp_count(F.col(col), F.lit(TOKEN_PATTERN)).cast("bigint")


def stopword_count(col: str = "text") -> Column:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(f"size(filter(split({col}, ' '), w -> w IN ({in_list})))").cast("bigint")


def punct_count(col: str = "text") -> Column:
    return F.length(F.regexp_replace(F.col(col), "[^.,!?;:]", "")).cast("bigint")


def rolling_fingerprint(col: str = "text") -> Column:
    """Polynomial rolling hash over character codes (doc fingerprinting).

    acc = (acc * 131 + code) mod 1e9+7 — a left fold, so the value is
    engine-independent; stays within int64 (max acc*131+255 < 2^63).
    """
    return F.expr(
        f"aggregate(transform(sequence(1, length({col})), i -> ascii(substring({col}, i, 1))), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})"
    )


def lang_guess(col: str = "text") -> Column:
    """Deterministic n-gram/stopword language heuristic.

    The synthetic corpus shares one vocabulary across langs, so this is a
    fixed marker-based rule (the *shape* of an n-gram language-ID pass:
    cheap per-doc markers, no Python).
    """
    t = F.concat(F.lit(" "), F.col(col), F.lit(" "))
    return (
        F.when(t.like("% the %") | t.like("% of %"), "en")
        .when(t.like("% le %") | t.like("% la %"), "fr")
        .when(t.like("% der %") | t.like("% und %"), "de")
        .otherwise("unk")
    )


def sql_stopword_count(col: str = "text") -> str:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"CAST(len(list_filter(string_split({col}, ' '), w -> w IN ({in_list}))) AS BIGINT)"


def sql_rolling_fingerprint(col: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, CAST(length({col}) AS INT)), i -> CAST(ascii({col}[i]) AS BIGINT))), "
        f"(acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})"
    )


def sql_lang_guess(col: str = "text") -> str:
    t = f"(' ' || {col} || ' ')"
    return (
        f"CASE WHEN {t} LIKE '% the %' OR {t} LIKE '% of %' THEN 'en' "
        f"WHEN {t} LIKE '% le %' OR {t} LIKE '% la %' THEN 'fr' "
        f"WHEN {t} LIKE '% der %' OR {t} LIKE '% und %' THEN 'de' "
        f"ELSE 'unk' END"
    )
