"""Text-analysis operators for training-data pipelines.

All of these stay JVM-side (built-in pyspark.sql.functions — no Python
in the hot path), so they run inside whole-stage codegen and scale
linearly with the scan: token counting, quality scoring, language-ID
scoring, and a deterministic trigram fingerprint.

Every operator here has an exact ANSI-SQL oracle (see __spark_entry__)
— expressions are chosen to be bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic trigram code: (c0<<42)|(c1<<21)|c2 on ASCII codepoints —
# the same packing as functions/fts5.pack_trigram, expressed in SQL so
# DuckDB can reproduce it exactly.
_TRI_CODE = (
    "ascii(substring(lc, i, 1)) * 4398046511104 "
    "+ ascii(substring(lc, i+1, 1)) * 2097152 "
    "+ ascii(substring(lc, i+2, 1))"
)

FINGERPRINT_MOD = 2305843009213693951  # 2^61 - 1 (Mersenne prime)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy (runs of
    alphanumerics / single punctuation, the common pre-tokenizer split)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), " +")
    subwords = F.split(t, "[^a-zA-Z0-9]+")
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words)).alias("n_tokens"),
        F.size(F.filter(subwords, lambda w: F.length(w) > 0)).alias("n_subwords"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length — rounded to 6 so cross-engine float
    comparisons are stable."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.length(t)
    words = F.filter(F.split(F.trim(t), " +"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    n_punct = n - F.length(F.regexp_replace(t, "[^a-z0-9 ]", ""))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    safe = lambda num, den: F.round(num.cast("double") / F.greatest(den, F.lit(1)).cast("double"), 6)
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        n_words.alias("n_words"),
        safe(n_punct, n).alias("punct_ratio"),
        safe(n_stop, n_words).alias("stopword_ratio"),
        safe(n - n_words + 1, n_words).alias("mean_word_len"),
    )


def lang_marker_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID by marker-token frequency (n-gram heuristic): counts
    of a few high-frequency function words per language family. A real
    deployment swaps in a trained n-gram profile; the dataflow (one
    scan, codegen'd counts, argmax) is the production shape."""
    t = F.concat(F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" "))

    def count_of(word):
        return (
            (F.length(t) - F.length(F.regexp_replace(t, f" {word} ", "")))
            / (len(word) + 2)
        ).cast("long")

    en = count_of("the") + count_of("and") + count_of("of")
    es = count_of("el") + count_of("la") + count_of("de")
    return docs.select(
        "doc_id",
        en.alias("en_score"),
        es.alias("es_score"),
        F.when(en >= es, F.lit("en")).otherwise(F.lit("es")).alias("pred_lang"),
    )


def trigram_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic positional document fingerprint:
    sum_i code(trigram_i) * ((i-1) % 64 + 1)  mod  (2^61-1).
    Pure SQL expressions (transform + aggregate over a generated index
    sequence) — reproducible in any ANSI engine, no UDF."""
    # codes are < 2^49 (ASCII), multiplier <= 64 -> x < 2^55; acc stays
    # < 2^61 after each mod, so everything fits in int64 in any engine.
    # len < 3 guard: Spark's sequence(1, 0) DESCENDS to [1, 0] instead
    # of being empty — short docs must fingerprint to 0 (code-review r3)
    expr = f"""
      CASE WHEN length(lc) >= 3 THEN
      aggregate(
        transform(sequence(1, length(lc) - 2),
                  i -> ({_TRI_CODE}) * ((i-1) % 64 + 1)),
        cast(0 as bigint),
        (acc, x) -> (acc + x) % {FINGERPRINT_MOD}
      ) ELSE cast(0 as bigint) END
    """
    return (
        docs.withColumn("lc", F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        .select(
            "doc_id",
            F.expr(expr).cast("long").alias("fingerprint"),
            F.greatest(F.length("lc") - 2, F.lit(0)).alias("n_trigrams"),
        )
    )


def split_identifiers(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Code-aware identifier splitting: camelCase / PascalCase /
    snake_case / kebab-case identifiers -> lowercase subtokens, exploded
    with counts. Pure regexp expressions (codegen'd, ANSI-reproducible):

      parseHTTPRequest -> parse, http, request
      build_posting_list -> build, posting, list

    The camel boundary regex inserts a split before every
    [A-Z][a-z] run and between [a-z0-9][A-Z] — the standard two-rule
    splitter that handles acronym runs (HTTPServer -> http, server)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # boundary 1: lower/digit followed by upper; boundary 2: acronym end
    camel = F.regexp_replace(t, "([a-z0-9])([A-Z])", "$1 $2")
    camel = F.regexp_replace(camel, "([A-Z]+)([A-Z][a-z])", "$1 $2")
    toks = F.split(F.lower(camel), "[^a-z0-9]+")
    return (
        docs.select("doc_id", F.explode(toks).alias("subtoken"))
        .filter(F.length("subtoken") > 0)
        .groupBy("subtoken")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("df"),
        )
    )


def trigram_document_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """I1+I2 as relational algebra over built-ins: explode the distinct
    trigram set per doc, aggregate document frequency per trigram. (The
    posting build in operators/build.py does this inside one UDF pass;
    this variant is the pure-Catalyst cross-check.)"""
    # len < 3 guard: sequence(1, 0) DESCENDS — short docs have NO trigrams
    tri = F.expr(
        "CASE WHEN length(lc) >= 3 THEN "
        "array_distinct(transform(sequence(1, length(lc) - 2),"
        " i -> substring(lc, i, 3))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return (
        docs.withColumn("lc", F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        .select("doc_id", F.explode(tri).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
