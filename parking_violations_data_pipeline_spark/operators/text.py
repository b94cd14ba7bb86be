"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2 J1-J5; driver mandate BASELINE.json:6).

Library API: every operator takes a DataFrame + column names and
returns a DataFrame, composing only JVM-side expressions (split,
explode, higher-order array fns) — no Python in the hot path, so the
plans whole-stage-codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text", out: str = "words") -> DataFrame:
    """Whitespace tokenization → array<string> column (empty tokens
    dropped). Spark split() is regex-based, so \\s+ collapses runs."""
    return df.withColumn(
        out, F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count:
    alphanumeric runs and single punctuation marks each count as one
    token (the standard pre-tokenizer split), all JVM-side regex."""
    return df.withColumn(
        "n_words", F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
    ).withColumn(
        "n_subtokens",
        F.size(
            F.filter(
                F.split(F.regexp_replace(F.col(text_col), r"([^A-Za-z0-9\s])", r" $1 "), r"\s+"),
                lambda w: w != "",
            )
        ),
    )


def word_shingles(df: DataFrame, n: int, text_col: str = "text", out: str = "shingles") -> DataFrame:
    """Word n-gram shingles as array<string>, via n shifted slices
    zipped positionally — one pass, no explode, no Python. Documents
    shorter than n words yield an empty array.

    Shape matters: the transform lambda must reference ONLY its own
    variable. The previous form transformed an index sequence and read
    `element_at(__w, i+k)` inside the lambda — Catalyst inlines the
    `__w = filter(split(text))` alias into the lambda body, so every
    element re-split the whole document: O(words²·chars) per row.
    Measured: a 44k-word document pinned one core for >18 minutes;
    this form shingles it in milliseconds (the split evaluates a
    constant ~n times per row, never per element)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    m = F.size("__w") - (n - 1)
    zipped = F.arrays_zip(*[F.slice("__w", k + 1, m) for k in range(n)])
    return (
        df.withColumn("__w", words)
        .withColumn(
            out,
            F.when(
                F.size("__w") >= n,
                F.transform(
                    zipped,
                    lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        .drop("__w")
    )


def char_shingles(df: DataFrame, k: int, text_col: str = "text", out: str = "shingles") -> DataFrame:
    """Character k-gram shingles (classic MinHash input)."""
    t = F.col(text_col)
    grams = F.expr(
        f"transform(sequence(1, length({text_col}) - {k - 1}), i -> substring({text_col}, i, {k}))"
    )
    return df.withColumn(
        out, F.when(F.length(t) >= k, grams).otherwise(F.array().cast("array<string>"))
    )


def term_frequencies(df: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf) long table — explode + count, the shuffle keyed
    on (doc, term) so partial aggregation absorbs repeats map-side."""
    return (
        tokenize(df, text_col, "words")
        .select(doc_col, F.explode("words").alias("term"))
        .groupBy(doc_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """tf-idf over the corpus: tf joined with per-term doc frequency,
    idf = ln(N / df). Pure DataFrame (no MLlib HashingTF) so results
    are exactly reproducible in the SQL oracle. The doc-frequency side
    is tiny (vocab-sized) → broadcast join back onto tf."""
    tf = term_frequencies(df, doc_col, text_col)
    n_docs = df.count()  # scalar; computed once at plan-build
    docfreq = tf.groupBy("term").agg(F.countDistinct(doc_col).alias("df"))
    # Size-gated broadcast (guide §3.1): the vocabulary scales with the
    # corpus (sub-linearly, but unboundedly), so a hard hint is a 100-TB
    # broadcast-cap death. n_docs is already on the driver — gate on it;
    # past the gate AQE picks the join strategy from runtime stats.
    import os

    max_docs = int(os.environ.get("SPARK_GRAFT_BCAST_MAX_DOCS", str(1 << 20)))
    if 0 < n_docs <= max_docs:
        docfreq = F.broadcast(docfreq)
    return (
        tf.join(docfreq, "term")
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
    )


def exact_dedup_text(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """J5: exact near-duplicate removal on text content, deterministic
    survivor = min key. At 100 TB: group on xxhash64(text) first so the
    shuffle key is 8 bytes, not the document; hash collisions are
    resolved by the min-key rule within group (same output either way
    for true duplicates)."""
    w = W.partitionBy(F.xxhash64(F.col(text_col))).orderBy(key_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def lang_profiles(df: DataFrame, lang_col: str = "lang", text_col: str = "text", top_k: int = 8) -> DataFrame:
    """Language-ID 'training': per-language profile = top-k most
    frequent tokens (count desc, token asc tie-break). N-gram-heuristic
    langid in the classic (Cavnar-Trenkle) style, word-granularity."""
    counts = (
        tokenize(df, text_col, "words")
        .select(lang_col, F.explode("words").alias("term"))
        .groupBy(lang_col, "term")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy(lang_col).orderBy(F.desc("cnt"), "term")
    return counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= top_k)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Text-quality heuristics: length, word count, mean word length,
    stopword ratio, alpha ratio — the standard pre-training filters,
    all as one codegen'd projection; score = weighted combination."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to", "in")])
    n_words = F.size("__w")
    n_stop = F.size(F.filter(F.col("__w"), lambda x: F.array_contains(stop, x)))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    return (
        df.withColumn("__w", words)
        .withColumn("n_chars_m", F.length(text_col))
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.round((alpha_chars.cast("double") / F.greatest(n_words, F.lit(1))), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 6),
        )
        .withColumn(
            "alpha_ratio",
            F.round(alpha_chars.cast("double") / F.greatest(F.length(text_col), F.lit(1)), 6),
        )
        .drop("__w")
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: 64-bit rolling-hash style digest =
    xxhash64 of the normalized token stream. Cross-engine hash values
    are engine-specific → rows-only checked; determinism + collision
    behavior asserted in tests."""
    norm = F.concat_ws(" ", F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""))
    return df.withColumn(out, F.xxhash64(norm))
