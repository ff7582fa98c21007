"""Text-analysis operators for LLM-scale data pipelines (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).

All pure column expressions over ``documents(text)`` — no Python UDFs, so
the whole pipeline stays inside whole-stage codegen and scales linearly with
executors. Tokenization is single-space split (the corpus is word-salad);
swap ``TOKEN_SPLIT`` for a regex split for real corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = " "

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + ASCII so the heuristic is cheap and
# portable; tie-break order is en > fr > es > de.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "et", "de", "un", "les", "des"),
    "es": ("el", "los", "y", "una", "que", "por"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
}


def tokens(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, TOKEN_SPLIT)


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column | str, words: tuple[str, ...]) -> Column:
    """Count of tokens (with multiplicity) that are in ``words``."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Language-ID heuristic: argmax of per-language stopword hit counts,
    'unknown' when no set matches. Deterministic tie-break by the fixed
    language order."""
    scores = {lang: stopword_count(text, ws) for lang, ws in STOPWORDS.items()}
    en, fr, es, de = scores["en"], scores["fr"], scores["es"], scores["de"]
    best = (
        F.when((en >= fr) & (en >= es) & (en >= de), "en")
        .when((fr >= es) & (fr >= de), "fr")
        .when(es >= de, "es")
        .otherwise("de")
    )
    return F.when(en + fr + es + de == 0, "unknown").otherwise(best)


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / token / stopword / punctuation features for quality scoring.

    Mirrors the heuristics production LLM-data pipelines use (doc length,
    mean word length, stopword density, symbol noise)."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    toks = n_tokens(t)
    stop = stopword_count(t, STOPWORDS["en"])
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^a-z0-9 ]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": toks.cast("long"),
        "avg_token_len": F.round((n_chars - toks + 1) * 1.0 / toks, 4),
        "stopword_ratio": F.round(stop * 1.0 / toks, 4),
        "punct_ratio": F.round(n_punct * 1.0 / n_chars, 4),
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: length credit + stopword density +
    word-shape credit (weights 0.5 / 0.3 / 0.2).

    Final rounding is an explicit floor-based HALF_UP (`floor(x·10⁴+0.5)`)
    — engine `round()`s disagree on .xxxx5 double boundaries (Spark
    HALF_UP vs DuckDB's half-even behavior on doubles), and the weighted
    sum lands on such boundaries in practice."""
    f = quality_features(text)
    length_credit = F.least(F.lit(1.0), f["n_tokens"] / F.lit(100.0))
    shape_credit = F.least(F.lit(1.0), f["avg_token_len"] / F.lit(8.0))
    raw = length_credit * 0.5 + f["stopword_ratio"] * 0.3 + shape_credit * 0.2
    return F.floor(raw * 10000 + F.lit(0.5)) / 10000


def bpe_ish_token_count(text: Column | str) -> Column:
    """Regex token count approximating a BPE pre-tokenizer: runs of letters,
    runs of digits, or single non-alnum symbols."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast(
        "long"
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of ``text`` (k=3 default).

    Requires >= k tokens; callers filter shorter docs out (Spark's
    ``sequence(1, n)`` runs DESCENDING when n < 1, so an unguarded
    expression would silently fabricate shingles)."""
    ws = tokens(text)
    idx = F.sequence(F.lit(1), F.size(ws) - (k - 1))
    make = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + off) for off in range(k)]
    )
    return F.array_distinct(F.transform(idx, make))


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays (double)."""
    return F.size(F.array_intersect(a, b)) * F.lit(1.0) / F.size(
        F.array_union(a, b)
    )


# PII patterns kept RE2-compatible (no backrefs/lookarounds) so the same
# regex runs identically under Spark's Java regex and DuckDB's RE2.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9 .-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(text: Column | str, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace each PII match with ``<KIND>`` — the standard pre-training
    scrub pass; chained regexp_replace stays in whole-stage codegen."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def chunk_tokens(
    df, text_col: str, id_col: str, chunk_tokens_n: int = 64, overlap: int = 16
):
    """Split documents into fixed-token-count chunks with overlap — the
    LLM-training chunking pass. JVM-side: tokenize once, posexplode over
    chunk starts, slice+join per chunk. Stride = chunk - overlap; the last
    chunk may be short; empty docs yield no chunks."""
    stride = chunk_tokens_n - overlap
    tokenized = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ws")
    ).withColumn("_n", F.size("_ws")).where(F.col("_n") > 0)
    # chunk starts: 1, 1+stride, ... (1-based slice); token array rides
    # through the explode so no re-join/re-tokenize
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("_n") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    return tokenized.select(
        id_col, "_ws", F.posexplode(starts).alias("chunk_idx", "_start")
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_ws"), F.col("_start"), F.lit(chunk_tokens_n)), " "
        ).alias("chunk_text"),
    )


def term_frequencies(df, text_col: str, id_col: str):
    """Long (doc, term, tf) frame: tokenize once, explode, count per doc."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df, text_col: str, id_col: str, min_df: int = 1):
    """TF-IDF per (doc, term): tf × ln(N / df).

    Two aggregations over the exploded token frame (per-doc tf, corpus df)
    joined back — the document-frequency side is tiny (vocabulary-sized)
    and broadcasts. ``min_df`` prunes hapax noise. The natural log runs on
    identical doubles in any IEEE engine, so scores are oracle-comparable
    after rounding."""
    tf = term_frequencies(df, text_col, id_col)
    n_docs = df.count()  # scalar; one count job, reused as a literal
    df_counts = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
    )
    return (
        tf.join(F.broadcast(df_counts), "term")
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def doc_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Winnowing-lite content fingerprint: lexicographic min of md5 over the
    doc's k-word shingles. Stable under reordering of equal content; cheap
    enough to compute at ingest for every document."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(s)))
