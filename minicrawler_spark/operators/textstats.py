"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting (north-rule
additions). Everything is built-in pyspark.sql.functions — JVM-side,
whole-stage-codegen'd, SQL-mirrorable for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize, _word_ngrams

__all__ = ["STOPWORDS", "PII_PATTERNS", "token_stats", "quality_score",
           "lang_guess", "fingerprint", "repetition_stats", "scrub_pii",
           "decontaminate", "vocab_stats", "tfidf_top_terms"]

# tiny per-language stopword lists (shared verbatim with the SQL oracle)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "are"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "pour", "dans"],
    "es": ["el", "la", "que", "de", "los", "es", "por", "con", "para", "una"],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword proxy
    (ceil(chars/4) per token, the common bytes-per-token heuristic)."""
    toks = tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda s, t: s + F.ceil(F.length(t) / 4).cast("long"),
        ).alias("n_subwords"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            F.length("text")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length, punctuation density,
    uppercase density, stopword coverage (English list). Deterministic
    closed formula; the oracle repeats it verbatim in SQL."""
    toks = tokenize(F.col("text"))
    n_tok = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.greatest(
        n_tok, F.lit(1)
    )
    punct_ratio = (
        F.length(F.regexp_replace("text", r"[^!?.,;:]", "")) / F.greatest(F.length("text"), F.lit(1))
    )
    upper_ratio = (
        F.length(F.regexp_replace("text", r"[^A-Z]", "")) / F.greatest(F.length("text"), F.lit(1))
    )
    len_score = F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(upper_ratio * 5, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_guess(docs: DataFrame) -> DataFrame:
    """Language ID via stopword-hit argmax over the four lists —
    the n-gram-heuristic family, engine-portable."""
    toks = tokenize(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.round(
                    F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n_tok,
                    6,
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def fingerprint(docs: DataFrame, n: int = 3) -> DataFrame:
    """Document fingerprint: min/max of md5 over word 3-shingles — a
    rolling-window content signature (MinHash k=1 plus an anchor),
    stable across engines. Explode+aggregate, not per-row array
    transforms: Catalyst re-evaluates a higher-order-function chain
    once per referencing expression (3x md5 of every shingle,
    measured 44s -> 4s at sf0.1)."""
    # relational shingling (posexplode + lead windows): HOF array
    # lambdas run interpreted and re-evaluate per reference
    from .dedup import word_ngram_rows

    grams = word_ngram_rows(docs, n).withColumnRenamed("gram", "g")
    agg = grams.groupBy("doc_id").agg(
        F.min(F.md5("g")).alias("fp_min"),
        F.max(F.md5("g")).alias("fp_max"),
        F.count("*").alias("n_shingles"),
    )
    # docs with < n tokens have no shingles but keep a row
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id", "fp_min", "fp_max",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition-based quality filters — the public Gopher/Dolma
    heuristics for machine-generated or boilerplate text (Rae et al.
    2021, "Scaling Language Models", App. A1.1): per document,

    - n_lines: non-empty lines,
    - dup_line_frac: fraction of lines that are repeats of an
      earlier line ((n_lines - distinct)/n_lines),
    - dup_line_char_frac: fraction of line characters inside those
      repeats,
    - top_bigram_frac: occurrences of the most frequent word bigram
      over all bigram occurrences.

    All relational (explode -> two-level aggregate; one shuffle per
    stat family, no higher-order lambdas in the hot path) and mirrored
    verbatim by the DuckDB oracle (q_repetition)."""
    from .dedup import word_ngram_rows

    lines = F.filter(F.split(F.col("text"), "\n"), lambda l: l != "")
    exploded = docs.select("doc_id", F.explode(lines).alias("line"))
    per_line = exploded.groupBy("doc_id", "line").agg(
        F.count("*").alias("cnt"), F.first(F.length("line")).alias("ln")
    )
    per_doc = per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("ln") * F.col("cnt")).alias("chars_all"),
        F.sum("ln").alias("chars_dist"),
    )
    grams = word_ngram_rows(docs, 2)
    gram_counts = grams.groupBy("doc_id", "gram").agg(
        F.count("*").alias("c")
    )
    top = gram_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(
                F.coalesce(
                    (F.col("n_lines") - F.col("n_distinct"))
                    / F.greatest(F.col("n_lines"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(
                    (F.col("chars_all") - F.col("chars_dist"))
                    / F.greatest(F.col("chars_all"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_char_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


# PII patterns kept RE2-compatible (no lookarounds, no backrefs) so
# the Spark (Java regex) and DuckDB (RE2) engines match identically;
# scrubbing is SEQUENTIAL — each pattern counts and replaces on the
# output of the previous one, which the SQL oracle mirrors with
# nested CTEs
PII_PATTERNS = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4s", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ids", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
)


def scrub_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing (the redaction pass every public training corpus
    runs): emails, IPv4 addresses and SSN-shaped ids replaced with
    typed placeholder tokens, with per-kind match counts kept on the
    row for audit/filtering. Pure codegen — regexp_extract_all +
    regexp_replace, no Python — and a narrow map (no shuffle).
    Non-text columns pass through unchanged (so score/metadata
    columns survive without a self-join on the upstream chain)."""
    text = F.col("text")
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .alias("n_" + name)
        )
        text = F.regexp_replace(text, pat, rep)
    others = [c for c in docs.columns if c != "text"]
    return docs.select(*others, *counts, text.alias("text"))


def decontaminate(docs: DataFrame, evals: DataFrame,
                  mode: str = "flag") -> DataFrame:
    """Benchmark decontamination: docs whose text CONTAINS any eval
    needle (exact substring, the n-gram-overlap baseline every
    training-data pipeline runs against its eval sets) are flagged
    (mode='flag': doc_id + contaminated) or dropped (mode='drop':
    the clean docs). The needle set is broadcast — eval suites are
    tiny next to a corpus — so the scan stays shuffle-free."""
    if mode not in ("flag", "drop"):
        raise ValueError("mode must be flag|drop")
    needles = F.broadcast(
        evals.select(F.col("needle")).filter(F.length("needle") > 0)
        .distinct()
    )
    if mode == "drop":
        # ONE scan of docs: broadcast left-anti on the contains
        # condition — no doc_id shuffle, and the (often expensive)
        # docs lineage is not referenced twice
        return docs.join(
            needles, F.expr("contains(text, needle)"), "left_anti"
        )
    # flag mode, also one scan: fold the needle set into a single
    # broadcast array row and test membership per doc
    arr = F.broadcast(
        needles.agg(F.collect_list("needle").alias("needles"))
    )
    return docs.crossJoin(arr).select(
        "doc_id",
        F.coalesce(
            F.exists(
                "needles", lambda n: F.contains(F.col("text"), n)
            ),
            F.lit(False),
        ).alias("contaminated"),
    )


def vocab_stats(docs: DataFrame, top_k: int = 1000) -> DataFrame:
    """Corpus vocabulary statistics — the first artifact a tokenizer
    training run needs: per token, total occurrences and document
    frequency, top_k by occurrence count. The tie-break (count desc,
    token asc) makes the top-k cut deterministic and cross-engine
    reproducible; orderBy+limit compiles to TakeOrderedAndProject
    (a per-partition heap + driver merge of k rows), never a global
    sort of the vocabulary."""
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("token")
    )
    agg = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return agg.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(top_k)


def tfidf_top_terms(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """Per-document TF-IDF keywords: for each doc the top_k tokens
    by tf * idf with idf = ln((N + 1) / (doc_freq + 1)) + 1 (the
    smoothed scikit-learn formulation — never divides by zero, and
    corpus-wide terms still score > 0). Returns (doc_id, token, tf,
    doc_freq, tfidf).

    Plan shape at scale: one corpus shuffle for (doc, token) tf, one
    bounded shuffle for doc_freq (distinct tokens), then the top-k
    cut as a row_number window partitioned BY DOCUMENT — thousands
    of small per-doc heaps spread across the cluster, never a global
    sort. N is a scalar crossJoin broadcast, not a collect-per-row.
    The (tfidf desc, token asc) tie-break makes the cut exact
    cross-engine; tf and doc_freq are integers and idf a pure
    function of them, so the doubles are bit-identical in any IEEE
    engine and hash-exact under the gate's 6dp rounding."""
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"))
    # doc_freq from the tf aggregate, not a countDistinct over the
    # raw explode: tf rows are already distinct (doc, token), so a
    # plain count per token IS the document frequency, and the second
    # shuffle moves the compact tf table, not per-occurrence rows.
    # The explode subtree still EXECUTES twice (the two aggregates
    # prune different columns, so their exchanges don't canonicalize
    # equal and ReuseExchange cannot fire); at corpus scale,
    # materialize tf (checkpoint/parquet) between the passes — a
    # token-partitioned WINDOW would be single-pass but puts every
    # occurrence of a stopword token in one task, a skew killer.
    dfreq = tf.groupBy("token").agg(
        F.count("*").alias("doc_freq"))
    n_docs = docs.select(
        F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (
                F.log((F.col("n_docs") + F.lit(1.0)) /
                      (F.col("doc_freq") + F.lit(1.0))) + F.lit(1.0)
            ),
        )
    )
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "token", "tf", "doc_freq", "tfidf")
    )
