"""Training-data pipeline operators over ``documents`` and
``embeddings`` (BASELINE.json north-star: dedup, similarity search,
text analysis).

Determinism notes:
- fingerprints use md5 (identical bytes→hex in Spark and DuckDB);
- Jaccard / ratios are integer divisions rendered identically;
- cosine similarities fold float→double products left-to-right in both
  engines and are rounded to 6 dp before ranking, with an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.plans import register, table

STOPWORDS = ("the", "a")


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _shingles(col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles as strings (empty when < k tokens)."""
    toks = _tokens(col)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


_SQL_SHINGLES = """
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         UNNEST(range(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 3
"""


@register(
    "t_token_stats",
    sql="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           n_chars,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> x IN ('the', 'a'))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
    """,
    doc="Text analysis: token counting + stopword-ratio quality score "
        "(north-star text ops).",
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens()
    stop = F.filter(toks, lambda x: x.isin(*STOPWORDS))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        "n_chars",
        (F.size(stop).cast("double") / F.size(toks)).alias("stopword_ratio"),
    )


@register(
    "t_lang_distribution",
    sql="""
    SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
    doc="Language/source distribution (language-ID bookkeeping; the "
        "heuristic classifier lives in functions.text and is golden-tested).",
)
def t_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "t_fingerprint",
    sql="SELECT doc_id, md5(text) AS fingerprint FROM documents",
    doc="Document fingerprinting via md5 (north-star text ops; md5 is "
        "byte-identical across engines).",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("fingerprint")
    )


@register(
    "dedup_exact",
    sql="""
    SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    bench=True,
    doc="Exact dedup: hash-groupBy on content fingerprint, keep min id "
        "(north-star dedup).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("fingerprint"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
    """,
    bench=True,
    doc="Near-dup detection: 3-gram shingle sets, pairwise Jaccard >= 0.6 "
        "via shingle-key equi-join (north-star dedup). At scale the join "
        "key is the shingle hash → shuffle is bounded by posting-list "
        "sizes, the classic candidate-pair generation.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(_shingles()).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.6)
    )


_N_MINHASH = 4


def _sql_minhash_sig() -> str:
    mins = ", ".join(
        f"MIN(md5(CAST({i} AS VARCHAR) || '#' || s)) AS h{i}"
        for i in range(_N_MINHASH)
    )
    return f"SELECT doc_id, {mins} FROM sh GROUP BY doc_id"


@register(
    "dedup_minhash_buckets",
    sql=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sig AS ({_sql_minhash_sig()})
    SELECT h0 || h1 AS band0, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
    FROM sig GROUP BY 1 HAVING COUNT(*) > 1
    """,
    doc="MinHash+LSH candidate buckets: shingle → k md5-minhashes → band "
        "key → bucket groups with >1 doc (north-star near-dup at scale: "
        "one agg + one group, no pairwise join).",
)
def dedup_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(_shingles()).alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("s")))).alias(f"h{i}")
        for i in range(_N_MINHASH)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return (
        sig.groupBy(F.concat("h0", "h1").alias("band0"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


@register(
    "m_binary_meta",
    sql="""
    SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
           substr(md5(text), 1, 8) AS content_key
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payload + typed metadata "
        "(north-star multimodal; decode UDFs live in operators.multimodal).",
)
def m_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.octet_length(F.col("text")).alias("n_bytes"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("content_key"),
    )


# ------------------------------------------------------------ similarity

def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of float*float products in a double accumulator
    — every partial is exactly representable, so the fold order is the
    only ordering and both engines agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


@register(
    "sim_cosine_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
               WHERE vec_id < 5),
    norms AS (SELECT vec_id, embedding,
                     sqrt({_SQL_DOT.format(a="embedding", b="embedding")}) AS nrm
              FROM embeddings),
    scored AS (
        SELECT q.q_id, n.vec_id,
               ROUND({_SQL_DOT.format(a="n.embedding", b="q.qe")}
                     / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = q.q_id)), 6)
                   AS cos_sim
        FROM norms n CROSS JOIN q WHERE n.vec_id != q.q_id)
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q_id, vec_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored) WHERE rn <= 5
    """,
    bench=True,
    doc="Brute-force cosine top-k ANN baseline: query vectors broadcast "
        "against the corpus, per-query top-k via window (north-star "
        "similarity search). Scale path: LSH bucketing (sim_lsh_buckets).",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "embedding", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )
    q = norms.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        norms.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qe")) / (F.col("nrm") * F.col("qn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("q_id", "vec_id", "cos_sim")
    )


@register(
    "sim_lsh_buckets",
    sql="""
    SELECT CAST(embedding[1] > 0 AS INTEGER) * 4
           + CAST(embedding[2] > 0 AS INTEGER) * 2
           + CAST(embedding[3] > 0 AS INTEGER) AS bucket,
           COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id
    FROM embeddings GROUP BY 1
    """,
    doc="LSH-style sign-bucket partitioning (hyperplanes = first axes; a "
        "seeded random rotation is the production variant): ANN search "
        "only compares within a bucket, turning O(N^2) into O(N^2/2^b) "
        "(north-star similarity scale path).",
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = F.col("embedding")
    bucket = (
        (e.getItem(0) > 0).cast("int") * 4
        + (e.getItem(1) > 0).cast("int") * 2
        + (e.getItem(2) > 0).cast("int")
    )
    return (
        table(spark, sf_dir, "embeddings")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )
