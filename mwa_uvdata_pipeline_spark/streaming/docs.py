"""Streaming INCREMENTAL near-duplicate detection over a document
stream — the streaming complement of the batch `dedup_incremental`
(exact-hash) entry, upgraded to NEAR-dup via MinHash+LSH bands.

An ingestion pipeline sees documents arrive continuously; re-running
the batch band join per arrival is O(corpus) each time. Here the
corpus state lives in the streaming state store, sharded by band
bucket, and each arriving document costs exactly its own bucket
lookups:

- the 4-lane one-permutation MinHash signature (the
  dedup_minhash_buckets construction: ONE md5 per shingle, split into
  8-hex-char lanes, min per lane) is computed PER ROW with array
  expressions (transform + array_min) — no aggregation, so the
  stateful band operator is the query's only stateful operator;
- documents explode into 2 LSH bands (h0||h1, h2||h3) and group by
  (band, key); per bucket the state is the FIRST `cap` member doc ids
  (arrival order = doc_id order under the ordered replay), the same
  bounded-posting discipline as the batch DF cap: a hot bucket
  (corpus boilerplate) emits at most `cap` candidate pairs per new
  arrival and stores nothing beyond the cap — state per bucket is
  O(cap) longs FOREVER, the property that makes the operator safe
  against unbounded buckets at stream scale;
- each arrival emits (earlier_id, new_id) candidate pairs against its
  bucket's stored members, folded batch-wide in doc_id order (one
  sort per key per micro-batch — Arrow chunks carry no order).

The emitted pair set is DETERMINISTIC given the ordered replay and
equals the batch formulation "a < b share a band key and a is among
the first `cap` bucket members by doc_id" — which is what lets
`stream_minhash_exec` gate the stream against a DuckDB oracle
hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_N_LANES = 4
DEFAULT_BUCKET_CAP = 8


def replay_docs(docs: DataFrame, out_dir: str, n_files: int = 4) -> list[str]:
    """Split a documents frame into ``n_files`` sequential parquet
    files by doc_id order (the arrival order of an append-only corpus
    feed). Strictly increasing mtimes so the file source replays
    slices in order (the replay_events discipline)."""
    from mwa_uvdata_pipeline_spark.streaming.events import _set_tree_mtime
    import time

    qs = [str((i + 1) / n_files) for i in range(n_files - 1)]
    bounds = docs.selectExpr(
        f"percentile_approx(doc_id, array({','.join(qs)}), 100000) AS b"
    ).first()["b"]
    lo = None
    paths = []
    base = time.time()
    for i in range(n_files):
        hi = bounds[i] if i < n_files - 1 else None
        sl = docs
        if lo is not None:
            sl = sl.where(F.col("doc_id") > F.lit(lo))
        if hi is not None:
            sl = sl.where(F.col("doc_id") <= F.lit(hi))
        path = f"{out_dir}/part{i:03d}"
        sl.coalesce(1).write.mode("overwrite").parquet(path)
        _set_tree_mtime(path, base + i)
        paths.append(path)
        lo = hi
    return paths


def _band_rows(docs: DataFrame) -> DataFrame:
    """Per-document band keys, all row-local expressions: shingle
    array → md5 lanes → array_min per lane → 2 band keys. Documents
    with no shingle (< 3 tokens) drop out, matching the batch
    formulation where they contribute no sh rows."""
    from mwa_uvdata_pipeline_spark.plans.text import _shingles

    lanes = [
        F.array_min(
            F.transform(
                F.col("_sh"),
                lambda s: F.substring(F.md5(s), 8 * i + 1, 8),
            )
        ).alias(f"h{i}")
        for i in range(_N_LANES)
    ]
    sig = (
        docs.withColumn("_sh", _shingles())
        .where(F.size("_sh") > 0)
        .select("doc_id", *lanes)
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.concat("h0", "h1").alias("key"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.concat("h2", "h3").alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def stream_minhash_pairs(
    spark: SparkSession,
    src_glob: str,
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Stateful incremental LSH candidate pairing (see module doc).

    Update mode; state per (band, key) bucket is one long array of at
    most ``cap`` doc ids. Emits one row per (band, earlier, new)
    candidate hit — the exec entry dedups pairs that hit both bands.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    bands = _band_rows(src)

    def update(key, pdfs, state: GroupState):
        stored = list(state.get[0]) if state.exists else []
        # batch-wide sort: one key's micro-batch may span Arrow chunks
        chunks = [p for p in pdfs if len(p)]
        out_a: list[int] = []
        out_b: list[int] = []
        if chunks:
            pdf = pd.concat(chunks).sort_values("doc_id")
            for d in pdf["doc_id"]:
                d = int(d)
                for a in stored:
                    out_a.append(a)
                    out_b.append(d)
                if len(stored) < cap:
                    stored.append(d)
        state.update((stored,))
        yield pd.DataFrame(
            {
                "band": [key[0]] * len(out_a),
                "key": [key[1]] * len(out_a),
                "doc_a": out_a,
                "doc_b": out_b,
            }
        )

    return bands.groupBy("band", "key").applyInPandasWithState(
        update,
        outputStructType="band int, key string, doc_a long, doc_b long",
        stateStructType="ids array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
