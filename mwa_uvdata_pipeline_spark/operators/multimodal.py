"""Multimodal column operators (north-star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side plumbing is real and tested: binary payload columns,
Arrow-batched ``mapInPandas`` with explicit output schemas, per-batch
vectorized work, frame-row fan-out. The actual media decode is STUBBED —
this container ships no image/audio libraries — ``decode_media(...,
deterministic=False)`` raises ``NotImplementedError`` unless PIL is
importable; the default ``deterministic=True`` path derives metadata
from the payload's md5 so results are reproducible and oracle-checkable.

Scale posture: ``mapInPandas`` streams Arrow batches through each task,
so memory is bounded by batch size (``spark.sql.execution.arrow
.maxRecordsPerBatch``) not partition size; payload bytes never hit the
driver; fan-out (frames) happens inside the executor generator, and a
repartition on the id column ahead of decode spreads CPU-heavy batches
across the cluster independent of input file splits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int"
)

FRAMES_SCHEMA = DECODED_SCHEMA + ", frame_idx int"

FEATURE_DIM = 8

FEATURES_SCHEMA = "doc_id long, features array<float>"


def _make_meta_fn():
    """Returns the deterministic fake decode (width, height, n_frames)
    from a payload md5 hexdigest. Built as a nested function so worker
    closures capture it BY VALUE (cloudpickle) — executors never need
    this package importable, which matters when the driver process runs
    outside the repo directory."""

    def meta_from_digest(hx: str) -> tuple[int, int, int]:
        width = 64 + int(hx[0:4], 16) % 1024
        height = 64 + int(hx[4:8], 16) % 1024
        n_frames = 1 + int(hx[8:12], 16) % 16
        return width, height, n_frames

    return meta_from_digest


_meta_from_digest = _make_meta_fn()  # driver-side alias (tests, docs)


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    deterministic: bool = True,
) -> DataFrame:
    """Binary payload → typed metadata rows via Arrow-batched
    ``mapInPandas`` (one output row per input row)."""

    meta_fn = _make_meta_fn()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic:
                try:
                    from PIL import Image  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "media decode requires PIL/ffmpeg; install them "
                        "or use deterministic=True"
                    ) from exc
                raise NotImplementedError("wire PIL decode here")
            meta = [
                meta_fn(hashlib.md5(bytes(b)).hexdigest())
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(bytes(b)) for b in pdf[payload_col]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 2,
) -> DataFrame:
    """Decode + frame sampling: emit every ``every``-th frame index as
    its own row. The fan-out happens inside the executor generator —
    output batch size is decoupled from input batch size."""

    meta_fn = _make_meta_fn()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                k: [] for k in
                ("doc_id", "n_bytes", "width", "height", "n_frames", "frame_idx")
            }
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(b)
                w, h, nf = meta_fn(hashlib.md5(data).hexdigest())
                for fi in range(0, nf, every):
                    out["doc_id"].append(doc_id)
                    out["n_bytes"].append(len(data))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(nf)
                    out["frame_idx"].append(fi)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "scale_num int, scale_den int"
)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: int = 256,
) -> DataFrame:
    """Resize planning: compute the aspect-preserving output geometry
    that fits each decoded image inside ``target`` x ``target``. The
    pixel resample itself would run here (PIL/ffmpeg — not in this
    container, same stub seam as decode_media); the geometry math is
    real and exact-integer (floor scaling with a rational scale
    factor), so the operator is oracle-checkable end-to-end. Arrow
    batch in, Arrow batch out; one row per input, no fan-out."""

    meta_fn = _make_meta_fn()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "width", "height", "out_width", "out_height",
                    "scale_num", "scale_den",
                )
            }
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ = meta_fn(hashlib.md5(bytes(b)).hexdigest())
                den = max(w, h)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(w * target // den)
                out["out_height"].append(h * target // den)
                out["scale_num"].append(target)
                out["scale_den"].append(den)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Payload → fixed-dim float feature vector (deterministic stub:
    md5 bytes scaled to [0, 1); the real path would run a vision/audio
    encoder over the decoded media). Output is ``array<float>`` ready
    for the similarity operators (sim_cosine_topk / sim_ivf_topk)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [d / 255.0 for d in hashlib.md5(bytes(b)).digest()[:FEATURE_DIM]]
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURES_SCHEMA)


def binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: treat a text column as an opaque binary payload (the
    fixture stand-in for real media bytes)."""
    return docs.withColumn("payload", F.col(text_col).cast("binary"))
