"""Multimodal column plumbing: opaque binary content + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw media as a
``binary`` column beside a typed metadata struct, keep ALL filtering /
routing / dedup on the metadata (Catalyst, pushdown-able), and cross
the Python boundary only for per-item decode/feature-extraction —
as Arrow-batched ``mapInPandas``, never row-at-a-time.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
behind an import-try, and ``extract_features`` computes deterministic
byte-level features instead, so the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signature — is fully real and
differentially tested (byte features have a SQL oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.operators import params

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

FEATURE_SCHEMA = (
    "doc_id BIGINT, byte_len BIGINT, content_md5 STRING, first_byte INT, n_frames BIGINT"
)


def to_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, content: binary, meta: struct).

    Stands in for an image/audio table: text bytes play the raw media
    blob; the metadata struct is what real pipelines filter on."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub
    """STUB: real deployment decodes with PIL/torchvision; this
    container has neither, and fabricating pixels would hide that."""
    if not HAS_PIL:
        raise NotImplementedError("image decode requires PIL; not available in this container")
    raise NotImplementedError("wire to PIL.Image.open when media libs are present")


def decode_audio(content: bytes):  # pragma: no cover - stub
    raise NotImplementedError("audio decode requires soundfile/librosa; not in this container")


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level features per Arrow batch.

    Stands in for decode+embed; md5 via hashlib matches the SQL
    oracle's md5(text) because content IS the UTF-8 encoding."""
    import hashlib

    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": content.map(len).astype("int64"),
                "content_md5": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "first_byte": content.map(lambda b: b[0] if len(b) else None).astype("int32"),
                "n_frames": content.map(lambda b: len(b) // params.FRAME_BYTES + 1).astype("int64"),
            }
        )


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` streams ~10k-row Arrow batches through Python —
    the only sanctioned Python hot path in the engine. Partitioning is
    preserved (no shuffle); at scale this is a map-only stage whose
    cost is decode CPU, which is exactly where it belongs."""
    return mm.select("doc_id", "content").mapInPandas(_featurize_batches, FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame) -> DataFrame:
    """documents -> binary table -> per-item features (the full path)."""
    return extract_features(to_multimodal(docs))


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_len BIGINT, frame_md5 STRING"
FRAME_STRIDE = 2  # sample every other frame


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Explode each blob into strided fixed-size frames (video
    frame-sampling shape: 1 row in, k rows out, deterministic)."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(content)
            n_frames = len(b) // params.FRAME_BYTES + 1
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = b[idx * params.FRAME_BYTES : (idx + 1) * params.FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_len"].append(len(frame))
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


def frame_sample(mm: DataFrame) -> DataFrame:
    """Strided frame sampling over the binary column via mapInPandas —
    the row-exploding UDF shape (decode would replace the byte slicing;
    everything else, including the 1->k fan-out through Arrow, is the
    real production plumbing)."""
    return mm.select("doc_id", "content").mapInPandas(_frame_sample_batches, FRAME_SCHEMA)


def frame_sample_from_docs(docs: DataFrame) -> DataFrame:
    return frame_sample(to_multimodal(docs))
