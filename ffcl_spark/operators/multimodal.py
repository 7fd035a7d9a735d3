"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata structs. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` kernels — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested; the
actual codec step is STUBBED (the image/audio libraries are not in
this container): ``decode_stub`` produces deterministic fake features,
and ``decode_real`` raises ``NotImplementedError`` naming the needed
dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_crc", T.LongType()),
    ]
)


def media_binary(docs: DataFrame) -> DataFrame:
    """Materialize media spans as opaque binary payloads. In a real
    deployment ``media_ref`` resolves to object storage; here the
    payload is the ref itself encoded — deterministic and enough to
    exercise the binary-column path end to end."""
    s = F.explode("spans").alias("span")
    return (
        docs.select("doc_id", s)
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            F.encode(F.col("span.media_ref"), "utf-8").alias("media_bytes"),
            F.lit("image/fake").alias("media_kind"),
        )
    )


def decode_real(media_kind: str):
    raise NotImplementedError(
        f"real decode for {media_kind!r} needs an image/audio codec "
        "library (e.g. Pillow / torchaudio) that is not installed; "
        "use decode_stub for the plumbing path"
    )


def extract_features(media: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    The kernel sees pandas batches of (doc_id, offset, media_bytes);
    per batch it vectorizes over the byte payloads. Features here are
    the deterministic stub (length, mean byte, crc32) standing in for
    image resize / frame-sample / spectrogram steps.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            payloads = pdf["media_bytes"]
            n_bytes = payloads.map(len).astype("int32")
            byte_mean = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
            )
            crc = payloads.map(lambda b: zlib.crc32(b)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "byte_crc": crc,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)
