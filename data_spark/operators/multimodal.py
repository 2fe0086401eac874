"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched mapInPandas.

The real decoders (PIL/ffmpeg/torchaudio) are not in this container, so
the decode step is STUBBED: ``decode_mode='strict'`` raises
NotImplementedError (the production hook point), ``'fake'`` produces a
deterministic payload-derived stand-in so the Spark-side plumbing —
schema, batch iteration, partitioning, feature join-back — is real and
tested end-to-end.

Scale notes: payloads never pass through Python row-at-a-time — they
arrive in Arrow record batches; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory (set it low for multi-MB
payload columns). Feature extraction repartitions first so a few huge
files can't serialize the job (binary payload skew).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

#: canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("source", StringType()),
                    StructField("nbytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("nbytes", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def wrap_binary(df: DataFrame, payload_col: str, id_col: str, source_col: str, mime: str) -> DataFrame:
    """Normalize any binary column into the canonical MEDIA_SCHEMA shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col(source_col).alias("source"),
            F.octet_length(F.col(payload_col)).cast("long").alias("nbytes"),
        ).alias("meta"),
    )


def _decode(payload: bytes, mode: str) -> bytes:
    if mode == "strict":
        raise NotImplementedError(
            "media decode requires an image/audio codec library not present "
            "in this environment; plug the real decoder in here"
        )
    # 'fake': deterministic payload-derived pseudo-decode
    return hashlib.sha256(payload).digest()


def extract_features(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """payload → (nbytes, sha256, FEATURE_DIM float features) via
    mapInPandas. With the stub decoder, features are a deterministic
    function of content bytes — stable across runs/partitionings."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [None if p is None else _decode(bytes(p), decode_mode) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "nbytes": [0 if p is None else len(bytes(p)) for p in payloads],
                    "sha256": [
                        None if p is None else hashlib.sha256(bytes(p)).hexdigest()
                        for p in payloads
                    ],
                    "features": [
                        None
                        if d is None
                        else [b / 255.0 for b in d[:FEATURE_DIM]]
                        for d in decoded
                    ],
                }
            )

    return df.repartition(parallelism).mapInPandas(batches, _FEATURE_SCHEMA)
