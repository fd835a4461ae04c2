"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the
pattern a 100 TB media pipeline needs (decode/resize/frame-sample
per batch, never per row, never on the driver).

The actual media decoders (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is stubbed: ``decode_media`` raises
NotImplementedError by default, and ``FAKE_DECODER`` provides a
deterministic byte-level feature extractor so the Spark-side
plumbing — schema, batch iteration, binary handling, output shape —
is real and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: payload + typed metadata (the binary
#: parameter channel of the reference contract, parameterType.ts:16 /
#: data.ts:29-32, generalized with media metadata).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with metadata.

    Stand-in for landed media blobs: at scale the payload column
    comes from ``spark.read.format("binaryFile")`` or a lakehouse
    table with blob columns — identical schema, same operators.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> object:
    """Decode a media payload into a frame/tensor. STUB.

    Real implementation requires PIL / av / soundfile, which are not
    installed in this environment.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this container; supply a decoder to extract_features()"
    )


def FAKE_DECODER(payload: bytes, mime: str) -> dict:
    """Deterministic byte-level 'decoder' for plumbing tests."""
    import hashlib

    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        "payload_md5": hashlib.md5(payload).hexdigest(),
    }


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable[[bytes, str], dict]] = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the decode loop per-partition and
    per-Arrow-batch (vectorized transfer, no per-row Python round
    trips). The decoder runs on executors only.
    """
    decode = decoder or FAKE_DECODER

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(payload if payload is not None else b"", meta["mime"])
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame-sampling plumbing: one input blob -> N frame rows.

    The video pattern: decode would yield frames; here the stub
    chunks the payload into fixed ``frame_bytes`` windows and keeps
    every ``stride``-th one (deterministic, oracle-checkable). The
    Spark shape is the real thing — ``mapInPandas`` emitting MORE
    rows than it consumes, per Arrow batch, which is exactly how
    frame extraction fans out without ever collecting a video to the
    driver.
    """
    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload if payload is not None else b""
                n = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, stride):
                    chunk = data[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_bytes": len(chunk),
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_md5"]
            )

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


def frame_sample_sql(frame_bytes: int = 64, stride: int = 2) -> str:
    return f"""
WITH chunks AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(octet_length(encode(text)) /
                                   {frame_bytes}.0) AS BIGINT))) AS frame_idx
  FROM documents
)
SELECT c.doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(octet_length(encode(substr(d.text, CAST(frame_idx * {frame_bytes} + 1 AS BIGINT),
                    {frame_bytes}))) AS BIGINT) AS frame_bytes,
       md5(substr(d.text, CAST(frame_idx * {frame_bytes} + 1 AS BIGINT),
                  {frame_bytes})) AS frame_md5
FROM chunks c JOIN documents d USING (doc_id)
WHERE frame_idx % {stride} = 0
"""


MEDIA_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) END
            AS INTEGER) AS first_byte,
       md5(text) AS payload_md5
FROM documents
"""
