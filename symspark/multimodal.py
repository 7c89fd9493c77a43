"""Multimodal column plumbing (training-data pipeline ops).

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct.  The decode step is STUBBED (codec libraries are not in
this container): ``decode_stub=True`` produces deterministic fake features
so the Spark-side plumbing — schema, partitioning, Arrow-batched
``mapInPandas`` signature, batch shape — is real and tested; plugging in a
real decoder only replaces ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha1 string, "
    "feature array<float>, decode_ok boolean, decode_error string"
)

FEATURE_DIM = 8


def _decode_one(payload: bytes, kind: str, decode_stub: bool) -> tuple[list[float], str | None]:
    """Decode + featurize one media payload.

    Real decoders (PIL / torchaudio / pyav) are not installed in this
    environment; the stub derives a deterministic pseudo-feature from the
    payload digest so downstream plumbing is exercised end-to-end.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/torchaudio/pyav — not available here"
        )
    if payload is None:
        return None, "empty payload"
    digest = hashlib.sha256(kind.encode() + payload).digest()
    feats = [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)]
    return feats, None


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    mapInPandas keeps whole Arrow batches in Python (no per-row serde); the
    binary column arrives as a pandas ``bytes`` series.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha1": pdf["payload"].map(
                    lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
                ),
            }
            feats, oks, errs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                f, err = _decode_one(payload, kind, decode_stub)
                feats.append(f)
                oks.append(err is None)
                errs.append(err)
            out["feature"] = feats
            out["decode_ok"] = oks
            out["decode_error"] = errs
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def gen_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (fake payloads)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (1 + i % 5)
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "duration_ms": 1000 * (i + 1) if kind != "image" else None,
        }
        rows.append((i, kind, f"x/{kind}", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
