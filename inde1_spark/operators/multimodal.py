"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``.
The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector — the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and tested either way.

At 100 TB: binary payloads dominate I/O — keep them in their own parquet
column (column pruning skips them unless needed), size
``spark.sql.files.maxPartitionBytes`` so a task's batch of payloads fits in
executor memory, and do decode/feature-extract in ``mapInPandas`` so one
Python worker handles an Arrow batch at a time, never one row at a time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd  # noqa: F401

FEATURE_DIM = 4

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, feature array<double>"
)


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text stand
    in for an encoded image/audio blob) plus typed metadata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def binary_meta(documents: DataFrame) -> DataFrame:
    """Metadata extraction over the binary column — pure built-ins.

    Byte length, content hash and a magic-prefix probe, all JVM-side; the
    payload column itself is pruned from the output so downstream stages
    don't drag blobs through shuffles.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("magic_hex"),
    )


def decode_stub(payload: bytes, fake: bool) -> list[float]:
    """Decode an encoded media payload into a feature vector.

    STUB: real decoding needs image/audio libraries not present in this
    container. ``fake=True`` yields a deterministic placeholder derived from
    payload bytes so the distributed plumbing can be exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not available here; "
            "run with fake=True to exercise the pipeline"
        )
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[n // 2]),
        float(sum(payload[:16]) % 256),
    ]


def extract_features(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one Python worker per partition consumes Arrow record
    batches — the per-row boundary cost of classic UDFs disappears, and
    memory is bounded by the Arrow batch size regardless of corpus size.
    """
    src = with_binary_payload(documents)
    dim = FEATURE_DIM

    # self-contained closure: no references to this package, so cloudpickle
    # ships it by value and executor workers need no inde1_spark on their
    # PYTHONPATH (a host session may drive the engine from any cwd)
    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415 — worker-side import

        def decode(payload: bytes) -> list[float]:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not available here"
                )
            if not payload:
                return [0.0] * dim
            n = len(payload)
            return [
                float(n),
                float(payload[0]),
                float(payload[n // 2]),
                float(sum(payload[:16]) % 256),
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [decode(bytes(p)) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(_extract, schema=FEATURE_SCHEMA)


# sized so testdata documents (~150-1500 bytes) produce multiple frames —
# the 1->N expansion is the thing under test
FRAME_BYTES = 100


def sample_frames(documents: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: one row per fixed-size chunk of the payload (the
    video-frame / audio-window expansion pattern, 1 -> N rows).

    ``mapInPandas`` yields multiple output rows per input row — the shape a
    real frame sampler has (decode + sample happens where the stub is).
    Deterministic fake 'frames' = byte slices + md5, so the expansion
    plumbing is oracle-checkable end-to-end. At scale the expansion factor
    multiplies rows, not bytes read (payload column is read once per task).
    """
    src = with_binary_payload(documents)
    fb = frame_bytes

    def _frames(batches):
        import hashlib

        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = max(1, (len(data) + fb - 1) // fb)
                for i in range(n):
                    chunk = data[i * fb : (i + 1) * fb]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_bytes": len(chunk),
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(
        _frames,
        schema="doc_id long, frame_idx int, frame_bytes long, frame_md5 string",
    ).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_bytes",
        "frame_md5",
    )


def feature_columns(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Oracle-checkable projection of the mapInPandas feature path.

    Flattens the deterministic fake feature vector to scalar columns so the
    Arrow/pandas plumbing itself is validated against plain SQL — the
    decode stub is engine-reproducible by construction (byte arithmetic).
    """
    feats = extract_features(documents, fake=fake)
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("feature").getItem(i).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )
