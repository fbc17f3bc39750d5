"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode step itself is STUBBED (image/audio codecs are not in this
container): ``decode_image_stub`` derives deterministic fake metadata
from the bytes, and ``decode_image_real`` raises NotImplementedError with
the intended signature. Everything AROUND the decode — schema, binary
payload handling, Arrow batch iteration, partition-parallel UDF shape —
is real and tested. Swapping in PIL/ffmpeg later changes one function.

At 100 TB: binary payloads ride the same parquet scans as everything
else (no side-channel object fetches in the hot path); decode runs
inside mapInPandas per Arrow batch, so Python overhead amortizes over
thousands of rows, and the operator parallelizes per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, "
    "format string, width int, height int, channels int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (utf-8 bytes standing in for an
    image/audio blob) + typed metadata, as a multimodal table would
    carry: (payload binary, n_bytes, content_hash)."""
    return df.withColumns(
        {
            "payload": F.encode(F.col(text_col), "UTF-8"),
            "n_bytes": F.length(F.encode(F.col(text_col), "UTF-8")).cast("long"),
            "content_hash": F.md5(F.col(text_col)),
        }
    )


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """The real decoder slot (PIL / libvips / ffmpeg frame-grab).

    Not available in this environment — the container ships no image
    codecs. Swap this in and ``decode_batch`` below needs no changes.
    """
    raise NotImplementedError(
        "image codecs not available in this container; use decode_image_stub"
    )


def decode_image_stub(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake decode: (format, width, height, channels)
    derived from the byte content so tests are stable and the full
    Spark-side plumbing (schema, batching, partitioning) is exercised."""
    n = len(payload)
    fmt = "png" if n % 2 == 0 else "jpeg"
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3 if n % 3 else 4
    return fmt, width, height, channels


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary payload → typed image metadata.

    Arrow batches stream through ``it``; each pandas DataFrame holds
    thousands of rows, so the per-row Python cost is amortized and the
    stage scales with partition count."""

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: self-contained closure (duplicates decode_image_stub) so
        # cloudpickle ships it BY VALUE — executors must not need this
        # package importable on their own sys.path.
        def _stub(payload: bytes) -> tuple[str, int, int, int]:
            n = len(payload)
            return (
                "png" if n % 2 == 0 else "jpeg",
                16 + (n % 64),
                16 + ((n // 64) % 64),
                3 if n % 3 else 4,
            )

        for pdf in it:
            decoded = pdf["payload"].map(_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "format": decoded.map(lambda d: d[0]),
                    "width": decoded.map(lambda d: d[1]),
                    "height": decoded.map(lambda d: d[2]),
                    "channels": decoded.map(lambda d: d[3]),
                }
            )

    return df.select("doc_id", "payload", "n_bytes", "content_hash").mapInPandas(
        decode_batch, schema=DECODED_SCHEMA
    )


def frame_sample(df: DataFrame, every_nth: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling shape for video-like payloads: keep every Nth row
    per stream — a pure filter (id % N), no decode needed to subsample."""
    return df.filter((F.col(id_col) % every_nth) == 0)


RESIZED_SCHEMA = (
    "doc_id long, content_hash string, payload binary, width int, height int"
)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """mapInPandas resize stage: (payload, metadata) → resized payload +
    new dimensions — the binary-in/binary-out Arrow round-trip a real
    resizer needs (PIL's ``resize`` slots into ``_stub``). The stub
    emits a deterministic tagged payload derived from the input hash,
    so the downstream contract (binary column survives the Python hop,
    new dims recorded) is value-testable without codecs."""

    def resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: shipped by value (see decode_batch)
        import hashlib

        def _stub(payload: bytes) -> bytes:
            tag = hashlib.md5(payload).hexdigest()
            return f"resized:{target_w}x{target_h}:{tag}".encode()

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_hash": pdf["content_hash"],
                    "payload": pdf["payload"].map(_stub),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select("doc_id", "content_hash", "payload").mapInPandas(
        resize_batch, schema=RESIZED_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """mapInPandas feature-extraction stage: payload → ``array<float>``
    embedding — the bridge from the multimodal surface to the
    similarity family (its output feeds ``lsh_ann_pairs`` /
    ``ivf_ann_pairs`` / ``brute_force_topk`` unchanged, tested). A real
    model (CLIP/ResNet forward pass per Arrow batch) slots into
    ``_stub``; the stub derives a deterministic unit-scale vector from
    the md5 stream of the bytes, so schema, batch shape and the
    downstream ANN contract are all exercised for real."""

    def feature_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: shipped by value (see decode_batch)
        import hashlib

        def _stub(payload: bytes) -> list[float]:
            vals: list[float] = []
            counter = 0
            while len(vals) < dim:
                h = hashlib.md5(payload + counter.to_bytes(4, "big")).digest()
                vals.extend(b / 255.0 for b in h)
                counter += 1
            return vals[:dim]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "vec_id": pdf["doc_id"],
                    "embedding": pdf["payload"].map(_stub),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        feature_batch, schema="vec_id long, embedding array<float>"
    )
