"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

``decode_image_real`` REALLY decodes the codec-free formats (binary
PPM/PGM, uncompressed BMP — pure-Python header+raster parse, r5) and
raises NotImplementedError for compressed formats (image/audio codec
libraries are not in this container); ``decode_image_stub`` derives
deterministic fake metadata from the bytes so the full pipeline stays
value-checkable against a SQL oracle. Everything AROUND the decode —
schema, binary payload handling, Arrow batch iteration,
partition-parallel UDF shape — is identical for both
(``decode_images(df, decoder="real")``). Swapping in PIL/ffmpeg later
extends one function.

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


def _make_real_decoder():
    """Factory for the real decoder: the returned function is a LOCAL
    (non-importable) closure, so cloudpickle ships it BY VALUE into
    Arrow workers — same convention as the inline stub closures below
    (executors must not need this package importable), without
    duplicating the 50-line parser in two places."""

    def decode_image_real(payload: bytes) -> tuple[str, int, int, int]:
        """REAL decode for the uncompressed formats a pure-Python parser
        can handle without codec libraries: binary Netpbm (``P6`` PPM →
        3 channels, ``P5`` PGM → 1) and uncompressed BI_RGB BMP. Returns
        ``(format, width, height, channels)`` after validating the pixel
        payload is actually present (a truncated raster raises
        ValueError — corrupt data must fail loudly, not decode
        plausibly).

        Compressed formats (PNG/JPEG/...) still raise
        NotImplementedError: this container ships no codecs, and a
        header-only sniff of a compressed stream would claim a decode it
        cannot do. Swapping in PIL/libvips extends THIS function;
        ``decode_images`` and the Arrow plumbing need no changes."""
        if payload[:2] in (b"P6", b"P5"):
            # Netpbm header: magic, then 3 ASCII ints (width height maxval)
            # separated by whitespace, '#'-to-EOL comments allowed anywhere
            # between tokens; exactly ONE whitespace byte after maxval, then
            # the raster.
            toks: list[int] = []
            i = 2
            while len(toks) < 3:
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                if payload[i : i + 1] == b"#":
                    while i < len(payload) and payload[i] != 0x0A:
                        i += 1
                    continue
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                if i == j:
                    raise ValueError("truncated netpbm header")
                toks.append(int(payload[i:j]))
                i = j
            width, height, maxval = toks
            i += 1  # the single whitespace byte before the raster
            channels = 3 if payload[:2] == b"P6" else 1
            bytes_per_sample = 2 if maxval > 255 else 1
            need = i + width * height * channels * bytes_per_sample
            if width <= 0 or height <= 0 or len(payload) < need:
                raise ValueError(
                    f"netpbm raster truncated: need {need} bytes, have {len(payload)}"
                )
            return ("ppm" if channels == 3 else "pgm", width, height, channels)
        if payload[:2] == b"BM":
            import struct

            if len(payload) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
                raise ValueError("BMP header truncated")
            dib_size = struct.unpack_from("<I", payload, 14)[0]
            if dib_size < 40:
                raise NotImplementedError(f"BMP DIB header size {dib_size} (core/OS2)")
            width = struct.unpack_from("<i", payload, 18)[0]
            height = abs(struct.unpack_from("<i", payload, 22)[0])  # <0 = top-down
            bpp = struct.unpack_from("<H", payload, 28)[0]
            compression = struct.unpack_from("<I", payload, 30)[0]
            if compression != 0:
                raise NotImplementedError(f"compressed BMP (method {compression})")
            if bpp not in (8, 24, 32):
                raise NotImplementedError(f"{bpp}-bpp BMP (palette/bitfield)")
            channels = bpp // 8
            row_bytes = (width * channels + 3) // 4 * 4  # rows pad to 4 bytes
            offset = struct.unpack_from("<I", payload, 10)[0]
            if width <= 0 or height <= 0 or len(payload) < offset + row_bytes * height:
                raise ValueError("BMP raster truncated")
            return ("bmp", width, height, channels)
        raise NotImplementedError(
            "only uncompressed PPM/PGM/BMP decode without codec libraries; "
            "compressed formats need PIL/libvips (not in this container)"
        )

    return decode_image_real


decode_image_real = _make_real_decoder()


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


def decode_images(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """mapInPandas decode stage: binary payload → typed image metadata.

    ``decoder="stub"`` (default) keeps the deterministic fake — the
    oracle-checkable path; ``decoder="real"`` parses actual PPM/PGM/BMP
    bytes (``decode_image_real``) and FAILS the task on anything else,
    the right behavior for a decode stage fed supposedly-valid payloads
    (route unknown formats around it with a format-sniff filter first).

    Arrow batches stream through ``it``; each pandas DataFrame holds
    thousands of rows, so the per-row Python cost is amortized and the
    stage scales with partition count."""
    if decoder not in ("stub", "real"):
        raise ValueError(f"decoder must be 'stub' or 'real', got {decoder!r}")
    # both decode fns are shipped BY VALUE (the stub duplicated inline,
    # the real one a factory-local closure) — executors must not need
    # this package importable on their own sys.path
    _decode = _make_real_decoder() if decoder == "real" else None

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _stub(payload: bytes) -> tuple[str, int, int, int]:
            n = len(payload)
            return (
                "png" if n % 2 == 0 else "jpeg",
                16 + (n % 64),
                16 + ((n // 64) % 64),
                3 if n % 3 else 4,
            )

        fn = _decode if _decode is not None else _stub
        for pdf in it:
            decoded = pdf["payload"].map(fn)
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
