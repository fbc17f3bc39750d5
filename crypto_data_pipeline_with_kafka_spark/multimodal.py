"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

``decode_image_real`` / ``decode_audio_real`` / ``parse_video_real``
REALLY decode the codec-free formats of each modality (binary PPM/PGM +
uncompressed BMP images; RIFF/WAVE PCM audio; YUV4MPEG2 video with
genuine in-payload frame sampling via ``sample_video_frames``) — all
pure-Python header+raster parses — and raise NotImplementedError for
compressed formats (codec libraries are not in this container);
``decode_image_stub`` derives
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
from pyspark.sql import DataFrame, Window
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


def _make_raster_parser():
    """Factory for the SHARED header/raster parser both the metadata
    decoder and the perceptual hasher embed (by value, like every
    multimodal closure — executors must not need this package
    importable). One parse, two consumers: format fixes land once.

    Returns ``parse_raster(payload) -> (fmt, w, h, channels,
    data_offset, row_stride, top_down, bytes_per_sample)`` — enough to
    address any pixel without re-sniffing — validating the pixel
    payload is actually present (truncated rasters raise ValueError;
    unsupported encodings raise NotImplementedError, never a plausible
    misparse)."""

    def parse_raster(payload: bytes):
        if payload[:2] in (b"P6", b"P5"):
            # Netpbm header: magic, then 3 ASCII ints (width height
            # maxval) separated by whitespace, '#'-to-EOL comments
            # allowed anywhere between tokens; exactly ONE whitespace
            # byte after maxval, then the raster.
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
            stride = width * channels * bytes_per_sample
            if width <= 0 or height <= 0 or len(payload) < i + stride * height:
                raise ValueError(
                    f"netpbm raster truncated: need {i + stride * height} "
                    f"bytes, have {len(payload)}"
                )
            # netpbm stores rows top-down
            fmt = "ppm" if channels == 3 else "pgm"
            return (fmt, width, height, channels, i, stride, True, bytes_per_sample)
        if payload[:2] == b"BM":
            import struct

            if len(payload) < 54:  # 14-byte file header + BITMAPINFOHEADER
                raise ValueError("BMP header truncated")
            dib_size = struct.unpack_from("<I", payload, 14)[0]
            if dib_size < 40:
                raise NotImplementedError(f"BMP DIB header size {dib_size} (core/OS2)")
            width = struct.unpack_from("<i", payload, 18)[0]
            raw_h = struct.unpack_from("<i", payload, 22)[0]
            height = abs(raw_h)  # raw_h < 0 = top-down row order
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
            return ("bmp", width, height, channels, offset, row_bytes, raw_h < 0, 1)
        raise NotImplementedError(
            "only uncompressed PPM/PGM/BMP decode without codec libraries; "
            "compressed formats need PIL/libvips (not in this container)"
        )

    return parse_raster


def _make_real_decoder():
    """Factory for the real decoder: the returned function is a LOCAL
    (non-importable) closure, so cloudpickle ships it BY VALUE into
    Arrow workers — same convention as the inline stub closures below
    (executors must not need this package importable), without
    duplicating the 50-line parser in two places."""

    parse_raster = _make_raster_parser()

    def decode_image_real(payload: bytes) -> tuple[str, int, int, int]:
        """REAL decode for the uncompressed formats a pure-Python parser
        can handle without codec libraries: binary Netpbm (``P6`` PPM →
        3 channels, ``P5`` PGM → 1) and uncompressed BI_RGB BMP. Returns
        ``(format, width, height, channels)`` after validating the pixel
        payload is actually present (a truncated raster raises
        ValueError — corrupt data must fail loudly, not decode
        plausibly). Header/raster parsing is the SHARED
        ``_make_raster_parser`` closure (one parse, two consumers — the
        perceptual hasher reads the same fields).

        Compressed formats (PNG/JPEG/...) still raise
        NotImplementedError: this container ships no codecs, and a
        header-only sniff of a compressed stream would claim a decode it
        cannot do. Swapping in PIL/libvips extends the shared parser;
        ``decode_images`` and the Arrow plumbing need no changes."""
        fmt, width, height, channels = parse_raster(payload)[:4]
        return (fmt, width, height, channels)

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
    per stream — a pure filter (id % N), no decode needed to subsample.
    For REAL in-payload frame extraction from uncompressed video see
    :func:`sample_video_frames`."""
    return df.filter((F.col(id_col) % every_nth) == 0)


AUDIO_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, format string, "
    "sample_rate int, channels int, bit_depth int, n_samples long, "
    "duration_sec double"
)


def _make_audio_decoder():
    """Factory: returns the real audio decoder as a local closure shipped
    by value into Arrow workers (same convention as the image decoder)."""

    def decode_audio_real(
        payload: bytes,
    ) -> tuple[str, int, int, int, int, float]:
        """REAL audio decode for the codec-free format: RIFF/WAVE with
        PCM (format tag 1) or IEEE-float (tag 3) samples — a pure-Python
        chunk walk (fmt + data, even-byte chunk padding honored).
        Returns ``(format, sample_rate, channels, bit_depth, n_samples,
        duration_sec)`` after validating the sample data is actually
        present. Compressed audio (MP3/OGG/FLAC/AAC, or compressed WAV
        format tags like ADPCM/µ-law) raises NotImplementedError — no
        codec libraries in this container, and a header sniff must not
        claim a decode it cannot do. Swapping in soundfile/ffmpeg
        extends THIS function; the Arrow plumbing needs no changes."""
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError(
                "only RIFF/WAVE PCM decode without codec libraries; "
                "compressed audio needs soundfile/ffmpeg (not in this container)"
            )
        fmt: tuple[int, int, int, int] | None = None
        data_len: int | None = None
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if cid == b"fmt ":
                if size < 16 or body + 16 > len(payload):
                    raise ValueError("WAV fmt chunk truncated")
                tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", payload, body
                )
                if tag not in (1, 3):  # PCM / IEEE float
                    raise NotImplementedError(
                        f"WAV format tag {tag} is a compressed codec "
                        "(ADPCM/µ-law/...) — only PCM (1) and IEEE float (3)"
                    )
                fmt = (tag, ch, rate, bits)
            elif cid == b"data":
                if body + size > len(payload):
                    raise ValueError(
                        f"WAV data chunk truncated: need {body + size} bytes, "
                        f"have {len(payload)}"
                    )
                data_len = size
            pos = body + size + (size & 1)  # chunks pad to even offsets
        if fmt is None or data_len is None:
            raise ValueError("WAV missing fmt/data chunk")
        tag, ch, rate, bits = fmt
        if ch <= 0 or rate <= 0 or bits <= 0 or bits % 8:
            raise ValueError(f"WAV fmt invalid: channels={ch} rate={rate} bits={bits}")
        frame_bytes = ch * (bits // 8)
        n_samples = data_len // frame_bytes
        return (
            "wav_pcm" if tag == 1 else "wav_float",
            rate,
            ch,
            bits,
            n_samples,
            n_samples / rate,
        )

    return decode_audio_real


decode_audio_real = _make_audio_decoder()


def decode_audio(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary audio payload → typed metadata
    (sample rate, channels, bit depth, sample count, duration). Same
    Arrow batch shape as :func:`decode_images`; the decoder really
    parses WAV/PCM bytes and fails the task loudly on anything else."""
    _decode = _make_audio_decoder()

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "format": decoded.map(lambda d: d[0]),
                    "sample_rate": decoded.map(lambda d: d[1]),
                    "channels": decoded.map(lambda d: d[2]),
                    "bit_depth": decoded.map(lambda d: d[3]),
                    "n_samples": decoded.map(lambda d: d[4]),
                    "duration_sec": decoded.map(lambda d: d[5]),
                }
            )

    return df.select("doc_id", "payload", "n_bytes", "content_hash").mapInPandas(
        decode_batch, schema=AUDIO_SCHEMA
    )


def _make_video_parser():
    """Factory: returns the real video parser as a local closure shipped
    by value into Arrow workers (same convention as the other decoders)."""

    def parse_video_real(payload: bytes) -> tuple[int, int, float, list[int], int]:
        """REAL video parse for the codec-free format: YUV4MPEG2 (y4m) —
        ASCII stream header (W/H/F/C parameters) followed by FRAME
        sections of fixed planar-YUV size. Returns ``(width, height,
        fps, frame_offsets, frame_bytes)`` where ``frame_offsets[i]`` is
        the byte offset of frame i's raster. A truncated frame or a
        malformed marker raises ValueError; compressed containers
        (MP4/MKV/WebM) raise NotImplementedError — parsing them needs
        ffmpeg, which is not in this container."""
        if not payload.startswith(b"YUV4MPEG2"):
            raise NotImplementedError(
                "only uncompressed YUV4MPEG2 (y4m) parse without codec "
                "libraries; compressed containers need ffmpeg"
            )
        nl = payload.index(b"\n")
        w = h = 0
        fps = 30.0
        colorspace = b"420"
        for p in payload[9:nl].split(b" "):
            if p[:1] == b"W":
                w = int(p[1:])
            elif p[:1] == b"H":
                h = int(p[1:])
            elif p[:1] == b"F":
                num, den = p[1:].split(b":")
                fps = int(num) / int(den)
            elif p[:1] == b"C":
                colorspace = p[1:]
        if w <= 0 or h <= 0:
            raise ValueError("Y4M header missing W/H")
        # High-bit-depth variants (C420p10, C422p12, Cmono16, ...) pack 2
        # bytes per sample — refusing them MUST be NotImplementedError,
        # not a downstream mid-raster "corrupt data" ValueError from an
        # 8-bit frame-size guess.
        depth_digits = bytes(c for c in colorspace[3:] if 0x30 <= c <= 0x39)
        if depth_digits and int(depth_digits) > 8:
            raise NotImplementedError(
                f"Y4M colorspace {colorspace!r}: bit depths > 8 need 2-byte "
                "samples (unsupported here)"
            )
        if colorspace.startswith(b"420"):
            frame_bytes = w * h * 3 // 2
        elif colorspace.startswith(b"422"):
            frame_bytes = w * h * 2
        elif colorspace == b"444alpha":  # 4th (alpha) plane
            frame_bytes = w * h * 4
        elif colorspace.startswith(b"444"):
            frame_bytes = w * h * 3
        elif colorspace.startswith(b"mono"):
            frame_bytes = w * h
        else:
            raise NotImplementedError(f"Y4M colorspace {colorspace!r}")
        offsets: list[int] = []
        pos = nl + 1
        while pos < len(payload):
            if payload[pos : pos + 5] != b"FRAME":
                raise ValueError(f"Y4M: expected FRAME marker at offset {pos}")
            start = payload.index(b"\n", pos) + 1
            if start + frame_bytes > len(payload):
                raise ValueError(
                    f"Y4M frame truncated: need {start + frame_bytes} bytes, "
                    f"have {len(payload)}"
                )
            offsets.append(start)
            pos = start + frame_bytes
        return (w, h, fps, offsets, frame_bytes)

    return parse_video_real


parse_video_real = _make_video_parser()

VIDEO_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, format string, "
    "width int, height int, fps double, n_frames int"
)

FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, payload binary, n_bytes long, "
    "content_hash string, width int, height int"
)


def decode_video(df: DataFrame) -> DataFrame:
    """mapInPandas metadata stage: y4m payload → (width, height, fps,
    n_frames). Counting frames requires walking the stream (y4m has no
    frame-count field), which the parser does without copying rasters."""
    _parse = _make_video_parser()

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf["payload"].map(_parse)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "format": "y4m",
                    "width": parsed.map(lambda d: d[0]),
                    "height": parsed.map(lambda d: d[1]),
                    "fps": parsed.map(lambda d: d[2]),
                    "n_frames": parsed.map(lambda d: len(d[3])),
                }
            )

    return df.select("doc_id", "payload", "n_bytes", "content_hash").mapInPandas(
        decode_batch, schema=VIDEO_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_nth: int = 10, anchor: str = "index"
) -> DataFrame:
    """REAL in-payload frame sampling: slice a ~1/``every_nth`` subset
    of frames out of an uncompressed y4m video and emit each as its own
    row — the explode-shaped stage a training pipeline runs before
    image encoding. Each sampled frame's luma (Y) plane is repackaged
    as a binary PGM payload, so the output rows feed
    :func:`decode_images` (``decoder="real"``), :func:`resize_images`
    and :func:`extract_features` unchanged — the video surface composes
    with the image surface instead of inventing a parallel one. (The Y
    plane is full-resolution first in every y4m colorspace, so the
    slice is the same ``w*h`` bytes for 420/422/444/mono.)

    Two sampling disciplines, the chunk-dedup split replayed on the
    time axis (see ``operators.dedup.chunk_level_dedup``):

    * ``anchor="index"`` — every ``every_nth``-th frame by ABSOLUTE
      index. Positions are offset-anchored, so prepending or inserting
      a segment shifts the whole sampling grid and a shifted copy
      samples a DISJOINT frame set.
    * ``anchor="content"`` (r10) — a frame is sampled iff the 52-bit
      md5 fraction of its luma plane ≡ 0 (mod ``every_nth``): expected
      rate 1/``every_nth``, but the decision is a pure function of the
      FRAME CONTENT, so an inserted/prepended segment only adds its
      own frames to the sample and every originally-sampled frame
      stays sampled — the same edit-locality argument as CDC chunk
      boundaries. A video where no frame passes the gate falls back to
      ALL frames (deterministic; a sampler that returns nothing would
      undefine downstream stages). This mode is for TRAINING frame
      extraction, where membership jitter under pixel noise is
      harmless; the near-dup FINGERPRINT does NOT use it — raw-byte
      keys re-draw membership under noise, so
      ``perceptual_hash_video`` gates voters on each frame's
      perceptual (aHash) key with a smallest-key quota top-up instead
      (VIDEO_FP_ALGO v2-pgate).

    Scale shape: one Arrow pass, output size ≈ n_frames/every_nth per
    video; a row explosion, not a shuffle. Frame payloads never
    round-trip through Python row objects — they stay inside the Arrow
    batch. (Content anchoring md5s every frame's plane — C-speed over
    bytes the pass already holds; the expensive downstream per-frame
    work still runs on the sampled subset only.)"""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    if anchor not in ("index", "content"):
        raise ValueError(f"anchor must be 'index' or 'content', got {anchor!r}")
    _parse = _make_video_parser()

    def sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "payload": [], "n_bytes": [],
                "content_hash": [], "width": [], "height": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _fps, offsets, _fb = _parse(payload)
                header = b"P5 %d %d 255\n" % (w, h)
                if anchor == "index":
                    idxs = range(0, len(offsets), every_nth)
                else:
                    idxs = [
                        i
                        for i, start in enumerate(offsets)
                        if int(
                            hashlib.md5(
                                bytes(payload[start : start + w * h])
                            ).hexdigest()[:13],
                            16,
                        ) % every_nth == 0
                    ]
                    if not idxs:  # gate-empty fallback: all frames vote
                        idxs = range(len(offsets))
                for i in idxs:
                    start = offsets[i]
                    frame = header + payload[start : start + w * h]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["payload"].append(frame)
                    # downstream stage contract (decode_images /
                    # resize_images select these):
                    out["n_bytes"].append(len(frame))
                    out["content_hash"].append(hashlib.md5(frame).hexdigest())
                    out["width"].append(w)
                    out["height"].append(h)
            if out["doc_id"]:  # empty pandas frames have no dtypes for Arrow
                yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        sample_batch, schema=FRAMES_SCHEMA
    )


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


AHASH_SCHEMA = "doc_id long, width int, height int, simhash string"


def perceptual_hash_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit average-hash (aHash) per image — NEAR-duplicate identity
    for the image modality, where content-hash exact dedup fails the
    moment one pixel differs (re-encodes, minor noise, watermarks).
    Pipeline position: decode → aHash → the SAME chunk-blocked hamming
    machinery as text SimHash (``operators.dedup.simhash_pairs``
    consumes this output unchanged — the ``simhash`` column name is the
    contract).

    aHash: grayscale the raster (integer (r+g+b)//3 — no float, so the
    hash is bit-reproducible), average-pool onto an 8×8 grid with
    floor-boundary cells, set bit k iff cell-mean_k > mean of the 64
    cell means (strict >, ties → 0). Requires ≥ 8×8 pixels (smaller
    rasters raise — a 64-bit hash of fewer pixels is undefined).
    Supports the engine's real codec-free decodes: binary P5/P6 Netpbm
    (maxval ≤ 255) and uncompressed 8/24/32-bpp BMP. Rows are hashed
    in IMAGE order — bottom-up BMPs are flipped via the shared parser's
    orientation flag — so the same raster hashes identically whether
    stored top-down, bottom-up, or as a PGM (cross-format pairing is
    pytest-pinned). Pure-Python per Arrow batch via mapInPandas, the
    multimodal hot-path convention."""

    parse_raster = _make_raster_parser()

    def hash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: parse_raster is closed over and ships
        # by value with it (see decode_batch)

        def _gray_pixels(payload: bytes) -> tuple[int, int, list[int]]:
            fmt, w, h, ch, off, stride, top_down, bps = parse_raster(payload)
            if bps != 1:
                raise NotImplementedError("16-bit netpbm aHash")
            px: list[int] = []
            for y in range(h):  # iterate in IMAGE row order
                base = off + (y if top_down else h - 1 - y) * stride
                for x in range(w):
                    k = base + x * ch
                    if ch == 1:
                        px.append(payload[k])
                    else:
                        # integer mean of the 3 color samples — same
                        # value for RGB (netpbm) and BGR(A) (BMP) order
                        px.append(
                            (payload[k] + payload[k + 1] + payload[k + 2]) // 3
                        )
            return w, h, px

        def _ahash(payload: bytes) -> tuple[int, int, str]:
            w, h, px = _gray_pixels(payload)
            if w < 8 or h < 8:
                raise ValueError(f"aHash needs >=8x8 pixels, got {w}x{h}")
            means = []
            for gy in range(8):
                y0, y1 = gy * h // 8, (gy + 1) * h // 8
                for gx in range(8):
                    x0, x1 = gx * w // 8, (gx + 1) * w // 8
                    s = n = 0
                    for y in range(y0, y1):
                        row = y * w
                        for x in range(x0, x1):
                            s += px[row + x]
                            n += 1
                    means.append(s / n)
            mu = sum(means) / 64.0
            return w, h, "".join("1" if m > mu else "0" for m in means)

        for pdf in it:
            hashed = pdf[payload_col].map(_ahash)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],  # aliased in the select below
                    "width": hashed.map(lambda t: t[0]),
                    "height": hashed.map(lambda t: t[1]),
                    "simhash": hashed.map(lambda t: t[2]),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), payload_col).mapInPandas(
        hash_batch, schema=AHASH_SCHEMA
    )


# fingerprint-algorithm era stamps for the cross-run hamming store
# (operators.dedup.check_store_algo): bump whenever the bit rule
# changes — stored fingerprints of the old rule hash the SAME content
# differently, so a mixed-era store silently misses near-dups. The
# audio tag is at v2 since the r8 leading/trailing near-silence trim.
IMAGE_AHASH_ALGO = "image/ahash/v1"
AUDIO_FP_ALGO = "audio/energy-contour/v3-overlap4"
# v2 (r10): PERCEPTUALLY content-anchored frame voting — v1's
# every-Nth-by-index grid shifted wholesale under a prepended/inserted
# segment (the exact failure class audio v2→v3 fixed), so the sampled
# sets of a video and its shifted near-dup were disjoint. v2 keys
# frame membership on the md5 fraction of each frame's AHASH BITS: a
# frame votes iff its key ≡ 0 (mod every_nth) — membership is then a
# pure function of PERCEPTUAL content, so an insertion never displaces
# an original voter and a noisy re-encode keeps each frame's key — and
# the vote set is topped up to a minimum quota (bottom-k by the same
# key: min(n, max(VIDEO_FP_MIN_VOTERS, ceil(n/every_nth))) voters) so
# it is never empty or degenerately small. Three rules were measured
# on the way (see perceptual_hash_video): raw-byte gate (noise re-drew
# every membership), mod-gate + all-frames fallback (cliff between
# ALL-frames and one-inserted-frame vote sets), pure bottom-k (the
# quota grows with n, and the extra voter flips knife-edge bits —
# measured hamming 28 on the alternating-scene fixture).
VIDEO_FP_ALGO = "video/temporal-majority-ahash/v2-pgate"
# Minimum vote-set size for the video fingerprint: a strict majority
# over fewer voters is dominated by single frames (the review's cliff
# scenario paired a 9-frame video's 1-frame vote against an inserted
# frame). Part of the bit rule — changing it bumps VIDEO_FP_ALGO.
VIDEO_FP_MIN_VOTERS = 5

AUDIO_FP_SCHEMA = "doc_id long, sample_rate int, n_samples long, simhash string"


def perceptual_hash_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit frame-energy fingerprint per audio payload — the audio
    modality's aHash twin, closing the loop on the modality-agnostic
    hamming store (text SimHash and image aHash already feed it): split
    the mono-mixed sample stream into 64 equal time frames
    (floor-boundary segments, the aHash grid rule), take each frame's
    mean absolute amplitude, and set bit k iff frame k's mean > the
    mean of the 64 frame means (strict >, ties → 0). The sign-of-
    energy-contour construction is robust to the perturbations that
    break content-hash identity — re-encodes at different bit depths
    scale ALL frames together (the global-mean threshold cancels gain),
    low-level noise moves frame means by ±1 LSB — while a different
    loudness CONTOUR flips many bits. Leading/trailing NEAR-SILENCE
    (|v| ≤ peak/256 — a scale-free threshold, so gain invariance is
    preserved) is trimmed before framing (r8): a planted silence pad
    would otherwise shift every absolute frame boundary, the classic
    temporal-offset failure; with the trim a pure pad is an exact
    no-op. (The Haitsma–Kalker adjacent-delta bit rule was measured
    and rejected for this — see the inline note; the trim only fixes
    PAD shifts, and v3's frame overlap is what absorbs the boundary
    drift a NON-silent prefix introduces.) Each bit-rule change bumps
    ``AUDIO_FP_ALGO`` (v2 silence trim, v3 overlapped frames):
    cross-run stores stamped by ``curate_corpus`` refuse old-era
    fingerprints instead of silently missing near-dups
    (``operators.dedup.check_store_algo``); unstamped direct-call
    stores built before the change must be rebuilt.

    Decodes the engine's real codec-free audio (RIFF/WAVE, the same
    chunk walk as :func:`decode_audio`): PCM 8/16/32-bit and IEEE
    float 32/64; 24-bit PCM and compressed tags raise at the
    documented loud boundary. Channels mix down by per-frame integer
    mean (exact for PCM — the fingerprint is bit-reproducible).
    Requires ≥ 64 mono samples. Output carries the ``simhash`` column
    contract, so ``operators.dedup.simhash_pairs`` (chunk-blocked
    hamming join) and ``incremental_hamming_dedup`` (the cross-run
    store) consume it unchanged."""

    def hash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure shipped by value (decoder convention)
        import struct

        def _mono_samples(payload: bytes) -> tuple[int, list]:
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise NotImplementedError(
                    "only RIFF/WAVE PCM fingerprinting without codec "
                    "libraries; compressed audio needs soundfile/ffmpeg"
                )
            fmt = None
            data = None
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                (size,) = struct.unpack_from("<I", payload, pos + 4)
                body = pos + 8
                if cid == b"fmt ":
                    if size < 16 or body + 16 > len(payload):
                        raise ValueError("WAV fmt chunk truncated")
                    tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                        "<HHIIHH", payload, body
                    )
                    if tag not in (1, 3):
                        raise NotImplementedError(
                            f"WAV format tag {tag} is a compressed codec"
                        )
                    fmt = (tag, ch, rate, bits)
                elif cid == b"data":
                    if body + size > len(payload):
                        raise ValueError("WAV data chunk truncated")
                    data = (body, size)
                pos = body + size + (size & 1)
            if fmt is None or data is None:
                raise ValueError("WAV missing fmt/data chunk")
            tag, ch, rate, bits = fmt
            if ch <= 0 or rate <= 0:
                raise ValueError(f"WAV fmt invalid: channels={ch} rate={rate}")
            off, size = data
            if tag == 1 and bits == 8:  # unsigned, midpoint 128
                frames = [b - 128 for b in payload[off : off + size]]
            elif tag == 1 and bits == 16:
                frames = list(
                    struct.unpack_from(f"<{size // 2}h", payload, off)
                )
            elif tag == 1 and bits == 32:
                frames = list(
                    struct.unpack_from(f"<{size // 4}i", payload, off)
                )
            elif tag == 3 and bits == 32:
                frames = list(
                    struct.unpack_from(f"<{size // 4}f", payload, off)
                )
            elif tag == 3 and bits == 64:
                frames = list(
                    struct.unpack_from(f"<{size // 8}d", payload, off)
                )
            else:
                raise NotImplementedError(
                    f"WAV tag {tag} at {bits}-bit needs a codec shim "
                    "(24-bit PCM packing / non-IEEE widths)"
                )
            if ch == 1:
                return rate, frames
            n = len(frames) // ch
            if tag == 1:  # integer channel mean keeps PCM exact
                return rate, [
                    sum(frames[i * ch : (i + 1) * ch]) // ch for i in range(n)
                ]
            return rate, [
                sum(frames[i * ch : (i + 1) * ch]) / ch for i in range(n)
            ]

        def _fp(payload: bytes) -> tuple[int, int, str]:
            rate, mono = _mono_samples(payload)
            n_decoded = n = len(mono)
            if n < 64:
                raise ValueError(
                    f"audio fingerprint needs >= 64 samples, got {n}"
                )
            # temporal-shift tolerance (r8): trim leading/trailing
            # near-silence (|v| <= peak/256, i.e. 256|v| <= max|v| —
            # scale-free, so gain invariance survives) BEFORE framing.
            # A planted silence/low-noise pad shifts every absolute
            # frame boundary otherwise; trimming makes pure pads EXACT
            # no-ops. The Haitsma-Kalker adjacent-delta bit rule was
            # measured as the alternative and rejected: over these
            # non-overlapped frames it flips 11-17/64 bits on a padded
            # smooth envelope vs 0-3 for the absolute-threshold rule
            # (their construction's shift robustness comes from 31/32
            # frame OVERLAP, not the delta itself). All-silence audio
            # (peak 0) and a trim below 64 samples fall back untrimmed.
            peak = max(v if v >= 0 else -v for v in mono)
            if peak > 0:
                lo_i, hi_i = 0, n
                while lo_i < n and 256 * abs(mono[lo_i]) <= peak:
                    lo_i += 1
                while hi_i > lo_i and 256 * abs(mono[hi_i - 1]) <= peak:
                    hi_i -= 1
                if hi_i - lo_i >= 64:
                    mono = mono[lo_i:hi_i]
                    n = hi_i - lo_i
            # OVERLAPPED frames (r9, v3): 256 hop-grid frames, each
            # 4 hops long (same n/64 frame duration as v2, started 4x
            # as densely — the Haitsma-Kalker robustness mechanism is
            # exactly this frame overlap, measured in r8 when their
            # delta rule was rejected). A small temporal offset (a
            # prepended NON-silent jingle the silence trim cannot
            # remove) drifts every boundary; with 4x overlap the
            # strict-majority 4:1 fold votes out the individual
            # boundary-crossing flips that v2's single estimate per
            # bit position had to eat. Trailing frames clamp at n
            # (deterministic, the aHash grid rule). Integer energy
            # sums; the only floats are the per-frame mean and the
            # global threshold, exactly as v1/v2.
            flen = max(1, 4 * n // 256)
            # overlapped frames re-read each sample ~4×: for INTEGER
            # PCM a prefix-sum makes every frame sum an O(1) subtraction
            # (bit-identical — integer addition is associative), keeping
            # the per-row work O(n) instead of 4n. Float samples (IEEE
            # WAV) keep the direct per-frame loop: a cumsum difference
            # is a DIFFERENT float rounding than the sequential segment
            # sum, and the bit rule is pinned to the latter.
            cum = None
            if isinstance(mono[0], int):
                cum = [0] * (n + 1)
                acc0 = 0
                for i, v in enumerate(mono):
                    acc0 += v if v >= 0 else -v
                    cum[i + 1] = acc0
            means = []
            for s in range(256):
                i0 = s * n // 256
                i1 = min(n, i0 + flen)
                if i1 <= i0:
                    i1 = i0 + 1
                if cum is not None:
                    acc = cum[i1] - cum[i0]
                else:
                    acc = 0
                    for v in mono[i0:i1]:
                        acc += v if v >= 0 else -v
                means.append(acc / (i1 - i0))
            mu = sum(means) / 256.0
            bits = [1 if m > mu else 0 for m in means]
            # strict majority of the 4 overlapped estimates per output
            # bit (>= 3 of 4; ties -> 0, the v1 tie convention)
            fp64 = [
                1 if bits[4 * k] + bits[4 * k + 1] + bits[4 * k + 2]
                + bits[4 * k + 3] >= 3 else 0
                for k in range(64)
            ]
            # n_samples reports the DECODED count (the parse result),
            # not the trimmed framing window
            return rate, n_decoded, "".join(
                "1" if b else "0" for b in fp64
            )

        for pdf in it:
            hashed = pdf[payload_col].map(_fp)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],  # aliased in the select below
                    "sample_rate": hashed.map(lambda t: t[0]),
                    "n_samples": hashed.map(lambda t: t[1]),
                    "simhash": hashed.map(lambda t: t[2]),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), payload_col).mapInPandas(
        hash_batch, schema=AUDIO_FP_SCHEMA
    )


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio near-dup pairs: frame-energy fingerprint → the SAME
    chunk-blocked hamming join text SimHash and image aHash use (one
    blocking/verify engine, three modalities). Returns
    (id_a, id_b, hamming)."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        perceptual_hash_audio(df, id_col, payload_col), max_hamming=max_hamming
    )


VIDEO_FP_SCHEMA = "doc_id long, n_frames_hashed long, simhash string"


def perceptual_hash_video(
    df: DataFrame,
    every_nth: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit temporal-majority aHash per video — the THIRD modality on
    the shared hamming engine (text SimHash, image aHash, audio
    frame-energy, now video): sample a ~1/``every_nth`` frame subset
    out of the real y4m payload (:func:`sample_video_frames` — the luma
    plane repackaged as PGM), aHash each sampled frame with the SAME
    image hash, then set bit k iff a strict MAJORITY of sampled frames
    have bit k (ties → 0). The majority fold is what makes the hash a
    VIDEO identity rather than a frame identity: per-frame noise or a
    few edited frames flip a minority of frames' bits and the majority
    absorbs them, while different footage flips most frames together.

    v2 (r10): which frames VOTE is keyed on the md5 fraction of each
    frame's AHASH BITS — a frame votes iff key ≡ 0 (mod ``every_nth``),
    and the vote set is topped up to a minimum quota (bottom-k by the
    same key) of min(n, max(VIDEO_FP_MIN_VOTERS, ceil(n/every_nth)))
    voters. v1's every-Nth-by-index grid shifted wholesale under a
    prepended/inserted segment, so a shifted near-dup sampled a
    DISJOINT frame set and the majority could flip arbitrarily (the
    failure class the audio v3 overlap fixed, pytest-planted).
    Membership as a pure function of perceptual content gives, at
    once: NO DISPLACEMENT (an inserted segment never un-selects an
    original voter — its own gated frames join as a minority),
    NOISE STABILITY (a noisy re-encode keeps each frame's aHash hence
    its key; a raw-byte md5 key was measured and rejected — per-pixel
    noise re-drew every membership), and NO CLIFFS (the quota top-up
    replaces an earlier all-frames fallback that swung near-dup copies
    between ALL-frames and one-inserted-frame vote sets, and a pure
    bottom-k whose n-dependent quota flipped knife-edge bits —
    measured hamming 28 on the alternating-scene fixture). The honest
    cost shift: every frame is aHashed (the key IS the vote value,
    computed once and reused), so ``every_nth`` prunes the VOTE SET,
    not the per-frame hash work — a fingerprint that never looks at a
    frame cannot anchor to its content; the payload parse already
    touches every byte. Bit-rule change ⇒ ``VIDEO_FP_ALGO`` bumped to
    v2: era-stamped cross-run stores (``curate_corpus``) refuse v1
    fingerprints instead of silently missing near-dups.

    Composition, not new machinery — the frame slice, the image hash,
    and the downstream pairing/store are all the existing attested
    stages; the vote selection is one JVM md5 + rank window riding the
    majority groupBy's doc_id partitioning (no extra exchange) and the
    majority aggregation is one map-side-combined pass. Output carries
    the ``simhash`` column contract for
    ``operators.dedup.simhash_pairs`` / ``incremental_hamming_dedup``."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    # normalize BOTH names before the frame sampler: sample_video_frames
    # hard-selects 'doc_id'/'payload' inside its Arrow closure, so a
    # non-default payload_col must be aliased here (the image/audio
    # hashers read payload_col directly in their own closures)
    frames = sample_video_frames(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("payload"),
        ),
        1,
    )
    fh = perceptual_hash_images(frames.select("doc_id", "payload"))
    if every_nth > 1:
        # perceptual-gate vote selection with a quota top-up: rank
        # frames per video by (gated first, key asc, bits — equal keys
        # mean equal aHashes, so tie order cannot change the majority)
        # and keep max(#gated, quota) frames: every gated frame always
        # votes (no displacement under insertion) and low-pass videos
        # top up from the smallest keys. All three windows ride the
        # doc_id hash partitioning the majority groupBy needs — no
        # extra exchange.
        key = (
            F.conv(F.substring(F.md5("simhash"), 1, 13), 16, 10)
            .cast("long")
        )
        w = Window.partitionBy("doc_id")
        gated = (key % every_nth == 0).cast("int")
        quota = F.least(
            F.col("_n_all"),
            F.greatest(
                F.lit(VIDEO_FP_MIN_VOTERS),
                F.ceil(
                    F.col("_n_all") / F.lit(float(every_nth))
                ).cast("int"),
            ),
        )
        ranked = fh.withColumn(
            "_n_all", F.count(F.lit(1)).over(w)
        ).withColumn(
            "_g", F.sum(gated).over(w)
        ).withColumn(
            "_vr",
            F.row_number().over(
                w.orderBy(
                    (-gated).asc(), key.asc(), F.col("simhash")
                )
            ),
        )
        fh = ranked.filter(
            F.col("_vr") <= F.greatest(F.col("_g").cast("int"), quota)
        )
    bit_cols = [
        F.substring("simhash", i + 1, 1).cast("int").alias(f"_b{i}")
        for i in range(64)
    ]
    per_frame = fh.select("doc_id", *bit_cols)
    agg = per_frame.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"_b{i}").alias(f"_s{i}") for i in range(64)],
    )
    majority = F.concat(
        *[
            F.when(F.col(f"_s{i}") * 2 > F.col("_n"), F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(64)
        ]
    )
    return agg.select(
        "doc_id",
        F.col("_n").cast("long").alias("n_frames_hashed"),
        majority.alias("simhash"),
    )


def video_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    every_nth: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video near-dup pairs: temporal-majority aHash → the SAME
    chunk-blocked hamming join every other modality uses. Returns
    (id_a, id_b, hamming)."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        perceptual_hash_video(df, every_nth, id_col, payload_col),
        max_hamming=max_hamming,
    )


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-dup pairs: aHash → the text-SimHash chunk-blocked
    hamming join, unchanged (the cross-modality reuse is the point —
    one blocking/verify engine serves both modalities). Returns
    (id_a, id_b, hamming)."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        perceptual_hash_images(df, id_col, payload_col), max_hamming=max_hamming
    )
