"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for images/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer to object storage) next to typed metadata
columns; run decode / feature-extraction / resize / frame-sampling as
Arrow-batched ``mapInPandas`` stages so each Python worker touches a
columnar batch, never a row at a time.

The actual media codecs are NOT available in this environment, so the
decode kernels are stubs: ``decode_image_stub`` produces a deterministic
fake "decoded" feature set derived from the bytes (so tests are stable),
and ``decode_image_real`` raises NotImplementedError where Pillow/ffmpeg
would plug in. Everything Spark-side — schema, batching, partitioning,
UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of a decoded media batch: metadata stays typed, payload stays opaque.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_binary_payload(
    df: DataFrame, src_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Attach an opaque binary column (fixtures have no media, so we treat
    UTF-8 bytes of a string column as the payload). At scale this column
    is what a parquet BYTE_ARRAY media blob looks like to the engine."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "UTF-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque payload without decoding it: byte
    length + content hash. Pure expressions — this is the cheap pass that
    runs over all 100 TB before any decode is scheduled."""
    p = F.col(payload_col)
    return df.select(
        "doc_id",
        F.length(p).alias("n_bytes"),
        F.md5(p).alias("content_md5"),
    )


def _decode_ppm(payload: bytes) -> "tuple":
    """Binary PPM (P6) decode in pure NumPy — no codec library needed:
    the format is an ASCII header (magic, width, height, maxval, with
    '#' comments) followed by raw interleaved RGB bytes. Returns
    (width, height, channels, pixel_array[h, w, 3] uint8)."""
    import numpy as np

    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] not in (
                    b"\n",
                    b"\r",
                ):
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return w, h, 3, px


def _decode_bmp(payload: bytes) -> "tuple":
    """Uncompressed 24-bit BI_RGB Windows BMP decode in pure NumPy.
    Rows are 4-byte aligned and stored bottom-up (positive height).
    Returns (width, height, channels, pixel_array[h, w, 3] uint8 in RGB
    order)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    raster = payload[data_off : data_off + stride * h]
    if len(raster) != stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        px = px[::-1]
    return w, h, 3, px


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class UnsupportedPngError(ValueError):
    """The payload IS a well-formed PNG but uses a feature outside the
    native decoder's scope (16-bit, palette, interlace) — falls through
    to the Pillow seam when one is importable."""


def _decode_png(payload: bytes) -> "tuple":
    """Pure-stdlib PNG decode (r05, VERDICT item 4): zlib inflate +
    per-scanline un-filtering (None/Sub/Up/Average/Paeth) in NumPy —
    no codec library. Scope: 8-bit depth, non-interlaced, color types
    0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); anything else raises
    :class:`UnsupportedPngError` for the Pillow fallback. Output is
    normalized to RGB exactly like the Pillow branch's
    ``convert("RGB")`` (gray replicated, alpha dropped), so both paths
    yield identical metrics on the same payload.

    Cost model: Up/None rows un-filter fully vectorized; Sub is a
    per-channel-lane cumsum; Average/Paeth fall back to a per-byte
    Python loop (encoder-chosen, typically a minority of rows). For
    JPEG-heavy corpora at scale the Pillow branch remains the
    throughput path — this decoder's job is zero-dependency
    correctness for the most common lossless format."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise UnsupportedPngError(
            f"PNG feature outside native scope (bit depth {depth}, "
            f"color type {ctype}, interlace {interlace})"
        )
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG raster size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y else np.zeros(
            stride, np.int16
        )
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 1:  # Sub: per-lane prefix sum (mod distributes)
            rec = np.cumsum(
                cur.reshape(w, ch), axis=0, dtype=np.int64
            ).reshape(stride) & 0xFF
        elif f in (3, 4):  # Average / Paeth: left-dependent, sequential
            rec = np.empty(stride, np.int16)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b_up = int(prev[x])
                if f == 3:
                    pred = (a + b_up) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b_up - c
                    pa, pb, pc = abs(p - a), abs(p - b_up), abs(p - c)
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b_up if pb <= pc else c)
                    )
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, ch)
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return w, h, 3, px


def encode_png(px, filters=None) -> bytes:
    """Fixture generator: encode an (h, w[, ch]) uint8 array (ch 1, 2,
    3 or 4 -> gray / gray+alpha / RGB / RGBA) as a valid 8-bit
    non-interlaced PNG. ``filters`` picks the scanline filter per row
    (cycled; default cycles all five) so tests can exercise every
    un-filter branch of ``_decode_png``."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0, 1, 2, 3, 4]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        f = int(filters[y % len(filters)])
        cur = a[y].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up_left = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            enc = (cur - (left + prev) // 2) & 0xFF
        else:
            p = left + prev - up_left
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, up_left),
            )
            enc = (cur - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _pillow_module():
    """PIL.Image when Pillow is importable, else None — probed once per
    interpreter (worker processes each probe once). Kept as a function
    seam so tests can monkeypatch codec availability."""
    global _PIL_IMAGE
    if _PIL_IMAGE is _UNPROBED:
        try:
            from PIL import Image  # noqa: PLC0415 — optional dep

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


_UNPROBED = object()
_PIL_IMAGE = _UNPROBED


def _pillow_decode_rgb(b: bytes, why_no_native: str) -> "tuple":
    """(w, h, 3, px) through the Pillow seam, or NotImplementedError
    carrying the reason no native path applied."""
    import io

    import numpy as np

    Image = _pillow_module()
    if Image is None:
        raise NotImplementedError(
            f"{why_no_native}; PPM(P6)/BMP(24-bit)/PNG(8-bit) decode "
            "natively, use decode_image_stub for other payloads "
            "(install Pillow to activate the codec branch)"
        )
    with Image.open(io.BytesIO(b)) as im:
        im = im.convert("RGB")
        px = np.asarray(im)
    h, w, ch = px.shape
    return w, h, ch, px


def decode_image_real(payload: bytes) -> dict:
    """Real image decode: binary PPM (P6), uncompressed 24-bit BMP and
    — r05 — 8-bit non-interlaced PNG (gray/gray+alpha/RGB/RGBA) are
    parsed with pure stdlib+NumPy (``_decode_png``: zlib inflate +
    scanline un-filtering — no codec library). For any other payload
    (JPEG/WebP/16-bit or interlaced PNG/...) the seam AUTO-ACTIVATES
    when Pillow is importable (r04): the bytes go through
    ``PIL.Image.open`` and the same metrics come back. Only when no
    path applies does the decode raise NotImplementedError.

    Returns {"width", "height", "channels", "mean_intensity"} with
    mean_intensity = mean over all RGB byte values (exact float64);
    the native PNG path normalizes to RGB exactly like the Pillow
    branch's convert("RGB"), so both paths agree on any payload."""
    import numpy as np

    b = bytes(payload)
    if b[:2] == b"P6":
        w, h, ch, px = _decode_ppm(b)
    elif b[:2] == b"BM":
        w, h, ch, px = _decode_bmp(b)
    elif b[:8] == _PNG_MAGIC:
        try:
            w, h, ch, px = _decode_png(b)
        except UnsupportedPngError as e:
            w, h, ch, px = _pillow_decode_rgb(b, str(e))
    else:
        w, h, ch, px = _pillow_decode_rgb(
            b, "compressed-format codecs not installed"
        )
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "mean_intensity": float(np.mean(px.astype(np.float64))),
    }


def encode_ppm(px) -> bytes:
    """Fixture generator: encode an (h, w, 3) uint8 array as binary PPM
    (P6) — the round-trip twin of ``_decode_ppm`` for tests and synthetic
    media fixtures."""
    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def encode_bmp(px) -> bytes:
    """Fixture generator: encode an (h, w, 3) uint8 RGB array as an
    uncompressed bottom-up 24-bit BMP."""
    import struct

    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in a[::-1]:  # bottom-up
        bgr = row[:, ::-1].tobytes()
        raster += bgr + b"\x00" * (stride - len(bgr))
    data_off = 14 + 40
    file_size = data_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + dib + bytes(raster)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL decode stage over mapInPandas: PPM/BMP payloads
    decode natively (``decode_image_real``); any other payload raises in
    the task, surfacing bad media loudly (filter on the magic bytes
    first — ``F.substring(payload, 1, 2)`` — to route mixed corpora).
    Identical distributed shape to ``decode_image_stub``."""
    cols = df.select("doc_id", payload_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                d = decode_image_real(b)
                rows.append(
                    (
                        doc_id,
                        len(b),
                        d["width"],
                        d["height"],
                        d["channels"],
                        d["mean_intensity"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                ],
            )

    return cols.mapInPandas(decode, schema=DECODED_SCHEMA)


def decode_image_stub(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched 'decode' stage over mapInPandas.

    The kernel is a deterministic fake: dimensions/intensity are derived
    from the payload bytes, standing in for a real image decode. The
    distributed shape is the real thing: one Python worker per partition,
    pandas batches in/out, typed output schema.
    """
    cols = df.select("doc_id", payload_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n = payloads.str.len().astype("int32")
            # deterministic fake geometry from byte content
            first = payloads.str[0:1].apply(
                lambda b: b[0] if len(b) else 0
            ).astype("int32")
            width = (first % 64 + 1).astype("int32")
            height = ((n % 64) + 1).astype("int32")
            mean_intensity = payloads.apply(
                lambda b: (sum(b[:32]) / max(1, len(b[:32]))) if len(b) else 0.0
            ).astype("float64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": width,
                    "height": height,
                    "channels": 3,
                    "mean_intensity": mean_intensity,
                }
            )

    return cols.mapInPandas(decode, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample_stub(
    df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """Frame-sampling plumbing: one input row fans out to N 'frames'
    (here: fixed-size byte slices standing in for decoded video frames).
    Demonstrates the 1->N mapInPandas expansion shape a video pipeline
    needs; a real implementation swaps the slicer for ffmpeg keyframes."""
    cols = df.select("doc_id", payload_col)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                for i, off in enumerate(
                    range(0, len(payload), every_n_bytes)
                ):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_bytes.append(payload[off : off + every_n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_bytes, dtype=object),
                }
            )

    return cols.mapInPandas(sample, schema=FRAME_SCHEMA)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dim", T.IntegerType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def embed_stub(df: DataFrame, payload_col: str = "payload", dims: int = 8) -> DataFrame:
    """Arrow-batched feature-extraction stage (the 'image -> embedding'
    bridge into the similarity operators). The kernel is a deterministic
    fake — md5 bytes of the payload scaled to [0,1] — standing in for a
    real vision encoder; the distributed shape (mapInPandas, typed long
    output, one row per dimension) is the real plumbing. Exploded
    (doc_id, dim, val) output keeps it hash-comparable to the SQL oracle
    without array-rendering concerns."""
    import hashlib

    cols = df.select("doc_id", payload_col)

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_dim, out_val = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).digest()
                for d in range(dims):
                    out_doc.append(doc_id)
                    out_dim.append(d)
                    out_val.append(round(digest[d] / 255.0, 6))
            yield pd.DataFrame(
                {"doc_id": out_doc, "dim": out_dim, "val": out_val}
            )

    return cols.mapInPandas(embed, schema=EMBED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumb_bytes", T.BinaryType()),
    ]
)


def resize_stub(
    df: DataFrame,
    payload_col: str = "payload",
    target_w: int = 16,
    target_h: int = 16,
) -> DataFrame:
    """Arrow-batched 'resize' stage: emits fixed target dimensions plus a
    deterministic byte-subsample of the payload (stride chosen so the
    thumbnail is at most target_w*target_h bytes) — standing in for a real
    interpolating resampler. A real implementation swaps the kernel body
    for PIL/cv2 and keeps the identical schema, batching, and partition
    behavior."""
    cols = df.select("doc_id", payload_col)
    budget = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                stride = max(1, -(-len(b) // budget))  # ceil div
                out.append((doc_id, target_w, target_h, b[::stride]))
            yield pd.DataFrame(
                out, columns=["doc_id", "out_w", "out_h", "thumb_bytes"]
            )

    return cols.mapInPandas(resize, schema=RESIZED_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.DoubleType()),
    ]
)


def audio_frames_stub(
    df: DataFrame,
    payload_col: str = "payload",
    frame: int = 64,
    hop: int = 32,
) -> DataFrame:
    """Arrow-batched audio framing stage: treat the payload bytes as
    8-bit PCM samples, cut them into ``frame``-sample windows at ``hop``
    stride (full frames only), and emit per-frame energy (mean of
    squared sample values) — the STFT-front-end shape every audio
    pipeline starts with. A real implementation swaps the byte
    interpretation for soundfile/ffmpeg decode and keeps the identical
    schema, batching, and partition behavior.

    Deterministic and SQL-mirrorable: sample values are byte values
    (ASCII payloads: ord of each char); the squared-sum is an exact
    integer in float64 and /frame is a power-of-two division, so the
    energy is bit-exact in any engine with NO rounding step (a round()
    here would actually break parity: Python rounds half-even, SQL
    half-away, and exact .x5 halves occur)."""
    import numpy as np

    cols = df.select("doc_id", payload_col)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ns, es = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.float64
                )
                fid = 0
                p = 0
                while p + frame <= len(b):
                    w = b[p : p + frame]
                    ids.append(doc_id)
                    fids.append(fid)
                    ns.append(frame)
                    es.append(float(np.mean(w * w)))
                    fid += 1
                    p += hop
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="float64"),
                }
            )

    return cols.mapInPandas(frames, schema=AUDIO_FRAMES_SCHEMA)
