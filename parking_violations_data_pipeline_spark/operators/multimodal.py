"""Multimodal (binary) column plumbing — driver mandate
(BASELINE.json:6 "multimodal columns").

Images/audio/video are carried as opaque `binary` columns with a
typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over mapInPandas,
so each Python worker sees a columnar batch of payloads (the only
sane shape for media decode at scale — per-row UDFs would serialize
per image).

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so `decode_media` raises NotImplementedError for real
mime types and the pipelines are exercised end-to-end with the
deterministic `fake_features` path: schema, batching, partitioning
and UDF signatures are the real production plumbing; only the
innermost decode call is stubbed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, byte_mod int, first_byte int, last_byte int"

# ---------------------------------------------------------------------------
# Codec seam (round 5): an injectable per-mime codec registry. A container
# that HAS media libs plugs them in with zero engine-code change:
#
#     from PIL import Image
#     register_codec("image/png", lambda b: Image.open(io.BytesIO(b)))
#
# Dispatch notes for the cluster case: pipelines capture the codec by
# VALUE at transform-definition time (the dict is pickled into the task
# closure mapInPandas ships to executors), so register codecs BEFORE
# building the DataFrame transform, and the codec fn itself must be
# picklable (top-level function or lambda over picklable state).
# ---------------------------------------------------------------------------

Codec = Callable[[bytes], object]
_CODECS: dict[str, Codec] = {}


def register_codec(mime: str, fn: Codec) -> Codec | None:
    """Install `fn` as the decoder for `mime`; returns the codec it
    replaced (None if first registration) so tests/callers can restore."""
    prev = _CODECS.get(mime)
    _CODECS[mime] = fn
    return prev


def unregister_codec(mime: str) -> None:
    _CODECS.pop(mime, None)


def registered_codecs() -> dict[str, Codec]:
    """Snapshot (copy) of the current registry — the value pipelines
    should capture when they need executor-side dispatch."""
    return dict(_CODECS)


def attach_binary(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct —
    the ingestion shape for any media column: (payload binary,
    meta struct<mime,n_bytes>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"), F.octet_length(payload).alias("n_bytes")
        ),
    )


def decode_media(payload: bytes, mime: str):
    """Decode one payload via the injected codec registry. This
    container ships no media libs (PIL/ffmpeg absent), so with an
    empty registry every real mime raises NotImplementedError — but a
    deployment that registers codecs (see module header) runs real
    decode through the unchanged mapInPandas plumbing."""
    fn = _CODECS.get(mime)
    if fn is None:
        raise NotImplementedError(
            f"no codec registered for {mime!r} (and none ship in this "
            "environment); register_codec(mime, fn) plugs PIL/ffmpeg in "
            "— the mapInPandas pipeline is unchanged"
        )
    return fn(payload)


def decode_features(
    df: DataFrame,
    feature_fn: Callable[[object], int] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The production decode pipeline: mapInPandas batches → per-mime
    registry dispatch → scalar feature per payload. The codec registry
    is snapshotted HERE (definition time) and pickled into the task
    closure, so executors decode with exactly the codecs registered
    when the transform was built — the distributed-dispatch contract
    the seam test pins. feature_fn maps the decoded object to an int64
    feature (default: len of the decoded object)."""
    codecs = registered_codecs()
    feat = feature_fn or (lambda obj: len(obj))  # noqa: E731

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, feats = [], [], []
            for i, mime, b in zip(pdf[id_col], pdf["mime"], pdf["payload"]):
                fn = codecs.get(mime)
                if fn is None:
                    raise NotImplementedError(
                        f"no codec registered for {mime!r} at "
                        "transform-definition time"
                    )
                ids.append(i)
                mimes.append(mime)
                feats.append(
                    None if b is None else int(feat(fn(bytes(b))))
                )
            yield pd.DataFrame({"doc_id": ids, "mime": mimes, "feature": feats})

    return df.select(id_col, "mime", "payload").mapInPandas(
        extract, "doc_id long, mime string, feature long"
    )


class DecodedBmp:
    """A decoded bitmap: `pixels[y][x] = (r, g, b)` with y=0 the TOP
    row (the parser un-does BMP's bottom-up storage and BGR order)."""

    __slots__ = ("width", "height", "pixels")

    def __init__(self, width: int, height: int, pixels: list) -> None:
        self.width, self.height, self.pixels = width, height, pixels

    def __len__(self) -> int:  # decode_features' default feature
        return self.width * self.height


def bmp_encode(pixels: list) -> bytes:
    """Encode `pixels[y][x] = (r, g, b)` (y=0 top) as a real 24-bit
    uncompressed BMP (BITMAPINFOHEADER): little-endian headers, rows
    stored BOTTOM-UP, channels as BGR, each row padded to a 4-byte
    boundary. Pure stdlib `struct` — the encoder half of the round-6
    'one real codec through the seam' deliverable."""
    import struct

    height = len(pixels)
    width = len(pixels[0]) if height else 0
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y][x]
            row += bytes((b, g, r))  # BGR
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return header + b"".join(rows)


def bmp_codec(payload: bytes) -> DecodedBmp:
    """REAL `image/bmp` decoder in pure stdlib `struct` — registered
    through the codec seam so one mime decodes actual bytes end-to-end
    in this container (PIL-free). Handles the format's three traps:
    bottom-up row storage, BGR channel order, and 4-byte row padding
    (stride). Supports the common case: 24 bpp, BITMAPINFOHEADER,
    BI_RGB (uncompressed); anything else refuses loudly."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("bmp_codec: not a BMP (missing 'BM' magic)")
    # the 14-byte file header + 40-byte BITMAPINFOHEADER must be fully
    # present BEFORE any unpack: a payload truncated mid-header would
    # otherwise raise struct.error, which escapes the except-ValueError
    # quarantine the codec contract promises (round-8 boundary class —
    # same bug class as the wav fmt-chunk ADVICE fix)
    if len(payload) < 54:
        raise ValueError(
            f"bmp_codec: header truncated ({len(payload)} bytes < 54)"
        )
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"bmp_codec: unsupported BMP (hdr={hdr_size} bpp={bpp} "
            f"compression={compression}); only 24-bit BI_RGB is implemented"
        )
    bottom_up = height > 0
    height = abs(height)
    if width < 1 or height < 1:
        raise ValueError(
            f"bmp_codec: invalid dimensions {width}x{height} (malformed)"
        )
    stride = (width * 3 + 3) & ~3
    need = pix_off + stride * height
    if len(payload) < need:
        raise ValueError(
            f"bmp_codec: raster declares {need} bytes but only"
            f" {len(payload)} present (truncated payload)"
        )
    rows = []
    for i in range(height):
        base = pix_off + i * stride
        row = [
            (payload[base + 3 * x + 2], payload[base + 3 * x + 1], payload[base + 3 * x])
            for x in range(width)
        ]
        rows.append(row)
    if bottom_up:
        rows.reverse()  # present top-down
    return DecodedBmp(width, height, rows)


def fake_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for feature extraction: per payload emit
    (n_bytes, sum(bytes) mod 997, first byte, last byte) via
    mapInPandas — one Arrow batch in, one out, no per-row overhead."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payload -> NULL features (SQL semantics), never a crash
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [None if b is None else len(b) for b in payloads],
                    "byte_mod": [None if b is None else sum(b) % 997 for b in payloads],
                    "first_byte": [
                        None if b is None else (b[0] if len(b) else -1)
                        for b in payloads
                    ],
                    "last_byte": [
                        None if b is None else (b[-1] if len(b) else -1)
                        for b in payloads
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled offset
    (stand-in for video frame extraction) — a mapInPandas row
    EXPANSION, the shape a real frame sampler needs."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, vals = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                if b is None:  # nothing to sample from a NULL payload
                    continue
                for off in range(0, len(b), every_n_bytes):
                    ids.append(i)
                    offs.append(off)
                    vals.append(b[off])
            yield pd.DataFrame({"doc_id": ids, "offset": offs, "byte_val": vals})

    return df.select(id_col, "payload").mapInPandas(
        sample, "doc_id long, offset int, byte_val int"
    )


def resize_pool(df: DataFrame, buckets: int = 16, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing (average pooling): pool each payload's bytes
    into `buckets` fixed cells — the 1-D analog of image downscaling,
    with the same mapInPandas batch shape a real resize kernel uses.
    Byte j (0-based, payload length n) lands in cell j*buckets//n;
    the pooled value is the integer mean (sum // count) — exact
    integer arithmetic end-to-end, so the oracle can re-derive every
    cell characterwise."""
    import numpy as np

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, vals = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                if b is None:  # nothing to pool from a NULL payload
                    continue
                n = len(b)
                if n == 0:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                cell = (np.arange(n, dtype=np.int64) * buckets) // n
                sums = np.bincount(cell, weights=arr, minlength=buckets).astype(np.int64)
                cnts = np.bincount(cell, minlength=buckets).astype(np.int64)
                keep = cnts > 0
                ids.extend([doc_id] * int(keep.sum()))
                poss.extend(np.nonzero(keep)[0].tolist())
                vals.extend((sums[keep] // cnts[keep]).tolist())
            yield pd.DataFrame({"doc_id": ids, "pos": poss, "pooled": vals})

    return df.select(id_col, "payload").mapInPandas(
        pool, "doc_id long, pos int, pooled long"
    )


DEFAULT_FAKE_EXTRACTORS: dict[str, Codec] = {
    "image/png": lambda b: sum(b[:4]) if len(b) >= 4 else -1,
    "audio/wav": lambda b: len(b) // 256,
    "video/mp4": lambda b: 1 + (len(b) - 1) // 64 if len(b) else 0,
}


def route_modalities(
    df: DataFrame,
    id_col: str = "doc_id",
    extractors: dict[str, Codec] | None = None,
) -> DataFrame:
    """Modality router: ONE mapInPandas pass dispatches each payload
    to its modality's feature extractor by mime type — the fan-in
    shape a mixed-media corpus pipeline needs (images, audio, video
    interleaved in the same table; per-modality jobs would re-scan
    the table once per modality). Per batch the rows are grouped by
    mime and each group runs vectorized — no per-row branching.

    Default extractors are the deterministic fakes (codecs absent
    here; see decode_media): image → sum of the 4 header bytes,
    audio → 256-byte frame count, video → count of 64-byte-strided
    sample frames. A deployment with real codecs passes its own
    `extractors` dict (mime → payload → int) — the codec-injection
    seam; nothing else changes.
    """
    table = dict(extractors) if extractors is not None else dict(DEFAULT_FAKE_EXTRACTORS)

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_mime, out_bytes, out_feat = [], [], [], []
            for mime, grp in pdf.groupby("mime", sort=False):
                fn = table[mime]
                out_id.extend(grp[id_col])
                out_mime.extend(grp["mime"])
                out_bytes.extend(
                    None if b is None else len(b) for b in grp["payload"]
                )
                out_feat.extend(
                    None if b is None else fn(b) for b in grp["payload"]
                )
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "mime": out_mime,
                    "n_bytes": out_bytes,
                    "feature": out_feat,
                }
            )

    return df.select(id_col, "mime", "payload").mapInPandas(
        route, "doc_id long, mime string, n_bytes long, feature long"
    )


class DecodedWav:
    """A decoded PCM waveform: `channels[c][i]` = sample i of channel c
    as a signed int (the parser de-interleaves the frame-major storage
    and applies two's-complement sign)."""

    __slots__ = ("sample_rate", "n_channels", "n_frames", "channels")

    def __init__(
        self, sample_rate: int, n_channels: int, n_frames: int, channels: list
    ) -> None:
        self.sample_rate = sample_rate
        self.n_channels = n_channels
        self.n_frames = n_frames
        self.channels = channels

    def __len__(self) -> int:  # decode_features' default feature
        return self.n_frames


def wav_encode(channels: list, sample_rate: int = 8000) -> bytes:
    """Encode `channels[c][i]` (signed 16-bit samples) as a real RIFF
    WAV: 'RIFF'/'WAVE' container, a 'fmt ' chunk (PCM, little-endian),
    a deliberately-planted 'LIST' metadata chunk BEFORE 'data' (real
    encoders emit these; a decoder that assumes data at a fixed offset
    breaks), then frame-major interleaved samples. Pure stdlib
    `struct` — the encoder half of the audio/wav codec seam proof."""
    import struct

    n_channels = len(channels)
    n_frames = len(channels[0]) if n_channels else 0
    for ch in channels:
        if len(ch) != n_frames:
            raise ValueError("wav_encode: ragged channels")
    block_align = n_channels * 2
    byte_rate = sample_rate * block_align
    frames = bytearray()
    for i in range(n_frames):
        for ch in channels:
            frames += struct.pack("<h", ch[i])
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        block_align, 16,
    )
    lst = struct.pack("<4sI", b"LIST", 12) + b"INFOISFT" + struct.pack("<I", 0)
    data = struct.pack("<4sI", b"data", len(frames)) + bytes(frames)
    body = b"WAVE" + fmt + lst + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def wav_codec(payload: bytes) -> DecodedWav:
    """REAL `audio/wav` decoder in pure stdlib `struct` — the second
    mime (after image/bmp) whose decode runs on actual bytes through
    the codec seam. Walks the RIFF chunk list (skipping LIST/fact/etc.
    with odd-size word padding), requires PCM 16-bit, and
    de-interleaves frame-major samples into per-channel arrays with
    two's-complement sign. Anything non-PCM/non-16-bit refuses
    loudly."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav_codec: not a RIFF/WAVE file")
    pos, end = 12, len(payload)
    fmt_seen = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if size > end - pos:
            raise ValueError(
                f"wav_codec: chunk {cid!r} declares {size} bytes but only"
                f" {end - pos} remain (truncated payload)"
            )
        if cid == b"fmt ":
            # the PCM fmt chunk body is 16 bytes; a declared size < 16
            # (e.g. a malformed size-8 fmt as the last chunk) would pass
            # the remaining-payload check above yet make the unpacks
            # below read past the chunk — struct.error escapes the
            # except-ValueError quarantine the codec contract promises
            # (round-8 ADVICE fix: refuse with the typed error instead)
            if size < 16:
                raise ValueError(
                    f"wav_codec: fmt chunk declares {size} bytes;"
                    " PCM fmt requires 16 (malformed)"
                )
            audio_fmt, n_channels, sample_rate = struct.unpack_from(
                "<HHI", payload, pos
            )
            (bits,) = struct.unpack_from("<H", payload, pos + 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"wav_codec: unsupported WAV (fmt={audio_fmt} bits={bits});"
                    " only 16-bit PCM is implemented"
                )
            if n_channels < 1:
                raise ValueError(
                    "wav_codec: fmt chunk declares 0 channels (malformed)"
                )
            fmt_seen = (n_channels, sample_rate)
        elif cid == b"data":
            data = payload[pos : pos + size]
        pos += size + (size & 1)  # RIFF chunks are word-aligned
    if fmt_seen is None or data is None:
        raise ValueError("wav_codec: missing fmt or data chunk")
    n_channels, sample_rate = fmt_seen
    n_frames = len(data) // (2 * n_channels)
    flat = struct.unpack(f"<{n_frames * n_channels}h", data[: n_frames * n_channels * 2])
    channels = [list(flat[c::n_channels]) for c in range(n_channels)]
    return DecodedWav(sample_rate, n_channels, n_frames, channels)


class DecodedPgm:
    """A decoded grayscale image: `pixels[y][x]` = intensity int,
    y=0 the TOP row (PGM stores top-down natively)."""

    __slots__ = ("width", "height", "maxval", "pixels")

    def __init__(self, width: int, height: int, maxval: int, pixels: list) -> None:
        self.width, self.height, self.maxval = width, height, maxval
        self.pixels = pixels

    def __len__(self) -> int:  # decode_features' default feature
        return self.width * self.height


def pgm_encode(pixels: list, maxval: int = 255, comment: str | None = "spark-graft") -> bytes:
    """Encode `pixels[y][x]` as a real binary PGM (P5): ASCII header
    `P5 <comment> W H MAXVAL`, then the raster — 1 byte/sample for
    maxval <= 255, 2 bytes big-endian otherwise (the netpbm spec's
    wide-sample rule). A `#` comment line is planted inside the header
    by default because real tools (GIMP, ImageMagick) emit them and a
    decoder that assumes `P5\\nW H\\nMAX\\n` verbatim breaks on it."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    for row in pixels:
        if len(row) != width:
            raise ValueError("pgm_encode: ragged rows")
    if not 0 < maxval < 65536:
        raise ValueError("pgm_encode: maxval must be in [1, 65535]")
    for row in pixels:
        for v in row:
            if not 0 <= v <= maxval:
                raise ValueError(
                    f"pgm_encode: sample {v} outside [0, {maxval}] — a"
                    " value in (maxval, 255] would encode but produce a"
                    " payload pgm_codec itself rejects, and >255 would"
                    " surface as a bare bytes() error with no context"
                )
    head = b"P5\n"
    if comment is not None:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n{maxval}\n".encode()
    if maxval <= 255:
        raster = bytes(v for row in pixels for v in row)
    else:
        raster = b"".join(
            v.to_bytes(2, "big") for row in pixels for v in row
        )
    return head + raster


def pgm_codec(payload: bytes) -> DecodedPgm:
    """REAL `image/x-portable-graymap` decoder in pure stdlib — the
    third mime (after image/bmp, audio/wav) decoding actual bytes
    through the codec seam. Handles the format's traps: `#` comment
    lines anywhere in the header, arbitrary whitespace between header
    tokens, and the 2-byte big-endian raster for maxval > 255.
    Anything non-P5 or truncated refuses loudly (the corrupted-payload
    contract: never silently shrink the image)."""
    if payload[:2] != b"P5":
        raise ValueError("pgm_codec: not a binary PGM (missing 'P5' magic)")
    # header token scan: 3 ints (W H MAXVAL) separated by whitespace,
    # with '#'-to-newline comments transparent
    pos, end = 2, len(payload)
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < end and payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl == -1:
                raise ValueError("pgm_codec: unterminated header comment")
            pos = nl + 1
            continue
        start = pos
        while pos < end and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("pgm_codec: truncated header")
        tok = payload[start:pos]
        if not tok.isdigit():
            raise ValueError(f"pgm_codec: non-numeric header token {tok!r}")
        tokens.append(int(tok))
    width, height, maxval = tokens
    if width < 1 or height < 1 or not 0 < maxval < 65536:
        raise ValueError(
            f"pgm_codec: invalid dimensions/maxval ({width}x{height}, max {maxval})"
        )
    pos += 1  # exactly ONE whitespace byte after maxval (netpbm spec)
    bytes_per = 1 if maxval <= 255 else 2
    need = width * height * bytes_per
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(
            f"pgm_codec: raster declares {need} bytes but only"
            f" {len(raster)} remain (truncated payload)"
        )
    if bytes_per == 1:
        flat = list(raster)
    else:
        flat = [
            (raster[i] << 8) | raster[i + 1] for i in range(0, need, 2)
        ]
    bad = next((v for v in flat if v > maxval), None)
    if bad is not None:
        raise ValueError(
            f"pgm_codec: sample {bad} exceeds declared maxval {maxval}"
        )
    pixels = [flat[y * width : (y + 1) * width] for y in range(height)]
    return DecodedPgm(width, height, maxval, pixels)


class DecodedPpm:
    """A decoded RGB image: `pixels[y][x]` = (r, g, b) int tuple,
    y=0 the TOP row (netpbm stores top-down, samples interleaved
    R,G,B per pixel)."""

    __slots__ = ("width", "height", "maxval", "pixels")

    def __init__(self, width: int, height: int, maxval: int, pixels: list) -> None:
        self.width, self.height, self.maxval = width, height, maxval
        self.pixels = pixels

    def __len__(self) -> int:  # decode_features' default feature
        return self.width * self.height


def ppm_encode(pixels: list, maxval: int = 255, comment: str | None = "spark-graft") -> bytes:
    """Encode `pixels[y][x] = (r, g, b)` as a real binary PPM (P6):
    ASCII header `P6 <comment> W H MAXVAL`, then the interleaved RGB
    raster — 1 byte/sample for maxval <= 255, 2 bytes big-endian
    otherwise (the netpbm wide-sample rule, same as PGM). Every
    sample is validated against maxval up front (the pgm_encode
    round-8 contract: never emit a payload our own codec rejects)."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    for row in pixels:
        if len(row) != width:
            raise ValueError("ppm_encode: ragged rows")
        for px in row:
            if len(px) != 3:
                raise ValueError("ppm_encode: pixels must be (r, g, b)")
            for v in px:
                if not 0 <= v <= maxval:
                    raise ValueError(
                        f"ppm_encode: sample {v} outside [0, {maxval}]"
                    )
    if not 0 < maxval < 65536:
        raise ValueError("ppm_encode: maxval must be in [1, 65535]")
    head = b"P6\n"
    if comment is not None:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n{maxval}\n".encode()
    flat = (v for row in pixels for px in row for v in px)
    if maxval <= 255:
        raster = bytes(flat)
    else:
        raster = b"".join(v.to_bytes(2, "big") for v in flat)
    return head + raster


def ppm_codec(payload: bytes) -> DecodedPpm:
    """REAL `image/x-portable-pixmap` decoder in pure stdlib — the
    FOURTH mime (after image/bmp, audio/wav, image/x-portable-graymap)
    decoding actual bytes through the codec seam, and the first COLOR
    one: 3 interleaved samples per pixel, so a stride bug that PGM's
    single channel can't expose (e.g. reading W*H samples instead of
    3*W*H, or de-interleaving in BGR order) fails its oracle here.
    Shares PGM's header traps: `#` comments anywhere in the header,
    arbitrary token whitespace, 2-byte big-endian samples for
    maxval > 255. Refuses loudly on anything non-P6 or truncated."""
    if payload[:2] != b"P6":
        raise ValueError("ppm_codec: not a binary PPM (missing 'P6' magic)")
    pos, end = 2, len(payload)
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < end and payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl == -1:
                raise ValueError("ppm_codec: unterminated header comment")
            pos = nl + 1
            continue
        start = pos
        while pos < end and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("ppm_codec: truncated header")
        tok = payload[start:pos]
        if not tok.isdigit():
            raise ValueError(f"ppm_codec: non-numeric header token {tok!r}")
        tokens.append(int(tok))
    width, height, maxval = tokens
    if width < 1 or height < 1 or not 0 < maxval < 65536:
        raise ValueError(
            f"ppm_codec: invalid dimensions/maxval ({width}x{height}, max {maxval})"
        )
    pos += 1  # exactly ONE whitespace byte after maxval (netpbm spec)
    bytes_per = 1 if maxval <= 255 else 2
    need = width * height * 3 * bytes_per
    # declared-size sanity BEFORE slicing: a forged header near the
    # int boundary (e.g. 65535x65535) must refuse on arithmetic, not
    # attempt a multi-GB slice (round-8 quarantine class)
    if need > end:
        raise ValueError(
            f"ppm_codec: raster declares {need} bytes but only"
            f" {end - pos} remain (truncated or oversized declaration)"
        )
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(
            f"ppm_codec: raster declares {need} bytes but only"
            f" {len(raster)} remain (truncated payload)"
        )
    if bytes_per == 1:
        flat = list(raster)
    else:
        flat = [
            (raster[i] << 8) | raster[i + 1] for i in range(0, need, 2)
        ]
    bad = next((v for v in flat if v > maxval), None)
    if bad is not None:
        raise ValueError(
            f"ppm_codec: sample {bad} exceeds declared maxval {maxval}"
        )
    pixels = [
        [
            tuple(flat[(y * width + x) * 3 : (y * width + x) * 3 + 3])
            for x in range(width)
        ]
        for y in range(height)
    ]
    return DecodedPpm(width, height, maxval, pixels)
