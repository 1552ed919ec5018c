"""Multimodal (binary) column operators.

Image/audio/video payloads are opaque ``BinaryType`` columns with a
typed metadata struct (schemas.ASSET). The Spark-side plumbing -
schema, partitioning, Arrow batch shape, UDF signatures - is real and
tested. Codecs come in two tiers:

- ``decode_media``: REAL decode for what a stdlib-only environment
  can handle - PNG (chunk walk + inflate + scanline unfilter + pixel
  mean) and WAV/PCM (channels, rate, duration, RMS) in full, plus
  JPEG HEADER-ONLY (SOF segment walk: dimensions, channels,
  progressive-ness; pixel fields stay NULL - the honest
  pixels-not-decoded signal). All differentially tested against
  independent encoders written from the format specs.
- ``decode_assets``: the deterministic stub for everything a codec
  LIBRARY would be needed for (JPEG pixels, MP4, ...; none are
  installed in this environment); its fake fields are
  SQL-recomputable so the full binary pipeline stays
  oracle-checkable.

Extends the reference's raw-bytes landing (reference:
data-downloader/data_downloader.py:69-70 stores fetched bytes with no
metadata at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id string, modality string, width int, height int, n_bytes long, checksum string"
)


def text_to_assets(df: DataFrame, id_col: str, text_col: str, modality: str = "blob") -> DataFrame:
    """Wrap a string column as a binary asset (utf-8 bytes) with hash +
    size metadata - the fixture path for exercising binary plumbing."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("content"),
        F.sha2(payload, 256).alias("content_hash"),
        F.octet_length(payload).cast("long").alias("size_bytes"),
    )


def decode_assets(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary assets to (dimensions, checksum) features via
    mapInPandas - Arrow-batched, one pandas frame per partition chunk.

    Real decode requires an image/audio codec library (not present in
    this environment) -> NotImplementedError. ``fake=True`` derives
    deterministic pseudo-dimensions so tests can validate the batch
    shape, schema, and partition behavior. The fake fields are chosen
    to be recomputable by an independent SQL engine from the same
    payload (byte length, two arithmetic functions of it, sha256 hex)
    so the whole decode pipeline is differentially checkable even
    though the codec is a stub (plans/tail.py multimodal_decode).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "binary codec libraries are not available in this environment; "
                    "pass fake=True for the deterministic stub decode"
                )
            # column-at-a-time over the Arrow batch (the shape a real
            # codec binding should keep: hand the whole batch to the
            # vectorized decoder, never per-row Python)
            payloads = pdf["content"].map(bytes)
            n_bytes = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "width": (n_bytes % 4096).astype("int32"),
                    "height": ((n_bytes * 2654435761) % 4096).astype("int32"),
                    "n_bytes": n_bytes,
                    "checksum": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(_decode, schema=DECODED_SCHEMA)


MEDIA_SCHEMA = (
    "asset_id string, modality_detected string, width int, height int, "
    "n_channels int, sample_rate int, duration_s double, mean_value double, "
    "n_bytes long, checksum string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# JPEG SOF (start-of-frame) markers that carry the dimension header:
# baseline (C0), extended sequential (C1), progressive (C2), lossless
# (C3), plus the differential/arithmetic variants - everything in
# C0-CF EXCEPT C4 (DHT), C8 (JPG extension) and CC (DAC), per
# ITU-T T.81 table B.1.
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _decode_jpeg_header(b: bytes) -> dict | None:
    """HEADER-ONLY JPEG decode: a pure-stdlib segment walk to the SOF
    marker (ITU-T T.81 B.2.2) for dimensions, channel count and
    progressive-ness. Returns None if not a JPEG (no FFD8 SOI).

    This is deliberately the METADATA tier: width/height/channels are
    what a corpus pipeline gates on (aspect filters, thumbnail
    routing, decode-cost estimation), and they live in a plain
    length-prefixed segment list - no Huffman tables, no IDCT. Pixel
    decode (``mean_value``) genuinely needs a codec library and stays
    NULL here: a NULL mean_value on an ``image/jpeg`` row IS the
    honest pixels_decoded=false signal (the docstring contract
    ``decode_media`` states). A malformed segment list (truncated
    length, missing SOF before SOS/EOF) raises ValueError so the
    caller's quarantine path stamps ``corrupt/jpeg``."""
    if len(b) < 2 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    pos = 2
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG: no SOF before EOF")
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # fill bytes: any number of FFs may pad before a marker
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1
        if pos >= len(b):
            raise ValueError("truncated JPEG: trailing fill bytes")
        marker = b[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # stand-alone markers: SOI, TEM, RSTn
        if marker == 0xD9:  # EOI before any SOF
            raise ValueError("JPEG ended with no frame header")
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment length")
        seg_len = int.from_bytes(b[pos : pos + 2], "big")
        if seg_len < 2 or pos + seg_len > len(b):
            raise ValueError("truncated JPEG segment")
        if marker in _JPEG_SOF:
            seg = b[pos + 2 : pos + seg_len]
            if len(seg) < 6:
                raise ValueError("short SOF segment")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            n_components = seg[5]
            return {
                "modality_detected": (
                    # all four progressive-DCT SOF variants (T.81
                    # table B.1): plain/differential x Huffman/
                    # arithmetic
                    "image/jpeg;progressive"
                    if marker in (0xC2, 0xC6, 0xCA, 0xCE)
                    else "image/jpeg"
                ),
                "width": width,
                "height": height,
                "n_channels": int(n_components),
            }
        if marker == 0xDA:  # SOS with no prior SOF: not a valid frame
            raise ValueError("JPEG SOS before SOF")
        pos += seg_len


def _png_unfilter(raw: bytes, w: int, h: int, channels: int):
    """Reverse PNG scanline filtering (types 0-4, 8-bit samples) into
    an (h, w*channels) uint8 array. Pure stdlib+numpy; the sequential
    sub/avg/paeth paths run per byte, which is fine for asset-sized
    images - a production deployment swaps in a vectorized codec
    binding behind the same batch interface."""
    import numpy as np

    stride = w * channels
    bpp = channels
    px = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for row in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:
            cur = line + prev  # uint8 wraps mod 256, per spec
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        px[row] = cur
        prev = cur
    return px


def _decode_png(b: bytes) -> dict | None:
    """Minimal real PNG decode from first principles (stdlib struct +
    zlib): chunk walk -> IHDR dimensions, IDAT inflate, scanline
    unfilter, channel-mean pixel value. Returns None if not a PNG;
    non-8-bit/interlaced/paletted images decode dimensions only."""
    import struct
    import zlib

    if not b.startswith(_PNG_SIG):
        return None
    pos = 8
    idat = b""
    hdr = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        return None
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    channels = _PNG_CHANNELS.get(ctype)
    out = {
        "modality_detected": "image/png",
        "width": int(w),
        "height": int(h),
        "n_channels": channels,
    }
    if depth == 8 and interlace == 0 and ctype in (0, 2, 4, 6) and idat:
        px = _png_unfilter(zlib.decompress(idat), w, h, channels)
        out["mean_value"] = float(px.mean())
    return out


def _decode_wav(b: bytes) -> dict | None:
    """Real WAV/PCM decode via the stdlib ``wave`` module: channel
    count, sample rate, duration, and RMS amplitude (16-bit PCM) -
    the audio features a corpus pipeline gates on (silence, clipping,
    truncation)."""
    import io
    import wave

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as f:
            nch = f.getnchannels()
            rate = f.getframerate()
            nframes = f.getnframes()
            width = f.getsampwidth()
            frames = f.readframes(nframes)
    except (wave.Error, EOFError):
        # The RIFF/WAVE magic matched, so this IS a wav payload - a
        # mid-chunk truncation must surface as the quarantine signal
        # ('corrupt/%'), not pass as binary/unknown.
        return {"modality_detected": "corrupt/wav"}
    out = {
        "modality_detected": "audio/wav",
        "n_channels": int(nch),
        "sample_rate": int(rate),
        "duration_s": (nframes / rate) if rate else None,
    }
    if width == 2 and frames:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        out["mean_value"] = float(np.sqrt(np.mean(x * x)))  # RMS
    return out


def decode_media(assets: DataFrame) -> DataFrame:
    """REAL media decode for the formats a stdlib-only environment can
    handle - PNG (struct+zlib chunk walk, inflate, scanline unfilter,
    pixel mean) and WAV/PCM (wave module: channels, rate, duration,
    RMS) - dispatched on magic bytes per asset - plus JPEG
    HEADER-ONLY (SOF segment walk, ITU-T T.81: width/height/channels
    and the baseline-vs-progressive distinction; ``mean_value`` stays
    NULL because pixel decode genuinely needs Huffman+IDCT - a NULL
    mean_value on an image/jpeg row IS pixels_decoded=false).
    Anything else passes through with byte length + checksum and NULL
    media fields.

    This replaces the ``fake=True`` stub for these two formats: the
    emitted width/height/pixel-mean/RMS are decoded from the actual
    payload bytes, differentially tested against an independent
    encoder (tests/test_operators.py writes PNGs/WAVs from known
    pixels/samples from first principles). Formats beyond PNG/WAV
    (JPEG, MP4, ...) still require a codec library and stay behind
    the documented stub. Arrow-batched mapInPandas; the per-asset
    Python codec is the honest cost of decoding in this environment -
    swap in a vectorized binding (pillow/pyav) behind the same batch
    interface in production.

    Robustness contract: a malformed payload NEVER fails the job. A
    truncated IDAT, short header, bad filter byte, or mid-chunk WAV
    truncation downgrades that one asset to modality
    'corrupt/<detected>' with bytes+checksum intact (the quarantine
    signal a lake audit filters on); a NULL payload yields NULL
    n_bytes/checksum. One corrupt asset in a billion must not kill
    the scan."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cols = [
            "asset_id", "modality_detected", "width", "height",
            "n_channels", "sample_rate", "duration_s", "mean_value",
            "n_bytes", "checksum",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {
                    "asset_id": r.asset_id,
                    "modality_detected": "binary/unknown",
                    "width": None,
                    "height": None,
                    "n_channels": None,
                    "sample_rate": None,
                    "duration_s": None,
                    "mean_value": None,
                    "n_bytes": None,
                    "checksum": None,
                }
                if r.content is None:
                    rec["modality_detected"] = "binary/null"
                    rows.append(rec)
                    continue
                b = bytes(r.content)
                rec["n_bytes"] = len(b)
                rec["checksum"] = hashlib.sha256(b).hexdigest()
                try:
                    dec = (
                        _decode_png(b)
                        or _decode_wav(b)
                        or _decode_jpeg_header(b)
                    )
                except Exception:
                    kind = (
                        "png" if b.startswith(_PNG_SIG) else
                        "wav" if b[:4] == b"RIFF" else
                        "jpeg" if b[:2] == b"\xff\xd8" else "unknown"
                    )
                    dec = {"modality_detected": f"corrupt/{kind}"}
                if dec:
                    rec.update(dec)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return assets.select("asset_id", "content").mapInPandas(
        _decode, schema=MEDIA_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explode per-asset frame indices
    (real decoder would emit frames; the stub emits indices). Shows the
    1->N explode shape with bounded memory per batch."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.least(F.col("size_bytes") / 100, F.lit(50)).cast("int"), F.lit(every_n))
        ).alias("frame_idx"),
    )
