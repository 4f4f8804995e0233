"""Image codecs and pixel metrics — pure stdlib + numpy, executor-safe.

The container ships no imaging library (no PIL/opencv/libjpeg), so:

* ``png``  — a REAL minimal PNG codec (RGB8, zlib, filter types 0-4 on
  decode, filter 0 on encode).  Output is readable by any PNG reader.
* ``jpeg`` — TWO paths: a REAL baseline T.81/JFIF codec in pure numpy
  (`graft/jpeg.py` — genuine bitstreams, readable by any JPEG decoder) for
  any stream starting with the SOI marker, and a DETERMINISTIC STAND-IN
  (uniform quantization step ``LOSSY_STEP`` + zlib, magic ``QJPG``) that
  remains the synthetic-data default for bench continuity.  Both preserve
  the property the pipeline verifies (decode(encode(x)) ≈ x with
  PSNR ≥ 40 dB, see BASELINE.json input_hint).
* ``webp`` — TWO paths as well: a REAL lossless VP8L codec in pure
  numpy (`graft/vp8l.py` — genuine RIFF/WEBP bitstreams, readable by any
  WebP decoder) for streams with the VP8L chunk, and the deterministic
  stand-in (magic ``QWBP``) as the synthetic-data default.  Lossy VP8
  streams remain out of scope (PIL path gated behind an import-try).

The Spark-side plumbing (binary column, Arrow-batched decode UDF, PSNR
validation, dimension checks) is real and tested; for JPEG the bitstream
path is real as well.

Reference parity: the decode/dimension/PSNR checks play the role of the
reference's DICOM pixel & metadata validation
(`/root/reference/mipqctool/model/mri/mrisequence.py:122-156`).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real codecs if ever available; the sandbox has none
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

LOSSY_STEP = 4  # quantization step → MSE≈step²/12 → PSNR≈46.9 dB (≥40 target)
JPEG_QUALITY = 98  # real-codec quality: ≥43 dB round-trip even on pure noise
LOSSY_FORMATS = ("jpeg", "webp")
ALL_FORMATS = ("png", "jpeg", "webp")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG (real, RGB8 only)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a standard PNG (filter 0)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Vectorized per scanline."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need a left-to-right scan
            res = np.zeros(stride, np.int64)
            for x in range(stride):
                a = res[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    res[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    res[x] = (line[x] + (a + b) // 2) & 0xFF
                else:  # 4 Paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    res[x] = (line[x] + pred) & 0xFF
        out[y] = res.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG to an (h, w, 3) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bitdepth = ctype = 0
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, ctype = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if bitdepth != 8 or ctype != 2:
        raise ValueError(f"unsupported PNG (bitdepth={bitdepth}, colortype={ctype})")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * 3
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Deterministic lossy stand-in ("jpeg"/"webp" stubs)
# ---------------------------------------------------------------------------

_LOSSY_MAGIC = {"jpeg": b"QJPG", "webp": b"QWBP"}


def lossy_encode(rgb: np.ndarray, fmt: str) -> bytes:
    """STUB lossy codec: uniform quantization (step LOSSY_STEP) + zlib.

    Deterministic, PSNR ≈ 46.9 dB vs the source — stands in for real
    JPEG/WebP until an imaging library is available (``HAVE_PIL``).
    """
    h, w, _ = rgb.shape
    q = (rgb.astype(np.int32) // LOSSY_STEP * LOSSY_STEP + LOSSY_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    header = _LOSSY_MAGIC[fmt] + struct.pack(">IIB", w, h, LOSSY_STEP)
    return header + zlib.compress(q.tobytes(), 6)


def lossy_roundtrip(rgb: np.ndarray) -> np.ndarray:
    """decode(encode(x)) for the STUB lossy codec without the zlib pass:
    zlib is lossless, so the round-trip equals the quantization step alone —
    ~2× cheaper PSNR validation.  Only valid for the stub; with a real codec
    (HAVE_PIL) callers must do the full encode/decode."""
    return (
        (rgb.astype(np.int32) // LOSSY_STEP * LOSSY_STEP + LOSSY_STEP // 2)
        .clip(0, 255)
        .astype(np.uint8)
    )


def lossy_decode(data: bytes, fmt: str) -> np.ndarray:
    magic = _LOSSY_MAGIC[fmt]
    if data[:4] != magic:
        raise ValueError(f"not a {fmt} (stub) stream")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    raw = np.frombuffer(zlib.decompress(data[13:]), np.uint8)
    return raw.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Unified encode/decode + metrics
# ---------------------------------------------------------------------------

def pil_decode(data: bytes) -> np.ndarray:  # pragma: no cover — no PIL here
    """Decode a REAL image bitstream (JPEG/WebP/PNG...) via PIL to an
    (h, w, 3) uint8 RGB array.  Only reachable when ``HAVE_PIL``."""
    from io import BytesIO

    return np.asarray(Image.open(BytesIO(data)).convert("RGB"))


def pil_roundtrip(rgb: np.ndarray, fmt: str, quality: int = 95) -> np.ndarray:  # pragma: no cover
    """Real-codec encode+decode round trip via PIL (the honest PSNR check
    the stub's ``lossy_roundtrip`` stands in for)."""
    from io import BytesIO

    buf = BytesIO()
    Image.fromarray(rgb).save(buf, format=fmt.upper(), quality=quality)
    return pil_decode(buf.getvalue())


def encode(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(rgb)
    if fmt in LOSSY_FORMATS:
        return lossy_encode(rgb, fmt)
    raise ValueError(f"unknown format {fmt!r}")


def is_lossless_webp(head: bytes) -> bool:
    """True for a RIFF/WEBP container whose first chunk is VP8L (lossless).
    Callers pass the first 16 bytes; lossy VP8 / extended VP8X return
    False and take the real-round-trip PSNR path."""
    from dataqualitycontroltool_spark.graft import vp8l

    return vp8l.is_vp8l(head)


def webp_encode(
    rgb: np.ndarray, cache_bits: int = 6, predictor_bits: int = 0,
    palette: bool | str = "auto",
) -> bytes:
    """Encode a REAL lossless WebP (RIFF/VP8L) bitstream (pure numpy).

    ``predictor_bits`` (opt-in) enables the PREDICTOR transform: ~25%
    smaller and faster to ENCODE on natural images, but its inverse is a
    sequential per-pixel Python loop on DECODE — the pipeline's hot path
    is decode (the pandas-UDF validation pass), so the default stays on
    the fully-vectorized literal+run coding; turn the predictor on for
    storage-bound flows where files are written once and decoded rarely.

    ``palette="auto"`` (default, libwebp's behavior) switches to the
    COLOR_INDEXING transform whenever the image fits a 256-color table —
    decisively smaller on few-color images AND faster to decode (bundled
    indices invert as one vectorized table lookup); true-color images
    (every image in the synthetic bench corpus) are unaffected, keeping
    prior-round bitstreams byte-identical."""
    from dataqualitycontroltool_spark.graft import vp8l

    if palette == "auto":
        # pack RGB into one uint32 so the distinct-color probe is a 1-D
        # np.unique (~70x faster than axis=0 row dedup — the probe runs on
        # EVERY encode, palette-eligible or not)
        packed = rgb.astype(np.uint32)
        packed = (packed[..., 0] << 16) | (packed[..., 1] << 8) | packed[..., 2]
        palette = not predictor_bits and len(np.unique(packed)) <= 256
    if palette:
        # pass predictor_bits through so vp8l.encode rejects the
        # contradictory explicit palette=True + predictor combination
        # instead of silently dropping the predictor request
        return vp8l.encode(
            rgb, cache_bits=cache_bits, palette=True, predictor_bits=predictor_bits
        )
    return vp8l.encode(rgb, cache_bits=cache_bits, predictor_bits=predictor_bits)


def webp_roundtrip(rgb: np.ndarray) -> np.ndarray:
    """decode(encode(x)) through the REAL VP8L codec — exact identity
    (lossless), pinned by tests/test_vp8l.py."""
    from dataqualitycontroltool_spark.graft import vp8l

    return vp8l.decode(vp8l.encode(rgb))


def jpeg_encode(rgb: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    """Encode a REAL baseline T.81/JFIF JPEG bitstream (pure numpy)."""
    from dataqualitycontroltool_spark.graft import jpeg

    return jpeg.encode(rgb, quality)


def jpeg_roundtrip(rgb: np.ndarray, quality: int = JPEG_QUALITY) -> np.ndarray:
    """decode(encode(x)) through the REAL JPEG codec — the honest lossy
    fidelity loop for genuine JFIF bitstreams.  Computed in the transform
    domain (entropy coding is lossless, so the round-trip image is fully
    determined before Huffman): bit-identical to the full bitstream loop —
    pinned in tests/test_jpeg.py::test_quant_roundtrip_equals_bitstream."""
    from dataqualitycontroltool_spark.graft import jpeg

    return jpeg.quant_roundtrip(rgb, quality)


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode a bitstream: the real PNG codec for png; for the lossy
    formats, the stub stream when its magic matches; a genuine JFIF stream
    (SOI marker) via the built-in T.81 decoder, falling back to PIL for
    shapes it scopes out (progressive/subsampled); real WebP needs PIL
    (explicit error without it, never silent garbage)."""
    if fmt == "png":
        return png_decode(data)
    if fmt in LOSSY_FORMATS:
        if data[:4] == _LOSSY_MAGIC[fmt]:
            return lossy_decode(data, fmt)
        if fmt == "jpeg" and data[:2] == b"\xff\xd8":
            from dataqualitycontroltool_spark.graft import jpeg

            try:
                return jpeg.decode(data)
            except Exception as exc:
                # malformed headers can surface as struct.error/IndexError/
                # KeyError from the parser; the fallback and the documented
                # error contract must cover them all, not just ValueError
                if HAVE_PIL:
                    return pil_decode(data)  # pragma: no cover — no PIL here
                if isinstance(exc, ValueError):
                    raise
                raise ValueError(f"malformed JPEG stream: {exc}") from exc
        if fmt == "webp" and data[:4] == b"RIFF":
            from dataqualitycontroltool_spark.graft import vp8l

            if vp8l.is_vp8l(bytes(data[:16])):
                try:
                    return vp8l.decode(bytes(data))
                except Exception as exc:
                    # the built-in decoder covers the full lossless
                    # feature set libwebp emits (all four transforms,
                    # meta prefix codes, color cache), so this fallback
                    # only fires for genuinely malformed streams
                    if HAVE_PIL:
                        return pil_decode(data)  # pragma: no cover — no PIL
                    if isinstance(exc, ValueError):
                        raise
                    raise ValueError(f"malformed VP8L stream: {exc}") from exc
            # RIFF but not VP8L: lossy VP8 / extended VP8X need PIL
        if HAVE_PIL:
            return pil_decode(data)  # pragma: no cover — no PIL here
        raise ValueError(f"real {fmt} bitstream but no codec library (PIL)")
    raise ValueError(f"unknown format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean grayscale thresholded on its
    mean (aHash). Signed int64 so it fits the table's ``phash:int64``."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # average-pool to 8x8 (crop to a multiple of 8 first)
    h8, w8 = (h // 8) * 8, (w // 8) * 8
    g = gray[:h8, :w8].reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).reshape(64)
    val = np.uint64(0)
    for i in range(64):
        val = (val << np.uint64(1)) | bits[i]
    return int(np.int64(val))
