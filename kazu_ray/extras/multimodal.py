"""Multimodal span handling: media spans as opaque references/binary with
typed metadata, processed by actor-pool decode/feature stages.

The interleaved input schema carries media spans (kind in
{"image","table",...}, empty text, non-empty media_ref) through the KG
pipeline untouched (span-sequence invariant).  This module adds the
side paths a multimodal corpus needs, each a ``map_batches`` actor
stage:

- feature extraction (``MediaFeatureExtractor``)
- typed metadata via REAL container-header parsing
  (``parse_image_header``: PNG IHDR / JPEG SOF / GIF descriptor — pure
  stdlib, works on genuine corpus bytes; the synthetic payloads are
  VALID PNGs built by :func:`make_png`, so this path is exercised for
  real, not mocked)
- video frame sampling (``VideoFrameSampler``: every k-th fixed-size
  frame exploded to its own row — the layout/batching contract of a
  decode-bound GPU stage)

Pixel/sample decode is REAL for the pure-python-decodable formats:
:func:`decode_png` (zlib inflate + PNG unfiltering per the spec §9,
8-bit grayscale/RGB), :func:`decode_bmp` (uncompressed 8/24-bit, padded
bottom-up rows), :func:`decode_wav_pcm` (16-bit PCM samples), and —
round 5 — baseline JPEG via :mod:`kazu_ray.extras.jpeg` (full T.81
entropy decode: Huffman + dequant + IDCT + chroma upsample, with the
synthetic corpus JPEGs now genuine encoder output, not filler scan
bytes) — byte-level golden-tested, and :class:`MediaFeatureExtractor`
computes its features from the DECODED pixels/samples for those
formats — plus, closing the round-4 codec seam entirely: GIF via a real
LZW codec (:mod:`kazu_ray.extras.gif`) and video via Motion-JPEG in a
RIFF-AVI container (:mod:`kazu_ray.extras.avi`, frames entropy-decoded
through the JPEG decoder, sampled frames only).  The remaining
``RealDecoder`` seam is now only exotic codecs a cluster would install
(progressive JPEG, H.26x, vorbis).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal VALID grayscale PNG (signature + IHDR + IDAT + IEND,
    correct CRCs, zlib-compressed seeded scanlines) — deterministic
    synthetic payloads the real header parser can decode."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rng = np.random.default_rng(seed)
    raw = b"".join(b"\x00" + rng.bytes(width) for _ in range(height))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def jpeg_source_image(width: int, height: int, seed: int = 0) -> np.ndarray:
    """The seeded smooth grayscale source pattern a synthetic JPEG is
    encoded from — exposed so decode gates can compare decoded pixels
    against the pre-encode ground truth (lossy codec error envelope)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    phase = rng.uniform(0, 2 * np.pi, 2)
    img = (
        128
        + 60 * np.sin(xx / 7.0 + phase[0])
        + 50 * np.cos(yy / 5.0 + phase[1])
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A fully REAL baseline JPEG (round 5): a seeded smooth grayscale
    pattern run through the pure-python encoder
    (kazu_ray.extras.jpeg.encode_jpeg_baseline) — every segment
    including the entropy-coded scan is genuine and decodable."""
    from .jpeg import encode_jpeg_baseline

    return encode_jpeg_baseline(jpeg_source_image(width, height, seed), quality=85)


def make_gif(width: int, height: int, seed: int = 0) -> bytes:
    """A fully REAL GIF89a (round 5): seeded pixel indices over a
    256-entry grayscale palette, compressed with genuine LZW
    (kazu_ray.extras.gif.lzw_encode) — decodable bit-exactly by
    :func:`kazu_ray.extras.gif.decode_gif`."""
    from .gif import make_gif_image

    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    palette = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    return make_gif_image(pixels, palette)


def make_wav(
    sample_rate: int, channels: int, n_samples: int, seed: int = 0
) -> bytes:
    """A minimal VALID PCM WAV (RIFF header + fmt chunk + data chunk,
    16-bit samples) — the audio counterpart of make_png."""
    rng = np.random.default_rng(seed)
    bits = 16
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    payload = rng.bytes(n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal VALID uncompressed 8-bit grayscale BMP (BITMAPFILEHEADER
    + BITMAPINFOHEADER + 256-entry grayscale palette + bottom-up
    4-byte-padded pixel rows) — a fully pure-python-decodable format."""
    rng = np.random.default_rng(seed)
    row_size = (width + 3) & ~3
    pixels = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    rows = b"".join(
        pixels[y].tobytes() + b"\x00" * (row_size - width)
        for y in range(height - 1, -1, -1)  # bottom-up storage
    )
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(rows), 2835, 2835, 256, 0
    )
    header = b"BM" + struct.pack("<IHHI", offset + len(rows), 0, 0, offset)
    return header + info + palette + rows


def decode_bmp(data: bytes) -> np.ndarray | None:
    """REAL uncompressed-BMP pixel decode (pure numpy): returns (h, w)
    uint8 for 8-bit, (h, w, 3) RGB for 24-bit; None if compressed or an
    unsupported depth.  Handles bottom-up and top-down row order and
    the 4-byte row padding of the BMP spec."""
    if data[:2] != b"BM" or len(data) < 54:
        return None
    offset = struct.unpack("<I", data[10:14])[0]
    width, height = struct.unpack("<ii", data[18:26])
    bits = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    if compression != 0 or bits not in (8, 24) or width <= 0:
        return None
    flip = height > 0  # positive height = bottom-up
    height = abs(height)
    row_size = ((bits * width + 31) // 32) * 4
    raw = np.frombuffer(data, np.uint8, count=row_size * height, offset=offset)
    rows = raw.reshape(height, row_size)
    if flip:
        rows = rows[::-1]
    if bits == 8:
        return np.ascontiguousarray(rows[:, :width])
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB


def decode_png(data: bytes) -> np.ndarray | None:
    """REAL PNG pixel decode for 8-bit grayscale / RGB, no interlace:
    chunk walk -> zlib inflate -> per-scanline unfiltering (filters 0-4
    incl. Paeth, PNG spec §9).  None for palette/alpha/16-bit images."""
    if data[:8] != _PNG_SIG:
        return None
    i = 8
    width = height = None
    idat = b""
    channels = 0
    while i + 8 <= len(data):
        (size,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + size]
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2) or interlace != 0:
                return None
            channels = 1 if color == 0 else 3
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + size
    if width is None or not idat:
        return None
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = line[0]
        cur = np.frombuffer(line, np.uint8, count=stride, offset=1).astype(np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left value
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else b if pb_ <= pc_ else c
                else:
                    return None
                rec[x] = (cur[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(height, width) if channels == 1 else out.reshape(
        height, width, 3
    )


def decode_wav_pcm(data: bytes) -> np.ndarray | None:
    """REAL 16-bit PCM sample decode from a RIFF/WAV payload: returns an
    (n_samples, channels) int16 array; None for non-PCM or non-16-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    fmt_code = channels = bits = None
    body = None
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if tag == b"fmt " and size >= 16:
            fmt_code, channels, _rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[i + 8 : i + 24]
            )
        elif tag == b"data":
            body = data[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt_code != 1 or bits != 16 or not channels or body is None:
        return None
    n = len(body) // (2 * channels)
    return np.frombuffer(body, "<i2", count=n * channels).reshape(n, channels)


def decode_media(data: bytes) -> np.ndarray | None:
    """Dispatch to whichever REAL pure-python decoder understands the
    container; None only for containers without a single-array reading
    (multi-frame AVI video goes through :class:`VideoFrameSampler`
    instead) or frame types outside the baseline codecs."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] == b"RIFF":
        return decode_wav_pcm(data)  # None for RIFF-AVI (multi-frame)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_baseline

        try:
            return decode_jpeg_baseline(data)
        except ValueError:
            return None  # progressive/extended frames stay a codec seam
    return None


def parse_audio_header(data: bytes) -> tuple[str, int, int, int] | None:
    """(format, sample_rate, channels, duration_ms) from a real RIFF/WAV
    header — chunk walk over fmt/data, pure stdlib; None for non-WAV."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE" or len(data) < 12:
        return None
    i = 12
    sample_rate = channels = block_align = None
    data_len = None
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if tag == b"fmt " and size >= 16:
            _, channels, sample_rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", data[i + 8 : i + 24]
            )
        elif tag == b"data":
            data_len = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if not sample_rate or not block_align or data_len is None:
        return None
    n_samples = data_len // block_align
    return ("wav", sample_rate, channels, n_samples * 1000 // sample_rate)


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from real container headers — PNG IHDR,
    JPEG SOF0/1/2 markers, GIF logical screen descriptor.  Pure stdlib;
    returns None for unknown formats."""
    if data[:8] == _PNG_SIG and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if data[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return ("bmp", w, abs(h))
    return None


class RealDecoder:
    """Placeholder for a codec-backed fetch+decode (PIL / torchvision /
    ffmpeg) covering formats outside the pure-python codecs (progressive
    JPEG, H.26x video, compressed audio).  Not available in this
    container; PNG/BMP/WAV-PCM/GIF, baseline JPEG AND MJPEG-AVI video
    decode IS real here via :func:`decode_media` /
    :class:`VideoFrameSampler`."""

    def decode(self, media_ref: str) -> bytes:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "use FakeDecoder or install a codec stack on the cluster"
        )


FRAME_BYTES = 64  # fixed synthetic frame size for the video layout


def _media_spec(media_ref: str, kind: str) -> dict:
    """The deterministic synthesis plan for a media ref: seed, format
    and dimensions, derived from the ref hash exactly once so the
    payload generator (:class:`FakeDecoder`) and the ground-truth
    reconstruction (:func:`media_source_truth`) can never diverge."""
    seed = int.from_bytes(
        hashlib.blake2b(media_ref.encode(), digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    if kind == "image":
        w = 16 + int(rng.integers(0, 113))
        h = 16 + int(rng.integers(0, 113))
        fmt = ("png", "jpeg", "gif", "bmp")[seed % 4]
        return {"seed": seed, "fmt": fmt, "w": w, "h": h}
    if kind == "video":
        n_frames = 8 + int(rng.integers(0, 25))
        w = 16 + 8 * int(rng.integers(0, 5))
        h = 16 + 8 * int(rng.integers(0, 5))
        return {"seed": seed, "fmt": "avi", "w": w, "h": h, "n_frames": n_frames}
    if kind == "audio":
        rate = (8000, 16000, 44100)[seed % 3]
        channels = 1 + int(rng.integers(0, 2))
        n_samples = rate // 100 * (1 + int(rng.integers(0, 50)))
        return {
            "seed": seed,
            "fmt": "wav",
            "rate": rate,
            "channels": channels,
            "n_samples": n_samples,
        }
    return {"seed": seed, "fmt": "blob"}


class FakeDecoder:
    """Deterministic media fetch stand-in keyed by (media_ref, kind):
    image refs yield container-valid image bytes rotating over
    PNG / JPEG / GIF / BMP by ref hash (so all four real header-parse
    AND pixel-decode branches are exercised end-to-end, seeded dims
    16-128), video refs a real seeded MJPEG AVI, everything else seeded
    raw bytes."""

    def decode(self, media_ref: str, kind: str = "blob") -> bytes:
        spec = _media_spec(media_ref, kind)
        seed, fmt = spec["seed"], spec["fmt"]
        if fmt in ("png", "jpeg", "gif", "bmp"):
            maker = {
                "png": make_png, "jpeg": make_jpeg,
                "gif": make_gif, "bmp": make_bmp,
            }[fmt]
            return maker(spec["w"], spec["h"], seed=seed)
        if fmt == "avi":
            from .avi import make_avi_mjpeg

            return make_avi_mjpeg(spec["w"], spec["h"], spec["n_frames"], seed=seed)
        if fmt == "wav":
            return make_wav(
                spec["rate"], spec["channels"], spec["n_samples"], seed=seed
            )
        return np.random.default_rng(seed).bytes(256)


def media_source_truth(media_ref: str, kind: str) -> tuple[str, np.ndarray | None]:
    """(format, source array) for a synthetic media ref — the EXACT
    array the payload was encoded from, regenerated from the ref's seed
    independently of any decoder.  Lossless containers (PNG / GIF / BMP
    / WAV-PCM) must decode back to it bit-exactly; lossy codecs
    (baseline JPEG, MJPEG-AVI frames — stacked (n_frames, h, w) here)
    must land inside the codec error envelope.  None for opaque blobs."""
    spec = _media_spec(media_ref, kind)
    seed, fmt = spec["seed"], spec["fmt"]
    rng = np.random.default_rng(seed)
    if fmt == "png":
        # make_png: one rng.bytes(width) draw per scanline, same order
        raw = b"".join(rng.bytes(spec["w"]) for _ in range(spec["h"]))
        return fmt, np.frombuffer(raw, np.uint8).reshape(spec["h"], spec["w"])
    if fmt == "jpeg":
        return fmt, jpeg_source_image(spec["w"], spec["h"], seed)
    if fmt == "gif":
        # decode_gif palette-maps to RGB; the grayscale palette is
        # (i, i, i), so the source RGB image repeats the index plane
        idx = rng.integers(0, 256, size=(spec["h"], spec["w"]), dtype=np.uint8)
        return fmt, np.repeat(idx[:, :, None], 3, axis=2)
    if fmt == "bmp":
        return fmt, rng.integers(0, 256, size=(spec["h"], spec["w"]), dtype=np.uint8)
    if fmt == "wav":
        body = rng.bytes(spec["n_samples"] * spec["channels"] * 2)
        return fmt, np.frombuffer(body, "<i2").reshape(
            spec["n_samples"], spec["channels"]
        )
    if fmt == "avi":
        from .avi import avi_source_frames

        return fmt, np.stack(
            list(avi_source_frames(spec["w"], spec["h"], spec["n_frames"], seed))
        )
    return fmt, None


class MediaFeatureExtractor:
    """Actor-pool UDF: doc rows -> one row per media span with a feature
    vector.  Decoder is constructed once per actor; batches stay small
    because payloads are wide (SURVEY guidance on binary columns)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def _features(self, payload: bytes) -> list[float]:
        """Feature vector from REAL decoded pixels/samples when the
        container is pure-python-decodable (PNG/BMP/WAV-PCM/GIF/JPEG),
        else from the raw container bytes (codec-bound formats)."""
        decoded = decode_media(payload)
        if decoded is not None:
            arr = decoded.astype(np.float32).ravel()
            scale = 255.0 if decoded.dtype == np.uint8 else 32768.0
        else:
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            scale = 255.0
        chunks = np.array_split(arr, FEATURE_DIM)
        return [float(round(c.mean() / scale, 6)) for c in chunks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, span_idxs, kinds, refs, feats = [], [], [], [], []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for i, sp in enumerate(spans):
                if sp["media_ref"]:
                    payload = self.decoder.decode(sp["media_ref"], sp["kind"])
                    doc_ids.append(doc_id)
                    span_idxs.append(i)
                    kinds.append(sp["kind"])
                    refs.append(sp["media_ref"])
                    feats.append(self._features(payload))
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "span_idx": pa.array(span_idxs, type=pa.int32()),
                "kind": kinds,
                "media_ref": refs,
                "feature": pa.array(feats, type=pa.list_(pa.float32(), FEATURE_DIM)),
            },
            schema=MEDIA_FEATURES_SCHEMA,
        )


MEDIA_METADATA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("duration_ms", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


class MediaMetadataExtractor:
    """Actor-pool UDF: media spans -> typed metadata rows via REAL
    container-header parsing (parse_image_header for PNG/JPEG/GIF,
    parse_audio_header for RIFF/WAV); unknown payloads get format=''
    and -1 fields but keep their byte size."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in MEDIA_METADATA_SCHEMA.names}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for i, sp in enumerate(spans):
                if not sp["media_ref"]:
                    continue
                payload = self.decoder.decode(sp["media_ref"], sp["kind"])
                img = parse_image_header(payload)
                aud = None if img else parse_audio_header(payload)
                vid = None
                if not img and not aud:
                    from .avi import parse_avi_header

                    vid = parse_avi_header(payload)
                cols["doc_id"].append(doc_id)
                cols["span_idx"].append(i)
                cols["kind"].append(sp["kind"])
                cols["media_ref"].append(sp["media_ref"])
                cols["format"].append(
                    img[0] if img else aud[0] if aud else "avi" if vid else ""
                )
                cols["width"].append(img[1] if img else vid[1] if vid else -1)
                cols["height"].append(img[2] if img else vid[2] if vid else -1)
                cols["sample_rate"].append(aud[1] if aud else -1)
                cols["channels"].append(aud[2] if aud else -1)
                cols["duration_ms"].append(
                    aud[3] if aud else vid[3] * vid[4] // 1000 if vid else -1
                )
                cols["n_bytes"].append(len(payload))
        return pa.Table.from_pydict(cols, schema=MEDIA_METADATA_SCHEMA)


FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("frame_no", pa.int32()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


class VideoFrameSampler:
    """Actor-pool UDF: every ``stride``-th fixed-size frame of a video
    span exploded to its own row with a per-frame feature — the row
    layout a decode-bound GPU stage would feed; small batch sizes keep
    payload x concurrency inside the worker heap."""

    def __init__(self, stride: int = 4, decoder: str = "fake"):
        self.stride = stride
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def _emit(self, cols, doc_id, i, ref, frame_no, arr: np.ndarray) -> None:
        chunks = np.array_split(arr.astype(np.float32).ravel(), FEATURE_DIM)
        cols["doc_id"].append(doc_id)
        cols["span_idx"].append(i)
        cols["media_ref"].append(ref)
        cols["frame_no"].append(frame_no)
        cols["feature"].append([float(round(c.mean() / 255.0, 6)) for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .avi import decode_avi_frame, is_avi, iter_avi_frames

        cols: dict[str, list] = {k: [] for k in FRAME_SAMPLE_SCHEMA.names}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for i, sp in enumerate(spans):
                if sp["kind"] != "video" or not sp["media_ref"]:
                    continue
                payload = self.decoder.decode(sp["media_ref"], "video")
                if is_avi(payload):
                    # header-only chunk walk; entropy-decode ONLY the
                    # sampled frames (the 100-TB access pattern: seek
                    # cost O(frames), decode cost O(frames / stride))
                    for f, chunk in enumerate(iter_avi_frames(payload)):
                        if f % self.stride:
                            continue
                        self._emit(
                            cols, doc_id, i, sp["media_ref"], f,
                            decode_avi_frame(chunk),
                        )
                    continue
                # raw fixed-size-frame byte stream (codec-bound formats)
                n_frames = len(payload) // FRAME_BYTES
                for f in range(0, n_frames, self.stride):
                    frame = payload[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    self._emit(
                        cols, doc_id, i, sp["media_ref"], f,
                        np.frombuffer(frame, dtype=np.uint8),
                    )
        return pa.Table.from_pydict(cols, schema=FRAME_SAMPLE_SCHEMA)


def q_media_metadata(sf_dir: str):
    """Media spans -> typed metadata (real header parse); average image
    dims per kind (rows-only check)."""
    from ray.data.aggregate import Count, Mean

    from ..sources.interleave import interleaved_docs

    meta = interleaved_docs(sf_dir).map_batches(
        MediaMetadataExtractor,
        fn_constructor_args=("fake",),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return (
        meta.groupby(["kind", "format"])
        .aggregate(
            Count(alias_name="n_media"),
            Mean("width", alias_name="avg_width"),
            Mean("height", alias_name="avg_height"),
            Mean("duration_ms", alias_name="avg_duration_ms"),
        )
        .sort(["kind", "format"])
    )


def q_video_frames(sf_dir: str, stride: int = 4):
    """Sampled video frames; per-video frame counts (rows-only check)."""
    from ray.data.aggregate import Count

    from ..sources.interleave import interleaved_docs

    frames = interleaved_docs(sf_dir).map_batches(
        VideoFrameSampler,
        fn_constructor_args=(stride, "fake"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return (
        frames.groupby("media_ref")
        .aggregate(Count(alias_name="n_frames"))
        .sort("media_ref")
    )


def q_media_features(sf_dir: str):
    """Media spans -> features; counts by kind (rows-only check)."""
    from ray.data.aggregate import Count

    from ..sources.interleave import interleaved_docs

    ds = interleaved_docs(sf_dir)
    feats = ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=("fake",),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return feats.groupby("kind").aggregate(Count(alias_name="n_media")).sort("kind")


MEDIA_GATE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("fmt", pa.string()),
        ("exact", pa.bool_()),
        ("max_err", pa.float64()),
        ("mean_err", pa.float64()),
    ]
)

# lossy-codec error envelopes, measured over 200 seeded corpus refs
# (q85 smooth pattern, dims 16-128: max-abs <= 32, mean-abs <= 8.8;
# MJPEG q80 frames: per-frame mean-abs <= 8.2) — a broken decoder on
# uint8 pixels lands at mean-abs ~85, far outside these
JPEG_MAX_ABS_ERR = 40.0
JPEG_MEAN_ABS_ERR = 12.0
AVI_MEAN_ABS_ERR = 12.0


class MediaDecodeChecker:
    """Actor-pool gate stage: decode every media span through the SAME
    pure-python codecs the feature/frame stages use (decode_media /
    iter_avi_frames + decode_avi_frame) and compare against the
    generator's source arrays (:func:`media_source_truth`).  Lossless
    containers (PNG / GIF / BMP / WAV-PCM) must reproduce the source
    bit-exactly (``exact``, err = 0); lossy codecs report their error
    (JPEG: max-abs pixel err; MJPEG-AVI: worst per-sampled-frame
    mean-abs err, ``exact`` = frame count matches the container plan).
    Emits one tiny scalar row per span — at 100 TB the gate runs over a
    bounded document sample and only (ref, fmt, bool, float) rows cross
    the wire; payloads and pixels never leave the actor."""

    def __init__(self, decoder: str = "fake", video_stride: int = 4):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()
        self.video_stride = video_stride

    def _check(self, ref: str, kind: str) -> tuple[str, bool, float, float]:
        from .avi import decode_avi_frame, iter_avi_frames

        payload = self.decoder.decode(ref, kind)
        fmt, truth = media_source_truth(ref, kind)
        inf = float("inf")
        if fmt == "avi":
            worst_max = worst_mean = 0.0
            n_seen = 0
            for f, chunk in enumerate(iter_avi_frames(payload)):
                n_seen += 1
                if f % self.video_stride:
                    continue  # entropy-decode only the sampled frames
                diff = np.abs(decode_avi_frame(chunk).astype(np.int64) - truth[f])
                worst_max = max(worst_max, float(diff.max()))
                worst_mean = max(worst_mean, float(diff.mean()))
            return fmt, n_seen == truth.shape[0], worst_max, worst_mean
        decoded = decode_media(payload)
        if decoded is None or truth is None:
            return fmt, False, inf, inf
        if fmt == "jpeg":
            if decoded.shape != truth.shape:
                return fmt, False, inf, inf
            diff = np.abs(decoded.astype(np.int64) - truth.astype(np.int64))
            return fmt, True, float(diff.max()), float(diff.mean())
        exact = bool(np.array_equal(decoded, truth))
        return fmt, exact, 0.0 if exact else inf, 0.0 if exact else inf

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in MEDIA_GATE_SCHEMA.names}
        for ref, kind in zip(
            batch.column("media_ref").to_pylist(), batch.column("kind").to_pylist()
        ):
            fmt, exact, max_err, mean_err = self._check(ref, kind)
            cols["media_ref"].append(ref)
            cols["kind"].append(kind)
            cols["fmt"].append(fmt)
            cols["exact"].append(exact)
            cols["max_err"].append(max_err)
            cols["mean_err"].append(mean_err)
        return pa.Table.from_pydict(cols, schema=MEDIA_GATE_SCHEMA)


def q_media_decode_gate(sf_dir: str, n_docs: int = 800) -> "pd.DataFrame":
    """Driver-recorded decode-correctness gate over a bounded corpus
    sample: every pure-python codec path (PNG, JPEG, GIF, BMP, WAV-PCM,
    MJPEG-AVI) decodes its synthetic payloads back to the generator's
    source arrays — bit-exactly for the lossless containers, inside the
    codec error envelope for the lossy ones — through the distributed
    actor-pool stage.  One summary row; folded into approx_metrics."""
    import pandas as pd

    from ..sources.interleave import interleaved_docs

    def media_spans(batch: pa.Table) -> pa.Table:
        refs, kinds = [], []
        for spans in batch.column("spans").to_pylist():
            for sp in spans:
                if sp["media_ref"] and sp["kind"] in ("image", "audio", "video"):
                    refs.append(sp["media_ref"])
                    kinds.append(sp["kind"])
        return pa.Table.from_pydict(
            {"media_ref": refs, "kind": kinds},
            schema=pa.schema([("media_ref", pa.string()), ("kind", pa.string())]),
        )

    checked = (
        interleaved_docs(sf_dir)
        .limit(n_docs)
        .map_batches(media_spans, batch_format="pyarrow")
        .map_batches(
            MediaDecodeChecker,
            fn_constructor_args=("fake",),
            batch_format="pyarrow",
            batch_size=32,
            concurrency=(1, 4),
            num_cpus=1,
        )
    )
    df = checked.to_pandas()  # bounded: <= a few hundred scalar rows
    lossless = df[df["fmt"].isin(("png", "gif", "bmp", "wav"))]
    jpeg = df[df["fmt"] == "jpeg"]
    video = df[df["fmt"] == "avi"]
    n_formats = df["fmt"].nunique()
    lossless_exact_frac = float(lossless["exact"].mean()) if len(lossless) else 0.0
    jpeg_max_err = float(jpeg["max_err"].max()) if len(jpeg) else float("inf")
    jpeg_mean_err = float(jpeg["mean_err"].max()) if len(jpeg) else float("inf")
    video_mean_err = float(video["mean_err"].max()) if len(video) else float("inf")
    video_structural = bool(video["exact"].all()) if len(video) else False
    passes = bool(
        n_formats == 6
        and lossless_exact_frac == 1.0
        and jpeg_max_err <= JPEG_MAX_ABS_ERR
        and jpeg_mean_err <= JPEG_MEAN_ABS_ERR
        and video_mean_err <= AVI_MEAN_ABS_ERR
        and video_structural
    )
    return pd.DataFrame(
        {
            "n_spans": [len(df)],
            "n_formats": [n_formats],
            "lossless_exact_frac": [lossless_exact_frac],
            "jpeg_max_abs_err": [jpeg_max_err],
            "jpeg_mean_abs_err": [jpeg_mean_err],
            "video_max_mean_err": [video_mean_err],
            "video_structural_ok": [video_structural],
            "passes": [passes],
        }
    )
