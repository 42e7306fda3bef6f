"""Multimodal stages: real container-header parsing, frame sampling,
and the feature plumbing."""

import struct

from kazu_ray.extras.multimodal import (
    FRAME_BYTES,
    FakeDecoder,
    make_png,
    parse_image_header,
)


def test_make_png_is_valid_and_parsed():
    data = make_png(37, 21, seed=5)
    assert parse_image_header(data) == ("png", 37, 21)
    # CRCs are genuine: corrupting the IHDR body breaks the stored CRC
    import zlib

    body = data[12:16 + 13]  # tag + ihdr body
    stored_crc = struct.unpack(">I", data[8 + 4 + 4 + 13 : 8 + 4 + 4 + 13 + 4])[0]
    assert zlib.crc32(body) & 0xFFFFFFFF == stored_crc


def test_make_jpeg_and_gif_round_trip():
    from kazu_ray.extras.multimodal import make_gif, make_jpeg

    assert parse_image_header(make_jpeg(64, 48, seed=3)) == ("jpeg", 64, 48)
    assert parse_image_header(make_gif(33, 17, seed=4)) == ("gif", 33, 17)
    # determinism: same seed -> same bytes (resumable synthetic corpus)
    assert make_jpeg(64, 48, seed=3) == make_jpeg(64, 48, seed=3)
    assert make_gif(33, 17, seed=4) == make_gif(33, 17, seed=4)
    # GIF structural check: trailer byte present, screen descriptor LE
    g = make_gif(33, 17, seed=4)
    assert g[:6] == b"GIF89a" and g[-1:] == b"\x3b"
    assert struct.unpack("<HH", g[6:10]) == (33, 17)


def test_parse_jpeg_and_gif_headers():
    # handcrafted JPEG: SOI + APP0 stub + SOF0 with h=480 w=640
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03\x00\x00\x00"
    )
    assert parse_image_header(jpeg) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(b"garbage-bytes") is None


def test_fake_decoder_kinds():
    d = FakeDecoder()
    img = d.decode("media://1/2", "image")
    fmt, w, h = parse_image_header(img)
    assert fmt in ("png", "jpeg", "gif", "bmp") and 16 <= w <= 128 and 16 <= h <= 128
    # all four container formats are emitted across refs, so the
    # JPEG SOF / GIF descriptor / BMP info-header branches run in the
    # query path too
    fmts = {
        parse_image_header(d.decode(f"media://{i}/x", "image"))[0] for i in range(32)
    }
    assert fmts == {"png", "jpeg", "gif", "bmp"}
    vid = d.decode("media://1/3", "video")
    from kazu_ray.extras.avi import is_avi, parse_avi_header

    assert is_avi(vid)
    assert 8 <= parse_avi_header(vid)[3] <= 32  # seeded frame count
    # audio refs yield valid RIFF/WAV
    from kazu_ray.extras.multimodal import parse_audio_header

    aud = d.decode("media://1/4", "audio")
    fmt, rate, channels, dur = parse_audio_header(aud)
    assert fmt == "wav" and rate in (8000, 16000, 44100)
    assert channels in (1, 2) and dur > 0
    # determinism
    assert d.decode("media://1/2", "image") == img


def test_media_metadata_query(ray_session):
    from kazu_ray.extras.multimodal import q_media_metadata

    rows = q_media_metadata("/root/testdata/sf0.001").take_all()
    by_kind = {(r["kind"], r["format"]): r for r in rows}
    img_formats = {k[1] for k in by_kind if k[0] == "image"}
    assert img_formats == {"png", "jpeg", "gif", "bmp"}
    for fmt in img_formats:
        img = by_kind[("image", fmt)]
        assert img["n_media"] > 0 and 16 <= img["avg_width"] <= 128
    # audio kinds parse to RIFF/WAV with a real mean duration
    audio_formats = {k[1] for k in by_kind if k[0] == "audio"}
    assert audio_formats == {"wav"}
    assert by_kind[("audio", "wav")]["avg_duration_ms"] > 0
    # video kinds parse to real AVI metadata; blob kinds to no format
    video_formats = {k[1] for k in by_kind if k[0] == "video"}
    assert video_formats == {"avi"}
    vid = by_kind[("video", "avi")]
    assert 16 <= vid["avg_width"] <= 48 and vid["avg_duration_ms"] > 0
    assert all(k[1] == "" for k in by_kind if k[0] not in ("image", "audio", "video"))


def test_video_frames_query(ray_session):
    from kazu_ray.extras.multimodal import q_video_frames

    rows = q_video_frames("/root/testdata/sf0.001").take_all()
    assert rows
    # stride 4 over 8..32 frames -> 2..8 sampled
    assert all(2 <= r["n_frames"] <= 8 for r in rows)


def test_make_wav_round_trip():
    from kazu_ray.extras.multimodal import make_wav, parse_audio_header

    data = make_wav(16000, 2, 16000, seed=3)  # exactly 1 s stereo
    fmt, rate, channels, dur = parse_audio_header(data)
    assert (fmt, rate, channels, dur) == ("wav", 16000, 2, 1000)
    # odd-sized chunk alignment and trailing chunks don't break the walk
    data2 = make_wav(8000, 1, 4000) + b"LIST" + (5).to_bytes(4, "little") + b"xxxxx"
    assert parse_audio_header(data2) == ("wav", 8000, 1, 500)
    # non-WAV rejected
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert parse_audio_header(b"\x00" * 40) is None


# ---- real pixel/sample decode paths (VERDICT r3 item #8) ----------------


def test_decode_bmp_golden_bytes():
    """Byte-level golden: a hand-built 3x2 8-bit BMP decodes to the exact
    pixel matrix (bottom-up storage + 4-byte row padding unwound)."""
    import struct

    import numpy as np

    from kazu_ray.extras.multimodal import decode_bmp

    # rows stored bottom-up: file holds row1 then row0, each padded to 4
    pixels = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    rows = bytes([40, 50, 60, 0]) + bytes([10, 20, 30, 0])
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(rows), 2835, 2835, 256, 0)
    data = b"BM" + struct.pack("<IHHI", offset + len(rows), 0, 0, offset) + info + palette + rows
    got = decode_bmp(data)
    assert got is not None and np.array_equal(got, pixels)


def test_make_bmp_decode_round_trip():
    import numpy as np

    from kazu_ray.extras.multimodal import decode_bmp, make_bmp, parse_image_header

    data = make_bmp(37, 11, seed=5)  # width forces 3-byte row padding
    assert parse_image_header(data) == ("bmp", 37, 11)
    got = decode_bmp(data)
    assert got.shape == (11, 37)
    # regenerate the expected pixels from the same seed
    rng = np.random.default_rng(5)
    exp = rng.integers(0, 256, size=(11, 37), dtype=np.uint8)
    assert np.array_equal(got, exp)
    # compressed / unsupported depth rejected
    assert decode_bmp(b"BM" + b"\x00" * 60) is None


def test_decode_png_golden_scanlines():
    """Real PNG decode: zlib inflate + unfiltering reproduces the exact
    scanlines for every filter type 0-4 (PNG spec 9)."""
    import struct
    import zlib

    import numpy as np

    from kazu_ray.extras.multimodal import decode_png

    # 4x5 grayscale, one row per filter type
    pix = np.arange(20, dtype=np.uint8).reshape(5, 4) * 7 % 251

    def flt(y, ftype):
        row = pix[y].astype(int)
        prev = pix[y - 1].astype(int) if y else [0] * 4
        out = [ftype]
        for x in range(4):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if (x and y) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            out.append((row[x] - pred) % 256)
        return bytes(out)

    raw = b"".join(flt(y, y % 5) for y in range(5))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(data)
    assert got is not None and np.array_equal(got, pix)


def test_make_png_decode_round_trip():
    import numpy as np

    from kazu_ray.extras.multimodal import decode_png, make_png

    data = make_png(23, 9, seed=8)
    got = decode_png(data)
    assert got.shape == (9, 23)
    rng = np.random.default_rng(8)
    exp = np.frombuffer(b"".join(rng.bytes(23) for _ in range(9)), np.uint8)
    assert np.array_equal(got.ravel(), exp)


def test_decode_wav_pcm_golden_samples():
    import numpy as np

    from kazu_ray.extras.multimodal import decode_wav_pcm, make_wav

    data = make_wav(8000, 2, 100, seed=4)
    got = decode_wav_pcm(data)
    assert got.shape == (100, 2) and got.dtype == np.int16
    rng = np.random.default_rng(4)
    exp = np.frombuffer(rng.bytes(100 * 4), "<i2").reshape(100, 2)
    assert np.array_equal(got, exp)
    # 8-bit / non-PCM rejected
    assert decode_wav_pcm(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_media_features_use_real_decoded_pixels():
    """MediaFeatureExtractor features for decodable containers come from
    the DECODED pixels, not the container bytes: a BMP and a PNG holding
    the SAME pixels give the SAME features despite different bytes."""
    import numpy as np
    import pyarrow as pa

    from kazu_ray.extras.multimodal import (
        MediaFeatureExtractor,
        decode_bmp,
        decode_png,
        make_bmp,
        make_png,
    )

    bmp, png = make_bmp(16, 16, seed=2), make_png(16, 16, seed=9)
    ex = MediaFeatureExtractor()

    f_bmp = ex._features(bmp)
    f_png = ex._features(png)
    # cross-check against the decoded arrays directly
    for feats, decoded in ((f_bmp, decode_bmp(bmp)), (f_png, decode_png(png))):
        arr = decoded.astype(np.float32).ravel()
        exp = [float(round(c.mean() / 255.0, 6)) for c in np.array_split(arr, 16)]
        assert feats == exp
    # and the end-to-end actor path still produces fixed-width vectors
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [
                    {"kind": "image", "text": "", "media_ref": "m/1", "offset": 0},
                    {"kind": "audio", "text": "", "media_ref": "a/1", "offset": 1},
                ]
            ],
        }
    )
    out = ex(batch)
    assert out.num_rows == 2
    assert all(len(f) == 16 for f in out.column("feature").to_pylist())


def test_media_source_truth_round_trip():
    """Every synthetic container decodes back to the generator's source
    array: bit-exactly for PNG/GIF/BMP/WAV, inside the codec error
    envelope for baseline JPEG and MJPEG-AVI frames."""
    import numpy as np

    from kazu_ray.extras.avi import decode_avi_frame, iter_avi_frames
    from kazu_ray.extras.multimodal import (
        AVI_MEAN_ABS_ERR,
        JPEG_MAX_ABS_ERR,
        JPEG_MEAN_ABS_ERR,
        decode_media,
        media_source_truth,
    )

    dec = FakeDecoder()
    seen = set()
    for i in range(40):
        for kind in ("image", "audio"):
            ref = f"media://truth{i}/{kind}"
            fmt, truth = media_source_truth(ref, kind)
            seen.add(fmt)
            got = decode_media(dec.decode(ref, kind))
            if fmt == "jpeg":
                diff = np.abs(got.astype(int) - truth.astype(int))
                assert diff.max() <= JPEG_MAX_ABS_ERR
                assert diff.mean() <= JPEG_MEAN_ABS_ERR
            else:
                assert np.array_equal(got, truth), (ref, fmt)
    for i in range(4):
        ref = f"media://truth{i}/video"
        fmt, truth = media_source_truth(ref, "video")
        assert fmt == "avi"
        chunks = list(iter_avi_frames(dec.decode(ref, "video")))
        assert len(chunks) == truth.shape[0]
        for f in (0, len(chunks) - 1):
            diff = np.abs(decode_avi_frame(chunks[f]).astype(int) - truth[f])
            assert diff.mean() <= AVI_MEAN_ABS_ERR
        seen.add(fmt)
    assert seen == {"png", "jpeg", "gif", "bmp", "wav", "avi"}


def test_media_decode_gate_query(ray_session):
    from kazu_ray.extras.multimodal import q_media_decode_gate

    row = q_media_decode_gate("/root/testdata/sf0.001", n_docs=200).iloc[0]
    assert row["n_formats"] == 6
    assert row["lossless_exact_frac"] == 1.0
    assert bool(row["passes"])
