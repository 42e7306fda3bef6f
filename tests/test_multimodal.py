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
    assert fmt in ("png", "jpeg", "gif") and 16 <= w <= 128 and 16 <= h <= 128
    # all three container formats are emitted across refs, so the
    # JPEG SOF / GIF descriptor branches run in the query path too
    fmts = {
        parse_image_header(d.decode(f"media://{i}/x", "image"))[0] for i in range(24)
    }
    assert fmts == {"png", "jpeg", "gif"}
    vid = d.decode("media://1/3", "video")
    assert len(vid) % FRAME_BYTES == 0 and len(vid) >= 8 * FRAME_BYTES
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
    assert img_formats == {"png", "jpeg", "gif"}
    for fmt in img_formats:
        img = by_kind[("image", fmt)]
        assert img["n_media"] > 0 and 16 <= img["avg_width"] <= 128
    # audio kinds parse to RIFF/WAV with a real mean duration
    audio_formats = {k[1] for k in by_kind if k[0] == "audio"}
    assert audio_formats == {"wav"}
    assert by_kind[("audio", "wav")]["avg_duration_ms"] > 0
    # video/blob kinds parse to no format
    assert all(k[1] == "" for k in by_kind if k[0] not in ("image", "audio"))


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
