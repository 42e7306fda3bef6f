"""MJPEG-AVI video: container header goldens, frame walk, sampled-frame
pixel decode, and the VideoFrameSampler / metadata integration."""

import numpy as np
import pyarrow as pa

from kazu_ray.extras.avi import (
    decode_avi_frame,
    is_avi,
    iter_avi_frames,
    make_avi_mjpeg,
    parse_avi_header,
)


def test_header_golden():
    data = make_avi_mjpeg(32, 24, 5, seed=1)
    assert is_avi(data)
    assert parse_avi_header(data) == ("MJPG", 32, 24, 5, 100_000)
    assert parse_avi_header(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert not is_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_walk_and_decode():
    data = make_avi_mjpeg(24, 16, 7, seed=2)
    frames = list(iter_avi_frames(data))
    assert len(frames) == 7
    assert all(f[:2] == b"\xff\xd8" for f in frames)  # each a real JPEG
    # decoded frame matches the generator's pattern within JPEG
    # quantization error (same bound family as test_jpeg)
    rng = np.random.default_rng(2)
    phase = rng.uniform(0, 2 * np.pi, 2)
    yy, xx = np.mgrid[0:16, 0:24].astype(np.float64)
    for f in (0, 3, 6):
        exp = np.clip(
            np.round(
                128
                + 55 * np.sin(xx / 6.0 + phase[0] + 0.35 * f)
                + 45 * np.cos(yy / 5.0 + phase[1] + 0.22 * f)
            ),
            0,
            255,
        )
        got = decode_avi_frame(frames[f]).astype(np.float64)
        assert got.shape == (16, 24)
        assert np.abs(got - exp).mean() < 10.0
    # consecutive frames genuinely differ
    assert not np.array_equal(decode_avi_frame(frames[0]), decode_avi_frame(frames[1]))


def test_determinism():
    assert make_avi_mjpeg(16, 16, 3, seed=9) == make_avi_mjpeg(16, 16, 3, seed=9)
    assert make_avi_mjpeg(16, 16, 3, seed=9) != make_avi_mjpeg(16, 16, 3, seed=10)


def test_video_frame_sampler_decodes_sampled_frames_only():
    from kazu_ray.extras.multimodal import FakeDecoder, VideoFrameSampler

    sampler = VideoFrameSampler(stride=4)
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [{"kind": "video", "text": "", "media_ref": "v/1", "offset": 0}]
            ],
        }
    )
    out = sampler(batch)
    payload = FakeDecoder().decode("v/1", "video")
    n_frames = parse_avi_header(payload)[3]
    assert out.num_rows == -(-n_frames // 4)  # ceil(n / stride)
    assert out.column("frame_no").to_pylist() == list(range(0, n_frames, 4))
    feats = out.column("feature").to_pylist()
    assert all(len(f) == 16 and all(0.0 <= v <= 1.0 for v in f) for f in feats)
    # features come from DECODED pixels: recompute frame 0 directly
    frame0 = decode_avi_frame(next(iter(iter_avi_frames(payload))))
    arr = frame0.astype(np.float32).ravel()
    exp = [float(round(c.mean() / 255.0, 6)) for c in np.array_split(arr, 16)]
    # the schema stores float32, so compare at float32 precision
    assert np.allclose(feats[0], np.asarray(exp, dtype=np.float32), atol=1e-6)


def test_metadata_reports_avi():
    from kazu_ray.extras.multimodal import FakeDecoder, MediaMetadataExtractor

    ex = MediaMetadataExtractor()
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [
                    {"kind": "video", "text": "", "media_ref": "v/2", "offset": 0},
                    {"kind": "blob", "text": "", "media_ref": "b/1", "offset": 1},
                ]
            ],
        }
    )
    rows = ex(batch).to_pylist()
    vid = rows[0]
    payload = FakeDecoder().decode("v/2", "video")
    _, w, h, n, usec = parse_avi_header(payload)
    assert vid["format"] == "avi"
    assert (vid["width"], vid["height"]) == (w, h)
    assert vid["duration_ms"] == n * usec // 1000
    assert rows[1]["format"] == "" and rows[1]["width"] == -1
