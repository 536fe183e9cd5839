"""AVI/MJPEG container codec + distributed frame sampling
(operators/video.py): strict RIFF walk, word padding, poison-frame
resilience, and parity of the Spark stage with a pure-Python recompute.
"""

from __future__ import annotations

import pytest

from razulibs_spark.operators.jpeg import decode_jpeg, encode_jpeg_flat_tiles
from razulibs_spark.operators.video import (
    decode_avi,
    encode_avi_mjpeg,
    sample_video_frames,
    synthesize_video_media,
)


def _frame(seed: int) -> bytes:
    return encode_jpeg_flat_tiles(
        16, 8, lambda tx, ty: (seed + 11 * tx + 23 * ty) % 256
    )


def test_avi_roundtrip_exact_frames():
    frames = [_frame(s) for s in (0, 37, 74)]
    avi = encode_avi_mjpeg(frames, 16, 8, fps=12)
    out = decode_avi(avi)
    assert out["width"] == 16 and out["height"] == 8
    assert out["fps"] == 12
    assert out["n_frames_declared"] == 3
    assert out["frames"] == frames


def test_avi_word_padding_preserves_odd_length():
    # RIFF pads odd-sized chunks; the stored size must win on read.
    odd = b"\xff\xd8" + b"x" * 3  # 5 bytes
    even = b"\xff\xd8" + b"y" * 4
    out = decode_avi(encode_avi_mjpeg([odd, even, odd], 8, 8, fps=1))
    assert out["frames"] == [odd, even, odd]


def test_avi_malformed_raises_not_crashes():
    good = encode_avi_mjpeg([_frame(1)], 16, 8, fps=5)
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="AVI"):
        decode_avi(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(good[: len(good) // 2])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([_frame(1)], 16, 8, fps=0)


def test_avi_decoded_frames_match_jpeg_stats():
    frames = [_frame(s) for s in (5, 42)]
    out = decode_avi(encode_avi_mjpeg(frames, 16, 8, fps=10))
    for raw, seed in zip(out["frames"], (5, 42)):
        st = decode_jpeg(raw)
        expect = (seed % 256 + (seed + 11) % 256) / 2  # two flat tiles
        assert st["width"] == 16 and st["height"] == 8
        assert st["mean_r"] == expect


def test_sample_video_frames_matches_pure_python(spark, sf_dir):
    """The distributed stage must agree row-for-row with a driver-side
    recompute over the same deterministic payloads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    got = {
        (r.doc_id, r.frame_idx): r
        for r in sample_video_frames(
            synthesize_video_media(docs), every=2
        ).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    n_expected = 0
    for d in ids:
        nf = 2 + d % 5
        tw, th = 1 + d % 3, 1 + (d // 3) % 2
        for f in range(0, nf, 2):
            n_expected += 1
            row = got[(d, f)]
            assert row.n_frames == nf
            if f == 0 and d % 9 == 4:
                assert row.decoded is False
                assert row.note == "decode failed: no SOF0 frame header"
                assert row.mean_luma is None
            else:
                assert row.decoded is True
                assert (row.width, row.height) == (8 * tw, 8 * th)
                tiles = [
                    (5 * d + 11 * tx + 23 * ty + 37 * f) % 256
                    for tx in range(tw)
                    for ty in range(th)
                ]
                assert row.mean_luma == sum(tiles) / len(tiles)
    assert len(got) == n_expected


def test_sample_video_frames_poison_container(spark):
    """A payload that is not a valid container yields one frame_idx=-1
    row instead of a dead task."""
    pdf = spark.createDataFrame(
        [(1, bytearray(b"not a riff at all"), "video/avi")],
        "doc_id long, payload binary, media_format string",
    )
    rows = sample_video_frames(pdf, every=1).collect()
    assert len(rows) == 1
    assert rows[0].frame_idx == -1
    assert rows[0].decoded is False
    assert rows[0].note.startswith("container walk failed:")


def test_sample_video_frames_filters_before_python_boundary(spark):
    """Non-video rows never cross the Arrow boundary: the plan filters
    on media_format below the mapInPandas node."""
    pdf = spark.createDataFrame(
        [(1, bytearray(b"x"), "image/bmp")],
        "doc_id long, payload binary, media_format string",
    )
    staged = sample_video_frames(pdf, every=1)
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Filter") > plan.index("MapInPandas") or (
        "StartsWith(media_format" in plan
    )
    assert staged.count() == 0


def test_malformed_frame_in_valid_container_is_data_not_error(spark):
    """A frame whose JPEG structure is broken mid-segment (SOF0 with a
    truncated body — historically an IndexError escaping decode_jpeg)
    must come back as a decoded=false row, never a dead task."""
    bad_frame = b"\xff\xd8\xff\xc0\x00\x02\xff\xd9"
    good = _frame(7)
    payload = encode_avi_mjpeg([bad_frame, good], 16, 8, fps=4)
    pdf = spark.createDataFrame(
        [(9, bytearray(payload), "video/avi")],
        "doc_id long, payload binary, media_format string",
    )
    rows = {r.frame_idx: r for r in sample_video_frames(pdf, every=1).collect()}
    assert rows[0].decoded is False
    assert rows[0].note.startswith("decode failed:")
    assert rows[1].decoded is True


def test_decode_jpeg_error_contract_is_total():
    """Malformed payloads raise ValueError — never IndexError/KeyError
    — so decode_media/sample_video_frames' narrow catch holds."""
    adversarial = [
        b"\xff\xd8\xff\xc0\x00\x02\xff\xd9",       # SOF0, empty body
        b"\xff\xd8\xff\xda\x00\x02\xff\xd9",       # SOS, empty body
        b"\xff\xd8\xff\xc4\x00\x04\x00\xff\xd9",   # DHT, short bits
        b"\xff\xd8\xff\xdb\x00\x03\x00\xff\xd9",   # DQT, short table
    ]
    for payload in adversarial:
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_empty_container_emits_audit_row(spark):
    """A valid AVI holding zero frames must not silently vanish from
    the output — doc coverage joins rely on one row per payload."""
    payload = encode_avi_mjpeg([], 8, 8, fps=1)
    pdf = spark.createDataFrame(
        [(3, bytearray(payload), "video/avi")],
        "doc_id long, payload binary, media_format string",
    )
    rows = sample_video_frames(pdf, every=1).collect()
    assert len(rows) == 1
    assert rows[0].frame_idx == -1 and rows[0].n_frames == 0
    assert rows[0].decoded is False
    assert rows[0].note == "container has no frames"


def test_color_frames_report_bt601_luma_not_red(spark):
    """mean_luma on color MJPEG frames is the BT.601 weighting of the
    channel means — a saturated-red frame must not report ~255."""
    import numpy as np

    from razulibs_spark.operators.jpeg import decode_jpeg as dj, encode_jpeg

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    frame = encode_jpeg(red)
    st = dj(frame)
    payload = encode_avi_mjpeg([frame], 8, 8, fps=1)
    pdf = spark.createDataFrame(
        [(5, bytearray(payload), "video/avi")],
        "doc_id long, payload binary, media_format string",
    )
    row = sample_video_frames(pdf, every=1).collect()[0]
    assert row.decoded is True
    expect = 0.299 * st["mean_r"] + 0.587 * st["mean_g"] + 0.114 * st["mean_b"]
    assert row.mean_luma == expect
    assert row.mean_luma < 150  # nowhere near the red channel's ~255
