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


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container metadata (operators/mp4.py)
# ---------------------------------------------------------------------------


def test_mp4_skeleton_roundtrip_and_layered_timescales():
    from razulibs_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    p = encode_mp4_skeleton("mp42", 600, 7, [
        {"id": 1, "handler": "vide", "timescale": 2000, "lang": "nld",
         "width": 48, "height": 32},
        {"id": 2, "handler": "soun", "timescale": 24000, "lang": "eng",
         "width": 0, "height": 0},
    ])
    m = parse_mp4_metadata(p)
    assert m["brand"] == "mp42"
    assert (m["movie_timescale"], m["movie_duration"]) == (600, 4200)
    assert m["n_tracks"] == 2
    v, a = m["tracks"]
    # each layer expresses the same 7 s in its OWN timescale
    assert (v["handler"], v["width"], v["height"]) == ("vide", 48, 32)
    assert v["duration"] / v["timescale"] == 7
    assert (a["handler"], a["lang"]) == ("soun", "eng")
    assert a["duration"] / a["timescale"] == 7


def test_mp4_parser_strictness_and_extensions():
    """Unknown boxes skip by size (the format's extension mechanism);
    version-1 (64-bit) headers parse; largesize and size=0 ('to end')
    headers parse; structural corruption raises."""
    import struct

    from razulibs_spark.operators.mp4 import (
        _box,
        _pack_lang,
        _u16,
        _u32,
        encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    base = encode_mp4_skeleton("isom", 600, 3, [
        {"id": 1, "handler": "vide", "timescale": 1000, "lang": "und",
         "width": 16, "height": 16}])
    # unknown top-level box between ftyp and moov: skipped
    ftyp_size = struct.unpack(">I", base[0:4])[0]
    extended = (
        base[:ftyp_size] + _box(b"sk1p", b"x" * 11) + base[ftyp_size:]
    )
    assert parse_mp4_metadata(extended)["n_tracks"] == 1
    # version-1 mvhd (64-bit creation/modification/duration)
    mvhd_v1 = _box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16  # v1; 8+8 creation/mod
        + _u32(90000) + struct.pack(">Q", 90000 * 11)
        + b"\x00" * 80,
    )
    mdhd_v1 = _box(
        b"mdhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + _u32(48000) + struct.pack(">Q", 48000 * 11)
        + _u16(_pack_lang("fra")) + _u16(0),
    )
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"\x00")
    tkhd_v1 = _box(
        b"tkhd",
        b"\x01\x00\x00\x07" + b"\x00" * 16 + _u32(9) + _u32(0)
        + struct.pack(">Q", 600 * 11) + b"\x00" * 52
        + _u32(0) + _u32(0),
    )
    doc = _box(b"moov", mvhd_v1 + _box(
        b"trak", tkhd_v1 + _box(b"mdia", mdhd_v1 + hdlr)))
    m = parse_mp4_metadata(doc)
    assert (m["movie_timescale"], m["movie_duration"]) == (90000, 990000)
    t = m["tracks"][0]
    assert (t["track_id"], t["handler"], t["lang"]) == (9, "soun", "fra")
    assert t["duration"] / t["timescale"] == 11
    # largesize header (size=1 + 64-bit size) and size=0 (last box)
    body = doc[8:]
    large = _u32(1) + b"moov" + struct.pack(">Q", 16 + len(body)) + body
    assert parse_mp4_metadata(large)["n_tracks"] == 1
    sized0 = _u32(0) + b"moov" + body  # size=0: "to end of container"
    assert parse_mp4_metadata(sized0)["n_tracks"] == 1
    # corruption: truncated header, overrun, no moov
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated box header"):
        parse_mp4_metadata(doc[:5])
    with _pytest.raises(ValueError, match="overruns"):
        parse_mp4_metadata(_u32(len(doc) + 64) + doc[4:])
    with _pytest.raises(ValueError, match="no moov"):
        parse_mp4_metadata(_box(b"free", b""))


def test_mp4_metadata_stage_rows(spark):
    """The Spark stage: per-track rows for parsed containers, one
    fail-closed row for the poison doc, audio geometry null."""
    from razulibs_spark.operators.mp4 import (
        extract_mp4_metadata,
        synthesize_mp4_media,
    )

    docs = spark.createDataFrame(
        [(2,), (3,), (7,)], "doc_id long"
    )
    rows = {
        (r["doc_id"], r["track_id"]): r
        for r in extract_mp4_metadata(synthesize_mp4_media(docs)).collect()
    }
    assert rows[(2, 1)]["handler"] == "vide"
    assert rows[(2, 1)]["n_tracks"] == 1 and (3, 2) in rows
    assert rows[(3, 2)]["width"] is None  # sound track: no geometry
    assert rows[(3, 1)]["duration_s"] == 4.0  # 1 + 3%9 seconds
    poison = rows[(7, None)]
    assert poison["parsed"] is False and "overruns" in poison["note"]


def test_tiff_stage_and_honest_rejections(spark):
    from razulibs_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
        synthesize_tiff_media,
        tiff_stats,
    )

    docs = spark.createDataFrame([(0,), (1,), (9,)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in tiff_stats(synthesize_tiff_media(docs)).collect()}
    # d=0: gray, big-endian (0%5==0), packbits (0%3==0)
    assert (rows[0]["byte_order"], rows[0]["compression"],
            rows[0]["n_channels"]) == ("MM", "packbits", 1)
    # d=1: rgb, little-endian, LZW with Predictor 2 (1%3==1, 1%7<3)
    assert (rows[1]["byte_order"], rows[1]["compression"],
            rows[1]["n_channels"]) == ("II", "lzw+pred", 3)
    assert rows[1]["mean_c3"] is not None
    # d=9: poison (9%17==9) fails closed with the pinned note
    assert rows[9]["decoded"] is False
    assert rows[9]["note"] == "tiff: IFD offset overruns file"

    # out-of-subset features are NAMED, not mis-decoded
    import struct as _s

    import pytest as _pytest

    base = encode_tiff(3, 2, [1, 2, 3, 4, 5, 6])
    # flip Compression (tag 259) to JPEG-in-TIFF (7): entry order is
    # sorted by tag, so patch the value in place.
    idx = base.find(_s.pack("<HHI", 259, 3, 1))
    patched = (base[:idx + 8] + _s.pack("<I", 7) + base[idx + 12:])
    with _pytest.raises(ValueError, match="unsupported compression 7"):
        decode_tiff(patched)
    # 16-bit is now SUPPORTED; a 12-bit sample width is not
    idx = base.find(_s.pack("<HHI", 258, 3, 1))
    patched = base[:idx + 8] + _s.pack("<I", 12) + base[idx + 12:]
    with _pytest.raises(ValueError, match="8/16-bit"):
        decode_tiff(patched)


def test_tiff_lzw_pinned_vector_and_strictness():
    """Spec conformance pinned by hand-packed bytes, not just
    encoder/decoder agreement: for ABABABA the code stream is
    Clear(256), A(65), B(66), AB(258), ABA(260), EOI(257) — six 9-bit
    codes packed MSB-first = 80 10 48 50 28 24 04."""
    import pytest as _pytest

    from razulibs_spark.operators.tiff import lzw_decode, lzw_encode

    enc = lzw_encode(b"ABABABA")
    assert enc == bytes([0x80, 0x10, 0x48, 0x50, 0x28, 0x24, 0x04])
    assert lzw_decode(enc, 7) == b"ABABABA"
    with _pytest.raises(ValueError, match="truncated"):
        lzw_decode(enc[:-2], 7)  # EOI sheared off
    # Clear then code 300 (> table size 258): 9-bit MSB-first pack
    with _pytest.raises(ValueError, match="beyond table"):
        lzw_decode(bytes([0x80, 0x4B, 0x00]), 4)
    # stream that never starts with Clear: literal 65 first
    with _pytest.raises(ValueError, match="before initial Clear"):
        lzw_decode(bytes([0x20, 0x80, 0x40]), 4)


def test_tiff_predictor2_bites_and_roundtrips():
    """Predictor 2 turns a smooth gradient into near-constant deltas —
    LZW output must shrink, and pixels still roundtrip exactly."""
    from razulibs_spark.operators.tiff import decode_tiff, encode_tiff

    w, h = 64, 16
    pix = [(x * 3 + y) % 256 for y in range(h) for x in range(w)]
    plain = encode_tiff(w, h, pix, lzw=True)
    pred = encode_tiff(w, h, pix, lzw=True, predictor2=True)
    assert len(pred) < len(plain)
    m = decode_tiff(pred)
    assert m["compression"] == "lzw" and m["predictor"] == 2
    assert list(m["pixels"]) == pix


def test_tiff_tiled_stitching_and_16bit():
    """§15 tiles: a 20×18 image at 16×16 tiles = 2×2 grid with padded
    right/bottom edges — padding must never leak into output; 16-bit
    samples honor the file byte order in BOTH orders."""
    from razulibs_spark.operators.tiff import decode_tiff, encode_tiff

    w, h = 20, 18
    pix = [(7 * x + 13 * y) % 65521 for y in range(h) for x in range(w)]
    for be in (False, True):
        m = decode_tiff(
            encode_tiff(w, h, pix, bits=16, tiled=True, big_endian=be,
                        lzw=True, predictor2=True)
        )
        assert (m["layout"], m["bits"], m["byte_order"]) == (
            "tiled", 16, "MM" if be else "II"
        )
        assert list(m["pixels"]) == pix
    # tile table must cover the full grid
    import struct as _s

    import pytest as _pytest

    blob = encode_tiff(w, h, pix, bits=16, tiled=True)
    # shrink TileByteCounts(325) count field to 3 entries (needs 4)
    idx = blob.find(_s.pack("<HHI", 325, 4, 4))
    assert idx > 0
    bad = blob[:idx + 4] + _s.pack("<I", 3) + blob[idx + 8:]
    with _pytest.raises(ValueError, match="tiles|mismatched"):
        decode_tiff(bad)


def test_tiff_lzw_flush_boundary_regression():
    """sf0.1 corpus find: when the final flush code's decoder-side
    catch-up add lands EXACTLY on a width boundary (1022 entries →
    10→11 bits), the decoder widens before reading EOI — the encoder
    must widen too (libtiff's 'explicit change of code size' fix) or
    the EOI straddles. The 768-byte tile of doc 1609 closes exactly
    there."""
    from razulibs_spark.operators.tiff import lzw_decode, lzw_encode

    d, ts = 1609, 16
    raw = bytes(
        b for yy in range(ts) for xx in range(ts)
        for b in ((d + 3 * xx + 5 * yy) % 256,
                  (2 * d + 7 * xx + yy) % 256,
                  (3 * d + xx + 2 * yy) % 256)
    )
    assert lzw_decode(lzw_encode(raw), len(raw)) == raw


def test_tiff_planar2_roundtrip_and_rejections():
    """PlanarConfiguration 2: pixel values must be IDENTICAL to the
    chunky layout across compression/predictor/depth variants, for
    both per-component STRIPS (r10) and per-component TILES (r11,
    the last TIFF rejection retired); single-sample planar files
    stay honest rejections."""
    import pytest as _pytest

    from razulibs_spark.operators.tiff import decode_tiff, encode_tiff

    w, h = 7, 5
    pix = [((3 * x + 5 * y) % 256, (7 * x + y) % 256, (x + 2 * y) % 256)
           for y in range(h) for x in range(w)]
    flat = [v for p in pix for v in p]
    for kw in (
        {}, {"packbits": True}, {"lzw": True},
        {"lzw": True, "predictor2": True}, {"big_endian": True},
    ):
        m = decode_tiff(encode_tiff(w, h, pix, rgb=True, planar2=True,
                                    **kw))
        assert list(m["pixels"]) == flat, kw
        assert m["planar"] == 2 and m["n_channels"] == 3
    # 16-bit planar honors byte order per plane
    pix16 = [(a * 257, b * 257, c * 257) for a, b, c in pix]
    m = decode_tiff(encode_tiff(w, h, pix16, rgb=True, planar2=True,
                                bits=16, big_endian=True))
    assert m["pixels"] == [v for p in pix16 for v in p]
    with _pytest.raises(ValueError, match="spp > 1"):
        encode_tiff(3, 2, [1, 2, 3, 4, 5, 6], planar2=True)
    # planar-2 TILED (r11): per-plane tile grids round-trip exactly,
    # edge tiles zero-padded, across compression/predictor/endian
    tw, th = 37, 21  # spills past 16x16 tiles on both axes
    tpix = [((3 * x + 5 * y) % 256, (7 * x + y) % 256, (x + 2 * y) % 256)
            for y in range(th) for x in range(tw)]
    tflat = [v for p in tpix for v in p]
    for kw in (
        {}, {"packbits": True}, {"lzw": True, "predictor2": True},
        {"big_endian": True, "bits": 16},
    ):
        px = ([tuple(v * 257 for v in p) for p in tpix]
              if kw.get("bits") == 16 else tpix)
        m = decode_tiff(
            encode_tiff(tw, th, px, rgb=True, planar2=True, tiled=True,
                        **kw)
        )
        assert list(m["pixels"]) == [v for p in px for v in p], kw
        assert m["layout"] == "tiled" and m["planar"] == 2
    import struct as _s

    # decode a strip planar file claiming bad planar
    strip = encode_tiff(3, 2, [(1, 2, 3)] * 6, rgb=True)
    idx = strip.find(_s.pack("<HHI", 262, 3, 1))
    patched = (strip[:idx] + _s.pack("<HHI", 284, 3, 1)
               + _s.pack("<I", 5) + strip[idx + 12:])
    with _pytest.raises(ValueError, match="planar configuration 5"):
        decode_tiff(patched)


def test_arithmetic_jpeg_roundtrip():
    """SOF9 sequential arithmetic (T.81 Annex D QM-coder, VERDICT
    r11 next #8): decode stats are bit-identical to the Huffman
    encoding of the same pixels, across gray/RGB/odd sizes/4:2:0;
    the arithmetic file is genuinely smaller (the coder compresses);
    progressive-arithmetic (SOF10) stays a named rejection."""
    import numpy as np
    import pytest

    from razulibs_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
        encode_jpeg_flat_tiles,
    )

    rng = np.random.default_rng(42)
    for shape in [(8, 8), (13, 19), (40, 40, 3), (33, 47, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        m_h = decode_jpeg(encode_jpeg(px))
        m_a = decode_jpeg(encode_jpeg_arith(px))
        assert m_h == m_a, shape
    px = rng.integers(0, 256, size=(34, 50, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg_arith(px, subsampling="4:2:0")) == \
        decode_jpeg(encode_jpeg(px, subsampling="4:2:0"))
    assert len(encode_jpeg_arith(px)) < len(encode_jpeg(px))
    # flat tiles: bit-exact under SOF9 exactly like SOF0/SOF2
    base = encode_jpeg_flat_tiles(24, 16, lambda tx, ty: 5 + 11 * tx)
    ar = encode_jpeg_flat_tiles(
        24, 16, lambda tx, ty: 5 + 11 * tx, arith=True
    )
    assert decode_jpeg(base) == decode_jpeg(ar)
    assert b"\xff\xc9" in ar and b"\xff\xcc" in ar  # SOF9 + DAC
    # a SOF10 label on a SEQUENTIAL-shaped scan (Ss=0, Se=63) fails
    # closed by name under the progressive scan rules
    bad = ar.replace(b"\xff\xc9", b"\xff\xca")
    with pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg(bad)
    # malformed DAC fails closed
    # cs=0x0F → L=15 > U=0: invalid conditioning
    bad2 = ar.replace(b"\xff\xcc\x00\x06\x00\x10", b"\xff\xcc\x00\x06\x00\x0f")
    with pytest.raises(ValueError, match="DAC DC conditioning"):
        decode_jpeg(bad2)


def test_arithmetic_jpeg_restart_segments():
    """DRI + RSTn under SOF9: each restart segment resets the QM
    coder, the statistics and the DC predictions (T.81 F.1.4.1)."""
    import numpy as np

    from razulibs_spark.operators.jpeg import decode_jpeg
    from razulibs_spark.operators.jpeg import encode_jpeg_arith

    # hand-assemble: encode two MCU rows as separate arith streams
    # (fresh state each) and join with RST0 — the decoder must reset
    px = np.arange(16 * 8, dtype=np.uint8).reshape(16, 8) * 3 % 256
    whole = encode_jpeg_arith(px)
    m = decode_jpeg(whole)
    from razulibs_spark.operators.jpeg_arith import (
        AC_STAT_BINS, DC_STAT_BINS, ArithEncoder, Stats,
        encode_ac, encode_dc,
    )
    from razulibs_spark.operators.jpeg import _DCT, _ZZ_ROWS, _ZZ_COLS

    segs = []
    for row in range(2):
        enc = ArithEncoder()
        ds, as_ = Stats(DC_STAT_BINS), Stats(AC_STAT_BINS)
        st = {"dc_ctx": 0, "pred": 0}
        blk = px[row * 8:(row + 1) * 8, :].astype(float) - 128.0
        coefs = _DCT @ blk @ _DCT.T
        import numpy as _np
        zz = [int(v) for v in
              _np.round(coefs[_ZZ_ROWS, _ZZ_COLS]).astype(_np.int64)]
        encode_dc(enc, ds, st, zz[0], 0, 1)
        encode_ac(enc, as_, 5, zz)
        segs.append(enc.flush().replace(b"\xff", b"\xff\x00"))
    scan = segs[0] + b"\xff\xd0" + segs[1]
    # splice into the whole file: replace everything between SOS
    # header end and EOI, and add a DRI segment before SOS
    sos_at = whole.find(b"\xff\xda")
    sos_len = int.from_bytes(whole[sos_at + 2:sos_at + 4], "big")
    head = whole[:sos_at]
    head += b"\xff\xdd\x00\x04\x00\x01"  # DRI: restart every 1 MCU
    head += whole[sos_at:sos_at + 2 + sos_len]
    blob = head + scan + b"\xff\xd9"
    assert decode_jpeg(blob) == m


def test_lossless_jpeg_roundtrip():
    """SOF3 lossless (T.81 Annex H): decode is BIT-exact under all 7
    predictors and odd shapes; predictor/point-transform/restart
    misuse fails closed by name; SOF3 with 3 components rejects."""
    import numpy as np
    import pytest

    from razulibs_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_flat_tiles,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(7)
    for shape in [(8, 8), (13, 19), (1, 1), (3, 40)]:
        for pred in range(1, 8):
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            m = decode_jpeg(encode_jpeg_lossless(px, predictor=pred))
            assert m["mean_r"] == float(px.mean()), (shape, pred)
    blob = encode_jpeg_lossless(
        rng.integers(0, 256, size=(9, 9), dtype=np.uint8)
    )
    # Ss carries the predictor in lossless — 0 is invalid
    bad = blob.replace(b"\xff\xda\x00\x08\x01\x01\x00\x04\x00\x00",
                       b"\xff\xda\x00\x08\x01\x01\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="invalid predictor"):
        decode_jpeg(bad)
    # flat tiles ride the same oracle
    a = encode_jpeg_flat_tiles(24, 16, lambda tx, ty: 7 + 13 * ty,
                               lossless=True)
    b = encode_jpeg_flat_tiles(24, 16, lambda tx, ty: 7 + 13 * ty)
    assert decode_jpeg(a) == decode_jpeg(b)
    assert b"\xff\xc3" in a


def test_progressive_arithmetic_jpeg_roundtrip():
    """SOF10 progressive arithmetic (the last JPEG DCT mode): the
    full scan chain — interleaved DC first at Al=1, fixed-bin DC
    refinement, band-split AC first passes and their refinements —
    reconstructs the exact coefficients, so decode stats are
    bit-identical to the baseline Huffman encoding across gray/RGB/
    odd sizes/4:2:0."""
    import numpy as np

    from razulibs_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_flat_tiles,
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(5)
    for shape in [(8, 8), (13, 19), (40, 40, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg_progressive_arith(px)) == \
            decode_jpeg(encode_jpeg(px)), shape
    px = rng.integers(0, 256, size=(34, 50, 3), dtype=np.uint8)
    assert decode_jpeg(
        encode_jpeg_progressive_arith(px, subsampling="4:2:0")
    ) == decode_jpeg(encode_jpeg(px, subsampling="4:2:0"))
    blob = encode_jpeg_flat_tiles(
        24, 16, lambda tx, ty: 9 + 17 * tx, progressive_arith=True
    )
    assert b"\xff\xca" in blob and b"\xff\xcc" in blob
    assert decode_jpeg(blob) == decode_jpeg(
        encode_jpeg_flat_tiles(24, 16, lambda tx, ty: 9 + 17 * tx)
    )


def test_qm_coder_fuzz_roundtrip():
    """The QM arithmetic coder round-trips EXACTLY: random decision
    streams through adaptive contexts + the fixed bin, plus the
    carry/renorm stress patterns (all-MPS, all-LPS, alternating) —
    the invariant every JPEG arithmetic mode rests on."""
    import random

    from razulibs_spark.operators.jpeg_arith import (
        ArithDecoder,
        ArithEncoder,
        Stats,
    )

    rng = random.Random(12345)
    for trial in range(60):
        n_ctx = rng.randint(1, 8)
        seq = []
        for _ in range(rng.randint(1, 400)):
            if rng.random() < 0.1:
                seq.append(("fixed", rng.randint(0, 1)))
            else:
                ctx = rng.randrange(n_ctx)
                bit = 1 if rng.random() < (
                    0.05 + 0.9 * (ctx / max(1, n_ctx - 1))
                ) else 0
                seq.append((ctx, bit))
        enc = ArithEncoder()
        st_e = Stats(n_ctx)
        for ctx, bit in seq:
            if ctx == "fixed":
                enc.encode_fixed(bit)
            else:
                enc.encode(st_e, ctx, bit)
        data = enc.flush()
        dec = ArithDecoder(data)
        st_d = Stats(n_ctx)
        for j, (ctx, bit) in enumerate(seq):
            got = (
                dec.decode_fixed() if ctx == "fixed"
                else dec.decode(st_d, ctx)
            )
            assert got == bit, (trial, j)
    for pattern in ([0] * 2000, [1] * 2000, [0, 1] * 1000):
        enc = ArithEncoder()
        st = Stats(1)
        for b in pattern:
            enc.encode(st, 0, b)
        dec = ArithDecoder(enc.flush())
        st2 = Stats(1)
        for j, b in enumerate(pattern):
            assert dec.decode(st2, 0) == b, j


def test_progressive_arith_band_models_fuzz():
    """AC first (Al=1) + AC refine (Al=0) reconstruct random band
    coefficients exactly across random spectral bands — the
    scan-pair invariant behind SOF10."""
    import random

    from razulibs_spark.operators.jpeg_arith import (
        AC_STAT_BINS,
        ArithDecoder,
        ArithEncoder,
        Stats,
        decode_ac_first,
        decode_ac_refine,
        encode_ac_first,
        encode_ac_refine,
    )

    rng = random.Random(99)
    for trial in range(40):
        ss, se = sorted(rng.sample(range(1, 64), 2))
        blocks = []
        for _ in range(rng.randint(1, 30)):
            zz = [0] * 64
            for k in range(ss, se + 1):
                if rng.random() < 0.2:
                    zz[k] = rng.choice([1, -1, 2, -2, 3, -3]) * \
                        rng.choice([1, 4, 16])
            blocks.append(zz)
        enc1 = ArithEncoder()
        st1 = Stats(AC_STAT_BINS)
        for zz in blocks:
            encode_ac_first(enc1, st1, 5, zz, ss, se, 1)
        d1 = enc1.flush()
        enc2 = ArithEncoder()
        st2 = Stats(AC_STAT_BINS)
        for zz in blocks:
            encode_ac_refine(enc2, st2, zz, ss, se, 0)
        d2 = enc2.flush()
        dec1 = ArithDecoder(d1)
        s1 = Stats(AC_STAT_BINS)
        store = [[0] * 64 for _ in blocks]
        for zz in store:
            decode_ac_first(dec1, s1, 5, zz, ss, se, 1)
        dec2 = ArithDecoder(d2)
        s2 = Stats(AC_STAT_BINS)
        for zz in store:
            decode_ac_refine(dec2, s2, zz, ss, se, 0)
        assert store == blocks, (trial, ss, se)
