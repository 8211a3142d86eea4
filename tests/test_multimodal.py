"""Multimodal plumbing tests: binary payload schema, Arrow batch iteration,
deterministic decode stub, frame-sampling shape. The value-level correctness
of the query surface is covered by the oracle suite (mm01-mm03)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from tests.conftest import SF_SMALL
from xarray_sql_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, SF_SMALL)


def test_media_table_schema(media):
    fields = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(fields["content"], BinaryType)
    assert set(fields) == {"doc_id", "content", "media_type", "origin"}
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == set(mm.MEDIA_TYPES)


def test_decode_stub_is_deterministic_and_typed(media):
    out = mm.decode_media(media)
    rows = {r["doc_id"]: r for r in out.collect()}
    again = {r["doc_id"]: r for r in mm.decode_media(media).collect()}
    assert rows == again
    src = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    for doc_id, r in rows.items():
        assert r["digest"] == hashlib.md5(src[doc_id]).hexdigest()
        assert r["n_bytes"] == len(src[doc_id])
        if r["media_type"] == "image":
            assert r["width"] is not None and r["n_frames"] is None
        if r["media_type"] == "audio":
            assert r["sample_rate"] is not None and r["width"] is None
        if r["media_type"] == "video":
            assert r["n_frames"] is not None and r["duration_s"] is not None


def test_decode_batch_kernel_sees_batches():
    # The mapInPandas kernel contract: pandas DataFrame in, DataFrame out,
    # one per Arrow batch, row count preserved, no pandas index leakage.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "content": [b"abc", b"defg"],
            "media_type": ["image", "audio"],
            "origin": ["t", "t"],
        }
    )
    outs = list(mm._decode_batches(iter([pdf, pdf])))
    assert len(outs) == 2
    assert list(outs[0]["doc_id"]) == [1, 2]
    assert outs[0].loc[0, "digest"] == hashlib.md5(b"abc").hexdigest()


def test_frame_sampling_stride(media):
    frames = mm.sample_frames(media)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % mm.FRAME_STRIDE == 0).all()
    meta = mm.decode_media(media).filter(F.col("media_type") == "video").toPandas()
    expected = int(((meta["n_frames"] - 1) // mm.FRAME_STRIDE + 1).sum())
    assert len(pdf) == expected


def test_features_shape(media):
    feats = mm.extract_features(media)
    row = feats.first()
    assert len(row["features"]) == mm.N_FEATURES
    assert all(-1.0 <= v <= 1.0 for v in row["features"])


def test_container_parsers_against_handcrafted_headers():
    """Golden header bytes assembled inline from the public file-format
    specs (independent of the library's header builders): PNG with a real
    IHDR CRC, GIF87a, BMP with top-down (negative) height, canonical WAV.
    A corrupted PNG CRC must raise, not return wrong dims."""
    import struct
    import zlib

    # PNG 640x480: signature, IHDR length, type, data, crc
    ihdr = struct.pack(">II", 640, 480) + bytes([8, 2, 0, 0, 0])
    png = (
        bytes([0x89]) + b"PNG\r\n" + bytes([0x1A]) + b"\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + b"BODY"
    )
    info = mm.parse_container(png)
    assert (info["format"], info["width"], info["height"]) == ("png", 640, 480)
    assert png[info["header_len"]:] == b"BODY"

    corrupt = bytearray(png)
    corrupt[20] ^= 0xFF  # flip a dim byte; stored CRC now mismatches
    with pytest.raises(ValueError, match="CRC"):
        mm.parse_container(bytes(corrupt))

    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + bytes([0x91, 0, 0]) + b"X"
    info = mm.parse_container(gif)
    assert (info["format"], info["width"], info["height"]) == ("gif", 320, 200)

    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + 3, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 800, -600, 1, 24, 0, 3, 0, 0, 0, 0)
        + b"xyz"
    )
    info = mm.parse_container(bmp)
    assert (info["format"], info["width"], info["height"]) == ("bmp", 800, 600)
    assert bmp[info["header_len"]:] == b"xyz"

    body = b"\x01\x02" * 11025
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 22050, 44100, 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    info = mm.parse_container(wav)
    assert (info["format"], info["sample_rate"], info["byte_rate"]) == ("wav", 22050, 44100)
    assert info["data_len"] == len(body)  # exactly 0.5 s of mono 16-bit

    assert mm.parse_container(b"not a media file") is None


def test_encoded_media_real_header_decode(spark):
    """decode_media over the encoded fixture must recover the PLANTED
    dims/rates by parsing bytes: width/height/sample_rate equal the
    doc_id arithmetic the writer used, digest is the body's md5, and
    n_bytes includes the header length for the planted format."""
    enc = mm.encoded_media_table(spark, SF_SMALL)
    decoded = {r["doc_id"]: r for r in mm.decode_media(enc).collect()}
    src = {r["doc_id"]: r for r in enc.collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    assert len(decoded) == len(texts) > 0
    for doc_id, r in decoded.items():
        body = texts[doc_id].encode("utf-8")
        assert r["digest"] == hashlib.md5(body).hexdigest() or r["media_type"] == "video"
        if r["media_type"] == "image":
            assert r["width"] == 160 + (doc_id * 37) % 1760
            assert r["height"] == 90 + (doc_id * 53) % 990
            assert r["digest"] == hashlib.md5(body).hexdigest()
        elif r["media_type"] == "audio":
            sr = 8000 + (doc_id * 13) % 40000
            assert r["sample_rate"] == sr
            assert r["duration_s"] == (len(body) * 1_000_000 // (2 * sr)) / 1e6
        assert r["n_bytes"] == len(bytes(src[doc_id]["content"]))


def test_decode_sniff_gated_by_media_type():
    """Magic prefixes are weak: a video/raw payload whose text starts
    with 'BM' (or any container magic) must NOT be parsed as a container
    — the sniff is gated on the declared media_type, and a type/format
    disagreement also falls back to the stub."""
    text = b"BMW dealers list " + b"x" * 40  # >= 26 bytes, 'BM' prefix
    meta = mm._decode_one(text, "video")
    assert meta["digest"] == hashlib.md5(text).hexdigest()  # md5 stub path
    assert meta["n_frames"] is not None
    # an image-typed row carrying a WAV container is a disagreement too
    wav = mm.wav_header(22050, 4) + b"abcd"
    meta = mm._decode_one(wav, "image")
    assert meta["digest"] == hashlib.md5(wav).hexdigest()  # stub, not parse


def test_wav_zero_byte_rate_no_crash():
    """A corrupt WAV header with byte_rate 0 leaves duration unknown
    instead of dividing by zero inside the Spark task."""
    import struct

    wav = bytearray(mm.wav_header(22050, 4) + b"abcd")
    wav[28:32] = struct.pack("<I", 0)  # byte_rate = 0
    meta = mm._decode_one(bytes(wav), "audio")
    assert meta["sample_rate"] == 22050
    assert meta["duration_s"] is None


def test_resize_fits_max_side_and_preserves_aspect(spark):
    from xarray_sql_spark.operators.multimodal import media_table, resize_images

    out = resize_images(media_table(spark, SF_SMALL)).toPandas()
    assert len(out) > 0
    assert (out[["out_w", "out_h"]].max(axis=1) == 224).all()  # long side hits the target
    # aspect preserved to integer-floor precision
    for r in out.itertuples():
        assert r.out_w == r.width * 224 // max(r.width, r.height)
        assert r.out_h == r.height * 224 // max(r.width, r.height)


def test_jpeg_sof_marker_scan():
    """JPEG dims come from a marker SCAN (ITU T.81), not a fixed offset:
    a COM segment before a progressive SOF2 must not break the parse, and
    header_len must land exactly at the end of the SOF segment."""
    import struct

    com = b"\xff\xfe" + struct.pack(">H", 2 + 7) + b"comment"
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 1080, 1920, 1) + bytes(
        [1, 0x11, 0]
    )
    jpg = b"\xff\xd8" + com + sof2 + b"BODY"
    info = mm.parse_container(jpg)
    assert (info["format"], info["width"], info["height"]) == ("jpeg", 1920, 1080)
    assert jpg[info["header_len"]:] == b"BODY"

    # the library's own planted header parses to the planted dims
    planted = mm.jpeg_header(640, 360) + b"tail"
    info = mm.parse_container(planted)
    assert (info["width"], info["height"]) == (640, 360)
    assert len(mm.jpeg_header(640, 360)) == mm.JPEG_HEADER_LEN
    assert planted[info["header_len"]:] == b"tail"

    # SOS before any SOF is malformed -> None, not a crash
    sos = b"\xff\xda" + struct.pack(">H", 2)
    assert mm.parse_container(b"\xff\xd8" + sos) is None


def test_truncated_magic_prefixes_return_none():
    """A payload matching a container magic but too short for the header
    must fall back to the md5 stub (return None), never crash the whole
    mapInPandas task (round-6 ADVICE)."""
    truncs = [
        b"\x89PNG\r\n\x1a\n",                      # PNG sig only
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR\x01",  # partial IHDR
        b"GIF89a\x40\x01",                          # partial screen desc
        b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00",    # fmt chunk cut short
        b"\xff\xd8\xff\xe0\x00",                    # JPEG APP0 cut at len
        b"\xff\xd8\xff",                            # bare SOI + half marker
        b"BM\x00",                                  # BMP under 26 bytes
    ]
    for t in truncs:
        assert mm.parse_container(t) is None, t


def test_planted_gif_has_no_phantom_color_table():
    """Packed byte must not declare a global color table the fixture never
    writes (a real decoder would eat 768 body bytes as the table)."""
    g = mm.gif_header(100, 50)
    assert len(g) == mm.GIF_HEADER_LEN
    assert g[10] & 0x80 == 0  # GCT flag clear


def test_mp3_header_roundtrip_and_guards():
    """The MP3 branch unpacks exactly the planted indices; free-format,
    reserved indices, and truncated syncs fall back to None; JPEG's SOI
    (0xFF 0xD8) never reaches the MP3 branch."""
    for br_idx in (1, 9, 14):
        for sr_idx in (0, 1, 2):
            for mode in (0, 3):
                p = mm.mp3_header(br_idx, sr_idx, mode) + b"body"
                info = mm.parse_container(p)
                assert info is not None and info["format"] == "mp3"
                assert info["bitrate_kbps"] == mm.MP3_BITRATES[br_idx]
                assert info["sample_rate"] == mm.MP3_RATES[sr_idx]
                assert info["mode"] == mode
                assert info["data_len"] == 4
    # free-format bitrate (0) and reserved sample rate (3): not parseable
    assert mm.parse_container(mm.mp3_header(0, 1, 0) + b"x") is None
    assert mm.parse_container(mm.mp3_header(5, 3, 0) + b"x") is None
    # truncated: sync byte alone
    assert mm.parse_container(b"\xff\xfb") is None
    # JPEG SOI is not an MP3 frame (version/layer bits fail)
    j = mm.parse_container(mm.jpeg_header(320, 240) + b"x")
    assert j is not None and j["format"] == "jpeg"


def test_mp4_header_roundtrip_and_guards():
    """mm09's ISO-BMFF walk: planted box bytes -> parsed fields roundtrip;
    every prefix truncation degrades to None (never an exception); the
    64-bit largesize variant and v1 full boxes parse; other containers'
    magics never reach the ftyp branch."""
    import struct

    body = b"clip body bytes" * 7
    for brand in mm.MP4_BRANDS:
        for ts in mm.MP4_TIMESCALES:
            h = mm.mp4_header(brand, ts, 4321, 1280, 720)
            p = h + struct.pack(">I", 8 + len(body)) + b"mdat" + body
            info = mm.parse_container(p)
            assert info is not None and info["format"] == "mp4"
            assert info["brand"] == brand
            assert info["timescale"] == ts
            assert info["duration_units"] == 4321
            assert (info["width"], info["height"]) == (1280, 720)
            assert info["data_len"] == len(body)
            assert info["header_len"] == len(h) + 8
            assert len(p) == len(body) + mm.MP4_FIXED_OVERHEAD
    # every truncation point: None, never a crash
    full = mm.mp4_header("isom", 600, 99, 64, 48)
    for cut in range(len(full)):
        assert mm._parse_mp4(full[:cut]) is None, cut
    # v1 mvhd (64-bit times) + v1 tkhd parse through the version branch
    mvhd1 = (
        struct.pack(">I", 40) + b"mvhd" + struct.pack(">Bxxx", 1)
        + struct.pack(">QQIQ", 0, 0, 1000, 5000)
    )
    tkhd1 = (
        struct.pack(">I", 104) + b"tkhd" + struct.pack(">Bxxx", 1)
        + struct.pack(">QQIxxxxQ", 0, 0, 1, 5000)
        + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
        + struct.pack(">II", 320 << 16, 240 << 16)
    )
    trak = struct.pack(">I", 8 + len(tkhd1)) + b"trak" + tkhd1
    moov = struct.pack(">I", 8 + len(mvhd1) + len(trak)) + b"moov" + mvhd1 + trak
    ftyp = (
        struct.pack(">I", 24) + b"ftyp" + b"isom" + struct.pack(">I", 0)
        + b"isommp42"
    )
    r = mm._parse_mp4(ftyp + moov)
    assert r == {
        "format": "mp4", "header_len": len(ftyp + moov), "brand": "isom",
        "timescale": 1000, "duration_units": 5000, "width": 320,
        "height": 240, "data_len": 0,
    }
    # 64-bit largesize mdat: size field 1 + 8-byte size after the type
    big = ftyp + moov + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 5) + b"hello"
    r2 = mm._parse_mp4(big)
    assert r2 is not None and r2["data_len"] == 5
    # a zero-size box (malformed) stops the walk instead of looping
    assert mm._parse_mp4(struct.pack(">I", 0) + b"ftypisom") is None
    # empty-declared tkhd (size 8, zero body): no version byte to read —
    # must skip the track, not IndexError (round-8 ADVICE repro)
    empty_tkhd = struct.pack(">I", 8) + b"tkhd"
    trak_e = struct.pack(">I", 8 + len(empty_tkhd)) + b"trak" + empty_tkhd
    moov_e = (
        struct.pack(">I", 8 + len(mvhd1) + len(trak_e)) + b"moov"
        + mvhd1 + trak_e
    )
    assert mm._parse_mp4(ftyp + moov_e) is None  # dims missing -> fallback
    # other magics keep their branch: WAV's RIFF at 0..4 has no ftyp at 4..8
    w = mm.parse_container(mm.wav_header(32000, 4) + b"\x00" * 4)
    assert w is not None and w["format"] == "wav"


def test_mp4_census_matches_oracle(spark):
    from tests.oracle_harness import compare
    from xarray_sql_spark.queries import REGISTRY

    spec = REGISTRY["mm09_mp4_census"]
    compare(spec.fn(spark, SF_SMALL), spec.oracle, SF_SMALL)


def test_every_container_parser_survives_every_byte_prefix():
    """Uniform no-crash net across the WHOLE container family: every byte
    prefix of every planted header+body must return None or a dict —
    never raise — because one malformed blob must never kill an entire
    mapInPandas task (the per-format hand-picked truncations above each
    cover one failure mode; this sweep covers all of them exhaustively).
    The full payload must still sniff as its own format."""
    import struct

    body = b"payload-bytes" * 3
    payloads = {
        "png": mm.png_header(320, 200) + body,
        "gif": mm.gif_header(64, 48) + body,
        "jpeg": mm.jpeg_header(640, 480) + body,
        "bmp": mm.bmp_header(32, 16, len(body)) + body,
        "wav": mm.wav_header(44100, len(body)) + body,
        "mp3": mm.mp3_header(5, 1, 1) + body,
        "mp4": mm.mp4_header("isom", 600, 777, 320, 240)
        + struct.pack(">I", 8 + len(body)) + b"mdat" + body,
    }
    for fmt, payload in payloads.items():
        full = mm.parse_container(payload)
        assert full is not None and full["format"] == fmt, fmt
        for cut in range(len(payload)):
            r = mm.parse_container(payload[:cut])  # must not raise
            assert r is None or isinstance(r, dict), (fmt, cut)


def test_exif_walk_roundtrip_and_guards():
    """mm10's TIFF IFD walk: planted APP1 bytes -> parsed fields
    roundtrip in BOTH byte orders; every byte prefix degrades to None
    (never an exception); a JPEG without APP1 parses as a plain
    container but yields no EXIF."""
    for bo in ("II", "MM"):
        for orient in (1, 5, 8):
            app1 = mm.exif_app1(bo, orient, 300, "2024:01:05 06:07:08")
            p = b"\xff\xd8" + app1 + mm.jpeg_header(640, 480)[2:] + b"body"
            exif = mm._parse_exif(p)
            assert exif == {
                "byte_order": bo, "orientation": orient,
                "xres_num": 300, "xres_den": 1,
                "exif_datetime": "2024:01:05 06:07:08",
            }
            # the ordinary container sniff still sees the JPEG dims
            info = mm.parse_container(p)
            assert (info["format"], info["width"], info["height"]) == (
                "jpeg", 640, 480,
            )
            assert len(p) == 4 + mm.EXIF_HEADER_LEN
    # never-crash: every truncation point of a full EXIF JPEG
    full = b"\xff\xd8" + mm.exif_app1("MM", 3, 72, "2024:01:01 00:00:00") \
        + mm.jpeg_header(32, 16)[2:]
    for cut in range(len(full)):
        r = mm._parse_exif(full[:cut])
        assert r is None or isinstance(r, dict), cut
    # plain JPEG (no APP1): container yes, EXIF no
    plain = mm.jpeg_header(100, 50) + b"x"
    assert mm.parse_container(plain)["format"] == "jpeg"
    assert mm._parse_exif(plain) is None
    # APP1 that is XMP, not Exif: skipped, walk continues to SOS/None
    import struct
    xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns.x"
    assert mm._parse_exif(b"\xff\xd8" + xmp + b"\xff\xd9") is None


def test_exif_census_matches_oracle(spark):
    from tests.oracle_harness import compare
    from xarray_sql_spark.queries import REGISTRY

    spec = REGISTRY["mm10_exif_census"]
    compare(spec.fn(spark, SF_SMALL), spec.oracle, SF_SMALL)


def test_exif_gps_walk_roundtrip_and_pointer_guards():
    """mm11's two-level IFD walk: planted GPS values roundtrip in both
    byte orders; a GPS pointer CYCLE (0x8825 pointing back at IFD0) and
    an out-of-range pointer return None instead of looping/crashing;
    every byte prefix degrades to None (never an exception)."""
    import struct

    for bo in ("II", "MM"):
        app1 = mm.exif_gps_app1(
            bo, 7, ("S", 33, 51, 359, 10), ("W", 151, 12, 571, 10), (58, 100)
        )
        p = b"\xff\xd8" + app1 + mm.jpeg_header(64, 32)[2:] + b"x"
        g = mm._parse_exif_gps(p)
        assert g is not None and g["byte_order"] == bo
        assert (g["lat_ref"], g["lat_deg"], g["lat_min"]) == ("S", 33, 51)
        assert (g["lat_sec_num"], g["lat_sec_den"]) == (359, 10)
        assert (g["lon_ref"], g["lon_deg"]) == ("W", 151)
        assert (g["alt_num"], g["alt_den"]) == (58, 100)
        # mm10's single-level walk must NOT see this fixture as its own
        # (different tag set) — family separation, not accidental overlap
        assert mm._parse_exif(p) is None
        # truncation sweep: never raise
        for cut in range(len(p)):
            r = mm._parse_exif_gps(p[:cut])
            assert r is None or isinstance(r, dict), (bo, cut)

    # pointer cycle: rewrite the GPS pointer value to IFD0's own offset.
    # The 0x8825 entry is IFD0's second: its 4-byte value sits at TIFF
    # offset 8 (ifd0) + 2 (count) + 12 (first entry) + 8 (tag/typ/cnt).
    app1 = bytearray(
        mm.exif_gps_app1("II", 1, ("N", 1, 2, 3, 10), ("E", 4, 5, 6, 10), (7, 100))
    )
    tiff0 = 4 + 6  # marker+len, then 'Exif\x00\x00'
    val_at = tiff0 + 8 + 2 + 12 + 8
    app1[val_at : val_at + 4] = struct.pack("<I", 8)  # -> IFD0 itself
    p = b"\xff\xd8" + bytes(app1) + mm.jpeg_header(64, 32)[2:]
    assert mm._parse_exif_gps(p) is None  # cycle guard, no loop

    # out-of-range pointer
    app1[val_at : val_at + 4] = struct.pack("<I", 60000)
    p = b"\xff\xd8" + bytes(app1) + mm.jpeg_header(64, 32)[2:]
    assert mm._parse_exif_gps(p) is None

    # deterministic random single-byte corruptions: never raise
    base = b"\xff\xd8" + mm.exif_gps_app1(
        "MM", 2, ("N", 10, 20, 30, 10), ("E", 40, 50, 60, 10), (70, 100)
    ) + mm.jpeg_header(32, 16)[2:]
    for i in range(0, len(base), 3):
        for flip in (0x00, 0xFF, 0x80):
            mutated = base[:i] + bytes([flip]) + base[i + 1 :]
            r = mm._parse_exif_gps(mutated)
            assert r is None or isinstance(r, dict), (i, flip)


def test_exif_gps_census_matches_oracle(spark):
    from tests.oracle_harness import compare
    from xarray_sql_spark.queries import REGISTRY

    spec = REGISTRY["mm11_exif_gps_census"]
    compare(spec.fn(spark, SF_SMALL), spec.oracle, SF_SMALL)
