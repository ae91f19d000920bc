"""X8 multimodal plumbing: binary columns + mapInPandas featurize +
frame-sample plan. PNG and WAV decode for REAL via the pure-stdlib
codecs (multimodal/png.py, multimodal/wav.py); other codecs stay
honestly stubbed. The Spark-side schema/batching/partitioning is
pinned here alongside the codec round-trip/rejection contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_realtime_edu_spark.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_image,
    demo_media_frame,
    extract_features,
    frame_sample_plan,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    df = demo_media_frame(spark, n=64, partitions=4)
    df.cache().count()
    return df


def test_feature_extraction_schema_and_determinism(media):
    feats = extract_features(media, n_bins=16)
    assert feats.schema == FEATURE_SCHEMA
    rows1 = {r.media_id: r.feature for r in feats.collect()}
    rows2 = {r.media_id: r.feature for r in feats.collect()}
    assert rows1 == rows2  # deterministic across runs
    assert len(rows1) == 64
    for vec in rows1.values():
        assert len(vec) == 16
        assert abs(sum(vec) - 1.0) < 1e-9  # normalized histogram


def test_feature_extraction_repartition_invariant(media):
    a = {r.media_id: r.feature for r in extract_features(media).collect()}
    b = {
        r.media_id: r.feature
        for r in extract_features(media.repartition(13)).collect()
    }
    assert a == b  # partition-local op → partitioning can't change values


def test_metadata_only_query_needs_no_payload(media):
    # Column pruning: a metadata rollup must not touch payload bytes.
    counts = media.groupBy("modality").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in counts) == 64
    plan = media.groupBy("modality").count()._jdf.queryExecution().toString()
    physical = plan.split("Physical Plan")[-1].splitlines()
    # payload may only appear at the leaf scan (an in-memory RDD can't
    # prune at the source; parquet would) — every operator above must
    # project it away before the first exchange.
    leaves = ("Scan ExistingRDD", "InMemoryRelation")
    offenders = [
        ln
        for ln in physical
        if "payload" in ln and not any(leaf in ln for leaf in leaves)
    ]
    assert not offenders, offenders


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_nth=10)
    rows = plan.collect()
    assert all(r.frame_index % 10 == 0 for r in rows)
    n_videos = media.filter(F.col("modality") == "video").count()
    assert {r.media_id for r in rows} == {
        r.media_id for r in media.filter(F.col("modality") == "video").collect()
    }
    assert len(rows) >= n_videos


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png")


def test_resize_stage_composes_and_preserves_schema(media):
    resized = resize_images(media, width=32, height=48)
    assert resized.schema == MEDIA_SCHEMA  # stages compose
    rows = {r.media_id: r for r in resized.collect()}
    orig = {r.media_id: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for mid, r in rows.items():
        if r.modality == "image":
            assert (r.width, r.height) == (32, 48)
            assert bytes(r.payload) != bytes(orig[mid].payload)
        else:  # pass-through for non-images
            assert bytes(r.payload) == bytes(orig[mid].payload)
            assert (r.width, r.height) == (orig[mid].width, orig[mid].height)
    # deterministic + partitioning-invariant, and feeds the featurizer
    again = {r.media_id: bytes(r.payload)
             for r in resize_images(media.repartition(7), width=32, height=48).collect()}
    assert {m: bytes(r.payload) for m, r in rows.items()} == again
    feats = extract_features(resize_images(media, width=32, height=48))
    assert feats.count() == len(rows)


def test_png_codec_roundtrip_all_filters_and_channels():
    """Encode/decode must round-trip exactly for every channel count
    and with per-row filter types cycling through all five spec
    filters (heights ≥ 5 hit None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(42)
    for shape in [(7, 5, 1), (6, 9, 2), (8, 8, 3), (11, 4, 4), (1, 1, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for vary in (True, False):
            out = decode_png(encode_png(img, vary_filters=vary))
            assert out.shape == shape
            assert (out == img).all()


def test_png_codec_rejects_bad_input():
    import struct
    import zlib

    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal.png import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 32)
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    # corrupt one IDAT byte -> CRC failure
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth is out of scope and must say so
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(deep)
    # truncation INSIDE a chunk's 4-byte CRC must still be the
    # documented ValueError, not a struct.error leaking out of the
    # mapInPandas task
    ihdr_at = good.index(b"IHDR") - 4
    cut_in_crc = good[: ihdr_at + 8 + 13 + 2]  # len+tag+body+2 CRC bytes
    with pytest.raises(ValueError, match="truncated"):
        decode_png(cut_in_crc)


def test_decode_image_dispatches_png_and_jpeg(spark):
    """decode_image really decodes PNG and baseline grayscale JPEG
    payloads (dispatch on the payload magic); other formats keep the
    honest NotImplementedError."""
    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal import decode_image
    from flink_realtime_edu_spark.multimodal.jpeg import encode_jpeg
    from flink_realtime_edu_spark.multimodal.png import encode_png

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_image(encode_png(img), "image/png") == img).all()
    gray = np.full((8, 8), 77, dtype=np.uint8)
    assert (decode_image(encode_jpeg(gray), "image/jpeg") == gray).all()
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")


def test_jpeg_codec_rejects_bad_and_out_of_scope_input():
    """Scope limits must fail loudly: progressive SOF2, restart
    intervals, color scans and 16-bit quant tables are documented
    NotImplementedError; structural damage is ValueError — never a
    struct.error or silent garbage leaking out of a mapInPandas
    task."""
    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    good = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8))
    # flip SOF0 (0xC0) to SOF2 (0xC2): progressive is out of scope
    sof_at = good.index(b"\xff\xc0")
    prog = bytearray(good)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(prog))
    # truncated entropy stream must be the documented ValueError (a
    # noisy image at unit quant guarantees the cut lands mid-entropy)
    rng = np.random.default_rng(3)
    big = encode_jpeg(
        rng.integers(0, 256, (16, 16), dtype=np.uint8),
        quant=np.ones((8, 8), dtype=np.int64),
    )
    with pytest.raises(ValueError, match="truncated|marker|Huffman"):
        decode_jpeg(big[:-40] + b"\xff\xd9")
    # encoder scope: non-RGB channel counts, unknown subsampling,
    # bad quant tables ((H, W, 3) now encodes for real — color JPEG)
    with pytest.raises(NotImplementedError, match="RGB"):
        encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="grayscale"):
        encode_jpeg(np.zeros((8, 8, 3, 1), dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:2:2")
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg(
            np.zeros((8, 8), dtype=np.uint8),
            quant=np.zeros((8, 8), dtype=np.int64),
        )
    # truncation INSIDE the marker header stream must be the
    # documented ValueError, not IndexError/struct.error
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(b"\xff\xd8\xff")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xdb")
    dqt_at = good.index(b"\xff\xdb")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: dqt_at + 10])


def test_jpeg_decoder_honors_sof_quant_table_selector():
    """A valid file whose component selects quant table id 1 (Tq=1)
    must decode with THAT table — a decoder hardcoding slot 0 would
    silently dequantize with the wrong table and return garbage
    pixels with no error."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = np.kron(
        np.arange(4, dtype=np.uint8).reshape(2, 2) * 60 + 17,
        np.ones((8, 8), dtype=np.uint8),
    )
    good = encode_jpeg(img)
    # rewrite the DQT table id 0 -> 1 and the SOF component Tq 0 -> 1
    moved = bytearray(good)
    dqt_at = good.index(b"\xff\xdb")
    assert moved[dqt_at + 4] == 0x00  # Pq<<4 | Tq of the table def
    moved[dqt_at + 4] = 0x01
    sof_at = good.index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) id(1) samp(1) tq(1)
    assert moved[sof_at + 12] == 0x00
    moved[sof_at + 12] = 0x01
    assert np.array_equal(decode_jpeg(bytes(moved)), img)
    # and a file whose selected table is MISSING must fail loudly
    only_sof = bytearray(good)
    only_sof[sof_at + 12] = 0x01  # Tq=1 but only table 0 defined
    import pytest

    with pytest.raises(ValueError, match="missing quant"):
        decode_jpeg(bytes(only_sof))


def test_avi_mjpeg_roundtrip_sampling_and_rejects():
    """MJPEG-in-AVI: constant-block frames round-trip bit-exactly
    through container + per-frame JPEG; frame sampling keeps exactly
    the every-nth grid (and never entropy-decodes the rest); scope
    and damage fail loudly with the documented exception types."""
    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal import decode_video
    from flink_realtime_edu_spark.multimodal.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from flink_realtime_edu_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(5)
    frames_px = [
        np.kron(
            rng.integers(0, 256, (2, 3)).astype(np.uint8),
            np.ones((8, 8), dtype=np.uint8),
        )
        for _ in range(7)
    ]
    avi = encode_avi_mjpeg([encode_jpeg(p) for p in frames_px], 24, 16, fps=12)
    dec, fps = decode_avi_mjpeg(avi)
    assert fps == 12 and len(dec) == 7
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames_px))
    dec3, _ = decode_avi_mjpeg(avi, every_nth=3)
    assert len(dec3) == 3
    assert all(np.array_equal(a, frames_px[i]) for a, i in zip(dec3, [0, 3, 6]))
    # dispatch goes through decode_video; non-AVI keeps the stub
    dv, _ = decode_video(avi, "video/x-msvideo", every_nth=2)
    assert len(dv) == 4
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x20ftypisom", "video/mp4")
    # damage / scope errors
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(avi[:100])
    with pytest.raises(ValueError, match="zero-frame"):
        encode_avi_mjpeg([], 8, 8)
    with pytest.raises(ValueError, match="not a JPEG"):
        encode_avi_mjpeg([b"\x89PNG not jpeg"], 8, 8)
    # a non-MJPG video stream must say so, not decode garbage
    h264 = bytearray(avi)
    h264[avi.index(b"vids") + 4 : avi.index(b"vids") + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="only MJPG"):
        decode_avi_mjpeg(bytes(h264))


def test_avi_rec_lists_streams_and_fps_edge_cases():
    """Spec-edge AVI structure: 'rec ' interleave LISTs are descended
    (not silently skipped), frame chunks from an undeclared second
    stream raise instead of merging, fps round-trips exactly via
    strh rate/scale for large rates, and huge-frame byte-rate math
    clamps instead of leaking struct.error."""
    import struct

    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from flink_realtime_edu_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(11)
    frames_px = [
        np.kron(
            rng.integers(0, 256, (1, 2)).astype(np.uint8),
            np.ones((8, 8), dtype=np.uint8),
        )
        for _ in range(4)
    ]
    jpegs = [encode_jpeg(p) for p in frames_px]
    avi = encode_avi_mjpeg(jpegs, 16, 8, fps=12)

    # rebuild the movi body with frames 1..2 wrapped in a 'rec ' LIST
    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    movi_at = avi.index(b"LIST", avi.index(b"movi") - 8)
    (old_len,) = struct.unpack_from("<I", avi, movi_at + 4)
    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", jpegs[1]) + chunk(b"00dc", jpegs[2]))
    new_body = b"movi" + chunk(b"00dc", jpegs[0]) + rec + chunk(b"00dc", jpegs[3])
    rebuilt = (
        avi[:movi_at]
        + chunk(b"LIST", new_body)
        + avi[movi_at + 8 + old_len + old_len % 2 :]
    )
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    dec, fps = decode_avi_mjpeg(rebuilt)
    assert fps == 12 and len(dec) == 4
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames_px))
    # every_nth grid spans the rec boundary in stream order
    dec2, _ = decode_avi_mjpeg(rebuilt, every_nth=2)
    assert len(dec2) == 2
    assert all(np.array_equal(a, frames_px[i]) for a, i in zip(dec2, [0, 2]))

    # a frame chunk from a second, undeclared stream is loud
    bad = bytearray(avi)
    second = avi.index(b"00dc", avi.index(b"00dc") + 1)
    bad[second : second + 2] = b"01"
    with pytest.raises(NotImplementedError, match="undeclared"):
        decode_avi_mjpeg(bytes(bad))

    # exact fps round-trip where truncated us/frame would drift
    # (1e6//1400 = 714 -> round(1e6/714) = 1401 without rate/scale)
    hi = encode_avi_mjpeg(jpegs[:1], 16, 8, fps=1400)
    assert decode_avi_mjpeg(hi)[1] == 1400
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(jpegs[:1], 16, 8, fps=2_000_000)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(jpegs[:1], 16, 8, fps=0)

    # dwMaxBytesPerSec clamps; the header stays parseable
    big = jpegs[0] + b"\x00" * (80 << 20)  # pad past 2^32/60 bytes
    clamped = encode_avi_mjpeg([big], 16, 8, fps=60)
    (max_bps,) = struct.unpack_from("<I", clamped, clamped.index(b"avih") + 8 + 4)
    assert max_bps == 0xFFFFFFFF


def test_jpeg_color_roundtrip_and_structure():
    """Color JPEG (4:2:0 and 4:4:4): constant-macroblock images
    round-trip EXACTLY to ycbcr_to_rgb(rgb_to_ycbcr(img)) — the
    analytic property the query oracle leans on; the emitted stream
    carries the standard 3-component structure (two DQTs, four DHTs,
    per-component selectors); dimension probe and dispatch agree;
    chroma sampling actually subsamples (4:2:0 stream is smaller)."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal import decode_image
    from flink_realtime_edu_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_dimensions,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(7)
    mb = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    img = np.kron(mb, np.ones((16, 16, 1), dtype=np.uint8))
    expect = ycbcr_to_rgb(rgb_to_ycbcr(img))
    enc420 = encode_jpeg(img)
    enc444 = encode_jpeg(img, subsampling="4:4:4")
    for enc in (enc420, enc444):
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape and np.array_equal(dec, expect)
        assert jpeg_dimensions(enc) == img.shape[:2]
        assert enc.count(b"\xff\xdb") == 2 and enc.count(b"\xff\xc4") == 4
    # color transform is near-lossless: within ±1 of the source
    assert np.abs(expect.astype(int) - img.astype(int)).max() <= 1
    # 4:2:0 carries 6 blocks per 16x16 vs 4:4:4's 12 — smaller stream
    assert len(enc420) < len(enc444)
    # dispatch returns the 3-channel array
    assert decode_image(enc420, "image/jpeg").ndim == 3
    # non-16-multiple color images pad and crop back
    odd = rng.integers(0, 256, (19, 22, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == odd.shape


def test_codec_header_edge_cases_advice_r6():
    """ADVICE r6 findings: (1) an AVI whose headers carry no usable
    frame rate raises instead of returning fps=0; (2) stand-alone
    JPEG markers (TEM, fill bytes) in the header stream are skipped,
    stray RSTn raises a NAMED error; (3) encode_avi_mjpeg rejects
    frames whose SOF0 geometry differs from the declared size."""
    import struct

    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from flink_realtime_edu_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_dimensions,
    )

    px = np.kron(
        np.arange(2, dtype=np.uint8).reshape(1, 2) * 100 + 20,
        np.ones((8, 8), dtype=np.uint8),
    )
    jpg = encode_jpeg(px)  # 16 wide, 8 high
    assert jpeg_dimensions(jpg) == (8, 16)

    # (3) geometry mismatch between frame SOF0 and declared size
    with pytest.raises(ValueError, match="must share one geometry"):
        encode_avi_mjpeg([jpg], 8, 8)

    # (1) zero us/frame AND zeroed strh rate/scale -> loud error
    avi = bytearray(encode_avi_mjpeg([jpg], 16, 8, fps=10))
    avih_body = avi.index(b"avih") + 8
    struct.pack_into("<I", avi, avih_body, 0)  # us/frame = 0
    strh_body = avi.index(b"strh") + 8
    struct.pack_into("<II", avi, strh_body + 20, 0, 0)  # scale, rate
    with pytest.raises(ValueError, match="no usable frame rate"):
        decode_avi_mjpeg(bytes(avi))
    # rate/scale alone still recovers fps (avih stays zeroed)
    struct.pack_into("<II", avi, strh_body + 20, 1, 10)
    dec, fps = decode_avi_mjpeg(bytes(avi))
    assert fps == 10 and np.array_equal(dec[0], px)

    # (2) TEM + fill byte after SOI decode cleanly; stray RSTn is named
    padded = jpg[:2] + b"\xff\x01" + b"\xff\xff" + jpg[2:]
    assert np.array_equal(decode_jpeg(padded), px)
    assert jpeg_dimensions(padded) == (8, 16)
    with pytest.raises(ValueError, match="restart marker RST3"):
        decode_jpeg(jpg[:2] + b"\xff\xd3" + jpg[2:])
    with pytest.raises(ValueError, match="missing SOF"):
        jpeg_dimensions(b"\xff\xd8\xff\xd9")


def test_wav_codec_roundtrip_mono_stereo_and_rejects_bad_input():
    import struct

    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal import decode_audio
    from flink_realtime_edu_spark.multimodal.wav import decode_wav, encode_wav

    rng = np.arange(-5000, 5000, 7, dtype=np.int16)
    # mono 1-D input comes back as (n, 1); odd frame counts exercise
    # the RIFF even-padding path
    mono = rng[:1001]
    got, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and got.shape == (1001, 1)
    assert np.array_equal(got[:, 0], mono)
    # stereo interleave survives the round trip exactly
    st = np.stack([rng[:400], rng[100:500]], axis=1)
    got2, rate2 = decode_wav(encode_wav(st, 8000))
    assert rate2 == 8000 and np.array_equal(got2, st)
    # dispatch: RIFF magic routes to the codec, others refuse honestly
    got3, _ = decode_audio(encode_wav(mono, 22050), "audio/wav")
    assert np.array_equal(got3[:, 0], mono)
    with pytest.raises(NotImplementedError, match="mp3"):
        decode_audio(b"ID3\x04" + b"\x00" * 64, "audio/mp3")

    good = encode_wav(mono, 16000)
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[: len(good) - 3])
    # float PCM (format 3) is a different codec, not corruption
    fmt_at = good.index(b"fmt ") + 8
    floaty = bytearray(good)
    floaty[fmt_at : fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError, match="format 3"):
        decode_wav(bytes(floaty))
    # inconsistent block_align must be rejected, not misparsed
    broken = bytearray(good)
    broken[fmt_at + 12 : fmt_at + 14] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="inconsistent"):
        decode_wav(bytes(broken))


def test_resample_audio_real_decimation_and_passthrough(spark, media):
    """The audio resample stage really decodes/decimates/re-encodes
    WAV payloads (every-4th-frame content check against the source
    wave), updates metadata to match, passes through non-audio rows
    and non-WAV audio payloads byte-identically, and composes with
    the featurizer."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resample_audio,
    )
    from flink_realtime_edu_spark.multimodal.wav import decode_wav, encode_wav

    waves = {
        mid: ((mid * 37 + np.arange(2000) * 13) % 4096 - 2048).astype(np.int16)
        for mid in range(6)
    }
    rows = [
        (
            mid, "audio", "audio/wav", None, None, 16000, None,
            bytearray(encode_wav(w, 16000)),
        )
        for mid, w in waves.items()
    ] + [(99, "image", "image/png", 64, 64, None, None, bytearray(b"notpng" * 10)),
         (98, "audio", "audio/mp3", None, None, 44100, None, bytearray(b"ID3\x04" + b"x" * 40))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3, "media_id")

    out = {r.media_id: r for r in resample_audio(df, factor=4).collect()}
    for mid, w in waves.items():
        r = out[mid]
        assert r.sample_rate == 4000 and r.n_frames == len(w[::4])
        dec, rate = decode_wav(bytes(r.payload))
        assert rate == 4000 and np.array_equal(dec[:, 0], w[::4])
    # pass-through: non-audio and undecodable-codec rows untouched
    assert bytes(out[99].payload) == b"notpng" * 10
    assert bytes(out[98].payload) == b"ID3\x04" + b"x" * 40
    assert out[98].sample_rate == 44100

    # stages compose; the synthetic corpus (non-RIFF audio) flows
    # through the resampler unchanged end-to-end
    assert extract_features(resample_audio(df, factor=4)).count() == len(rows)
    a = {r.media_id: bytes(r.payload) for r in resample_audio(media, 4).collect()}
    b = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert a == b  # demo corpus audio is not RIFF: byte-identical


def test_phash63_exact_invariances():
    """The integer pHash kernel's exact properties: deterministic,
    63-bit (the BIGINT sign bit is never set — the oracle's SUM of
    shifted bits must agree in signed arithmetic), identical images
    hash identically, and a 2x nearest-neighbor upscale is EXACTLY
    invariant (floor-mean pooling of constant 2x2 cells recovers the
    base image bit-for-bit)."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal.phash import phash63

    rng = np.random.default_rng(20240815)
    for _ in range(25):
        base = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        h = phash63(base)
        assert 0 <= h < 2**63
        assert phash63(base.copy()) == h
        up = np.kron(base, np.ones((2, 2), dtype=np.uint8))
        assert phash63(up) == h
    # non-multiple-of-32 sides are a hard error, not silent cropping
    import pytest

    with pytest.raises(ValueError):
        phash63(np.zeros((33, 32), dtype=np.uint8))


def test_audio_fingerprint63_exact_invariances():
    """The integer audio-fingerprint kernel's exact properties:
    deterministic, 63-bit, identical clips fingerprint identically,
    uniform integer gain preserves the energy-delta sign profile
    (2x louder clip, same fingerprint), and non-whole-frame lengths
    are a hard error."""
    import numpy as np
    import pytest

    from flink_realtime_edu_spark.multimodal.audiofp import (
        N_FRAMES,
        audio_fingerprint63,
    )

    rng = np.random.default_rng(20260815)
    for _ in range(25):
        clip = rng.integers(-8000, 8000, size=(N_FRAMES * 50,)).astype(
            np.int16
        )
        h = audio_fingerprint63(clip)
        assert 0 <= h < 2**63
        assert audio_fingerprint63(clip.copy()) == h
        assert audio_fingerprint63((clip.astype(np.int64) * 2).astype(
            np.int64
        )) == h  # uniform gain: deltas keep their signs
    with pytest.raises(ValueError):
        audio_fingerprint63(np.zeros(N_FRAMES * 50 + 1, dtype=np.int16))


def test_mp3_metadata_walk_and_tag_skips():
    """Header-walk exactness: VBR frame sequence with padding bits,
    ID3v2 prefix and ID3v1 trailer — every reported stat equals the
    closed-form value from the public frame-size formula, and the
    walker is byte-position exact (consuming the stream twice gives
    identical results)."""
    from flink_realtime_edu_spark.multimodal.mp3meta import (
        BITRATE_KBPS,
        SAMPLE_RATES,
        build_mp3,
        mp3_metadata,
    )

    bis = [3 if i % 2 else 11 for i in range(9)]
    pads = [i % 3 == 1 for i in range(9)]
    pads = [int(p) for p in pads]
    p = build_mp3(
        bis, sr_idx=1, pad_bits=pads, id3v2_payload=b"junk" * 99,
        id3v1=True, seed=7,
    )
    m = mp3_metadata(p)
    sr = SAMPLE_RATES[1]
    assert m["n_frames"] == 9 and m["sample_rate"] == sr
    assert m["audio_bytes"] == sum(
        144000 * BITRATE_KBPS[b] // sr + pad for b, pad in zip(bis, pads)
    )
    assert m["bitrate_kbps_sum"] == sum(BITRATE_KBPS[b] for b in bis)
    assert m["duration_s_e6"] == (2 * 9 * 1152 * 1000000 + sr) // (2 * sr)
    assert m["has_id3v2"] and m["has_id3v1"]
    assert mp3_metadata(p) == m
    # without tags, the tag flags flip and the audio stats hold
    bare = build_mp3(bis, sr_idx=1, pad_bits=pads, seed=7)
    mb = mp3_metadata(bare)
    assert not mb["has_id3v2"] and not mb["has_id3v1"]
    assert mb["audio_bytes"] == m["audio_bytes"]


def test_mp3_metadata_error_contract():
    """Shared codec error contract: structural damage → ValueError,
    out-of-scope-but-valid → NotImplementedError."""
    from flink_realtime_edu_spark.multimodal.mp3meta import (
        BITRATE_KBPS,
        SAMPLE_RATES,
        build_mp3,
        mp3_metadata,
    )

    good = build_mp3([9, 9, 9], sr_idx=0)
    with pytest.raises(ValueError, match="truncated frame"):
        mp3_metadata(good[:-1])
    # zero the SECOND frame's sync byte (payload bytes are opaque)
    f1 = 144000 * BITRATE_KBPS[9] // SAMPLE_RATES[0]
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_metadata(good[:f1] + b"\x00" + good[f1 + 1:])
    with pytest.raises(ValueError, match="no MPEG frames"):
        mp3_metadata(b"")
    with pytest.raises(ValueError, match="extends past"):
        # ID3v2 declares more bytes than exist
        mp3_metadata(b"ID3\x03\x00\x00\x00\x00\x7f\x7f")
    # MPEG-2 (version bits 10) and Layer II headers are out of scope
    mpeg2 = bytes((good[0], good[1] & ~0x08)) + good[2:]
    with pytest.raises(NotImplementedError, match="MPEG-1 Layer III"):
        mp3_metadata(mpeg2)
    layer2 = bytes((good[0], (good[1] & ~0x06) | 0x04)) + good[2:]
    with pytest.raises(NotImplementedError, match="MPEG-1 Layer III"):
        mp3_metadata(layer2)
    free = good[:2] + bytes((good[2] & 0x0F,)) + good[3:]
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3_metadata(free)
    # ADVICE r11: an explicitly-passed EMPTY pad_bits list must trip
    # the length-mismatch ValueError, not silently become all-zeros
    with pytest.raises(ValueError, match="pad_bits length"):
        build_mp3([9, 9, 9], sr_idx=0, pad_bits=[])


def test_mp4_metadata_walk_and_nesting():
    """Atom-walk exactness over a multi-track skeleton, plus the spec
    behaviors: unknown leaf boxes are skipped, 64-bit largesize boxes
    parse, and both mvhd versions are read."""
    import struct

    from flink_realtime_edu_spark.multimodal.mp4meta import (
        build_mp4,
        mp4_metadata,
    )

    p = build_mp4(
        b"mp42", 1200, 7777,
        [(b"vide", b"avc1"), (b"soun", b"mp4a"), (b"soun", b"opus")],
        mdat_len=90, seed=4,
    )
    m = mp4_metadata(p)
    assert m == {
        "brand": "mp42", "timescale": 1200, "duration_units": 7777,
        "n_tracks": 3, "n_video": 1, "n_audio": 2,
        "codecs": "avc1,mp4a,opus", "mdat_bytes": 90,
    }
    # unknown top-level leaf box: skipped, stats unchanged
    skipped = p + struct.pack(">I", 12) + b"free" + b"\x00" * 4
    assert mp4_metadata(skipped) == m
    # largesize mdat: size field 1 + 64-bit size
    big = p + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 24) + b"x" * 8
    m2 = mp4_metadata(big)
    assert m2["mdat_bytes"] == 90 + 8


def test_mp4_metadata_error_contract():
    import struct

    from flink_realtime_edu_spark.multimodal.mp4meta import (
        build_mp4,
        mp4_metadata,
    )

    p = build_mp4(b"isom", 600, 1234, [(b"vide", b"avc1")])
    with pytest.raises(ValueError, match="overruns"):
        mp4_metadata(p[:-5])
    with pytest.raises(ValueError, match="no moov/mvhd"):
        mp4_metadata(p[:20])  # ftyp only
    with pytest.raises(NotImplementedError, match="fragmented"):
        mp4_metadata(p + struct.pack(">I", 8) + b"moof")
    with pytest.raises(ValueError, match="truncated box header"):
        mp4_metadata(p + b"\x00\x00\x00")
    # ADVICE r11: correctly-sized but short FULL-box payloads must hit
    # the documented ValueError contract, not struct.error/IndexError
    from flink_realtime_edu_spark.multimodal.mp4meta import _box, _full

    short_mvhd = _box(b"moov", _full(b"mvhd", 0, b""))
    with pytest.raises(ValueError, match="mvhd v0 payload shorter"):
        mp4_metadata(short_mvhd)
    short_mvhd1 = _box(b"moov", _full(b"mvhd", 1, bytes(16)))
    with pytest.raises(ValueError, match="mvhd v1 payload shorter"):
        mp4_metadata(short_mvhd1)
    good_mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, 600, 0) + bytes(80))
    short_hdlr = _box(
        b"moov",
        good_mvhd
        + _box(b"trak", _box(b"mdia", _full(b"hdlr", 0, bytes(4)))),
    )
    with pytest.raises(ValueError, match="hdlr too short"):
        mp4_metadata(short_hdlr)


def test_mp3_metadata_fuzz_roundtrip():
    """Hypothesis over the fixture-writer parameter space: any valid
    (bitrate indices, padding bits, sample rate, tags) combination
    must parse back to the closed-form stats — frame walking is exact
    arithmetic, so there is no tolerance anywhere."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_realtime_edu_spark.multimodal.mp3meta import (
        BITRATE_KBPS,
        SAMPLE_RATES,
        build_mp3,
        mp3_metadata,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        bis=st.lists(st.integers(1, 14), min_size=1, max_size=30),
        sri=st.integers(0, 2),
        pads=st.data(),
        id3v2=st.one_of(st.none(), st.binary(max_size=200)),
        id3v1=st.booleans(),
        seed=st.integers(0, 1000),
    )
    def run(bis, sri, pads, id3v2, id3v1, seed):
        pad_bits = pads.draw(
            st.lists(
                st.integers(0, 1), min_size=len(bis), max_size=len(bis)
            )
        )
        p = build_mp3(
            bis, sr_idx=sri, pad_bits=pad_bits, id3v2_payload=id3v2,
            id3v1=id3v1, seed=seed,
        )
        m = mp3_metadata(p)
        sr = SAMPLE_RATES[sri]
        assert m["n_frames"] == len(bis)
        assert m["sample_rate"] == sr
        assert m["audio_bytes"] == sum(
            144000 * BITRATE_KBPS[b] // sr + pad
            for b, pad in zip(bis, pad_bits)
        )
        assert m["bitrate_kbps_sum"] == sum(BITRATE_KBPS[b] for b in bis)
        assert m["duration_s_e6"] == (
            2 * len(bis) * 1152 * 1000000 + sr
        ) // (2 * sr)
        assert m["has_id3v2"] == (id3v2 is not None)
        assert m["has_id3v1"] == id3v1

    run()


def test_mp4_metadata_fuzz_roundtrip():
    """Hypothesis over the MP4 skeleton space: any track mix, brand,
    timescale/duration and mdat size must atom-walk back exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_realtime_edu_spark.multimodal.mp4meta import (
        build_mp4,
        mp4_metadata,
    )

    fourcc = st.sampled_from([b"avc1", b"hev1", b"mp4a", b"opus", b"mjpa"])
    track = st.tuples(st.sampled_from([b"vide", b"soun", b"text"]), fourcc)

    @settings(max_examples=60, deadline=None)
    @given(
        brand=st.sampled_from([b"isom", b"mp42", b"avc1"]),
        timescale=st.integers(1, 1_000_000),
        duration=st.integers(0, 2**31 - 1),
        tracks=st.lists(track, min_size=0, max_size=6),
        mdat_len=st.integers(0, 500),
        seed=st.integers(0, 1000),
    )
    def run(brand, timescale, duration, tracks, mdat_len, seed):
        p = build_mp4(
            brand, timescale, duration, tracks, mdat_len=mdat_len, seed=seed
        )
        m = mp4_metadata(p)
        assert m["brand"] == brand.decode()
        assert m["timescale"] == timescale
        assert m["duration_units"] == duration
        assert m["n_tracks"] == len(tracks)
        assert m["n_video"] == sum(1 for h, _ in tracks if h == b"vide")
        assert m["n_audio"] == sum(1 for h, _ in tracks if h == b"soun")
        assert m["codecs"] == ",".join(
            sorted(c.decode() for _, c in tracks)
        )
        assert m["mdat_bytes"] == mdat_len

    run()


def test_mp4_truncated_stsd_is_valueerror():
    """A trak whose stsd declares an entry but is too short for one
    must fail loudly (ValueError), never return an empty/garbage
    codec fourcc."""
    import struct

    from flink_realtime_edu_spark.multimodal.mp4meta import mp4_metadata

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag, payload):
        return box(tag, bytes(4) + payload)

    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 600, 100) + bytes(80))
    stsd = full(b"stsd", struct.pack(">I", 1))  # declares 1 entry, has none
    trak = box(
        b"trak",
        box(
            b"mdia",
            full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(12))
            + box(b"minf", box(b"stbl", stsd)),
        ),
    )
    payload = box(b"ftyp", b"isom" + bytes(4) + b"isom") + box(
        b"moov", mvhd + trak
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stsd"):
        mp4_metadata(payload)


def test_webp_dist_map_matches_spec_prefix():
    """The VP8L short-distance neighborhood table is GENERATED from
    the spec's ordering rule (webp.py docstring); pin the first rows
    against the spec's published table so a rule regression (or a
    wrong tie-break) fails here, not in an interop decode."""
    from flink_realtime_edu_spark.multimodal.webp import _DIST_MAP

    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    # every entry maps to a strictly-positive scan distance on any
    # image at least 9 px wide (the spec's max(1, dy*w + dx) clamp
    # never actually clamps there)
    assert all(dy * 9 + dx >= 1 for dx, dy in _DIST_MAP)


def test_webp_codec_roundtrip_exercises_every_path():
    """VP8L round-trips: every transform (subtract-green, all 14
    predictor modes, cross-color), the color cache, LZ77 run
    references, simple and normal Huffman codes, gray/RGB/RGBA
    inputs — all bit-exact (lossless is the contract, not a bound)."""
    import numpy as np

    from flink_realtime_edu_spark.multimodal.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    y, x = np.mgrid[0:21, 0:19]
    img = np.stack(
        [(y * 3 + x) % 256, (y + x * 2) % 256, (y * 5 + x * 7) % 256], axis=2
    ).astype(np.uint8)
    for mode in range(14):
        out = decode_webp_lossless(
            encode_webp_lossless(img, predictor_mode=mode)
        )
        assert (out[:, :, :3] == img).all(), f"predictor {mode}"
    for ce in [(0, 0, 0), (37, 211, 5), (255, 128, 64)]:
        out = decode_webp_lossless(encode_webp_lossless(img, color_element=ce))
        assert (out[:, :, :3] == img).all(), f"cross-color {ce}"
    # constant band → runs + cache; alpha channel varies (RGBA path)
    rgba = np.dstack([img, ((y * 7 + x * 3) % 256).astype(np.uint8)])
    rgba[:, :4] = rgba[:1, :1]  # constant corner band
    out = decode_webp_lossless(
        encode_webp_lossless(
            rgba, predictor_mode=11, color_element=(20, 40, 60),
            cache_bits=5, use_runs=True,
        )
    )
    assert (out == rgba).all()
    # no-options path + grayscale
    g = ((y + x) % 256).astype(np.uint8)
    out = decode_webp_lossless(
        encode_webp_lossless(g, subtract_green=False, use_runs=False)
    )
    assert (out[:, :, 0] == g).all() and (out[:, :, 3] == 255).all()


def test_webp_codec_rejects_bad_and_out_of_scope_input():
    """Error contract: corrupt containers are ValueError, documented
    out-of-scope features (palette transform, meta-huffman, lossy
    VP8) are loud NotImplementedError — the PNG palette precedent."""
    import struct

    import numpy as np
    import pytest as _pytest

    from flink_realtime_edu_spark.multimodal import decode_image
    from flink_realtime_edu_spark.multimodal.webp import (
        _VP8L_SIGNATURE,
        _BitWriter,
        decode_webp_lossless,
    )

    with _pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp_lossless(b"NOPE" + b"\x00" * 20)
    # lossy VP8 chunk → NotImplementedError through the dispatch
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + b"\x00" * 8
    with _pytest.raises(NotImplementedError, match="lossless"):
        decode_image(lossy, "image/webp")

    def vp8l(body_bits):
        bw = _BitWriter()
        bw.write(3, 14)  # width 4
        bw.write(3, 14)  # height 4
        bw.write(0, 1)   # alpha hint
        bw.write(0, 3)   # version
        for val, n in body_bits:
            bw.write(val, n)
        payload = bytes([_VP8L_SIGNATURE]) + bytes(bw.bytes) + b"\x00" * 8
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # transform-present + type 3 (color indexing / palette)
    with _pytest.raises(NotImplementedError, match="palette"):
        decode_webp_lossless(vp8l([(1, 1), (3, 2)]))
    # no transforms, no cache, meta-huffman bit set
    with _pytest.raises(NotImplementedError, match="meta-huffman"):
        decode_webp_lossless(vp8l([(0, 1), (0, 1), (1, 1)]))
    # bad signature byte
    bad = bytearray(vp8l([(0, 1)]))
    bad[20] = 0x2E
    with _pytest.raises(ValueError, match="signature"):
        decode_webp_lossless(bytes(bad))


def test_webp_codec_fuzz_roundtrip():
    """Hypothesis: arbitrary small images × arbitrary encoder options
    round-trip bit-exactly (the mp3/mp4 fuzz discipline applied to
    the VP8L codec)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_realtime_edu_spark.multimodal.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        sg=st.booleans(),
        runs=st.booleans(),
        cache=st.sampled_from([0, 1, 4, 8]),
        pred=st.one_of(st.none(), st.integers(0, 13)),
        ce=st.one_of(
            st.none(),
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
        ),
        flat=st.booleans(),
    )
    def check(w, h, ch, seed, sg, runs, cache, pred, ce, flat):
        rng = np.random.default_rng(seed)
        if flat:  # low-entropy image: exercises runs/cache/simple codes
            img = np.full((h, w, ch), rng.integers(0, 256), dtype=np.uint8)
        else:
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        data = encode_webp_lossless(
            img.squeeze(-1) if ch == 1 else img,
            subtract_green=sg, use_runs=runs, cache_bits=cache,
            predictor_mode=pred, color_element=ce,
        )
        out = decode_webp_lossless(data)
        assert out.shape == (h, w, 4)
        if ch == 1:
            assert (out[:, :, 0] == img[:, :, 0]).all()
            assert (out[:, :, 1] == img[:, :, 0]).all()
        else:
            assert (out[:, :, :3] == img[:, :, :3]).all()
        if ch == 4:
            assert (out[:, :, 3] == img[:, :, 3]).all()
        else:
            assert (out[:, :, 3] == 255).all()

    check()
