"""Multimodal plumbing tests: schema, Arrow batch flow, the real BMP
codec, and deterministic stubs."""

from __future__ import annotations

import pytest

from habits_etl_spark.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_schema(spark):
    m = synthetic_media(spark, 30)
    assert [f.name for f in m.schema.fields] == [
        "media_id", "kind", "content", "n_bytes", "mime",
    ]
    rows = m.collect()
    assert len(rows) == 30
    assert all(isinstance(r.content, (bytes, bytearray)) for r in rows)
    assert {r.kind for r in rows} == {"image", "audio", "video"}


def test_decode_media_undecodable_reports_zeros(spark):
    decoded = decode_media(synthetic_media(spark, 30)).collect()
    assert len(decoded) == 30
    by_id = {r.media_id: r for r in decoded}
    # raw synthetic payloads match no codec: decode honesty is zeros
    # with codec='none', never a geometry fabricated from header bytes
    # (r8: stub deleted); refusals stay countable downstream
    assert all((r.width, r.height, r.duration_ms) == (0, 0, 0) for r in decoded)
    assert all(r.codec == "none" for r in decoded)
    assert all(len(r.checksum) == 32 for r in decoded)
    # deterministic: second run identical
    again = {r.media_id: r for r in decode_media(synthetic_media(spark, 30)).collect()}
    assert {k: (v.width, v.checksum) for k, v in by_id.items()} == {
        k: (v.width, v.checksum) for k, v in again.items()
    }


def test_extract_features_shape(spark):
    feats = extract_features(synthetic_media(spark, 12)).collect()
    assert len(feats) == 12
    assert all(len(r.feature) == FEATURE_DIM for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.feature)


def test_sample_frames_fallback_chunks_nonvideo_payloads(spark):
    frames = sample_frames(synthetic_media(spark, 30), every_n_bytes=16)
    rows = frames.collect()
    assert rows, "video rows must produce frames"
    one = [r for r in rows if r.media_id == rows[0].media_id]
    assert [r.frame_no for r in one] == list(range(len(one)))
    assert all(len(r.frame_bytes) == 16 for r in one[:-1])


def test_sample_frames_real_mjpeg_frames(spark):
    """MJPEG AVI payloads yield their REAL frames: one row per movi
    chunk, each independently decodable with decode_jpeg to the exact
    pixel field the generator encoded."""
    import numpy as np

    from habits_etl_spark.multimodal import (
        _gen_frames,
        decode_jpeg,
        synthetic_media,
        with_real_video,
    )

    media = with_real_video(synthetic_media(spark, 30))
    rows = sample_frames(media).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert by_id
    for mid, seq in by_id.items():
        expect, _fps = _gen_frames(mid)
        seq.sort(key=lambda r: r.frame_no)
        assert [r.frame_no for r in seq] == list(range(len(expect)))
        for r, want in zip(seq, expect):
            got = decode_jpeg(bytes(r.frame_bytes))
            assert got is not None and got.shape == want.shape
            # JPEG is lossy: pixels are close, not byte-equal
            err = np.abs(got.astype(int) - want.astype(int)).mean()
            assert err < 12.0


def test_mjpeg_avi_roundtrip_and_golden_fixture():
    """The real video codec: encode->decode round-trips frame count,
    fps and near-identical pixels; the committed fixture decodes to
    KNOWN per-frame channel means; malformed payloads are rejected,
    not mis-parsed."""
    import os

    import numpy as np

    from habits_etl_spark.multimodal.avi import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )

    yy, xx = np.mgrid[0:12, 0:14]
    base = np.stack(
        [(xx * 18 + 7) % 256, (yy * 21 + 3) % 256, (xx * 5 + yy * 9) % 256],
        axis=-1,
    ).astype(np.uint8)
    frames = [np.roll(base, f, axis=1) for f in range(3)]
    data = encode_mjpeg_avi(frames, fps=8, quality=90)
    # deterministic bytes
    assert encode_mjpeg_avi(frames, fps=8, quality=90) == data
    out = decode_mjpeg_avi(data)
    assert out is not None
    dec, rate, scale = out
    assert (len(dec), rate, scale) == (3, 8, 1)
    for got, want in zip(dec, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 6.0

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "gradient3_12x14_8fps.avi"
    )
    fdata = open(fixture, "rb").read()
    fout = decode_mjpeg_avi(fdata)
    assert fout is not None
    fdec, frate, fscale = fout
    assert (len(fdec), frate, fscale) == (3, 8, 1)
    golden = [
        [123.553571, 118.511905, 81.732143],
        [123.505952, 118.494048, 82.0],
        [123.64881, 118.428571, 81.863095],
    ]
    for f, g in zip(fdec, golden):
        assert [
            round(float(f[:, :, i].mean()), 6) for i in range(3)
        ] == pytest.approx(g, abs=1e-6)

    # rejections: not an AVI / truncated / a movi frame that is not a
    # baseline JPEG (strict: one bad frame rejects the whole payload)
    assert decode_mjpeg_avi(b"definitely not an avi") is None
    assert decode_mjpeg_avi(fdata[: len(fdata) // 2]) is None
    bad = bytearray(fdata)
    i = bad.find(b"\xff\xd8\xff")  # first frame's SOI
    bad[i : i + 2] = b"XX"
    assert decode_mjpeg_avi(bytes(bad)) is None


def test_decode_media_surfaces_jpeg_refusal_and_decodes_progressive(spark):
    """A REAL progressive JPEG (SOF2, multi-scan) decodes through
    decode_media with true dims; a MALFORMED one (a baseline stream
    whose SOF marker is flipped to SOF2 — its interleaved Ss=0,Se=63
    scan is invalid progressive) is refused VISIBLY as codec='none'
    with zero geometry — countable by downstream corpus stats, not a
    silent feature-less row."""
    import os

    import numpy as np

    from habits_etl_spark.multimodal.jpeg import encode_jpeg

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "gradient_14x12.jpg"
    )
    data = open(fixture, "rb").read()
    malformed = bytearray(data)
    malformed[malformed.find(b"\xff\xc0") + 1] = 0xC2
    rng = np.mgrid[0:12, 0:14]
    px = np.stack([(rng[1] * 18) % 256, (rng[0] * 21) % 256, (rng[0] + rng[1]) % 256], axis=-1).astype(np.uint8)
    real_prog = encode_jpeg(px, 90, progressive=True)
    df = spark.createDataFrame(
        [
            (1, "image", len(data), bytes(data)),
            (2, "image", len(malformed), bytes(malformed)),
            (3, "image", len(real_prog), bytes(real_prog)),
        ],
        "media_id long, kind string, n_bytes long, content binary",
    )
    rows = {r.media_id: r for r in decode_media(df).collect()}
    assert rows[1].codec == "jpeg" and (rows[1].width, rows[1].height) == (14, 12)
    assert rows[2].codec == "none" and (rows[2].width, rows[2].height) == (0, 0)
    assert rows[3].codec == "jpeg" and (rows[3].width, rows[3].height) == (14, 12)


def test_progressive_jpeg_roundtrip_matches_baseline():
    """The progressive path (SOF2: DC first at Al=1, DC refinement,
    per-component AC first at Al=1, AC refinement — all four T.81
    Annex G pass kinds) reconstructs EXACTLY the coefficients the
    baseline scan would carry, so decoded pixels are bit-identical to
    the baseline decode of the same image at the same quality."""
    import numpy as np

    from habits_etl_spark.multimodal import _gen_pixels
    from habits_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:31]
    noise = ((xx * 37 + yy * 101 + (xx * yy) % 13 * 29) % 256).astype(np.uint8)
    images = [
        _gen_pixels(7),
        _gen_pixels(40),
        np.stack([noise, noise[::-1], 255 - noise], axis=-1),  # AC stress
    ]
    for img in images:
        for q in (40, 90):
            for sub in (False, True):
                base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
                pdata = encode_jpeg(img, q, subsample=sub, progressive=True)
                prog = decode_jpeg(pdata)
                assert prog is not None
                assert np.array_equal(base, prog)
    # grayscale too
    gray = ((xx * 11 + yy * 7) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray, 75)),
        decode_jpeg(encode_jpeg(gray, 75, progressive=True)),
    )
    # determinism + restart refusal
    assert encode_jpeg(images[0], 90, progressive=True) == encode_jpeg(
        images[0], 90, progressive=True
    )
    with pytest.raises(ValueError):
        encode_jpeg(images[0], 90, restart_interval=2, progressive=True)


def test_decode_media_real_frames_for_video(spark):
    """Video-kind payloads swapped in by with_real_video flow REAL
    frames: decode_media reports true frame dims and duration from the
    frame count over fps, and the feature stage emits the mean of the
    per-frame pixel features."""
    import numpy as np

    from habits_etl_spark.multimodal import (
        _gen_frames,
        bmp_pixel_feature,
        extract_features,
        synthetic_media,
        with_real_video,
    )

    media = with_real_video(synthetic_media(spark, 30))
    decoded = {r.media_id: r for r in decode_media(media).collect()}
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    vid_ids = [m for m, r in decoded.items() if r.kind == "video"]
    assert vid_ids
    assert all(decoded[m].codec == "mjpeg-avi" for m in vid_ids)
    for mid in vid_ids:
        frames, fps = _gen_frames(mid)
        r = decoded[mid]
        assert (r.width, r.height) == (frames[0].shape[1], frames[0].shape[0])
        assert r.duration_ms == len(frames) * 1000 // fps
        # feature = mean over DECODED frames (lossy JPEG): close to the
        # mean over source frames
        want = np.array(
            [bmp_pixel_feature(f) for f in frames], dtype=np.float64
        ).mean(axis=0)
        assert feats[mid] == pytest.approx(want, abs=0.08)


def test_registered_multimodal_query_is_deterministic(spark, sf_dir):
    import hashlib

    from habits_etl_spark.plans.media import ext_multimodal_features

    a = ext_multimodal_features(spark, sf_dir).collect()
    b = ext_multimodal_features(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    from habits_etl_spark.multimodal import _gen_frames, _gen_image, _gen_video, _gen_wav

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(a) == len(docs)
    by_id = {r.media_id: r for r in a}
    for doc_id, text in list(docs.items())[:25]:
        r = by_id[doc_id]
        if r.kind == "image":
            # real generated image payload, really decoded — container
            # rotates BMP/PNG/JPEG per _image_container, matching
            # multimodal.with_real_images; dims are exact in all three
            payload = _gen_image(doc_id)
            assert r.width == 8 + doc_id % 9
            assert r.height == 5 + doc_id % 7
        elif r.kind == "audio":  # real generated WAV payload, really decoded
            payload = _gen_wav(doc_id)
            assert r.width == 8000  # decoded sample rate
            assert r.height == 1  # decoded channel count
        else:  # real generated MJPEG AVI payload, really decoded
            payload = _gen_video(doc_id)
            frames, _fps = _gen_frames(doc_id)
            assert r.width == frames[0].shape[1]
            assert r.height == frames[0].shape[0]
        assert r.checksum == hashlib.md5(payload).hexdigest()
        assert r.n_bytes == len(payload)
        assert 0.0 < r.f_norm <= 4.0  # 16 dims in [0, 1]
        assert r.kind in ("image", "audio", "video")


def test_sniff_mime_detects_real_signatures(spark):
    payloads = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png"),
        (2, bytes.fromhex("FFD8FFE0") + b"jfif", "image/jpeg"),
        (3, b"GIF89a" + b"x" * 4, "image/gif"),
        (4, b"RIFF" + b"\x10\x00\x00\x00" + b"WAVEfmt ", "audio/wav"),
        (5, b"RIFF" + b"\x10\x00\x00\x00" + b"AVI LIST", "video/avi"),
        (6, b"\x00\x00\x00\x18ftypisom" + b"x" * 8, "video/mp4"),
        (7, b"ID3\x04" + b"x" * 8, "audio/mpeg"),
        (8, b"OggS" + b"x" * 8, "audio/ogg"),
        (9, b"fLaC" + b"x" * 8, "audio/flac"),
        (10, b"%PDF-1.7" + b"x" * 8, "application/pdf"),
        (11, b"\x1a\x45\xdf\xa3" + b"x" * 8, "video/webm"),
        (12, b"just some text bytes", "application/octet-stream"),
        (13, b"RIFF\x10\x00\x00\x00JUNK....", "application/octet-stream"),
    ]
    from habits_etl_spark.multimodal import sniff_mime

    df = spark.createDataFrame(
        [(i, p) for i, p, _ in payloads], "media_id long, content binary"
    )
    got = {r.media_id: r.sniffed_mime for r in sniff_mime(df).collect()}
    for i, _, want in payloads:
        assert got[i] == want, (i, got[i], want)


def test_sniff_mime_on_synthetic_media_is_octet_stream(spark):
    from habits_etl_spark.multimodal import sniff_mime, synthetic_media

    out = sniff_mime(synthetic_media(spark, 30)).collect()
    # the fake payloads carry no real magic bytes: sniffing must NOT
    # trust the declared kind/mime columns
    assert all(r.sniffed_mime == "application/octet-stream" for r in out)


def test_bmp_roundtrip_and_golden_fixture():
    """The real codec: encode->decode is pixel-identical (including odd
    widths that need row padding and the bottom-up layout), and the
    committed fixture image decodes to KNOWN pixel statistics — real
    pixels, not header echoes."""
    import os

    import numpy as np

    from habits_etl_spark.multimodal import (
        bmp_pixel_feature,
        decode_bmp,
        encode_bmp,
    )

    rng_imgs = [
        np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3),
        (np.mgrid[0:5, 0:9][0] * 50 % 256).astype(np.uint8)[..., None].repeat(3, -1),
    ]
    for arr in rng_imgs:
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "gradient_7x4.bmp")
    data = open(fixture, "rb").read()
    arr = decode_bmp(data)
    assert arr is not None and arr.shape == (4, 7, 3)
    # golden per-channel means of the committed image
    assert [round(float(arr[:, :, i].mean()), 6) for i in range(3)] == [
        120.0,
        105.0,
        58.5,
    ]
    feat = bmp_pixel_feature(arr)
    assert len(feat) == 16
    golden = [
        0.006836, 0.003906, 0.470588, 0.411765, 0.229412, 0.228918,
        0.107143, 0.107143, 0.142857, 0.142857, 0.178571, 0.071429,
        0.142857, 0.035714, 0.071429, 0.0,
    ]
    assert feat == pytest.approx(golden, abs=1e-6)
    # non-BMP payloads are rejected, not mis-parsed
    assert decode_bmp(b"definitely not a bitmap") is None
    assert decode_bmp(data[:30]) is None


def test_png_roundtrip_and_golden_fixture():
    """The real PNG codec: encode->decode is pixel-identical for EVERY
    scanline filter (0-4 pinned, plus the cycling default) and every
    supported color type (0 gray / 2 RGB / 6 RGBA), the committed
    fixture image decodes to KNOWN pixel statistics — real inflated,
    filter-reconstructed pixels, not header echoes — and corrupt /
    truncated / unsupported payloads are rejected, not mis-parsed."""
    import os
    import struct
    import zlib

    import numpy as np

    from habits_etl_spark.multimodal import (
        bmp_pixel_feature,
        decode_png,
        encode_png,
    )

    h, w = 7, 9  # odd sizes; h > 5 so the cycling default hits all filters
    yy, xx = np.mgrid[0:h, 0:w]
    gray = ((xx * 37 + yy * 91) % 256).astype(np.uint8)
    rgb = np.stack([(xx * 31) % 256, (yy * 57) % 256, (xx + yy * 3) % 256], -1).astype(
        np.uint8
    )
    rgba = np.concatenate([rgb, gray[..., None]], axis=-1)

    # every filter x every color type reconstructs pixel-identically
    for ft in [None, 0, 1, 2, 3, 4]:
        got = decode_png(encode_png(rgb, filter_type=ft))
        assert np.array_equal(got, rgb), f"RGB filter {ft}"
        got = decode_png(encode_png(gray, filter_type=ft))
        assert np.array_equal(got, gray[..., None].repeat(3, -1)), f"gray filter {ft}"
        got = decode_png(encode_png(rgba, filter_type=ft))
        assert np.array_equal(got, rgb), f"RGBA filter {ft} (alpha dropped)"

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "gradient_7x6.png")
    data = open(fixture, "rb").read()
    arr = decode_png(data)
    assert arr is not None and arr.shape == (6, 7, 3)
    # golden per-channel means of the committed image
    assert [round(float(arr[:, :, i].mean()), 6) for i in range(3)] == [
        120.0,
        112.5,
        80.0,
    ]
    feat = bmp_pixel_feature(arr)
    golden = [
        0.006836, 0.005859, 0.470588, 0.441176, 0.313725, 0.217922,
        0.047619, 0.095238, 0.142857, 0.166667, 0.166667, 0.119048,
        0.119048, 0.095238, 0.047619, 0.0,
    ]
    assert feat == pytest.approx(golden, abs=1e-6)

    # corrupt CRC: flip one byte inside the IDAT body -> rejected
    idat_at = data.index(b"IDAT") - 4
    (idat_len,) = struct.unpack_from(">I", data, idat_at)
    corrupted = bytearray(data)
    corrupted[idat_at + 8 + idat_len // 2] ^= 0xFF
    assert decode_png(bytes(corrupted)) is None
    # truncated mid-chunk -> rejected
    assert decode_png(data[: len(data) // 2]) is None
    # not a PNG at all -> rejected
    assert decode_png(b"definitely not a png payload....") is None
    # 16-bit depth / interlaced / palette are out of scope -> rejected
    ihdr_body = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
        + data[data.index(b"IDAT") - 4 :]
    )
    assert decode_png(deep) is None
    ihdr_body = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)  # palette
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
        + data[data.index(b"IDAT") - 4 :]
    )
    assert decode_png(pal) is None
    # wrong decompressed length (claimed dims don't match pixel data) -> rejected
    ihdr_body = struct.pack(">IIBBBBB", w + 3, h, 8, 2, 0, 0, 0)
    bad_dims = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
        + data[data.index(b"IDAT") - 4 :]
    )
    assert decode_png(bad_dims) is None


def test_jpeg_roundtrip_and_golden_fixture():
    """The real JPEG codec (baseline sequential, pure stdlib+numpy):
    encode->decode is dimension-exact and pixel-close (lossy DCT, so
    bounded error instead of bit-identity) across quality levels,
    grayscale and RGB, 4:4:4 and 4:2:0, and restart intervals; the
    committed fixture decodes to KNOWN pixel statistics — real
    Huffman-decoded, dequantized, IDCT'd pixels; corrupt / truncated /
    malformed payloads are rejected, not mis-parsed."""
    import os

    import numpy as np

    from habits_etl_spark.multimodal import bmp_pixel_feature
    from habits_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    h, w = 29, 37  # not multiples of 8/16: padding + crop paths
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([xx * 6, yy * 7, xx * 3 + yy * 2], -1).astype(np.uint8)
    gray = (xx * 5 + yy * 4).astype(np.uint8)

    for q, tol in ((50, 12), (90, 5), (95, 4)):
        back = decode_jpeg(encode_jpeg(rgb, q))
        assert back is not None and back.shape == (h, w, 3)
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= tol, q
    for kw, tol in (
        ({"subsample": True}, 10),
        ({"restart_interval": 2}, 4),
        ({"subsample": True, "restart_interval": 1}, 10),
    ):
        back = decode_jpeg(encode_jpeg(rgb, 90, **kw))
        assert back is not None and back.shape == (h, w, 3), kw
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= tol, kw
    back = decode_jpeg(encode_jpeg(gray, 90))
    assert back is not None and back.shape == (h, w, 3)
    assert np.array_equal(back[:, :, 0], back[:, :, 1])  # gray replicated
    assert np.abs(back[:, :, 0].astype(int) - gray.astype(int)).max() <= 10
    # deterministic bytes
    assert encode_jpeg(rgb, 90) == encode_jpeg(rgb, 90)

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "gradient_14x12.jpg"
    )
    data = open(fixture, "rb").read()
    arr = decode_jpeg(data)
    assert arr is not None and arr.shape == (12, 14, 3)
    # golden per-channel means of the committed image (4:2:0 + DRI=1)
    assert [round(float(arr[:, :, i].mean()), 6) for i in range(3)] == [
        110.672619,
        104.178571,
        82.446429,
    ]
    feat = bmp_pixel_feature(arr)
    golden = [
        0.013672, 0.011719, 0.43401, 0.408543, 0.323319, 0.187062,
        0.053571, 0.10119, 0.166667, 0.166667, 0.178571, 0.160714,
        0.113095, 0.059524, 0.0, 0.0,
    ]
    assert feat == pytest.approx(golden, abs=1e-6)

    # PNG truncation leaving a chunk's body intact but cutting into its
    # CRC bytes must return None, not raise struct.error (found by
    # mutation fuzzing); cut mid-CRC of the IDAT chunk
    from habits_etl_spark.multimodal import _gen_pixels, decode_png, encode_png

    png = encode_png(_gen_pixels(7))
    idat = png.find(b"IDAT")
    idat_size = int.from_bytes(png[idat - 4 : idat], "big")
    assert decode_png(png[: idat + 4 + idat_size + 2]) is None

    # rejections: not a JPEG / truncated / malformed progressive (a
    # baseline stream whose SOF marker is flipped to SOF2 declares an
    # interleaved Ss=0,Se=63 scan — invalid progressive scan params)
    assert decode_jpeg(b"definitely not a jpeg payload") is None
    assert decode_jpeg(data[: len(data) // 2]) is None
    prog = bytearray(data)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    # 12-bit precision rejected (precision byte follows the SOF0 length)
    deep = bytearray(data)
    deep[i + 4] = 12
    assert decode_jpeg(bytes(deep)) is None
    # corrupt DC Huffman table: symbols patched to 0xFF make the decoder
    # read a size category of 255 — without the T.81 size bound this
    # pushed an unbounded Python int into the int64 coefficient slot and
    # raised OverflowError through the Arrow task (found by mutation
    # fuzzing); it must return None instead
    baddht = bytearray(data)
    d = baddht.find(b"\xff\xc4")
    seg_end = d + 4 + int.from_bytes(baddht[d + 2 : d + 4], "big") - 2
    for k in range(d + 4 + 1 + 16, seg_end):  # every DC symbol -> 0xFF
        baddht[k] = 0xFF
    assert decode_jpeg(bytes(baddht)) is None
    # forged geometry: a ~700-byte payload claiming 65500x65500 with 4x4
    # sampling must return None (geometry cap), not raise MemoryError
    # attempting a 32+ GiB plane allocation inside an Arrow UDF task.
    forged = bytearray(data)
    forged[i + 5 : i + 9] = (65500).to_bytes(2, "big") * 2  # height, width
    forged[i + 11] = 0x44  # comp 0 sampling h=4, v=4
    assert decode_jpeg(bytes(forged)) is None
    # out-of-spec sampling factors (T.81 bounds them to 1-4) also reject
    oversamp = bytearray(data)
    oversamp[i + 11] = 0x88
    assert decode_jpeg(bytes(oversamp)) is None


def test_gen_jpeg_pixels_close_to_pixel_field():
    """_gen_jpeg carries the SAME deterministic pixel field as
    _gen_bmp/_gen_png (lossy: dims exact, pixels within quantization
    error of the BMP ground truth)."""
    import numpy as np

    from habits_etl_spark.multimodal import _gen_bmp, _gen_jpeg, decode_bmp
    from habits_etl_spark.multimodal.jpeg import decode_jpeg

    for mid in (2, 5, 8, 14, 23):
        truth = decode_bmp(_gen_bmp(mid))
        got = decode_jpeg(_gen_jpeg(mid))
        assert got is not None and got.shape == truth.shape
        # the synthetic gradients wrap mod 256 (sharp sawtooth edges), so
        # allow real DCT ringing while still proving it is the same field
        assert np.abs(got.astype(int) - truth.astype(int)).mean() < 16.0


def test_gen_png_matches_gen_bmp_pixels():
    """_gen_png and _gen_bmp carry the SAME deterministic pixel field for
    a given media_id — the two containers are interchangeable payloads
    over one source of truth (_gen_pixels)."""
    import numpy as np

    from habits_etl_spark.multimodal import (
        _gen_bmp,
        _gen_png,
        decode_bmp,
        decode_png,
    )

    for mid in (1, 2, 3, 8, 15):
        assert np.array_equal(decode_png(_gen_png(mid)), decode_bmp(_gen_bmp(mid)))


def test_decode_media_real_pixels_for_images(spark):
    """Image-kind synthetic payloads now carry real BMPs: the decode
    stage reports their TRUE pixel dimensions (parsed from pixel data
    written by the generator, not from a fake header)."""
    from habits_etl_spark.multimodal import synthetic_media, with_real_images

    media = with_real_images(synthetic_media(spark, 30))
    rows = {r.media_id: r for r in decode_media(media).collect()}
    img_ids = [m for m, r in rows.items() if r.kind == "image"]
    assert img_ids
    for mid in img_ids:
        assert rows[mid].width == 8 + mid % 9
        assert rows[mid].height == 5 + mid % 7


def test_wav_roundtrip_and_golden_fixture():
    """The real audio codec: encode->decode is sample-identical (mono
    and stereo, including the chunk walk past a LIST chunk), and the
    committed fixture clip decodes to KNOWN sample statistics — real
    samples, not header echoes."""
    import os
    import struct

    import numpy as np

    from habits_etl_spark.multimodal import (
        decode_wav,
        encode_wav,
        wav_audio_feature,
    )

    mono = (np.arange(100, dtype=np.int64) * 311 % 2001 - 1000).astype(np.int16)
    stereo = np.stack([mono, -mono], axis=1)
    for arr, ch in ((mono, 1), (stereo, 2)):
        dec, rate = decode_wav(encode_wav(arr, 22050))
        assert rate == 22050 and dec.shape == (100, ch)
        assert np.array_equal(dec, arr.reshape(100, ch))

    # chunk walker: a LIST chunk between fmt and data must be skipped
    wav = encode_wav(mono, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = wav[:fmt_end] + extra + wav[fmt_end:]
    dec, rate = decode_wav(patched)
    assert np.array_equal(dec[:, 0], mono)

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "twotone_16k_stereo.wav"
    )
    data = open(fixture, "rb").read()
    out = decode_wav(data)
    assert out is not None
    arr, rate = out
    assert rate == 16000 and arr.shape == (4000, 2)
    feat = wav_audio_feature(arr, rate)
    assert len(feat) == 16
    golden = [
        0.025, 0.333333, 0.25, 0.169607, 0.407715, 0.23981,
        0.169607, 0.169607, 0.169607, 0.169607, 0.169607, 0.169607,
        0.169607, 0.169607, 0.169607, 0.169607,
    ]
    assert feat == pytest.approx(golden, abs=1e-6)
    # non-WAV payloads are rejected, not mis-parsed
    assert decode_wav(b"RIFFxxxxAVI LIST") is None
    assert decode_wav(data[:40]) is None


def test_decode_media_real_samples_for_audio(spark):
    """Audio-kind payloads swapped in by with_real_audio flow REAL
    sample data: the decode stage reports the true rate/channels/
    duration and the feature stage emits the energy profile of the
    actual waveform."""
    import numpy as np

    from habits_etl_spark.multimodal import (
        _gen_wav,
        decode_media,
        decode_wav,
        extract_features,
        synthetic_media,
        wav_audio_feature,
        with_real_audio,
    )

    media = with_real_audio(synthetic_media(spark, 30))
    decoded = {r.media_id: r for r in decode_media(media).collect()}
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    audio_ids = [m for m, r in decoded.items() if r.kind == "audio"]
    assert audio_ids
    for mid in audio_ids:
        samples, rate = decode_wav(_gen_wav(mid))
        r = decoded[mid]
        assert (r.width, r.height) == (rate, 1)
        assert r.duration_ms == samples.shape[0] * 1000 // rate
        assert feats[mid] == pytest.approx(
            wav_audio_feature(samples, rate), abs=1e-6
        )
    # non-audio fake payloads match no codec and report zeros
    vid = [m for m, r in decoded.items() if r.kind == "video"][0]
    assert (decoded[vid].width, decoded[vid].height, decoded[vid].duration_ms) == (0, 0, 0)


def test_fused_decode_with_features_matches_two_stage(spark):
    """The r13 fused stage must reproduce decode_media's metadata AND
    extract_features' feature vector EXACTLY — one decode per payload is
    a plan change, never a value change. Runs over the full real-codec
    media table (BMP/PNG/JPEG images, PCM WAVs, MJPEG AVIs, plus the
    undecodable fallback) at the test fixture scale."""
    from habits_etl_spark.multimodal import decode_with_features
    from habits_etl_spark.plans.media import _build_media_table

    media = _build_media_table(spark, "/root/testdata/sf0.001")
    fused = {r.media_id: r for r in decode_with_features(media).collect()}
    meta = {r.media_id: r for r in decode_media(media).collect()}
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert set(fused) == set(meta) == set(feats)
    for mid, f in fused.items():
        m = meta[mid]
        assert (
            f.kind, f.n_bytes, f.width, f.height, f.duration_ms, f.codec, f.checksum
        ) == (
            m.kind, m.n_bytes, m.width, m.height, m.duration_ms, m.codec, m.checksum
        ), f"metadata drift at media_id={mid}"
        assert f.feature == feats[mid], f"feature drift at media_id={mid}"
