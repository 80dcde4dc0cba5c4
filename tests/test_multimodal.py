"""Multimodal binary-column plumbing: schema, batch shape, and kernel
outputs over the deterministic FakeMedia container (codecs absent in
this sandbox; the real-decode path must raise NotImplementedError)."""

from __future__ import annotations

import numpy as np
import pytest

from bank_statement_pdf_parser_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = mm.synth_media_rows(60, seed=42)
    return spark.createDataFrame(rows, mm.MEDIA_DDL), rows


def test_decode_meta(media_df):
    df, rows = media_df
    got = {r.media_id: r for r in
           df.mapInPandas(mm.decode_meta, mm.META_DDL).collect()}
    assert len(got) == len(rows)
    for r in rows:
        g = got[r["media_id"]]
        assert (g.width, g.height, g.sample_rate, g.n_frames) == (
            r["meta"]["width"], r["meta"]["height"],
            r["meta"]["sample_rate"], r["meta"]["n_frames"])
        body = np.frombuffer(r["payload"], dtype=np.uint8,
                             offset=mm.HEADER.size)
        assert g.checksum == int(body.sum())
        assert g.n_bytes == len(r["payload"])


def test_byte_histogram_features(media_df):
    df, rows = media_df
    got = {r.media_id: r.feature for r in
           df.mapInPandas(mm.byte_histogram_features,
                          mm.FEATURE_DDL).collect()}
    for r in rows[:10]:
        body = np.frombuffer(r["payload"], dtype=np.uint8,
                             offset=mm.HEADER.size)
        hist = np.bincount(body, minlength=256).astype(np.float32)
        if hist.sum():
            hist = hist / hist.sum()
        np.testing.assert_allclose(got[r["media_id"]], hist, rtol=1e-6)
    assert all(len(f) == 256 for f in got.values())


def test_frame_sampling(media_df):
    df, rows = media_df
    out = df.mapInPandas(mm.sample_frames(every_k=2), mm.FRAME_DDL).collect()
    vids = {r["media_id"]: r for r in rows if r["kind"] == "video"}
    assert {r.media_id for r in out} == set(vids)
    for r in out:
        v = vids[r.media_id]
        w, h = v["meta"]["width"], v["meta"]["height"]
        assert len(r.frame_bytes) == w * h
        start = mm.HEADER.size + r.frame_idx * w * h
        assert bytes(r.frame_bytes) == v["payload"][start:start + w * h]
        assert r.frame_idx % 2 == 0


def test_real_codec_path_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\xff\xd8\xff")  # no PIL in sandbox


def test_ppm_bmp_roundtrip_real_decode():
    """PPM and 24-bit BMP decode is REAL (pure numpy), including the
    BMP bottom-up/BGR/row-padding quirks (odd width forces padding)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd w
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)
    assert np.array_equal(mm.decode_bmp24(mm.encode_bmp24(img)), img)
    # comment + whitespace variants in the PPM header grammar
    ppm = b"P6\n# a comment\n3 5\n# another\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_ppm(ppm), img)
    # dispatch: both formats through the one entry point
    assert np.array_equal(mm.decode_image_array(mm.encode_bmp24(img)), img)
    # CRLF writer: stray '\n' before the raster is tolerated exactly
    # when the size works out; any other mismatch must RAISE, never
    # decode shifted pixels
    crlf = b"P6\n3 5\n255\r\n" + img.tobytes()
    assert np.array_equal(mm.decode_ppm(crlf), img)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n3 5\n255\n" + img.tobytes()[:-1])


def test_resize_nearest_geometry():
    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    small = mm.resize_nearest(img, 4, 3)
    assert small.shape == (4, 3, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    assert np.array_equal(small[3, 2], img[6, 4])


def test_image_stats_kernel_real_images(spark):
    """End-to-end Spark decode of genuine PPM/BMP payloads: geometry,
    channel means, thumbnail; undecodable rows skipped silently."""
    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(16 + i, 9, 3), dtype=np.uint8)
            for i in range(4)}
    rows = [(0, mm.encode_ppm(imgs[0])), (1, mm.encode_bmp24(imgs[1])),
            (2, mm.encode_ppm(imgs[2])), (3, mm.encode_bmp24(imgs[3])),
            (9, b"\x89PNG not really decodable here"),
            (10, b"garbage"),
            (11, b"BM\x00\x00")]  # valid magic, truncated header
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in
           df.mapInPandas(mm.image_stats_kernel(thumb=4),
                          mm.IMAGE_STATS_DDL).collect()}
    assert set(got) == {0, 1, 2, 3}   # png/garbage skipped, not fatal
    for i, img in imgs.items():
        g = got[i]
        assert (g.height, g.width) == img.shape[:2]
        assert np.allclose(g.mean_rgb, img.reshape(-1, 3).mean(axis=0))
        assert bytes(g.thumb) == mm.resize_nearest(img, 4, 4).tobytes()


def test_compressed_codec_still_gated():
    # PNG and baseline JPEG are REAL stdlib/numpy decode paths
    # (round 6); formats with no native decoder remain the PIL-gated
    # residual
    with pytest.raises(NotImplementedError):
        mm.decode_image_array(b"GIF89a......")
    # malformed PNG/JPEG are decode ERRORS the stats kernels skip,
    # not missing-codec gates
    with pytest.raises(ValueError):
        mm.decode_image_array(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        mm.decode_image_array(b"\xff\xd8\xff\xe0....")


def test_png_roundtrip_all_filters_and_colortypes():
    """decode_png inverts every scanline filter (0-4) for grey, RGB
    and RGBA at sizes that exercise multi-row/multi-pixel recurrences,
    byte-exact."""
    rng = np.random.default_rng(7)
    for shape in [(5, 7, 3), (4, 4, 4), (6, 3), (1, 1, 3), (2, 9, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = img if img.ndim == 3 else img[:, :, None]
        for ft in range(5):
            got = mm.decode_png(mm.encode_png(img, filter_type=ft))
            assert np.array_equal(got, want), (shape, ft)


def test_png_reference_bytes_hand_built():
    """Decode a PNG whose bytes are built BY HAND in this test (chunk
    framing, CRCs and filtered scanlines written out independently of
    encode_png) — guards against encoder and decoder sharing one
    misreading of the spec. 2x2 RGB; row 0 filter 0 (none), row 1
    filter 2 (up: raw = filt + prev row)."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    row0 = bytes([10, 20, 30, 40, 50, 60])
    row1_filt = bytes([5, 6, 7, 8, 9, 10])   # raw row1 = row0 + these
    scan = b"\x00" + row0 + b"\x02" + row1_filt
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    got = mm.decode_png(png)
    want = np.array([[[10, 20, 30], [40, 50, 60]],
                     [[15, 26, 37], [48, 59, 70]]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_png_palette_and_grey_alpha():
    """Color type 3 (PLTE lookup -> RGB) and 4 (grey+alpha); palette
    indexes out of range must raise, not index garbage."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    scan = b"\x00" + bytes([0, 2]) + b"\x00" + bytes([1, 1])
    head = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head)
           + chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    got = mm.decode_png(png)
    want = np.array([[[255, 0, 0], [0, 0, 255]],
                     [[0, 255, 0], [0, 255, 0]]], dtype=np.uint8)
    assert np.array_equal(got, want)
    # out-of-range palette index
    bad_scan = b"\x00" + bytes([0, 7]) + b"\x00" + bytes([1, 1])
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head)
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(bad_scan)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_png(bad)
    # grey+alpha: alpha dropped, grey broadcast by decode_image_array
    ga = np.array([[[7, 200], [9, 100]]], dtype=np.uint8)
    rgb = mm.decode_image_array(mm.encode_png(ga, 1))
    assert np.array_equal(rgb, np.array(
        [[[7, 7, 7], [9, 9, 9]]], dtype=np.uint8))


def test_png_validation_rejects_corruption():
    """CRC flips, truncated IDAT streams, wrong inflated length,
    interlacing and 16-bit depth all raise ValueError (never a wrong
    silent decode)."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    good = mm.encode_png(img, 0)
    flipped = bytearray(good)
    flipped[20] ^= 0xFF                        # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(flipped))
    with pytest.raises(ValueError):
        mm.decode_png(good[:-16])              # IEND truncated away
    head16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head16)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        mm.decode_png(png16)
    head_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png_i = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head_i)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlacing"):
        mm.decode_png(png_i)
    # inflated length mismatch (one scanline short)
    head = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 7))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length"):
        mm.decode_png(short)
    # a CRC-consistent but invalid deflate stream must raise
    # ValueError, not zlib.error (the kernels' skip-row net catches
    # only ValueError — zlib.error would fail the whole Spark stage)
    bad_idat = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", head)
                + chunk(b"IDAT", b"\x01\x02\x03not-deflate")
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflate"):
        mm.decode_png(bad_idat)


def test_wav_roundtrip_and_chunk_walking():
    """WAV PCM16 decode is REAL: RIFF chunk walking skips unknown
    (odd-length, word-aligned) chunks; malformed containers raise."""
    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    payload = mm.encode_wav(s, 8000)
    sr, got = mm.decode_wav(payload)
    assert sr == 8000 and np.array_equal(got, s)
    # inject an unknown odd-length chunk between fmt and data
    fmt_end = payload.index(b"data")
    weird = payload[:fmt_end] + b"LIST" + (3).to_bytes(4, "little") \
        + b"xyz\x00" + payload[fmt_end:]
    sr2, got2 = mm.decode_wav(weird)
    assert sr2 == 8000 and np.array_equal(got2, s)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxWAVE")          # no fmt/data
    with pytest.raises(ValueError):
        mm.decode_wav(b"OggS not a wav at all")


def test_truncated_containers_raise_value_error_not_struct_error():
    """Truncated headers with valid magic must raise ValueError (the
    kernels' skip net), never struct.error — one malformed payload must
    not fail a whole Spark stage."""
    with pytest.raises(ValueError):
        mm.decode_bmp24(b"BM\x00\x00")            # header cut short
    s = np.array([1, 2, 3, 4], dtype=np.int16)
    wav = mm.encode_wav(s, 8000)
    with pytest.raises(ValueError):
        mm.decode_wav(wav[:-3])                   # data chunk < clen
    fmt_at = wav.index(b"fmt ")
    with pytest.raises(ValueError):
        mm.decode_wav(wav[:fmt_at + 12])          # fmt chunk cut short


def test_audio_stats_kernel(spark):
    s0 = np.array([1000, -1000, 1000, -1000], dtype=np.int16)
    s1 = np.array([5, 5, 5, 5, 5], dtype=np.int16)
    rows = [(0, mm.encode_wav(s0, 8000)), (1, mm.encode_wav(s1, 16000)),
            (9, b"not audio"),
            (11, mm.encode_wav(s0, 8000)[:-3])]   # truncated data chunk
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in
           df.mapInPandas(mm.audio_stats_kernel(),
                          mm.AUDIO_STATS_DDL).collect()}
    assert set(got) == {0, 1}
    assert got[0].sum_sq == 4 * 1000 * 1000
    assert got[0].n_zero_cross == 3
    assert (got[1].sample_rate, got[1].n_samples,
            got[1].n_zero_cross) == (16000, 5, 0)


def test_y4m_roundtrip_and_sampling(spark):
    """Y4M decode is REAL: stream header parsed, FRAME markers walked;
    C420 luma extraction skips chroma; the kernel samples every k-th
    frame with exact luma sums."""
    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, size=(2, 4), dtype=np.uint8)
              for _ in range(5)]
    payload = mm.encode_y4m(frames, 4, 2)
    w, h, got = mm.decode_y4m(payload)
    assert (w, h, len(got)) == (4, 2, 5)
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    # C420: same luma planes followed by chroma bytes per frame
    c420 = bytearray(b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n")
    for f in frames:
        c420 += b"FRAME\n" + f.tobytes() + bytes(4)  # 8/4 chroma bytes
    _, _, got420 = mm.decode_y4m(bytes(c420))
    assert all(np.array_equal(a, b) for a, b in zip(got420, frames))
    with pytest.raises(ValueError):
        mm.decode_y4m(payload[:-3])               # truncated frame
    with pytest.raises(ValueError):
        mm.decode_y4m(b"RIFF this is not y4m")

    df = spark.createDataFrame([(7, payload), (8, b"junk")],
                               "media_id long, payload binary")
    rows = {(r.media_id, r.frame_idx): r.sum_y for r in
            df.mapInPandas(mm.video_frames_kernel(every_k=2),
                           mm.VIDEO_FRAMES_DDL).collect()}
    assert set(rows) == {(7, 0), (7, 2), (7, 4)}
    assert rows[(7, 2)] == int(frames[2].astype(np.int64).sum())


def _jpeg_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return codes


class _JpegWriter:
    """Test-side arbitrary-coefficient baseline-JPEG builder (segments
    + entropy bits by hand) so the decoder's AC/color/4:2:0/restart
    paths are exercised against independently computed expectations."""

    def __init__(self):
        self.out = bytearray(b"\xff\xd8")
        self.bits = []
        self.dc = _jpeg_codes(mm._JPEG_DC_LUM_BITS, mm._JPEG_DC_LUM_VALS)
        self.ac = _jpeg_codes(mm._JPEG_AC_LUM_BITS, mm._JPEG_AC_LUM_VALS)

    def seg(self, marker, body):
        self.out.extend(b"\xff" + bytes([marker])
                        + (len(body) + 2).to_bytes(2, "big") + body)

    def put(self, ln, code):
        for i in range(ln - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def magnitude(self, v):
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    def block(self, dc_diff, acs):
        """acs: dict zigzag_index(1..63) -> value."""
        s, payload = self.magnitude(dc_diff)
        self.put(*self.dc[s])
        if s:
            self.put(s, payload)
        k = 1
        for idx in sorted(acs):
            run = idx - k
            while run > 15:
                self.put(*self.ac[0xF0])
                run -= 16
            s, payload = self.magnitude(acs[idx])
            self.put(*self.ac[(run << 4) | s])
            self.put(s, payload)
            k = idx + 1
        if k <= 63:
            self.put(*self.ac[0x00])

    def flush_entropy(self):
        while len(self.bits) % 8:
            self.bits.append(1)
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.bits = []


def _idct_ref(coef_zz, quant):
    """Independent O(n^4) IDCT (explicit T.81 formula, no shared code
    with the decoder's separable matmul)."""
    blk = np.zeros((8, 8))
    for zi, pos in enumerate(mm._JPEG_ZIGZAG):
        blk[pos // 8, pos % 8] = coef_zz[zi] * quant[zi]
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * blk[u, v]
                          * np.cos((2 * x + 1) * v * np.pi / 16)
                          * np.cos((2 * y + 1) * u * np.pi / 16))
            out[y, x] = s / 4 + 128.0
    return out


def test_jpeg_dc_only_roundtrip_exact():
    rng = np.random.default_rng(9)
    blocks = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    buf = mm.encode_jpeg_flat_blocks(np.asarray(blocks))
    img = mm.decode_jpeg(buf)
    assert img.shape == (40, 56, 1)
    want = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    assert (img[:, :, 0] == want).all()
    # and via the dispatch (grey broadcast to RGB)
    rgb = mm.decode_image_array(buf)
    assert rgb.shape == (40, 56, 3)
    assert (rgb[:, :, 1] == want).all()


def test_jpeg_ac_coefficients_against_reference_idct():
    w = _JpegWriter()
    quant = bytes([1] * 64)
    w.seg(0xDB, bytes([0x00]) + quant)
    w.seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
          + bytes([1, 0x01, 0x11, 0x00]))
    w.seg(0xC4, bytes([0x00]) + bytes(mm._JPEG_DC_LUM_BITS[1:])
          + bytes(mm._JPEG_DC_LUM_VALS))
    w.seg(0xC4, bytes([0x10]) + bytes(mm._JPEG_AC_LUM_BITS[1:])
          + bytes(mm._JPEG_AC_LUM_VALS))
    w.seg(0xDA, bytes([1, 0x01, 0x00, 0, 63, 0]))
    acs = {1: 40, 5: -31, 17: 25, 40: -90, 63: 7}  # incl. a >15 run
    w.block(-200, acs)
    w.flush_entropy()
    w.out.extend(b"\xff\xd9")
    img = mm.decode_jpeg(bytes(w.out))
    coef = np.zeros(64)
    coef[0] = -200
    for i, v in acs.items():
        coef[i] = v
    want = _idct_ref(coef, np.ones(64))
    got = img[:, :, 0].astype(np.float64)
    # float path: same math, different summation order — the uint8
    # result may differ by 1 where the true value sits near .5
    assert np.abs(got - np.clip(np.round(want), 0, 255)).max() <= 1


def test_jpeg_color_420_and_restart_markers():
    """4:2:0 MCU (4 Y blocks + Cb + Cr), two MCUs with DRI=1 and an
    RST0 between (DC predictors reset): chroma replication and the
    JFIF transform against scalar math."""
    w = _JpegWriter()
    w.seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    w.seg(0xC0, bytes([8]) + (16).to_bytes(2, "big")
          + (32).to_bytes(2, "big")
          + bytes([3, 1, 0x22, 0x00, 2, 0x11, 0x00, 3, 0x11, 0x00]))
    w.seg(0xC4, bytes([0x00]) + bytes(mm._JPEG_DC_LUM_BITS[1:])
          + bytes(mm._JPEG_DC_LUM_VALS))
    w.seg(0xC4, bytes([0x10]) + bytes(mm._JPEG_AC_LUM_BITS[1:])
          + bytes(mm._JPEG_AC_LUM_VALS))
    w.seg(0xDD, (1).to_bytes(2, "big"))
    w.seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    ys = [[100, 120, 140, 160], [60, 80, 200, 220]]
    cbs, crs = [90, 180], [200, 60]

    def dc(v):
        return 8 * (v - 128)

    pred_y = 0
    for b in ys[0]:
        w.block(dc(b) - pred_y, {})
        pred_y = dc(b)
    w.block(dc(cbs[0]), {})
    w.block(dc(crs[0]), {})
    w.flush_entropy()
    w.out.extend(b"\xff\xd0")                           # RST0
    pred_y = 0
    for b in ys[1]:
        w.block(dc(b) - pred_y, {})
        pred_y = dc(b)
    w.block(dc(cbs[1]), {})
    w.block(dc(crs[1]), {})
    w.flush_entropy()
    w.out.extend(b"\xff\xd9")
    img = mm.decode_jpeg(bytes(w.out))
    assert img.shape == (16, 32, 3)
    for mcu in range(2):
        for q, yv in enumerate(ys[mcu]):
            yy, xx = (q // 2) * 8 + 2, mcu * 16 + (q % 2) * 8 + 2
            cb, cr = cbs[mcu] - 128.0, crs[mcu] - 128.0
            want = np.clip(np.round(np.array([
                yv + 1.402 * cr,
                yv - 0.344136 * cb - 0.714136 * cr,
                yv + 1.772 * cb])), 0, 255).astype(np.uint8)
            assert np.abs(img[yy, xx].astype(int) - want.astype(int)
                          ).max() <= 1, (mcu, q, img[yy, xx], want)


def test_jpeg_rejects_progressive_and_bad_streams():
    w = _JpegWriter()
    w.seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 0x01, 0x11, 0x00]))
    w.out.extend(b"\xff\xd9")
    with pytest.raises(ValueError, match="baseline"):
        mm.decode_jpeg(bytes(w.out))
    with pytest.raises(ValueError):
        mm.decode_jpeg(b"\xff\xd8\xff\xd9")
    # 4-component (CMYK) SOF0 must refuse, not misdecode via YCbCr
    body = bytes([8, 0, 8, 0, 8, 4]
                 + [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0])
    cmyk = (b"\xff\xd8\xff\xc0" + (len(body) + 2).to_bytes(2, "big")
            + body + b"\xff\xd9")
    with pytest.raises(ValueError, match="component"):
        mm.decode_jpeg(cmyk)


def test_jpeg_every_truncation_is_a_clean_decode_error():
    """Any prefix of a valid stream must raise ValueError (the error
    class the stats kernels skip) — never IndexError or an internal
    marker exception escaping into the job."""
    buf = mm.encode_jpeg_flat_blocks(
        np.array([[10, 250], [90, 130]], dtype=np.uint8))
    for cut in range(2, len(buf)):
        try:
            mm.decode_jpeg(buf[:cut])
        except ValueError:
            pass
