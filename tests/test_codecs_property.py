"""Property-based round trips for the hand-written media codecs.

The PPM/BMP, RIFF/WAV, and Y4M parsers are load-bearing for the whole
multimodal family (decode -> perceptual hash -> dedup), so they get
hypothesis coverage beyond the fixture's arithmetic payloads: random
dimensions (including the BMP stride classes w % 4 in {0,1,2,3}), random
pixel/sample/frame content, both JUNK-chunk layouts, and degenerate
sizes. Every encode->decode round trip must reproduce the logical
content exactly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from clinical_search_data_pipeline_spark.operators.multimodal import (
    decode_pixel_rows,
    decode_wav_samples,
    decode_y4m_frame_sums,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
)

SETTINGS = dict(max_examples=60, deadline=None)


@settings(**SETTINGS)
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 9),
    data=st.data(),
)
def test_ppm_round_trip(w, h, data):
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    fmt, gw, gh, maxval, rows = decode_pixel_rows(encode_ppm(w, h, pix))
    assert (fmt, gw, gh, maxval) == ("ppm", w, h, 255)
    assert rows.tobytes() == pix


@settings(**SETTINGS)
@given(
    w=st.integers(1, 13),  # covers every stride-padding class w*3 % 4
    h=st.integers(1, 9),
    data=st.data(),
)
def test_bmp_round_trip_restores_logical_orientation(w, h, data):
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    logical = np.frombuffer(pix, dtype=np.uint8).reshape(h, w * 3)
    # a real encoder stores bottom-up; decode must flip back to top-down
    payload = encode_bmp(w, h, logical[::-1].tobytes())
    fmt, gw, gh, maxval, rows = decode_pixel_rows(payload)
    assert (fmt, gw, gh, maxval) == ("bmp", w, h, 255)
    assert np.array_equal(rows, logical)


@settings(**SETTINGS)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
    junk=st.booleans(),
)
def test_wav_round_trip(rate, samples, junk):
    got_rate, got = decode_wav_samples(encode_wav(rate, samples, pad_chunk=junk))
    assert got_rate == rate
    assert list(got) == samples


@settings(**SETTINGS)
@given(
    w=st.sampled_from([2, 4, 6, 10]),  # C420 needs even dims
    h=st.sampled_from([2, 4, 8]),
    fps=st.integers(1, 60),
    n_frames=st.integers(1, 8),
    data=st.data(),
)
def test_y4m_round_trip_per_frame_sums(w, h, fps, n_frames, data):
    frames = [
        bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
            )
        )
        for _ in range(n_frames)
    ]
    gw, gh, gfps, sums = decode_y4m_frame_sums(encode_y4m(w, h, fps, frames))
    assert (gw, gh, gfps) == (w, h, fps)
    assert sums == [sum(f) for f in frames]


@settings(**SETTINGS)
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 11),  # h >= 5 draws exercise every filter type
    data=st.data(),
)
def test_png_round_trip(w, h, data):
    """The r13 compressed codec (VERDICT r12 #5): deflate + per-row
    filters. The encoder cycles the filter type row % 5, so any h >= 5
    drawn here round-trips through ALL FIVE reversals."""
    from clinical_search_data_pipeline_spark.operators.multimodal import (
        encode_png,
    )

    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    fmt, gw, gh, maxval, rows = decode_pixel_rows(encode_png(w, h, pix))
    assert (fmt, gw, gh, maxval) == ("png", w, h, 255)
    assert rows.tobytes() == pix


def test_png_rejects_corruption_and_unsupported():
    from clinical_search_data_pipeline_spark.operators.multimodal import (
        encode_png,
    )
    import pytest

    good = encode_png(4, 4, bytes(range(48)))
    # corrupt one IDAT byte -> the chunk CRC must catch it
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_pixel_rows(bytes(bad))
    # a non-RGB color type must refuse, not mis-decode
    import zlib

    ihdr = (4).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    chunk = lambda t, d: (  # noqa: E731
        len(d).to_bytes(4, "big") + t + d
        + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    rgba = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" + bytes(16))
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_pixel_rows(rgba)


def test_png_cross_validates_against_jvm_imageio(spark):
    """Independence check: a symmetric encode/decode bug (both sides
    using the same wrong predictor) survives any round trip, so pin BOTH
    directions against javax.imageio — a decoder/encoder this code never
    touched. Our PNGs must decode bit-exact under ImageIO, and
    ImageIO-written PNGs (its own filter choices) must decode bit-exact
    under decode_pixel_rows."""
    import random

    from clinical_search_data_pipeline_spark.operators.multimodal import (
        encode_png,
    )

    jvm = spark._jvm
    rnd = random.Random(17)

    def imageio_read(payload: bytes):
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(payload))
        )
        w, h = img.getWidth(), img.getHeight()
        out = bytearray()
        for y in range(h):
            for x in range(w):
                argb = img.getRGB(x, y)
                out += bytes([(argb >> 16) & 255, (argb >> 8) & 255, argb & 255])
        return w, h, bytes(out)

    def imageio_write(w, h, pix):
        img = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        k = 0
        for y in range(h):
            for x in range(w):
                img.setRGB(
                    x, y, (pix[k] << 16) | (pix[k + 1] << 8) | pix[k + 2]
                )
                k += 3
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(img, "png", baos)
        return bytes(baos.toByteArray())

    for _ in range(4):
        w, h = rnd.randint(1, 8), rnd.randint(5, 9)  # >=5 rows: all filters
        pix = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        gw, gh, got = imageio_read(encode_png(w, h, pix))
        assert (gw, gh, got) == (w, h, pix)
        fmt, gw, gh, _mv, rows = decode_pixel_rows(imageio_write(w, h, pix))
        assert (fmt, gw, gh) == ("png", w, h)
        assert rows.tobytes() == pix
