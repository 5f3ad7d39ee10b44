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
