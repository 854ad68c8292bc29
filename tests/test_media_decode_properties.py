"""Property-based round-trips for the real media decoders: encode a
random image/clip/waveform with an independent pure-Python writer, then
assert the decoder recovers exactly the stats of the source arrays —
any header-offset, alignment, or byte-order mistake shows up under
randomized dims/content long before a fixture would catch it."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
    decode_ppm,
    decode_wav_pcm,
    sample_y4m_frames,
)

BYTES = st.integers(min_value=0, max_value=255)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    data=st.data(),
    sep=st.sampled_from([b"\n", b" ", b"\t", b"\r\n"]),
)
def test_ppm_roundtrip(w, h, data, sep):
    pixels = data.draw(st.lists(BYTES, min_size=w * h * 3, max_size=w * h * 3))
    payload = b"P6" + sep + str(w).encode() + b" " + str(h).encode() \
        + sep + b"255\n" + bytes(pixels)
    got = decode_ppm(payload)
    assert got["width"] == w and got["height"] == h
    assert got["n_pixels"] == w * h
    assert got["sum_bytes"] == sum(pixels)
    assert got["min_byte"] == min(pixels)
    assert got["max_byte"] == max(pixels)
    assert got["mean_milli"] == sum(pixels) * 1000 // (w * h * 3)


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    channels=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    pad_junk_chunk=st.booleans(),
)
def test_wav_roundtrip(samples, channels, rate, pad_junk_chunk):
    # frames must be whole: truncate to a channel multiple
    n = len(samples) - len(samples) % channels
    if n == 0:
        samples = samples[:1] * channels
        n = channels
    samples = samples[:n]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * 2 * channels, 2 * channels, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_junk_chunk:
        # odd-length unknown chunk: decoders must skip it with padding
        chunks += b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + chunks
    got = decode_wav_pcm(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert got["sample_rate"] == rate
    assert got["channels"] == channels
    assert got["n_samples"] == n // channels
    assert got["sum_s"] == sum(samples)
    assert got["sum_abs"] == sum(abs(s) for s in samples)
    assert got["min_s"] == min(samples)
    assert got["max_s"] == max(samples)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    n_frames=st.integers(1, 9),
    every_n=st.integers(1, 4),
    data=st.data(),
)
def test_y4m_roundtrip(w, h, n_frames, every_n, data):
    frames = [
        bytes(data.draw(st.lists(BYTES, min_size=3 * w * h, max_size=3 * w * h)))
        for _ in range(n_frames)
    ]
    payload = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode() + b"".join(
        b"FRAME\n" + f for f in frames)
    got = sample_y4m_frames(payload, every_n=every_n)
    expect_idx = [i for i in range(n_frames) if i % every_n == 0]
    assert [r["frame_no"] for r in got] == expect_idx
    for r in got:
        luma = frames[r["frame_no"]][: w * h]
        assert r["y_sum"] == sum(luma)
        assert r["y_min"] == min(luma)
        assert r["y_max"] == max(luma)
