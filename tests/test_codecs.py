"""Real-codec tests (VERDICT r01 next-round #7): the stdlib decoders in
``llmops.codecs`` and their wiring through the multimodal mapInPandas
operators with ``fake=False`` — actual decodes, no imaging/audio libraries
required.  When PIL/soundfile ARE present, the same operators route through
them instead; these tests exercise whichever path resolves."""

import io
import struct
import wave

import pytest

from kafka_connect_expand_json_transform_spark.llmops import multimodal
from kafka_connect_expand_json_transform_spark.llmops.codecs import (
    decode_png,
    encode_png,
    image_dimensions,
    resize_png,
    sniff_mime,
    wav_features,
)


def make_png(w, h, channels=3):
    """Deterministic gradient image."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                px.append((x * 7 + y * 13 + c * 29) % 256)
    return encode_png(w, h, channels, px), bytes(px)


def make_wav(rate=8000, n=800, freq_div=8):
    """16-bit mono PCM square wave with period ``freq_div`` samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        samples = [16384 if (i // (freq_div // 2)) % 2 == 0 else -16384 for i in range(n)]
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


GIF = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
BMP = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 640, -480) + b"\x00" * 8
JPEG = (
    b"\xff\xd8"                       # SOI
    + b"\xff\xe0\x00\x04\x00\x00"     # APP0, len 4
    + b"\xff\xc0\x00\x11\x08"         # SOF0, len 17, precision 8
    + struct.pack(">HH", 480, 720)    # height, width
    + b"\x03" + b"\x00" * 9           # 3 components
    + b"\xff\xd9"                     # EOI
)


def test_sniff_and_dimensions():
    png, _ = make_png(5, 3)
    assert sniff_mime(png) == "image/png"
    assert image_dimensions(png) == (5, 3)
    assert sniff_mime(GIF) == "image/gif"
    assert image_dimensions(GIF) == (320, 200)
    assert sniff_mime(BMP) == "image/bmp"
    assert image_dimensions(BMP) == (640, 480)  # top-down DIB: abs(height)
    assert sniff_mime(JPEG) == "image/jpeg"
    assert image_dimensions(JPEG) == (720, 480)
    assert sniff_mime(make_wav()) == "audio/wav"
    assert sniff_mime(b"not an image") == "application/octet-stream"
    with pytest.raises(ValueError, match="cannot parse"):
        image_dimensions(b"not an image")


def test_png_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        png, px = make_png(7, 4, channels=ch)
        w, h, c, decoded = decode_png(png)
        assert (w, h, c) == (7, 4, ch)
        assert bytes(decoded) == px


def test_png_resize_nearest():
    png, px = make_png(4, 4, channels=3)
    out = resize_png(png, 2, 2)
    w, h, c, decoded = decode_png(out)
    assert (w, h, c) == (2, 2, 3)
    # nearest-neighbor with 2:1 ratio picks source pixels (0,0),(2,0),(0,2),(2,2)
    def src_pixel(x, y):
        base = (y * 4 + x) * 3
        return px[base : base + 3]

    got = [bytes(decoded[i * 3 : i * 3 + 3]) for i in range(4)]
    assert got == [src_pixel(0, 0), src_pixel(2, 0), src_pixel(0, 2), src_pixel(2, 2)]


def test_wav_features_real_values():
    raw = make_wav(rate=8000, n=800, freq_div=8)
    f = wav_features(raw)
    assert f["rate"] == 8000
    assert f["channels"] == 1
    assert f["duration_s"] == pytest.approx(0.1)
    assert f["peak"] == pytest.approx(0.5)          # 16384/32768
    assert f["rms"] == pytest.approx(0.5)           # square wave: rms == peak
    assert f["zcr"] == pytest.approx(0.25, abs=0.01)  # crossing every 4 samples


def test_spark_real_image_decode(spark):
    """extract_image_features(fake=False) performs a REAL decode through
    mapInPandas — dimensions come from the PNG header, not a hash."""
    png5, _ = make_png(5, 3)
    png9, _ = make_png(9, 2)
    df = spark.createDataFrame([(1, png5), (2, png9)], "id int, payload binary")
    rows = {r["id"]: r for r in multimodal.extract_image_features(df, fake=False).collect()}
    assert (rows[1]["img_width"], rows[1]["img_height"]) == (5, 3)
    assert (rows[2]["img_width"], rows[2]["img_height"]) == (9, 2)


def test_spark_real_resize(spark):
    png, _ = make_png(8, 8, channels=3)
    df = spark.createDataFrame([(1, png)], "id int, payload binary")
    out = multimodal.resize_images(df, target_width=4, target_height=2, fake=False).first()
    w, h, c, _ = decode_png(bytes(out["resized_payload"]))
    assert (w, h) == (4, 2)


def test_spark_real_audio_features(spark):
    raw = make_wav(rate=8000, n=800)
    df = spark.createDataFrame([(1, raw)], "id int, payload binary")
    feats = multimodal.extract_audio_features(df, fake=False).first()["audio_features"]
    assert len(feats) == multimodal.AUDIO_FEATURE_DIM
    duration, rate_norm, channels = feats[0], feats[1], feats[2]
    assert duration == pytest.approx(0.1)
    assert rate_norm == pytest.approx(8000 / 48000)
    assert channels == 1.0


def test_spark_real_decode_rejects_unknown_bytes(spark):
    """Undecodable payloads fail loudly (ValueError), not silently."""
    df = spark.createDataFrame([(1, b"definitely not an image")], "id int, payload binary")
    with pytest.raises(Exception, match="cannot parse|cannot identify"):
        multimodal.extract_image_features(df, fake=False).collect()


# ---------------------------------------------------------------------------
# hypothesis property tests: the codec layer is pure functions, so fuzz it
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, data):
    px = bytes(data.draw(st.binary(min_size=w * h * ch, max_size=w * h * ch)))
    png = encode_png(w, h, ch, px)
    assert sniff_mime(png) == "image/png"
    assert image_dimensions(png) == (w, h)
    rw, rh, rch, decoded = decode_png(png)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(decoded) == px


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    tw=st.integers(1, 16),
    th=st.integers(1, 16),
)
def test_png_resize_property(w, h, tw, th):
    png, px = make_png(w, h, channels=3)
    out = resize_png(png, tw, th)
    rw, rh, rch, decoded = decode_png(out)
    assert (rw, rh, rch) == (tw, th, 3)
    # every output pixel is an exact copy of SOME input pixel (nearest)
    src_pixels = {bytes(px[i * 3 : i * 3 + 3]) for i in range(w * h)}
    for i in range(tw * th):
        assert bytes(decoded[i * 3 : i * 3 + 3]) in src_pixels


@settings(max_examples=25, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
)
def test_wav_features_property(rate, samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    f = wav_features(buf.getvalue())
    assert f["rate"] == rate and f["channels"] == 1
    assert f["duration_s"] == pytest.approx(len(samples) / rate)
    assert 0.0 <= f["rms"] <= f["peak"] <= 1.0 + 1e-9
    assert 0.0 <= f["zcr"] <= 1.0
    assert f["peak"] == pytest.approx(max(abs(s) for s in samples) / 32768.0)


def _fake_jpeg(w, h, tag):
    # structurally valid JPEG: SOI + SOF0 carrying dims + payload tag + EOI
    import struct as _s
    sof = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + sof + tag + b"\xff\xd9"


def test_avi_mjpeg_container_roundtrip():
    from kafka_connect_expand_json_transform_spark.llmops import codecs as K

    frames = [_fake_jpeg(32, 24, bytes([i])) for i in range(5)]
    avi = K.encode_avi_mjpeg(frames, 32, 24, fps=10)
    assert K.sniff_mime(avi) == "video/x-msvideo"
    assert K.avi_mjpeg_frames(avi) == frames
    assert K.image_dimensions(frames[0]) == (32, 24)
    # odd-sized frames exercise RIFF word alignment
    odd = [_fake_jpeg(8, 8, b"\x01\x02\x03")]
    assert K.avi_mjpeg_frames(K.encode_avi_mjpeg(odd, 8, 8)) == odd
    import pytest as _pt

    with _pt.raises(ValueError, match="RIFF/AVI"):
        K.avi_mjpeg_frames(b"\x89PNG not an avi")


def test_sample_frames_real_mjpeg_avi(spark):
    """sample_frames(fake=False) is REAL for MJPEG/AVI: the extracted frame
    payloads are the container's JPEGs, every_nth applies to the frame
    index, and non-AVI video still degrades to the PyAV gate."""
    from kafka_connect_expand_json_transform_spark.llmops import codecs as K
    from kafka_connect_expand_json_transform_spark.llmops import multimodal

    frames = [_fake_jpeg(16, 16, bytes([i])) for i in range(6)]
    avi = K.encode_avi_mjpeg(frames, 16, 16)
    df = spark.createDataFrame([(1, avi)], "vid_id long, payload binary")
    out = multimodal.sample_frames(df, "payload", every_nth=2, fake=False)
    got = sorted(
        (r["frame_index"], bytes(r["frame_payload"])) for r in out.collect()
    )
    assert got == [(0, frames[0]), (2, frames[2]), (4, frames[4])]
