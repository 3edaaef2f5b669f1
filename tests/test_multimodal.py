"""Multimodal plumbing: fake-codec round trip, decode/resize/frame-sample
stages, NotImplementedError gate on the real-codec path."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
    MediaFeatures,
    decode_fake,
    decode_real,
    encode_fake,
    gen_media_table,
)


def test_fake_codec_roundtrip():
    rng = np.random.default_rng(1)
    payload, meta = encode_fake("image", rng)
    kind, arr = decode_fake(payload)
    assert kind == "image"
    assert arr.shape == (meta["height"], meta["width"], meta["channels"])
    payload, meta = encode_fake("video", rng)
    kind, arr = decode_fake(payload)
    assert kind == "video" and arr.shape[0] == meta["n_frames"]


def test_media_table_deterministic():
    a, b = gen_media_table(30), gen_media_table(30)
    assert a.equals(b)
    kinds = set(a.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_real_codec_gated():
    with pytest.raises((NotImplementedError, ValueError)):
        decode_real(b"FAKE1i" + b"\x00" * 20)


def test_features_batch_direct():
    t = gen_media_table(12)
    out = MediaFeatures()(t)
    assert out.num_rows == 12
    assert out.column("n_bytes").to_pylist() == [
        len(p) for p in t.column("payload").to_pylist()]


def test_media_pipelines(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        q_media_features,
        q_media_frame_pipeline,
    )

    feats = q_media_features("/root/testdata/sf0.001")
    assert len(feats) >= 60
    assert set(feats["kind"]) == {"image", "audio", "video"}
    frames = q_media_frame_pipeline("/root/testdata/sf0.001")
    assert len(frames) > 0
    assert (frames["kind"] == "image").all()
    # resized 32x32x3 frames -> payload = 26-byte header + 3072 body bytes
    assert (frames["n_bytes"] == 26 + 32 * 32 * 3).all()


def test_bundle_roundtrip_bytes(ray_session):
    """write_frame_bundles -> read_frame_bundles returns byte-identical
    frame arrays (the .npz container is real numpy, not a stub)."""
    import shutil

    import numpy as np
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        VideoFrameSample, decode_fake, gen_media_table, read_frame_bundles,
        write_frame_bundles)

    out_dir = "/tmp/test_bundles_rt"
    shutil.rmtree(out_dir, ignore_errors=True)
    frames = (rd.from_arrow(gen_media_table(15))
              .map_batches(VideoFrameSample, batch_format="pyarrow",
                           batch_size=8, concurrency=2))
    orig = {r["media_id"]: decode_fake(r["payload"])[1]
            for r in frames.take_all()}
    assert orig, "fixture should contain videos"
    manifest = write_frame_bundles(frames, out_dir)
    assert (manifest["n_frames"] >= 1).all()
    back = read_frame_bundles(manifest["path"].tolist())
    got = {r["media_id"]: decode_fake(r["payload"])[1]
           for r in back.take_all()}
    assert set(got) == set(orig)
    for mid, arr in orig.items():
        assert np.array_equal(arr, got[mid])
    shutil.rmtree(out_dir, ignore_errors=True)


def test_bundle_roundtrip_query(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        q_media_bundle_roundtrip)

    df = q_media_bundle_roundtrip("/root/testdata/sf0.001")
    assert len(df) > 0 and (df["kind"] == "image").all()


# ---------------------------------------------------------------------------
# Real PNG codec (functions/png.py)
# ---------------------------------------------------------------------------

def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.functions.png import (
        decode_png, encode_png)

    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (3, 5, 3), (16, 16, 3), (7, 1, 4), (33, 17, 2)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(a, decode_png(encode_png(a, ft))), (shape, ft)
    # gradients stress the Average/Paeth predictors:
    g = (np.add.outer(np.arange(40), np.arange(60)) % 256).astype(np.uint8)
    g3 = g[:, :, None].repeat(3, axis=2)
    for ft in range(5):
        assert np.array_equal(g3, decode_png(encode_png(g3, ft)))
    # predictive filters actually compress smooth content:
    assert len(encode_png(g3, 4)) < len(encode_png(g3, 0)) / 2


def test_png_decode_rejects_corruption():
    import numpy as np
    import pytest as pt

    from amazon_textract_transformer_pipeline_ray.functions.png import (
        decode_png, encode_png)

    data = bytearray(encode_png(
        np.zeros((4, 4, 3), dtype=np.uint8)))
    with pt.raises(ValueError, match="signature"):
        decode_png(b"FAKE" + bytes(data))
    data[20] ^= 0xFF  # flip a bit inside IHDR body -> CRC mismatch
    with pt.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decode_auto_mixes_png_and_fake():
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.functions.png import (
        encode_png)
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        decode_auto, decode_real, encode_fake)

    rng = np.random.default_rng(3)
    fake_payload, _ = encode_fake("image", rng)
    kind, arr_fake = decode_auto(fake_payload)
    assert kind == "image" and arr_fake.ndim == 3
    a = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    kind, arr_png = decode_auto(encode_png(a))
    assert kind == "image" and np.array_equal(arr_png, a)
    # decode_real: PNG, WAV and Y4M are real codec paths (no PIL in
    # this container); a FAKE1 payload raises the documented
    # no-codec-for-this-container error
    kind, arr_real = decode_real(encode_png(a))
    assert np.array_equal(arr_real, a)
    audio_payload, _ = encode_fake("audio", np.random.default_rng(4))
    import pytest as pt

    with pt.raises(NotImplementedError, match="No codec for this"):
        decode_real(audio_payload)


def test_png_resize_pipeline(ray_session):
    """q_media_png_roundtrip: real-codec-only path end to end."""
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        q_media_png_roundtrip)

    out = q_media_png_roundtrip("/root/testdata/sf0.001")
    assert len(out) == 20  # 60 rows / 3 kinds -> 20 images
    assert (out["kind"] == "image").all()
    assert (out["n_bytes"] > 0).all()


# ---------------------------------------------------------------------------
# Real WAV codec (functions/wav.py)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_shapes_and_rates():
    from amazon_textract_transformer_pipeline_ray.functions.wav import (
        decode_wav, encode_wav)

    rng = np.random.default_rng(7)
    for n_ch in (1, 2, 6):
        for rate in (8000, 16000, 44100):
            pcm = rng.integers(-32768, 32768, (777, n_ch),
                               dtype=np.int16)
            if n_ch == 1:
                pcm = pcm[:, 0]
            out, got_rate = decode_wav(encode_wav(pcm, rate))
            assert got_rate == rate
            assert np.array_equal(out, pcm), (n_ch, rate)


def test_wav_float_quantization_and_chunk_walk():
    import struct

    from amazon_textract_transformer_pipeline_ray.functions.wav import (
        decode_wav, encode_wav, wav_to_float)

    # float encode quantizes with np.round to int16:
    f = np.array([0.0, 0.5, -1.0, 1.0], dtype=np.float32)
    pcm, rate = decode_wav(encode_wav(f, 8000))
    assert pcm.tolist() == [0, 16384, -32767, 32767]
    assert wav_to_float(pcm).dtype == np.float32
    # chunk walker: a LIST chunk between fmt and data still decodes:
    raw = encode_wav(np.arange(5, dtype=np.int16), 16000)
    fmt_chunk = raw[12:36]       # 8 + 16 bytes
    data_chunk = raw[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    doctored = raw[:12] + fmt_chunk + extra + data_chunk
    out, got_rate = decode_wav(doctored)
    assert got_rate == 16000 and out.tolist() == [0, 1, 2, 3, 4]


def test_wav_decode_rejects_non_wav():
    import pytest as pt

    from amazon_textract_transformer_pipeline_ray.functions.wav import (
        decode_wav)

    with pt.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")
    with pt.raises(ValueError):
        decode_wav(b"FAKE1a" + bytes(26))


def test_decode_paths_handle_wav():
    from amazon_textract_transformer_pipeline_ray.functions.wav import (
        encode_wav)
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        decode_auto, decode_real)

    pcm = np.arange(-100, 100, dtype=np.int16)
    payload = encode_wav(pcm, 16000)
    for dec in (decode_auto, decode_real):
        kind, arr = dec(payload)
        assert kind == "audio"
        assert arr.dtype == np.float32
        assert np.array_equal(arr, pcm.astype(np.float32) / 32768.0)


def test_media_table_wav_codec_and_query(ray_session):
    from amazon_textract_transformer_pipeline_ray.functions.wav import (
        WAV_SIGNATURE, decode_wav)
    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        decode_fake, gen_media_table, q_media_wav_roundtrip)

    fake = gen_media_table(12)
    wav = gen_media_table(12, audio_codec="wav")
    for i in range(12):
        kind = fake.column("kind")[i].as_py()
        p_fake = fake.column("payload")[i].as_py()
        p_wav = wav.column("payload")[i].as_py()
        if kind != "audio":
            assert p_fake == p_wav
            continue
        assert p_wav.startswith(WAV_SIGNATURE)
        # same underlying sample content as the FAKE1 row:
        _, fake_arr = decode_fake(p_fake)
        body = np.round(fake_arr.astype(np.float64) * 255.0).astype(np.uint8)
        pcm, rate = decode_wav(p_wav)
        assert rate == fake.column("sample_rate")[i].as_py()
        assert np.array_equal(
            pcm, ((body.astype(np.int32) - 128) * 256).astype(np.int16))

    df = q_media_wav_roundtrip("/root/testdata/sf0.001")
    assert len(df) == 20  # every 3rd of max(60, ...) rows is audio
    assert set(df["kind"]) == {"audio"}
    assert (df["n_bytes"] > 44).all()


def test_y4m_codec_roundtrip():
    """Y4M encode/decode is byte-lossless both ways, and rejects
    malformed streams."""
    import numpy as np
    import pytest

    from amazon_textract_transformer_pipeline_ray.functions.y4m import (
        Y4M_SIGNATURE, decode_y4m, encode_y4m)

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (6, 19, 31, 3), dtype=np.uint8)
    blob = encode_y4m(frames)
    assert blob.startswith(Y4M_SIGNATURE)
    back = decode_y4m(blob)
    assert back.dtype == np.uint8 and (back == frames).all()
    assert encode_y4m(back) == blob
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx")
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + b"\0" * 6)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(blob[:-1])


def test_y4m_fixture_and_real_decode(ray_session):
    """video_codec="y4m" fixture rows carry the same frame content as the
    FAKE1 source, and both decode_auto and decode_real read them."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        decode_auto, decode_fake, decode_real, gen_media_table)

    fake = gen_media_table(9)
    real = gen_media_table(9, video_codec="y4m")
    for i, kind in enumerate(real.column("kind").to_pylist()):
        if kind != "video":
            continue
        src = fake.column("payload").to_pylist()[i]
        y4m = real.column("payload").to_pylist()[i]
        _, expect = decode_fake(src)
        for dec in (decode_auto, decode_real):
            k, arr = dec(y4m)
            assert k == "video" and (arr == expect).all()


def test_y4m_frame_sample_matches_fake(ray_session):
    """VideoFrameSample over Y4M videos emits the same frames as over the
    FAKE1 originals."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        VideoFrameSample, gen_media_table)

    def sampled(table):
        ds = rd.from_arrow(table).map_batches(
            VideoFrameSample, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2))
        return (ds.to_pandas().sort_values("media_id")
                .reset_index(drop=True))

    a = sampled(gen_media_table(12))
    b = sampled(gen_media_table(12, video_codec="y4m"))
    assert a.equals(b)
