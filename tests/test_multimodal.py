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
