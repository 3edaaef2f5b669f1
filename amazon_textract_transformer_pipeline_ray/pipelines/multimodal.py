"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The reference's vision branch (PDF -> page thumbnails -> ``.npz`` of PNG
bytes, ``notebooks/preproc/textract_transformers/preproc.py:61-173``;
reader ``inference.py:236-275``) is the template: binary payloads ride
next to typed metadata, decode/resize happen once per worker-held stage.

Codecs: STILL IMAGES ARE REAL — payloads can be genuine PNG files,
encoded/decoded by the in-repo pure numpy+zlib codec
(``functions/png.py``; PIL is used instead when importable).  The
deterministic ``FAKE1`` container (header + raw little-endian dims +
seeded bytes) remains for audio/video, whose codec libraries are not in
this container — that is the one remaining stub, gated in
``decode_real``.  Every stage sniffs the container magic, so PNG and
FAKE1 payloads mix freely in one column.

Batch-size guidance for binary rows (ray_guide 'Memory-aware'): payload
rows here are ~0.1-1 MB, so stages run with small ``batch_size`` (32) and
rely on the streaming executor + object-store spilling rather than large
in-heap batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque container bytes
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("channels", pa.int8()),
    ("sample_rate", pa.int32()),    # audio
    ("n_frames", pa.int32()),       # video/audio
])

_MAGIC = b"FAKE1"


def encode_fake(kind: str, rng: np.random.Generator) -> tuple[bytes, dict]:
    """Deterministic fake container: header (magic, kind, dims) + payload
    bytes derived from the seed."""
    if kind == "image":
        w, h, c, sr, nf = int(rng.integers(16, 128)), int(rng.integers(16, 128)), 3, 0, 1
    elif kind == "audio":
        w, h, c, sr, nf = 0, 0, 1, 16000, int(rng.integers(1000, 16000))
    else:  # video
        w, h, c, sr, nf = int(rng.integers(16, 64)), int(rng.integers(16, 64)), 3, 0, int(rng.integers(4, 32))
    n_body = (w * h * c * nf) if kind != "audio" else nf
    body = rng.integers(0, 256, n_body, dtype=np.uint8).tobytes()
    header = _MAGIC + kind[:1].encode() + struct.pack("<iiiii", w, h, c, sr, nf)
    meta = {"width": w, "height": h, "channels": c, "sample_rate": sr,
            "n_frames": nf}
    return header + body, meta


def gen_media_table(n: int, seed: int = 20260817,
                    image_codec: str = "fake",
                    audio_codec: str = "fake",
                    video_codec: str = "fake") -> pa.Table:
    """Deterministic media fixture table.  ``image_codec="png"`` encodes
    the image rows as REAL PNG files (same pixel content, real
    container) via functions/png.py; ``audio_codec="wav"`` encodes the
    audio rows as REAL RIFF/PCM16 files (same sample content) via
    functions/wav.py; ``video_codec="y4m"`` encodes the video rows as
    REAL YUV4MPEG2 streams (same frame content, C444 planar) via
    functions/y4m.py."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        rng = np.random.default_rng([seed, i])
        kind = kinds[i % 3]
        payload, meta = encode_fake(kind, rng)
        if kind == "image" and image_codec == "png":
            from ..functions.png import encode_png

            _, arr = decode_fake(payload)
            payload = encode_png(arr, filter_type=4)
        elif kind == "audio" and audio_codec == "wav":
            from ..functions.wav import encode_wav

            body = np.frombuffer(payload[26:], dtype=np.uint8)
            pcm = ((body.astype(np.int32) - 128) * 256).astype(np.int16)
            payload = encode_wav(pcm, meta["sample_rate"])
        elif kind == "video" and video_codec == "y4m":
            from ..functions.y4m import encode_y4m

            _, arr = decode_fake(payload)
            payload = encode_y4m(arr)
        rows.append({"media_id": i, "kind": kind, "payload": payload, **meta})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def decode_fake(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode the deterministic fake container -> (kind, array)."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a FAKE1 container")
    kind = {"i": "image", "a": "audio", "v": "video"}[chr(payload[5])]
    w, h, c, sr, nf = struct.unpack("<iiiii", payload[6:26])
    body = np.frombuffer(payload[26:], dtype=np.uint8)
    if kind == "image":
        return kind, body.reshape(h, w, c)
    if kind == "audio":
        return kind, body.astype(np.float32) / 255.0
    return kind, body.reshape(nf, h, w, c)


def decode_auto(payload: bytes) -> tuple[str, np.ndarray]:
    """Container-sniffing decode: real PNG (functions/png.py), real WAV
    (functions/wav.py), real Y4M video (functions/y4m.py) or the
    deterministic FAKE1 container — all four mix freely in one column."""
    from ..functions.png import PNG_SIGNATURE, decode_png
    from ..functions.wav import WAV_SIGNATURE, decode_wav, wav_to_float
    from ..functions.y4m import Y4M_SIGNATURE, decode_y4m

    if payload.startswith(PNG_SIGNATURE):
        return "image", decode_png(payload)
    if payload.startswith(WAV_SIGNATURE):
        return "audio", wav_to_float(decode_wav(payload)[0])
    if payload.startswith(Y4M_SIGNATURE):
        return "video", decode_y4m(payload)
    return decode_fake(payload)


def decode_real(payload: bytes) -> tuple[str, np.ndarray]:
    """Real-codec-only path: PNG images decode for real (PIL when
    importable, else the in-repo pure numpy+zlib codec), WAV audio
    decodes for real (functions/wav.py, pure stdlib+numpy); video
    codecs are not installed in this container — that residual stub
    raises behind the import-try."""
    from ..functions.png import PNG_SIGNATURE, decode_png
    from ..functions.wav import WAV_SIGNATURE, decode_wav, wav_to_float

    if payload.startswith(PNG_SIGNATURE):
        try:  # pragma: no cover - PIL absent in this container
            import io

            import PIL.Image

            return "image", np.asarray(PIL.Image.open(io.BytesIO(payload)))
        except ImportError:
            return "image", decode_png(payload)
    if payload.startswith(WAV_SIGNATURE):
        return "audio", wav_to_float(decode_wav(payload)[0])
    from ..functions.y4m import Y4M_SIGNATURE, decode_y4m

    if payload.startswith(Y4M_SIGNATURE):
        return "video", decode_y4m(payload)
    try:  # pragma: no cover - container lacks compressed-video codecs
        import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "No codec for this container: images decode via the real PNG "
            "codec, audio via the real WAV codec, video via the real "
            "YUV4MPEG2 codec (functions/y4m.py); COMPRESSED video "
            "(h264/vp9/...) has no codec in this environment."
        ) from e
    raise NotImplementedError("wire av decode here")  # pragma: no cover


class MediaFeatures:
    """Actor-pool stage: decode + per-item features (mean/std per channel
    for images, rms for audio, frame count for video).

    Real numpy compute on the decoded arrays; only the codec is fake."""

    def __init__(self, use_real_codec: bool = False):
        self.decode = decode_real if use_real_codec else decode_auto

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out = {"media_id": [], "kind": [], "n_bytes": [],
               "mean_value": [], "std_value": [], "content_crc": []}
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            kind, arr = self.decode(payload)
            flat = arr.astype(np.float64).ravel()
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["n_bytes"].append(len(payload))
            out["mean_value"].append(float(flat.mean()) if flat.size else 0.0)
            out["std_value"].append(float(flat.std()) if flat.size else 0.0)
            out["content_crc"].append(zlib.crc32(payload))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "kind": pa.array(out["kind"], pa.string()),
            "n_bytes": pa.array(out["n_bytes"], pa.int64()),
            "mean_value": pa.array(out["mean_value"], pa.float64()),
            "std_value": pa.array(out["std_value"], pa.float64()),
            "content_crc": pa.array(out["content_crc"], pa.uint32()),
        })


class ImageResize:
    """Actor-pool stage: resize/letterbox images with the reference's
    sizing semantics (``image_utils.py:82-168``, re-implemented in pure
    numpy with bilinear resampling — ``functions/image_ops.py``); other
    kinds pass through untouched.

    ``letterbox_color`` set -> fit + center on a solid canvas;
    ``default_square=False`` -> shortest-edge mode with optional
    ``max_size`` cap (the reference's thumbnail-generation knobs)."""

    def __init__(self, target: int | tuple[int, int] = 32,
                 default_square: bool = True,
                 letterbox_color: tuple[int, int, int] | None = None,
                 max_size: int | None = None):
        from ..functions.image_ops import resize_image_array

        self._resize = resize_image_array
        self.target = target
        self.default_square = default_square
        self.letterbox_color = letterbox_color
        self.max_size = max_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.png import PNG_SIGNATURE, encode_png

        rows = batch.to_pylist()
        for row in rows:
            if row["kind"] != "image":
                continue
            is_png = row["payload"].startswith(PNG_SIGNATURE)
            _, arr = decode_auto(row["payload"])
            out = self._resize(arr, self.target,
                               default_square=self.default_square,
                               letterbox_color=self.letterbox_color,
                               max_size=self.max_size)
            h, w, c = out.shape
            if is_png:  # re-encode in the input's container
                row["payload"] = encode_png(out, filter_type=4)
            else:
                header = _MAGIC + b"i" + struct.pack("<iiiii", w, h, c, 0, 1)
                row["payload"] = header + out.tobytes()
            row["width"] = w
            row["height"] = h
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class VideoFrameSample:
    """Actor-pool stage: sample every k-th frame of a video (FAKE1 or
    real Y4M container) into image rows (flat-map: one video -> several
    image rows)."""

    def __init__(self, every: int = 4):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            if row["kind"] != "video":
                continue
            _, arr = decode_auto(row["payload"])
            for fi in range(0, arr.shape[0], self.every):
                frame = arr[fi]
                h, w, c = frame.shape
                header = _MAGIC + b"i" + struct.pack("<iiiii", w, h, c, 0, 1)
                out_rows.append({
                    "media_id": row["media_id"] * 1000 + fi,
                    "kind": "image", "payload": header + frame.tobytes(),
                    "width": w, "height": h, "channels": c,
                    "sample_rate": 0, "n_frames": 1,
                })
        return pa.Table.from_pylist(out_rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real binary bundle sink/source: compressed .npz archives (the reference's
# actual bundle container — resized page thumbnails are written with
# np.savez_compressed and read back with np.load; preproc.py:61-173,
# inference.py:145-171,236-240).  numpy IS the codec here, so unlike the
# image/audio decode stubs this path is fully real.
# ---------------------------------------------------------------------------

def write_frame_bundles(frames: rd.Dataset, out_dir: str) -> pd.DataFrame:
    """Sink stage: one compressed ``.npz`` bundle per SOURCE media item
    (grouping sampled frames back to their video), plus a manifest.

    The groupby guarantees all frames of one source land in one task no
    matter how batches were split upstream — the bundle is written once,
    atomically (tmp + rename), mirroring the reference's one-archive-per-
    document layout."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def bundle(g: pd.DataFrame) -> pd.DataFrame:
        src = int(g["src_id"].iloc[0])
        g = g.sort_values("media_id")
        arrays = {}
        for mid, payload in zip(g["media_id"], g["payload"]):
            _, arr = decode_fake(payload)
            arrays[f"frame_{int(mid) % 1000:04d}"] = arr
        path = os.path.join(out_dir, f"bundle-{src:06d}.npz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
        return pd.DataFrame({
            "src_id": pd.Series([src], dtype=np.int64),
            "path": [path],
            "n_frames": pd.Series([len(arrays)], dtype=np.int64),
            "n_bytes": pd.Series([os.path.getsize(path)], dtype=np.int64),
        })

    def add_src(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        return batch.append_column(
            "src_id", pa.array(ids // 1000, pa.int64()))

    with_src = frames.map_batches(add_src, batch_format="pyarrow")
    return (with_src.groupby("src_id").map_groups(bundle,
                                                  batch_format="pandas")
            .to_pandas().sort_values("src_id").reset_index(drop=True))


def read_frame_bundles(paths: list[str]) -> rd.Dataset:
    """Source stage: .npz bundles -> image rows (MEDIA_SCHEMA), the
    reference's np.load(bio) reader shape (inference.py:236-240)."""
    def load(batch: pa.Table) -> pa.Table:
        rows = []
        for path in batch.column("path").to_pylist():
            import os

            src = int(os.path.basename(path).split("-")[1].split(".")[0])
            with np.load(path) as npz:
                for key in sorted(npz.files):
                    arr = npz[key]
                    h, w, c = arr.shape
                    header = _MAGIC + b"i" + struct.pack(
                        "<iiiii", w, h, c, 0, 1)
                    rows.append({
                        "media_id": src * 1000 + int(key.split("_")[1]),
                        "kind": "image",
                        "payload": header + arr.tobytes(),
                        "width": w, "height": h, "channels": c,
                        "sample_rate": 0, "n_frames": 1,
                    })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    ds = rd.from_items([{"path": p} for p in paths])
    return ds.map_batches(load, batch_format="pyarrow", batch_size=8)


def q_media_bundle_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Frame-sample videos, write per-source .npz bundles, read them back
    and feature-extract — the full binary-bundle sink/source roundtrip
    (rows-only; byte-equality asserted in tests)."""
    import os
    import shutil

    n = 30
    out_dir = f"/tmp/attp_bundles_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    frames = (rd.from_arrow(gen_media_table(n))
              .map_batches(VideoFrameSample, batch_format="pyarrow",
                           batch_size=32, concurrency=(1, 2)))
    manifest = write_frame_bundles(frames, out_dir)
    back = read_frame_bundles(manifest["path"].tolist())
    feats = back.map_batches(MediaFeatures, batch_format="pyarrow",
                             batch_size=32, concurrency=(1, 2)).to_pandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    return feats.sort_values("media_id").reset_index(drop=True)


def q_media_png_roundtrip(sf_dir: str) -> pd.DataFrame:
    """REAL-codec image pipeline: PNG payloads (pure numpy+zlib codec,
    functions/png.py) -> resize stage (decodes PNG, re-encodes PNG) ->
    feature stage under ``use_real_codec=True`` — no fake containers
    anywhere on this path.  Rows-only at the driver; pixel equality of
    the codec roundtrip is asserted in tests."""
    import os

    sf = 0.01
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n = max(60, int(6000 * sf))
    # every 3rd row of the fixture is an image; keep only those:
    table = gen_media_table(n, image_codec="png")
    table = table.filter(pa.compute.equal(table.column("kind"), "image"))
    ds = rd.from_arrow(table)
    resized = ds.map_batches(ImageResize, batch_format="pyarrow",
                             batch_size=32, concurrency=(1, 2))
    feats = resized.map_batches(
        MediaFeatures, fn_constructor_kwargs={"use_real_codec": True},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2))
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)


def q_media_wav_roundtrip(sf_dir: str) -> pd.DataFrame:
    """REAL-codec audio pipeline: RIFF/PCM16 payloads (pure stdlib+numpy
    codec, functions/wav.py) -> feature stage under
    ``use_real_codec=True`` — no fake containers on this path.
    Rows-only at the driver; sample equality of the codec roundtrip is
    asserted in tests."""
    import os

    sf = 0.01
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n = max(60, int(6000 * sf))
    # every 3rd row of the fixture is audio; keep only those:
    table = gen_media_table(n, audio_codec="wav")
    table = table.filter(pa.compute.equal(table.column("kind"), "audio"))
    ds = rd.from_arrow(table)
    feats = ds.map_batches(
        MediaFeatures, fn_constructor_kwargs={"use_real_codec": True},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2))
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)


def q_media_y4m_roundtrip(sf_dir: str) -> pd.DataFrame:
    """REAL-codec video pipeline: YUV4MPEG2 payloads (pure stdlib+numpy
    codec, functions/y4m.py) -> feature stage under
    ``use_real_codec=True`` — no fake containers on this path; the
    independent oracle re-parses the streams with its own loop-style
    Y4M reader."""
    import os

    sf = 0.01
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n = max(60, int(6000 * sf))
    # every 3rd row of the fixture is video; keep only those:
    table = gen_media_table(n, video_codec="y4m")
    table = table.filter(pa.compute.equal(table.column("kind"), "video"))
    ds = rd.from_arrow(table)
    feats = ds.map_batches(
        MediaFeatures, fn_constructor_kwargs={"use_real_codec": True},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2))
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Decode + feature-extract over a deterministic media table sized by
    sf (rows-only check: binary fixtures are engine-generated)."""
    import os

    sf = 0.01
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n = max(60, int(6000 * sf))
    ds = rd.from_arrow(gen_media_table(n))
    feats = ds.map_batches(MediaFeatures, batch_format="pyarrow",
                           batch_size=32, concurrency=(1, 4))
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)


def q_media_frame_pipeline(sf_dir: str) -> pd.DataFrame:
    """Video -> frame sample -> resize -> features (chained actor stages);
    returns per-frame features."""
    import os

    sf = 0.01
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        pass
    n = max(30, int(1500 * sf))
    ds = rd.from_arrow(gen_media_table(n))
    frames = ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 2))
    resized = frames.map_batches(ImageResize, batch_format="pyarrow",
                                 batch_size=32, concurrency=(1, 2))
    feats = resized.map_batches(MediaFeatures, batch_format="pyarrow",
                                batch_size=32, concurrency=(1, 2))
    return feats.to_pandas().sort_values("media_id").reset_index(drop=True)
