"""Pure stdlib+numpy YUV4MPEG2 (Y4M) video codec — the real, documented
uncompressed video container (mjpegtools spec): one ASCII stream header,
then ``FRAME\\n`` markers each followed by raw planar data.

Like functions/png.py (images) and functions/wav.py (audio), this gives
the multimodal suite a REAL container for its third media kind: the
engine's video payloads are genuine Y4M streams any yuv4mpeg-aware tool
can read.  Only the C444 colorspace (three full-resolution planes) is
implemented — it maps 1:1 onto the fixture's (frames, h, w, 3) uint8
arrays, carried plane-per-channel, so encode->decode is byte-lossless.
Compressed video formats (h264/vp9/...) remain out of scope: their
codecs are not in this container (multimodal.decode_real documents
that residual gap).
"""

from __future__ import annotations

import numpy as np

Y4M_SIGNATURE = b"YUV4MPEG2 "
_FRAME = b"FRAME"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w, 3) uint8 -> Y4M bytes (C444, one plane per
    channel, progressive, 1:1 pixel aspect)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("expected (n_frames, h, w, 3) array")
    if frames.dtype != np.uint8:
        raise ValueError("expected uint8 frames")
    nf, h, w, _ = frames.shape
    out = [Y4M_SIGNATURE +
           f"W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444".encode() + b"\n"]
    # planar: channel-major per frame, C-contiguous rows (no per-pixel
    # Python work — transpose + tobytes is a single buffer copy)
    planar = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))
    for fi in range(nf):
        out.append(_FRAME + b"\n")
        out.append(planar[fi].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Y4M bytes -> (n_frames, h, w, 3) uint8.  C444 only; raises
    ValueError on other colorspaces or malformed streams."""
    if not payload.startswith(Y4M_SIGNATURE):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "C420jpeg"  # spec default when the C tag is absent
    for tok in payload[len(Y4M_SIGNATURE) - 1:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r} "
                         "(only C444 is implemented)")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos:pos + len(_FRAME)] != _FRAME:
            raise ValueError("malformed Y4M: expected FRAME marker")
        eol = payload.index(b"\n", pos)  # FRAME may carry parameters
        start = eol + 1
        end = start + frame_bytes
        if end > n:
            raise ValueError("truncated Y4M frame")
        planar = np.frombuffer(payload[start:end],
                               dtype=np.uint8).reshape(3, h, w)
        frames.append(planar.transpose(1, 2, 0))
        pos = end
    if not frames:
        raise ValueError("Y4M stream holds no frames")
    return np.stack(frames)
