"""Real WAV (RIFF / PCM) audio codec — pure numpy + stdlib struct.

Counterpart of ``functions/png.py`` for the audio column: the reference's
vision branch ships real containers end-to-end (its thumbnailer consumes
real image bytes, ``notebooks/preproc/textract_transformers/image_utils.py``),
so the multimodal plumbing here does the same for audio — genuine RIFF
files a desktop player could open, with no external codec library.

Scope: uncompressed PCM (format tag 1), 16-bit little-endian, any channel
count / sample rate.  The chunk walker tolerates extra chunks (LIST,
fact, …) in any order, as real-world writers emit them.  Decode is
vectorized (one ``np.frombuffer`` over the data chunk); encode is one
header pack + one ``tobytes``.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIGNATURE = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 samples -> RIFF/WAVE bytes.

    ``samples``: int16 array, shape (n,) mono or (n, channels); float
    input in [-1, 1] is quantized to int16 (round-half-away like most
    encoders: ``np.round``).
    """
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        arr = np.clip(np.round(arr.astype(np.float64) * 32767.0),
                      -32768, 32767).astype("<i2")
    else:
        arr = arr.astype("<i2", copy=False)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    data = arr.tobytes()  # interleaved frames, row-major
    byte_rate = sample_rate * n_ch * 2
    block_align = n_ch * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                             byte_rate, block_align, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 samples, sample_rate).

    Samples come back shape (n_frames,) for mono, (n_frames, channels)
    otherwise.  Walks the chunk list, so writers that insert LIST/fact
    chunks or put fmt after other chunks still decode.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
    arr = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        arr = arr[: (len(arr) // n_ch) * n_ch].reshape(-1, n_ch)
    return arr, rate


def wav_to_float(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> float32 in [-1, 1) (the shape feature stages eat)."""
    return samples.astype(np.float32) / 32768.0
