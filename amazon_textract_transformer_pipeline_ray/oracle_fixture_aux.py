"""Driver-visible oracle fixtures for the deterministic doc/embedding/
media queries (the dedup, similarity and multimodal suites).

Same contract as ``oracle_fixture.py`` (which covers the extraction
tables): the correctness driver cross-checks every query against an
ANSI-SQL oracle run by DuckDB.  MinHash banding, SimHash, winnowing and
hyperplane-LSH are deterministic functions of the input tables but not
SQL-expressible, so this module computes each query's expected output
with an INDEPENDENT single-process implementation — straight-line
numpy/pandas over the raw parquet, none of the engine's batch kernels,
shard/bucket shuffles, first-collision dedup or partial-top-k merges —
and materializes it as a parquet fixture that ``oracle_sql()`` reads via
``read_parquet()``.  The driver's hash compare then verifies the
distributed pipeline end-to-end against the independent implementation.

Shared SPEC constants (hash-permutation parameters, band/table geometry,
hyperplane seeds) are imported from the pipeline modules — they define
WHAT function is being computed, exactly like a config.  Everything
about HOW it is computed here is separate code.

Layout (scratch, regenerated on demand, cached per (corpus, table)):

    /tmp/attp_oracle_aux/<sf-tag>-v<N>/<name>.parquet
    /tmp/attp_oracle_aux/current -> symlink to the tag dir (atomic swap)

``oracle_sql()`` strings are static, so each wrapped ``queries()``
callable re-points ``current`` at its scale factor before running.
Set ``GRAFT_SKIP_AUX_FIXTURES=1`` to skip generation (bench runs, where
the oracle side is never read and fixture cost would pollute timings).
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

AUX_ROOT = "/tmp/attp_oracle_aux"
AUX_CURRENT = os.path.join(AUX_ROOT, "current")
AUX_VERSION = 2

# Rabin-Karp spec constants (pipelines/text.py):
_RH_BASE = 257
_RH_MOD = 1_000_000_007


def _relink(link: str, target: str) -> None:
    os.makedirs(os.path.dirname(link), exist_ok=True)
    tmp = f"{link}.tmp.{os.getpid()}"
    try:
        os.symlink(target, tmp)
        os.replace(tmp, link)
    finally:
        if os.path.islink(tmp):
            os.unlink(tmp)


def _docs(sf_dir: str) -> tuple[np.ndarray, list[str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    return (t.column("doc_id").to_numpy().astype(np.int64),
            t.column("text").to_pylist())


def _tokens(text: str) -> list[str]:
    return text.strip().split() if text.strip() else []
# NOTE: the engine tokenizes with re.split(r"\s+"); ``str.split()`` is
# the independent restatement (identical on every corpus because
# re-split's empty leading/trailing fields are removed by .strip()).


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """The 64-bit token-id primitive (pandas siphash) — the shared spec
    hash function, applied here one doc at a time."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(
        np.asarray(tokens, dtype=object)).astype(np.uint64)


# ---------------------------------------------------------------------------
# Expected-table builders (one per query; each a pure function of sf_dir)
# ---------------------------------------------------------------------------

def _expected_rolling_fp(sf_dir: str) -> pa.Table:
    """Horner-form Rabin-Karp per doc, pure-Python ints — a genuinely
    different evaluation order than the engine's vectorized
    power-table multiply-sum (text.py:rolling_fingerprint); the two are
    equal by modular arithmetic, which is exactly what the check pins."""
    ids, texts = _docs(sf_dir)
    fps = []
    for t in texts:
        h = 0
        for b in t.encode("utf-8"):
            h = (h * _RH_BASE + b) % _RH_MOD
        fps.append(h)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "rolling_fp": pa.array(np.array(fps, dtype=np.uint64))})


def _simhash_one(text: str) -> int:
    """Per-doc SimHash: Counter-based distinct-token counts, per-doc
    numpy bit accumulation — no batch segmentation machinery."""
    counts = Counter(_tokens(text))
    if not counts:
        return 0
    toks = list(counts)
    h = _hash_tokens(toks)
    c = np.array([counts[t] for t in toks], dtype=np.int64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * c[:, None]).sum(axis=0)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val


def _expected_simhash(sf_dir: str) -> pa.Table:
    ids, texts = _docs(sf_dir)
    hs = np.array([_simhash_one(t) for t in texts], dtype=np.uint64)
    # int64 bit-reinterpretation: the driver-visible column is signed so
    # the pandas/DuckDB hash round trip never sees an out-of-int64 value
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "simhash": pa.array(hs.view(np.int64))})


def _expected_simhash_pairs(sf_dir: str, max_hamming: int) -> pa.Table:
    """ALL-pairs Hamming scan over the independent simhash values — no
    banding, no pigeonhole blocking, no shards (the engine's 4x16-bit
    band path must find exactly this set for d <= 3)."""
    t = _expected_simhash(sf_dir)
    ids = t.column("doc_id").to_numpy()
    h = t.column("simhash").to_numpy().view(np.uint64)
    out_a, out_b = [], []
    chunk = 512
    for s in range(0, len(h), chunk):
        x = h[s:s + chunk, None] ^ h[None, :]
        pop = np.unpackbits(
            x.view(np.uint8).reshape(len(x), len(h), 8), axis=2).sum(axis=2)
        ia, ib = np.nonzero(pop <= max_hamming)
        ga = ia + s
        keep = ga < ib
        out_a.append(ids[ga[keep]])
        out_b.append(ids[ib[keep]])
    a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
    return pa.table({"doc_id_a": pa.array(np.minimum(a, b), pa.int64()),
                     "doc_id_b": pa.array(np.maximum(a, b), pa.int64())})


def _expected_winnow(sf_dir: str, k: int, w: int) -> pa.Table:
    """Winnowing fingerprints as the SET of sliding-window k-gram-hash
    minima (the SIGMOD'03 selection rule picks, per window, its minimum's
    rightmost position — so the selected VALUES are exactly the distinct
    window minima; this restatement skips the positional dance the engine
    performs).  Exploded one row per (doc, fingerprint)."""
    ids, texts = _docs(sf_dir)
    out_ids, out_fps = [], []
    pows = (np.uint64(31) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
    for did, t in zip(ids.tolist(), texts):
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        n = len(data) - k + 1
        if n <= 0:
            continue
        grams = np.lib.stride_tricks.sliding_window_view(
            data, k).astype(np.uint64)
        h = (grams * pows[None, :]).sum(axis=1)
        if n <= w:
            fps = np.unique(h.min(keepdims=True))
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, w)
            fps = np.unique(wins.min(axis=1))
        out_ids.extend([did] * len(fps))
        out_fps.extend(fps.tolist())
    return pa.table({
        "doc_id": pa.array(out_ids, pa.int64()),
        "fingerprint": pa.array(
            np.array(out_fps, dtype=np.uint64).view(np.int64)),
    })


def _expected_minhash_pairs(sf_dir: str, threshold: float) -> pa.Table:
    """MinHash-LSH expected pairs, single-process: per-doc signatures via
    the spec permutation constants, per-doc band keys via a scalar fold
    loop, candidates from a chunked ALL-pairs band-equality scan (no
    sharding / first-band bookkeeping), exact Jaccard via a dense
    incidence matrix over the corpus vocabulary (no bucket-local
    vocabularies)."""
    from .pipelines.dedup import _MH_A, _MH_B, _MOD, LSH_BANDS, MINHASH_PERMS

    ids, texts = _docs(sf_dir)
    n = len(ids)
    sets = [np.unique(_hash_tokens(_tokens(t))) for t in texts]

    rows_per_band = MINHASH_PERMS // LSH_BANDS
    bands = np.empty((n, LSH_BANDS), dtype=np.uint32)
    for i, s in enumerate(sets):
        if len(s) == 0:
            sig = np.full(MINHASH_PERMS, _MOD, dtype=np.uint64)
        else:
            sig = ((s[:, None] * _MH_A[None, :] + _MH_B[None, :])
                   % _MOD).min(axis=0)
        with np.errstate(over="ignore"):  # uint64 wraparound is the spec
            for b in range(LSH_BANDS):
                acc = np.uint64(0)
                for j in range(rows_per_band):
                    acc = (acc ^ sig[b * rows_per_band + j]) * np.uint64(
                        0x9E3779B97F4A7C15)
                    acc ^= acc >> np.uint64(29)
                bands[i, b] = np.uint32(acc & np.uint64(0xFFFFFFFF))

    # candidate pairs: any band agrees (chunked all-pairs scan)
    cand_a, cand_b = [], []
    chunk = 512
    for s in range(0, n, chunk):
        eq = (bands[s:s + chunk, None, :] == bands[None, :, :]).any(axis=2)
        ia, ib = np.nonzero(eq)
        ga = ia + s
        keep = ga < ib
        cand_a.append(ga[keep])
        cand_b.append(ib[keep])
    ca = np.concatenate(cand_a) if cand_a else np.zeros(0, np.int64)
    cb = np.concatenate(cand_b) if cand_b else np.zeros(0, np.int64)

    # exact Jaccard on candidates via one corpus-wide incidence matrix
    vocab = np.unique(np.concatenate([s for s in sets if len(s)] or
                                     [np.zeros(0, np.uint64)]))
    inc = np.zeros((n, max(len(vocab), 1)), dtype=np.float32)
    for i, s in enumerate(sets):
        if len(s):
            inc[i, np.searchsorted(vocab, s)] = 1.0
    sizes = inc.sum(axis=1).astype(np.float64)
    inter = np.einsum("ij,ij->i", inc[ca], inc[cb]).astype(np.float64)
    union = sizes[ca] + sizes[cb] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, inter / union, 0.0)
    keep = jac >= threshold
    a_ids, b_ids = ids[ca[keep]], ids[cb[keep]]
    return pa.table({
        "doc_id_a": pa.array(np.minimum(a_ids, b_ids), pa.int64()),
        "doc_id_b": pa.array(np.maximum(a_ids, b_ids), pa.int64()),
        "jaccard": pa.array(jac[keep], pa.float64()),
    })


def _embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


def _codes(x: np.ndarray, planes: np.ndarray) -> np.ndarray:
    pow2 = 1 << np.arange(planes.shape[2], dtype=np.uint32)
    return np.stack([((x @ planes[t]) > 0).astype(np.uint32) @ pow2
                     for t in range(planes.shape[0])], axis=1)


def _expected_knn_lsh(sf_dir: str) -> pa.Table:
    """Single-process multiprobe LSH top-k: whole-corpus candidate mask
    per query, one global sort — no per-batch partial top-k or merge."""
    from .pipelines.similarity import (KNN_K, N_HYPERPLANES, N_LSH_TABLES,
                                       N_QUERIES, _hyperplanes)

    ids, x = _embeddings(sf_dir)
    qsel = ids < N_QUERIES
    qids, qn = ids[qsel], x[qsel]
    order = np.argsort(qids)
    qids, qn = qids[order], qn[order]
    planes = _hyperplanes(x.shape[1], N_HYPERPLANES, N_LSH_TABLES)
    codes = _codes(x, planes)
    qcodes = _codes(qn, planes)
    flips = np.concatenate(
        [[0], 1 << np.arange(N_HYPERPLANES, dtype=np.uint32)]
    ).astype(np.uint32)
    out_q, out_r, out_n = [], [], []
    for qi, qid in enumerate(qids.tolist()):
        probes = qcodes[qi][:, None] ^ flips[None, :]  # (L, 1+bits)
        mask = np.zeros(len(ids), dtype=bool)
        for t in range(codes.shape[1]):
            mask |= np.isin(codes[:, t], probes[t])
        cand = np.flatnonzero(mask & (ids != qid))
        if len(cand) == 0:
            continue
        sims = x[cand] @ qn[qi]
        top = cand[np.lexsort((ids[cand], -sims))[:KNN_K]]
        out_q.extend([qid] * len(top))
        out_r.extend(range(1, len(top) + 1))
        out_n.extend(ids[top].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64())})


def _expected_dup_pairs_lsh(sf_dir: str) -> pa.Table:
    """Single-process LSH near-dup pairs: chunked all-pairs any-table
    collision scan + exact cosine — no bucket groupby, no first-table
    dedup bookkeeping."""
    from .pipelines.similarity import DUP_COSINE, _hyperplanes

    ids, x = _embeddings(sf_dir)
    planes = _hyperplanes(x.shape[1], 6, 12)  # spec geometry
    codes = _codes(x, planes)
    out_a, out_b = [], []
    chunk = 512
    n = len(ids)
    for s in range(0, n, chunk):
        eq = (codes[s:s + chunk, None, :] == codes[None, :, :]).any(axis=2)
        ia, ib = np.nonzero(eq)
        ga = ia + s
        keep = ga < ib
        ga, ib = ga[keep], ib[keep]
        if len(ga) == 0:
            continue
        sims = np.einsum("ij,ij->i", x[ga], x[ib])
        hit = sims >= DUP_COSINE
        out_a.append(ids[ga[hit]])
        out_b.append(ids[ib[hit]])
    a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
    return pa.table({
        "vec_id_a": pa.array(np.minimum(a, b), pa.int64()),
        "vec_id_b": pa.array(np.maximum(a, b), pa.int64()),
    })


# ---------------------------------------------------------------------------
# Cache / link plumbing
# ---------------------------------------------------------------------------

def _media_feature_rows(payloads, media_ids, decode_vals) -> pa.Table:
    """(media_id, payload) -> the MediaFeatures output row, with the
    value-array derivation supplied by the caller (FAKE1 or WAV parse);
    mean/std are the same float64 numpy reductions the engine runs, so
    identical value arrays imply bit-identical statistics."""
    import zlib

    out = {"media_id": [], "kind": [], "n_bytes": [],
           "mean_value": [], "std_value": [], "content_crc": []}
    for mid, payload in zip(media_ids, payloads):
        kind, vals = decode_vals(payload)
        out["media_id"].append(int(mid))
        out["kind"].append(kind)
        out["n_bytes"].append(len(payload))
        out["mean_value"].append(float(vals.mean()) if vals.size else 0.0)
        out["std_value"].append(float(vals.std()) if vals.size else 0.0)
        out["content_crc"].append(zlib.crc32(payload))
    return pa.table({
        "media_id": pa.array(out["media_id"], pa.int64()),
        "kind": pa.array(out["kind"], pa.string()),
        "n_bytes": pa.array(out["n_bytes"], pa.int64()),
        "mean_value": pa.array(out["mean_value"], pa.float64()),
        "std_value": pa.array(out["std_value"], pa.float64()),
        "content_crc": pa.array(out["content_crc"], pa.uint32()),
    })


def _media_n(sf_dir: str) -> int:
    """Mirrors the q_media_* fixture sizing (multimodal.py)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(60, int(6000 * sf))


def _expected_media_features(sf_dir: str) -> pa.Table:
    """Independent FAKE1 header parse + float64 feature reductions over
    the shared deterministic media fixture (input shared, computation
    independent — the decode arithmetic below is the frozen container
    spec, multimodal.py module doc)."""
    import struct

    from .pipelines.multimodal import gen_media_table

    table = gen_media_table(_media_n(sf_dir))

    def decode_vals(payload: bytes):
        kind = {"i": "image", "a": "audio", "v": "video"}[chr(payload[5])]
        struct.unpack("<iiiii", payload[6:26])  # header sanity
        body = np.frombuffer(payload[26:], dtype=np.uint8)
        if kind == "audio":
            return kind, (body.astype(np.float32) / 255.0
                          ).astype(np.float64)
        return kind, body.astype(np.float64)

    return _media_feature_rows(table.column("payload").to_pylist(),
                               table.column("media_id").to_pylist(),
                               decode_vals)


def _expected_media_wav(sf_dir: str) -> pa.Table:
    """Independent WAV parse via the STDLIB ``wave`` module (not
    functions/wav.py) + the same float64 feature reductions, over the
    audio rows of the real-codec media fixture."""
    import io
    import wave

    from .pipelines.multimodal import gen_media_table

    table = gen_media_table(_media_n(sf_dir), audio_codec="wav")
    keep = [i for i, k in enumerate(table.column("kind").to_pylist())
            if k == "audio"]
    table = table.take(keep)

    def decode_vals(payload: bytes):
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getsampwidth() == 2
            frames = w.readframes(w.getnframes())
        pcm = np.frombuffer(frames, dtype="<i2")
        return "audio", (pcm.astype(np.float32) / 32768.0
                         ).astype(np.float64)

    return _media_feature_rows(table.column("payload").to_pylist(),
                               table.column("media_id").to_pylist(),
                               decode_vals)


def _y4m_parse_loop(payload: bytes) -> np.ndarray:
    """Independent loop-style YUV4MPEG2 parse (not functions/y4m.py):
    header token scan, per-frame per-plane reads."""
    header, rest = payload.split(b"\n", 1)
    assert header.startswith(b"YUV4MPEG2")
    w = h = None
    for tok in header.split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            assert tok == b"C444"
    frames = []
    pos = 0
    plane = w * h
    while pos < len(rest):
        assert rest[pos:pos + 5] == b"FRAME"
        start = rest.index(b"\n", pos) + 1
        frame = np.empty((h, w, 3), np.uint8)
        for ch in range(3):
            raw = rest[start + ch * plane:start + (ch + 1) * plane]
            frame[:, :, ch] = np.frombuffer(raw, np.uint8).reshape(h, w)
        frames.append(frame)
        pos = start + 3 * plane
    return np.stack(frames)


def _expected_media_y4m(sf_dir: str) -> pa.Table:
    """Independent Y4M parse + float64 feature reductions over the video
    rows of the real-codec media fixture (mirrors _expected_media_wav:
    input shared, parsing and reductions independent)."""
    from .pipelines.multimodal import gen_media_table

    table = gen_media_table(_media_n(sf_dir), video_codec="y4m")
    keep = [i for i, k in enumerate(table.column("kind").to_pylist())
            if k == "video"]
    table = table.take(keep)

    def decode_vals(payload: bytes):
        return "video", _y4m_parse_loop(payload).astype(np.float64)

    return _media_feature_rows(table.column("payload").to_pylist(),
                               table.column("media_id").to_pylist(),
                               decode_vals)


def _expected_knn_ivf(sf_dir: str) -> pa.Table:
    """Single-process IVF top-k: the coarse centroid MODEL is imported
    as spec (``ivf_centroids`` is a bit-deterministic sample fit, like
    the hyperplane seeds); the SEARCH — full-corpus list assignment,
    probe-list candidate mask, exact cosine, one global sort per query —
    is recomputed here with none of the engine's per-batch partial
    top-k/merge machinery."""
    from .pipelines.similarity import (IVF_NPROBE, KNN_K, N_QUERIES,
                                       ivf_centroids)

    ids, x = _embeddings(sf_dir)
    cents = ivf_centroids(sf_dir)
    qsel = ids < N_QUERIES
    qids, qn = ids[qsel], x[qsel]
    order = np.argsort(qids)
    qids, qn = qids[order], qn[order]
    assign = (x @ cents.T).argmax(axis=1)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :IVF_NPROBE]
    out_q, out_r, out_n = [], [], []
    for qi, qid in enumerate(qids.tolist()):
        cand = np.flatnonzero(np.isin(assign, probe[qi]) & (ids != qid))
        if len(cand) == 0:
            continue
        sims = x[cand] @ qn[qi]
        top = cand[np.lexsort((ids[cand], -sims))[:KNN_K]]
        out_q.extend([qid] * len(top))
        out_r.extend(range(1, len(top) + 1))
        out_n.extend(ids[top].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64())})


# ---------------------------------------------------------------------------
# Independent image kernels (loop-style) for the resize / PNG fixtures.
#
# The engine's resize (functions/image_ops.py) is a vectorized separable
# two-pass lerp; the loop below evaluates the SAME IEEE-754 expression
# tree per output pixel (height lerp, then width lerp, each
# a*(1-f)+b*f in float64), so the uint8 results are bit-identical.
# The PNG pair reimplements RFC 2083 filtering per pixel; the zlib
# stream itself comes from the stdlib in both implementations (the
# compressed container bytes are DEFINED by zlib, like a config).
# ---------------------------------------------------------------------------

def _fake1_parse(payload: bytes):
    """Independent FAKE1 header parse (frozen container spec,
    multimodal.py module doc) -> (kind, w, h, c, sr, nf, body_u8)."""
    import struct

    assert payload[:5] == b"FAKE1"
    kind = {"i": "image", "a": "audio", "v": "video"}[chr(payload[5])]
    w, h, c, sr, nf = struct.unpack("<iiiii", payload[6:26])
    return kind, w, h, c, sr, nf, np.frombuffer(payload[26:], np.uint8)


def _fake1_image(w: int, h: int, c: int, pixels: np.ndarray) -> bytes:
    import struct

    return (b"FAKE1i" + struct.pack("<iiiii", w, h, c, 0, 1)
            + pixels.tobytes())


def _axis_coords(out_len: int, in_len: int, i: int):
    """Center-aligned sample position for output index ``i`` (same
    clamp/floor arithmetic as the engine's vectorized version)."""
    src = (i + 0.5) * (in_len / out_len) - 0.5
    src = min(max(src, 0.0), float(in_len - 1))
    lo = int(np.floor(src))
    return lo, min(lo + 1, in_len - 1), src - lo


def _bilinear_loop(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Per-pixel bilinear resample: (h, w, c) uint8 -> (out_h, out_w, c)
    uint8.  Height lerp first, then width, like the engine's separable
    passes — identical float64 op order, hence identical bits."""
    in_h, in_w, c = img.shape
    if (out_w, out_h) == (in_w, in_h):
        return img.copy()
    out = np.empty((out_h, out_w, c), dtype=np.uint8)
    f = img.astype(np.float64)
    for y in range(out_h):
        ly, hy, fy = ((y, y, 0.0) if in_h == out_h
                      else _axis_coords(out_h, in_h, y))
        for x in range(out_w):
            lx, hx, fx = ((x, x, 0.0) if in_w == out_w
                          else _axis_coords(out_w, in_w, x))
            for ch in range(c):
                top = f[ly, lx, ch] * (1.0 - fy) + f[hy, lx, ch] * fy
                bot = f[ly, hx, ch] * (1.0 - fy) + f[hy, hx, ch] * fy
                v = top * (1.0 - fx) + bot * fx
                out[y, x, ch] = np.uint8(min(max(np.round(v), 0.0), 255.0))
    return out


def _png_decode_loop(data: bytes) -> np.ndarray:
    """Independent RFC 2083 decode: stdlib zlib inflate + per-pixel
    unfiltering (all five filter types), 8-bit non-interlaced."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, hdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
    w, h, depth, color_type, _, _, interlace = hdr
    assert depth == 8 and interlace == 0
    c = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    recon = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        ftype, cur = row[0], row[1:]
        for x in range(stride):
            left = recon[y, x - c] if x >= c else 0
            up = recon[y - 1, x] if y >= 1 else 0
            ul = recon[y - 1, x - c] if (x >= c and y >= 1) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = (left if (pa_ <= pb_ and pa_ <= pc_)
                        else (up if pb_ <= pc_ else ul))
            recon[y, x] = (cur[x] + pred) % 256
    return recon.astype(np.uint8).reshape(h, w, c)


def _png_encode_loop(arr: np.ndarray, filter_type: int = 4,
                     compress_level: int = 6) -> bytes:
    """Independent RFC 2083 encode: per-pixel filtering, stdlib zlib
    deflate, hand-assembled chunks (byte-identical by spec to any
    conforming single-IDAT encoder at the same filter/level)."""
    import struct
    import zlib

    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[c]
    flat = arr.reshape(h, w * c).astype(np.int64)
    stride = w * c
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        for x in range(stride):
            raw = flat[y, x]
            left = flat[y, x - c] if x >= c else 0
            up = flat[y - 1, x] if y >= 1 else 0
            ul = flat[y - 1, x - c] if (x >= c and y >= 1) else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = left
            elif filter_type == 2:
                pred = up
            elif filter_type == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = (left if (pa_ <= pb_ and pa_ <= pc_)
                        else (up if pb_ <= pc_ else ul))
            lines.append((raw - pred) % 256)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines), compress_level))
            + chunk(b"IEND", b""))


def _video_frames(table: pa.Table, every: int = 4):
    """Yield (frame_media_id, w, h, c, frame_u8) for every sampled frame
    of the fixture's video rows (engine VideoFrameSample contract:
    every ``every``-th frame, id = src*1000 + frame index)."""
    for mid, payload in zip(table.column("media_id").to_pylist(),
                            table.column("payload").to_pylist()):
        kind, w, h, c, _sr, nf, body = _fake1_parse(payload)
        if kind != "video":
            continue
        frames = body.reshape(nf, h, w, c)
        for fi in range(0, nf, every):
            yield int(mid) * 1000 + fi, w, h, c, frames[fi]


def _expected_media_bundle(sf_dir: str) -> pa.Table:
    """Expected features after the video -> frame-sample -> npz-bundle
    write/read roundtrip (q_media_bundle_roundtrip, fixed n=30).  The
    npz container is content-lossless, so the expected row derives
    directly from the independently parsed+sampled frames; any
    corruption in the bundle sink/source would surface as a crc/stat
    mismatch at the driver."""
    from .pipelines.multimodal import gen_media_table

    payloads, mids = [], []
    for fid, w, h, c, frame in _video_frames(gen_media_table(30)):
        mids.append(fid)
        payloads.append(_fake1_image(w, h, c, frame))

    def decode_vals(payload: bytes):
        kind, w, h, c, _sr, _nf, body = _fake1_parse(payload)
        return kind, body.astype(np.float64)

    return _sorted_by_id(
        _media_feature_rows(payloads, mids, decode_vals))


def _expected_media_frames(sf_dir: str) -> pa.Table:
    """Expected features for the video -> frame-sample -> resize(32x32)
    -> features chain (q_media_frame_pipeline): independent per-pixel
    bilinear resample of each sampled frame."""
    from .pipelines.multimodal import gen_media_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.01
    table = gen_media_table(max(30, int(1500 * sf)))
    payloads, mids = [], []
    for fid, _w, _h, c, frame in _video_frames(table):
        out = _bilinear_loop(frame, 32, 32)
        mids.append(fid)
        payloads.append(_fake1_image(32, 32, c, out))

    def decode_vals(payload: bytes):
        kind, w, h, c, _sr, _nf, body = _fake1_parse(payload)
        return kind, body.astype(np.float64)

    return _sorted_by_id(
        _media_feature_rows(payloads, mids, decode_vals))


def _expected_media_png(sf_dir: str) -> pa.Table:
    """Expected features for the REAL-codec image chain
    (q_media_png_roundtrip): independent PNG decode -> per-pixel
    bilinear resize to 32x32 -> independent PNG re-encode (Paeth,
    level 6) -> stats over the resized pixels, crc over the re-encoded
    bytes."""
    from .pipelines.multimodal import gen_media_table

    table = gen_media_table(_media_n(sf_dir), image_codec="png")
    keep = [i for i, k in enumerate(table.column("kind").to_pylist())
            if k == "image"]
    table = table.take(keep)
    payloads, mids, pixel_arrays = [], [], []
    for mid, payload in zip(table.column("media_id").to_pylist(),
                            table.column("payload").to_pylist()):
        arr = _bilinear_loop(_png_decode_loop(payload), 32, 32)
        mids.append(int(mid))
        payloads.append(_png_encode_loop(arr, filter_type=4))
        pixel_arrays.append(arr)

    it = iter(pixel_arrays)

    def decode_vals(_payload: bytes):
        return "image", next(it).astype(np.float64)

    return _sorted_by_id(
        _media_feature_rows(payloads, mids, decode_vals))


def _sorted_by_id(table: pa.Table) -> pa.Table:
    return table.sort_by("media_id")


def _expected_semdedup(sf_dir: str) -> pa.Table:
    """Single-process SemDeDup: the centroid MODEL is imported as spec
    (same convention as ``_expected_knn_ivf``); assignment and the
    within-cluster first-wins scan are recomputed loop-style — per-pair
    ``np.dot``, no blocked matmul, none of the engine's shuffle/group
    machinery."""
    from .pipelines.similarity import SEMDEDUP_COSINE, semdedup_centroids

    ids, xn = _embeddings(sf_dir)
    cents = semdedup_centroids(sf_dir, len(ids))
    order = np.argsort(ids)
    ids, xn = ids[order], xn[order]
    assign = np.array([int(np.argmax([np.dot(v, c) for c in cents]))
                       for v in xn], dtype=np.int64)
    keep = np.ones(len(ids), dtype=np.int64)
    by_cluster: dict[int, list[int]] = {}
    for i, cl in enumerate(assign.tolist()):
        prior = by_cluster.setdefault(cl, [])
        for j in prior:  # ids sorted ascending -> prior = smaller ids
            if np.dot(xn[i], xn[j]) >= SEMDEDUP_COSINE:
                keep[i] = 0
                break
        prior.append(i)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster_id": pa.array(assign, pa.int64()),
                     "keep": pa.array(keep, pa.int64())})


def _expected_cluster_stats(sf_dir: str) -> pa.Table:
    """Single-process cluster stats: centroid model imported as spec;
    per-vector assignment and the sum/min/max folds recomputed with
    per-pair ``np.dot`` in vec_id order — none of the engine's
    per-batch partial-fold or groupby machinery."""
    from .pipelines.similarity import semdedup_centroids

    ids, xn = _embeddings(sf_dir)
    cents = semdedup_centroids(sf_dir, len(ids))
    order = np.argsort(ids)
    xn = xn[order]
    stats: dict[int, list] = {}
    for v in xn:
        sims = [np.dot(v, c) for c in cents]
        cl = int(np.argmax(sims))
        s = sims[cl]
        st = stats.setdefault(cl, [0, 0.0, np.inf, -np.inf])
        st[0] += 1
        st[1] += s
        st[2] = min(st[2], s)
        st[3] = max(st[3], s)
    cls = sorted(stats)
    return pa.table({
        "cluster_id": pa.array(cls, pa.int64()),
        "n": pa.array([stats[c][0] for c in cls], pa.int64()),
        "mean_sim": pa.array(
            np.array([stats[c][1] / stats[c][0] for c in cls],
                     dtype=np.float64).astype(np.float32)),
        "min_sim": pa.array(
            np.array([stats[c][2] for c in cls]).astype(np.float32)),
        "max_sim": pa.array(
            np.array([stats[c][3] for c in cls]).astype(np.float32)),
    })


def _expected_pca(sf_dir: str) -> pa.Table:
    """Single-process PCA: integer moment sums accumulated row-by-row
    (exact, so they match the engine's distributed sums bit-for-bit),
    ``pca_components`` imported as the shared spec, projections
    recomputed with per-row dots."""
    from .pipelines.similarity import PCA_SCALE, pca_components

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    d = m.shape[1]
    ss = np.zeros((d, d), np.int64)
    sq = np.zeros(d, np.int64)
    for row in m:
        q = np.rint(row * PCA_SCALE).astype(np.int64)
        ss += np.outer(q, q)
        sq += q
    mean, comps = pca_components(sq, ss, len(ids))
    pc1, pc2 = [], []
    for row in m:
        c = row - mean
        pc1.append(np.float32(np.dot(c, comps[:, 0])))
        pc2.append(np.float32(np.dot(c, comps[:, 1])))
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "pc1": pa.array(pc1, pa.float32()),
                     "pc2": pa.array(pc2, pa.float32())})


_BPE_MERGES_CACHE: dict = {}


def _expected_bpe_merges(sf_dir: str) -> pa.Table:
    """BPE merge-rule induction restated as the classic Counter-based
    Sennrich loop: dict of symbol TUPLES, a per-iteration pair Counter
    built with ``zip(seq, seq[1:])`` (overlapping, occurrence-weighted),
    ``min`` over ``(-count, pair)`` for the winner — no flattened
    arrays, no pandas groupby, no adjacency masks.  Shares only the
    SPEC constants (pre-tokenizer regex, merge budget, type cap, tie
    order) with ``pipelines/tokenizer.py``."""
    import re

    from .pipelines.text import BPE_PATTERN
    from .pipelines.tokenizer import BPE_MAX_WORD_TYPES, BPE_N_MERGES

    cached = _BPE_MERGES_CACHE.get(sf_dir)
    if cached is not None:  # encode/piece-count fixtures retrain otherwise
        return cached

    _, texts = _docs(sf_dir)
    pat = re.compile(BPE_PATTERN)
    wc: Counter = Counter()
    for s in texts:
        wc.update(pat.findall(s))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:BPE_MAX_WORD_TYPES]
    # Symbol sequences concatenate back to the original word, so
    # distinct word types stay distinct under merges — tuple keys are
    # collision-free.
    vocab: dict[tuple, int] = {tuple(w): c for w, c in top}

    ranks, lefts, rights, mergeds, pcounts = [], [], [], [], []
    for rank in range(1, BPE_N_MERGES + 1):
        pairs: Counter = Counter()
        for seq, c in vocab.items():
            for p in zip(seq, seq[1:]):
                pairs[p] += c
        if not pairs:
            break
        (left, right), best = min(pairs.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        mergeds.append(left + right)
        pcounts.append(int(best))
        new_vocab: dict[tuple, int] = {}
        for seq, c in vocab.items():
            if len(seq) > 1:
                out: list[str] = []
                i = 0
                while i < len(seq):
                    if (i + 1 < len(seq) and seq[i] == left
                            and seq[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = tuple(out)
            new_vocab[seq] = c
        vocab = new_vocab
    out = pa.table({
        "merge_rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "merged": pa.array(mergeds, pa.string()),
        "pair_count": pa.array(pcounts, pa.int64()),
    })
    _BPE_MERGES_CACHE[sf_dir] = out
    return out


def _expected_bpe_encode(sf_dir: str) -> pa.Table:
    """Per-doc BPE piece counts replayed single-process with NO
    memoization: every pre-token of every doc re-encoded from scratch
    by rank-order merge replay over the independently-trained rule
    list (``_expected_bpe_merges``)."""
    import re

    from .pipelines.text import BPE_PATTERN

    merges = _expected_bpe_merges(sf_dir)
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    ids, texts = _docs(sf_dir)
    pat = re.compile(BPE_PATTERN)

    def encode_len(word: str) -> int:
        seq = list(word)
        for left, right in rules:
            if len(seq) < 2:
                break
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    n_pre, n_pieces = [], []
    for s in texts:
        words = pat.findall(s)
        n_pre.append(len(words))
        n_pieces.append(sum(encode_len(w) for w in words))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_pretokens": pa.array(n_pre, pa.int64()),
        "n_pieces": pa.array(n_pieces, pa.int64()),
    })


def _expected_bpe_piece_counts(sf_dir: str) -> pa.Table:
    """Corpus piece frequencies replayed single-process with no
    memoization: every pre-token of every doc re-segmented from scratch
    by rank-order replay, one global Counter."""
    import re

    from .pipelines.text import BPE_PATTERN

    merges = _expected_bpe_merges(sf_dir)
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    _, texts = _docs(sf_dir)
    pat = re.compile(BPE_PATTERN)

    def encode(word: str) -> list[str]:
        seq = list(word)
        for left, right in rules:
            if len(seq) < 2:
                break
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    counts: Counter = Counter()
    for s in texts:
        for w in pat.findall(s):
            counts.update(encode(w))
    pieces = sorted(counts)
    return pa.table({
        "piece": pa.array(pieces, pa.string()),
        "count": pa.array([counts[p] for p in pieces], pa.int64()),
    })


def _builders() -> dict:
    from .pipelines.dedup import (JACCARD_THRESHOLD, SIMHASH_MAX_HAMMING,
                                  WINNOW_K, WINNOW_W)

    return {
        "rolling_fp": _expected_rolling_fp,
        "simhash": _expected_simhash,
        "simhash_pairs":
            lambda d: _expected_simhash_pairs(d, SIMHASH_MAX_HAMMING),
        "winnow": lambda d: _expected_winnow(d, WINNOW_K, WINNOW_W),
        "minhash_pairs":
            lambda d: _expected_minhash_pairs(d, JACCARD_THRESHOLD),
        "knn_lsh": _expected_knn_lsh,
        "knn_ivf": _expected_knn_ivf,
        "dup_pairs_lsh": _expected_dup_pairs_lsh,
        "semdedup": _expected_semdedup,
        "cluster_stats": _expected_cluster_stats,
        "pca": _expected_pca,
        "bpe_merges": _expected_bpe_merges,
        "bpe_encode": _expected_bpe_encode,
        "bpe_piece_counts": _expected_bpe_piece_counts,
        "media_features": _expected_media_features,
        "media_wav": _expected_media_wav,
        "media_bundle": _expected_media_bundle,
        "media_frames": _expected_media_frames,
        "media_png": _expected_media_png,
        "media_y4m": _expected_media_y4m,
    }


def ensure_aux_fixture(sf_dir: str, name: str) -> str | None:
    """Compute (or reuse) the expected table ``name`` for ``sf_dir``,
    atomically publish it under the tag dir, and point ``current`` at
    that dir.  Returns the fixture path (None when skipped via env)."""
    if os.environ.get("GRAFT_SKIP_AUX_FIXTURES"):
        return None
    sf_dir = os.path.abspath(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    fix_dir = os.path.join(AUX_ROOT, f"{tag}-v{AUX_VERSION}")
    os.makedirs(fix_dir, exist_ok=True)
    path = os.path.join(fix_dir, f"{name}.parquet")
    if not os.path.exists(path):
        table = _builders()[name](sf_dir)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    _relink(AUX_CURRENT, fix_dir)
    return path
