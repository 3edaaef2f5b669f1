"""Deduplication suite over the ``documents`` table: exact (see text.py),
exact all-pairs n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes
-----------
* ``q_jaccard_dup_pairs`` is the EXACT oracle-checkable variant: the
  distributed stage reduces every document to a compact token-id set;
  the small reduced form is crossed via one dense incidence matmul.
  This is exhaustive (matches the SQL oracle bit-for-bit) and right for
  corpora whose *reduced* form fits a worker; at 10^9-doc scale you switch
  to the LSH variant below (candidate generation without the quadratic).
* ``q_minhash_lsh_pairs``: shingle -> 64 minhashes -> 8 bands x 8 rows ->
  band-bucket groupby -> candidate pairs (each emitted once, from its
  first colliding band) -> vectorized exact-Jaccard verification.
  Probabilistic recall (no SQL oracle; rows-only check).  NOTE: the
  synthetic corpus is pathologically self-similar (~8% of ALL pairs are
  true dups at t=0.9), so pair *enumeration* is inherently quadratic
  here; on a realistic corpus (dup rate <<1%) buckets are tiny and this
  path is the scale winner.  For corpora like this one, cluster-level
  dedup (keep one doc per connected component) is the right operation —
  see ``q_doc_dedup_exact`` for the exact-hash version.
* ``q_simhash_pairs``: 64-bit simhash; pairs at Hamming distance <= 3
  found by 4x16-bit band blocking — pigeonhole gives EXACT recall for
  d <= 3 (a pair differing in <= 3 bits must agree on >= 1 of 4 bands).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import broadcast, read_table
from .text import _WS_RE

JACCARD_THRESHOLD = 0.9  # near-duplicate bar (the synthetic docs share a
# tiny vocabulary, so lower bars match most pairs)
MINHASH_PERMS = 64
LSH_BANDS = 8  # x 8 rows/band: P[candidate] = 1-(1-j^8)^8 — still ~0.99
# recall at j=0.9, but ambient (j~0.6) pairs collide ~10x less than 16x4
# banding, which shrinks bucket sizes and the quadratic enumeration cost
# on duplicate-heavy corpora
SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS_RE.split(t) if t else []


def _token_hashes(text: str) -> np.ndarray:
    """Distinct token ids (crc32) per doc, sorted."""
    toks = set(_tokens(text))
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.sort(np.array(
        [zlib.crc32(w.encode("utf-8")) for w in toks], dtype=np.uint64))


def doc_token_sets(sf_dir: str) -> rd.Dataset:
    """Distributed reduction: document -> compact distinct-token-id set."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def reduce_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sets = [_token_hashes(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "token_ids": pa.array([s.tolist() for s in sets],
                                  pa.list_(pa.uint64())),
        })

    return ds.map_batches(reduce_batch, batch_format="pyarrow", batch_size=8192)


def q_jaccard_dup_pairs(sf_dir: str,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """All document pairs with token-set Jaccard >= threshold (exact).

    Output: (doc_id_a < doc_id_b, jaccard rounded to 6 dp)."""
    reduced = doc_token_sets(sf_dir).to_pandas()
    doc_ids = reduced["doc_id"].to_numpy()
    sets = [np.asarray(s, dtype=np.uint64) for s in reduced["token_ids"]]
    n = len(sets)

    # Dense incidence over the (small) union vocabulary:
    vocab = np.unique(np.concatenate([s for s in sets if len(s)] or
                                     [np.zeros(0, np.uint64)]))
    m = np.zeros((n, len(vocab)), dtype=np.float32)
    for i, s in enumerate(sets):
        if len(s):
            m[i, np.searchsorted(vocab, s)] = 1.0
    sizes32 = m.sum(axis=1)

    # Blockwise: small f32 temporaries (cache-friendly), loose f32
    # prefilter, exact f64 division only on the surviving candidates —
    # counts are exact integers in f32 (< 2^24), so the refined jaccard is
    # bit-identical to the SQL oracle's int/int double division.
    rows_a, rows_b, jacs = [], [], []
    block = 512
    for s0 in range(0, n, block):
        s1 = min(s0 + block, n)
        inter32 = m[s0:s1] @ m.T  # (b, n)
        union32 = sizes32[s0:s1, None] + sizes32[None, :] - inter32
        with np.errstate(divide="ignore", invalid="ignore"):
            jac32 = np.where(union32 > 0, inter32 / union32, 0.0)
        ca, cb = np.nonzero(jac32 >= threshold - 1e-3)
        ga = ca + s0
        keep_ut = ga < cb  # upper triangle only
        ga, cb = ga[keep_ut], cb[keep_ut]
        if len(ga) == 0:
            continue
        inter_exact = inter32[ga - s0, cb].astype(np.float64)
        union_exact = union32[ga - s0, cb].astype(np.float64)
        jac_exact = inter_exact / union_exact
        final = jac_exact >= threshold
        rows_a.append(ga[final])
        rows_b.append(cb[final])
        jacs.append(jac_exact[final])

    if rows_a:
        ga = np.concatenate(rows_a)
        gb = np.concatenate(rows_b)
        jj = np.concatenate(jacs)
        out = pd.DataFrame({
            "doc_id_a": np.minimum(doc_ids[ga], doc_ids[gb]),
            "doc_id_b": np.maximum(doc_ids[ga], doc_ids[gb]),
            "jaccard": jj,
        })
    else:
        out = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                            "doc_id_b": pd.Series([], dtype=np.int64),
                            "jaccard": pd.Series([], dtype=np.float64)})
    return out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Deterministic 64 hash-permutation parameters (odd multipliers):
_RNG = np.random.default_rng(1337)
_MH_A = (_RNG.integers(1, 2**31, MINHASH_PERMS, dtype=np.uint64) * 2 + 1)
_MH_B = _RNG.integers(0, 2**31, MINHASH_PERMS, dtype=np.uint64)
_MOD = np.uint64(2**61 - 1)


def minhash_signature(token_ids: np.ndarray) -> np.ndarray:
    """(MINHASH_PERMS,) uint64 signature; empty set -> all MOD."""
    if len(token_ids) == 0:
        return np.full(MINHASH_PERMS, _MOD, dtype=np.uint64)
    # (n_tokens, n_perms) universal hashing, min over tokens:
    h = (token_ids[:, None] * _MH_A[None, :] + _MH_B[None, :]) % _MOD
    return h.min(axis=0)


class MinHasher:
    """Actor-pool stage: doc -> LSH band rows
    (band_id, band_hash, doc_id, band_hashes[16]).

    Emits LSH_BANDS rows per doc (flat-map shape).  Every row carries the
    doc's FULL vector of band hashes so the bucket stage can emit each
    candidate pair exactly once — from its first colliding band — i.e.
    candidate dedup happens distributed, with no extra shuffle and no
    driver-side drop_duplicates over a quadratic row set."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        rows = MINHASH_PERMS // LSH_BANDS
        band_ids, band_hashes, out_docs, all_hashes = [], [], [], []
        for did, text in zip(doc_ids, batch.column("text").to_pylist()):
            sig = minhash_signature(_token_hashes(text))
            bh = [zlib.crc32(sig[b * rows:(b + 1) * rows].tobytes())
                  for b in range(LSH_BANDS)]
            for b in range(LSH_BANDS):
                band_ids.append(b)
                band_hashes.append(bh[b])
                out_docs.append(did)
                all_hashes.append(bh)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint32()),
            "doc_id": pa.array(out_docs, pa.int64()),
            "band_hashes": pa.array(all_hashes, pa.list_(pa.uint32())),
        })


def q_minhash_lsh_pairs(sf_dir: str,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard.

    Candidate generation: groupby (band, hash) buckets; inside a bucket,
    a pair is emitted only when this band is the pair's FIRST colliding
    band (vectorized over the bucket's band-hash matrix), so the global
    candidate set is exactly the distinct colliding pairs.  Verification:
    a dense doc x vocab incidence matrix is broadcast once; each batch of
    pairs verifies with one vectorized gather-multiply-sum — exact
    integer intersections, f64 division, identical to the SQL oracle's
    arithmetic.  Probabilistic recall (P[miss] = (1 - t^8)^8 per pair at
    Jaccard t; ~1% at t=0.9, vanishing above) — rows-only driver check; recall vs the
    exact variant is asserted in tests."""
    bands = (read_table(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(MinHasher, batch_format="pyarrow",
                          batch_size=4096, concurrency=(1, 4)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                              "doc_id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        band = int(g["band_id"].iloc[0])
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        ids = g["doc_id"].to_numpy()[order]
        keep_first = np.concatenate([[True], ids[1:] != ids[:-1]])
        order = order[keep_first]
        ids = ids[keep_first]
        if len(ids) < 2:
            return empty
        bh = np.stack(g["band_hashes"].to_numpy()[order])  # (B, LSH_BANDS)
        # First colliding band per pair (vectorized over the bucket):
        ia, ib = np.triu_indices(len(ids), k=1)
        eq = bh[ia] == bh[ib]  # (n_pairs, LSH_BANDS)
        first = eq.argmax(axis=1)  # first True (a colliding band exists:
        # this bucket's band collides by construction)
        mine = first == band
        return pd.DataFrame({"doc_id_a": ids[ia[mine]],
                             "doc_id_b": ids[ib[mine]]})

    candidates = (bands.groupby(["band_id", "band_hash"])
                  .map_groups(bucket_pairs, batch_format="pandas"))

    # Dense incidence over the union vocabulary, broadcast once:
    reduced = doc_token_sets(sf_dir).to_pandas()
    doc_ids_all = reduced["doc_id"].to_numpy()
    sets = [np.asarray(s, dtype=np.uint64) for s in reduced["token_ids"]]
    vocab = np.unique(np.concatenate([s for s in sets if len(s)] or
                                     [np.zeros(0, np.uint64)]))
    inc = np.zeros((len(sets), max(len(vocab), 1)), dtype=np.float32)
    for i, s in enumerate(sets):
        if len(s):
            inc[i, np.searchsorted(vocab, s)] = 1.0
    row_of = {int(d): i for i, d in enumerate(doc_ids_all)}
    sizes = inc.sum(axis=1).astype(np.float64)
    ref = broadcast((row_of, inc, sizes))

    class Verify:
        def __init__(self):
            self.row_of, self.inc, self.sizes = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                out = batch.copy()
                out["jaccard"] = pd.Series([], dtype=np.float64)
                return out
            ra = np.array([self.row_of[int(a)] for a in batch["doc_id_a"]])
            rb = np.array([self.row_of[int(b)] for b in batch["doc_id_b"]])
            inter = (self.inc[ra] * self.inc[rb]).sum(axis=1).astype(np.float64)
            union = self.sizes[ra] + self.sizes[rb] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            out = batch.copy()
            out["jaccard"] = jac
            return out[out["jaccard"] >= threshold]

    verified = (candidates
                .map_batches(Verify, batch_format="pandas", batch_size=65536,
                             concurrency=(1, 4))
                .to_pandas())
    if len(verified) == 0:
        return pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                             "doc_id_b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    return (verified.astype({"doc_id_a": np.int64, "doc_id_b": np.int64})
            .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

WINNOW_K = 8   # k-gram length (chars)
WINNOW_W = 16  # winnowing window (t = W + K - 1 guarantee threshold)


def winnow_fingerprints(text: str) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every K-char-gram, then keep the minimum hash of each
    sliding window of W consecutive k-gram hashes (rightmost minimum on
    ties).  Guarantees every substring match of length >= W + K - 1 shares
    a fingerprint.  Returns the sorted distinct selected hashes."""
    data = text.encode("utf-8")
    n = len(data) - WINNOW_K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # Vectorized polynomial k-gram hashes (exact, no mod: 8 bytes * 2^56
    # max fits u64 with base 31):
    base = np.uint64(31)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(WINNOW_K):
        h = h * base + arr[j:j + n]
    if n <= WINNOW_W:
        return np.unique(h[[int(np.flatnonzero(h == h.min())[-1])]])
    # Sliding-window minimum via stride tricks (W is small):
    win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
    mins = win.min(axis=1)
    # rightmost position of the min within each window:
    rev_argmin = WINNOW_W - 1 - np.argmin(win[:, ::-1], axis=1)
    sel = np.unique(np.arange(len(win)) + rev_argmin)
    return np.unique(h[sel][np.isin(h[sel], mins)])


class Winnower:
    """Actor-pool stage: doc -> winnowing fingerprint set (list<uint64>)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [winnow_fingerprints(t).tolist()
               for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprints": pa.array(fps, pa.list_(pa.uint64())),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int32()),
        })


def q_winnow_fingerprints(sf_dir: str) -> rd.Dataset:
    """Per-document winnowing fingerprint sets (rows-only; the
    match-guarantee property is asserted in tests)."""
    return (read_table(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(Winnower, batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 4)))


def simhash64(text: str) -> int:
    """64-bit SimHash over crc32-seeded token hashes weighted by count."""
    toks = _tokens(text)
    if not toks:
        return 0
    vals, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    h32 = np.array([zlib.crc32(w.encode("utf-8")) for w in vals], dtype=np.uint64)
    # widen to 64 bits deterministically (splitmix-style):
    h = h32 * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(np.array(hashes, dtype=np.uint64)),
        })


def q_simhash(sf_dir: str) -> rd.Dataset:
    """Per-document 64-bit SimHash fingerprint (rows-only check)."""
    return (read_table(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(SimHasher, batch_format="pyarrow", batch_size=8192,
                         concurrency=(1, 4)))


def q_simhash_pairs(sf_dir: str,
                    max_hamming: int = SIMHASH_MAX_HAMMING) -> pd.DataFrame:
    """SimHash near-dup pairs (Hamming <= max_hamming) by 4x16-bit band
    blocking — exact recall for max_hamming <= 3 by pigeonhole."""
    sh = q_simhash(sf_dir).to_pandas()
    hashes = sh["simhash"].to_numpy().astype(np.uint64)
    doc_ids = sh["doc_id"].to_numpy()
    pairs: set[tuple[int, int]] = set()
    for band in range(4):
        key = (hashes >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        bounds = np.concatenate([starts, [len(ks)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            members = order[s:e]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = members[i], members[j]
                    d = int(bin(int(hashes[a]) ^ int(hashes[b])).count("1"))
                    if d <= max_hamming:
                        pairs.add((int(min(doc_ids[a], doc_ids[b])),
                                   int(max(doc_ids[a], doc_ids[b]))))
    out = pd.DataFrame(sorted(pairs), columns=["doc_id_a", "doc_id_b"])
    return out.astype({"doc_id_a": np.int64, "doc_id_b": np.int64})
