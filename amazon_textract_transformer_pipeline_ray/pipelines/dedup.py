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
# LSH bucket stages shuffle on a COARSE hash shard of the bucket key and
# segment exact buckets inside each shard task: Ray's groupby pays
# per-group overhead, so thousands of tiny buckets as groups would cost
# more than the bucket work itself.  Shard count ~2-4x the worker count
# balances skew against scheduling overhead (it partitions hash space,
# so it scales with the CLUSTER, not the data):
LSH_SHARDS = 64


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

    The EXACT all-pairs variant: documents are reduced distributed to
    compact token-id sets; the driver materializes only the REDUCED form
    (ids + set sizes + union vocabulary — the documented O(n * |vocab|)
    broadcast that makes exact all-pairs possible at all), and the O(n^2)
    blockwise matmul itself is DISTRIBUTED: each ``map_batches`` batch
    multiplies its rows against the broadcast incidence matrix.  Loose
    f32 prefilter, exact f64 division on survivors — counts are exact
    integers in f32 (< 2^24), so the result is bit-identical to the SQL
    oracle's int/int double division.  At 10^9-doc scale you switch to
    the LSH variant (no broadcast matrix, no quadratic).

    Output: (doc_id_a < doc_id_b, jaccard)."""
    # materialize(): the reduced form is computed ONCE and its blocks
    # serve both the driver's incidence build and the blockwise stage —
    # this is the small compacted table, not the input corpus:
    reduced_ds = doc_token_sets(sf_dir).materialize()
    reduced = reduced_ds.to_pandas()
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
    row_of_doc = {int(d): i for i, d in enumerate(doc_ids)}
    ref = broadcast((doc_ids, m, m.sum(axis=1), row_of_doc))

    class BlockPairs:
        def __init__(self):
            self.ids, self.m, self.sizes32, self.row_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = np.array([self.row_of[int(d)]
                             for d in batch.column("doc_id").to_pylist()],
                            dtype=np.int64)
            inter32 = self.m[rows] @ self.m.T  # (b, n)
            union32 = (self.sizes32[rows, None] + self.sizes32[None, :]
                       - inter32)
            with np.errstate(divide="ignore", invalid="ignore"):
                jac32 = np.where(union32 > 0, inter32 / union32, 0.0)
            ca, cb = np.nonzero(jac32 >= threshold - 1e-3)
            ga = rows[ca]
            keep_ut = ga < cb  # upper triangle only (global row order)
            ca, cb = ca[keep_ut], cb[keep_ut]
            ga = ga[keep_ut]
            jac_exact = (inter32[ca, cb].astype(np.float64)
                         / union32[ca, cb].astype(np.float64))
            final = jac_exact >= threshold
            ga, cb, jj = ga[final], cb[final], jac_exact[final]
            return pa.table({
                "doc_id_a": pa.array(np.minimum(self.ids[ga], self.ids[cb]),
                                     pa.int64()),
                "doc_id_b": pa.array(np.maximum(self.ids[ga], self.ids[cb]),
                                     pa.int64()),
                "jaccard": pa.array(jj, pa.float64()),
            })

    out = (reduced_ds.map_batches(BlockPairs, batch_format="pyarrow",
                                  batch_size=512, concurrency=(1, 8))
           .to_pandas())
    if len(out) == 0:
        return pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
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
    """(MINHASH_PERMS,) uint64 signature; empty set -> all MOD.

    NOTE: the multiply wraps mod 2^64 BEFORE the ``% (2^61-1)``, so this
    is a deterministic hash mix rather than a true member of the
    universal-hash family — the textbook 1-(1-j^r)^b recall model applies
    only approximately.  Harmless here: candidates are exact-Jaccard
    verified, and the measured recall gate lives in tests."""
    if len(token_ids) == 0:
        return np.full(MINHASH_PERMS, _MOD, dtype=np.uint64)
    # (n_tokens, n_perms) hashing, min over tokens:
    h = (token_ids[:, None] * _MH_A[None, :] + _MH_B[None, :]) % _MOD
    return h.min(axis=0)


class MinHasher:
    """Actor-pool stage: doc -> LSH band rows
    (band_id, band_hash, doc_id, band_hashes[16], token_ids).

    Emits LSH_BANDS rows per doc (flat-map shape).  Every row carries the
    doc's FULL vector of band hashes so the bucket stage can emit each
    candidate pair exactly once — from its first colliding band — i.e.
    candidate dedup happens distributed, with no extra shuffle and no
    driver-side drop_duplicates over a quadratic row set.  Each row also
    carries the doc's compact distinct-token-id set, so exact-Jaccard
    verification happens IN the bucket stage with zero extra shuffles and
    zero driver/broadcast state (the set is shipped L times through the
    one band shuffle — the price of a join-free single-pass design)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        rows = MINHASH_PERMS // LSH_BANDS
        band_ids, band_hashes, out_docs, all_hashes, tok_sets = \
            [], [], [], [], []
        for did, text in zip(doc_ids, batch.column("text").to_pylist()):
            toks = _token_hashes(text)
            sig = minhash_signature(toks)
            bh = [zlib.crc32(sig[b * rows:(b + 1) * rows].tobytes())
                  for b in range(LSH_BANDS)]
            toklist = toks.tolist()
            for b in range(LSH_BANDS):
                band_ids.append(b)
                band_hashes.append(bh[b])
                out_docs.append(did)
                all_hashes.append(bh)
                tok_sets.append(toklist)
        shard = ((np.asarray(band_hashes, dtype=np.uint64)
                  * np.uint64(0x9E3779B1)
                  + np.asarray(band_ids, dtype=np.uint64))
                 % np.uint64(LSH_SHARDS)).astype(np.int32)
        return pa.table({
            "shard": pa.array(shard),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint32()),
            "doc_id": pa.array(out_docs, pa.int64()),
            "band_hashes": pa.array(all_hashes, pa.list_(pa.uint32())),
            "token_ids": pa.array(tok_sets, pa.list_(pa.uint64())),
        })


def q_minhash_lsh_pairs(sf_dir: str,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard.

    Candidate generation AND verification run in ONE distributed stage.
    The shuffle key is a coarse hash SHARD of (band, hash) — see
    ``LSH_SHARDS`` — and each shard task segments its rows into exact
    buckets locally.  Inside a bucket, a pair is emitted only when this
    band is the pair's FIRST colliding band (vectorized over the
    bucket's band-hash matrix), so the global candidate set is exactly
    the distinct colliding pairs; each surviving pair is then
    exact-Jaccard verified in-bucket against a bucket-LOCAL incidence
    matrix built from the token-id sets the band rows carry — exact
    integer intersections, f64 division, identical to the SQL oracle's
    arithmetic.  No broadcast corpus state, no driver materialization:
    one shuffle total, with token sets shipped L times through it.
    Probabilistic recall (P[miss] = (1 - t^8)^8 per pair at Jaccard t;
    ~1% at t=0.9, vanishing above) — rows-only driver check; recall vs
    the exact variant is asserted in tests."""
    bands = (read_table(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(MinHasher, batch_format="pyarrow",
                          batch_size=4096, concurrency=(1, 4)))

    def bucket_pairs(band: int, ids: np.ndarray, bh: np.ndarray,
                     sets: list[np.ndarray]) -> pd.DataFrame | None:
        """Pairs for ONE exact (band, hash) bucket (deduped doc rows)."""
        # First colliding band per pair (vectorized over the bucket):
        ia, ib = np.triu_indices(len(ids), k=1)
        eq = bh[ia] == bh[ib]  # (n_pairs, LSH_BANDS)
        first = eq.argmax(axis=1)  # first True (a colliding band exists:
        # this bucket's band collides by construction)
        mine = first == band
        ia, ib = ia[mine], ib[mine]
        if len(ia) == 0:
            return None
        # Exact verification on the bucket-local vocabulary.  Counts are
        # exact integers in f32 (< 2^24) so the f64 division is
        # bit-identical to the SQL oracle's int/int double division.
        vocab = np.unique(np.concatenate([s for s in sets if len(s)] or
                                         [np.zeros(0, np.uint64)]))
        inc = np.zeros((len(sets), max(len(vocab), 1)), dtype=np.float32)
        for i, s in enumerate(sets):
            if len(s):
                inc[i, np.searchsorted(vocab, s)] = 1.0
        sizes = inc.sum(axis=1).astype(np.float64)
        inter = (inc[ia] * inc[ib]).sum(axis=1).astype(np.float64)
        union = sizes[ia] + sizes[ib] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / union, 0.0)
        keep = jac >= threshold
        if not keep.any():
            return None
        return pd.DataFrame({"doc_id_a": ids[ia[keep]].astype(np.int64),
                             "doc_id_b": ids[ib[keep]].astype(np.int64),
                             "jaccard": jac[keep]})

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                              "doc_id_b": pd.Series([], dtype=np.int64),
                              "jaccard": pd.Series([], dtype=np.float64)})
        if len(g) < 2:
            return empty
        band_col = g["band_id"].to_numpy()
        hash_col = g["band_hash"].to_numpy()
        doc_col = g["doc_id"].to_numpy()
        # segment by exact bucket, doc-sorted within (stable dedup order):
        order = np.lexsort((doc_col, hash_col, band_col))
        band_col, hash_col, doc_col = (band_col[order], hash_col[order],
                                       doc_col[order])
        seg = np.flatnonzero(np.concatenate(
            [[True],
             (band_col[1:] != band_col[:-1]) | (hash_col[1:] != hash_col[:-1])]))
        bounds = np.concatenate([seg, [len(doc_col)]])
        bh_col = g["band_hashes"].to_numpy()[order]
        tok_col = g["token_ids"].to_numpy()[order]
        frames = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            ids = doc_col[s:e]
            keep_first = np.concatenate([[True], ids[1:] != ids[:-1]])
            sel = np.flatnonzero(keep_first) + s
            if len(sel) < 2:
                continue
            ids = doc_col[sel]
            bh = np.stack(bh_col[sel])  # (B, LSH_BANDS)
            sets = [np.asarray(t, dtype=np.uint64) for t in tok_col[sel]]
            f = bucket_pairs(int(band_col[s]), ids, bh, sets)
            if f is not None:
                frames.append(f)
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    verified = (bands.groupby("shard")
                .map_groups(shard_pairs, batch_format="pandas")
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
    blocking — exact recall for max_hamming <= 3 by pigeonhole (a pair
    differing in <= 3 of 64 bits must agree on >= 1 of the 4 bands).

    Fully distributed: a ``map_batches`` flat-map emits 4 keyed band rows
    per doc (each row carries the full 64-bit simhash, from which every
    band key is derivable); the shuffle key is a COARSE hash shard of
    (band, key16) — ``groupby`` over ~tens of shards, not tens of
    thousands of tiny buckets (Ray pays per-group overhead, so grouping
    at bucket granularity would dominate wall time) — and each shard
    task segments its rows by exact bucket locally and finds pairs per
    bucket with vectorized XOR + unpackbits popcount.  A pair is emitted
    exactly once — from its FIRST agreeing band — so no driver-side
    dedup set is needed.  Only the (tiny) verified pair list reaches the
    driver."""
    sh = q_simhash(sf_dir)

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        did = batch.column("doc_id").to_numpy()
        n = len(h)
        band_ix = np.tile(np.arange(4, dtype=np.uint64), n)
        hh = np.repeat(h, 4)
        keys = ((hh >> (band_ix * np.uint64(16))) &
                np.uint64(0xFFFF)).astype(np.uint32)
        shard = ((keys.astype(np.uint64) * np.uint64(0x9E3779B1) + band_ix)
                 % np.uint64(LSH_SHARDS)).astype(np.int32)
        return pa.table({
            "shard": pa.array(shard),
            "band": pa.array(band_ix.astype(np.int32)),
            "key16": pa.array(keys),
            "doc_id": pa.array(np.repeat(did, 4), pa.int64()),
            "simhash": pa.array(hh),
        })

    rows = sh.map_batches(band_rows, batch_format="pyarrow", batch_size=8192)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                              "doc_id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        band = g["band"].to_numpy()
        key = g["key16"].to_numpy()
        h = g["simhash"].to_numpy().astype(np.uint64)
        d = g["doc_id"].to_numpy()
        order = np.lexsort((key, band))
        band, key, h, d = band[order], key[order], h[order], d[order]
        seg = np.flatnonzero(np.concatenate(
            [[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])]))
        bounds = np.concatenate([seg, [len(d)]])
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            bb = int(band[s])
            hh, dd = h[s:e], d[s:e]
            ia, ib = np.triu_indices(e - s, k=1)
            x = hh[ia] ^ hh[ib]
            pop = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1)
            near = pop <= max_hamming
            # first agreeing band per pair -> emit-once across buckets:
            agree = np.stack(
                [((x >> np.uint64(t * 16)) & np.uint64(0xFFFF)) == 0
                 for t in range(4)], axis=1)
            keep = near & (agree.argmax(axis=1) == bb)
            if keep.any():
                out_a.append(dd[ia[keep]])
                out_b.append(dd[ib[keep]])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame({
            "doc_id_a": np.minimum(a, b).astype(np.int64),
            "doc_id_b": np.maximum(a, b).astype(np.int64),
        })

    out = (rows.groupby("shard")
           .map_groups(shard_pairs, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                             "doc_id_b": pd.Series([], dtype=np.int64)})
    return (out.astype({"doc_id_a": np.int64, "doc_id_b": np.int64})
            .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
