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

import os

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
# more than the bucket work itself.  The shard count is sized per query by
# ``sources.scale.shuffle_width`` from BOTH the cluster CPU count (keep
# workers busy) and the row count (bound the rows — and memory — one shard
# task materializes; a fixed count would grow per-task memory linearly
# with the corpus).
LSH_ROWS_PER_SHARD = 32768

# Driver-memory budget for q_jaccard_dup_pairs' dense n x |vocab| f32
# incidence matrix (the documented weak-by-design exact anchor).  A
# misuse at big scale must fail LOUDLY with a pointer to the LSH twin,
# not OOM the driver.  2 GiB ≈ ~23k docs x ~23k vocab.
JACCARD_DENSE_BUDGET_BYTES = int(
    os.environ.get("GRAFT_JACCARD_DENSE_BUDGET", 2 << 30))

# Work budget for the same query's O(n^2) blockwise crossing (n^2 cells,
# each a |vocab|-deep dot product).  The dense-bytes budget alone does
# not bound this: a corpus of many docs over a SMALL shared vocabulary
# fits the 2 GiB matrix yet makes the crossing quadratic-dominant (the
# 10x sf1 scale proof measured 110x the sf0.1 wall before this guard).
# 4e8 cells ~= 20k docs — the same ceiling the dense budget implies.
JACCARD_PAIR_BUDGET_CELLS = int(
    os.environ.get("GRAFT_JACCARD_PAIR_BUDGET", 4 * 10**8))


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS_RE.split(t) if t else []


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized 64-bit token ids (pandas' C siphash kernel — one call
    per array, no per-token Python loop)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    import pandas as pd

    return pd.util.hash_array(
        np.asarray(tokens, dtype=object)).astype(np.uint64)


def _token_hashes(text: str) -> np.ndarray:
    """Distinct token ids per doc, sorted (scalar spec; the batch path is
    ``_batch_token_runs``, asserted equal in tests)."""
    return np.unique(_hash_tokens(_tokens(text)))


def _batch_token_runs(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch tokenization: ONE vectorized hash over every token of
    every doc, then per-doc sorted-distinct segmentation.

    Returns (hashes, run_counts, offsets): ``hashes[offsets[i]:offsets[i+1]]``
    is doc i's sorted distinct token ids and ``run_counts`` the matching
    occurrence counts."""
    tok_lists = [_tokens(t) for t in texts]
    counts = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    total = int(counts.sum())
    n = len(texts)
    if total == 0:
        return (np.zeros(0, np.uint64), np.zeros(0, np.int64),
                np.zeros(n + 1, np.int64))
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    import pandas as pd

    h = pd.util.hash_array(flat).astype(np.uint64)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((h, doc))
    hs, ds = h[order], doc[order]
    new = np.concatenate([[True], (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])])
    starts = np.flatnonzero(new)
    run_counts = np.diff(np.concatenate([starts, [total]]))
    hs_d, ds_d = hs[new], ds[new]
    offsets = np.concatenate(
        [[0], np.cumsum(np.bincount(ds_d, minlength=n))]).astype(np.int64)
    return hs_d, run_counts.astype(np.int64), offsets


def doc_token_sets(sf_dir: str) -> rd.Dataset:
    """Distributed reduction: document -> compact distinct-token-id set."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def reduce_batch(batch: pa.Table) -> pa.Table:
        hs, _, offs = _batch_token_runs(batch.column("text").to_pylist())
        token_ids = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(hs, pa.uint64()))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "token_ids": token_ids,
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
    reduced_tbl = reduced_ds.to_arrow_refs()
    import pyarrow.compute as pc

    tbl = pa.concat_tables(ray.get(reduced_tbl))
    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    tok_col = tbl.column("token_ids").combine_chunks()
    lens = pc.list_value_length(tok_col).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(tok_col).to_numpy(zero_copy_only=False)
    n = len(doc_ids)

    # Dense incidence over the (small) union vocabulary — ONE vectorized
    # scatter (np.repeat rows x searchsorted cols), no per-doc loop:
    vocab = np.unique(flat)
    cells = int(n) * int(n)
    if cells > JACCARD_PAIR_BUDGET_CELLS:
        raise ValueError(
            f"q_jaccard_dup_pairs: exact all-pairs crossing needs {cells:,} "
            f"cells ({n:,} docs squared) > budget "
            f"{JACCARD_PAIR_BUDGET_CELLS:,}. This query is the documented "
            "EXACT all-pairs anchor for oracle checks at small scale; at "
            "this size use q_minhash_lsh_pairs (or "
            "q_jaccard_dedup_clusters) — the scale path with no broadcast "
            "matrix and no quadratic.")
    budget = JACCARD_DENSE_BUDGET_BYTES
    need = int(n) * max(len(vocab), 1) * 4
    if need > budget:
        raise ValueError(
            f"q_jaccard_dup_pairs: dense incidence matrix needs {need:,} "
            f"bytes ({n:,} docs x {len(vocab):,} vocab x f32) > budget "
            f"{budget:,}. This query is the documented EXACT all-pairs "
            "anchor for oracle checks at small scale; at this size use "
            "q_minhash_lsh_pairs (or q_jaccard_dedup_clusters) — the "
            "scale path with no broadcast matrix and no quadratic.")
    m = np.zeros((n, len(vocab)), dtype=np.float32)
    m[np.repeat(np.arange(n, dtype=np.int64), lens),
      np.searchsorted(vocab, flat)] = 1.0
    # vectorized doc->row lookup: sorted ids + argsort permutation
    # (searchsorted inside the stage, no per-row dict probes)
    sort_ix = np.argsort(doc_ids).astype(np.int64)
    ref = broadcast((doc_ids, m, m.sum(axis=1),
                     doc_ids[sort_ix].astype(np.int64), sort_ix))

    class BlockPairs:
        def __init__(self):
            (self.ids, self.m, self.sizes32,
             self.sorted_ids, self.sort_ix) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy().astype(np.int64)
            rows = self.sort_ix[np.searchsorted(self.sorted_ids, d)]
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

    Scalar spec — the stage uses the batch form ``_minhash_batch``
    (asserted equal in tests).  NOTE: the multiply wraps mod 2^64 BEFORE
    the ``% (2^61-1)``, so this is a deterministic hash mix rather than a
    true member of the universal-hash family — the textbook 1-(1-j^r)^b
    recall model applies only approximately.  Harmless here: candidates
    are exact-Jaccard verified, and the measured recall gate lives in
    tests."""
    if len(token_ids) == 0:
        return np.full(MINHASH_PERMS, _MOD, dtype=np.uint64)
    # (n_tokens, n_perms) hashing, min over tokens:
    h = (token_ids[:, None] * _MH_A[None, :] + _MH_B[None, :]) % _MOD
    return h.min(axis=0)


def _minhash_batch(hs: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs, MINHASH_PERMS) signatures over ``_batch_token_runs``
    segments — one vectorized pass per permutation (the per-perm loop
    also bounds peak memory to one n_tokens-long u64 array, so batch
    size never multiplies by MINHASH_PERMS)."""
    n = len(offsets) - 1
    out = np.full((n, MINHASH_PERMS), _MOD, dtype=np.uint64)
    nonempty = np.flatnonzero(np.diff(offsets) > 0)
    if len(nonempty) == 0:
        return out
    starts = offsets[:-1][nonempty]
    for j in range(MINHASH_PERMS):
        hj = (hs * _MH_A[j] + _MH_B[j]) % _MOD
        out[nonempty, j] = np.minimum.reduceat(hj, starts)
    return out


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, LSH_BANDS) uint32 band keys: splitmix-style fold of each
    band's signature words — vectorized over (docs, bands)."""
    v = sigs.reshape(len(sigs), LSH_BANDS, MINHASH_PERMS // LSH_BANDS)
    acc = np.zeros(v.shape[:2], dtype=np.uint64)
    for j in range(v.shape[2]):
        acc = (acc ^ v[:, :, j]) * np.uint64(0x9E3779B97F4A7C15)
        acc ^= acc >> np.uint64(29)
    return (acc & np.uint64(0xFFFFFFFF)).astype(np.uint32)


class MinHasher:
    """Stage UDF: doc -> LSH band rows
    (band_id, band_hash, doc_id, band_hashes[LSH_BANDS], token_ids).

    Fully vectorized: one batched token hash + per-perm reduceat minima +
    columnar ``ListArray`` assembly — no per-token or per-row Python work.

    Emits LSH_BANDS rows per doc (flat-map shape).  Every row carries the
    doc's FULL vector of band hashes so the bucket stage can emit each
    candidate pair exactly once — from its first colliding band — i.e.
    candidate dedup happens distributed, with no extra shuffle and no
    driver-side drop_duplicates over a quadratic row set.  Each row also
    carries the doc's compact distinct-token-id set, so exact-Jaccard
    verification happens IN the bucket stage with zero extra shuffles and
    zero driver/broadcast state (the set is shipped L times through the
    one band shuffle — the price of a join-free single-pass design; the
    shard count scales with corpus size so per-shard memory stays
    bounded, see LSH_ROWS_PER_SHARD)."""

    def __init__(self, n_shards: int = 64):
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(doc_ids)
        hs, _, offs = _batch_token_runs(batch.column("text").to_pylist())
        bh = _band_hashes(_minhash_batch(hs, offs))  # (n, LSH_BANDS)

        band_ids = np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)
        band_hash = bh.reshape(-1)
        shard = ((band_hash.astype(np.uint64) * np.uint64(0x9E3779B1)
                  + band_ids.astype(np.uint64))
                 % np.uint64(self.n_shards)).astype(np.int32)
        # each row carries its doc's full band vector (fixed width):
        bh_vals = np.repeat(bh, LSH_BANDS, axis=0).reshape(-1)
        bh_offs = np.arange(n * LSH_BANDS + 1, dtype=np.int32) * LSH_BANDS
        # ...and its doc's token set (variable width, tiled per band):
        sizes = np.diff(offs)
        tok_offs = np.concatenate(
            [[0], np.cumsum(np.repeat(sizes, LSH_BANDS))]).astype(np.int64)
        if n:
            idx = np.concatenate(
                [np.tile(np.arange(offs[d], offs[d + 1]), LSH_BANDS)
                 for d in range(n)])
            tok_vals = hs[idx.astype(np.int64)] if len(idx) else hs[:0]
        else:
            tok_vals = hs[:0]
        return pa.table({
            "shard": pa.array(shard),
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(band_hash),
            "doc_id": pa.array(np.repeat(doc_ids, LSH_BANDS), pa.int64()),
            "band_hashes": pa.ListArray.from_arrays(
                pa.array(bh_offs, pa.int32()), pa.array(bh_vals)),
            "token_ids": pa.ListArray.from_arrays(
                pa.array(tok_offs, pa.int32()), pa.array(tok_vals)),
        })


def _make_shard_pairs(threshold: float):
    """map_groups callable for ONE band-shard: segment exact
    (band, hash) buckets, emit each pair from its first colliding
    band, exact-Jaccard verify in-bucket.  Shared by
    ``q_minhash_lsh_pairs`` and the checkpointed runner
    (``dedup_checkpointed.run_lsh_pairs_checkpointed``)."""
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
        if len(ia) > len(sets):
            # Dense-candidate bucket (typical in near-dup-heavy data):
            # one BLAS gram matrix beats materializing per-pair row
            # products — b^2 f32 (<= a few MB) vs |pairs| x |vocab|.
            inter = (inc @ inc.T)[ia, ib].astype(np.float64)
        else:
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

    return shard_pairs


def q_minhash_lsh_pairs(sf_dir: str,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard.

    Candidate generation AND verification run in ONE distributed stage.
    The shuffle key is a coarse hash SHARD of (band, hash) — see
    ``LSH_ROWS_PER_SHARD`` — and each shard task segments its rows into exact
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
    from ..sources.scale import shuffle_width, table_num_rows

    n_shards = shuffle_width(
        n_rows=table_num_rows(sf_dir, "documents") * LSH_BANDS,
        rows_per_shard=LSH_ROWS_PER_SHARD)
    # Instance (plain callable) -> task-based stage: the UDF is
    # stateless, so tasks beat an actor pool twice — no per-query pool
    # spin-up, and parallelism scales with the cluster instead of a
    # fixed actor cap:
    bands = (read_table(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(MinHasher(n_shards=n_shards),
                          batch_format="pyarrow", batch_size=4096))

    verified = (bands.groupby("shard")
                .map_groups(_make_shard_pairs(threshold),
                            batch_format="pandas")
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
            .map_batches(Winnower(), batch_format="pyarrow",
                         batch_size=4096))


def simhash64(text: str) -> int:
    """64-bit SimHash over 64-bit token hashes weighted by count (scalar
    spec; the stage uses ``_simhash_batch``, asserted equal in tests)."""
    toks = _tokens(text)
    if not toks:
        return 0
    vals, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    h = _hash_tokens(list(vals))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def _simhash_batch(texts: list[str]) -> np.ndarray:
    """(n_docs,) uint64 SimHashes — one batched token hash, then one
    weighted bit accumulation PER BIT over all docs' distinct-token runs
    (reduceat per doc), no per-doc Python loop.  Token-hash collisions
    merge count weight identically in both the scalar and batch forms,
    so the two are exactly equal.

    The per-bit loop is deliberate (same shape as ``_minhash_batch``'s
    per-perm loop): expanding all 64 bit columns at once materializes an
    (n_tokens, 64) int64 matrix — ~1 GB per 8k-doc batch — and the
    allocation traffic costs far more than 64 slim vector passes."""
    hs, cnts, offs = _batch_token_runs(texts)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if len(hs) == 0:
        return out
    nonempty = np.flatnonzero(np.diff(offs) > 0)
    starts = offs[:-1][nonempty]
    vals = np.zeros(len(nonempty), dtype=np.uint64)
    for i in range(64):
        bit = ((hs >> np.uint64(i)) & np.uint64(1)).astype(bool)
        w = np.where(bit, cnts, -cnts)
        acc = np.add.reduceat(w, starts)
        vals |= (acc > 0).astype(np.uint64) << np.uint64(i)
    out[nonempty] = vals
    return out


def _simhash_table(batch: pa.Table) -> pa.Table:
    # int64 bit-reinterpretation for the driver-visible column: the
    # pandas/DuckDB hash round trip never sees an out-of-int64 uint
    # (the bits are identical; consumers view back to uint64):
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(
            _simhash_batch(batch.column("text").to_pylist())
            .view(np.int64)),
    })


class SimHasher:
    """Kept for API compatibility; the stage itself is stateless, so
    ``q_simhash`` maps the plain function (task pool — no actor-pool
    spin-up, which dominated small-input wall time)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _simhash_table(batch)


def q_simhash(sf_dir: str) -> rd.Dataset:
    """Per-document 64-bit SimHash fingerprint (int64 bit view;
    SQL-checked against the independent-oracle fixture,
    ``oracle_fixture_aux.py``)."""
    return (read_table(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(_simhash_table, batch_format="pyarrow",
                         batch_size=8192))


def q_winnow_fingerprints_exploded(sf_dir: str) -> rd.Dataset:
    """Driver view of the winnowing fingerprints: one row per
    (doc_id, fingerprint) — the nested list column does not survive the
    driver's pandas/DuckDB hash round trip, the exploded form does.
    Zero-copy Arrow list flatten; fingerprints as int64 bit views."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        fps = batch.column("fingerprints").combine_chunks()
        counts = pc.list_value_length(fps).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(fps).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), counts)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "fingerprint": pa.array(
                flat.astype(np.uint64).view(np.int64)),
        })

    return q_winnow_fingerprints(sf_dir).map_batches(
        explode, batch_format="pyarrow")


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
    from ..sources.scale import shuffle_width, table_num_rows

    n_shards = shuffle_width(
        n_rows=table_num_rows(sf_dir, "documents") * 4,
        rows_per_shard=LSH_ROWS_PER_SHARD)
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
                 % np.uint64(n_shards)).astype(np.int32)
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


# ---------------------------------------------------------------------------
# Cross-document duplicated n-grams (substring-level dedup primitive;
# the detection pass of Lee et al., "Deduplicating Training Data Makes
# Language Models Better" — per-doc counts of 8-gram positions whose
# gram also occurs in another document)
# ---------------------------------------------------------------------------

NGRAM_N = 8
_NG_BASE = 1099511628211  # FNV-1a prime as the polynomial base (mod 2^64)


def _gram_ids(h: np.ndarray, n: int = NGRAM_N) -> np.ndarray:
    """Polynomial n-gram ids over a positional token-id array, wrapping
    uint64 arithmetic: g[i] = sum_j h[i+j] * B^(n-1-j) mod 2^64.  ``n``
    shifted multiply-adds — no per-gram Python loop."""
    m = len(h) - n + 1
    if m <= 0:
        return np.zeros(0, np.uint64)
    g = np.zeros(m, np.uint64)
    p = 1
    with np.errstate(over="ignore"):
        for j in range(n - 1, -1, -1):
            g += h[j:j + m] * np.uint64(p)
            p = (p * _NG_BASE) % (1 << 64)
    return g


def _batch_gram_rows(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch n-gram extraction.  Returns
    (gram_ids, doc_ix, npos, n_ngrams): distinct (gram, doc) pairs with
    their in-doc position counts, plus per-doc total gram positions.
    One vectorized token-hash call; doc boundaries masked vectorized
    (a gram is valid iff its first and last token fall in the same doc).
    """
    tok_lists = [_tokens(t) for t in texts]
    counts = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    n = len(texts)
    n_ngrams = np.maximum(counts - (NGRAM_N - 1), 0)
    total = int(counts.sum())
    if total < NGRAM_N:
        z = np.zeros(0, np.uint64)
        return z, np.zeros(0, np.int64), np.zeros(0, np.int64), n_ngrams
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    h = pd.util.hash_array(flat).astype(np.uint64)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    g_all = _gram_ids(h)                      # crosses doc boundaries...
    valid = doc[:len(g_all)] == doc[NGRAM_N - 1:]  # ...masked here
    g, gdoc = g_all[valid], doc[:len(g_all)][valid]
    if not len(g):
        z = np.zeros(0, np.uint64)
        return z, np.zeros(0, np.int64), np.zeros(0, np.int64), n_ngrams
    order = np.lexsort((g, gdoc))
    gs, ds = g[order], gdoc[order]
    new = np.concatenate([[True], (ds[1:] != ds[:-1]) | (gs[1:] != gs[:-1])])
    starts = np.flatnonzero(new)
    npos = np.diff(np.concatenate([starts, [len(gs)]])).astype(np.int64)
    return gs[new], ds[new], npos, n_ngrams


def q_doc_dup_ngram_stats(sf_dir: str, min_docs: int = 2) -> rd.Dataset:
    """Per-document statistics of cross-document duplicated 8-grams:
    (doc_id, n_ngrams, n_dup_ngrams, dup_ratio) where ``n_dup_ngrams``
    counts the gram POSITIONS whose 8-gram occurs in >= ``min_docs``
    distinct documents — the detection primitive for substring-level
    dedup (span removal keys off these positions).

    Scale shape: TWO all-to-alls total.  (1) distinct (gram, doc, npos)
    rows — pre-deduplicated per batch — shuffle on a coarse gram-hash
    shard; each shard task segments exact grams and keeps groups with
    >= min_docs distinct docs (rows are globally distinct per (gram,
    doc), so the group row count IS the doc count).  (2) the per-doc
    dup partials UNION the per-doc totals feed one groupby(doc_id) sum
    — the union-with-zeros trick replaces a doc-keyed join.  Gram
    identity is a 64-bit polynomial over siphash token ids; a collision
    would need ~2^32 distinct grams per shard (birthday bound) — at
    that scale raise the shard count, which also shrinks collision
    exposure per task."""
    from ray.data.aggregate import Sum

    from ..sources.scale import shuffle_width, table_num_rows

    n_shards = shuffle_width(
        n_rows=table_num_rows(sf_dir, "documents"),
        rows_per_shard=LSH_ROWS_PER_SHARD)

    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        g, dix, npos, _ = _batch_gram_rows(texts)
        shard = ((g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 16)
                 ).astype(np.int64) % n_shards
        return pa.table({
            "shard": pa.array(shard.astype(np.int32)),
            "gram": pa.array(g),
            "doc_id": pa.array(ids[dix]),
            "npos": pa.array(npos),
        })

    def totals_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        counts = np.fromiter((len(_tokens(x)) for x in texts),
                             dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_ngrams": pa.array(
                np.maximum(counts - (NGRAM_N - 1), 0)),
            "n_dup_ngrams": pa.array(np.zeros(len(texts), np.int64)),
        })

    def dup_partials(g: pd.DataFrame) -> pa.Table:
        # returns Arrow so the union with the Arrow totals stream stays
        # one block type
        gr = g["gram"].to_numpy()
        order = np.argsort(gr, kind="mergesort")
        gs = gr[order]
        docs = g["doc_id"].to_numpy()[order]
        npos = g["npos"].to_numpy()[order]
        new = np.concatenate([[True], gs[1:] != gs[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(gs)]]))
        keep = np.repeat(sizes >= min_docs, sizes)
        # in-shard combiner: fold the kept (gram, doc, npos) rows to ONE
        # row per touched doc before the second exchange.  In
        # duplicate-heavy data (the 10x replication proof: EVERY gram
        # passes min_docs) the kept set approaches the full gram-pair
        # table, so emitting it raw made exchange 2 scale with gram
        # multiplicity; the per-doc sum is associative, so folding here
        # is semantics-free.
        docs_kept, npos_kept = docs[keep], npos[keep]
        ud, inv = np.unique(docs_kept, return_inverse=True)
        sums = np.zeros(len(ud), np.int64)
        np.add.at(sums, inv, npos_kept.astype(np.int64))
        return pa.table({
            "doc_id": pa.array(ud.astype(np.int64)),
            "n_ngrams": pa.array(np.zeros(len(ud), np.int64)),
            "n_dup_ngrams": pa.array(sums),
        })

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    dup = (docs.map_batches(gram_rows, batch_format="pyarrow",
                            batch_size=4096)
           .groupby("shard").map_groups(dup_partials,
                                        batch_format="pandas"))
    totals = docs.map_batches(totals_rows, batch_format="pyarrow",
                              batch_size=4096)
    agg = (totals.union(dup)
           .groupby("doc_id")
           .aggregate(Sum("n_ngrams", alias_name="n_ngrams"),
                      Sum("n_dup_ngrams", alias_name="n_dup_ngrams")))

    def finish(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_ngrams": z, "n_dup_ngrams": z,
                             "dup_ratio": pa.array([], pa.float64())})
        n = t.column("n_ngrams").to_numpy().astype(np.float64)
        d = t.column("n_dup_ngrams").to_numpy().astype(np.float64)
        ratio = np.divide(d, n, out=np.zeros_like(d), where=n > 0)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_ngrams": t.column("n_ngrams").cast(pa.int64()),
            "n_dup_ngrams": t.column("n_dup_ngrams").cast(pa.int64()),
            "dup_ratio": pa.array(ratio),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _batch_gram_pos_rows(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like ``_batch_gram_rows`` but keeps POSITIONS: returns
    (gram_ids, doc_ix, pos_offsets, positions) where doc/gram pairs are
    distinct and ``positions[pos_offsets[k]:pos_offsets[k+1]]`` lists the
    0-based in-doc gram start positions of pair k (sorted)."""
    tok_lists = [_tokens(t) for t in texts]
    counts = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    n = len(texts)
    total = int(counts.sum())
    z = np.zeros(0, np.int64)
    if total < NGRAM_N:
        return np.zeros(0, np.uint64), z, np.zeros(1, np.int64), z
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    h = pd.util.hash_array(flat).astype(np.uint64)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    g_all = _gram_ids(h)
    valid = doc[:len(g_all)] == doc[NGRAM_N - 1:]
    g, gdoc = g_all[valid], doc[:len(g_all)][valid]
    if not len(g):
        return np.zeros(0, np.uint64), z, np.zeros(1, np.int64), z
    # 0-based position within the doc = global index - doc start
    starts_of_doc = np.concatenate([[0], np.cumsum(counts)[:-1]])
    gpos = np.flatnonzero(valid) - starts_of_doc[gdoc]
    order = np.lexsort((gpos, g, gdoc))
    gs, ds, ps = g[order], gdoc[order], gpos[order]
    new = np.concatenate([[True], (ds[1:] != ds[:-1]) | (gs[1:] != gs[:-1])])
    starts = np.flatnonzero(new)
    offsets = np.concatenate([starts, [len(gs)]]).astype(np.int64)
    return gs[new], ds[new], offsets, ps


def _ngram_removals(sf_dir: str, min_docs: int,
                    n_shards: int) -> rd.Dataset:
    """The global gram exchange of the substring-dedup removal pass:
    distinct (gram, doc, positions[]) rows through one coarse
    gram-shard shuffle, shard tasks keep grams in >= ``min_docs``
    docs, then a doc-keyed fold to one covered-position blob per doc
    (int64-LE bytes — Acero rejects list payloads in hash joins).
    Shared by ``q_doc_dedup_ngram_corpus`` and the checkpointed
    runner."""
    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        g, dix, offs, pos = _batch_gram_pos_rows(texts)
        shard = ((g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)
                 ).astype(np.int64) % n_shards
        return pa.table({
            "shard": pa.array(shard.astype(np.int32)),
            "gram": pa.array(g),
            "gdoc_id": pa.array(ids[dix]),
            "positions": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(pos, pa.int64())),
        })

    def dup_positions(g: pd.DataFrame) -> pa.Table:
        gr = g["gram"].to_numpy()
        order = np.argsort(gr, kind="mergesort")
        gs = gr[order]
        new = np.concatenate([[True], gs[1:] != gs[:-1]])
        sizes = np.diff(np.concatenate([np.flatnonzero(new), [len(gs)]]))
        keep = np.repeat(sizes >= min_docs, sizes)
        kept = g.iloc[order[keep]]
        pos = pa.array(kept["positions"].tolist(),
                       pa.list_(pa.int64()))
        return pa.table({
            "gdoc_id": pa.array(kept["gdoc_id"].to_numpy(), pa.int64()),
            "positions": pos,
        })

    def fold_doc(g: pd.DataFrame) -> pa.Table:
        out_ids: list[int] = []
        out_pos: list[list[int]] = []
        for doc, grp in g.groupby("gdoc_id", sort=True)["positions"]:
            out_ids.append(int(doc))
            # int64-LE blob: Acero's hash join (under Dataset.join)
            # rejects list-typed payload columns, so the positions ride
            # through the join as bytes
            out_pos.append(np.sort(np.concatenate(
                [np.asarray(p, np.int64) for p in grp])).tobytes())
        return pa.table({
            "gdoc_id": pa.array(out_ids, pa.int64()),
            "positions_blob": pa.array(out_pos, pa.binary()),
        })

    return (read_table(sf_dir, "documents", ["doc_id", "text"])
                .map_batches(gram_rows, batch_format="pyarrow",
                             batch_size=4096)
                .groupby("shard").map_groups(dup_positions,
                                             batch_format="pandas")
                .groupby("gdoc_id").map_groups(fold_doc,
                                               batch_format="pandas"))


def _ngram_rewrite(t: pa.Table) -> pa.Table:
    """Per-doc vectorized interval-union rewrite of the
    substring-dedup join output (docs without removal blobs
    pass through untouched)."""
    import hashlib

    if "doc_id" not in t.column_names:  # empty-schema join partition
        z = pa.array([], pa.int64())
        return pa.table({"doc_id": z, "n_tokens": z, "n_removed": z,
                         "cleaned_md5": pa.array([], pa.string())})
    texts = t.column("text").to_pylist()
    plists = [np.frombuffer(b, np.int64) if b is not None else None
              for b in t.column("positions_blob").to_pylist()]
    n_tok = np.zeros(len(texts), np.int64)
    n_rem = np.zeros(len(texts), np.int64)
    digests = []
    for i, (text, plist) in enumerate(zip(texts, plists)):
        toks = _tokens(text)
        n_tok[i] = len(toks)
        if plist is not None and len(plist):
            # interval union via diff-array cumsum
            diff = np.zeros(len(toks) + NGRAM_N + 1, np.int64)
            p = plist
            np.add.at(diff, p, 1)
            np.add.at(diff, p + NGRAM_N, -1)
            covered = np.cumsum(diff[:len(toks)]) > 0
            n_rem[i] = int(covered.sum())
            kept = [w for w, c in zip(toks, covered) if not c]
        else:
            kept = toks
        digests.append(hashlib.md5(
            " ".join(kept).encode("utf-8")).hexdigest())
    return pa.table({
        "doc_id": t.column("doc_id").cast(pa.int64()),
        "n_tokens": pa.array(n_tok),
        "n_removed": pa.array(n_rem),
        "cleaned_md5": pa.array(digests, pa.string()),
    })



def q_doc_dedup_ngram_corpus(sf_dir: str, min_docs: int = 2) -> rd.Dataset:
    """Substring-level dedup REMOVAL pass (the rewrite step of Lee et
    al.): every token covered by a cross-document duplicated 8-gram
    occurrence is dropped, and each document is re-emitted as its cleaned
    token sequence.  Output per document (all documents, including
    untouched ones): (doc_id, n_tokens, n_removed, cleaned_md5) where
    ``cleaned_md5`` digests the space-joined surviving tokens.

    Scale shape: the gram pass ships distinct (gram, doc, positions[])
    rows through ONE coarse gram-shard shuffle; shard tasks keep grams in
    >= ``min_docs`` distinct docs and emit (doc, positions[]) rows; a
    doc-keyed groupby folds them into one covered-interval list per doc;
    and a LEFT OUTER hash join brings the (sparse) removal lists to the
    documents table, where the rewrite is a per-doc vectorized interval
    union (diff-array cumsum, no per-token Python loop).  Docs without
    duplicated grams take the join's null branch and pass through
    untouched."""
    from ..sources.scale import join_width, shuffle_width, table_num_rows

    n_rows = table_num_rows(sf_dir, "documents")
    n_shards = shuffle_width(n_rows=n_rows,
                             rows_per_shard=LSH_ROWS_PER_SHARD)


    removals = _ngram_removals(sf_dir, min_docs, n_shards)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    joined = docs.join(removals, join_type="left_outer",
                       num_partitions=join_width(n_rows),
                       on=("doc_id",), right_on=("gdoc_id",))


    return joined.map_batches(_ngram_rewrite, batch_format="pyarrow",
                              batch_size=4096)
