"""Corpus-level set analytics: the distinct-token Jaccard overlap
matrix between sources — "how much does sub-corpus A's vocabulary
overlap sub-corpus B's", the corpus-comparison primitive behind
contamination triage and mixture design.

Token spec (shared with the SQL oracle): whitespace split of the
trimmed text, empty tokens dropped — ``re.split(r"\\s+")`` here,
``string_split_regex(trim(text), '\\s+')`` there.

Scale shape: the all-pairs intersection NEVER materializes pairs of
tokens.  One streaming pass emits per-batch-distinct ``(src, tok)``
rows; ONE token-bucket shuffle lands every copy of a token in the same
group, where the per-token source BITMASK is folded and counted —
the exchange carries (src, tok) rows once, and everything after the
fold is mask-histogram sized (``<= 2^n_sources`` rows).  Intersection,
union and Jaccard for every source pair are exact-integer functions of
the mask histogram, computed on the driver from a table of at most
``2^n_sources`` counts.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table

_WS = re.compile(r"\s+")


def _distinct_sources(sf_dir: str) -> list[str]:
    """Sorted distinct sources (tiny reduction; bit positions)."""
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "documents", ["source"])
    rows = (ds.groupby("source").aggregate(Count())
            .to_pandas())
    return sorted(rows["source"].tolist())


def q_source_jaccard(sf_dir: str) -> pd.DataFrame:
    """Distinct-token Jaccard for every source pair (a < b):
    ``(source_a, source_b, n_inter, n_union, jaccard)`` — zero-overlap
    pairs included."""
    sources = _distinct_sources(sf_dir)
    if len(sources) > 62:  # int64 bitmask; shard the source space beyond
        raise ValueError(
            f"{len(sources)} sources exceed the 62-bit mask; partition "
            "the source list and run per shard")
    bit = {s: 1 << i for i, s in enumerate(sources)}
    n_buckets = 64

    def tok_rows(t: pa.Table) -> pa.Table:
        srcs = t.column("source").to_pylist()
        texts = t.column("text").to_pylist()
        out_src, out_tok = [], []
        seen: set[tuple] = set()
        for s, txt in zip(srcs, texts):
            b = bit[s]
            stripped = txt.strip()
            for tok in (_WS.split(stripped) if stripped else []):
                key = (b, tok)
                if key not in seen:
                    seen.add(key)
                    out_src.append(b)
                    out_tok.append(tok)
        toks = pd.Series(out_tok)
        bucket = (pd.util.hash_array(toks.to_numpy(object))
                  % n_buckets).astype(np.int64)
        return pa.table({
            "src_bit": pa.array(out_src, pa.int64()),
            "tok": pa.array(out_tok, pa.string()),
            "bucket": pa.array(bucket),
        })

    def fold_masks(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (tok, src) within the bucket, then OR the bits per
        # token (sum of distinct single-bit values == bitwise OR)
        d = g.drop_duplicates(["tok", "src_bit"])
        masks = d.groupby("tok")["src_bit"].sum()
        hist = masks.value_counts()
        return pd.DataFrame({"mask": hist.index.astype(np.int64),
                             "n_toks": hist.to_numpy(np.int64)})

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["source", "text"])
    hist = (ds.map_batches(tok_rows, batch_format="pyarrow",
                           batch_size=4096)
            .groupby("bucket").map_groups(fold_masks,
                                          batch_format="pandas")
            .groupby("mask").aggregate(Sum("n_toks", alias_name="n"))
            .to_pandas())
    masks = hist["mask"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    rows = []
    for i, a in enumerate(sources):
        for b_src in sources[i + 1:]:
            ba, bb = bit[a], bit[b_src]
            inter = int(counts[(masks & ba > 0) & (masks & bb > 0)].sum())
            na = int(counts[masks & ba > 0].sum())
            nb = int(counts[masks & bb > 0].sum())
            union = na + nb - inter
            rows.append((a, b_src, inter, union,
                         float(inter) / union if union else 0.0))
    return pd.DataFrame(rows, columns=[
        "source_a", "source_b", "n_inter", "n_union", "jaccard"])


SOURCE_JACCARD_SQL = r"""
    WITH toks AS (
        SELECT DISTINCT source, t.tok
        FROM documents,
             unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
        WHERE t.tok <> ''
    ), sizes AS (
        SELECT source, COUNT(*) AS n FROM toks GROUP BY source
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_inter
        FROM toks a JOIN toks b
          ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    ), allp AS (
        SELECT sa.source AS source_a, sb.source AS source_b,
               sa.n AS na, sb.n AS nb
        FROM sizes sa JOIN sizes sb ON sa.source < sb.source
    )
    SELECT ap.source_a, ap.source_b,
           CAST(COALESCE(p.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(ap.na + ap.nb - COALESCE(p.n_inter, 0) AS BIGINT)
               AS n_union,
           CASE WHEN ap.na + ap.nb - COALESCE(p.n_inter, 0) > 0
                THEN CAST(COALESCE(p.n_inter, 0) AS DOUBLE)
                     / (ap.na + ap.nb - COALESCE(p.n_inter, 0))
                ELSE 0.0 END AS jaccard
    FROM allp ap LEFT JOIN pairs p
      ON p.source_a = ap.source_a AND p.source_b = ap.source_b
"""
