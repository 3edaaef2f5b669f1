"""Unit tests for the corpus-filtering kernels (PII scrub + Gopher
quality signals) — direct batch-function calls, plus a naive-Python
cross-check of the vectorized repetition accounting."""

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa

from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
    GOPHER_MAX_TOP_BIGRAM_FRAC,
    GOPHER_MAX_TOP_WORD_FRAC,
    GOPHER_MIN_WORDS,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    gopher_quality_batch,
    pii_scrub_batch,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


# ---------------------------------------------------------------- PII scrub

def test_pii_counts_and_redaction():
    out = pii_scrub_batch(_tbl([
        "mail me at a.b+c@example.co.uk or 10.0.0.1 now",
        "call 555-123-4567 or +1 555.123.4567",
        "clean text, nothing here",
    ])).to_pydict()
    assert out["n_emails"] == [1, 0, 0]
    assert out["n_ips"] == [1, 0, 0]
    # "+1 555.123.4567" -> the optional + is on the FIRST group, so the
    # match is "555.123.4567"; both lines hold one phone each... second
    # doc has two phone-shaped numbers.
    assert out["n_phones"] == [0, 2, 0]
    assert out["pii_total"] == [2, 2, 0]
    scrub = "mail me at [EMAIL] or [IP] now"
    assert out["scrub_md5"][0] == hashlib.md5(scrub.encode()).hexdigest()
    assert out["scrub_md5"][2] == hashlib.md5(
        b"clean text, nothing here").hexdigest()


def test_pii_patterns_are_re2_safe():
    # Python re must accept the same patterns (no lookaround/backrefs),
    # a proxy for the RE2 subset contract shared with pyarrow + DuckDB.
    for pat in (PII_EMAIL, PII_IPV4, PII_PHONE):
        re.compile(pat)


def test_pii_empty_and_overlap():
    out = pii_scrub_batch(_tbl(["", "x@y.zz at 1.2.3.4"])).to_pydict()
    assert out["pii_total"] == [0, 2]
    assert out["scrub_md5"][0] == hashlib.md5(b"").hexdigest()


def test_pii_duckdb_parity_on_adversarial_text():
    """The sf corpora carry no PII, so the driver's oracle matches on
    zeros there — this test pins RE2 parity (pyarrow vs DuckDB) on text
    that actually matches, including boundary-condition near-misses."""
    import duckdb

    texts = [
        "a.b+c@ex.co.uk then 10.0.0.1 then 555-123-4567",
        "+44 123 456 7890 and x@y.io and 999.999.999.999",
        "edge: @no.tld.match, 1.2.3.4.5, 12-34-5678, ip5 256.1.1.1",
        "dots 555.123.4567 spaces 555 123 4567 mixed 555-123 4567",
        "", "no pii at all",
    ]
    tbl = _tbl(texts)
    got = pii_scrub_batch(tbl).to_pydict()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(f"""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,'{PII_EMAIL}')) AS BIGINT) n_emails,
          CAST(len(regexp_extract_all(text,'{PII_IPV4}')) AS BIGINT) n_ips,
          CAST(len(regexp_extract_all(text,'{PII_PHONE}')) AS BIGINT) n_phones,
          md5(regexp_replace(regexp_replace(regexp_replace(
              text,'{PII_EMAIL}','[EMAIL]','g'),
              '{PII_IPV4}','[IP]','g'),
              '{PII_PHONE}','[PHONE]','g')) scrub_md5
        FROM documents ORDER BY doc_id""").fetchdf()
    for i in range(len(texts)):
        row = exp.iloc[i]
        assert got["n_emails"][i] == row.n_emails, i
        assert got["n_ips"][i] == row.n_ips, i
        assert got["n_phones"][i] == row.n_phones, i
        assert got["scrub_md5"][i] == row.scrub_md5, i


# ---------------------------------------------------------- Gopher signals

def _naive_signals(text):
    toks = re.split(r"\s+", text.strip()) if text.strip() else []
    n = len(toks)
    out = {"n_words": n}
    out["mean_word_len"] = (sum(map(len, toks)) / n) if n else 0.0
    wc = Counter(toks)
    out["n_unique_words"] = len(wc)
    out["type_token_ratio"] = (len(wc) / n) if n else 0.0
    out["top_word_frac"] = (max(wc.values()) / n) if n else 0.0
    bg = Counter(zip(toks, toks[1:]))
    out["top_bigram_frac"] = (max(bg.values()) / (n - 1)) if n >= 2 else 0.0
    return out


def test_gopher_matches_naive_per_doc():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "bb", "c", "dddd", "ee-ee", "ffff", "g", "hh"]
    texts = ["", "   ", "solo", "a b a b a b",
             "the the the the the the the the the the"]
    for _ in range(20):
        n = int(rng.integers(1, 120))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    out = gopher_quality_batch(_tbl(texts)).to_pydict()
    for i, t in enumerate(texts):
        exp = _naive_signals(t)
        for k, v in exp.items():
            got = out[k][i]
            assert got == v or abs(got - v) < 1e-12, (i, k, got, v, t[:40])


def test_gopher_keep_flag_bounds():
    # 60 distinct-ish words, reasonable lengths -> keep
    good = " ".join(f"word{i:02d}xx" for i in range(60))
    # repetitive doc -> top_word_frac too high
    rep = " ".join(["spam"] * 60)
    short = "too short"
    out = gopher_quality_batch(_tbl([good, rep, short])).to_pydict()
    assert out["keep"] == [1, 0, 0]
    assert out["n_words"][0] == 60 >= GOPHER_MIN_WORDS
    assert out["top_word_frac"][1] > GOPHER_MAX_TOP_WORD_FRAC
    assert out["top_bigram_frac"][1] > GOPHER_MAX_TOP_BIGRAM_FRAC


def test_gopher_single_doc_batch_and_all_empty():
    out = gopher_quality_batch(_tbl(["", ""])).to_pydict()
    assert out["n_words"] == [0, 0]
    assert out["keep"] == [0, 0]
    out = gopher_quality_batch(_tbl(["one two two"])).to_pydict()
    assert out["top_bigram_frac"] == [0.5]


# ------------------------------------------------- repetition signals

def _naive_repetition(text):
    from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
        REP_DUP_N, REP_TOP_NS)

    toks = re.split(r"\s+", text.strip()) if text.strip() else []
    n = len(toks)
    total_chars = len(" ".join(toks))
    out = {"n_tokens": n}
    for k in REP_TOP_NS:
        grams = Counter(" ".join(toks[i:i + k]) for i in range(n - k + 1))
        best = max((c * len(g) for g, c in grams.items()), default=0)
        out[f"top{k}_char_frac"] = best / total_chars if total_chars else 0.0
    grams = Counter(tuple(toks[i:i + REP_DUP_N])
                    for i in range(n - REP_DUP_N + 1))
    covered = set()
    for i in range(n - REP_DUP_N + 1):
        if grams[tuple(toks[i:i + REP_DUP_N])] >= 2:
            covered.update(range(i, i + REP_DUP_N))
    out[f"dup{REP_DUP_N}_tok_frac"] = len(covered) / n if n else 0.0
    return out


def test_repetition_matches_naive_per_doc():
    from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
        repetition_batch)

    rng = np.random.default_rng(11)
    vocab = ["alpha", "bb", "c", "dddd", "ee", "ffff"]
    texts = ["", "   ", "solo",
             # overlapping duplicated 3-grams: "a b a" at 0 and 2 ->
             # coverage must union positions, not double-count
             "a b a b a b a",
             "x y z q x y z q",           # disjoint duplicated 3-grams
             "w w w w w w"]               # one gram repeated everywhere
    for _ in range(20):
        n = int(rng.integers(1, 60))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    out = repetition_batch(_tbl(texts)).to_pydict()
    for i, t in enumerate(texts):
        exp = _naive_repetition(t)
        for k, v in exp.items():
            got = out[k][i]
            assert got == v or abs(got - v) < 1e-12, (i, k, got, v, t[:40])


def test_repetition_coverage_union_exact():
    from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
        repetition_batch)

    # "a b a b a" : 3-grams = (a b a), (b a b), (a b a) -> "a b a" dup.
    # Its two occurrences cover positions {0,1,2} and {2,3,4} -> all 5.
    out = repetition_batch(_tbl(["a b a b a"])).to_pydict()
    assert out["dup3_tok_frac"] == [1.0]
    # "x q a b a b a" : same dup shifted; positions 2..6 of 7 covered.
    out = repetition_batch(_tbl(["x q a b a b a"])).to_pydict()
    assert out["dup3_tok_frac"] == [5.0 / 7.0]
