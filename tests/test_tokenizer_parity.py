r"""Batched random-string cross-engine parity for the tokenizer contract —
the foundation every word-level oracle rests on: ws_tokens (the explicit
WS_RE class), spark_word_shingles vs sql_word_shingles, and the BPE-ish
regex token count, compared Spark-vs-DuckDB over ~100 adversarial random
strings in ONE batch (per-example Spark jobs would make hypothesis-style
per-case generation minutes-slow; a seeded corpus gives the same breadth
deterministically).

The alphabet deliberately includes the cross-engine traps: vertical tab
\x0b (Java \s includes it, RE2 \s does not — the reason WS_RE/BPE_PATTERN
spell their classes out), NBSP and zero-width space (NOT whitespace to
either engine's explicit class), CJK/Arabic/emoji/combining marks
(tokenize as symbol chars), and quote/backslash characters (exercise the
oracle SQL's escaping via parameter binding).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crystal_parquet_database_spark.functions.portable_hash import (
    WS_RE,
    spark_word_shingles,
    sql_word_shingles,
)
from crystal_parquet_database_spark.operators.text import BPE_PATTERN

ALPHABET = (
    list("abcdefgh XYZ 0123456789")
    + list(" \t\n\f\r")
    + ["\x0b", " ", "​"]          # vtab, NBSP, zero-width space
    + list("中文語أبجdé🚀⛄")
    + ["é", "'", '"', "\\", "%", "_", ".", "*", "(", ")", "[", "]"]
)


def _corpus(n: int = 100, max_len: int = 40) -> list[str]:
    rng = random.Random(42)
    out = ["", " ", "\x0b", "a\x0bb", "  x  ", "word"]
    while len(out) < n:
        k = rng.randint(1, max_len)
        out.append("".join(rng.choice(ALPHABET) for _ in range(k)))
    return out


@pytest.fixture(scope="module")
def parity_frames(spark):
    texts = _corpus()
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            F.split(F.trim(F.col("t")), WS_RE).alias("ws"),
            spark_word_shingles(F.col("t"), 3).alias("sh"),
            F.regexp_count(F.col("t"), F.lit(BPE_PATTERN)).cast("int").alias("bpe"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        rf"""
        SELECT i,
               string_split_regex(trim(t, ' '), '\s+') AS ws,
               {sql_word_shingles('t', 3)} AS sh,
               len(regexp_extract_all(t, '{BPE_PATTERN}')) AS bpe
        FROM docs ORDER BY i
        """
    ).fetchall()
    return texts, got, want


def test_ws_tokens_engine_parity(parity_frames):
    texts, got, want = parity_frames
    for g, w in zip(got, want):
        assert list(g["ws"]) == list(w[1]), f"ws tokens diverge on {texts[g['i']]!r}"


def test_word_shingles_engine_parity(parity_frames):
    # shingles are SETS downstream (array_distinct / list_distinct may
    # order differently) — compare sorted
    texts, got, want = parity_frames
    for g, w in zip(got, want):
        assert sorted(g["sh"]) == sorted(w[2]), f"shingles diverge on {texts[g['i']]!r}"


def test_bpe_token_count_engine_parity(parity_frames):
    texts, got, want = parity_frames
    for g, w in zip(got, want):
        assert g["bpe"] == w[3], f"BPE count diverges on {texts[g['i']]!r}"


# ---------------------------------------------------------------------------
# round-11 extension (verdict ask #5): the \x0b and NBSP classes both came
# from Spark-vs-DuckDB DEFINITION drift, so the same batched seeded-corpus
# pattern now covers the remaining cross-engine text-semantics families:
# case folding (Java full/context-sensitive case mapping vs DuckDB's
# utf8proc 1:1 codepoint map), raw regex class semantics (Java \s includes
# \x0b, RE2 \s does not — the documented reason WS_RE/BPE_PATTERN spell
# their classes out), and split() trailing-empty behavior (both engines
# KEEP trailing empties — proven, not assumed).
# ---------------------------------------------------------------------------

# Case folding diverges on full/context-sensitive mappings (measured, this
# container): İ U+0130 lowers to 'i̇' (i + combining dot) in Java but 'i' in
# DuckDB; final sigma ς is context-sensitive in Java only; ß uppers to 'SS'
# (full mapping) in Java but 'ẞ' in DuckDB; ligature ﬀ uppers to 'FF' in
# Java, unchanged in DuckDB. THE CONTRACT: oracles may use LOWER()/UPPER()
# only on ASCII-safe columns (scalar_string_functions' p_name/p_type —
# TPC-H ASCII), NEVER on corpus text; these assertions pin the measured
# divergence so an engine-version change that silently heals or widens the
# class shows up here first.
_CASE_DIVERGENT = {"İ", "Σ", "ß", "ﬀ", "ς"}


@pytest.fixture(scope="module")
def case_parity(spark):
    texts = _corpus() + ["İstanbul", "ΣΟΦΟΣ", "straße", "ﬀi", "K û Ǆǅǆ"]
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", F.lower("t").alias("lo"), F.upper("t").alias("up"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        "SELECT i, lower(t) AS lo, upper(t) AS up FROM docs ORDER BY i"
    ).fetchall()
    return texts, got, want


def test_case_folding_parity_outside_divergent_codepoints(case_parity):
    texts, got, want = case_parity
    for g, w in zip(got, want):
        t = texts[g["i"]]
        if set(t) & _CASE_DIVERGENT:
            continue
        assert g["lo"] == w[1], f"lower diverges on {t!r}"
        assert g["up"] == w[2], f"upper diverges on {t!r}"


def test_case_folding_known_divergences_still_diverge(case_parity):
    """If these START agreeing (engine upgrade), the ASCII-only oracle
    contract can be revisited — and until then nobody may assume parity."""
    texts, got, want = case_parity
    by_text_lo = {texts[g["i"]]: (g["lo"], w[1]) for g, w in zip(got, want)}
    by_text_up = {texts[g["i"]]: (g["up"], w[2]) for g, w in zip(got, want)}
    assert by_text_lo["İstanbul"][0] != by_text_lo["İstanbul"][1]  # i̇ vs i
    assert by_text_lo["ΣΟΦΟΣ"][0] != by_text_lo["ΣΟΦΟΣ"][1]  # ς vs σ (final)
    assert by_text_up["straße"][0] != by_text_up["straße"][1]  # SS vs ẞ
    assert by_text_up["ﬀi"][0] != by_text_up["ﬀi"][1]  # FFI vs ﬀI


def test_raw_regex_s_diverges_on_vtab_but_ws_re_agrees(spark):
    """Java \\s includes \\x0b, RE2 \\s does not — the measured divergence
    that justifies WS_RE spelling its class out. WS_RE itself must count
    identically in both engines over the full adversarial corpus."""
    texts = _corpus()
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    got = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            F.regexp_count("t", F.lit(r"\s")).alias("raw"),
            F.regexp_count("t", F.lit(WS_RE)).alias("pinned"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        rf"""SELECT i, len(regexp_extract_all(t, '\s')) AS raw,
                    len(regexp_extract_all(t, '{WS_RE}')) AS pinned
             FROM docs ORDER BY i"""
    ).fetchall()
    raw_diverged = False
    for g, w in zip(got, want):
        t = texts[g["i"]]
        assert g["pinned"] == w[2], f"WS_RE count diverges on {t!r}"
        if "\x0b" in t:
            assert g["raw"] != w[1], f"raw \\s unexpectedly agrees on {t!r}"
            raw_diverged = True
        else:
            assert g["raw"] == w[1], f"raw \\s diverges on vtab-free {t!r}"
    assert raw_diverged  # the corpus must actually carry \x0b cases


def test_split_trailing_empties_parity(spark):
    """Both engines KEEP trailing empty strings (Spark's split uses Java
    limit=-1 semantics; DuckDB string_split_regex keeps them too) and both
    yield [''] for the empty string — proven here so no oracle needs a
    trailing-empty workaround, and any engine change surfaces."""
    texts = ["a,b,,", "", ",", "a,,b,", ",,", "x,y", ",lead"]
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", F.split(F.col("t"), ",").alias("sp"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        "SELECT i, string_split(t, ',') AS sp FROM docs ORDER BY i"
    ).fetchall()
    for g, w in zip(got, want):
        assert list(g["sp"]) == list(w[1]), f"split diverges on {texts[g['i']]!r}"
    assert list(got[0]["sp"]) == ["a", "b", "", ""]  # trailing empties kept
    assert list(got[1]["sp"]) == [""]


def _one_arg_trim_sites(sql: str) -> list[str]:
    """Paren-aware scan for one-argument trim( calls: DuckDB's one-arg
    trim() strips UNICODE whitespace (NBSP) while Spark's F.trim strips
    ASCII space only — every text oracle must pin two-arg trim(x, ' ').
    Word-boundary guarded: ltrim(/rtrim( are a DIFFERENT class (their
    one-arg forms strip ASCII space only in both engines) and must not be
    flagged — or mis-reported — by this lint."""
    out = []
    low = sql.lower()
    pos = 0
    while True:
        j = low.find("trim(", pos)
        if j < 0:
            return out
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            pos = j + 1  # ltrim(/rtrim(/xtrim( — not the bare trim() class
            continue
        k = j + len("trim(")
        depth, top_comma = 1, False
        while k < len(sql) and depth:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                top_comma = True
            k += 1
        if not top_comma:
            out.append(sql[j:k])
        pos = k


def test_no_one_arg_trim_in_any_oracle():
    """ADVICE r10: agg_cms_heavy_hitters' oracle still carried a one-arg
    TRIM(text) after the round-10 trim-pinning wave (green only because the
    NBSP tokens missed the top-20). This lint makes the class mechanical:
    no registered oracle may call trim with a single argument."""
    from crystal_parquet_database_spark.surface import ORACLES

    offenders = {
        name: sites
        for name, sql in ORACLES.items()
        if sql and (sites := _one_arg_trim_sites(sql))
    }
    assert not offenders, f"one-arg trim() in oracles: {offenders}"


def test_levenshtein_ascii_parity_and_unicode_divergence(spark):
    """Levenshtein: Spark counts CODEPOINT edits, DuckDB counts BYTE edits —
    measured divergent on every non-ASCII string (é: 1 vs 2 substitutions
    worth of bytes; 中文字 vs 中文: 1 vs 3). THE CONTRACT
    (dedup_edit_distance_pairs): cross-engine edit distance is checked only
    where bytes == codepoints (ASCII, via strlen = length on both sides);
    the codepoint path stays Spark-side, asserted in test_dedup_ml. These
    assertions pin the measured divergence so an engine change surfaces."""
    cases = [
        ("kitten", "sitting"), ("", "abc"), ("", ""), ("a b c", "a  b c"),
        ("héllo", "hello"), ("中文字", "中文"), ("🚀x", "x"),
        ("\u00e9", "e\u0301"),  # composed vs decomposed é — neither engine
        #                         unicode-normalizes, but they count the
        #                         difference in different units
    ]
    pdf = pd.DataFrame(
        {"i": range(len(cases)), "a": [c[0] for c in cases], "b": [c[1] for c in cases]}
    )
    got = (
        spark.createDataFrame(pdf)
        .select("i", F.levenshtein("a", "b").alias("d"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("SELECT i, levenshtein(a, b) AS d FROM t ORDER BY i").fetchall()
    ascii_only = lambda s: all(ord(ch) < 128 for ch in s)
    diverged = 0
    for g, w in zip(got, want):
        a, b = cases[g["i"]]
        if ascii_only(a) and ascii_only(b):
            assert g["d"] == w[1], f"ASCII levenshtein diverges on {(a, b)!r}"
        else:
            assert g["d"] != w[1], f"non-ASCII unexpectedly agrees on {(a, b)!r}"
            diverged += 1
    assert diverged == 4  # every non-ASCII case in the table diverges today


def test_round_on_double_parity_and_pinned_divergence(spark):
    """round(double, d) cross-engine: at d=0 the engines agree on the
    half-away grid (2.5 -> 3, -2.5 -> -3 in BOTH; the only difference is
    -0.0 vs 0.0, which integer casts erase) — which is why the single
    oracle ROUND( use, agg_argmax's CAST(ROUND(c_acctbal*100) AS BIGINT),
    is safe. At d>0 they DIVERGE: Spark rounds the shortest decimal
    representation (1.005 -> 1.01) while DuckDB rounds the binary double
    (1.005 is stored below 1.005 -> 1.0). THE CONTRACT (verify-skill rule,
    now measured): never round doubles at d>0 in an oracle-paired path;
    route exact aggregates through decimal instead (functions/exact.py)."""
    vals = [2.5, 3.5, -2.5, -3.5, 0.5, -0.5, 1.005, 2.675]
    pdf = pd.DataFrame({"i": range(len(vals)), "x": vals})
    got = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            F.round("x", 0).alias("r0"),
            F.round("x", 2).alias("r2"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        "SELECT i, round(x, 0) AS r0, round(x, 2) AS r2 FROM t ORDER BY i"
    ).fetchall()
    diverged_d2 = 0
    for g, w in zip(got, want):
        x = vals[g["i"]]
        # d=0: values equal after normalizing -0.0 (casts erase the sign)
        assert g["r0"] + 0.0 == w[1] + 0.0, f"round(.,0) diverges on {x}"
        if g["r2"] != w[2]:
            diverged_d2 += 1
    # measured: 1.005 diverges (1.01 vs 1.0); 2.675 happens to agree on
    # this engine pair — the class needs only one witness to stay pinned
    assert diverged_d2 >= 1, "the d=2 binary-representation divergence healed?"


def test_negative_modulo_parity(spark):
    """% follows the dividend's sign in BOTH engines (C semantics) — so %
    is safe in oracles without a pmod workaround; pmod stays Spark-side
    for non-negative bucketing."""
    got = (
        spark.range(1)
        .select(
            (F.lit(-7) % F.lit(3)).alias("a"),
            (F.lit(7) % F.lit(-3)).alias("b"),
            (F.lit(-7) % F.lit(-3)).alias("c"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    w = con.execute("SELECT -7 % 3, 7 % -3, -7 % -3").fetchone()
    assert (got["a"], got["b"], got["c"]) == w == (-1, 1, -1)


def test_oracle_lints_for_pinned_divergence_classes():
    """Mechanical enforcement of the round-11 pinned contracts, the
    one-arg-trim-lint pattern: (1) LOWER()/UPPER() in an oracle must never
    touch the corpus `text` column (case folding diverges on
    full/context-sensitive mappings; TPC-H ASCII columns are fine);
    (2) any oracle using levenshtein() must carry the ASCII guard
    (strlen = length) — byte-vs-codepoint counting diverges otherwise."""
    import re

    from crystal_parquet_database_spark.surface import ORACLES

    case_offenders, lev_offenders = {}, []
    for name, sql in ORACLES.items():
        if not sql:
            continue
        low = sql.lower()
        hits = [
            m.group(0)
            for m in re.finditer(r"\b(lower|upper)\(\s*[a-z_.]*text", low)
        ]
        if hits:
            case_offenders[name] = hits
        if "levenshtein(" in low and "strlen(text) = length(text)" not in low:
            lev_offenders.append(name)
    assert not case_offenders, f"case folding on corpus text: {case_offenders}"
    assert not lev_offenders, f"levenshtein without ASCII guard: {lev_offenders}"


def test_floor_of_integer_ratio_parity(spark):
    """The round-12 bin/centroid contract: floor(CAST(a AS DOUBLE) /
    CAST(b AS DOUBLE)) on int64 inputs below 2^53 — one correctly-rounded
    IEEE division then floor — must agree cross-engine EVERYWHERE,
    including exact-multiple boundaries (a = k*b, where a 1-ulp division
    error would flip the bin) and near-boundary a = k*b ± 1. Both the
    calibration bin index floor((rk-1)*bins/n) and the k-means centroid
    component floor-quantization rest on it."""
    import duckdb

    cases = []
    for b in (1, 3, 7, 10, 11, 4096, 999_983, 2**31 - 1):
        for k in (0, 1, 2, 5, 1000):
            base = k * b
            for a in (base - 1, base, base + 1):
                if a >= 0:
                    cases.append((a, b))
    df = spark.createDataFrame(cases, "a long, b long")
    got = (
        df.select(
            "a", "b",
            F.floor(F.col("a").cast("double") / F.col("b").cast("double")).alias("f"),
        )
        .orderBy("a", "b")
        .collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in sorted(cases))
    want = con.execute(
        f"SELECT a, b, CAST(FLOOR(CAST(a AS DOUBLE) / CAST(b AS DOUBLE)) AS BIGINT)"
        f" FROM (VALUES {vals}) t(a, b) ORDER BY a, b"
    ).fetchall()
    assert [(r["a"], r["b"], r["f"]) for r in got] == [tuple(w) for w in want]
    # and the exact boundary is bit-clean: a = k*b floors to exactly k
    for r in got:
        if r["a"] % r["b"] == 0:
            assert r["f"] == r["a"] // r["b"]
