"""Batched random-string cross-engine parity for the tokenizer contract —
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
