#!/usr/bin/env python3
"""Degenerate-input sweep: rebuild the sf0.001 fixtures with the ZERO-SIGNAL
shapes a real scrape feed is full of — empty strings, whitespace-only and
punctuation-only documents, single-character and single-token bodies, one
giant unbroken token, a single token repeated hundreds of times, stopword-only
text, regex metacharacters, empty-STRING group keys (distinct from the null
corpus's NULL keys), zero-norm / constant / overflow-magnitude / denormal
embeddings — then run EVERY oracle-paired query through the hash-exact
Spark-vs-DuckDB comparison.

Why this is its own corpus: the null sweep models ABSENT values (NULL text,
NULL keys, NULL elements); this one models PRESENT-but-degenerate values,
which take entirely different code paths — ``split('')`` yields ``['']`` (one
empty token, not zero tokens) in BOTH engines, empty-string group keys form a
real group the NULL-handling never sees, a zero vector hits the cosine
zero-norm guard (Spark NULLs via ``_cos_div``; DuckDB x/0.0 is NULL by
engine semantics — same answer via different mechanisms, which is exactly
the kind of lockstep that must be PROVEN, not assumed), an all-+inf vector
(the float32 image of an overflowed upstream value) drives the dot product
to +inf and the cosine to NaN (both engines sort NaN above +inf — again
proven here, not assumed), a 4000-char unbroken token stresses every
chunker/packer/shingle length assumption at once, and RAGGED vectors — a
32-dim and a 96-dim row in the 64-dim corpus, including one SEED row —
exercise round 10's disclosed mixed-encoder class: Spark's zip_with pads
the short side with NULLs so partial distances null out, while DuckDB's
indexed list folds SKIP NULL elements and return a partial NUMBER, so such
vectors must be excluded by the dimension-extended invalid-vector contract
(valid_vectors/VALID_VEC_SQL with dim) on BOTH sides or they land in
different cells/buckets per engine (probed at 445/500 diverging rows).

Usage: python3 scripts/degenerate_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from null_sweep import REPEAT_3X
from sweep_lib import SRC, run_sweep

# Present-but-degenerate bodies. Each keyed doc keeps SOME corpus overlap
# where the shape allows (BM25/TF-IDF/decontamination still need shared
# vocabulary elsewhere in the corpus — the non-target docs provide it).
DEGENERATE_TEXTS = [
    "",                                        # empty string (NOT NULL)
    "   ",                                     # spaces only
    " \t\n\r ",                                # assorted whitespace only
    "word",                                    # single ordinary token
    "a",                                       # single character
    "x" * 4000,                                # one giant unbroken token
    ("spam " * 400).strip(),                   # one token repeated 400x
    "!!! ??? ... ,,, ;;; ::: ---",             # punctuation-only tokens
    "a.b c* (d) [e] f+ g? h|i \\j $k ^m",      # regex metacharacters
    "123 456.789 -42 1e10 0x1f nan inf",       # numeric-looking tokens
    "the the the a a an of of to to",          # stopwords only
    # NBSP-PADDED text (leading/trailing U+00A0): DuckDB's one-arg trim()
    # strips Unicode whitespace while Spark's F.trim strips ASCII space
    # only — the divergence the tokenizer-parity property test caught;
    # every oracle now pins trim(text, ' ') to Spark's semantic
    "  nbsp padded scan table  ",
    "tail nbsp token ",
]


def build_degenerate_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)

    docs = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    n = len(DEGENERATE_TEXTS)
    # every ~8th doc gets a degenerate body, spread across the id range so
    # chunkers/samplers/strata all see some; n_chars stays honest
    targets = [i for i in docs.index if docs.loc[i, "doc_id"] % 8 == 5]
    for j, i in enumerate(targets):
        t = DEGENERATE_TEXTS[j % n]
        docs.loc[i, "text"] = t
        docs.loc[i, "n_chars"] = len(t)
    # empty-STRING group keys — a real group, distinct from NULL, that the
    # null corpus's NULL-key probes never exercise
    docs.loc[docs["doc_id"] % 16 == 6, "lang"] = ""
    docs.loc[docs["doc_id"] % 16 == 10, "source"] = ""
    docs.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    emb = pd.read_parquet(os.path.join(dst, "embeddings.parquet"))

    def set_vec(vid: int, val: float) -> None:
        idx = emb.index[emb["vec_id"] == vid]
        if len(idx):
            dim = len(emb.at[idx[0], "embedding"])
            emb.at[idx[0], "embedding"] = [np.float32(val)] * dim

    set_vec(10, 0.0)        # zero vector: cosine zero-norm guard, both sides
    set_vec(20, 0.5)        # constant vector: valid, maximal mutual cosine
    # all-+inf vector: dot = +inf, cosine = inf/inf = NaN. Stored as inf
    # EXPLICITLY — a finite float32 can't overflow a 64-term double fold
    # ((3.4e38)^2 x 64 ~ 7e77 << DBL_MAX), so "overflow in the dot product"
    # is unreachable from finite float32 elements; the honest probe is the
    # already-overflowed upstream value a real feed would carry (the old
    # 1e154 literal was ALSO +inf after the float32 cast, just via a noisy
    # RuntimeWarning and an inaccurate docstring)
    set_vec(30, float("inf"))
    set_vec(40, 5e-324)     # denormal: dot underflows to 0 -> zero norm
    idx60 = emb.index[emb["vec_id"] == 60]
    if len(idx60):
        # zero-LENGTH list (present, not NULL): the third invalid-vector
        # shape, and the one that ANSI-aborts element_at while DuckDB's
        # [1] quietly returns NULL
        emb.at[idx60[0], "embedding"] = []

    def set_ragged(vid: int, new_dim: int) -> None:
        """RAGGED vector (round 10's disclosed class): resize one row to a
        different dimension — truncate, or tile-extend past 64. Must be
        excluded by the dim-extended contract on both engines (a partial
        distance is NULL in Spark's padded zip_with fold but a NUMBER in
        DuckDB's NULL-skipping list fold)."""
        idx = emb.index[emb["vec_id"] == vid]
        if len(idx):
            old = list(emb.at[idx[0], "embedding"])
            vals = (old * ((new_dim // len(old)) + 1))[:new_dim]
            emb.at[idx[0], "embedding"] = np.asarray(vals, dtype=np.float32)

    set_ragged(50, 32)     # the probed shape: one 32-dim among 64-dim
    set_ragged(70, 96)     # longer-than-corpus ragged
    set_ragged(202, 32)    # a SEED row (semdedup cell + PQ codebook arm):
    #                        both engines must drop the cell/codebook entry
    idx80 = emb.index[emb["vec_id"] == 80]
    if len(idx80):
        # NaN-ELEMENT vector (one failed dimension, value NaN not NULL):
        # probed CONSISTENT cross-engine through parquet — NaN propagates
        # through both engines' folds (DuckDB list_aggregate does NOT skip
        # NaN the way it skips NULL), NaN >= τ is true and NaN sorts first
        # under DESC in both — so unlike the NULL-element and ragged shapes
        # this one stays VALID under the contract; the mutation pins that
        # lockstep mechanically. (A pandas->duckdb REGISTER call nullifies
        # NaN — parquet, the only path the gates use, preserves it.)
        v = list(emb.at[idx80[0], "embedding"])
        v[5] = np.float32("nan")
        emb.at[idx80[0], "embedding"] = np.asarray(v, dtype=np.float32)
    emb.to_parquet(os.path.join(dst, "embeddings.parquet"), index=False)

    ev = pd.read_parquet(os.path.join(dst, "events.parquet"))
    # empty-string event_type: forms its own funnel/path/markov group and
    # contributes a zero-length initial to path strings on both engines
    ev.loc[ev["event_id"] % 16 == 13, "event_type"] = ""
    ev.to_parquet(os.path.join(dst, "events.parquet"), index=False)


def main() -> None:
    run_sweep(
        build_degenerate_corpus, "degenerate_sweep_", "DEGENERATE",
        repeat_3x=REPEAT_3X,
    )


if __name__ == "__main__":
    main()
