#!/usr/bin/env python3
"""Unicode/adversarial-text sweep: rebuild the sf0.001 fixtures with the
text shapes a real multilingual scrape contains — CJK, Arabic (RTL), emoji
(incl. multi-codepoint ZWJ sequences), combining marks, Turkish dotted
capital I, German sharp-s, full-width digits, NBSP / zero-width space /
control characters, astral-plane letters — then run EVERY oracle-paired
query through the hash-exact Spark-vs-DuckDB comparison.

The shipped fixtures are pure-ASCII, so the whole class of cross-engine
string-semantics divergences is invisible to every other gate: Java regex
vs RE2 character classes (\\s, \\w, case-insensitive matching), Java
String.toLowerCase vs utf8proc case mapping ('İ'→'i̇' is 1→2 code points),
length() counting code points vs grapheme assumptions, tokenizers
splitting on NBSP or not, and hive-partition escaping of non-ASCII
partition values (some documents get lang='中文', which the layout gate
writes as a partition DIRECTORY and must round-trip exactly).

Any hash mismatch is a real divergence both engines will disagree on over
a real multilingual corpus.

Usage: python3 scripts/unicode_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lib import SRC, run_sweep

# Each entry keeps some ASCII vocabulary so tokenized operators (BM25,
# TF-IDF, n-grams, decontamination) still share terms with the rest of the
# corpus, with the adversarial content woven in.
UNICODE_TEXTS = [
    "the fast café naïve résumé façade jalapeño über straße table scan",
    "中文文本处理 spark 引擎 查询 计划 中文文本处理 window batch stream",
    "مرحبا بالعالم هذا نص عربي تجريبي hash join order sort merge scan",
    "שלום עולם טקסט עברי לבדיקה window sort table merge part scan",
    "emoji test 🚀 rocket 🧑‍🧑‍🧒‍🧒 family 👍🏽 thumbs ☃ snowman table scan join",
    "combining á é ò marks vs precomposed á é ò table scan",
    "turkish İstanbul DİYARBAKIR dotted I and dotless ı batch stream merge",
    "german GROSSE STRASSE große straße sharp s casing hash join scan",
    "fullwidth １２３４５ digits and ＡＢＣ letters vs 12345 ABC table scan",
    "nbsp separated words and zero​width​space joined scan",
    "tab\tand\nnewline\rand\x0bvertical controls inside one doc table scan",
    "astral 𝕊𝕡𝕒𝕣𝕜 𝔻𝕒𝕥𝕒 plane letters and 🂡 playing card table scan join",
    "mixed Ω≈ç√∫˜µ≤ operators ¿question? ¡bang! «guillemets» table scan",
    "ligatures ﬁle ﬂow oﬃce vs file flow office dedup shingle scan",
]


def build_unicode_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)

    docs = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    n = len(UNICODE_TEXTS)
    # overwrite one doc in ~every 8 with an adversarial body (spread across
    # the id range so samples/chunks/strata all see some), keep n_chars
    # honest (code-point length, matching the fixture's convention)
    targets = [i for i in docs.index if docs.loc[i, "doc_id"] % 8 == 3]
    for j, i in enumerate(targets):
        t = UNICODE_TEXTS[j % n]
        docs.loc[i, "text"] = t
        docs.loc[i, "n_chars"] = len(t)
    # non-ASCII partition values: the layout gate hive-partitions by lang
    # and must round-trip these through directory names; samplers stratify
    # on them; DuckDB groups on the same raw bytes
    docs.loc[docs["doc_id"] % 16 == 5, "lang"] = "中文"
    docs.loc[docs["doc_id"] % 16 == 9, "lang"] = "es-MX"
    docs.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    ev = pd.read_parquet(os.path.join(dst, "events.parquet"))
    # event_type flows through funnels/sessionize/regex-path matching
    ev.loc[ev["event_id"] % 16 == 7, "event_type"] = "蝴蝶"
    ev.loc[ev["event_id"] % 16 == 11, "event_type"] = "käuf"
    ev.to_parquet(os.path.join(dst, "events.parquet"), index=False)


def main() -> None:
    run_sweep(build_unicode_corpus, 'unicode_sweep_', 'UNICODE')


if __name__ == "__main__":
    main()
