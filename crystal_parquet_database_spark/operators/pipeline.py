"""Composable training-data pipeline: the end-to-end shape a 100 TB corpus
actually runs — dedup → quality filter → language filter → sample → write —
as one lazy DataFrame chain over the engine's operators.

Each step stays declarative (one Catalyst plan end to end, optimized as a
whole), so filters commute down to the scan and nothing materializes between
steps — with three exceptions that EXECUTE at step-construction time
because their operators materialize internally: ``dedup_near`` and
``decontaminate`` (shingle-hash + localCheckpoint over the CURRENT frame)
and ``with_packing`` (the prefix sum). Order those AFTER the cheap
narrowing filters, not before. ``describe()`` reports per-step row counts
for auditability (each count is an action — use on samples, not on the
full corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crystal_parquet_database_spark.functions.portable_hash import spark_hash64
from crystal_parquet_database_spark.operators import dedup as D
from crystal_parquet_database_spark.operators import text as T


def _mixture_threshold(rate: float, mod: int) -> int:
    """Keep-bucket threshold for a mixture rate, rounded HALF-UP.

    Not ``int()``: binary-float error truncates exact rates one bucket low
    (0.29 * 10000 == 2899.999... -> 2899). Not ``round()``: banker's
    rounding sends an exact .5 product (0.00025 * 10000 == 2.5) to the
    EVEN neighbor 2, i.e. down. And the product is snapped to 6 decimals
    first: float error can land just BELOW .5 too (0.00015 * 10000 ==
    1.4999999999999998), where a bare +0.5 truncates the same way."""
    return int(round(rate * mod, 6) + 0.5)


class TrainingDataPipeline:
    """Fluent pipeline over a documents frame (id + text columns)."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col
        self.steps: list[str] = ["source"]
        self._frames: list[DataFrame] = [df]

    def _push(self, name: str, df: DataFrame) -> "TrainingDataPipeline":
        self.df = df
        self.steps.append(name)
        self._frames.append(df)
        return self

    # ------------------------------------------------------------------ steps

    def dedup_exact(self) -> "TrainingDataPipeline":
        """Drop exact duplicates, keeping the lowest id per content digest."""
        marks = D.exact_dedup(self.df, self.text_col, self.id_col)
        keep = marks.filter(~F.col("is_dup")).select(self.id_col)
        return self._push("dedup_exact", self.df.join(keep, self.id_col, "left_semi"))

    def dedup_near(
        self, threshold: float = 0.8, n_hashes: int = 32, n_bands: int = 8
    ) -> "TrainingDataPipeline":
        """Drop near-duplicates via MinHash+LSH: from every verified pair the
        higher id is removed (transitively keeps one representative per
        connected pair chain's minimum).

        NB: executes EAGERLY at construction (the LSH operator materializes
        its shingle index) — order after the narrowing filters."""
        pairs = D.minhash_lsh_dedup(
            self.df, self.text_col, self.id_col,
            threshold=threshold, n_hashes=n_hashes, n_bands=n_bands,
        )
        losers = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        return self._push(
            f"dedup_near(j>={threshold})",
            self.df.join(losers, self.id_col, "left_anti"),
        )

    def filter_quality(
        self, min_score: float = 0.3, stopwords: list[str] | None = None
    ) -> "TrainingDataPipeline":
        # `is None`, not `or`: an explicit empty list means "score without
        # stopwords" and must not be silently replaced by the default
        sw = ["the", "a", "of", "and", "key", "value"] if stopwords is None else stopwords
        scored = T.quality_features(self.df, self.text_col, sw)
        kept = scored.filter(F.col("quality_score") >= min_score).drop(
            "n_words", "stopword_ratio", "punct_ratio", "quality_score"
        )
        return self._push(f"quality>={min_score}", kept)

    def filter_language(self, langs: list[str]) -> "TrainingDataPipeline":
        pred = T.language_id(self.df, self.text_col)
        kept = pred.filter(F.col("lang_pred").isin(langs)).drop(
            *[f"score_{lang}" for lang in T.LANG_ORDER], "lang_pred"
        )
        return self._push(f"lang in {langs}", kept)

    def filter_length(self, min_tokens: int = 5, max_tokens: int = 100_000) -> "TrainingDataPipeline":
        n = F.size(T.ws_tokens(F.col(self.text_col)))
        return self._push(
            f"len in [{min_tokens},{max_tokens}]",
            self.df.filter((n >= min_tokens) & (n <= max_tokens)),
        )

    def sample_fraction(self, keep_percent: int) -> "TrainingDataPipeline":
        """Deterministic hash-based sampling (stable across engines/retries —
        never rand()). ``keep_percent`` is an integer PERCENT in [0, 100];
        a fraction like 0.1 would silently keep ~1% instead of 10%, so
        sub-1 values are rejected loudly."""
        if 0 < keep_percent < 1:
            raise ValueError(
                f"keep_percent={keep_percent} looks like a FRACTION; pass an "
                f"integer percent (did you mean {int(keep_percent * 100)}?)"
            )
        h = spark_hash64(F.col(self.id_col).cast("string")) % 100
        return self._push(f"sample {keep_percent}%", self.df.filter(h < keep_percent))

    def with_token_counts(self) -> "TrainingDataPipeline":
        return self._push("token_counts", T.token_counts(self.df, self.text_col))

    def decontaminate(self, eval_set: DataFrame, k: int = 3) -> "TrainingDataPipeline":
        """Drop documents sharing any word k-gram with the evaluation set
        (see operators/text.ngram_decontaminate — eval grams broadcast).

        NB: executes EAGERLY at construction (the decontaminator
        materializes the probe) — order after the narrowing filters."""
        flags = T.ngram_decontaminate(self.df, eval_set, self.text_col, self.id_col, k=k)
        clean = flags.filter(~F.col("contaminated")).select(self.id_col)
        return self._push("decontaminate", self.df.join(clean, self.id_col, "left_semi"))

    def mixture(self, rates: dict[str, float], lang_col: str = "lang") -> "TrainingDataPipeline":
        """Per-language keep rates by deterministic hash (data-mixing
        weights); languages absent from ``rates`` are kept in full."""
        mod = 10_000
        h = spark_hash64(F.concat(F.lit("mix:"), F.col(self.id_col).cast("string"))) % mod
        rate = None
        for lang, r in rates.items():
            cond = F.col(lang_col) == lang
            thr = F.lit(_mixture_threshold(r, mod))
            rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
        rate = F.lit(mod) if rate is None else rate.otherwise(F.lit(mod))
        return self._push(f"mixture {rates}", self.df.filter(h < rate))

    def with_split(self) -> "TrainingDataPipeline":
        """Append a deterministic 80/10/10 train/val/test split column."""
        h = spark_hash64(F.concat(F.lit("split:"), F.col(self.id_col).cast("string"))) % 10
        split = F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
        return self._push("split", self.df.withColumn("split", split))

    def with_packing(self, capacity: int = 512) -> "TrainingDataPipeline":
        """Assign each doc its context-window bin (see text.pack_sequences).
        NB: the prefix sum executes eagerly (localCheckpoint inside)."""
        bins = T.pack_sequences(self.df, self.text_col, self.id_col, capacity)
        return self._push(
            f"pack(cap={capacity})",
            self.df.join(bins.select(self.id_col, "bin_id", "bin_offset"), self.id_col),
        )

    # ---------------------------------------------------------------- outputs

    def write(self, path: str, partition_by: list[str] | None = None, **kwargs) -> None:
        from crystal_parquet_database_spark.sources.io import write_table

        write_table(self.df, path, partition_by=partition_by, **kwargs)

    def describe(self) -> list[tuple[str, int]]:
        """(step, surviving rows) per step — counts execute the chain."""
        return [(name, frame.count()) for name, frame in zip(self.steps, self._frames)]
