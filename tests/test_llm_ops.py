"""UDF-surface equivalence: the pandas_udf quality scorer must agree with the
pure-expression version (same formula, different execution path)."""

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.text import (
    quality_features,
    quality_score_pandas_udf,
)
from crystal_parquet_database_spark.tables import load_table

STOPWORDS = ["the", "a", "key", "value", "of", "and"]


def test_pandas_udf_matches_expression_scorer(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    expr = quality_features(docs, "text", STOPWORDS).select("doc_id", "quality_score")
    udf = quality_score_pandas_udf(docs, "text", STOPWORDS).select(
        "doc_id", F.col("quality_score_udf").alias("quality_score")
    )
    a = {r["doc_id"]: r["quality_score"] for r in expr.collect()}
    b = {r["doc_id"]: r["quality_score"] for r in udf.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
