"""Property-based tests (hypothesis) for the pieces whose correctness is a
mathematical contract: portable hashing parity and permissive type promotion."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crystal_parquet_database_spark.functions.portable_hash import (
    P,
    spark_hash64,
    sql_hash64,
)
from crystal_parquet_database_spark.schema import promote_type


def py_hash64(s: str) -> int:
    """Pure-Python oracle for the portable hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


printable = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), min_size=0, max_size=50
)


@settings(max_examples=200, deadline=None)
@given(printable)
def test_duckdb_hash_matches_python(s: str):
    got = duckdb.sql(f"SELECT {sql_hash64('?')}".replace("?", f"'{s}'")).fetchone()[0]
    assert got == py_hash64(s)


def test_spark_hash_matches_python(spark):
    import random

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghij XYZ0123") for _ in range(rng.randint(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], schema="s string")
    got = {r["s"]: r["h"] for r in df.select("s", spark_hash64(F.col("s")).alias("h")).collect()}
    for w in words:
        assert got[w] == py_hash64(w)


atomic_types = st.sampled_from(
    [
        T.IntegerType(),
        T.LongType(),
        T.DoubleType(),
        T.FloatType(),
        T.StringType(),
        T.BooleanType(),
        T.NullType(),
    ]
)


def struct_types(depth: int = 2):
    if depth == 0:
        return atomic_types
    inner = struct_types(depth - 1)
    return st.one_of(
        atomic_types,
        st.builds(T.ArrayType, inner),
        st.builds(
            lambda fields: T.StructType(
                [T.StructField(f"f{i}", t) for i, t in enumerate(fields)]
            ),
            st.lists(inner, min_size=1, max_size=3),
        ),
    )


@settings(max_examples=200, deadline=None)
@given(struct_types())
def test_promote_idempotent(t):
    assert promote_type(t, t) == t


@settings(max_examples=200, deadline=None)
@given(struct_types(), struct_types())
def test_promote_total_and_null_absorbing(a, b):
    """Total except SHAPE conflicts, which must raise a clear ValueError
    (round-7 review: falling back to the left used to send create() into an
    invalid Spark cast that died deep inside AnalysisException) — raising is
    part of the contract, so the property asserts exactly when it happens."""
    import pytest

    def shape(t):
        if isinstance(t, T.StructType):
            return "struct"
        if isinstance(t, T.ArrayType):
            return "array"
        return "scalar"

    def has_conflict(x, y) -> bool:
        if isinstance(x, T.NullType) or isinstance(y, T.NullType) or x == y:
            return False
        if isinstance(x, T.StructType) and isinstance(y, T.StructType):
            y_by = {f.name: f.dataType for f in y.fields}
            return any(
                has_conflict(f.dataType, y_by[f.name]) for f in x.fields if f.name in y_by
            )
        if isinstance(x, T.ArrayType) and isinstance(y, T.ArrayType):
            return has_conflict(x.elementType, y.elementType)
        return shape(x) != shape(y)

    if has_conflict(a, b):
        with pytest.raises(ValueError, match="cannot unify"):
            promote_type(a, b)
        return
    m = promote_type(a, b)
    assert m is not None
    assert promote_type(T.NullType(), a) == a
    assert promote_type(a, T.NullType()) == a
    # promotion never loses struct fields
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        assert {f.name for f in a.fields} | {f.name for f in b.fields} == {
            f.name for f in m.fields
        }


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from([T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()]), min_size=2, max_size=2))
def test_promote_numeric_widens(ts):
    a, b = ts
    m = promote_type(a, b)
    ints = {"integer", "long"}
    if (a.typeName() in ints) != (b.typeName() in ints):
        # int×float mixes promote to DOUBLE (Arrow-permissive): picking
        # float over long by rank would corrupt integers above 2^24
        assert m.typeName() == "double"
    else:
        rank = {"integer": 0, "long": 1, "float": 2, "double": 3}
        assert rank[m.typeName()] == max(rank[a.typeName()], rank[b.typeName()])


def _py_morton(xs: list[int], bits: int) -> int:
    """Pure-Python Morton interleave oracle (MSB-first, dims in order)."""
    z = 0
    for bit in range(bits - 1, -1, -1):
        for x in xs:
            z = (z << 1) | ((x >> bit) & 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    """zorder_key's bit interleave equals the reference Morton code for the
    scaled bucket values (recomputed in Python from the same min/max grid)."""
    import random

    from crystal_parquet_database_spark.operators.skew import zorder_key

    rng = random.Random(3)
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    keyed, col = zorder_key(df, ["x", "y"], bits_per_dim=8)
    got = {r["id"]: r[col] for r in keyed.collect()}

    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    for i, x, y in rows:
        import math

        bx = min(255, math.floor((x - mnx) / ((mxx - mnx) or 1.0) * 256))
        by = min(255, math.floor((y - mny) / ((mxy - mny) or 1.0) * 256))
        assert got[i] == _py_morton([bx, by], 8), (i, x, y)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", min_codepoint=33, max_codepoint=126), min_size=1, max_size=12), min_size=1, max_size=20))
def test_classifier_weight_formula_portable(tokens):
    """The hashed-classifier weight is engine-independent: DuckDB evaluates
    the same integer weight as the Python oracle for arbitrary tokens."""
    from crystal_parquet_database_spark.operators.text import (
        CLF_DIM, CLF_MOD, CLF_MULT, CLF_OFF,
    )

    for t in {tok for tok in tokens if "'" not in tok}:
        b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        want = (b % CLF_DIM) * CLF_MULT % CLF_MOD - CLF_OFF
        got = duckdb.sql(
            f"SELECT (('0x' || substr(md5('{t}'), 1, 4))::BIGINT % {CLF_DIM})"
            f" * {CLF_MULT} % {CLF_MOD} - {CLF_OFF}"
        ).fetchone()[0]
        assert got == want, t


def test_cms_overcount_invariant_random_streams(spark):
    """Mathematical CMS contract on random token streams: for EVERY item,
    the estimate is >= the exact count (one-sided error, no exceptions)."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish stream: low-index words dominate
    docs = [
        (i, " ".join(rng.choice(vocab[: 1 + rng.randint(0, 39)]) for _ in range(30)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from crystal_parquet_database_spark.functions.portable_hash import spark_hash64

    W_, D_ = 64, 4  # tiny width -> collisions guaranteed -> bound must hold
    tok = df.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
    exact = tok.groupBy("term").agg(F.count("*").alias("exact_n"))
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (spark_hash64(F.concat(F.lit(f"{i}#"), F.col("term"))) % W_).alias(
                    "bucket"
                ),
            )
            for i in range(D_)
        ]
    )
    sk = (
        tok.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.row_i").alias("row_i"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    probes = exact.select("term", "exact_n", F.explode(entries).alias("e")).select(
        "term", "exact_n", F.col("e.row_i").alias("row_i"), F.col("e.bucket").alias("bucket")
    )
    est = (
        probes.join(sk, ["row_i", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .collect()
    )
    assert est and all(r["cms_est"] >= r["exact_n"] for r in est)
    # with w=64 and hundreds of distinct tokens, at least one real collision
    assert any(r["cms_est"] > r["exact_n"] for r in est)


def test_bm25_single_term_matches_python_oracle(spark):
    """BM25 single-term scores against a pure-Python recomputation —
    component formula, ranking, and tie-breaks all exact."""
    import random

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(40)
    ]
    from crystal_parquet_database_spark.operators.text import bm25_topk

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, "text", "doc_id", {"q": ["alpha"]}, top_k=40).collect()
    }
    # python oracle
    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / N
    tf = {i: v.count("alpha") for i, v in toks.items() if "alpha" in v}
    dfreq = len(tf)
    idf = (N - dfreq + 0.5) / (dfreq + 0.5)
    for i, f in tf.items():
        dl = len(toks[i])
        want = idf * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        assert got[i] == want  # bit-exact, same expression shape
    assert set(got) == set(tf)
