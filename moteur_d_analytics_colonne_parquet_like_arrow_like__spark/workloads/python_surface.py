"""Python extension surface (§2.11) on the correctness gate: UDTF,
grouped-map applyInPandas, and scalar pandas_udf — the three sanctioned
Python entry points, each verified against a pure-SQL oracle.

Design rule for oracle-checkability: the Python stages do exact integer
math or fixed-order float accumulation, so their results are bit-identical
to the SQL twin — proving the Arrow plumbing transports values losslessly,
not just approximately.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints here

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators import text as text_ops
from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_py_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL: tokenize each document into (term, pos)
    rows, then aggregate per doc. The UDTF is the row-expanding Python
    extension point; the oracle re-tokenizes in SQL."""
    text_ops.register_tokenize_udtf(spark)
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT t.term) AS n_terms,
               MAX(t.pos) AS max_pos
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    )


def q_py_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-nation account-balance deviation in
    integer cents (n·x − Σx — exact integer math, so the pandas stage is
    bit-checkable against the SQL window twin)."""
    supplier = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("cents"),
    )

    out_schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_nationkey", T.LongType(), False),
            T.StructField("dev_cents", T.LongType(), False),
        ]
    )

    def dev(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        total = int(pdf["cents"].sum())
        return pd.DataFrame(
            {
                "s_suppkey": pdf["s_suppkey"],
                "s_nationkey": pdf["s_nationkey"],
                "dev_cents": n * pdf["cents"].astype("int64") - total,
            }
        )

    return (
        supplier.groupBy("s_nationkey")
        .applyInPandas(dev, schema=out_schema)
        .orderBy("s_suppkey")
    )


def q_py_vectorized_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched): palindrome dot product of each
    embedding with its own reverse, accumulated SEQUENTIALLY in float64 to
    match the SQL fold order, rounded to 6 digits like the cosine ops."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def rev_dot(vecs: pd.Series) -> pd.Series:
        def one(v) -> float:
            acc = 0.0
            n = len(v)
            for i in range(n):
                acc += float(v[i]) * float(v[n - 1 - i])
            return acc

        return vecs.map(one)

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(rev_dot("embedding"), 6).alias("rev_dot_r")
    ).orderBy("vec_id")


QUERIES = {
    "py_udtf_tokens": q_py_udtf_tokens,
    "py_grouped_map": q_py_grouped_map,
    "py_vectorized_dot": q_py_vectorized_dot,
}

ORACLES = {
    "py_udtf_tokens": """
        WITH toks AS (
            SELECT doc_id,
                   t.term,
                   t.pos - 1 AS pos
            FROM (
                SELECT doc_id,
                       string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS words
                FROM documents WHERE doc_id < 100
            ) d,
            LATERAL (
                SELECT unnest(d.words) AS term,
                       generate_subscripts(d.words, 1) AS pos
            ) t
            WHERE t.term <> ''
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               COUNT(DISTINCT term) AS n_terms,
               MAX(pos) AS max_pos
        FROM toks GROUP BY doc_id ORDER BY doc_id
    """,
    "py_grouped_map": """
        WITH c AS (
            SELECT s_suppkey, s_nationkey,
                   CAST(round(s_acctbal * 100) AS BIGINT) AS cents
            FROM supplier
        )
        SELECT s_suppkey, s_nationkey,
               CAST(COUNT(*) OVER w * cents - SUM(cents) OVER w AS BIGINT) AS dev_cents
        FROM c
        WINDOW w AS (PARTITION BY s_nationkey)
        ORDER BY s_suppkey
    """,
    "py_vectorized_dot": """
        SELECT vec_id,
               round(list_reduce(
                   list_transform(generate_series(1, len(embedding)),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)),
                   (x, y) -> x + y), 6) AS rev_dot_r
        FROM embeddings
        ORDER BY vec_id
    """,
}
