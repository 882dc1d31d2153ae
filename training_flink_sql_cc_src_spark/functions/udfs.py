"""UDF / UDAF / UDTF surface (SURVEY.md §2.8).

The reference ships no UDFs (the course's Confluent Cloud tier did not
support them), so this is the Spark-native surface our engine exposes for
the [C] extensions, in the recommended cost order:

1. built-in expressions (everything else in this repo — always first),
2. Arrow-batched ``pandas_udf`` scalar functions (~10-100× row-Python),
3. ``applyInPandas`` grouped-map for per-group logic,
4. ``explode``/``posexplode`` as the UDTF analog.

Pattern reference: SNIPPETS.md §[1]-[2] (public PySpark pandas_udf docs
examples). Scale notes: every UDF here is Arrow-batched; grouped-map
shuffles once on the group key and holds one group per batch in memory —
fine for bounded groups (labels, langs), wrong for unbounded keys (use
window functions instead; see queries/analytic.py).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _entropy_series(text: pd.Series) -> pd.Series:
    def ent(s: str) -> float:
        if not s:
            return 0.0
        counts: dict[str, int] = {}
        for ch in s:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(s)
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return text.map(ent)


def char_entropy(col):
    """Scalar pandas UDF: Shannon entropy (bits/char) of each string —
    a quality signal built-ins cannot express (per-row histogram).

    Constructed at call time (not import time): pandas_udf registration
    needs an active SparkSession.
    """
    return pandas_udf(_entropy_series, "double")(col)


def zscore_grouped(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score of ``value_col``.

    Sorts each group by its first column before computing so the float
    reduction order is deterministic run-to-run. One shuffle on the group
    key; each group materializes as a single Arrow batch.
    """
    id_col = df.columns[0]
    out_schema = f"{id_col} long, {group_col} string, {value_col} double, zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=0)
        z = (pdf[value_col] - mu) / sd if sd > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


def tokenize_udtf(df: DataFrame, text_col: str, out: str = "token") -> DataFrame:
    """UDTF analog (Flink's table functions): one output row per token via
    posexplode — stays entirely JVM-side."""
    return df.select(
        *df.columns,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", out),
    )


def _median_series(v: pd.Series) -> float:
    return float(v.median())


def median_udaf(col):
    """Grouped-AGGREGATE pandas UDF (the UDAF leg of SURVEY.md §2.8): a
    whole pandas Series per group reduces to one scalar, Arrow-batched.
    Median of whole-number doubles is exact (midpoint of two integers),
    so unlike most float UDAFs this one is oracle-pairable.
    """
    # Series -> scalar type hints make this a grouped-agg UDF
    return pandas_udf(_median_series, "double")(col)
