"""Spark-native tokenization & block segmentation.

The reference's per-line tokenizer dispatch (src/tokenizer.ts:76-143)
becomes a JVM-side `when`-cascade over rlike predicates in the exact
dispatch order; the block-segmentation FSM (src/parser.ts:129-159)
becomes a running-sum window; the look-ahead order validation
(src/airspace-factory.ts:239-285) becomes lead() + a broadcast join
against the 21-row adjacency table; the inventory validation
(:293-333) becomes collect_set + array_except. All JVM-side: the only
Python in the pipeline is the geometry kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import tokenizer as tk

# (token_type, java_regex) in reference dispatch order; None = blank test
DISPATCH = [
    (tk.COMMENT, r"^\*.*$"),
    (tk.SKIPPED, r"^(AT|TO|TC|SP|SB|V Z=\d).*$"),
    (tk.BLANK, None),
    (tk.AC, r"^AC\s+.*$"),
    (tk.AN, r"^AN\s+.*$"),
    (tk.AH, r"^AH\s+.*$"),
    (tk.AL, r"^AL\s+.*$"),
    (tk.DP, r"^DP\s+.*$"),
    (tk.VD, r"^V\s+D=[+-]$"),
    (tk.VX, r"^V\s+X=.*$"),
    (tk.VW, r"^V\s+W=.*$"),
    (tk.DC, r"^DC\s+.*$"),
    (tk.DB, r"^DB\s+.*$"),
    (tk.DA, r"^DA\s+([+-]?\d*(\.\d+)?),\s*([+-]?\d*(\.\d+)?),\s*([+-]?\d*(\.\d+)?)$"),
    (tk.DY, r"^DY\s+.*$"),
    (tk.AY, r"^AY\s+.*$"),
    (tk.AF, r"^AF\s+.*$"),
    (tk.AG, r"^AG\s+.*$"),
    (tk.AX, r"^AX\s+.*$"),
    (tk.AA, r"^AA\s+.*$"),
]

UNKNOWN = "UNKNOWN"

IGNORED = list(tk.IGNORED_TYPES)


def classify_column(line: Column) -> Column:
    """First-match-wins `when` cascade in reference dispatch order."""
    expr = None
    for token_type, pattern in DISPATCH:
        cond = (F.length(line) == 0) if pattern is None else line.rlike(pattern)
        expr = F.when(cond, F.lit(token_type)) if expr is None else expr.when(cond, F.lit(token_type))
    return expr.otherwise(F.lit(UNKNOWN))


def lines_df(extracted: DataFrame) -> DataFrame:
    """(url, openair_text) -> one row per trimmed line with 1-based line_no."""
    return (
        extracted
        .select(
            "url",
            F.posexplode(F.split("openair_text", r"\r?\n")).alias("idx", "raw_line"),
        )
        .select(
            "url",
            (F.col("idx") + 1).alias("line_no"),
            F.trim(F.col("raw_line")).alias("line"),
        )
    )


def tokens_df(extracted: DataFrame) -> DataFrame:
    """Classified token stream: url, line_no, line, token_type, ignored."""
    lines = lines_df(extracted)
    ttype = classify_column(F.col("line"))
    return lines.select(
        "url", "line_no", "line",
        ttype.alias("token_type"),
        ttype.isin(IGNORED).alias("ignored"),
    )


def blocks_df(tokens: DataFrame) -> DataFrame:
    """Block segmentation as a running-sum window: block_id = cumulative
    count of AC markers per url in line order, over the non-ignored
    stream — the Spark-native replacement for the reference FSM."""
    w = Window.partitionBy("url").orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    non_ignored = tokens.where(~F.col("ignored") & (F.col("token_type") != UNKNOWN))
    return non_ignored.withColumn(
        "block_id", F.sum(F.when(F.col("token_type") == tk.AC, 1).otherwise(0)).over(w)
    )


def adjacency_df(spark: SparkSession, version: str) -> DataFrame:
    """21-row x allowed-next broadcast table (reference getAllowedNextTokens)."""
    allowed = tk.allowed_next(version)
    rows = [(cur, nxt) for cur, nxts in allowed.items() for nxt in nxts]
    return spark.createDataFrame(rows, "token_type string, allowed_next string")


def order_violations(blocks: DataFrame, version: str) -> DataFrame:
    """Spark-native V2 (token-order validation): lead() the next
    non-ignored token within each block and left-anti broadcast-join
    against the adjacency table; survivors are violations.

    The ignored tokens are already absent from `blocks`, matching the
    reference's skip-ignored lookahead semantics.
    """
    spark = blocks.sparkSession
    w = Window.partitionBy("url", "block_id").orderBy("line_no")
    with_next = blocks.select(
        "url", "block_id", "line_no", "token_type",
        F.lead("token_type").over(w).alias("next_type"),
        F.lead("line_no").over(w).alias("next_line_no"),
    ).where(F.col("next_type").isNotNull())
    adjacency = adjacency_df(spark, version)
    return with_next.join(
        F.broadcast(adjacency),
        (with_next.token_type == adjacency.token_type)
        & (with_next.next_type == adjacency.allowed_next),
        "left_anti",
    )


def inventory_violations(blocks: DataFrame, version: str) -> DataFrame:
    """Spark-native V3 (required-token inventory): collect_set per block,
    array_except against the required set."""
    required = [tk.AC, tk.AN, tk.AL, tk.AH]
    if version == "2.0":
        required.append(tk.AY)
    agg = blocks.groupBy("url", "block_id").agg(
        F.collect_set("token_type").alias("present"),
        F.min("line_no").alias("block_start_line"),
    )
    missing = F.array_except(F.array(*[F.lit(t) for t in required]), F.col("present"))
    return (
        agg.select("url", "block_id", "block_start_line",
                   F.array_sort(missing).alias("missing_tokens"))
        .where(F.size("missing_tokens") > 0)
    )
