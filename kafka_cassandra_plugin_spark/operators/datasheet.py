"""Corpus datasheet: the per-(source, lang) documentation table every
dataset release ships (Gebru et al. 2021, "Datasheets for Datasets";
the composition tables in the Pile / RedPajama / Dolma reports).

One groupBy over the corpus — composition counts, token mass, exact
length quantiles, and the exact-duplicate rate in a single aggregate
pass:

- ``n_docs`` / ``total_tokens`` / ``mean_tokens`` / ``mean_chars`` —
  plain distributive aggregates.
- ``median_tokens`` / ``p90_tokens`` — Spark's EXACT ``percentile``
  (linear interpolation), deliberately NOT ``percentile_approx``: the
  approximate sketch is engine-specific and would break the DuckDB
  oracle (``quantile_cont`` interpolates identically), and a
  datasheet is computed once per release — the exact aggregate's
  per-group sort is the right trade.  At 100 TB the group count is
  tiny (sources x languages) and the per-group state is the value
  list; for corpora where that is too much state, swap
  ``percentile_approx`` in and drop the oracle — the documented
  trade.
- ``dup_frac`` — 1 - distinct(md5(text))/n, the exact-duplicate rate
  (count-distinct rewrites into the same shuffle's expand).

Scale shape: ONE hash shuffle on the grouping key; every metric rides
the same aggregate.  No driver loop, no second pass.

Reference provenance: no counterpart in /root/reference (string KV
layer); LLM-pipeline closure (SURVEY §2.5 D29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count

__all__ = ["corpus_datasheet"]


def corpus_datasheet(docs: DataFrame,
                     by: tuple[str, ...] = ("source", "lang"),
                     text_col: str = "text") -> DataFrame:
    """The composition table: one row per ``by`` group with counts,
    token mass, exact length quantiles, and the exact-dup rate, plus
    each group's ``token_share`` of the corpus (a driver-free window
    over the aggregated rows — group-count-sized, not corpus-sized)."""
    n_tok = token_count(text_col)
    agg = (
        docs.select(*by, n_tok.alias("__nt"),
                    F.length(F.col(text_col)).alias("__nc"),
                    F.md5(F.col(text_col)).alias("__fp"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.avg("__nt").alias("mean_tokens"),
            F.expr("percentile(__nt, 0.5)").alias("median_tokens"),
            F.expr("percentile(__nt, 0.9)").alias("p90_tokens"),
            F.avg("__nc").alias("mean_chars"),
            F.countDistinct("__fp").alias("__n_distinct"),
        )
    )
    total = F.sum("total_tokens").over(Window.partitionBy())
    return agg.select(
        *by, "n_docs", "total_tokens",
        F.col("mean_tokens"),
        F.col("median_tokens"),
        F.col("p90_tokens"),
        F.col("mean_chars"),
        (F.lit(1.0) - F.col("__n_distinct") / F.col("n_docs"))
        .alias("dup_frac"),
        (F.col("total_tokens") / total).alias("token_share"),
    )
