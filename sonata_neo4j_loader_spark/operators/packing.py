"""Sequence packing: assign documents to fixed-token-budget training bins.

The LM-training primitive between cleaning and tokenization: documents,
taken in a deterministic global order, are concatenated into training
sequences ("bins") of ``budget`` tokens. The semantics implemented is
boundary-overflow greedy packing — a document belongs to the bin where
its starting offset falls (``bin = floor(exclusive_prefix_sum /
budget)``), so a bin may overrun the budget by at most one document's
tail (the common "pack then chunk" layout; padding-free). The whole
operator reduces to one GLOBAL EXCLUSIVE PREFIX SUM over the ordered
corpus, which is the interesting distributed part:

* the naive formulation — ``sum().over(Window.orderBy(key))`` — plans a
  single-partition window: the entire corpus funnels through ONE reducer.
  Correct at fixture scale, fatal at 10^12 docs;
* :func:`packed_documents` instead uses the classic two-phase scan:
  range-repartition by the order key (contiguous key ranges, one
  partition each), window-sum INSIDE each partition (balanced shuffle),
  and add per-partition offsets computed from the partition totals — a
  dimension-sized frame (one row per partition) aggregated once and
  broadcast back. Total cost: the range shuffle + one map-side-combined
  agg over P rows; no stage sees more than one partition's rows.

Determinism: the prefix sum depends only on the global ordering by
``order_col`` (ties impossible — unique key required), NOT on where the
sampled range boundaries land, so the output is identical at any
parallelism. The range-partitioned frame is persisted for the duration of
the two passes because ``repartitionByRange`` SAMPLES boundaries per
action — two un-cached actions could see different partitionings, and the
offset join would mix them (offsets are keyed by physical partition id).

No counterpart in the reference (single-process pandas never needs a
distributed scan ≙ data_extraction.py loads whole frames); oracle: ANSI
window ``SUM ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_partitions: int | None = None,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Global exclusive prefix sum of ``value_col`` in ``order_col`` order.

    Scale path (see module docstring): range partition → per-partition
    window → broadcast per-partition offsets. ``order_col`` must be
    unique (it defines the total order). Returns the input columns plus
    ``out_col``; the returned frame holds a persist() on an intermediate —
    call :func:`unpersist_prefix_scan` (or let the session end) when done.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persist: BOTH downstream jobs (offsets agg + final projection) must
    # see the SAME sampled range boundaries; recomputation could resample
    ranged = ranged.persist()
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_ptotal"))
    # one row per partition — a single-partition window here is fine
    # (dimension-sized), unlike a corpus-wide one
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0)).alias("_poffset")
    )
    in_w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (
                F.sum(value_col).over(in_w) - F.col(value_col) + F.col("_poffset")
            ).cast("bigint"),
        )
        .drop("_pid", "_poffset")
    )
    # stash the PERSISTED ancestor's handle: Dataset.unpersist only drops a
    # cache entry whose plan matches the handle it is called on, so calling
    # it on the derived frame would be a silent no-op — the caller (or
    # :func:`unpersist_prefix_scan`) must release `ranged` itself
    out._prefix_scan_cache = ranged
    return out


def unpersist_prefix_scan(df: DataFrame) -> None:
    """Release the persist taken by :func:`exclusive_prefix_sum`.

    Accepts the frame returned by :func:`exclusive_prefix_sum` or
    :func:`packed_documents` (the persisted ancestor rides on it as
    ``_prefix_scan_cache``). Safe to call more than once."""
    cached = getattr(df, "_prefix_scan_cache", None)
    if cached is not None:
        try:
            cached.unpersist()
        except Exception:
            pass


def packed_documents(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each doc a training bin: ``(…, bin_id, bin_offset)``.

    ``bin_id = floor(prefix/budget)`` (boundary-overflow greedy packing in
    ``order_col`` order), ``bin_offset = prefix % budget`` — the doc's
    start position inside its bin. Documents longer than the budget get a
    bin of their own plus overflow (chunking long docs is the tokenizer's
    job downstream). ``budget`` must be positive.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    with_prefix = exclusive_prefix_sum(
        docs, order_col, token_col, num_partitions, out_col="_prefix"
    )
    out = with_prefix.select(
        *docs.columns,
        F.floor(F.col("_prefix") / budget).cast("bigint").alias("bin_id"),
        F.pmod(F.col("_prefix"), F.lit(budget)).cast("bigint").alias("bin_offset"),
    )
    out._prefix_scan_cache = with_prefix._prefix_scan_cache
    return out
