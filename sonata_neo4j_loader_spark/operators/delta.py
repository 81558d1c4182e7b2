"""Snapshot delta: CDC-style diff between two corpus versions.

Engine addition beyond the reference: the reference reloads its graph
from scratch per circuit (``scripts/load_circuit.py`` truncates, then
bulk-inserts); a pipeline that refreshes a 10^12-document corpus cannot.
The diff operator computes exactly which rows changed between two
snapshots so downstream stages (re-extraction, re-linking, sink MERGE)
touch only the delta — the batch complement of the streaming
incremental path (``streaming/incremental.py``).

Scale posture: ONE full-outer shuffle join keyed on the (unique,
high-cardinality, naturally balanced) row id; change detection compares
a caller-supplied fingerprint column, so the wide payload never has to
be carried — diff a ``(id, fingerprint)`` projection of each snapshot
and the exchange moves two narrow columns per side. Unchanged rows are
dropped BEFORE the operator returns, so the output is delta-sized, not
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change labels, in output order: present only in new / only in old /
#: in both with differing fingerprints
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """``(id, change, old_fingerprint, new_fingerprint)`` for every row
    that differs between the two snapshots; identical rows are absent.

    ``id_col`` must uniquely key each snapshot (the usual CDC contract);
    the operator does not deduplicate.
    """
    o = old.select(
        F.col(id_col), F.col(fingerprint_col).alias("old_fingerprint")
    )
    n = new.select(
        F.col(id_col), F.col(fingerprint_col).alias("new_fingerprint")
    )
    joined = o.join(n, id_col, "full_outer")
    return joined.select(
        id_col,
        F.when(F.col("old_fingerprint").isNull(), ADDED)
        .when(F.col("new_fingerprint").isNull(), REMOVED)
        .otherwise(CHANGED)
        .alias("change"),
        "old_fingerprint",
        "new_fingerprint",
    ).where(
        F.col("old_fingerprint").isNull()
        | F.col("new_fingerprint").isNull()
        | (F.col("old_fingerprint") != F.col("new_fingerprint"))
    )
