"""Per-population frame union under dynamic schemas.

The reference concatenates one pandas DataFrame per SONATA population
(``pd.concat(nodes_df_list, ignore_index=True)`` —
``circuit/data_extraction.py:73``, same for edges ``:176-177``) where each
population may carry a different attribute set (the HDF5 schema is
discovered at read time, ``data_extraction.py:52-55``); pandas NaN-fills
the gaps. The Spark equivalent needs two explicit steps (SURVEY.md §2.7 and
§7.4):

* ``unionByName(allowMissingColumns=True)`` — positional union would pair
  wrong columns, plain ``unionByName`` would throw on the schema drift;
* float32 → float64 widening BEFORE the union — mixed float/double columns
  otherwise widen implicitly per-branch and golden comparisons stop being
  byte-stable across population orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def union_population_frames(frames: list[DataFrame]) -> DataFrame:
    """Union per-population frames with null-fill for missing attributes.

    Column set of the result = union of all input columns (first-seen
    order); float columns are widened to double first so the result type
    does not depend on which population happens to come first.
    """
    if not frames:
        raise ValueError("no population frames to union")
    widened = []
    for f in frames:
        for field in f.schema.fields:
            if isinstance(field.dataType, T.FloatType):
                f = f.withColumn(field.name, F.col(field.name).cast("double"))
        widened.append(f)
    out = widened[0]
    for f in widened[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
