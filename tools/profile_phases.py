"""Dev tool: per-phase wall times of the KG pipeline at one parallelism level.

Usage: python tools/profile_phases.py --cpus 32 --corpus /tmp/kg_scaling_corpus_600000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sonata_neo4j_loader_spark.datagen import documents as dg  # noqa: E402
from sonata_neo4j_loader_spark.operators import linking, mentions, parse  # noqa: E402
from sonata_neo4j_loader_spark.plans import pipeline  # noqa: E402
from sonata_neo4j_loader_spark.session import get_spark  # noqa: E402

KG_GEN = dict(n_populations=8, neurons_per_pop=1000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--corpus", required=True)
    args = ap.parse_args()

    spark = get_spark(
        app_name="profile", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    entities = dg.synthetic_entities(spark, **KG_GEN)
    aliases = dg.synthetic_alias_edges(spark, **KG_GEN)
    docs = spark.read.parquet(args.corpus)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def full():
        out = pipeline.build_triples(spark, docs, entities, aliases)
        noop(pipeline.all_plain_triples(out))
        return out

    full()  # warmup
    spark.catalog.clearCache()

    def t(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"[{args.cpus:2d}] {label:34s} {time.perf_counter() - t0:7.2f}s", flush=True)
        return r

    # isolated primitives (no persist interaction)
    parsed = parse.parse_documents(docs).where(F.col("spans_valid"))
    t("scan+parse", lambda: noop(parsed))
    m = mentions.detect_mentions(parsed)
    t("scan+parse+mentions", lambda: noop(m))
    s = mentions.detect_synapses(parsed)
    t("scan+parse+synapses", lambda: noop(s))
    t("  +link (broadcast)", lambda: noop(linking.link_mentions(m, entities)))

    # build DAG cost (driver + CC local)
    t0 = time.perf_counter()
    out = pipeline.build_triples(spark, docs, entities, aliases)
    print(f"[{args.cpus:2d}] {'build_triples (driver+CC)':34s} {time.perf_counter() - t0:7.2f}s")
    t("single action: all_plain noop", lambda: noop(pipeline.all_plain_triples(out)))
    t("  aggs after cache", lambda: [noop(a) for a in out["aggregate_triples"]])
    spark.catalog.clearCache()
    t("fresh full run", full)
    spark.stop()


if __name__ == "__main__":
    main()
