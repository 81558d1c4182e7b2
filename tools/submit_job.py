"""spark-submit entry point: documents corpus -> materialized triple tables.

The production launch mode the north rule mandates::

    spark-submit --master <cluster> \
        --py-files dist/sonata_neo4j_loader_spark.zip \
        tools/submit_job.py --corpus <parquet dir> --output <table root>

Unlike the reference's ``main.py`` (which only runs as a script from inside
``src/sonata_to_neo4j/`` due to non-package-relative imports — SURVEY.md
§3.1 note), this driver imports the engine strictly through the shipped
package, so the same file works on any executor/cluster.

``--fixture`` swaps the corpus for the built-in deterministic fixture
circuit (reference pytest fixture semantics) — used by the packaging
smoke test.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from sonata_neo4j_loader_spark.datagen import documents as dg
from sonata_neo4j_loader_spark.plans import pipeline


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="parquet documents dir (doc_id, spans)")
    ap.add_argument("--fixture", action="store_true", help="use built-in fixture corpus")
    ap.add_argument("--output", required=True, help="root dir for materialized tables")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--node-proportion", type=float, default=1.0)
    ap.add_argument("--edge-proportion", type=float, default=1.0)
    ap.add_argument("--node-set", default=None, help="comma-separated population names")
    args = ap.parse_args()

    # spark-submit owns master/deploy config; we only add app-level conf
    spark = (
        SparkSession.builder.appName("sonata-kg-construct")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    if args.fixture:
        docs = dg.fixture_documents(spark)
        entities = dg.fixture_entities(spark)
        aliases = dg.fixture_alias_edges(spark)
    else:
        docs = spark.read.parquet(args.corpus)
        entities = dg.synthetic_entities(spark)
        aliases = dg.synthetic_alias_edges(spark)

    cfg = pipeline.PipelineConfig(
        node_proportion=args.node_proportion,
        edge_proportion=args.edge_proportion,
        node_set_pops=args.node_set.split(",") if args.node_set else None,
    )
    out = pipeline.build_triples(spark, docs, entities, aliases, cfg)
    reports = pipeline.materialize_outputs(out, args.output, num_buckets=args.buckets)
    print(
        json.dumps(
            {
                name: {
                    "rows_written": r.rows_written,
                    "partitions_written": len(r.partitions_written),
                    "partitions_skipped": len(r.partitions_skipped),
                }
                for name, r in reports.items()
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
