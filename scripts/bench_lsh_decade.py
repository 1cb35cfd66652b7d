"""Fifth decade for the LSH candidate-growth curve: 500 K documents.

bench_scaling's audit proves candidates/doc stays flat from 500 → 50 K
docs; this pushes one more decade (×100 over the driver's sf0.1 corpus)
using the same construction as gen_sf_scale.py — replica texts perturbed
token-wise so the synthetic corpus keeps a constant dup rate instead of
manufacturing quadratic twin pairs. Only the documents table is
synthesized (the audit touches nothing else; catalog.load_tables skips
missing tables).

Merges the result into BENCH_scaling_r08.json under
``lsh_candidate_audit["10"]``.

Usage: python scripts/bench_lsh_decade.py [factor]   (default 100)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from driftdb_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "_scaledata", "docs_sf10")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="bench_lsh_decade")
    out = os.path.join(DST, "documents.parquet")
    if not os.path.exists(out):
        src = spark.read.parquet(f"{SRC}/documents.parquet")
        shift = src.agg(F.max("doc_id")).collect()[0][0] + 1
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from gen_sf_scale import perturb_replica_text

        replicas = []
        for r in range(factor):
            df = src.withColumn("doc_id", F.col("doc_id") + F.lit(r * shift))
            replicas.append(perturb_replica_text(df, r))
        big = replicas[0]
        for df in replicas[1:]:
            big = big.unionByName(df)
        os.makedirs(DST, exist_ok=True)
        big.repartition(32).write.parquet(out)
        print(f"synthesized {spark.read.parquet(out).count()} docs", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scaling import lsh_audit

    audit = lsh_audit(spark, DST)
    print(json.dumps(audit))
    path = os.path.join(REPO, "BENCH_scaling_r08.json")
    doc = json.load(open(path))
    doc.setdefault("lsh_candidate_audit", {})["10"] = audit
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
