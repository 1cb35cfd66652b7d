"""Scaling-curve micro-bench: time representative operators at
sf0.001 / sf0.01 / sf0.1 (100x input growth), plus an sf1 decade for the
iterative family (BPE, pagerank, connected components, k-means, PCA).

The 100 TB argument needs more than one point: a plan that holds scales
near-linearly in input rows once fixed job overhead (~0.1-0.3 s/job on
local[32]) is subtracted; a plan that degrades super-linearly has a
shuffle or driver choke growing faster than the data. The driver-facing
JSON records per-SF wall time and the large-SF throughput so rounds can
compare.

The driver ships testdata up to sf0.1 only; the sf1 decade is the
repo-local `_scaledata/sf1/` synthesized by scripts/gen_sf_scale.py
(10x key-shifted replication of sf0.1, referential integrity preserved).
The iterative ops are the reason the decade exists -- their claim is
"one exchange per iteration", which the 0.001-0.1 range cannot separate
from the local[32] per-job floor -- but every op rides along. If
`_scaledata/sf1` is absent the sf1 column is skipped and a note recorded.

Usage: python scripts/bench_scaling.py [tag]  (writes BENCH_scaling_<tag>.json, default r08)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.registry import QUERIES, query_map  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["0.001", "0.01", "0.1"]
SF_DIRS = {sf: f"/root/testdata/sf{sf}" for sf in SFS}
SF_DIRS["1"] = os.path.join(REPO, "_scaledata", "sf1")

# one per plan family: scan+agg, window, shingle exchange, iterative,
# broadcast-model scoring, map-only
OPS = [
    ("q1_pricing_summary", "lineitem"),
    ("events_rolling_zscore", "events"),
    ("dedup_substring_spans", "documents"),
    ("sim_kmeans_lloyd", "embeddings"),
    ("sample_importance_dsir", "documents"),
    ("text_chunk_overlap", "documents"),
    # iterative: min-label propagation, one pk-keyed shuffle per round +
    # a scalar convergence check — separates per-iteration scheduling
    # overhead from data cost on the curve
    ("dedup_cluster_components", "documents"),
    # round 6: Gram-free power iteration (row-keyed + dim-keyed reduces)
    ("sim_pca_power_iteration", "embeddings"),
    # round 6: sweep-line window partitioned on (type, day) — no global sort
    ("events_concurrency_sweep", "events"),
    # round 7: the remaining iterative-family members get the sf1 decade
    ("text_bpe_learn_merges", "documents"),
    ("graph_pagerank_nations", "lineitem"),
    # round 7 additions: skyline (bin-prune + candidate-only exact check —
    # the curve shows the all-pairs stage NOT growing with the corpus),
    # distributed top-k ranking, baseline-broadcast anomaly scoring, and
    # the Q-fold batched retrieval scan
    ("sample_pareto_frontier", "documents"),
    ("text_zipf_fit", "documents"),
    ("events_seasonal_anomaly", "events"),
    ("sim_cosine_topk_batch", "embeddings"),
    # round 8: the flagship pruned pipelines get the decade — their 100 TB
    # story rests on bucket-cap / nprobe pruning, measured below (the LSH
    # one additionally gets a candidate-pair/bucket-size audit per sf)
    ("dedup_minhash_lsh", "documents"),
    ("sim_ann_ivf", "embeddings"),
]

# Every op gets the sf1 decade when the synthesized data exists — the
# iterative family is the one whose claim ("one exchange per iteration")
# NEEDS it, but scan/window/shingle plans ride along for free.
SF1_OPS = {name for name, _t in OPS}


def main() -> None:
    spark = get_spark(app_name="bench_scaling")
    query_map()
    have_sf1 = os.path.isdir(SF_DIRS["1"])
    rows_at = {}

    def count_rows(sf: str, table: str) -> int:
        key = (sf, table)
        if key not in rows_at:
            rows_at[key] = spark.read.parquet(
                f"{SF_DIRS[sf]}/{table}.parquet"
            ).count()
        return rows_at[key]

    out = {"sfs": SFS, "sf1_available": have_sf1, "ops": {}}
    if not have_sf1:
        out["note"] = "run scripts/gen_sf_scale.py to enable the sf1 decade"
    for name, table in OPS:
        spec = QUERIES[name]
        sfs = list(SFS) + (["1"] if have_sf1 and name in SF1_OPS else [])
        entry = {"driver_table": table, "times_sec": {}, "rows": {}}
        for sf in sfs:
            sf_dir = SF_DIRS[sf]
            # warm once, median of 3
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            entry["times_sec"][sf] = round(statistics.median(ts), 4)
            entry["rows"][sf] = count_rows(sf, table)
        big, small = entry["times_sec"]["0.1"], entry["times_sec"]["0.001"]
        growth_rows = entry["rows"]["0.1"] / max(entry["rows"]["0.001"], 1)
        entry["time_ratio_100x_rows"] = round(big / small, 2)
        entry["rows_growth"] = round(growth_rows, 1)
        entry["throughput_rows_per_sec_sf01"] = int(entry["rows"]["0.1"] / big)
        if "1" in entry["times_sec"]:
            # the decade that matters: 10x rows beyond the local floor
            entry["time_ratio_sf1_over_sf01"] = round(
                entry["times_sec"]["1"] / entry["times_sec"]["0.1"], 2
            )
            entry["throughput_rows_per_sec_sf1"] = int(
                entry["rows"]["1"] / entry["times_sec"]["1"]
            )
        out["ops"][name] = entry
        print(f"{name}: {entry['times_sec']}", flush=True)

    # LSH candidate-growth audit: the MAX_BUCKET_SIZE cap is the guard
    # against the N² degenerate-bucket blow-up; this measures, per sf,
    # the candidate-pair count and the bucket-size distribution, proving
    # candidates grow ~linearly in corpus size (constant candidates/doc)
    # instead of quadratically. The uncapped pair bound shows what the
    # cap is saving.
    out["lsh_candidate_audit"] = {}
    for sf in SFS + (["1"] if have_sf1 else []):
        audit = lsh_audit(spark, SF_DIRS[sf])
        out["lsh_candidate_audit"][sf] = audit
        print(f"lsh_audit sf{sf}: {audit}", flush=True)

    # IVF probe-pruning audit: measured fraction of the corpus the
    # nprobe'd query actually scans (claim: ~nprobe/K at every scale)
    out["ivf_probe_audit"] = {}
    for sf in SFS + (["1"] if have_sf1 else []):
        audit = ivf_audit(spark, SF_DIRS[sf])
        out["ivf_probe_audit"][sf] = audit
        print(f"ivf_audit sf{sf}: {audit}", flush=True)

    print(json.dumps(out, indent=1))
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    with open(os.path.join(REPO, f"BENCH_scaling_{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1)


def lsh_audit(spark, sf_dir: str) -> dict:
    """Candidate-pair count + band-bucket size distribution for the
    MinHash-LSH pipeline at one scale factor."""
    from pyspark.sql import functions as F

    from driftdb_spark.catalog import load_tables
    from driftdb_spark.functions.dedup import (
        MAX_BUCKET_SIZE,
        _band_buckets,
        hashed_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = load_tables(spark, sf_dir)["documents"]
    sh = hashed_shingles(d).select("doc_id", "hshingles").persist()
    n_docs = sh.count()
    sigs = minhash_signatures(sh, shingle_col="hshingles")
    t0 = time.perf_counter()
    n_pairs = lsh_candidate_pairs(sigs).count()
    pair_wall = time.perf_counter() - t0
    dist = (
        _band_buckets(sigs, "doc_id")
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_sz"),
            F.round(F.mean("sz"), 3).alias("mean_sz"),
            F.expr("percentile(sz, 0.99)").alias("p99_sz"),
            F.sum(F.expr("CAST(sz AS BIGINT) * (sz - 1) / 2")).alias(
                "pairs_uncapped_bound"
            ),
            F.count(F.when(F.col("sz") > MAX_BUCKET_SIZE, 1)).alias(
                "buckets_over_cap"
            ),
            F.sum(
                F.when(F.col("sz") > MAX_BUCKET_SIZE, F.col("sz")).otherwise(0)
            ).alias("memberships_dropped"),
        )
        .collect()[0]
        .asDict()
    )
    sh.unpersist()
    return {
        "n_docs": n_docs,
        "candidate_pairs": n_pairs,
        "candidates_per_doc": round(n_pairs / max(n_docs, 1), 3),
        "candidate_count_wall_sec": round(pair_wall, 3),
        **{k: (float(v) if v is not None else None) for k, v in dist.items()},
    }




def ivf_audit(spark, sf_dir: str) -> dict:
    """Measured IVF probe pruning at one scale factor: how much of the
    corpus the nprobe'd query actually scans. The 100 TB claim is that a
    probe reads ~nprobe/K of the data (partition pruning once lists are
    the partition key); this turns that from construction into evidence."""
    from pyspark.sql import functions as F

    from driftdb_spark.catalog import load_tables
    from driftdb_spark.functions.similarity import (
        K_LISTS,
        N_PROBE,
        ivf_assign,
        ivf_centroid_row,
        ivf_probe_explode,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    n_vecs = emb.count()
    assigned = ivf_assign(emb, ivf_centroid_row(emb)).persist()
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
    qrow = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"),
        F.col("enrm").alias("qnrm"),
        F.col("cents").alias("qcents"),
    )
    probes = qrow.select(ivf_probe_explode().alias("pcid"))
    scanned = (
        sizes.join(probes, sizes.list_id == probes.pcid)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assigned.unpersist()
    return {
        "n_vecs": n_vecs,
        "k_lists": K_LISTS,
        "n_probe": N_PROBE,
        "rows_scanned": int(scanned),
        "scan_fraction": round(scanned / n_vecs, 4),
        "nprobe_over_k": round(N_PROBE / K_LISTS, 4),
    }


if __name__ == "__main__":
    main()
