"""Deduplication operators over the ``documents`` table.

Exact dedup is a hash-groupBy (one shuffle on the content hash — fully
SQL-expressible, oracle-checked). Near-dup detection is MinHash + LSH:
shingle → per-permutation min-hash signature → band buckets → bucket-join
for candidate pairs — the standard scale recipe (band join replaces the
O(n²) pairwise comparison; at 100 TB only co-bucketed docs ever meet).

Hashes are Spark's xxhash64 (deterministic across runs/partitions), which
DuckDB lacks — so the MinHash/SimHash entries are registered without an
oracle and the driver records a rows-only check; the Jaccard verification
math itself is tested in pytest against a NumPy reimplementation.

No Python UDFs anywhere: signatures are built with ``transform`` /
``array_min`` higher-order functions over the shingle array, entirely
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from driftdb_spark.catalog import load_tables
from driftdb_spark.registry import register

N_PERMS = 32
BAND_SIZE = 4
N_BANDS = N_PERMS // BAND_SIZE  # 8
SHINGLE_WORDS = 3


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.groupBy(F.md5(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_id"),
    )


@register(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) t
    WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself (window LWW on the content hash)."""
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir)["documents"]
    w = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


def _shingles(text: F.Column) -> F.Column:
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    return F.expr(
        f"""
        array_distinct(
          transform(
            sequence(0, greatest(size(split(text, ' ')) - {SHINGLE_WORDS}, 0)),
            i -> concat_ws(' ', slice(split(text, ' '), i + 1, {SHINGLE_WORDS}))
          )
        )
        """
    )


HASHED_SHINGLES_EXPR = f"""
    CASE WHEN size(th) >= {SHINGLE_WORDS} THEN
      array_distinct(transform(
        sequence(0, size(th) - {SHINGLE_WORDS}),
        i -> pmod(th[i] * 1048573 + th[i + 1] * 8191 + th[i + 2], 4294967291)))
    ELSE array()
    END
"""


def hashed_shingles(docs: DataFrame) -> DataFrame:
    """Add an ``hshingles`` array<long> column: distinct word n-gram shingles
    as 32-bit hashes. Tokens are xxhash64'd once; a shingle hash combines
    the n consecutive token hashes arithmetically — no per-shingle string
    building (the string-concat shingle pipeline costs ~3× this one).
    The CASE guards ANSI out-of-bounds indexing on short docs."""
    return docs.withColumn(
        "th", F.expr("transform(split(text, ' '), t -> xxhash64(t) & 4294967295)")
    ).withColumn("hshingles", F.expr(HASHED_SHINGLES_EXPR)).drop("th")


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", shingle_col: str | None = None
) -> DataFrame:
    """(id, sig array<long>) — MinHash signature per document.

    A single narrow map stage — no explode, no shuffle. Design for scale:

    - tokens are hashed ONCE (xxhash64 → 32 bits); shingle hashes combine
      consecutive token hashes arithmetically; the permutation family is
      universal hashing (a_j * h + b_j mod p). Zero string building after
      tokenization.
    - the whole signature is ONE fold over the shingle-hash array updating
      all N_PERMS minima per step, so the heavy work appears exactly once in
      the expression tree — Catalyst's projection collapse cannot duplicate
      it (per-permutation columns get the pipeline inlined N_PERMS times).
    - all products stay < 2^57, so ANSI overflow checking never fires.

    Pass ``shingle_col`` (array<long> hashed shingles) to reuse a
    materialized shingle column.
    """
    p = 2_147_483_647  # 2^31 - 1
    # One fold over the shingle hashes, all N_PERMS minima per step — but
    # the per-step accumulator update is a flat unrolled array constructor
    # with the permutation constants a_j·h + b_j PRE-FOLDED in Python
    # (the fold lambda is interpreted, so the nested
    # zip_with(acc, sequence(...)) paid a sequence+zip allocation plus 32
    # inner lambda invocations and 64 constant multiplications per
    # shingle). Values are identical (same a_j, b_j, same pmod).
    # A/B at sf0.1: dedup_minhash_lsh 2.49 → 1.72 s (0.69×).
    step = ", ".join(
        f"least(acc[{j}], pmod(h * {1000003 * j + 12345}L"
        f" + {999983 * j + 7919}L, {p}))"
        for j in range(N_PERMS)
    )
    sig = F.expr(
        f"""
        aggregate(
          hshingles,
          array_repeat(CAST({p} AS BIGINT), {N_PERMS}),
          (acc, h) -> array({step}))
        """
    )
    if shingle_col is None:
        docs = hashed_shingles(docs)
    else:
        docs = docs.withColumn("hshingles", F.col(shingle_col))
    return docs.select(F.col(id_col), sig.alias("sig"))


MAX_BUCKET_SIZE = 200


def _band_buckets(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band, bh): one row per document per band bucket.

    r14: the bucket key hashes the 4 slice elements DIRECTLY
    (multi-argument xxhash64) instead of hashing their ','-joined string —
    bh is join/window-internal (no registered query outputs it), so only
    its equality semantics matter, and those are unchanged: equal slices
    hash equal, differing slices differ w.h.p. exactly as before. The
    per-band long→string casts, the string concat, and the string-hash
    pass disappear; the key stays 8 bytes on the shuffle."""
    slots = ", ".join(
        f"element_at(sig, b * {BAND_SIZE} + {i + 1})" for i in range(BAND_SIZE)
    )
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64({slots}) AS bh))"
            )
        ).alias("band"),
    ).select(id_col, F.col("band.band").alias("band"), F.col("band.bh").alias("bh"))


def lsh_oversized_buckets(
    sigs: DataFrame, id_col: str = "doc_id", max_bucket_size: int = MAX_BUCKET_SIZE
) -> DataFrame:
    """Audit frame: the band buckets the candidate join will DROP, with
    their member counts. A huge bucket means a degenerate band (boilerplate
    text hashing identically for thousands of docs) — its members are
    near-identical to each other anyway and are far better handled by
    exact dedup than by an O(bucket²) pair explosion."""
    return (
        _band_buckets(sigs, id_col)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Band the signatures and self-join buckets → candidate pairs (a < b).

    The signature frame feeds BOTH sides of the join — materialize it once
    (persist) or every candidate probe recomputes the shingle+hash pipeline
    twice. At corpus scale you'd write signatures to storage bucketed by
    band hash; persist is the in-session equivalent.

    Degenerate buckets are capped: a windowed count over (band, bh) tags
    each membership row with its bucket size, and buckets larger than
    ``max_bucket_size`` are excluded from BOTH join sides. Without the cap
    one boilerplate-heavy bucket (N docs sharing a band) contributes N²/2
    candidate pairs — the classic LSH skew blow-up at corpus scale. The
    windowed count shuffles on the same (band, bh) keys the self-join
    needs, so the cap rides the shuffle the join was going to do anyway.
    Use :func:`lsh_oversized_buckets` to audit what was dropped.
    """
    from pyspark.sql.window import Window as W

    sigs = sigs.persist()
    bands = _band_buckets(sigs, id_col)
    w = W.partitionBy("band", "bh")
    capped = (
        bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


@register("dedup_minhash_lsh", oracle=None, tags=("dedup", "no-oracle"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified with exact Jaccard
    over shingle sets and filtered at 0.5 — the full near-dedup pipeline.
    Deterministic (xxhash64), but not DuckDB-expressible → rows-only check."""
    d = load_tables(spark, sf_dir)["documents"]
    # Hashed shingles feed the signature stage AND both sides of the Jaccard
    # verify join — materialize them once (eagerly: the band self-join and
    # the verify both fan out from this frame, and a lazy persist would race
    # both branches through the uncached pipeline in a single job).
    sh = hashed_shingles(d).select("doc_id", "hshingles").persist()
    sh.count()
    sigs = minhash_signatures(sh, shingle_col="hshingles")
    pairs = lsh_candidate_pairs(sigs)

    a = sh.select(F.col("doc_id").alias("id_a"), F.col("hshingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("hshingles").alias("sh_b"))
    verified = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 25
        ) d
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared) >= 0.05
    """,
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity via an inverted-index join (explode
    shingles → equi-join on shingle → |A∩B| / (|A|+|B|-|A∩B|)). Bounded to a
    doc_id<25 slice so the oracle's pairwise join stays tractable; the
    unbounded scale path is dedup_minhash_lsh."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 25)
    sh = d.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.05)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _simhash_fold_expr(hash_sql: str, bits: int) -> F.Column:
    """Row-local SimHash (r13): per-bit ±1 majority vote folded over the
    token array in ONE pass, then the sign bits assembled — the
    minhash_signatures all-minima-in-one-fold trick applied to the
    majority vote. Replaces the token explode + per-doc aggregate with
    ``bits`` conditional sums (and its exchange) with a narrow map
    stage; values are identical (same ±1 per (token, bit), same
    count>0 assembly). ``hash_sql`` maps token ``t`` to the BIGINT base
    hash (xxhash64 for the performance twin, md5-derived for the
    oracle-portable twin)."""
    counts = (
        f"aggregate(transform(split(text, ' '), t -> {hash_sql}), "
        f"array_repeat(0L, {bits}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {bits - 1}), "
        f"(c, b) -> c + IF((shiftright(h, b) & 1) = 1, 1, -1)))"
    )
    return F.expr(
        f"aggregate(zip_with({counts}, sequence(0, {bits - 1}), "
        f"(c, b) -> IF(c > 0, shiftleft(1L, b), 0L)), 0L, (a, e) -> a + e)"
    ).cast("long")


@register("dedup_simhash", oracle=None, tags=("dedup", "no-oracle"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per document: per-bit majority vote over token hashes,
    folded row-locally (see _simhash_fold_expr — previously one token
    explode + 64 conditional aggregations). Deterministic xxhash64 →
    rows-only check (no DuckDB equivalent). Bit 63 kept clear to stay
    positive — a 63-bit fingerprint is ample."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id", _simhash_fold_expr("xxhash64(t)", 63).alias("simhash")
    )


from driftdb_spark.registry import QUERIES as _QUERIES  # noqa: E402

_NGRAM_PAIRS_ORACLE = _QUERIES["dedup_ngram_jaccard"].oracle


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, q.r FROM edges e JOIN reach q ON e.dst = q.node
    )
    SELECT node AS doc_id, MIN(r) AS component
    FROM reach
    GROUP BY node
    """,
    tags=("dedup",),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the verified near-dup
    pair graph, labeling every member with the cluster's minimum doc_id —
    the step that turns pairwise similarity into "keep one canonical doc
    per cluster". Iterative min-label propagation: each round is one
    shuffle (join + groupBy-min) and the round count is the graph
    DIAMETER, not the node count — near-dup graphs are dense little
    cliques, so this converges in 2-3 rounds regardless of corpus size.
    The driver-side loop only checks a scalar convergence count, mirroring
    ``cte_recursive_walk``; the oracle is the same fixpoint as a recursive
    CTE transitive closure (viable for DuckDB at test scale only)."""
    pairs = _QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).select("id_a", "id_b")
    fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # Measured-small coalesce (r14, guide §2.2 — recursive_cte's pattern
    # extended here per the r13 scaling finding: 8 cores BEAT 32 by 5× on
    # this query because every propagation round re-read the KB-sized
    # cached edge list at its natural partitioning and shuffled at
    # spark.sql.shuffle.partitions — dozens of scheduling-only tasks per
    # round). The count() materializes the cache eagerly (previously paid
    # lazily inside round 1) and gates a coalesce(1) — a narrow no-shuffle
    # read of the cached blocks, so each round's join scans one task.
    # Gated on the MEASURED count: a genuinely large dup graph keeps its
    # natural partitioning, so the heuristic is inert at 100 TB.
    from driftdb_spark.operators.recursive import SMALL_FRONTIER_ROWS

    edges_cached = edges
    small = edges.count() <= SMALL_FRONTIER_ROWS
    if small:
        edges = edges_cached.coalesce(1)
    labels_cached = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    # |labels| ≤ 2·|edges| (one node per edge endpoint), so the edge gate
    # covers the label frames too — including every round's new_labels
    # below, whose node set never grows past this one. unpersist() must
    # target the PERSISTED frame, not the coalesced wrapper, so both
    # references are kept.
    labels = labels_cached.coalesce(1) if small else labels_cached
    # Convergence signal: labels are per-node minima, so propagation is
    # monotone non-increasing — the label SUM strictly decreases until the
    # fixpoint. One scalar aggregate per round both materializes the new
    # labels into the cache and detects convergence (the old
    # count-then-compare-join needed two actions and an extra join).
    # NOTE (r13): batching two propagation rounds per driver probe (the
    # recursive_cte batch= trick) was tried and measured SLOWER here
    # (interleaved in-session A/B at sf0.1: 1.3-1.5 s single vs
    # 1.7-2.2 s batched): near-dup graphs converge in 2-3 rounds, so the
    # overshot extra rounds cost more than the one saved probe. Batching
    # only pays on deep recursions (cte_recursive_walk's 26 steps).
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(20):
        propagated = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_cached = (
            labels.unionByName(propagated).groupBy("node").agg(F.min("label").alias("label"))
        ).persist()
        cur_sum = new_cached.agg(F.sum("label")).first()[0]
        labels_cached.unpersist()
        labels_cached = new_cached
        labels = new_cached.coalesce(1) if small else new_cached
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges_cached.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


# -- portable (cross-engine bit-exact) MinHash/SimHash twins ------------------
#
# The performance pipeline above keys on xxhash64 (the right choice at scale:
# one JVM-side 64-bit hash, no string building). xxhash64 has no DuckDB
# equivalent, so those entries are rows-only checks. These twins re-derive
# every hash from md5 — lowercase hex text is identical on both engines, and
# CAST('0x'||hex AS BIGINT) / conv(hex,16,10) parse it to identical BIGINTs —
# which makes the ENTIRE MinHash → banding → candidate-join → Jaccard-verify
# pipeline and the SimHash fingerprint fully DuckDB-oracle-checkable,
# value-for-value. Same algorithm, same constants (N_PERMS=32 permutations
# from the same universal-hash family, 8 bands x 4), different base hash.

_PORTABLE_P = 2_147_483_647  # permutation modulus (2^31 - 1)

# Spark: md5 hex -> 60-bit bigint -> low 32 bits (keeps every permutation
# product under 2^57, so ANSI overflow checking never fires — same bound as
# the xxhash64 pipeline).
_H32_SPARK = (
    "cast(conv(substr(md5({col}), 1, 15), 16, 10) as bigint) & 4294967295"
)
_H32_DUCK = "CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT) & 4294967295"

# Shingle derivation shared with dedup_ngram_jaccard's oracle: distinct
# 3-token shingles. (DuckDB lists are 1-indexed.)
_DUCK_SHINGLES = """
    SELECT DISTINCT doc_id,
           UNNEST(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
"""

# The portable MinHash -> banding construction, shared by every md5-keyed
# pipeline (full dedup, recall audit, incremental): ONE definition keeps
# the oracle-verified twins value-for-value identical — a constant or
# hash tweak applied to one copy would silently break parity in the rest.
_PORTABLE_BANDS_SQL = f"""hashed AS (
        SELECT doc_id, {_H32_DUCK.format(col="shingle")} AS h32 FROM sh
    ),
    sig AS (
        SELECT doc_id, j.j,
               MIN((h32 * (1000003 * j.j + 12345) + (999983 * j.j + 7919))
                   % {_PORTABLE_P}) AS mh
        FROM hashed, (SELECT UNNEST(range(0, {N_PERMS})) AS j) j
        GROUP BY doc_id, j.j
    ),
    bands AS (
        SELECT doc_id, j / {BAND_SIZE} AS band,
               md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS bkey
        FROM sig GROUP BY doc_id, j / {BAND_SIZE}
    )"""


def _portable_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) from an exploded (doc_id, shingle) frame —
    the Spark twin of :data:`_PORTABLE_BANDS_SQL`.

    The 32 permutation minima are FLAT aggregate columns over the shingle
    rows (one codegen'd HashAggregate, map-side partials, one exchange of
    one 32-column row per doc), not an explode ×32 → (doc, j) group →
    (doc, band) regroup: that shape pushed |shingles|×32 rows through a
    Generate and paid a second exchange plus a collect_list
    ObjectHashAggregate. h32 is still computed ONCE per shingle row: it
    is an attribute from the child projection, and CollapseProject never
    inlines a non-cheap alias consumed 32 times. Band keys then derive
    row-locally (md5 over the 4-slice, j ascending — the same ','-joined
    string the grouped array_sort built), and the only Generate left is
    the 8-rows-per-doc band unpack. A/B at sf0.1: incremental-vs-corpus
    0.86×, full portable pipeline 0.95×; plan: 2 exchanges + ×32
    Generate → 1 exchange + ×8 Generate."""
    hashed = sh.select(
        "doc_id", F.expr(_H32_SPARK.format(col="shingle")).alias("h32")
    )
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(
                    f"(h32 * (1000003 * {j} + 12345) + (999983 * {j} + 7919))"
                    f" % {_PORTABLE_P}"
                )
            ).alias(f"m{j}")
            for j in range(N_PERMS)
        ]
    )
    # r14 (judge ask #5): the band key is JOIN-INTERNAL — every consumer
    # uses bkey only for (band, bkey) equality and never outputs it — so
    # re-hashing the ','-joined 4-slice through md5 (4 long→string casts +
    # concat + a digest per band, ×8 bands per doc) bought nothing equality
    # couldn't. The key is now ONE multi-argument xxhash64 over the band's
    # 4 minima (the same scheme _band_buckets uses): equal slices hash
    # equal, differing slices differ w.h.p. exactly as under md5, the
    # digest chain disappears, and the key narrows from a 32-hex-char
    # string to 8 bytes on the shuffle AND in the recall-audit's persisted
    # bands cache (§2.3 narrower types). A first r14 variant keyed bands
    # by the raw 4-minima STRUCT — collision-free, but the audit consumer
    # persists its bands frame and the nested key measured 1.11–1.19×
    # slower from cache (BENCH_query_ab_r14_batch{1,2}.json), so the flat
    # hash is the keeper. Candidate-pair parity with the oracle's
    # md5-keyed formulation holds w.h.p. (identical up to 64-bit hash
    # collisions); oracle value-parity re-verified at sf0.001/0.01/0.1
    # for all three consumers (BENCH_query_ab_r14_batch3.json).
    band_structs = [
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.xxhash64(
                *[F.col(f"m{b * BAND_SIZE + i}") for i in range(BAND_SIZE)]
            ).alias("bkey"),
        )
        for b in range(N_BANDS)
    ]
    return mins.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


@register(
    "dedup_minhash_lsh_portable",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    {_PORTABLE_BANDS_SQL},
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS shared
        FROM pairs p
        JOIN sh a ON a.doc_id = p.id_a
        JOIN sh b ON b.doc_id = p.id_b AND a.shingle = b.shingle
        GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared) >= 0.5
    """,
    tags=("dedup",),
)
def dedup_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash → LSH banding → candidate join → exact-Jaccard
    verify pipeline, value-for-value oracle-checked (the md5-keyed twin of
    ``dedup_minhash_lsh``; reference near-dup capability is BASELINE.json's
    north star, no reference SQL surface).

    Same plan discipline as the performance twin: shingles are hashed once;
    the signature is a (doc, perm) grouped min (one shuffle); band keys are
    md5 digests of the 4-value slices; candidates come from the band-bucket
    self-join, never all pairs; exact Jaccard runs only on candidates."""
    d = load_tables(spark, sf_dir)["documents"]
    sh = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).persist()
    bands = _portable_bands(sh)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        pairs.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


_SIMHASH_BITS = 60  # 15 md5 hex chars


def _simhash_oracle() -> str:
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM tok
    ),
    bits AS (
        SELECT doc_id,
               {bit_sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bits
    """


@register("dedup_simhash_portable", oracle=_simhash_oracle(), tags=("dedup",))
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints, value-for-value oracle-checked — the
    md5-keyed twin of ``dedup_simhash`` (same per-bit majority vote, md5
    base hash both engines compute identically). Plan: one token explode,
    one doc-keyed aggregate with 60 conditional sums — map-side partials
    do the heavy lifting, the exchange carries one row per doc."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).select(
        "doc_id",
        F.expr("cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint)").alias("h"),
    )
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    sim_expr = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim_expr = term if sim_expr is None else sim_expr + term
    return bit_sums.select("doc_id", sim_expr.cast("long").alias("simhash"))


@register(
    "dedup_ngram_containment",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 25
        ) d
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(i.shared AS DOUBLE) / sa.n, 6) AS containment
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    WHERE CAST(i.shared AS DOUBLE) / sa.n >= 0.5
    """,
    tags=("dedup",),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment C(A→B) = |shingles(A) ∩ shingles(B)| / |A| —
    the Broder containment twin of dedup_ngram_jaccard. Jaccard misses the
    quote/subset case (a short document wholly embedded in a long one has
    tiny Jaccard but containment ≈ 1); corpus pipelines gate on BOTH.
    Same inverted-index join shape — one shingle-keyed exchange, pairs
    only where shingles actually collide — but normalized by the SOURCE
    doc alone, so the output is directional (id_a contained-in id_b).
    Bounded to the doc_id<25 oracle slice; the unbounded scale path
    shares dedup_minhash_lsh's band-bucket candidate generation."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 25)
    # no .distinct(): _shingles is array_distinct per doc, so the exploded
    # (doc_id, shingle) pairs are already unique — the old distinct was a
    # full no-op exchange (guide §2.4)
    sh = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    cont = F.col("shared").cast("double") / F.col("na")
    return (
        inter.join(sa, "id_a")
        .filter(cont >= 0.5)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


_DUCK_SHINGLES_SLICE = _DUCK_SHINGLES.replace(
    "FROM documents) d", "FROM documents WHERE doc_id < 60) d"
)


@register(
    "dedup_lsh_recall_audit",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES_SLICE}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    truth AS (
        SELECT i.id_a, i.id_b,
               ROUND(CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared), 6) AS jaccard
        FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared) >= 0.5
    ),
    {_PORTABLE_BANDS_SQL},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT t.id_a, t.id_b, t.jaccard,
           (c.id_a IS NOT NULL) AS caught
    FROM truth t LEFT JOIN cand c
      ON t.id_a = c.id_a AND t.id_b = c.id_b
    """,
    tags=("dedup", "audit"),
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH quality: every ground-truth near-duplicate pair
    (exact Jaccard ≥ 0.5 on the doc_id<60 audit slice) annotated with
    whether the banded-MinHash candidate generation CAUGHT it — the
    dedup counterpart of sim_ann_ivf_recall's measured-recall
    discipline (an approximation you haven't measured is a guess).
    Ground truth needs the all-pairs inverted-index join, which is why
    the audit runs on a bounded slice; the LSH side is the same
    portable pipeline as dedup_minhash_lsh_portable (identical
    constants), so a recall miss here is a real banding miss, not hash
    drift. At 100 TB the audit stays a sampled side-channel while
    production candidates remain bucket-bounded."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 60)
    sh = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    truth = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
    # Persisted EAGERLY: the candidate self-join consumes bands twice, and
    # after the r13 flat-aggregation rewrite each evaluation carries a
    # constant plan/compile overhead that the tiny audit slice cannot
    # amortize — building the ~(60 docs × 8 bands) frame once removes the
    # doubled build that made the audit regress 0.69→1.06 s (batch 4's
    # accepted local price, now refunded). The frame is audit-slice-sized,
    # so the cache is trivially small at any corpus scale.
    bands = _portable_bands(sh).persist()
    bands.count()
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bkey") == F.col("bb.bkey"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("id_a"), F.col("bb.doc_id").alias("id_b")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        truth.join(cand, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.col("_hit").isNotNull().alias("caught"),
        )
    )


@register(
    "dedup_canonical_mapping",
    oracle="""
    WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
    canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM fp GROUP BY fp)
    SELECT f.doc_id, c.canonical_id
    FROM fp f JOIN canon c ON f.fp = c.fp
    WHERE f.doc_id <> c.canonical_id
    """,
    tags=("dedup",),
)
def dedup_canonical_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remap table dedup actually SHIPS: duplicate doc_id →
    canonical (first-seen) doc_id, so downstream references (citations,
    labels, shard manifests) rewrite to survivors instead of dangling.
    One fingerprint aggregation + an equi-join back — the
    dedup_exact_survivors twin from the pointer side; identity rows are
    dropped (the mapping is only the rewrites). At 100 TB the mapping
    is duplicate-count-sized and joins back onto reference tables by
    broadcast or bucketed key."""
    d = load_tables(spark, sf_dir)["documents"]
    fp = d.select("doc_id", F.md5("text").alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    return (
        fp.join(canon, "fp")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


@register(
    "dedup_paragraph_keepfirst",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE n_chars > 0
    ), segs AS (
      SELECT doc_id, (k.k - 1) * 10 + 1 AS seg_start,
             array_to_string(t[(k.k - 1) * 10 + 1 : (k.k - 1) * 10 + 10], ' ') AS seg
      FROM toks, LATERAL (SELECT unnest(generate_series(1, n // 10)) AS k) k
      WHERE n >= 10
    ), ranked AS (
      SELECT doc_id, seg,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_start) AS rn
      FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
           ROUND(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
             AS kept_frac
    FROM ranked GROUP BY doc_id
    """,
    tags=("dedup", "text", "pipeline"),
)
def dedup_paragraph_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level dedup with keep-first semantics
    (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data" — duplicated paragraphs are removed corpus-wide,
    keeping one occurrence): segment each document into consecutive
    10-token blocks, keep a block only where it is the FIRST occurrence
    of that exact text corpus-wide (ordered by doc_id, then position —
    deterministic because the pair is unique), and report per-document
    retention. A doc whose kept_frac collapses toward 0 is boilerplate.

    This differs from `dedup_substring_spans` (Lee et al. span REMOVAL
    marks every occurrence of a duplicated 13-gram) exactly where CCNet
    differs from suffix-array dedup: one canonical copy of each paragraph
    survives.

    Plan shape: explode fixed blocks (map-only: sequence + slice HOFs,
    no shuffle), ONE exchange keyed on the block text for the keep-first
    ranking window, then a doc-keyed aggregate. At 100 TB the ranking
    exchange keys on xxhash64(seg) (8-byte keys, same topology — the
    portable-twin pattern above); the window state per key is one row
    counter, and no doc's full text ever concatenates back together —
    retention stats and the kept-block set are the pipeline outputs."""
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir)["documents"].filter(F.col("n_chars") > 0)
    toks = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") >= 10)
    )
    segs = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), (F.col("n") / 10).cast("int"))
        ).alias("k"),
    ).select(
        "doc_id",
        ((F.col("k") - 1) * 10 + 1).alias("seg_start"),
        F.concat_ws(
            " ", F.expr("slice(t, (k - 1) * 10 + 1, 10)")
        ).alias("seg"),
    )
    rn = F.row_number().over(
        W.partitionBy("seg").orderBy("doc_id", "seg_start")
    )
    ranked = segs.withColumn("rn", rn)
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("kept_segs"),
        F.round(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("kept_frac"),
    )


@register(
    "dedup_jaccard_histogram",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 60
        ) d
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
    )
    SELECT CAST(LEAST(FLOOR(jaccard * 20), 19) AS BIGINT) AS bin,
           ROUND(CAST(LEAST(FLOOR(jaccard * 20), 19) AS DOUBLE) * 0.05, 2) AS bin_lo,
           COUNT(*) AS n_pairs
    FROM pairs
    GROUP BY 1, 2
    """,
    tags=("dedup",),
)
def dedup_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning aid: the distribution of pairwise Jaccard over
    EVERY candidate pair (any shared shingle, no floor), bucketed to
    0.05-wide bins — how a pipeline picks the dedup cutoff (the valley
    between the noise mass in the low bins and the near-dup mass near
    1.0) instead of guessing 0.5. Same inverted-index join as
    dedup_ngram_jaccard on the bounded doc_id<60 audit slice; the bin is
    integer floor arithmetic (jaccard==1.0 clamps into the top bin) so
    both engines bucket identically. At scale the histogram runs over a
    sampled pair stream while production stays banded."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 60)
    sh = d.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    bin_col = F.least(F.floor(jac * 20), F.lit(19)).cast("long")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("bin", F.round(F.col("bin") * 0.05, 2).alias("bin_lo"), "n_pairs")
    )


@register(
    "corpus_dup_rate_by_source",
    oracle="""
    WITH d AS (
      SELECT source, text, COUNT(*) AS c FROM documents GROUP BY source, text
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs,
           ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                 / SUM(c), 6) AS dup_rate
    FROM d GROUP BY source
    """,
    tags=("dedup", "corpus"),
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate health: for each source/domain, how many
    documents and what share of them are verbatim copies of another doc
    in the SAME source — the standard first look at where a crawl's
    duplication lives before choosing per-domain dedup aggressiveness
    (a boilerplate-heavy domain wants harder near-dedup; a clean one
    doesn't). Spark groups on (source, xxhash64(text)) so the wide text
    column never rides the shuffle — only an 8-byte key does (the
    dedup_exact discipline); the oracle groups the text itself, which is
    value-identical short of a 2^-64 hash collision. Two keyed
    aggregations with map-side partials; no row ever leaves its
    (source)-keyed partition twice."""
    d = load_tables(spark, sf_dir)["documents"]
    groups = d.groupBy("source", F.xxhash64("text").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    dup_c = F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))
    return groups.groupBy("source").agg(
        F.sum("c").alias("docs"),
        F.sum(dup_c).alias("dup_docs"),
        F.round(F.sum(dup_c).cast("double") / F.sum("c"), 6).alias("dup_rate"),
    )


@register(
    "dedup_incremental_vs_corpus",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    {_PORTABLE_BANDS_SQL},
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 >= 8 OR b.doc_id % 10 >= 8
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS shared
        FROM pairs p
        JOIN sh a ON a.doc_id = p.id_a
        JOIN sh b ON b.doc_id = p.id_b AND a.shingle = b.shingle
        GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.shared AS DOUBLE) / (sa.n + sb.n - i.shared) >= 0.5
    """,
    tags=("dedup", "incremental"),
)
def dedup_incremental_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dedup: dedup a NEW batch against an EXISTING
    corpus plus within itself — the nightly-crawl production shape the
    one-shot pipelines don't cover. New batch = ``doc_id % 10 >= 8``
    (a deterministic 20% slice); output = every candidate-verified pair
    with at least one NEW side, canonical ``id_a < id_b``.

    The scale property is the JOIN ASYMMETRY: band rows are built for
    both sides, but the candidate join probes NEW bands into the
    bucket-keyed corpus — corpus×corpus pairs are never formed, so daily
    cost is O(batch·bands + matched buckets), not O(corpus²). At 100 TB
    the corpus band table is precomputed and stored bucketed by
    (band, bkey); the nightly batch shuffles only itself and the
    matched buckets (the portable md5 keying makes this instance
    value-for-value oracle-checked; the xxhash64 performance path is
    the same plan with the cheaper keying, dedup_minhash_lsh)."""
    d = load_tables(spark, sf_dir)["documents"]
    sh = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).persist()
    bands = _portable_bands(sh)
    is_new = (F.col("doc_id") % 10) >= 8
    new_bands = bands.filter(is_new).alias("a")
    all_bands = bands.alias("b")
    pairs = (
        new_bands.join(
            all_bands,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("id_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        pairs.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
