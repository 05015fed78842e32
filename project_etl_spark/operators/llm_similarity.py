"""§2.11 [EXT] Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline; the scale path is the
IVF-style bucketed variant (assign every vector to its nearest coarse
centroid, search only the probed bucket — turning an O(N) scan per query
into O(N / n_buckets)).

Vector algebra stays JVM-side: ``zip_with`` + ``aggregate`` higher-order
functions over ``array<float>`` cast to double — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.operators.demo_guard import guard_demo_scale
from project_etl_spark.portable import pround, qint
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order, double precision)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def query_vector(emb: DataFrame, vec_id: int = 0) -> DataFrame:
    """Single-row ``(q_embedding)`` dimension carrying the query vector.

    Cross-joining this with ``F.broadcast`` is the zero-driver-round-trip
    parameter-passing pattern for a library surface: no ``.head()`` fetch,
    the one-row build side ships to every task as a constant. The resulting
    BroadcastNestedLoopJoin is constant-bounded (inner side is exactly one
    row), i.e. row-local work with no shuffle."""
    return (emb.where(F.col("vec_id") == vec_id)
            .select(F.col("embedding").alias("q_embedding")))


# Long-form position explode, the join-friendly layout for SQL engines.
_POS_SQL = """
    SELECT vec_id, label, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, 64) t(i)
"""

#: SQL twin of :func:`cosine_scores` (CTE bodies ending in ``cos_scores``)
#: — one copy feeding the ``ext_sim_search_topk`` oracle and the RRF
#: fusion oracle in ``llm_curation``.
_COSINE_SCORES_SQL = f"""pos AS ({_POS_SQL}),
        q AS (SELECT i, v AS qv FROM pos WHERE vec_id = 0),
        dots AS (
            SELECT p.vec_id,
                   SUM(p.v * q.qv) AS dp,
                   SQRT(SUM(p.v * p.v)) AS norm_p
            FROM pos p JOIN q ON p.i = q.i
            WHERE p.vec_id <> 0
            GROUP BY p.vec_id
        ),
        qn AS (SELECT SQRT(SUM(qv * qv)) AS norm_q FROM q),
        cos_scores AS (
            SELECT vec_id,
                   (FLOOR(dp / (norm_p * norm_q) * 1000000.0 + 0.5)
                    / 1000000.0) AS cosine_sim
            FROM dots, qn
        )"""


def cosine_scores(emb: DataFrame, vec_id: int = 0) -> DataFrame:
    """(vec_id, cosine_sim) of every vector against the ``vec_id`` query —
    THE exact-cosine pipeline, shared by ``ext_sim_search_topk`` and the
    RRF fusion in ``llm_curation``. One narrow pass with the broadcast
    one-row query dimension; similarity pre-quantized to 1e-6 so ranks
    built on it are engine-portable."""
    sim = pround(cosine(F.col("embedding"), F.col("q_embedding")), 6)
    return (emb.where(F.col("vec_id") != vec_id)
            .crossJoin(F.broadcast(query_vector(emb, vec_id)))
            .select("vec_id", sim.alias("cosine_sim")))


@register(
    "ext_sim_search_topk",
    oracle=f"""
        WITH {_COSINE_SCORES_SQL}
        SELECT vec_id, cosine_sim
        FROM cos_scores
        ORDER BY cosine_sim DESC, vec_id
        LIMIT 10
    """,
    tags=("ext", "similarity"),
)
def ext_sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of the vec_id=0 query vector.

    The query vector rides along as a broadcast one-row dimension
    (``query_vector``): zero driver round-trips, one narrow pass over the
    scan + TakeOrderedAndProject. Tie-break: (sim DESC, vec_id)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    return (cosine_scores(emb)
            .orderBy(F.col("cosine_sim").desc(), "vec_id")
            .limit(10))


def _mmr_steps_sql(k: int) -> tuple[str, str]:
    """Chained-CTE DuckDB twin of the greedy MMR selection: step t picks
    the argmax of 7*relq - 3*max(simq to already-selected) among the
    remaining candidates, tie-broken by vec_id — pure int64 algebra, so
    both engines pick identical items."""
    parts = ["s1 AS (SELECT vec_id, relq, CAST(1 AS BIGINT) AS rank, "
             "CAST(10 * relq AS BIGINT) AS mmr_q FROM cand "
             "ORDER BY relq DESC, vec_id LIMIT 1)"]
    union = "SELECT vec_id FROM s1"
    for t in range(2, k + 1):
        parts.append(f"""s{t} AS (
            SELECT c.vec_id, c.relq, CAST({t} AS BIGINT) AS rank,
                   CAST(7 * c.relq - 3 * (SELECT MAX(simq) FROM sims
                                          WHERE a = c.vec_id
                                            AND b IN ({union}))
                        AS BIGINT) AS mmr_q
            FROM cand c WHERE c.vec_id NOT IN ({union})
            ORDER BY mmr_q DESC, vec_id LIMIT 1)""")
        union += f" UNION ALL SELECT vec_id FROM s{t}"
    final = " UNION ALL ".join(f"SELECT * FROM s{t}" for t in range(1, k + 1))
    return ",\n        ".join(parts), final


_MMR_STEPS, _MMR_FINAL = _mmr_steps_sql(5)


@register(
    "ext_mmr_diversify",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        q AS (SELECT i, v AS qv FROM pos WHERE vec_id = 0),
        dots AS (
            SELECT p.vec_id,
                   SUM(p.v * q.qv) AS dp,
                   SQRT(SUM(p.v * p.v)) AS norm_p
            FROM pos p JOIN q ON p.i = q.i
            WHERE p.vec_id <> 0
            GROUP BY p.vec_id
        ),
        qn AS (SELECT SQRT(SUM(qv * qv)) AS norm_q FROM q),
        rel AS (
            SELECT vec_id,
                   CAST(FLOOR(dp / (norm_p * norm_q) * 1e6 + 5e-1)
                        AS BIGINT) AS relq
            FROM dots, qn
        ),
        cand AS (SELECT vec_id, relq FROM rel
                 ORDER BY relq DESC, vec_id LIMIT 12),
        cpos AS (SELECT p.vec_id, p.i, p.v
                 FROM pos p JOIN cand c ON p.vec_id = c.vec_id),
        norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nm
                  FROM cpos GROUP BY vec_id),
        sims AS (
            SELECT x.vec_id AS a, y.vec_id AS b,
                   CAST(FLOOR(SUM(x.v * y.v) / (nx.nm * ny.nm) * 1e6 + 5e-1)
                        AS BIGINT) AS simq
            FROM cpos x
            JOIN cpos y ON x.i = y.i AND x.vec_id <> y.vec_id
            JOIN norms nx ON nx.vec_id = x.vec_id
            JOIN norms ny ON ny.vec_id = y.vec_id
            GROUP BY x.vec_id, y.vec_id, nx.nm, ny.nm
        ),
        {_MMR_STEPS}
        SELECT rank, vec_id, relq, mmr_q FROM ({_MMR_FINAL})
    """,
    tags=("ext", "similarity", "retrieval"),
)
def ext_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    — the diversity stage of a retrieval pipeline: from the exact-cosine
    top-12 candidates of the vec_id=0 query, greedily select 5 where each
    pick maximizes lambda*relevance - (1-lambda)*max-similarity-to-picked
    (lambda=0.7, run as the exact integer form 7*relq - 3*maxsimq over
    1e-6-quantized cosines, tie-broken by vec_id — so the selection is
    bit-reproducible and SQL-twinnable). RAG stacks run exactly this to
    stop near-duplicate passages crowding a context window.

    Scale shape: candidate generation is the ``ext_sim_search_topk`` scan
    (one narrow pass + TakeOrderedAndProject); everything after operates
    on the FIXED 12-row candidate set (pairwise sims = one bounded
    broadcast cross, each greedy step an anti-join + max-penalty
    aggregate over <= 132 rows, lazily checkpointed so the plan stays
    linear in k). The greedy loop is inherently sequential in k — k tiny
    driver-side plan steps, never a driver data collect."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    relq = qint(cosine(F.col("embedding"), F.col("q_embedding")), 6)
    cand = (emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(query_vector(emb, 0)))
            .select("vec_id", "embedding", relq.alias("relq"))
            .orderBy(F.col("relq").desc(), "vec_id").limit(12)
            .localCheckpoint(eager=False))
    a = cand.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    simq = qint(cosine(F.col("ea"), F.col("eb")), 6)
    sims = (a.crossJoin(b).where(F.col("a") != F.col("b"))
            .select("a", "b", simq.alias("simq"))
            .localCheckpoint(eager=False))
    scores = cand.select("vec_id", "relq")
    selected = (scores.orderBy(F.col("relq").desc(), "vec_id").limit(1)
                .select(F.lit(1).cast("long").alias("rank"),
                        "vec_id", "relq",
                        (F.lit(10) * F.col("relq")).cast("long")
                        .alias("mmr_q")))
    for step in range(2, 6):
        rem = scores.join(selected.select("vec_id"), "vec_id", "left_anti")
        pen = (sims.join(selected.select(F.col("vec_id").alias("b")), "b")
               .groupBy(F.col("a").alias("vec_id"))
               .agg(F.max("simq").alias("maxsim")))
        mmr_q = (F.lit(7) * F.col("relq")
                 - F.lit(3) * F.col("maxsim")).cast("long")
        pick = (rem.join(pen, "vec_id")
                .select(F.lit(step).cast("long").alias("rank"),
                        "vec_id", "relq", mmr_q.alias("mmr_q"))
                .orderBy(F.col("mmr_q").desc(), "vec_id").limit(1))
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected


@register(
    "ext_embedding_stats",
    oracle=f"""
        WITH pos AS ({_POS_SQL})
        SELECT label, i AS pos,
               (CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                    / (COUNT(*) * 1000000.0)) AS centroid_val,
               COUNT(*) AS n_vectors
        FROM pos
        GROUP BY label, i
    """,
    tags=("ext", "similarity"),
)
def ext_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long form (label, position, mean): posexplode
    -> two-key groupBy. At scale this is one shuffle keyed (label, pos) with
    map-side partial means."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).alias("pos"),
                F.col("v").cast("double").alias("v"))
        .groupBy("label", "pos")
        .agg((F.sum(F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5)).cast("long"))
              / (F.count(F.lit(1)) * F.lit(1e6))).alias("centroid_val"),
             F.count(F.lit(1)).alias("n_vectors"))
    )


@register(
    "ext_knn_centroid",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        cent AS (
            SELECT label, i, AVG(v) AS cv FROM pos GROUP BY label, i
        ),
        dist AS (
            SELECT p.vec_id, p.label,
                   (FLOOR(SQRT(SUM((p.v - c.cv) * (p.v - c.cv)))
                          * 10000.0 + 0.5) / 10000.0) AS l2_dist
            FROM pos p JOIN cent c ON p.label = c.label AND p.i = c.i
            GROUP BY p.vec_id, p.label
        )
        SELECT vec_id, label, l2_dist
        FROM (
            SELECT vec_id, label, l2_dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY label ORDER BY l2_dist, vec_id
                   ) AS rn
            FROM dist
        )
        WHERE rn <= 3
    """,
    tags=("ext", "similarity", "knn"),
)
def ext_knn_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN to class centroids: per-label centroid (long form), L2 distance
    of each member to its own centroid, 3 nearest per label with a
    deterministic tie-break."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    pos = (emb.select("vec_id", "label", F.posexplode("embedding").alias("i", "v"))
           .select("vec_id", "label", "i", F.col("v").cast("double").alias("v")))
    cent = pos.groupBy("label", "i").agg(F.avg("v").alias("cv"))
    dist = (
        pos.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(pround(F.sqrt(F.sum((F.col("v") - F.col("cv"))
                                 * (F.col("v") - F.col("cv")))), 4)
             .alias("l2_dist"))
    )
    w = Window.partitionBy("label").orderBy("l2_dist", "vec_id")
    return (dist.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).drop("rn"))


@register(
    "ext_dup_embedding_cosine",
    oracle="""
        WITH unit AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE) /
                       sqrt(list_dot_product(
                           list_transform(embedding, y -> CAST(y AS DOUBLE)),
                           list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS u
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               (FLOOR(list_dot_product(a.u, b.u) * 1e4 + 5e-1) / 1e4) AS cosine_sim
        FROM unit a
        JOIN unit b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.u, b.u) >= 0.4
    """,
    tags=("ext", "similarity", "dedup"),
)
def ext_dup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within a label partition (cosine >=
    0.4 — demo threshold sized to the synthetic embeddings' similarity
    range). The label acts as the blocking key — the quadratic pair space is
    bounded per label, the Spark plan is an equi-join on label with the
    cosine as residual, never a global cross join. Both engines use
    the same pre-normalize-then-dot algebra (identical IEEE sequence).

    Exact-demo query: with few labels the blocked pair space is still
    ~O(N^2 / n_labels), so inputs are bounded by ``guard_demo_scale`` — the
    100 TB path is ``ext_dup_embedding_lsh_verified`` (same contract,
    candidate-bounded cost)."""
    ensure_deterministic(spark)
    emb = guard_demo_scale(table(spark, sf_dir, "embeddings"),
                           query="ext_dup_embedding_cosine",
                           flagship="ext_dup_embedding_lsh_verified")
    # Pre-normalize ONCE per vector (O(N) folds), so each candidate pair
    # costs a single dot-product fold instead of three — at 100 TB this is
    # the difference between 1x and 3x the pairwise compute.
    unit = emb.select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> cast(x as double) / "
               "sqrt(aggregate(zip_with(embedding, embedding, "
               "(p, q) -> cast(p as double) * cast(q as double)), "
               "0d, (acc, v) -> acc + v)))").alias("u"))
    a = unit.select(F.col("vec_id").alias("vec_a"), "label",
                    F.col("u").alias("ua"))
    b = unit.select(F.col("vec_id").alias("vec_b"),
                    F.col("label").alias("label_b"), F.col("u").alias("ub"))
    sim = dot(F.col("ua"), F.col("ub"))
    return (
        a.join(b, (F.col("label") == F.col("label_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("s", sim)
        .where(F.col("s") >= 0.4)
        .select("vec_a", "vec_b", "label", pround(F.col("s"), 4).alias("cosine_sim"))
    )


def ivf_topk(emb: DataFrame, n_probe: int = 2, k: int = 10,
             query_id: int = 0) -> DataFrame:
    """IVF top-k over any ``(vec_id, label, embedding)`` frame: coarse
    centroids = per-label means (the 'inverted lists'), probe the
    ``n_probe`` nearest lists for the query, exact cosine only within them.

    Recall depends on how well the list assignment tracks geometry: on
    label-clustered corpora (the realistic ANN deployment) the probed
    fraction recovers the true neighbors (gated >= 0.8 recall@10 in
    tests/test_dedup_quality.py on planted clusters); on isotropic vectors
    NO coarse index can beat the probed fraction — recall ~ n_probe /
    n_lists is information-theoretic, not an implementation defect."""
    qdf = F.broadcast(query_vector(emb, query_id))
    # centroid mean via int64-quantized per-element sums (portable.py rule:
    # raw double AVG is summation-order-dependent; exact integer partials
    # make the centroid — and therefore probe selection — engine-exact)
    cent = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg((F.sum(F.floor(F.col("v").cast("double") * F.lit(1e9)
                            + F.lit(0.5)).cast("long"))
              * F.lit(1.0) / (F.count(F.lit(1)) * F.lit(1e9))).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    probed = (
        cent.crossJoin(qdf)
        .select("label", cosine(F.col("centroid"), F.col("q_embedding"))
                .alias("qsim"))
        .orderBy(F.col("qsim").desc(), "label").limit(n_probe)
    )
    sim = pround(cosine(F.col("embedding"), F.col("q_embedding")), 6)
    return (
        emb.join(F.broadcast(probed.select("label")), "label")
        .where(F.col("vec_id") != query_id)
        .crossJoin(qdf)
        .select("vec_id", "label", sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(k)
    )


@register(
    "ext_ann_ivf_topk",
    # Full DuckDB twin of the IVF pipeline: quantized centroid means,
    # ordered-list reconstruction, identical probe selection and top-k.
    # The APPROXIMATION is deterministic, so even an ANN query can be
    # hash-checked — recall quality is gated separately in tests.
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        qv AS (SELECT list(v ORDER BY i) AS q FROM pos WHERE vec_id = 0),
        cent AS (
            SELECT label, i,
                   CAST(SUM(CAST(FLOOR(v * 1e9 + 5e-1) AS BIGINT)) AS BIGINT)
                       * 1e0 / (COUNT(*) * 1e9) AS cv
            FROM pos GROUP BY label, i
        ),
        cl AS (SELECT label, list(cv ORDER BY i) AS c FROM cent GROUP BY label),
        probed AS (
            SELECT label,
                   list_dot_product(c, q)
                       / (sqrt(list_dot_product(c, c))
                          * sqrt(list_dot_product(q, q))) AS qsim
            FROM cl CROSS JOIN qv
            ORDER BY qsim DESC, label LIMIT 2
        ),
        cand AS (
            SELECT e.vec_id, e.label,
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ed
            FROM embeddings e JOIN probed p USING (label)
            WHERE e.vec_id <> 0
        )
        SELECT vec_id, label,
               (FLOOR(list_dot_product(ed, q)
                      / (sqrt(list_dot_product(ed, ed))
                         * sqrt(list_dot_product(q, q))) * 1e6 + 5e-1)
                / 1e6) AS cosine_sim
        FROM cand CROSS JOIN qv
        ORDER BY cosine_sim DESC, vec_id
        LIMIT 10
    """,
    tags=("ext", "similarity", "ann"))
def ext_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k (see ``ivf_topk``): probes 2 of the
    inverted lists, so at 100 TB the probed fraction bounds the scan:
    cost ~ N * n_probe / n_lists. The query vector rides along as a
    broadcast one-row dimension (``query_vector``) — zero driver
    round-trips. Though APPROXIMATE as a nearest-neighbor answer, the
    approximation itself is deterministic (quantized centroid means, raw
    IEEE probe ordering, pround'd candidate sims with id tie-breaks), so
    the query is fully hash-checked against a DuckDB twin of the same
    index walk; recall@10 >= 0.8 on planted clusters is gated separately
    (tests/test_dedup_quality.py)."""
    ensure_deterministic(spark)
    return ivf_topk(table(spark, sf_dir, "embeddings"), n_probe=2, k=10)


def _plane_components(n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane components: (j, i) is derived
    from a splittable integer hash (no RNG state, reproducible on any
    cluster — and inlinable as literals into a SQL oracle)."""
    planes = []
    for j in range(n_planes):
        comps = []
        for i in range(DIM):
            # xorshift-style integer mix -> [-0.5, 0.5)
            h = (j * 1_000_003 + i * 8191 + seed) & 0xFFFFFFFF
            h = (h ^ (h >> 15)) * 2_654_435_761 & 0xFFFFFFFF
            h = (h ^ (h >> 13)) & 0xFFFFFFFF
            comps.append(h / 4294967296.0 - 0.5)
        planes.append(comps)
    return planes


def hyperplane_bucket(n_planes: int = 16, seed: int = 7) -> Column:
    """The LSH signature as a row-local Column over ``embedding``:
    bit j = sign(v . h_j). Being a plain expression (no join, no shuffle),
    it composes into any select alongside other per-row columns."""
    planes = _plane_components(n_planes, seed)
    sig = F.lit(0).cast("long")
    for j, comps in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in comps])
        bit = F.when(dot(F.col("embedding"), plane) > 0,
                     F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def hyperplane_signatures(emb: DataFrame, n_planes: int = 16,
                          seed: int = 7) -> DataFrame:
    """Cosine-LSH signatures via random hyperplanes. Vectors whose
    signatures agree on most bits are cosine-close
    (P[bit agrees] = 1 - angle/pi)."""
    return emb.select("vec_id", "label",
                      hyperplane_bucket(n_planes, seed).alias("bucket"))


#: Plane count for the verified flagship — ONE constant feeding both the
#: Spark builder and the DuckDB oracle; tuning one without the other would
#: silently break the hash check.
N_VERIFY_PLANES = 10


def _lsh_verified_oracle(n_planes: int = N_VERIFY_PLANES, seed: int = 7) -> str:
    """DuckDB twin of the hyperplane-LSH + exact-verify pipeline: the plane
    components are deterministic Python doubles, inlined as literals, so the
    signature bits and the pre-normalized dot verify follow the exact same
    IEEE sequence as the Spark fold."""
    bits = []
    for j, comps in enumerate(_plane_components(n_planes, seed)):
        lit = "[" + ", ".join(repr(c) for c in comps) + "]"
        bits.append(f"(CASE WHEN list_dot_product(ed, {lit}) > 0 "
                    f"THEN {1 << j} ELSE 0 END)")
    bucket = " + ".join(bits)
    return f"""
        WITH ed AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
            FROM embeddings
        ),
        sig AS (
            SELECT vec_id, ed, CAST({bucket} AS BIGINT) AS bucket FROM ed
        ),
        unit AS (
            SELECT vec_id, bucket,
                   list_transform(ed, x -> x /
                       sqrt(list_dot_product(ed, ed))) AS u
            FROM sig
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
               (FLOOR(list_dot_product(a.u, b.u) * 1e4 + 5e-1) / 1e4)
                   AS cosine_sim
        FROM unit a JOIN unit b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.u, b.u) >= 0.3
    """


@register(
    "ext_dup_embedding_lsh_verified",
    oracle=_lsh_verified_oracle(),
    tags=("ext", "similarity", "lsh"),
)
def ext_dup_embedding_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE embedding near-dup flagship for 100 TB: hyperplane-LSH buckets
    bound the candidate pair space (equi-join on the signature), then exact
    cosine verifies candidates only — the vector twin of the MinHash-LSH
    text flagship. Cost is candidate-bounded, never O(N^2) per label; fully
    hash-checked (deterministic planes + pre-normalized dot algebra
    replicated literal-for-literal in the DuckDB oracle).
    ``ext_dup_embedding_cosine`` stays as the small-sf exact demo."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    # bucket and u are both row-local functions of `embedding` — ONE narrow
    # scan computes them side by side; joining two projections of the same
    # row would buy nothing but a shuffle.
    with_sig = emb.select(
        "vec_id",
        hyperplane_bucket(N_VERIFY_PLANES).alias("bucket"),
        F.expr("transform(embedding, x -> cast(x as double) / "
               "sqrt(aggregate(zip_with(embedding, embedding, "
               "(p, q) -> cast(p as double) * cast(q as double)), "
               "0d, (acc, v) -> acc + v)))").alias("u"))
    a = with_sig.select(F.col("vec_id").alias("vec_a"), "bucket",
                        F.col("u").alias("ua"))
    b = with_sig.select(F.col("vec_id").alias("vec_b"),
                        F.col("bucket").alias("bucket_b"),
                        F.col("u").alias("ub"))
    s = dot(F.col("ua"), F.col("ub"))
    return (a.join(b, (F.col("bucket") == F.col("bucket_b"))
                   & (F.col("vec_a") < F.col("vec_b")))
            .withColumn("s", s).where(F.col("s") >= 0.3)
            .select("vec_a", "vec_b", "bucket",
                    pround(F.col("s"), 4).alias("cosine_sim")))


# `ext_dup_embedding_lsh` (the unverified 10-plane rows-only variant) was
# retired in round 7: `ext_dup_embedding_lsh_verified` above carries the
# identical bucket-then-exact-cosine contract WITH a full hash-checked
# oracle, so the weaker registration added registry surface without
# adding evidence. `hyperplane_signatures` remains the reusable
# signature fragment for any consumer that wants labels alongside the
# bucket.


@register(
    "ext_embedding_quantize",
    oracle="""
        WITH elems AS (
            SELECT vec_id, len(embedding) AS n_dims,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        scaled AS (
            SELECT vec_id, n_dims, v,
                   MAX(ABS(v)) OVER (PARTITION BY vec_id) AS mx
            FROM elems
        ),
        q AS (
            SELECT vec_id, n_dims, v,
                   CASE WHEN mx > 0 THEN 127.0 / mx ELSE 1.0 END AS scale,
                   FLOOR(v * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 1.0 END)
                         + 0.5) AS qv
            FROM scaled
        )
        SELECT vec_id,
               CAST(MAX(n_dims) AS BIGINT) AS n_dims,
               CAST(FLOOR(MAX(scale) * 1000000.0) AS BIGINT) AS scale_q,
               CAST(MAX(CAST(FLOOR(ABS(v - qv / scale) * 1000000000.0)
                             AS BIGINT)) AS BIGINT) AS max_err_q,
               CAST(SUM(CAST(FLOOR(ABS(v - qv / scale) * 1000000000.0)
                             AS BIGINT)) AS BIGINT) AS sum_err_q
        FROM q GROUP BY vec_id
    """,
    tags=("ext", "embedding", "quantize"),
)
def ext_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    compression every vector store applies before ANN at scale — with
    per-vector reconstruction-error accounting. ENTIRELY row-local on the
    Spark side: scale = 127/max|v| and the per-element quantize/dequantize
    error run as higher-order array functions inside the scan stage — zero
    shuffles, zero Python, the ideal 100 TB shape. Error sums are quantized
    to int64 per element BEFORE summing (order-independent), and every
    float step (divide, multiply, floor) is a single IEEE rounding, so the
    whole row hash-checks against DuckDB. Emits (vec_id, n_dims, scale_q,
    max_err_q, sum_err_q); max_err_q is bounded by scale/2, i.e. half a
    quantization step."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    dbl = F.expr("transform(embedding, x -> cast(x as double))")
    out = (emb
           .withColumn("v", dbl)
           .withColumn("mx", F.array_max(F.expr("transform(v, x -> abs(x))")))
           .withColumn("scale", F.when(F.col("mx") > 0,
                                       F.lit(127.0) / F.col("mx"))
                       .otherwise(F.lit(1.0)))
           .withColumn("err_q", F.expr(
               "transform(v, x -> cast(floor(abs(x - floor(x * scale + 0.5)"
               " / scale) * 1e9) as bigint))")))
    return out.select(
        "vec_id",
        F.size("v").cast("bigint").alias("n_dims"),
        F.floor(F.col("scale") * 1e6).cast("bigint").alias("scale_q"),
        F.array_max("err_q").alias("max_err_q"),
        F.aggregate("err_q", F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("sum_err_q"))


from project_etl_spark.operators._pca_oracle_gen import PCA_ORACLE


@register("ext_embedding_pca", oracle=PCA_ORACLE,
          tags=("ext", "embedding", "pca"))
def ext_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal components of the embedding matrix — the
    dimensionality-analysis primitive behind whitening, index rotation,
    and drift monitoring. Uses the skinny-matrix decomposition pattern
    (public Spark MLlib RowMatrix.computePrincipalComponents does the
    same): each partition accumulates its d x d RAW Gram partial + column
    sums with one Arrow-batched numpy matmul (`mapInPandas` — BLAS does
    the d^2 work per batch, no N x d^2 row explosion ever materializes),
    partials are summed over d*(d+1)/2 = 2080 keys, and the driver centers
    algebraically (Gc = G - n.mu.mu^T) before solving the tiny 64 x 64
    eigenproblem (O(d^3), parameter work). Plain power iteration is the
    WRONG tool on real embedding spectra: this fixture's eigengap ratio is
    0.987, i.e. ~150 distributed rounds for |cos| >= 0.99; the Gram route
    is exact in one pass. At 100 TB: each partition emits ~d^2/2 rows no
    matter how many vectors it holds — the shuffle is O(d^2 x partitions),
    the driver matrix is the fixed cost, and the single data pass is pure
    Arrow batch -> matmul. Algebraic centering subtracts n.mu.mu^T from
    like-magnitude entries — fine for near-zero-mean embedding spaces
    (this one), switch to an explicit two-pass center if |mu| >> sigma.
    Deterministic up to the sign, which is pinned (largest-|coordinate|
    positive) — and bit-reproducible end to end: rows are hash-routed to a
    FIXED 8 partitions and sorted within each by vec_id (partition contents
    and order no longer depend on file-split boundaries or parallelism),
    and each partition's Gram partial is quantized to int64 1e-9 units
    before the shuffle sum, so the reduce is exact integer arithmetic under
    any merge order. That determinism is what lets the output be
    hash-checked against a literal oracle (``tools/gen_pca_oracle.py``)
    instead of rows-only. Emits quantized (k, pos, component_q 1e-6 units,
    eigenvalue_q 1e-6 units); also gated by a numpy comparison test."""
    ensure_deterministic(spark)
    out, _n = _pca_top2(spark, sf_dir)
    # one-slice parallelize: the default createDataFrame path slices this
    # 128-row driver list over every core — 32 python-worker forks for a
    # result smaller than one Arrow batch (see _write_fixture).
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        "k int, pos int, component_q long, eigenvalue_q long")


def _pca_top2(spark: SparkSession, sf_dir: str) -> tuple[list, int]:
    """Shared Gram-pass + driver eigensolve behind ``ext_embedding_pca``
    and ``ext_embedding_whiten``: returns the quantized top-2 loading
    rows (k, pos, component_q 1e-6, eigenvalue_q 1e-6) with the
    largest-|coordinate|-positive sign pin, plus the corpus row count.
    Bit-reproducible — see ``ext_embedding_pca``'s docstring for why."""
    import numpy as np

    emb = (table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
           .repartition(8, "vec_id").sortWithinPartitions("vec_id"))
    n_dim = DIM

    def gram_parts(batches):
        import numpy as _np
        import pandas as _pd
        n = 0
        s = _np.zeros(n_dim)
        G = _np.zeros((n_dim, n_dim))
        for pdf in batches:
            if not len(pdf):
                continue
            X = _np.array(pdf["embedding"].tolist(), dtype=_np.float64)
            n += X.shape[0]
            s += X.sum(axis=0)
            G += X.T @ X
        if n == 0:
            return
        iu = _np.triu_indices(n_dim)
        q9 = lambda a: _np.floor(a * 1e9 + 0.5).astype(_np.int64)  # noqa: E731
        yield _pd.concat([
            _pd.DataFrame({"p": iu[0], "q": iu[1], "g": q9(G[iu])}),
            _pd.DataFrame({"p": _np.arange(n_dim),
                           "q": _np.full(n_dim, -1), "g": q9(s)}),
            _pd.DataFrame({"p": [-1], "q": [-1], "g": [n]}),
        ])

    agg = (emb.mapInPandas(gram_parts, "p int, q int, g long")
           .groupBy("p", "q").agg(F.sum("g").alias("g")).collect())
    G = np.zeros((n_dim, n_dim))
    s = np.zeros(n_dim)
    n = 0.0
    for r in agg:
        if r["p"] == -1:
            n = float(r["g"])
        elif r["q"] == -1:
            s[r["p"]] = r["g"] / 1e9
        else:
            G[r["p"], r["q"]] = r["g"] / 1e9
            G[r["q"], r["p"]] = r["g"] / 1e9
    mu = s / n
    G -= n * np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(G)
    out = []
    for k in range(2):
        vec = evecs[:, -(k + 1)]
        peak = int(np.argmax(np.abs(vec)))
        if vec[peak] < 0:
            vec = -vec
        lam_q = int(np.floor(evals[-(k + 1)] * 1e6 + 0.5))
        out += [(k, i, int(np.floor(vec[i] * 1e6 + 0.5)), lam_q)
                for i in range(n_dim)]
    return out, int(n)


@register(
    "ext_kmeans_assign",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        cent AS (
            SELECT vec_id AS c_id, i, v AS cv FROM pos WHERE vec_id BETWEEN 1 AND 4
        ),
        d AS (
            SELECT p.vec_id, c.c_id,
                   CAST(SUM(CAST(FLOOR((p.v - c.cv) * (p.v - c.cv) * 1e9 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS d2q
            FROM pos p JOIN cent c ON p.i = c.i
            WHERE p.vec_id <> 0
            GROUP BY p.vec_id, c.c_id
        ),
        assign AS (
            SELECT vec_id, c_id, d2q,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2q, c_id) AS rn
            FROM d
        )
        SELECT c_id AS cluster, COUNT(*) AS n_members,
               CAST(SUM(d2q) AS BIGINT) / (COUNT(*) * 1e9) AS mean_dist2,
               MIN(vec_id) AS min_vec_id
        FROM assign WHERE rn = 1
        GROUP BY c_id
    """,
    tags=("ext", "similarity", "clustering"),
)
def ext_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step over the embedding corpus: every vector is
    assigned to the nearest of k=4 seed centroids (the vectors with
    ``vec_id`` 1..4 — a deterministic stand-in for a k-means++ draw), and
    the result is the per-cluster census a clustering-based curation pass
    starts from (cluster sizes + inertia). The full algorithm is this step
    iterated with recomputed centroids; one step is the verifiable unit.

    Scale shape: the centroid side is k rows and BROADCAST; distances are
    row-local higher-order functions over the array column (zip_with +
    aggregate — no posexplode, so the scan stays N rows wide, not N*64);
    the argmin is a map-side-combinable min(struct) per vector and the
    final census is a k-group aggregate. Two shuffles total, both partial-
    aggregated. Every distance is a sum of int64-quantized terms
    (floor-algebra, summed in array order), so the argmin and the reported
    means are integer-exact and hash-match the oracle at any parallelism.
    """
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    cent = (emb.where(F.col("vec_id").between(1, 4))
            .select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("c_emb")))
    qterm = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d2q = F.aggregate(F.zip_with("embedding", "c_emb", qterm),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    assign = (emb.where(F.col("vec_id") != 0)
              .crossJoin(F.broadcast(cent))
              .select("vec_id", "c_id", d2q.alias("d2q"))
              .groupBy("vec_id")
              .agg(F.min(F.struct("d2q", "c_id")).alias("m"))
              .select("vec_id", F.col("m.c_id").alias("cluster"),
                      F.col("m.d2q").alias("d2q")))
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 (F.sum("d2q") / (F.count(F.lit(1)) * F.lit(1e9)))
                 .alias("mean_dist2"),
                 F.min("vec_id").alias("min_vec_id")))


_KMEANS_ASSIGN_SQL = f"""pos AS ({_POS_SQL}),
        cent AS (
            SELECT vec_id AS c_id, i, v AS cv FROM pos
            WHERE vec_id BETWEEN 1 AND 4
        ),
        d AS (
            SELECT p.vec_id, c.c_id,
                   CAST(SUM(CAST(FLOOR((p.v - c.cv) * (p.v - c.cv) * 1e9
                                       + 0.5) AS BIGINT)) AS BIGINT) AS d2q
            FROM pos p JOIN cent c ON p.i = c.i
            WHERE p.vec_id <> 0
            GROUP BY p.vec_id, c.c_id
        ),
        assign AS (
            SELECT vec_id, c_id, d2q,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2q, c_id) AS rn
            FROM d
        )"""


def _kmeans_assignment(emb: DataFrame) -> DataFrame:
    """(vec_id, cluster, d2q) nearest-of-4-seed-centroids assignment — the
    shared Lloyd step behind ``ext_kmeans_assign`` and the purity audit.
    Broadcast k-row centroid side, row-local quantized distances,
    map-side-combinable min(struct) argmin."""
    cent = (emb.where(F.col("vec_id").between(1, 4))
            .select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("c_emb")))
    qterm = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d2q = F.aggregate(F.zip_with("embedding", "c_emb", qterm),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    return (emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(cent))
            .select("vec_id", "c_id", d2q.alias("d2q"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2q", "c_id")).alias("m"))
            .select("vec_id", F.col("m.c_id").alias("cluster"),
                    F.col("m.d2q").alias("d2q")))


@register(
    "ext_cluster_purity",
    oracle=f"""
        WITH {_KMEANS_ASSIGN_SQL},
        labeled AS (
            SELECT a.c_id AS cluster, e.label
            FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
            WHERE a.rn = 1
        ),
        cl AS (
            SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM labeled GROUP BY cluster, label
        ),
        ranked AS (
            SELECT cluster, label, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY cluster) AS BIGINT)
                       AS n_members,
                   ROW_NUMBER() OVER (PARTITION BY cluster
                                      ORDER BY cnt DESC, label) AS rn
            FROM cl
        )
        SELECT cluster, n_members,
               CAST(label AS INT) AS majority_label,
               cnt AS n_majority,
               (FLOOR(cnt * 1.0 / n_members * 1e6 + 5e-1) / 1e6) AS purity
        FROM ranked WHERE rn = 1
    """,
    tags=("ext", "similarity", "clustering", "audit"),
)
def ext_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-purity audit — the first question after any clustering-based
    curation pass (SemDeDup, cluster-balanced sampling): does the
    geometric clustering recover the labeled structure? Per cluster:
    member count, majority label (ties broken by smallest label), and
    purity = majority fraction. Reuses the shared Lloyd assignment step
    (broadcast centroids, quantized integer distances, argmin via
    min(struct)) joined once against the label column; census is a
    k-by-labels aggregate plus one window over k groups — bounded state
    everywhere, and integer-exact up to the single purity division."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    labeled = (_kmeans_assignment(emb).select("vec_id", "cluster")
               .join(emb.select("vec_id", "label"), "vec_id"))
    cl = (labeled.groupBy("cluster", "label")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w_all = Window.partitionBy("cluster")
    w_rank = Window.partitionBy("cluster").orderBy(F.col("cnt").desc(),
                                                   "label")
    ranked = (cl.withColumn("n_members",
                            F.sum("cnt").over(w_all).cast("long"))
              .withColumn("rn", F.row_number().over(w_rank)))
    return (ranked.where(F.col("rn") == 1)
            .select("cluster", "n_members",
                    F.col("label").cast("int").alias("majority_label"),
                    F.col("cnt").alias("n_majority"),
                    pround(F.col("cnt") * F.lit(1.0) / F.col("n_members"), 6)
                    .alias("purity")))


#: SemDeDup parameters shared by the Spark builder and the DuckDB oracle —
#: one constant each, so the two sides can never drift apart.
SEMDEDUP_K = 32       # clusters; at scale pick k ~ N / target_cluster_size
SEMDEDUP_TAU = "0.42"  # cosine threshold, as a literal string (same parse
#                        to double in Spark and DuckDB); tuned to the
#                        fixture's cosine tail (max pairwise cos ~0.51)

#: Row-local unit-normalization of `embedding` — the exact expression the
#: hash-checked LSH flagship uses, reused verbatim so the IEEE op sequence
#: (cast, fold-dot, sqrt, divide) is pinned once.
_UNIT_EXPR = ("transform(embedding, x -> cast(x as double) / "
              "sqrt(aggregate(zip_with(embedding, embedding, "
              "(p, q) -> cast(p as double) * cast(q as double)), "
              "0d, (acc, v) -> acc + v)))")


@register(
    "ext_semdedup",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        cent AS (
            SELECT vec_id AS c_id, i, v AS cv FROM pos
            WHERE vec_id BETWEEN 1 AND {SEMDEDUP_K}
        ),
        d AS (
            SELECT p.vec_id, c.c_id,
                   CAST(SUM(CAST(FLOOR((p.v - c.cv) * (p.v - c.cv) * 1e9 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS d2q
            FROM pos p JOIN cent c ON p.i = c.i
            GROUP BY p.vec_id, c.c_id
        ),
        assign AS (
            SELECT vec_id, c_id AS cluster FROM (
                SELECT vec_id, c_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2q, c_id) AS rn
                FROM d) WHERE rn = 1
        ),
        ed AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
            FROM embeddings
        ),
        unit AS (
            SELECT e.vec_id, a.cluster,
                   list_transform(e.ed, x -> x /
                       sqrt(list_dot_product(e.ed, e.ed))) AS u
            FROM ed e JOIN assign a USING (vec_id)
        ),
        pairs AS (
            SELECT b.vec_id AS dup_id, b.cluster, a.vec_id AS rep_id,
                   list_dot_product(a.u, b.u) AS s
            FROM unit a JOIN unit b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.u, b.u) >= {SEMDEDUP_TAU}
        )
        SELECT dup_id, cluster,
               CAST(COUNT(*) AS BIGINT) AS n_dup_neighbors,
               MIN(rep_id) AS rep_id,
               (FLOOR(MAX(s) * 1e4 + 5e-1) / 1e4) AS max_cos
        FROM pairs GROUP BY dup_id, cluster
    """,
    tags=("ext", "similarity", "dedup", "clustering"),
)
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of an
    embedding corpus by (1) k-means cluster assignment, (2) pairwise cosine
    WITHIN each cluster only, (3) dropping every vector that has a
    smaller-id neighbor above the threshold — one representative per
    semantic-duplicate group survives. Emits the drop list (dup_id, its
    cluster, how many qualifying neighbors, the kept representative, max
    cosine), i.e. the delete-side audit a curation pass records.

    Scale shape: the centroid side is k rows and BROADCAST, distances are
    row-local fold algebra (no posexplode widening), the argmin is a
    map-side-combinable min(struct) — identical to `ext_kmeans_assign`. The
    pairwise stage joins on the cluster id, so cost is sum of |cluster|^2,
    NOT O(N^2): the paper's contract is to pick k ~ N / target_cluster_size
    (k = {SEMDEDUP_K} here for the fixture; ~1e6 clusters at 100 TB), which
    bounds every cluster to a few thousand vectors and keeps the join
    output-bounded. Assignment ties and the drop rule are integer-exact
    (quantized d2, min-id representative), and the cosine path reuses the
    LSH flagship's pinned IEEE sequence, so the whole pipeline
    hash-matches the oracle at any parallelism."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    cent = (emb.where(F.col("vec_id").between(1, SEMDEDUP_K))
            .select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("c_emb")))
    qterm = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d2q = F.aggregate(F.zip_with("embedding", "c_emb", qterm),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    assign = (emb.crossJoin(F.broadcast(cent))
              .select("vec_id", "c_id", d2q.alias("d2q"))
              .groupBy("vec_id")
              .agg(F.min(F.struct("d2q", "c_id")).alias("m"))
              .select("vec_id", F.col("m.c_id").alias("cluster")))
    unit = (emb.select("vec_id", F.expr(_UNIT_EXPR).alias("u"))
            .join(assign, "vec_id"))
    a = unit.select(F.col("vec_id").alias("rep_id"), "cluster",
                    F.col("u").alias("ua"))
    b = unit.select(F.col("vec_id").alias("dup_id"),
                    F.col("cluster").alias("cluster_b"),
                    F.col("u").alias("ub"))
    s = dot(F.col("ua"), F.col("ub"))
    pairs = (a.join(b, (F.col("cluster") == F.col("cluster_b"))
                    & (F.col("rep_id") < F.col("dup_id")))
             .withColumn("s", s)
             .where(F.col("s") >= F.expr(SEMDEDUP_TAU)))
    return (pairs.groupBy("dup_id", "cluster")
            .agg(F.count(F.lit(1)).alias("n_dup_neighbors"),
                 F.min("rep_id").alias("rep_id"),
                 pround(F.max("s"), 4).alias("max_cos")))



_PQ_QTERM = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))


def _pq_centroids(emb: DataFrame) -> DataFrame:
    """(s, c, c_sub): subspace s's 4 centroids = subvectors of the seed
    vectors vec_id 1..32 (fixed-draw codebook; production Lloyd-iterates
    per subspace with the registered assignment step)."""
    return (emb.where(F.col("vec_id").between(1, 32))
            .select((((F.col("vec_id") - 1) / 4).cast("int")).alias("s"),
                    ((F.col("vec_id") - 1) % 4).cast("int").alias("c"),
                    F.col("embedding").alias("c_emb"))
            .select("s", "c",
                    F.expr("slice(c_emb, s * 8 + 1, 8)").alias("c_sub")))


def _pq_assign(emb: DataFrame) -> DataFrame:
    """(vec_id, s, m:{d2q, c}) nearest-centroid assignment per subspace —
    the PQ encode fragment shared by ``ext_embedding_pq_codes`` and the
    ADC search ``ext_ann_pq_adc``."""
    cent = _pq_centroids(emb)
    sub = (emb.select("vec_id", F.explode(F.expr("sequence(0, 7)")).alias("s"),
                      "embedding")
           .select("vec_id", "s",
                   F.expr("slice(embedding, s * 8 + 1, 8)").alias("v_sub")))
    d2q = F.aggregate(F.zip_with("v_sub", "c_sub", _PQ_QTERM),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    return (sub.join(F.broadcast(cent), "s")
            .select("vec_id", "s", "c", d2q.alias("d2q"))
            .groupBy("vec_id", "s")
            .agg(F.min(F.struct("d2q", "c")).alias("m")))


# --------------------------------------------------------------------------
# ext_embedding_pq_codes — product quantization (the ANN compression standard)
# --------------------------------------------------------------------------

_PQ_SQL = f"""
WITH pos AS ({_POS_SQL}),
sub AS (
    SELECT vec_id, (i - 1) // 8 AS s, i, v FROM pos
),
cent AS (
    SELECT (vec_id - 1) // 4 AS s, (vec_id - 1) % 4 AS c, i, v AS cv
    FROM pos WHERE vec_id BETWEEN 1 AND 32 AND (i - 1) // 8 = (vec_id - 1) // 4
),
d AS (
    SELECT p.vec_id, p.s, c.c,
           CAST(SUM(CAST(FLOOR((p.v - c.cv) * (p.v - c.cv) * 1e9 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS d2q
    FROM sub p JOIN cent c ON p.s = c.s AND p.i = c.i
    GROUP BY p.vec_id, p.s, c.c
),
assign AS (
    SELECT vec_id, s, c, d2q,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2q, c) AS rn
    FROM d
)
SELECT vec_id,
       CAST(SUM(c * (1 << (2 * s))) AS BIGINT) AS pq_code,
       CAST(SUM(d2q) AS BIGINT) AS recon_err_q
FROM assign WHERE rn = 1
GROUP BY vec_id
"""


@register("ext_embedding_pq_codes", oracle=_PQ_SQL,
          tags=("ext", "similarity", "compression"))
def ext_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jegou et al. 2011, TPAMI — the compression
    behind every large-scale ANN index): the 64-dim vector splits into 8
    subvectors of 8 dims, each assigned to the nearest of 4 per-subspace
    centroids, and the whole vector collapses to a 16-BIT CODE (8 x 2
    bits) — a 128x storage cut whose residual is reported as the exact
    quantized reconstruction error. Codebooks are deterministic seed
    subvectors (vec_id 1..32 supply subspace s's centroids — the same
    fixed-draw stand-in as ``ext_kmeans_assign``; production would Lloyd-
    iterate per subspace with the registered assignment step).

    Scale shape: centroids are 32 broadcast rows; subvector distances are
    row-local zip_with folds over slices (the scan stays N rows wide);
    per-(vector, subspace) argmin is a map-side min(struct); code packing
    is an integer dot with 4^s. Everything int64-exact — the code AND the
    residual hash-match at any parallelism."""
    ensure_deterministic(spark)
    assign = _pq_assign(table(spark, sf_dir, "embeddings"))
    return (assign.select(
        "vec_id",
        F.expr("cast(m.c as bigint) * shiftleft(1L, cast(s * 2 as int))")
        .alias("term"),
        F.col("m.d2q").alias("d2q"))
        .groupBy("vec_id")
        .agg(F.sum("term").alias("pq_code"),
             F.sum("d2q").alias("recon_err_q")))


_ADC_SQL = f"""
WITH pos AS ({_POS_SQL}),
sub AS (
    SELECT vec_id, (i - 1) // 8 AS s, i, v FROM pos
),
cent AS (
    SELECT (vec_id - 1) // 4 AS s, (vec_id - 1) % 4 AS c, i, v AS cv
    FROM pos WHERE vec_id BETWEEN 1 AND 32 AND (i - 1) // 8 = (vec_id - 1) // 4
),
lut AS (
    SELECT c.s, c.c,
           CAST(SUM(CAST(FLOOR((q.v - c.cv) * (q.v - c.cv) * 1e9 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS ld2q
    FROM sub q JOIN cent c ON q.s = c.s AND q.i = c.i
    WHERE q.vec_id = 0 GROUP BY c.s, c.c
),
d AS (
    SELECT p.vec_id, p.s, c.c,
           CAST(SUM(CAST(FLOOR((p.v - c.cv) * (p.v - c.cv) * 1e9 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS d2q
    FROM sub p JOIN cent c ON p.s = c.s AND p.i = c.i
    WHERE p.vec_id <> 0
    GROUP BY p.vec_id, p.s, c.c
),
assign AS (
    SELECT vec_id, s, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2q, c) AS rn
    FROM d
),
adc AS (
    SELECT a.vec_id, CAST(SUM(l.ld2q) AS BIGINT) AS adc_q
    FROM assign a JOIN lut l ON a.s = l.s AND a.c = l.c
    WHERE a.rn = 1 GROUP BY a.vec_id
)
SELECT vec_id, adc_q FROM adc ORDER BY adc_q, vec_id LIMIT 10
"""


@register("ext_ann_pq_adc", oracle=_ADC_SQL,
          tags=("ext", "similarity", "ann"))
def ext_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric distance computation (ADC — the search half of Jegou
    et al.'s scheme): the query stays FULL precision while the corpus is
    its 16-bit codes, so each candidate's distance is 8 table lookups —
    the query's 32-entry subspace-distance LUT replaces every vector
    arithmetic op at scan time. Top-10 by quantized ADC with a vec_id
    tie-break, hash-exact. At 100 TB the LUT broadcast (32 rows per
    query) + code-table scan is the entire cost — the corpus vectors
    themselves never load; pair with ``ext_ann_recall_report``'s
    methodology to quantify what the 128x compression costs in recall."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    q_sub = (query_vector(emb, 0)
             .select(F.explode(F.expr("sequence(0, 7)")).alias("s"),
                     "q_embedding")
             .select("s", F.expr("slice(q_embedding, s * 8 + 1, 8)")
                     .alias("q_sub")))
    lut = (q_sub.join(_pq_centroids(emb), "s")
           .select("s", "c",
                   F.aggregate(F.zip_with("q_sub", "c_sub", _PQ_QTERM),
                               F.lit(0).cast("long"),
                               lambda acc, t: acc + t).alias("ld2q")))
    codes = (_pq_assign(emb.where(F.col("vec_id") != 0))
             .select("vec_id", "s", F.col("m.c").alias("c")))
    return (codes.join(F.broadcast(lut), ["s", "c"])
            .groupBy("vec_id").agg(F.sum("ld2q").alias("adc_q"))
            .orderBy("adc_q", "vec_id").limit(10))


# --------------------------------------------------------------------------
# ext_coreset_kcenter — farthest-point diversity sampling
# --------------------------------------------------------------------------

_KC_QT = ("CAST(SUM(CAST(FLOOR((a.v - b.v) * (a.v - b.v) * 1e9 + 5e-1) "
          "AS BIGINT)) AS BIGINT)")

_KCENTER_SQL = f"""
WITH pos AS ({_POS_SQL}),
d0 AS (
    SELECT a.vec_id, {_KC_QT} AS d
    FROM pos a JOIN pos b ON a.i = b.i AND b.vec_id = 0
    WHERE a.vec_id <> 0 GROUP BY a.vec_id
),
w1 AS (SELECT vec_id, d AS mind FROM d0 ORDER BY d DESC, vec_id LIMIT 1),
d1 AS (
    SELECT a.vec_id, {_KC_QT} AS d
    FROM pos a JOIN pos b ON a.i = b.i
    JOIN w1 ON b.vec_id = w1.vec_id
    WHERE a.vec_id <> 0 AND a.vec_id NOT IN (SELECT vec_id FROM w1)
    GROUP BY a.vec_id
),
m1 AS (SELECT d0.vec_id, LEAST(d0.d, d1.d) AS mind
       FROM d0 JOIN d1 ON d0.vec_id = d1.vec_id),
w2 AS (SELECT vec_id, mind FROM m1 ORDER BY mind DESC, vec_id LIMIT 1),
d2 AS (
    SELECT a.vec_id, {_KC_QT} AS d
    FROM pos a JOIN pos b ON a.i = b.i
    JOIN w2 ON b.vec_id = w2.vec_id
    WHERE a.vec_id <> 0 AND a.vec_id NOT IN (SELECT vec_id FROM w1)
      AND a.vec_id NOT IN (SELECT vec_id FROM w2)
    GROUP BY a.vec_id
),
m2 AS (SELECT m1.vec_id, LEAST(m1.mind, d2.d) AS mind
       FROM m1 JOIN d2 ON m1.vec_id = d2.vec_id),
w3 AS (SELECT vec_id, mind FROM m2 ORDER BY mind DESC, vec_id LIMIT 1)
SELECT 0 AS round, CAST(0 AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS min_dist_q
UNION ALL SELECT 1, vec_id, mind FROM w1
UNION ALL SELECT 2, vec_id, mind FROM w2
UNION ALL SELECT 3, vec_id, mind FROM w3
"""

_KC_QTERM = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))


@register("ext_coreset_kcenter", oracle=_KCENTER_SQL,
          tags=("ext", "similarity", "coreset"))
def ext_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy / farthest-point sampling (the 2-approximation of
    Gonzalez 1985; the coreset selector of active-learning and
    data-pruning pipelines, e.g. Sener & Savarese 2018, arXiv:1708.00489):
    starting from the seed vector, each round picks the vector FARTHEST
    from everything already chosen — four rounds of maximal-coverage
    diversity, the opposite selection pressure from near-dup removal.
    Each round is one broadcast of the (tiny) chosen set, a row-local
    min-distance fold, and an argmax — the single-row winner fetch is a
    parameter lookup (the calibration-loop pattern), not a data collect;
    distances are the usual int64-quantized algebra so every round's
    winner (and therefore the whole greedy trajectory) is engine-exact.
    The oracle unrolls the loop as static CTE rounds."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    chosen = [0]
    out = [(0, 0, 0)]
    for r in range(1, 4):
        cent = (emb.where(F.col("vec_id").isin(chosen))
                .select(F.col("embedding").alias("c_emb")))
        d2q = F.aggregate(F.zip_with("embedding", "c_emb", _KC_QTERM),
                          F.lit(0).cast("long"), lambda a, t: a + t)
        nxt = (emb.where(~F.col("vec_id").isin(chosen))
               .crossJoin(F.broadcast(cent))
               .select("vec_id", d2q.alias("d2q"))
               .groupBy("vec_id").agg(F.min("d2q").alias("mind"))
               .orderBy(F.desc("mind"), "vec_id").limit(1).head())
        chosen.append(nxt["vec_id"])
        out.append((r, nxt["vec_id"], nxt["mind"]))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        "round int, vec_id long, min_dist_q long")


# --------------------------------------------------------------------------
# ext_hard_negatives — contrastive-training negative mining
# --------------------------------------------------------------------------

_HARD_NEG_K = 5

_HARD_NEG_SQL = f"""
    WITH pos AS ({_POS_SQL}),
    qs AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
           WHERE vec_id % 100 = 0),
    qpos AS (
        SELECT q.qid, q.qlabel, p.i, p.v
        FROM pos p JOIN qs q ON p.vec_id = q.qid
    ),
    qn AS (SELECT qid, SQRT(SUM(v * v)) AS nq FROM qpos GROUP BY qid),
    dots AS (
        SELECT qp.qid, qp.qlabel, p.vec_id, p.label,
               SUM(p.v * qp.v) AS dp, SQRT(SUM(p.v * p.v)) AS np
        FROM pos p JOIN qpos qp ON p.i = qp.i
        WHERE p.vec_id <> qp.qid
        GROUP BY 1, 2, 3, 4
    ),
    scored AS (
        SELECT d.qid, d.vec_id, d.label,
               (FLOOR(d.dp / (d.np * q.nq) * 1e6 + 5e-1) / 1e6) AS cosine_sim
        FROM dots d JOIN qn q ON d.qid = q.qid
        WHERE d.label <> d.qlabel
    )
    SELECT qid AS q_vec_id, vec_id AS neg_vec_id, label AS neg_label,
           cosine_sim, rnk
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cosine_sim DESC, vec_id)
               AS BIGINT) AS rnk
        FROM scored
    ) WHERE rnk <= {_HARD_NEG_K}
"""


@register("ext_hard_negatives", oracle=_HARD_NEG_SQL,
          tags=("ext", "similarity", "training"))
def ext_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training (the
    DPR/SimCSE data-prep stage): for each query vector, the top-5 most
    cosine-similar vectors carrying a DIFFERENT label — the
    almost-positives that make the strongest negatives. Query set =
    vec_id % 100 == 0 (deterministic; in production, the current
    training batch).

    Scale shape: the query set rides along as a broadcast dimension
    (bounded build side — same pattern as ``ext_sim_search_topk``'s
    one-row query), so mining is ONE narrow pass over the corpus per
    batch: dot products inside Catalyst higher-order functions, label
    exclusion as a map-side predicate, then a per-query top-k window
    over candidates. At full scale the corpus side routes through the
    IVF index (``ext_ann_ivf_topk``) first — probe the query's nearest
    lists, then apply the same label-exclusion and rank."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    qs = (emb.where(F.col("vec_id") % 100 == 0)
          .select(F.col("vec_id").alias("qid"),
                  F.col("label").alias("qlabel"),
                  F.col("embedding").alias("qe")))
    sim = pround(cosine(F.col("embedding"), F.col("qe")), 6)
    scored = (emb.crossJoin(F.broadcast(qs))
              .where((F.col("vec_id") != F.col("qid"))
                     & (F.col("label") != F.col("qlabel")))
              .select(F.col("qid").alias("q_vec_id"),
                      F.col("vec_id").alias("neg_vec_id"),
                      F.col("label").alias("neg_label"),
                      sim.alias("cosine_sim")))
    w = Window.partitionBy("q_vec_id").orderBy(
        F.col("cosine_sim").desc(), "neg_vec_id")
    return (scored.withColumn("rnk",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= _HARD_NEG_K))


# --------------------------------------------------------------------------
# ext_knn_graph_lsh — all-vectors k-NN graph over LSH buckets
# --------------------------------------------------------------------------

#: Graph geometry: 8 hyperplanes (256 buckets) keeps buckets populated at
#: fixture scale so most vectors get neighbors; k = 3 edges per vector.
#: ONE pair of constants feeds builder and oracle.
_KNN_GRAPH_PLANES = 8
_KNN_GRAPH_K = 3


def _knn_graph_oracle(n_planes: int = _KNN_GRAPH_PLANES,
                      k: int = _KNN_GRAPH_K, seed: int = 7) -> str:
    """DuckDB twin of the LSH-bucketed k-NN graph: identical plane
    literals and pre-normalized dot algebra as ``_lsh_verified_oracle``,
    but a DIRECTED within-bucket join ranked per source vector."""
    bits = []
    for j, comps in enumerate(_plane_components(n_planes, seed)):
        lit = "[" + ", ".join(repr(c) for c in comps) + "]"
        bits.append(f"(CASE WHEN list_dot_product(ed, {lit}) > 0 "
                    f"THEN {1 << j} ELSE 0 END)")
    bucket = " + ".join(bits)
    return f"""
        WITH ed AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
            FROM embeddings
        ),
        sig AS (
            SELECT vec_id, ed, CAST({bucket} AS BIGINT) AS bucket FROM ed
        ),
        unit AS (
            SELECT vec_id, bucket,
                   list_transform(ed, x -> x /
                       sqrt(list_dot_product(ed, ed))) AS u
            FROM sig
        ),
        scored AS (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   (FLOOR(list_dot_product(a.u, b.u) * 1e6 + 5e-1) / 1e6)
                       AS cosine_sim
            FROM unit a
            JOIN unit b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        )
        SELECT vec_id, neighbor_id, cosine_sim, rnk
        FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY cosine_sim DESC, neighbor_id)
                   AS BIGINT) AS rnk
            FROM scored
        ) WHERE rnk <= {k}
    """


@register("ext_knn_graph_lsh", oracle=_knn_graph_oracle(),
          tags=("ext", "similarity", "ann", "graph"))
def ext_knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-vectors k-NN graph (k=3) over hyperplane-LSH buckets — the
    neighborhood graph that SemDeDup-style clustering, HNSW construction
    and label propagation all start from: every vector ranks its
    within-bucket candidates by exact cosine and keeps its top-3 edges.
    Candidates come only from the vector's own LSH bucket, so graph
    construction is an output-bounded equi-join (cost ~ sum of squared
    bucket sizes over 256 buckets), never the O(N^2) all-pairs scan; the
    recall knob is the plane count (fewer planes = bigger buckets =
    higher recall, more work). Directed edges: (a -> b) and (b -> a) rank
    independently, exactly as a k-NN graph is defined.

    Determinism: signature bits and pre-normalized dots are the exact
    IEEE sequences of the embedding-LSH flagship
    (``ext_dup_embedding_lsh_verified``); ranks use the quantized
    similarity with neighbor-id tie-break, so both engines pick identical
    edges."""
    ensure_deterministic(spark)
    return knn_graph_edges(table(spark, sf_dir, "embeddings"))


def knn_graph_edges(emb: DataFrame) -> DataFrame:
    """(vec_id, neighbor_id, cosine_sim, rnk) — the ``ext_knn_graph_lsh``
    dataflow as a reusable fragment (label spreading consumes it)."""
    with_sig = emb.select(
        "vec_id",
        hyperplane_bucket(_KNN_GRAPH_PLANES).alias("bucket"),
        F.expr("transform(embedding, x -> cast(x as double) / "
               "sqrt(aggregate(zip_with(embedding, embedding, "
               "(p, q) -> cast(p as double) * cast(q as double)), "
               "0d, (acc, v) -> acc + v)))").alias("u"))
    a = with_sig.select("vec_id", "bucket", F.col("u").alias("ua"))
    b = with_sig.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("bucket").alias("bucket_b"),
                        F.col("u").alias("ub"))
    scored = (a.join(b, (F.col("bucket") == F.col("bucket_b"))
                     & (F.col("vec_id") != F.col("neighbor_id")))
              .select("vec_id", "neighbor_id",
                      pround(dot(F.col("ua"), F.col("ub")), 6)
                      .alias("cosine_sim")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine_sim").desc(), "neighbor_id")
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= _KNN_GRAPH_K))


# --------------------------------------------------------------------------
# ext_label_spread_knn — semi-supervised label propagation on the graph
# --------------------------------------------------------------------------

#: Seed predicate (every 5th vector keeps its true label) and round count.
_SPREAD_SEED_SQL = "vec_id % 5 = 0"
_SPREAD_ROUNDS = 2


def _label_spread_oracle() -> str:
    """DuckDB twin: the k-NN CTE from ``_knn_graph_oracle`` feeding two
    chained majority-vote rounds (count DESC, label ASC tie-break) —
    pure integer algebra, so both engines assign identical labels."""
    knn_inner = _knn_graph_oracle()
    rounds = []
    prev = "a0"
    for r in range(1, _SPREAD_ROUNDS + 1):
        rounds.append(f"""
        r{r}v AS (
            SELECT k.vec_id, a.lab, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM knn k JOIN {prev} a ON k.neighbor_id = a.vec_id
            WHERE k.vec_id NOT IN (SELECT vec_id FROM {prev})
            GROUP BY 1, 2
        ),
        r{r} AS (
            SELECT vec_id, lab, CAST({r} AS BIGINT) AS src_round,
                   cnt AS n_votes
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY cnt DESC, lab) AS rn
                  FROM r{r}v)
            WHERE rn = 1
        ),
        a{r} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM r{r})""")
        prev = f"a{r}"
    return f"""
        WITH knn AS ({knn_inner}),
        a0 AS (
            SELECT vec_id, label AS lab, CAST(0 AS BIGINT) AS src_round,
                   CAST(0 AS BIGINT) AS n_votes
            FROM embeddings WHERE {_SPREAD_SEED_SQL}
        ),{",".join(rounds)}
        SELECT vec_id, lab AS label_pred, src_round, n_votes FROM {prev}
    """


@register("ext_label_spread_knn", oracle=_label_spread_oracle(),
          tags=("ext", "similarity", "graph", "semisup"))
def ext_label_spread_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the k-NN graph (Zhu-
    Ghahramani label spreading, majority-vote form) — how a curation team
    stretches a small set of human quality/topic labels across an
    unlabeled corpus: every 5th vector keeps its true label (the seed
    set); two propagation rounds assign each unlabeled vector the
    majority label among its already-labeled graph neighbors (vote-count
    DESC, label ASC tie-break — deterministic integer algebra, no
    normalized float weights). Vectors unreached after 2 rounds stay
    unlabeled (honest coverage — the output reports src_round so the
    consumer can see label provenance and confidence via n_votes).

    Scale shape: the k-NN edge list is built once (candidate-bounded,
    ``ext_knn_graph_lsh``) and lazily checkpointed; each round is one
    equi-join (edges to current assignments) + one hash aggregation —
    the Pregel lowering this repo uses for every iterative graph op, at
    cost O(edges) per round."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    edges = (knn_graph_edges(emb).select("vec_id", "neighbor_id")
             .localCheckpoint(eager=False))
    assigned = emb.where(F.expr(_SPREAD_SEED_SQL)).select(
        "vec_id", F.col("label").alias("lab"),
        F.lit(0).cast("long").alias("src_round"),
        F.lit(0).cast("long").alias("n_votes"))
    for r in range(1, _SPREAD_ROUNDS + 1):
        cur = assigned.select("vec_id", "lab").localCheckpoint(eager=False)
        votes = (edges
                 .join(cur.select(F.col("vec_id").alias("neighbor_id"),
                                  "lab"), "neighbor_id")
                 .join(cur.select("vec_id"), "vec_id", "left_anti")
                 .groupBy("vec_id", "lab")
                 .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cnt").desc(), F.col("lab"))
        picked = (votes.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select("vec_id", "lab",
                          F.lit(r).cast("long").alias("src_round"),
                          F.col("cnt").alias("n_votes")))
        assigned = assigned.unionByName(picked)
    return assigned.select("vec_id", F.col("lab").alias("label_pred"),
                           "src_round", "n_votes")


# --------------------------------------------------------------------------
# ext_embedding_whiten — PCA-whitened coordinates along the top-2 axes
# --------------------------------------------------------------------------

def _whiten_oracle() -> str:
    from project_etl_spark.operators._pca_oracle_gen import PCA_ORACLE
    return f"""
WITH comps AS ({PCA_ORACLE}),
emb_pos AS (
    SELECT vec_id, t.i - 1 AS pos0, CAST(embedding[t.i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, 64) t(i)
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
mu AS (
    SELECT pos0,
           CAST(SUM(CAST(FLOOR(v * 1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS mu_q
    FROM emb_pos GROUP BY pos0
),
mdot AS (
    SELECT c.k,
           CAST(SUM(CAST(FLOOR((m.mu_q / 1e6 / n.n)
                                * (c.component_q / 1e6) * 1e9 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS mdot_q
    FROM mu m JOIN comps c ON m.pos0 = c.pos, nn n
    GROUP BY c.k
),
proj AS (
    SELECT p.vec_id, c.k,
           CAST(SUM(CAST(FLOOR(p.v * (c.component_q / 1e6) * 1e9 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS dot_q,
           CAST(ANY_VALUE(c.eigenvalue_q) AS BIGINT) AS lam_q
    FROM emb_pos p JOIN comps c ON p.pos0 = c.pos
    GROUP BY p.vec_id, c.k
)
SELECT p.vec_id, CAST(p.k AS INT) AS k,
       FLOOR((p.dot_q / 1e9 - m.mdot_q / 1e9)
             / SQRT(p.lam_q / 1e6 / (n.n - 1e0)) * 1e6 + 5e-1) / 1e6 AS z
FROM proj p JOIN mdot m USING (k), nn n
"""


@register("ext_embedding_whiten", oracle=_whiten_oracle(),
          tags=("ext", "embedding", "pca", "whiten"))
def ext_embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened coordinates: every vector projected onto the top-2
    principal axes, mean-centered, and scaled to unit variance
    (z_k = ((x - mu) . c_k) / sqrt(lambda_k / (n-1))) — the decorrelation
    step retrieval stacks run before product quantization and score
    calibration (whitening is what makes per-subspace codebooks, e.g.
    ``ext_embedding_pq_codes``, spend their bits evenly). Loadings come
    from the shared ``_pca_top2`` Gram pass, so the oracle reuses the SAME
    pinned literal loadings as ``ext_embedding_pca`` and recomputes the
    projections independently in DuckDB.

    Scale shape: one extra narrow pass over the corpus — posexplode +
    broadcast hash join against the 128-row loading table + one
    map-side-combinable (vec, k) aggregation; the mean vector is a
    64-key aggregate and the per-axis centering constants are a 2-row
    broadcast. Projection terms and the centering dot products are
    int64-quantized (1e-9) before their bounded 64-term sums; the
    corpus-scaled per-dimension mean sums quantize at 1e-6 — coarser on
    purpose, since a nano per-term quantum would wrap int64 near 9.2e9
    vectors (~5 TB of 64-dim f64) while micro holds to 9.2e12 (~5 PB)
    at a constant ≤5e-7 absolute error on the mean. Every reduce is
    exact integer arithmetic and the final scale is one deterministic
    IEEE op chain — bit-identical cross-engine with no literal freeze of
    the (corpus-sized) output itself."""
    ensure_deterministic(spark)
    comps, n = _pca_top2(spark, sf_dir)
    cdf = F.broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(comps, 1),
        "k int, pos int, component_q long, eigenvalue_q long"))
    emb = table(spark, sf_dir, "embeddings")
    pos = (emb.select("vec_id", F.posexplode("embedding").alias("pos", "v0"))
           .select("vec_id", "pos", F.col("v0").cast("double").alias("v")))
    mu = (pos.groupBy("pos")
          .agg(F.sum(F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5))
                     .cast("long")).cast("long").alias("mu_q")))
    mterm = F.floor((F.col("mu_q") / F.lit(1e6) / F.lit(float(n)))
                    * (F.col("component_q") / F.lit(1e6))
                    * F.lit(1e9) + F.lit(0.5)).cast("long")
    mdot = (mu.join(cdf, "pos")
            .groupBy("k").agg(F.sum(mterm).cast("long").alias("mdot_q")))
    pterm = F.floor(F.col("v") * (F.col("component_q") / F.lit(1e6))
                    * F.lit(1e9) + F.lit(0.5)).cast("long")
    proj = (pos.join(cdf, "pos")
            .groupBy("vec_id", "k")
            .agg(F.sum(pterm).cast("long").alias("dot_q"),
                 F.first("eigenvalue_q").cast("long").alias("lam_q")))
    z = (F.floor((F.col("dot_q") / F.lit(1e9) - F.col("mdot_q") / F.lit(1e9))
                 / F.sqrt(F.col("lam_q") / F.lit(1e6)
                          / F.lit(float(n - 1)))
                 * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    return (proj.join(F.broadcast(mdot), "k")
            .select("vec_id", F.col("k").cast("int").alias("k"),
                    z.alias("z")))


# --------------------------------------------------------------------------
# ext_kmeans_update_step — the Lloyd centroid-update completing the loop
# --------------------------------------------------------------------------

_KMEANS_UPDATE_SQL = f"""
WITH {_KMEANS_ASSIGN_SQL},
members AS (SELECT vec_id, c_id FROM assign WHERE rn = 1),
newc AS (
    SELECT m.c_id, p.i,
           CAST(SUM(CAST(FLOOR(p.v * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sq,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM members m JOIN pos p ON p.vec_id = m.vec_id
    GROUP BY m.c_id, p.i
),
mv AS (
    SELECT n.c_id, ANY_VALUE(n.n) AS n_members,
           CAST(SUM(CAST(FLOOR(((n.sq * 1e0 / 1e6) / n.n - c.cv)
                               * ((n.sq * 1e0 / 1e6) / n.n - c.cv)
                               * 1e9 + 5e-1) AS BIGINT)) AS BIGINT) AS m2q
    FROM newc n JOIN cent c ON n.c_id = c.c_id AND n.i = c.i
    GROUP BY n.c_id
)
SELECT c_id AS cluster, n_members,
       FLOOR(SQRT(m2q * 1e0 / 1e9) * 1e6 + 5e-1) / 1e6 AS movement
FROM mv
"""


@register("ext_kmeans_update_step", oracle=_KMEANS_UPDATE_SQL,
          tags=("ext", "similarity", "clustering", "training"))
def ext_kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lloyd UPDATE step completing the k-means loop that
    ``ext_kmeans_assign`` starts: recompute each cluster's centroid as the
    mean of its assigned members and report how far every centroid moved —
    the convergence signal (movement -> 0) a clustering-based curation
    pass iterates on, and the quantity a k-means training driver logs per
    round. Assignment reuses the SHARED ``_kmeans_assignment`` /
    ``_KMEANS_ASSIGN_SQL`` fragment, so the two steps can never drift
    apart.

    Scale shape: the member-coordinate aggregation is one
    map-side-combinable (cluster, dim) shuffle of k x 64 output keys over
    a posexplode that exists only inside that aggregation; the old-centroid
    side is k x 64 rows and broadcasts; the movement reduce is a k-group
    aggregate. Member coordinates are int64-quantized (1e-6 — micro,
    not nano: a cluster can own the whole corpus, and nano terms would
    wrap int64 near 9.2e9 members where micro holds to 9.2e12 at a
    constant ≤5e-7 mean error) before the
    mean, making the per-dimension sums exact under any merge order; the
    mean, delta, square and sqrt are a fixed IEEE chain — bit-identical
    cross-engine. Iterating = re-seeding the assignment with these means
    (a 256-row broadcast), the same parameter-sized round-trip as
    ``ext_logreg_train_step``'s weight fetch."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    members = _kmeans_assignment(emb).select("vec_id", "cluster")
    pos = (emb.select("vec_id", F.posexplode("embedding").alias("i", "v0"))
           .select("vec_id", "i", F.col("v0").cast("double").alias("v")))
    newc = (members.join(pos, "vec_id")
            .groupBy("cluster", "i")
            .agg(F.sum(F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5))
                       .cast("long")).cast("long").alias("sq"),
                 F.count(F.lit(1)).cast("long").alias("n")))
    cent = (emb.where(F.col("vec_id").between(1, 4))
            .select(F.col("vec_id").alias("cluster"),
                    F.posexplode("embedding").alias("i", "cv0"))
            .select("cluster", "i", F.col("cv0").cast("double").alias("cv")))
    delta = (F.col("sq") * F.lit(1.0) / F.lit(1e6)) / F.col("n") - F.col("cv")
    term = F.floor(delta * delta * F.lit(1e9) + F.lit(0.5)).cast("long")
    mv = (newc.join(F.broadcast(cent), ["cluster", "i"])
          .groupBy("cluster")
          .agg(F.first("n").alias("n_members"),
               F.sum(term).cast("long").alias("m2q")))
    return mv.select(
        "cluster", "n_members",
        (F.floor(F.sqrt(F.col("m2q") * F.lit(1.0) / F.lit(1e9))
                 * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("movement"))


# --------------------------------------------------------------------------
# ext_centroid_drift — per-label centroid displacement from the global mean
# --------------------------------------------------------------------------

_CENTROID_DRIFT_SQL = f"""
WITH pos AS ({_POS_SQL}),
lab AS (
    SELECT label, i,
           CAST(SUM(CAST(FLOOR(v * 1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos GROUP BY label, i
),
gtot AS (
    SELECT i, CAST(SUM(s) AS BIGINT) AS sg, CAST(SUM(n) AS BIGINT) AS ng
    FROM lab GROUP BY i
),
d AS (
    SELECT l.label, l.n,
           l.s / (l.n * 1e6) - g.sg / (g.ng * 1e6) AS dd
    FROM lab l JOIN gtot g ON l.i = g.i
)
SELECT label, MIN(n) AS n_vectors,
       CAST(SUM(CAST(FLOOR(dd * dd * 1e9 + 5e-1) AS BIGINT)) AS BIGINT)
           AS dist2_nano
FROM d GROUP BY label
"""


@register("ext_centroid_drift", oracle=_CENTROID_DRIFT_SQL,
          tags=("ext", "embedding", "drift"))
def ext_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid displacement from the corpus centroid — the
    embedding-space cohort-drift monitor (the vector analog of the
    KS/JS/PSI scalar trio): a label whose centroid sits far from the
    global mean is a cluster the sampler over- or under-mixed, and in a
    production pipeline the same statistic over time-sliced cohorts is
    the embedding-drift alarm. Emits squared L2 displacement per label
    in exact nano units.

    Determinism: per-(label, dim) sums are int64 micro-quantized before
    any cross-partition reduce; the global centroid REUSES those sums
    (one shuffle, second grain is a 64-row re-aggregation); per-dim
    squared terms are nano-quantized before the 64-term sum, so every
    float op is a fixed-order scalar expression.

    Scale shape: one posexplode + one (label, dim) map-side-combinable
    shuffle over ≤ |labels|·64 keys; everything after is label-count
    sized. No windows, no second corpus pass."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    pos = (emb.select("label", F.posexplode("embedding").alias("i0", "v0"))
           .select("label", (F.col("i0") + 1).alias("i"),
                   F.col("v0").cast("double").alias("v")))
    # lab feeds BOTH the per-label side and the global re-aggregation;
    # truncate its lineage (|labels| x 64 rows) so the corpus parquet is
    # scanned once, not once per consumer
    lab = (pos.groupBy("label", "i")
           .agg(F.sum(F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5))
                      .cast("long")).cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"))
           .localCheckpoint(eager=False))
    glob = (lab.groupBy("i")
            .agg(F.sum("s").cast("long").alias("sg"),
                 F.sum("n").cast("long").alias("ng")))
    dd = (F.col("s") / (F.col("n") * F.lit(1e6))
          - F.col("sg") / (F.col("ng") * F.lit(1e6)))
    d = lab.join(glob, "i").select("label", "n", dd.alias("dd"))
    return (d.groupBy("label")
            .agg(F.min("n").alias("n_vectors"),
                 F.sum(F.floor(F.col("dd") * F.col("dd") * F.lit(1e9)
                               + F.lit(0.5)).cast("long"))
                 .cast("long").alias("dist2_nano")))


# --------------------------------------------------------------------------
# ext_norm_outliers — embedding L2-norm z-score outliers
# --------------------------------------------------------------------------

_NORM_TOPK = 20

_NORM_OUTLIERS_SQL = f"""
WITH pos AS ({_POS_SQL}),
nrm AS (
    SELECT vec_id, label,
           sqrt(CAST(SUM(CAST(FLOOR(v * v * 1e9 + 5e-1) AS BIGINT))
                     AS BIGINT) / 1e9) AS nrm
    FROM pos GROUP BY vec_id, label
),
q AS (
    SELECT vec_id, label, nrm,
           CAST(FLOOR(nrm * 1e6 + 5e-1) AS BIGINT) AS nq,
           CAST(FLOOR(nrm * 1e3 + 5e-1) AS BIGINT) AS nq3
    FROM nrm
),
stats AS (
    SELECT CAST(SUM(nq) AS BIGINT) AS s6,
           CAST(SUM(nq3 * nq3) AS BIGINT) AS s33,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q
),
z AS (
    SELECT vec_id, label,
           CAST(FLOOR((nrm - s6 / (n * 1e6))
                      / sqrt(GREATEST(s33 / (n * 1e6) - (s6 / (n * 1e6))
                                      * (s6 / (n * 1e6)), 1e-12))
                      * 1e6 + 5e-1) AS BIGINT) AS z_micro,
           CAST(FLOOR(nrm * 1e6 + 5e-1) AS BIGINT) AS norm_micro
    FROM q, stats
)
SELECT vec_id, label, norm_micro, z_micro
FROM z
ORDER BY abs(z_micro) DESC, vec_id
LIMIT {_NORM_TOPK}
"""


@register("ext_norm_outliers", oracle=_NORM_OUTLIERS_SQL,
          tags=("ext", "embedding", "quality"))
def ext_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm outliers: vectors whose norm z-score is extreme
    are the classic embedding-pipeline failure signatures (zero vectors
    from a crashed encoder shard, exploding norms from fp16 overflow,
    unnormalized batches mixed into a normalized corpus) — the cheap
    per-vector sanity gate run before any cosine-based op trusts the
    corpus. Top-{_NORM_TOPK} by |z|, deterministic tie-break on vec_id.

    Determinism: squared components nano-quantized before the 64-term
    fold; corpus mean/variance from micro/milli-quantized norm sums
    (exact int64, order-free); one fixed-order z expression; z itself
    micro-quantized BEFORE the |z| ordering so the top-k comparator
    compares exact integers, never raw doubles.

    Scale shape: one narrow per-vector fold (no posexplode shuffle — the
    fold is row-local), a 1-row stats reduce broadcast back, and a
    global top-k that lowers to TakeOrderedAndProject (per-partition
    heaps + driver merge of {_NORM_TOPK}), never a full sort."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    # row-local norm fold: aggregate() over the array, quantizing each
    # squared component exactly as the oracle's per-(vec, dim) floor
    nrm2 = F.expr(
        "aggregate(embedding, 0L, (acc, x) -> acc + cast(floor("
        "cast(x as double) * cast(x as double) * 1e9 + 0.5) as bigint))")
    # the narrow norm table feeds both the corpus stats and the output;
    # truncating here drops the 64-float embedding column from lineage,
    # so the wide parquet is scanned once
    q = (emb.select("vec_id", "label",
                    F.sqrt(nrm2.cast("long") / F.lit(1e9)).alias("nrm"))
         .select("vec_id", "label", "nrm",
                 F.floor(F.col("nrm") * F.lit(1e6) + F.lit(0.5))
                 .cast("long").alias("nq"),
                 F.floor(F.col("nrm") * F.lit(1e3) + F.lit(0.5))
                 .cast("long").alias("nq3"))
         .localCheckpoint(eager=False))
    stats = q.agg(F.sum("nq").cast("long").alias("s6"),
                  F.sum(F.col("nq3") * F.col("nq3")).cast("long")
                  .alias("s33"),
                  F.count(F.lit(1)).cast("long").alias("n"))
    mean = F.col("s6") / (F.col("n") * F.lit(1e6))
    var = (F.col("s33") / (F.col("n") * F.lit(1e6)) - mean * mean)
    z = (F.col("nrm") - mean) / F.sqrt(F.greatest(var, F.lit(1e-12)))
    return (q.crossJoin(F.broadcast(stats))
            .select("vec_id", "label",
                    F.floor(F.col("nrm") * F.lit(1e6) + F.lit(0.5))
                    .cast("long").alias("norm_micro"),
                    F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("z_micro"))
            .orderBy(F.abs(F.col("z_micro")).desc(), "vec_id")
            .limit(_NORM_TOPK))


# --------------------------------------------------------------------------
# ext_embedding_random_projection — JL projection with a hash-sign matrix
# --------------------------------------------------------------------------

_JL_OUT = 16


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 for input dim i, output dim j: parity of
    md5("i:j"), computed ONCE in Python and embedded as literals in both
    engines' expressions — sign-matrix portability by construction, no
    engine hash algebra involved (Achlioptas 2003: ±1 entries satisfy
    the JL lemma with the same guarantees as Gaussians)."""
    import hashlib

    return 1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15],
                    16) % 2 == 0 else -1


def _jl_expr(j: int, spark_side: bool) -> str:
    """The j-th projection as one fixed-order sum of 64 signed terms —
    IDENTICAL text on both engines except array indexing (Spark 0-based,
    DuckDB 1-based) — scaled by 1/sqrt(16)."""
    terms = []
    for i in range(1, 65):
        s = _jl_sign(i, j)
        idx = i - 1 if spark_side else i
        terms.append(f"({s}.0 * CAST(embedding[{idx}] AS DOUBLE))")
    return "(" + " + ".join(terms) + ") * 2.5e-1"


_JL_SQL = "\nUNION ALL\n".join(
    f"""SELECT vec_id, {j} AS j,
       CAST(FLOOR({_jl_expr(j, spark_side=False)} * 1e6 + 5e-1) AS BIGINT)
           AS proj_micro
FROM embeddings"""
    for j in range(_JL_OUT))


@register("ext_embedding_random_projection", oracle=_JL_SQL,
          tags=("ext", "embedding", "projection"))
def ext_embedding_random_projection(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic ±1 sign matrix (Achlioptas 2003) — the cheap
    dimensionality reducer used before LSH bucketing, ANN indexing, or
    sketch transport when PCA's data pass is not worth it; unlike
    `ext_embedding_pca` it needs NO statistics of the corpus, so it
    parallelizes embarrassingly and never drifts as data grows. The sign
    matrix is generated in Python (md5 parity) and embedded as literals
    in BOTH engines' expressions, making cross-engine agreement a matter
    of shared arithmetic text, not shared hash built-ins.

    Scale shape: entirely row-local — ONE scan computes all 16
    coordinates as fixed-order 64-term signed sums inside whole-stage
    codegen, then ``stack`` unpivots to long form (a Generate over
    already-computed columns, not 16 re-scans — measured 2.0 s -> 0.9 s
    warm at sf0.1 vs the union-of-scans plan); no explode of the input,
    no join, no shuffle. Projections are micro-quantized for the exact
    cross-engine hash. (The oracle's UNION ALL over the DuckDB view is
    plan-shape-irrelevant: only the Spark side runs at scale.)"""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    wide = emb.select(
        "vec_id",
        *[F.floor(F.expr(_jl_expr(j, spark_side=True)) * F.lit(1e6)
                  + F.lit(0.5)).cast("long").alias(f"p{j}")
          for j in range(_JL_OUT)])
    stack = ("stack(" + str(_JL_OUT) + ", "
             + ", ".join(f"{j}, p{j}" for j in range(_JL_OUT))
             + ") as (j, proj_micro)")
    return wide.selectExpr("vec_id", stack)


# --------------------------------------------------------------------------
# ext_silhouette_simplified — cluster-quality audit from centroid distances
# --------------------------------------------------------------------------

def _kmeans_distances(emb: DataFrame) -> DataFrame:
    """(vec_id, c_id, d2q): int64-quantized squared distance from every
    corpus vector to every one of the 4 seed centroids — the all-pairs
    stage `_kmeans_assignment` reduces with argmin and the silhouette
    audit reduces with best-vs-second-best. Broadcast k-row centroid
    side, row-local zip_with/aggregate distances."""
    cent = (emb.where(F.col("vec_id").between(1, 4))
            .select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("c_emb")))
    qterm = (lambda x, y:
             F.floor((x.cast("double") - y.cast("double"))
                     * (x.cast("double") - y.cast("double"))
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d2q = F.aggregate(F.zip_with("embedding", "c_emb", qterm),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    return (emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(cent))
            .select("vec_id", "c_id", d2q.alias("d2q")))


@register(
    "ext_silhouette_simplified",
    oracle=f"""
        WITH {_KMEANS_ASSIGN_SQL},
        sv AS (
            SELECT vec_id,
                   MAX(CASE WHEN rn = 1 THEN c_id END) AS cluster,
                   MAX(CASE WHEN rn = 1 THEN d2q END) AS a2,
                   MAX(CASE WHEN rn = 2 THEN d2q END) AS b2
            FROM assign GROUP BY vec_id
        ),
        s AS (
            SELECT vec_id, cluster,
                   CASE WHEN GREATEST(a2, b2) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(FLOOR((sqrt(b2 * 1e0) - sqrt(a2 * 1e0))
                                        / sqrt(GREATEST(a2, b2) * 1e0)
                                        * 1e6 + 5e-1) AS BIGINT) END
                       AS s_micro
            FROM sv
        )
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN s_micro < 500000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boundary,
               CAST(FLOOR(SUM(s_micro) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
                   AS mean_s_micro
        FROM s GROUP BY cluster
    """,
    tags=("ext", "similarity", "clustering"),
)
def ext_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (Hruschka et al. 2004 — the medoid-free
    variant the large-scale clustering literature actually computes):
    per vector, a = distance to its OWN centroid, b = distance to the
    nearest OTHER centroid, s = (b − a)/max(a, b); reported per cluster
    as mean silhouette plus the count of boundary vectors (s < 0.5 —
    nearer the decision margin than their cluster core; under nearest-
    centroid assignment a ≤ b always, so s ∈ [0, 1]). This is the
    cluster-QUALITY audit `ext_cluster_purity` (label agreement) and
    `ext_kmeans_assign` (inertia) both miss: inertia always improves
    with more clusters, silhouette peaks at the right k. Full silhouette
    is O(N²) pairwise; the centroid form is the standard scale
    substitute and shares the seed centroids with the whole k-means
    family.

    Determinism: quantized squared distances are exact int64 (the
    `_kmeans_assignment` discipline), so best/second-best selection is
    integer-exact; the 1e-9 scale cancels inside s = (√b2 − √a2)/√max,
    one fixed-order IEEE expression over two integers, micro-quantized
    per vector BEFORE the cluster mean (exact integer sum).

    Scale shape: broadcast k-row centroid side; row-local distances; ONE
    groupBy(vec_id) whose sorted 4-element struct array yields own and
    runner-up in a single reduce; k-group close. Two shuffles, both
    map-side combinable."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    arr = (_kmeans_distances(emb)
           .groupBy("vec_id")
           .agg(F.array_sort(F.collect_list(F.struct("d2q", "c_id")))
                .alias("arr")))
    sv = arr.select(
        "vec_id",
        F.col("arr")[0]["c_id"].alias("cluster"),
        F.col("arr")[0]["d2q"].alias("a2"),
        F.col("arr")[1]["d2q"].alias("b2"))
    s_expr = F.when(F.greatest("a2", "b2") == 0, F.lit(0).cast("long")) \
        .otherwise(F.floor((F.sqrt(F.col("b2") * F.lit(1e0))
                            - F.sqrt(F.col("a2") * F.lit(1e0)))
                           / F.sqrt(F.greatest("a2", "b2") * F.lit(1e0))
                           * F.lit(1e6) + F.lit(0.5)).cast("long"))
    s = sv.select("cluster", s_expr.alias("s_micro"))
    return (s.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                 F.sum(F.when(F.col("s_micro") < 500000, 1).otherwise(0))
                 .cast("long").alias("n_boundary"),
                 F.floor(F.sum("s_micro") * F.lit(1e0)
                         / F.count(F.lit(1)) + F.lit(0.5))
                 .cast("long").alias("mean_s_micro")))


# --------------------------------------------------------------------------
# ext_centroid_classifier_eval — nearest-centroid accuracy on a held split
# --------------------------------------------------------------------------

_NCC_BUCKET_DUCK = ("CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)),"
                    " 1, 15)) AS BIGINT) % 1000")


@register(
    "ext_centroid_classifier_eval",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        bkt AS (
            SELECT vec_id, {_NCC_BUCKET_DUCK} AS bucket FROM embeddings
        ),
        tr AS (
            SELECT p.label, p.i,
                   CAST(SUM(CAST(FLOOR(p.v * 1e6 + 5e-1) AS BIGINT))
                        AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM pos p JOIN bkt b ON p.vec_id = b.vec_id
            WHERE b.bucket < 500
            GROUP BY p.label, p.i
        ),
        d AS (
            SELECT p.vec_id, p.label AS label_true, t.label AS label_cand,
                   CAST(SUM(CAST(FLOOR((p.v - t.s / (t.n * 1e6))
                                       * (p.v - t.s / (t.n * 1e6))
                                       * 1e9 + 5e-1) AS BIGINT))
                        AS BIGINT) AS d2q
            FROM pos p JOIN bkt b ON p.vec_id = b.vec_id
                       JOIN tr t ON p.i = t.i
            WHERE b.bucket >= 500
            GROUP BY p.vec_id, p.label, t.label
        ),
        a AS (
            SELECT vec_id, label_true, label_cand AS label_pred,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2q, label_cand) AS rn
            FROM d
        )
        SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(FLOOR(SUM(SUM(CASE WHEN label_true = label_pred
                                       THEN 1 ELSE 0 END)) OVER () * 1e6
                          / SUM(COUNT(*)) OVER () + 5e-1) AS BIGINT)
                   AS accuracy_micro
        FROM a WHERE rn = 1
        GROUP BY label_true, label_pred
    """,
    tags=("ext", "similarity", "eval"),
)
def ext_centroid_classifier_eval(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier evaluation on a held-out split: fit
    per-label mean embeddings on the md5-bucket training half, assign
    every held-out vector to its nearest label centroid, and emit the
    confusion matrix plus overall accuracy — the 5-minute baseline every
    embedding-quality review runs BEFORE training a probe ("if nearest-
    centroid gets 92%, the labels are linearly separable and the
    embedding is fine; if it gets 40%, no classifier will save it").
    Completes the eval family over `ext_cluster_purity` (unsupervised
    agreement) and `ext_quality_auc` (scalar scores) with the
    supervised, split-honest variant.

    Determinism: centroids use per-coordinate quantized-sum means (the
    `ext_centroid_drift` discipline); distances quantize per coordinate
    before int64 sums; argmin ties break on label. The split is the
    deterministic md5 bucket, layout- and order-free.

    Scale shape: the centroid side is |labels| rows and BROADCAST;
    distances are row-local zip_with folds over the eval half; ONE
    groupBy(vec_id) sorted-struct argmin; a |labels|² confusion-grid
    close. Same two-shuffle shape as `ext_kmeans_assign`."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    bucket = F.expr("cast(conv(substring(md5(cast(vec_id as string)), 1,"
                    " 15), 16, 10) as bigint) % 1000")
    tr = (emb.where(bucket < 500)
          .select("label", F.posexplode("embedding").alias("i0", "v"))
          .select("label", (F.col("i0") + 1).alias("i"),
                  F.col("v").cast("double").alias("v"))
          .groupBy("label", "i")
          .agg(F.sum(F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5))
                     .cast("long")).alias("s"),
               F.count(F.lit(1)).alias("n")))
    cent = (tr.select("label", "i",
                      (F.col("s") / (F.col("n") * F.lit(1e6)))
                      .alias("cv"))
            .groupBy("label")
            .agg(F.transform(F.array_sort(F.collect_list(
                F.struct("i", "cv"))), lambda x: x["cv"])
                .alias("c_emb")))
    qterm = (lambda x, y:
             F.floor((x.cast("double") - y)
                     * (x.cast("double") - y)
                     * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d2q = F.aggregate(F.zip_with("embedding", "c_emb", qterm),
                      F.lit(0).cast("long"), lambda acc, t: acc + t)
    ev = (emb.where(bucket >= 500)
          .crossJoin(F.broadcast(cent.withColumnRenamed("label",
                                                        "label_cand")))
          .select(F.col("vec_id"), F.col("label").alias("label_true"),
                  "label_cand", d2q.alias("d2q"))
          .groupBy("vec_id", "label_true")
          .agg(F.min(F.struct("d2q", "label_cand")).alias("m"))
          .select("label_true", F.col("m.label_cand").alias("label_pred")))
    conf = (ev.groupBy("label_true", "label_pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    from pyspark.sql.window import Window as _W
    w = _W.partitionBy()
    acc = F.floor(F.sum(F.when(F.col("label_true") == F.col("label_pred"),
                               F.col("n")).otherwise(0)).over(w)
                  * F.lit(1e6) / F.sum("n").over(w) + F.lit(0.5)) \
        .cast("long")
    return conf.select("label_true", "label_pred", "n",
                       acc.alias("accuracy_micro"))


# --------------------------------------------------------------------------
# ext_hnsw_layer_plan — HNSW level-assignment audit
# --------------------------------------------------------------------------

#: shared body ({src} = embeddings view; {h} = the engine's md5->int64
#: hash spelling — the BUCKET_SQL/BUCKET_SQL_SPARK pattern).
_HNSW_PLAN_BODY = """
WITH lv AS (
    SELECT vec_id,
           CAST(FLOOR(0e0 - LN((({h}) % 1000000 + 1) / 1e6) / LN(16e0))
                AS BIGINT) AS lvl
    FROM {src}
),
c AS (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM lv GROUP BY lvl),
t AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n_total FROM c)
SELECT c.lvl AS level, c.n_vectors,
       CAST(SUM(c.n_vectors) OVER (ORDER BY c.lvl DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_at_or_above,
       CAST(FLOOR(t.n_total * (15e0 / 16e0)
                  * EXP(c.lvl * LN(1e0 / 16e0)) + 5e-1) AS BIGINT)
           AS expected_n
FROM c, t
"""

_HNSW_H_DUCK = ("CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)),"
                " 1, 15)) AS BIGINT)")
_HNSW_H_SPARK = ("cast(conv(substring(md5(cast(vec_id as string)), 1, 15),"
                 " 16, 10) as bigint)")


@register("ext_hnsw_layer_plan",
          oracle=_HNSW_PLAN_BODY.format(src="embeddings", h=_HNSW_H_DUCK),
          tags=("ext", "similarity", "ann", "planning"))
def ext_hnsw_layer_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layer-assignment plan (Malkov & Yashunin 2016, §4: level =
    floor(-ln(U) · mL) with mL = 1/ln(M), M = 16) — the capacity audit
    run BEFORE building the graph: per level, how many vectors land
    there, the cumulative graph size at-or-above (each node appears in
    every layer up to its level — this column IS the per-layer index
    memory bill), and the geometric expectation N·(1-1/M)·(1/M)^l to
    check the assignment against theory. The top layer's size bounds
    entry-point fan-in; a fat top layer means a bad hash/mL choice
    before any distance computation is spent. Completes the ANN
    planning family: IVF (`ext_ann_ivf_topk`) and PQ (`ext_ann_pq_adc`)
    have cost audits; this is the graph-index counterpart.

    Determinism: U comes from the md5-of-vec_id integer hash mapped to
    (0, 1] at micro granularity (never engine RNG), so levels are
    reproducible across engines/runs/partitionings; -ln(U)/ln(16) uses
    only the bit-exact LN; the exponential expectation spells power as
    EXP(l·LN(1/16)) (POWER() is outside the bit-exact set).

    Scale shape: one map-side level assignment + a ≤6-row reduce; the
    cumulative window runs over the level census, not the corpus."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("hnsw_embeddings")
    return spark.sql(_HNSW_PLAN_BODY.format(src="hnsw_embeddings",
                                            h=_HNSW_H_SPARK))


# --------------------------------------------------------------------------
# ext_cosine_pair_histogram — embedding-space similarity profile
# --------------------------------------------------------------------------

@register(
    "ext_cosine_pair_histogram",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        dots AS (
            SELECT a.vec_id,
                   SUM(a.v * b.v) AS dp,
                   SQRT(SUM(a.v * a.v)) AS na,
                   SQRT(SUM(b.v * b.v)) AS nb
            FROM pos a JOIN pos b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
            GROUP BY a.vec_id
        ),
        q AS (
            SELECT CAST(FLOOR(dp / (na * nb) * 1e6 + 5e-1) AS BIGINT)
                       AS cos_micro
            FROM dots
        ),
        b AS (
            SELECT LEAST(GREATEST((cos_micro + 1000000) // 200000, 0), 9)
                       AS bin,
                   cos_micro
            FROM q
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(bin * 200000 - 1000000 AS BIGINT) AS bin_lo_micro,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(FLOOR(SUM(cos_micro) * 1e0 / COUNT(*) + 5e-1)
                    AS BIGINT) AS mean_cos_micro
        FROM b GROUP BY bin
    """,
    tags=("ext", "similarity", "profile"),
)
def ext_cosine_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-space similarity profile: a 10-bin histogram of
    adjacent-pair cosine similarities over [-1, 1] — the distribution
    SemDeDup-class thresholds are read off (where does the corpus's
    natural similarity mass sit, and how fat is the >0.9 near-dup
    tail?). Before anyone picks `ext_semdedup`'s cutoff or audits
    `ext_dup_embedding_lsh_verified`'s recall, this is the plot they
    look at. Adjacent-pair sampling is the engine's standard linear
    probe (`ext_self_bleu_adjacent`, Bradley-Terry): an unbiased
    similarity sample without the O(N²) pair explosion.

    Determinism: the per-pair cosine follows THE shared exact-cosine
    discipline (`cosine_scores`): sequential-fold dot product JVM-side,
    grouped position-sum in the oracle, micro-quantized before any
    bucketing, so the bin key is exact integer algebra; histogram
    reduce is integer counts.

    Scale shape: one self-join on vec_id + 1 (co-partitioned range
    join), row-local higher-order-function vector algebra, one ≤10-row
    reduce — scan-speed at any corpus size."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("va"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"),
                   F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vb") == F.col("va") + 1)
    cos_micro = F.floor(cosine(F.col("ea"), F.col("eb")) * F.lit(1e6)
                        + F.lit(0.5)).cast("long")
    q = pairs.select(cos_micro.alias("cos_micro"))
    bin_ = F.least(F.greatest(
        F.expr("(cos_micro + 1000000) div 200000"), F.lit(0)), F.lit(9)) \
        .cast("long")
    return (q.select(bin_.alias("bin"), "cos_micro")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.floor(F.sum("cos_micro") * F.lit(1e0)
                         / F.count(F.lit(1)) + F.lit(0.5)).cast("long")
                 .alias("mean_cos_micro"))
            .select("bin", (F.col("bin") * 200000 - 1000000).cast("long")
                    .alias("bin_lo_micro"), "n_pairs", "mean_cos_micro"))


# --------------------------------------------------------------------------
# ext_colbert_maxsim — late-interaction MaxSim retrieval scoring
# --------------------------------------------------------------------------

#: shared oracle: each 64-dim vector is read as 4 "token" slices of 16
#: dims (tok = (i-1)//16, j = (i-1)%16); the query is vec_id 0; every
#: (candidate token, query token) dot product quantizes per TERM at 1e9
#: before the 16-term integer sum (exact in any order — the guard the
#: raw-double cosine fragments don't need but MaxSim's max() boundary
#: does), the per-query-token max is an integer max, and the document
#: score is the exact 4-term integer sum.
_MAXSIM_ORACLE = """
WITH pos AS (
    SELECT vec_id, label, (t.i - 1) // 16 AS tok, (t.i - 1) % 16 AS j,
           CAST(embedding[t.i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, 64) t(i)
),
q AS (SELECT tok AS qtok, j, v AS qv FROM pos WHERE vec_id = 0),
dots AS (
    SELECT p.vec_id, ANY_VALUE(p.label) AS label, p.tok, q.qtok,
           CAST(SUM(CAST(FLOOR(p.v * q.qv * 1e9 + 5e-1) AS BIGINT))
                AS BIGINT) AS dot_nano
    FROM pos p JOIN q ON p.j = q.j
    WHERE p.vec_id <> 0
    GROUP BY p.vec_id, p.tok, q.qtok
),
best AS (
    SELECT vec_id, ANY_VALUE(label) AS label, qtok,
           MAX(dot_nano) AS m_nano
    FROM dots GROUP BY vec_id, qtok
),
scored AS (
    SELECT vec_id, ANY_VALUE(label) AS label,
           CAST(SUM(m_nano) AS BIGINT) AS maxsim_nano
    FROM best GROUP BY vec_id
)
SELECT vec_id, label, maxsim_nano
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY maxsim_nano DESC, vec_id)
          AS rk FROM scored)
WHERE rk <= 10
"""


@register("ext_colbert_maxsim", oracle=_MAXSIM_ORACLE,
          tags=("ext", "similarity", "retrieval"))
def ext_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim retrieval scoring (ColBERT, Khattab &
    Zaharia, SIGIR 2020): treat each stored 64-dim embedding as 4
    16-dim token vectors; score a candidate against the query (vec_id
    0) as sum over QUERY tokens of the max dot product across the
    candidate's tokens. The ranking member between single-vector cosine
    (`ext_sim_search_topk` — cheap, lossy) and full cross-attention
    (impossible at corpus scale): fine-grained token matching with an
    embarrassingly-parallel corpus pass. Emits the top-10 candidates.

    Determinism: every (token, token) dot quantizes per TERM at 1e9
    before the 16-term exact integer sum (MaxSim's max() sits right on
    comparison boundaries, so raw double sums would be one LSB from a
    rank flip); the per-query-token max and the 4-term document score
    are pure integer algebra; the top-10 orders by the integer score
    with a vec_id tie-break.

    Scale shape: ONE corpus pass — posexplode to (vec, tok, j) is
    scan-stage, the 64-row query side broadcasts, and the two reduces
    (dots, per-qtok max) are map-side combinable on vec-local keys, so
    the only exchange is the final top-10 TakeOrderedAndProject. Work
    is corpus_tokens x query_tokens = 4x a single-vector scan — the
    late-interaction cost model exactly.

    Reference basis: scoring candidates against a reference signal
    (the ETROC discriminator comparing each pixel signal to its
    threshold and keeping the best response,
    DAQ_self-triggering.md:343-346); MaxSim operator from Khattab &
    Zaharia 2020 (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    pos = (emb.select("vec_id", "label",
                      F.posexplode("embedding").alias("i", "v0"))
           .select("vec_id", "label",
                   (F.col("i") / 16).cast("int").alias("tok"),
                   (F.col("i") % 16).alias("j"),
                   F.col("v0").cast("double").alias("v")))
    q = (pos.where(F.col("vec_id") == 0)
         .select(F.col("tok").alias("qtok"), "j", F.col("v").alias("qv")))
    dots = (pos.where(F.col("vec_id") != 0)
            .join(F.broadcast(q), "j")
            .groupBy("vec_id", "tok", "qtok")
            .agg(F.any_value(F.col("label")).alias("label"),
                 F.sum(qint(F.col("v") * F.col("qv"), 9)).alias("dot_nano")))
    best = (dots.groupBy("vec_id", "qtok")
            .agg(F.any_value(F.col("label")).alias("label"),
                 F.max("dot_nano").alias("m_nano")))
    scored = (best.groupBy("vec_id")
              .agg(F.any_value(F.col("label")).alias("label"),
                   F.sum("m_nano").alias("maxsim_nano")))
    return (scored.orderBy(F.col("maxsim_nano").desc(), "vec_id")
            .limit(10).select("vec_id", "label", "maxsim_nano"))


# --------------------------------------------------------------------------
# ext_davies_bouldin — cluster-validity index from scatter/separation
# --------------------------------------------------------------------------

#: shared close over `asg(vec_id, cluster, d2q)` (the rn=1 nearest-
#: centroid assignment) and `cent_pos(c_id, i, cv)` (centroid
#: coordinates): per-cluster mean radius, pairwise centroid
#: separations, R_ij = (s_i + s_j) / d_ij, D_i = max_j R_ij, and the
#: Davies-Bouldin index as the mean of D_i over the k clusters.
_DB_TAIL = """
s AS (
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(FLOOR(SQRT(d2q / 1e9) * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS sum_r_micro
    FROM {asg} GROUP BY cluster
),
sm AS (
    SELECT cluster, n_members,
           CAST(FLOOR(CAST(sum_r_micro AS DOUBLE) / n_members + 5e-1)
                AS BIGINT) AS s_micro
    FROM s
),
cd AS (
    SELECT a.c_id AS ci, b.c_id AS cj,
           CAST(SUM(CAST(FLOOR((a.cv - b.cv) * (a.cv - b.cv) * 1e9
                               + 5e-1) AS BIGINT)) AS BIGINT) AS d2q
    FROM {cent} a JOIN {cent} b ON a.i = b.i AND a.c_id <> b.c_id
    GROUP BY 1, 2
),
r AS (
    SELECT si.cluster, sj.cluster AS other,
           CAST(FLOOR((si.s_micro + sj.s_micro)
                      / (SQRT(cd.d2q / 1e9) * 1e6) * 1e6 + 5e-1)
                AS BIGINT) AS r_micro
    FROM sm si JOIN cd ON cd.ci = si.cluster
               JOIN sm sj ON sj.cluster = cd.cj
),
dmax AS (
    SELECT cluster, other, r_micro,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY r_micro DESC, other) AS rn
    FROM r
)
SELECT m.cluster, m.n_members, m.s_micro,
       d.other AS worst_other, d.r_micro AS r_max_micro,
       CAST(FLOOR(CAST(SUM(d.r_micro) OVER () AS DOUBLE)
                  / COUNT(*) OVER () + 5e-1) AS BIGINT) AS db_micro
FROM sm m JOIN dmax d ON d.cluster = m.cluster AND d.rn = 1
ORDER BY m.cluster
"""


@register(
    "ext_davies_bouldin",
    oracle=f"""
        WITH {_KMEANS_ASSIGN_SQL},
        asg AS (SELECT vec_id, c_id AS cluster, d2q FROM assign
                WHERE rn = 1),
        {_DB_TAIL.format(asg="asg", cent="cent")}
    """,
    tags=("ext", "similarity", "clustering", "audit"),
)
def ext_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin index (Davies & Bouldin 1979): per cluster the
    mean member-to-centroid radius s_i, per centroid pair the
    separation d_ij, similarity R_ij = (s_i + s_j) / d_ij, and
    per-cluster worst-case D_i = max_j R_ij — the index is the mean
    D_i (lower is better; D_i > 1 flags a cluster whose scatter
    exceeds its separation). The third leg of the cluster-validity
    tripod: `ext_silhouette_simplified` scores members,
    `ext_cluster_purity` checks labels, Davies-Bouldin scores the
    GEOMETRY per cluster and names each cluster's most-confusable
    neighbor (`worst_other`) — the merge candidate a k-selection
    sweep inspects first.

    Determinism: member radii micro-quantize per row from the exact
    int64 `_kmeans_assignment` distances before the per-cluster
    integer sum; centroid separations are the same nano-quantized
    integer algebra; each R_ij and the final mean are fixed-order
    IEEE chains over integers; the argmax orders by (r_micro DESC,
    other).

    Scale shape: the corpus touches ONE broadcast-centroid distance
    pass and ONE groupBy(cluster) reduce; everything after `s` is
    k-row algebra (k = 4). The k x k similarity grid is an
    allowlisted bounded cross.

    Reference basis: cluster-separation quality audit on the
    embedding clusters (the clustering family's shared fixture);
    index from Davies & Bouldin, IEEE TPAMI 1979 (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    _kmeans_assignment(emb).createOrReplaceTempView("db_asg")
    (emb.where(F.col("vec_id").between(1, 4))
     .select(F.col("vec_id").alias("c_id"),
             F.posexplode("embedding").alias("pos0", "cv0"))
     .select("c_id", (F.col("pos0") + 1).alias("i"),
             F.col("cv0").cast("double").alias("cv"))
     .createOrReplaceTempView("db_cent_pos"))
    return spark.sql(
        "WITH " + _DB_TAIL.format(asg="db_asg", cent="db_cent_pos"))


# --------------------------------------------------------------------------
# ext_mmd_linear — linear-time MMD drift test between embedding cohorts
# --------------------------------------------------------------------------

#: shared tail over `{emb}` (vec_id, label) and `{pos}` (vec_id, i, v):
#: Gretton's linear-time MMD^2 estimator between the label < 5 and
#: label >= 5 cohorts — deterministic index pairing, four RBF kernel
#: legs per pair (sigma^2 = 1 on the unit-norm embeddings), per-pair
#: h terms nano-quantized before the exact integer sum.
_MMD_TAIL = """
idx AS (
    SELECT vec_id, label < 5 AS grp,
           ROW_NUMBER() OVER (PARTITION BY (label < 5)
                              ORDER BY vec_id) AS rn
    FROM {emb}
),
pairs AS (
    SELECT CAST(FLOOR((rn - 1) / 2e0) AS BIGINT) AS pid,
           MAX(CASE WHEN grp AND rn % 2 = 1 THEN vec_id END) AS a1,
           MAX(CASE WHEN grp AND rn % 2 = 0 THEN vec_id END) AS a2,
           MAX(CASE WHEN NOT grp AND rn % 2 = 1 THEN vec_id END) AS b1,
           MAX(CASE WHEN NOT grp AND rn % 2 = 0 THEN vec_id END) AS b2
    FROM idx GROUP BY CAST(FLOOR((rn - 1) / 2e0) AS BIGINT)
),
full_pairs AS (
    SELECT pid, a1, a2, b1, b2 FROM pairs
    WHERE a1 IS NOT NULL AND a2 IS NOT NULL
      AND b1 IS NOT NULL AND b2 IS NOT NULL
),
legs AS (
    SELECT pid, a1 AS u, a2 AS v, 1 AS sgn FROM full_pairs
    UNION ALL
    SELECT pid, b1, b2, 1 FROM full_pairs
    UNION ALL
    SELECT pid, a1, b2, -1 FROM full_pairs
    UNION ALL
    SELECT pid, a2, b1, -1 FROM full_pairs
),
d2 AS (
    SELECT l.pid, l.sgn, l.u, l.v,
           CAST(SUM(CAST(FLOOR((pu.v - pv.v) * (pu.v - pv.v) * 1e9
                               + 5e-1) AS BIGINT)) AS BIGINT) AS d2q
    FROM legs l
    JOIN {pos} pu ON pu.vec_id = l.u
    JOIN {pos} pv ON pv.vec_id = l.v AND pv.i = pu.i
    GROUP BY l.pid, l.sgn, l.u, l.v
),
h AS (
    SELECT pid,
           CAST(SUM(sgn * CAST(FLOOR(EXP(-(d2q / 1e9) / 2e0) * 1e9
                                     + 5e-1) AS BIGINT)) AS BIGINT)
               AS h_nano
    FROM d2 GROUP BY pid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(h_nano) AS BIGINT) AS sum_h_nano,
       CAST(FLOOR(CAST(SUM(h_nano) AS DOUBLE) / COUNT(*) / 1e3 + 5e-1)
            AS BIGINT) AS mmd2_micro
FROM h
"""


@register(
    "ext_mmd_linear",
    oracle=f"""
        WITH pos AS ({_POS_SQL}),
        {_MMD_TAIL.format(emb="embeddings", pos="pos")}
    """,
    tags=("ext", "similarity", "drift"),
)
def ext_mmd_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-time maximum mean discrepancy (Gretton et al. 2012,
    the MMD_l streaming estimator): are the label < 5 and label >= 5
    embedding cohorts drawn from the same distribution? Sample pairs
    (x_1,x_2), (y_1,y_2) by deterministic index pairing; per pair
    h = k(x1,x2) + k(y1,y2) - k(x1,y2) - k(x2,y1) with the RBF kernel
    exp(-||a-b||^2 / 2) on the unit-norm embeddings; MMD^2 is the mean
    h. The DISTRIBUTION-level drift detector the embedding family was
    missing: `ext_drift_ks` tests one scalar, `ext_psi_drift` bins one
    score, `ext_centroid_drift` compares first moments only — MMD sees
    every moment through the kernel, at linear cost (the quadratic
    U-statistic is the non-starter at corpus scale).

    Determinism: index pairing is exact ROW_NUMBER algebra; squared
    distances nano-quantize per dimension into exact int64; each
    kernel leg exponentiates the SAME double on both engines and
    nano-quantizes before the per-pair signed sum; the final mean is
    one fixed-order chain over exact integers.

    Scale shape: pairing is one bounded window over vec_ids; the four
    legs make ~2N kernel evaluations TOTAL via equi-joins on (vec_id,
    dim) — never an all-pairs product; one groupBy(pid) reduce and a
    scalar close. At 100x everything stays linear in the corpus.

    Reference basis: cross-cohort channel-distribution comparison
    (Documentation-Self-Triggering.html:194-239); estimator from
    Gretton et al., JMLR 2012 (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    emb.select("vec_id", "label").createOrReplaceTempView("mmd_emb")
    (emb.select("vec_id",
                F.posexplode("embedding").alias("pos0", "v0"))
     .select("vec_id", (F.col("pos0") + 1).alias("i"),
             F.col("v0").cast("double").alias("v"))
     .createOrReplaceTempView("mmd_pos"))
    return spark.sql(
        "WITH " + _MMD_TAIL.format(emb="mmd_emb", pos="mmd_pos"))
