"""Similarity & dedup over embeddings/documents (SURVEY §2.11 L2-L4,
L9-L10 + SimHash / embedding near-dup).

Scale doctrine (SURVEY §7.3): brute-force cosine is the declared *baseline*
(broadcast the tiny query side, never the corpus); the 100 TB paths are the
LSH variants (bucket-join candidate generation, exact re-rank on candidates
only) and banded SimHash (equi-join on 16-bit bands — pure shuffle, no
pairwise scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import rnd
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 5


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


@query(
    "similarity_topk_cosine",
    oracle=f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM base
          WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.q_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.q_emb, e.emb)
                   / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                      * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
      FROM q CROSS JOIN base e
      WHERE e.vec_id != q.q_id
    )
    SELECT q_id, neighbor_id, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {_TOP_K}
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: exact cosine top-k — brute-force baseline. The query side (5
    vectors) is broadcast; the corpus is scanned once, never shuffled for
    the join; ranking happens on the ROUNDED cosine so cross-engine last-bit
    noise cannot flip the top-k boundary."""
    e = load_tables(spark, sf_dir)["embeddings"]
    emb = _as_double(F.col("embedding"))
    base = e.select("vec_id", emb.alias("emb"))
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    cos = rnd(
        _dot(F.col("q_emb"), F.col("emb")) / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6
    )
    scored = (
        base.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOP_K)
        .select("q_id", "neighbor_id", "cos")
    )


@query("similarity_lsh_ann")  # rows-only: LSH bucketing is model-internal
def similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: approximate NN via random-hyperplane bucketing — the scale path.

    BucketedRandomProjectionLSH (seeded) hashes the corpus once; candidate
    generation is a bucket equi-join, exact distance re-ranks candidates
    only. At 100 TB the corpus never cross-joins anything.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir)["embeddings"]
    vec = e.select(
        "vec_id", array_to_vector(_as_double(F.col("embedding"))).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    ).fit(vec)
    q = vec.where(F.col("vec_id") < _N_QUERIES)
    hashed = model.transform(vec).cache()
    out = None
    for row_id in range(_N_QUERIES):
        key = q.where(F.col("vec_id") == row_id)
        # approxNearestNeighbors takes one key vector; loop over the 5
        # queries (driver-side loop over k keys is O(k), not O(data))
        knn = model.approxNearestNeighbors(hashed, key.first()["features"], _TOP_K + 1)
        knn = (
            knn.where(F.col("vec_id") != row_id)
            .select(
                F.lit(row_id).alias("q_id"),
                F.col("vec_id").alias("neighbor_id"),
                rnd(F.col("distCol"), 6).alias("dist"),
            )
            .limit(_TOP_K)
        )
        out = knn if out is None else out.unionByName(knn)
    return out


@query("dedup_minhash_pairs")  # rows-only: MinHash signatures are model-internal
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: near-dup candidate pairs via char-shingle MinHash LSH, verified
    with exact token-set Jaccard.

    Pipeline: 8-char shingles (array-native substring windows) → HashingTF
    (2^18 dims) → MinHashLSH (seeded) approxSimilarityJoin at Jaccard
    distance ≤ 0.9 → exact word-set Jaccard as the final filter. The
    LSH join is a bucket equi-join — the 100 TB-safe shape; fixtures have
    no near-dups at high τ, so the declared query reports the candidate
    pairs with their exact Jaccard at a permissive threshold.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_tables(spark, sf_dir)["documents"]
    k = 8
    # substring with a dynamic start needs the expr form
    docs = d.select(
        "doc_id",
        "text",
        F.expr(f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)),"
               f" i -> substring(text, i, {k}))").alias("shingles"),
        F.split("text", " ").alias("words"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feat = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42).fit(feat)
    pairs = lsh.approxSimilarityJoin(feat, feat, 0.95, distCol="lsh_dist")
    a, b = F.col("datasetA"), F.col("datasetB")
    inter = F.size(F.array_intersect(a["words"], b["words"])).cast("double")
    union = F.size(F.array_union(a["words"], b["words"])).cast("double")
    return (
        pairs.where(a["doc_id"] < b["doc_id"])
        .select(
            a["doc_id"].alias("doc_a"),
            b["doc_id"].alias("doc_b"),
            rnd(inter / union, 6).alias("jaccard_words"),
        )
        .where(F.col("jaccard_words") >= 0.3)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_simhash_bands",
    oracle=None,  # Spark xxhash64 has no DuckDB twin — rows-only
)
def dedup_simhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with banded blocking — the pure-SQL scale path.

    64-bit SimHash per doc from xxhash64(token) bit votes; candidate pairs
    via equi-join on any of four 16-bit bands (shuffle join, no pairwise
    scan), then exact Hamming distance filter via bit_count(xor).
    """
    d = load_tables(spark, sf_dir)["documents"]
    words = F.explode(F.split("text", " "))
    tok = d.select("doc_id", words.alias("w")).select(
        "doc_id", F.xxhash64("w").alias("h")
    )
    # bit votes: for each of 64 bits, +1 if set else -1; simhash bit = vote>0
    votes = tok.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(64)
        ],
    ).groupBy("doc_id").agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(64)])
    sim = votes.select(
        "doc_id",
        # bit 63 can't be a python literal (1<<63 overflows JVM long);
        # shiftleft builds each bit mask JVM-side with two's-complement wrap
        sum(
            [
                F.when(
                    F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long"))
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"band{i}")
            for i in range(4)
        ],
    )
    pairs = None
    for i in range(4):
        a = bands.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sh_a"),
            F.col(f"band{i}").alias("band"),
        )
        b = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sh_b"),
            F.col(f"band{i}").alias("band"),
        )
        p = a.join(b, "band").where(F.col("doc_a") < F.col("doc_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 16)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "multimodal_join",
    oracle="""
    WITH j AS (
      SELECT d.doc_id, d.lang, e.label, e.embedding
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    dims AS (
      SELECT doc_id, label, i.i AS dim,
             CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1000000) AS BIGINT) AS vmic
      FROM j CROSS JOIN LATERAL (SELECT unnest(range(1, 65)) AS i) i
    ),
    centroid AS (
      SELECT label, dim,
             CAST(SUM(vmic) AS DOUBLE) / 1000000.0 / COUNT(*) AS c
      FROM dims GROUP BY label, dim
    )
    SELECT d.doc_id, d.label,
           ROUND(SUM((CAST(d.vmic AS DOUBLE) / 1000000.0 - c.c)
                     * (CAST(d.vmic AS DOUBLE) / 1000000.0 - c.c)), 4) AS sq_dist
    FROM dims d JOIN centroid c ON d.label = c.label AND d.dim = c.dim
    GROUP BY d.doc_id, d.label
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: bind text docs to their embedding vectors (doc_id = vec_id) and
    compute each vector's squared distance to its label centroid.

    Centroids are exact (int64 micro-unit sums / count); the distance sum
    runs over posexploded dims in both engines, rounded(4). Quantizing to
    micro-units makes the metric identical across engines. At scale: one
    shuffle on (label, dim) for centroids (tiny result, broadcast back),
    one shuffle on doc for the distance agg.
    """
    t = load_tables(spark, sf_dir)
    j = t["documents"].join(
        t["embeddings"], F.col("doc_id") == F.col("vec_id")
    ).select("doc_id", "label", "embedding")
    dims = j.select(
        "doc_id",
        "label",
        F.posexplode(F.col("embedding")),
    ).select(
        "doc_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("col").cast("double") * 1000000).cast("long").alias("vmic"),
    )
    centroid = dims.groupBy("label", "dim").agg(
        (F.sum("vmic").cast("double") / 1000000.0 / F.count(F.lit(1))).alias("c")
    )
    v = F.col("vmic").cast("double") / 1000000.0
    return (
        dims.join(F.broadcast(centroid), ["label", "dim"])
        .groupBy("doc_id", "label")
        .agg(rnd(F.sum((v - F.col("c")) * (v - F.col("c"))), 4).alias("sq_dist"))
    )


@query(
    "embedding_label_stats",
    oracle="""
    WITH base AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    SELECT label, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(round(sqrt(list_dot_product(emb, emb))
                                     * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 / COUNT(*), 4) AS avg_norm,
           CAST(SUM(CAST(round(emb[1] * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS sum_dim1
    FROM base GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: per-label vector sanity stats. Per-row norms quantized to int64
    micro-units before the cross-row sum, so group sums are exact and
    order-independent on both engines."""
    e = load_tables(spark, sf_dir)["embeddings"]
    emb = _as_double(F.col("embedding"))
    norm_mic = F.round(_norm(emb) * 1000000).cast("long")
    dim1_mic = F.round(F.element_at(emb, 1) * 1000000).cast("long")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(norm_mic).cast("double") / 1000000.0 / F.count(F.lit(1)), 4).alias(
            "avg_norm"
        ),
        (F.sum(dim1_mic).cast("double") / 1000000.0).alias("sum_dim1"),
    )
