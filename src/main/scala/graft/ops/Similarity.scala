package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorKernels.{cosine_native, l2sq_native}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact top-k by cosine. The query set is
  *     broadcast; the corpus streams through one narrow pass computing
  *     |Q|·dim work per row, then a per-query top-k. This is the correct
  *     baseline and the oracle for the approximate tier. At 100 TB the
  *     scan dominates and parallelizes perfectly; the ranking shuffle
  *     carries only |Q|·|corpus| (id, score) pairs — for small |Q| that is
  *     the floor of any exact method.
  *   - [[ivfTopK]]: IVF-style two-stage search. A deterministic centroid
  *     sample partitions the corpus into `nCentroids` Voronoi cells
  *     (one broadcast-join pass); queries probe only their `nProbe`
  *     nearest cells, cutting scanned candidates to ≈ nProbe/nCentroids
  *     of the corpus — the standard recall/throughput trade.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) table to search
    * @param queries (idCol, vecCol) query vectors (small; broadcast)
    * @return (query_id, neighbor_id, cosine, rank) — rank 1..k, self-match
    *         excluded, deterministic tie-break by neighbor id
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val par = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val c = corpus.repartition(par, col(idCol))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine_native(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic mini k-means for IVF centroids: stride-sampled seeds
    * refined by `iters` Lloyd iterations, entirely as DataFrame plans
    * (assign = broadcast join + min_by argmin; recenter = groupBy mean
    * over element position). Each iteration is one shuffle keyed by cell.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): DataFrame = {
    // seed = the k ids with the smallest xxhash64(id): a deterministic
    // uniform sample for ANY id type/distribution (dense, sparse, string),
    // planned as a distributed partial top-k — no count() action, no
    // density assumption
    var centroids = corpus
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cent_vec"))
      .orderBy(xxhash64(col("centroid_id")).asc, col("centroid_id").asc)
      .limit(k)

    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("v"))
    (0 until iters).foreach { _ =>
      // argmin via min_by aggregation (map-side partial combine): a
      // row_number window would shuffle+sort |corpus| x k replicated
      // vector rows; this shuffles one row per vector
      val assigned = c
        .join(broadcast(centroids))
        .withColumn("d", l2sq_native(col("v"), col("cent_vec")))
        .groupBy("cid")
        .agg(first(col("v")).as("v"),
          min_by(col("centroid_id"), struct(col("d"), col("centroid_id"))).as("centroid_id"))
        .select(col("centroid_id"), col("v"))
      // recenter: per-dimension mean via posexplode + groupBy(cell, dim)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"),
          transform(col("dm"), e => e.getField("m").cast("float")).as("cent_vec"))
    }
    centroids
  }

  /** IVF (inverted-file) approximate top-k.
    *
    * Centroids default to a deterministic stride sample; pass
    * `kmeansIters > 0` to refine them with [[kmeansCentroids]]. Each
    * corpus vector is assigned to its nearest centroid (broadcast join,
    * one pass); each query probes its `nProbe` nearest cells; the exact
    * ranking then runs only within probed cells.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      kmeansIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters)

    // Assign every corpus vector to its nearest centroid: min_by
    // aggregation (partial combine; one shuffled row per vector — a
    // window argmin would shuffle k x |corpus| replicated vectors).
    val assigned = c
      .join(broadcast(centroids))
      .withColumn("cdist", l2sq_native(col("c_vec"), col("cent_vec")))
      .groupBy("neighbor_id")
      .agg(first(col("c_vec")).as("c_vec"),
        min_by(col("centroid_id"), struct(col("cdist"), col("centroid_id"))).as("cell"))
      .select(col("neighbor_id"), col("c_vec"), col("cell"))

    // Each query probes its nProbe nearest cells.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("qdist").asc, col("centroid_id").asc)
    val probes = q
      .join(broadcast(centroids))
      .withColumn("qdist", l2sq_native(col("q_vec"), col("cent_vec")))
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("centroid_id").as("cell"))

    // Exact ranking within probed cells only.
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine_native(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed embedding near-dup — the 100 TB path for high-cosine
    * pair mining. Sign-LSH band keys (random hyperplanes, native kernel)
    * bucket the corpus; candidate pairs form only inside buckets; exact
    * cosine verifies. Linear in corpus + candidate volume, never all-pairs.
    * Recall for cos ≥ 0.9 at 64 bands × 8 bits ≈ 1 − 1e-15; lower the
    * threshold → widen bands/shrink bits (bit-agreement p = 1 − θ/π).
    */
  def lshEmbeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bands: Int = 64,
      bitsPerBand: Int = 8): DataFrame = {
    val par = embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = embeddings.where(col(vecCol).isNotNull).repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"), col(vecCol).as("vec"))
    val banded = base
      .withColumn("keys", graft.functions.SignBands.sign_bands(col("vec"), bands, bitsPerBand))
      .select(col("doc_id"), explode(col("keys")).as("band_key"))
    val candidates = Dedup.bucketCandidates(banded, Seq("band_key"))
    val vecs = base.join(broadcast(
      candidates.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()),
      Seq("doc_id"), "left_semi")
    candidates
      .join(vecs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("vec", "vec_a"), Seq("id_a"))
      .join(vecs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("vec", "vec_b"), Seq("id_b"))
      .withColumn("cosine", cosine_native(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs: all (a<b) pairs with cosine ≥
    * threshold. Exact all-pairs — O(n²·dim) compute but only the
    * broadcast side is replicated; this is the exact/oracle variant,
    * [[lshEmbeddingNearDup]] is the corpus-scale path.
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val par = embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val a = embeddings.repartition(par, col(idCol))
      .select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_native(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
