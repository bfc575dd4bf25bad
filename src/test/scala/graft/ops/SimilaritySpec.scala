package graft.ops

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("vector kernels: dot, norm, cosine on known values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c")).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("zero vector cosine is null, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineSimilarity(col("a"), col("b"))).head().isNullAt(0))
  }

  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k: correct neighbors, ranks, self excluded") {
    val out = Similarity.bruteForceTopK(corpus, corpus.where($"vec_id" === 0L), "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
  }

  test("brute-force top-k keeps non-long id types (int id, string id)") {
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (1, "a", Seq(1.0f, 0.0f)),
      (2, "b", Seq(0.9f, 0.1f)),
      (3, "c", Seq(0.0f, 1.0f)))
    // int ids: aggregate path with up-cast, schema keeps IntegerType
    val ints = base.map { case (i, _, v) => (i, v) }.toDF("vec_id", "embedding")
    val outI = Similarity.bruteForceTopK(ints, ints.where($"vec_id" === 1), "vec_id", "embedding", 1)
    assert(outI.schema("neighbor_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(outI.collect().map(r => r.getInt(1)).toSeq == Seq(2))
    // string ids: the string-keyed bounded heap, same contract
    val strs = base.map { case (_, s, v) => (s, v) }.toDF("vec_id", "embedding")
    val outS = Similarity.bruteForceTopK(strs, strs.where(col("vec_id") === "a"), "vec_id", "embedding", 1)
    assert(outS.schema("neighbor_id").dataType == org.apache.spark.sql.types.StringType)
    assert(outS.collect().map(_.getString(1)).toSeq == Seq("b"))
    // decimal ids (p <= 18, long-backed): unscaled-value mapping onto the
    // long heap; schema keeps the exact decimal type, values round-trip
    val dt = org.apache.spark.sql.types.DecimalType(12, 3)
    val decs = ints.select(col("vec_id").cast(dt).as("vec_id"), col("embedding"))
    val outD = Similarity.bruteForceTopK(
      decs, decs.where(col("vec_id") === new java.math.BigDecimal(1)), "vec_id", "embedding", 1)
    assert(outD.schema("neighbor_id").dataType == dt)
    assert(outD.collect().map(_.getDecimal(1).longValueExact()).toSeq == Seq(2L))
    // the decimal path must use the heap, not the window fallback
    val pD = Similarity.bruteForceTopK(decs, decs.limit(1), "vec_id", "embedding", 1)
      .queryExecution.executedPlan.toString
    assert(!pD.contains("Window") && pD.contains("partial_top_k_by_score"), pD)
  }

  test("embedding near-dup finds only the close pair") {
    val pairs = Similarity.embeddingNearDup(corpus, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embedding near-dup: same (corpus, threshold) plan returns the slot-cached " +
      "handle; a different threshold is a distinct entry with its own rows") {
    // the pair list is slot-cached (one O(n²) scoring pass per plan, not
    // per consumer — DBSCAN reads it three times in one action and the
    // standalone near-dup query shares it); the slot contract is the
    // CacheSlot one: identical canonicalized plans alias ONE entry
    val a = Similarity.embeddingNearDup(corpus, "vec_id", "embedding", 0.99)
    val b = Similarity.embeddingNearDup(corpus, "vec_id", "embedding", 0.99)
    assert(b eq a, "identical (corpus, threshold) must return the cached handle")
    val loose = Similarity.embeddingNearDup(corpus, "vec_id", "embedding", -1.0)
    assert(!(loose eq a), "a different threshold is a different plan/entry")
    // cached and uncached answers agree (cache is an execution detail)
    val n = corpus.count()
    assert(loose.count() == n * (n - 1) / 2, "all pairs at threshold -1")
    assert(a.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((0L, 1L)))
  }

  test("k-means centroids: k rows, refined means converge toward cluster centers") {
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 2, iters = 2)
      .collect()
    assert(cents.length == 2)
    assert(cents.forall(_.getSeq[Float](1).length == 2)) // dim preserved
  }

  test("IVF with k-means refinement and full probing equals brute force") {
    val bf = Similarity.bruteForceTopK(corpus, corpus.where($"vec_id" < 2), "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(corpus, corpus.where($"vec_id" < 2), "vec_id", "embedding", 3,
      nCentroids = 2, nProbe = 2, kmeansIters = 1)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(ivf == bf)
  }

  test("IVF with full probing equals brute force") {
    val bf = Similarity.bruteForceTopK(corpus, corpus.where($"vec_id" < 2), "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(corpus, corpus.where($"vec_id" < 2), "vec_id", "embedding", 3,
      nCentroids = 2, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(ivf == bf)
  }

  /** 256 vectors drawn around 16 well-separated anchor directions in 8
    * dims (seeded, deterministic).
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val anchors = Array.fill(16)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val rows = (0 until 256).map { i =>
      val a = anchors(i % 16)
      (i.toLong, a.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF recall vs brute force >= 0.9 at nProbe=4 of 16 cells") {
    val queries = clustered.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(clustered, queries, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 4, kmeansIters = 1)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9")
  }

  test("nprobeSweep: gates hold on the clustered corpus and the sweep is real " +
       "(partial tiers can miss, the full tier cannot)") {
    val queries = clustered.where($"vec_id" < 8)
    val out = Similarity.nprobeSweep(clustered, queries, "vec_id", "embedding", 5,
      nCentroids = 16, kmeansIters = 1, probes = Seq(1, 4, 16))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out.keySet == Set(1, 4, 16))
    out.values.foreach { case (nBf, mono, full) =>
      assert(nBf == 40L && mono == 1 && full == 1)
    }
  }

  test("nprobeSweep: a last tier below nCentroids is refused — the exactness gate " +
       "would be vacuous") {
    intercept[IllegalArgumentException] {
      Similarity.nprobeSweep(clustered, clustered.where($"vec_id" < 2),
        "vec_id", "embedding", 3, nCentroids = 16, probes = Seq(1, 4))
    }
  }

  test("written IVF index: probe matches in-memory; cell filter prunes buckets") {
    val idx = Similarity.ivfBuild(clustered, "vec_id", "embedding", nCentroids = 16)
    try {
      val mem = Similarity.ivfProbe(idx, clustered.where($"vec_id" < 4), "vec_id", "embedding", 3)
        .collect().map(_.toSeq).toSet
      Similarity.ivfWrite(idx, "ivf_spec", numBuckets = 8)
      val loaded = Similarity.ivfLoad(spark, "ivf_spec")
      val disk = Similarity.ivfProbe(loaded, clustered.where($"vec_id" < 4), "vec_id", "embedding", 3)
        .collect().map(_.toSeq).toSet
      assert(disk == mem)
      // the cluster-scale point: a probed-cell filter reads ONLY those
      // cells' buckets (autoBucketedScan turns bucketed reads off for
      // filter-only plans unless told otherwise)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val plan = loaded.cells.where($"cell".isin(1L, 2L))
          .queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount"), plan)
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally {
      idx.unpersist()
      spark.sql("DROP TABLE IF EXISTS ivf_spec_cells")
      spark.sql("DROP TABLE IF EXISTS ivf_spec_cents")
    }
  }

  // ---------------------------------------------------------------- PQ

  /** Hand-built m=2, ksub=2, dim=4 codebook: sub0 {0:[1,0], 1:[0,1]},
    * sub1 {2:[1,1], 3:[-1,0]} (flat id = sub*ksub + code).
    */
  private lazy val tinyCodebook = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
    (2L, Seq(1.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))
  ).toDF("centroid_id", "cent_vec")
    .agg(collect_list(struct($"centroid_id", $"cent_vec")).as("cents"))

  test("pq_encode picks the nearest sub-centroid per subspace") {
    val codes = Seq(Tuple1(Seq(0.9f, 0.1f, -2.0f, 0.1f))).toDF("v")
      .crossJoin(tinyCodebook)
      .select(graft.functions.PqKernels.pq_encode($"v", $"cents", 2, 2))
      .head().getSeq[Short](0)
    // sub0 slice [0.9,0.1] → [1,0] (code 0); sub1 slice [-2,0.1] → [-1,0] (code 1)
    assert(codes == Seq(0.toShort, 1.toShort))
  }

  test("adc_score over pq_lut equals the exact dot with the reconstructed vector") {
    val r = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("q")
      .crossJoin(tinyCodebook)
      .select(graft.functions.PqKernels.pq_lut($"q", $"cents", 2, 2).as("lut"))
      .withColumn("codes", typedLit(Seq(0.toShort, 1.toShort)))
      .select(graft.functions.PqKernels.adc_score($"lut", $"codes"))
      .head().getDouble(0)
    // reconstruction [1,0,-1,0]: dot([1,2,3,4], .) = 1 - 3 = -2
    assert(r == -2.0)
  }

  test("adc_score: a null LUT slot is a null score, never silently 0.0") {
    val holeyLut = array(lit(null).cast("double"), lit(1.0))
    val r = spark.range(1).select(
      graft.functions.PqKernels.adc_score(holeyLut, typedLit(Seq(0.toShort))).as("s"),
      graft.functions.PqKernels.adc_score(holeyLut, typedLit(Seq(1.toShort))).as("ok"))
      .head()
    assert(r.isNullAt(0)) // code 0 hits the null slot
    assert(r.getDouble(1) == 1.0) // code 1 hits the real slot
  }

  test("pq geometry guard: SMALLINT-wrapping ksub fails at plan time") {
    val df = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("v").crossJoin(tinyCodebook)
    intercept[IllegalArgumentException] {
      graft.functions.PqKernels.pq_encode(df("v"), df("cents"), 2, 40000)
    }
    intercept[IllegalArgumentException] {
      graft.functions.PqKernels.pq_lut(df("v"), df("cents"), 1 << 16, 1 << 16)
    }
  }

  test("pq kernels: length not divisible by m is null, not wrong") {
    val out = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("v")
      .crossJoin(tinyCodebook)
      .select(
        graft.functions.PqKernels.pq_encode($"v", $"cents", 2, 2).as("c"),
        graft.functions.PqKernels.pq_lut($"v", $"cents", 2, 2).as("l"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("PQ top-k with full refine equals brute force bit-for-bit") {
    val queries = clustered.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    val pq = Similarity.pqTopK(clustered, queries, "vec_id", "embedding", 5,
      m = 4, ksub = 16, iters = 1, refine = 256)
      .collect().map(_.toSeq).toSet
    assert(pq == bf)
  }

  test("PQ top-k recall vs brute force >= 0.9 at refine = 4k") {
    val queries = clustered.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val pq = Similarity.pqTopK(clustered, queries, "vec_id", "embedding", 5,
      m = 4, ksub = 16, iters = 1, refine = 20)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val recall = pq.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"PQ recall $recall < 0.9")
  }

  test("IVF-PQ with full probing and full refine equals brute force bit-for-bit") {
    val queries = clustered.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    val ivfpq = Similarity.ivfPqTopK(clustered, queries, "vec_id", "embedding", 5,
      nCentroids = 4, nProbe = 4, m = 4, ksub = 16, iters = 1, refine = 256)
      .collect().map(_.toSeq).toSet
    assert(ivfpq == bf)
  }

  test("IVF-PQ recall vs brute force >= 0.85 at nProbe=8/16, refine=4k") {
    val queries = clustered.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val ivfpq = Similarity.ivfPqTopK(clustered, queries, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 8, m = 4, ksub = 16, iters = 1, refine = 20)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val recall = ivfpq.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.85, s"IVF-PQ recall $recall < 0.85")
  }

  test("written IVF-PQ index: load+probe matches in-memory; no retraining; buckets prune") {
    val queries = clustered.where($"vec_id" < 8)
    val idx = Similarity.ivfPqBuild(clustered, "vec_id", "embedding",
      nCentroids = 4, m = 4, ksub = 16, iters = 1)
    try {
      val mem = Similarity.ivfPqProbe(idx, queries, "vec_id", "embedding", 5,
        nProbe = 4, refine = 256, refineWith = Some(clustered))
        .collect().map(_.toSeq).toSet
      Similarity.ivfPqWrite(idx, "ivfpq_spec", numBuckets = 4)
      val loaded = Similarity.ivfPqLoad(spark, "ivfpq_spec")
      // geometry round-trips through the self-describing _pq table
      assert(loaded.m == 4 && loaded.ksub == 16)
      // cells table stores codes+norm, never raw vectors
      assert(loaded.cells.columns.toSet == Set("neighbor_id", "cell", "codes", "norm"))
      val disk = Similarity.ivfPqProbe(loaded, queries, "vec_id", "embedding", 5,
        nProbe = 4, refine = 256, refineWith = Some(clustered))
        .collect().map(_.toSeq).toSet
      assert(disk == mem)
      // full probing + full refine against the LOADED index is still
      // exact — codes/codebooks survived the round-trip bit-for-bit
      val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
        .collect().map(_.toSeq).toSet
      assert(disk == bf)
      // the probe plan reads the written tables: no pq training lineage
      // (no VectorSum recenter aggregate) anywhere in the probe
      val probePlan = Similarity.ivfPqProbe(loaded, queries, "vec_id", "embedding", 5,
        nProbe = 2).queryExecution.executedPlan.toString
      assert(!probePlan.contains("vector_sum"), s"probe retrains the codebook:\n$probePlan")
      // cluster-scale point (same as v5): a probed-cell filter reads
      // only those cells' buckets
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val plan = loaded.cells.where($"cell".isin(1L, 2L))
          .queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount"), plan)
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally {
      idx.unpersist()
      for (t <- Seq("ivfpq_spec_cells", "ivfpq_spec_cents", "ivfpq_spec_pq"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("ivfAppend grows a written raw IVF index; full-probe stays exact") {
    val old = clustered.where($"vec_id" < 200)
    val fresh = clustered.where($"vec_id" >= 200)
    val idx = Similarity.ivfBuild(old, "vec_id", "embedding", nCentroids = 4, persist = false)
    Similarity.ivfWrite(idx, "ivf_app", numBuckets = 4)
    try {
      Similarity.ivfAppend(spark, "ivf_app", fresh, "vec_id", "embedding")
      val grown = Similarity.ivfLoad(spark, "ivf_app")
      assert(grown.cells.count() == clustered.count())
      val queries = clustered.where($"vec_id" < 8)
      val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
        .collect().map(_.toSeq).toSet
      // full probing over the grown index is exact regardless of which
      // corpus the frozen centroids came from
      val probed = Similarity.ivfProbe(grown, queries, "vec_id", "embedding", 5, nProbe = 4)
        .collect().map(_.toSeq).toSet
      assert(probed == bf)
    } finally {
      for (t <- Seq("ivf_app_cells", "ivf_app_cents"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("ivfPqAppend grows a written index without retraining; probes stay exact") {
    val old = clustered.where($"vec_id" < 200)
    val fresh = clustered.where($"vec_id" >= 200)
    val idx = Similarity.ivfPqBuild(old, "vec_id", "embedding",
      nCentroids = 4, m = 4, ksub = 16, iters = 1, persist = false)
    Similarity.ivfPqWrite(idx, "ivfpq_app", numBuckets = 4)
    try {
      Similarity.ivfPqAppend(spark, "ivfpq_app", fresh, "vec_id", "embedding")
      val grown = Similarity.ivfPqLoad(spark, "ivfpq_app")
      // every appended vector landed, encoded into the frozen geometry
      assert(grown.cells.count() == clustered.count())
      assert(grown.m == 4 && grown.ksub == 16)
      // the append preserved the bucket layout (still a bucketed table)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val plan = grown.cells.where($"cell".isin(1L, 2L))
          .queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount"), plan)
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      // full probing + full refine is exact REGARDLESS of which corpus
      // the frozen codebooks were trained on — appended vectors are
      // found with the same contract as built-in ones
      val queries = clustered.where($"vec_id" < 8)
      val bf = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
        .collect().map(_.toSeq).toSet
      val probed = Similarity.ivfPqProbe(grown, queries, "vec_id", "embedding", 5,
        nProbe = 4, refine = 256, refineWith = Some(clustered))
        .collect().map(_.toSeq).toSet
      assert(probed == bf)
    } finally {
      for (t <- Seq("ivfpq_app_cells", "ivfpq_app_cents", "ivfpq_app_pq"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("ivfPqProbe refuses refine > k without a raw-vector table") {
    val idx = Similarity.ivfPqBuild(clustered, "vec_id", "embedding",
      nCentroids = 4, m = 4, ksub = 16, iters = 0, persist = false)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqProbe(idx, clustered.limit(1), "vec_id", "embedding", 5, refine = 50)
    }
  }

  test("IVF index builds once and serves repeated probes") {
    val idx = Similarity.ivfBuild(clustered, "vec_id", "embedding", nCentroids = 16)
    try {
      val r1 = Similarity.ivfProbe(idx, clustered.where($"vec_id" < 4), "vec_id", "embedding", 3)
      val r2 = Similarity.ivfProbe(idx, clustered.where($"vec_id" >= 4 && $"vec_id" < 8),
        "vec_id", "embedding", 3)
      assert(r1.select("query_id").distinct().count() == 4)
      assert(r2.select("query_id").distinct().count() == 4)
      // the cell assignment is materialized: same index object, same cells
      assert(idx.cells.storageLevel.useMemory || idx.cells.storageLevel.useDisk)
    } finally idx.unpersist()
  }

  test("mmrDiversify: a diverse candidate outranks a redundant higher-relevance one") {
    // A and B point the same way; C is orthogonal with lower relevance.
    // Pure relevance would rank A, B, C — MMR must pick A, C, B.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),   // A
      (2L, Array(1.0f, 0.0f)),   // B — duplicate direction of A
      (3L, Array(0.0f, 1.0f)))   // C — orthogonal
      .toDF("vec_id", "embedding")
    val cands = Seq(
      (100L, 1L, 0.99), (100L, 2L, 0.98), (100L, 3L, 0.60))
      .toDF("query_id", "neighbor_id", "rel")
    val out = Similarity.mmrDiversify(cands, vecs, "vec_id", "embedding", 3, 7000)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("mmr")))
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), out.toSeq)
    // round 2: C scores 0.7·0.6 − 0.3·0 = 0.42 > B's 0.7·0.98 − 0.3·1 = 0.386
    assert(out(1)._3 == 0.42, out(1)._3)
    assert(out(2)._3 == 0.386, out(2)._3)
  }

  test("mmrDiversify: pool smaller than k stops early; ties break on id") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // identical relevance and orthogonal vectors → round 1 tie on mmr,
    // lower id must win
    val cands = Seq((100L, 2L, 0.9), (100L, 1L, 0.9))
      .toDF("query_id", "neighbor_id", "rel")
    val out = Similarity.mmrDiversify(cands, vecs, "vec_id", "embedding", 5, 7000)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("neighbor_id")))
    assert(out.toSeq == Seq((1, 1L), (2, 2L)), out.toSeq) // k=5 but only 2 rows
  }

  private def sparse(docs: Seq[(Long, String)], qIds: Seq[Long], k: Int,
      maxDf: Long = Long.MaxValue) =
    Similarity.sparseCosineTopK(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      qIds.toDF("doc_id"), "doc_id", k, maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("sparseCosineTopK: exact duplicate ranks first at 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),        // exact duplicate of the query
      (3L, "alpha beta delta"),        // partial overlap
      (4L, "zeta eta theta"))          // no shared term
    val out = sparse(docs, Seq(1L), 10)
    assert(out.head == ((1L, 2L, 1.0, 1)), out.head)
    assert(out.map(_._2).toSet == Set(2L, 3L)) // 4 shares nothing -> absent
    assert(out(1)._3 < 1.0 && out(1)._3 > 0.0)
  }

  test("sparseCosineTopK: self excluded; rarer overlap outscores common-word overlap") {
    // q shares the corpus-wide word 'the' with 5, but the rare word
    // 'xylophone' with 6 — idf must rank 6 first
    val docs = Seq(
      (1L, "the xylophone plays"),
      (5L, "the the the common words here"),
      (6L, "xylophone solo tonight"),
      (7L, "the filler"), (8L, "the filler"), (9L, "the filler"))
    val out = sparse(docs, Seq(1L), 10)
    assert(!out.exists(_._2 == 1L))
    assert(out.head._2 == 6L, out.toSeq)
  }

  private def bm25(docs: Seq[(Long, String)], qIds: Seq[Long], k: Int) =
    Similarity.bm25TopK(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      qIds.toDF("doc_id"), "doc_id", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))

  test("bm25TopK: tf saturates — 10x the term is nowhere near 10x the score") {
    val docs = Seq(
      (1L, "quark lepton"),
      (2L, "quark boson boson boson boson boson boson boson boson boson"),
      (3L, Seq.fill(10)("quark").mkString(" ") + " gluon gluon gluon gluon gluon gluon gluon gluon gluon gluon"),
      (4L, "unrelated words entirely"), (5L, "other filler text"),
      // enough non-matching docs that idf('quark') = ln((N-3+.5)/3.5) > 0
      (6L, "pad a"), (7L, "pad b"), (8L, "pad c"), (9L, "pad d"), (10L, "pad e"))
    val out = bm25(docs, Seq(1L), 10)
    val byId = out.map(o => o._2 -> o._3).toMap
    // doc 3 has 10x the tf of doc 2 on 'quark' at 2x the length; with
    // k1=1.2 the saturated gain must stay under ~2.2x, nowhere near 10x
    assert(byId(3L) < byId(2L) * 3, out.toSeq)
    assert(byId(3L) > byId(2L), out.toSeq) // but still larger
  }

  test("bm25TopK: length normalization — same tf, shorter doc ranks first") {
    val docs = Seq(
      (1L, "quark probe"),
      (2L, "quark short"),
      (3L, "quark padded with many extra words that dilute the match badly"),
      (4L, "noise one"), (5L, "noise two"),
      (6L, "pad a"), (7L, "pad b"), (8L, "pad c"), (9L, "pad d"), (10L, "pad e"))
    val out = bm25(docs, Seq(1L), 10)
    assert(out.head._2 == 2L, out.toSeq)
    assert(out.map(_._2).take(2).toSet == Set(2L, 3L), out.toSeq)
  }

  test("bm25TopK: a term in more than half the corpus contributes negatively") {
    // 'common' in 4/5 docs -> idf = ln((5-4+0.5)/(4+0.5)) < 0; a doc
    // sharing ONLY that term must score below zero
    val docs = Seq(
      (1L, "common rare1"),
      (2L, "common only"),
      (3L, "common x"), (4L, "common y"), (5L, "standalone z"))
    val out = bm25(docs, Seq(1L), 10)
    val byId = out.map(o => o._2 -> o._3).toMap
    assert(byId(2L) < 0L, out.toSeq)
    assert(!byId.contains(5L)) // shares nothing
  }

  test("sparseCosineTopK: maxDf drops the stop-word head before the join") {
    // 'the' appears in every doc; with maxDf = 2 it cannot create
    // candidates, so docs sharing ONLY 'the' disappear
    val docs = Seq(
      (1L, "the unique1"), (2L, "the unique2"), (3L, "the unique1 extra"))
    val all = sparse(docs, Seq(1L), 10)
    assert(all.map(_._2).toSet == Set(2L, 3L))
    val capped = sparse(docs, Seq(1L), 10, maxDf = 2)
    assert(capped.map(_._2).toSet == Set(3L)) // only the 'unique1' pairing survives
  }

  test("ivfProbeFiltered: full probing equals the exact filtered baseline; disallowed ids never rank") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.95f, 0.05f), 2), // closest to 0 but WRONG label
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(-1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val q = labeled.where($"vec_id" === 0L)
    val allowed = labeled.where($"label" === 1).select("vec_id")
    val idx = Similarity.ivfBuild(labeled, "vec_id", "embedding",
      nCentroids = 2, kmeansIters = 1, persist = false)
    val filtered = Similarity.ivfProbeFiltered(idx, q, "vec_id", "embedding",
      3, nProbe = 2, allowed)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val exact = Similarity.bruteForceTopK(labeled.where($"label" === 1), q,
      "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(filtered.toSeq == exact.toSeq)
    assert(!filtered.map(_._1).contains(2L)) // the closer wrong-label vec is invisible
  }

  test("adaptiveNProbe: depth scales with 1/selectivity, floored at base, clamped at nCentroids") {
    import Similarity.adaptiveNProbe
    // unselective filter: the base depth is enough
    assert(adaptiveNProbe(8, 1024, 1.0) == 8)
    assert(adaptiveNProbe(8, 1024, 0.9) == 9)
    // the r8 regime: 1/5-selective -> 5x deeper
    assert(adaptiveNProbe(8, 1024, 0.2) == 40)
    // 1/50-selective -> 50x deeper (the depth the constant 12 missed)
    assert(adaptiveNProbe(8, 1024, 0.02) == 400)
    // coarse geometry saturates to exact probing
    assert(adaptiveNProbe(8, 16, 0.2) == 16)
    assert(adaptiveNProbe(8, 16, 0.02) == 16)
    // empty filter: probe everything (result is empty regardless)
    assert(adaptiveNProbe(8, 16, 0.0) == 16)
    // monotone in 1/s
    val depths = Seq(1.0, 0.5, 0.1, 0.05, 0.01).map(adaptiveNProbe(4, 4096, _))
    assert(depths == depths.sorted)
  }

  test("adcBatchCount: 1 under the budget, grows with probe bytes, capped at |Q|") {
    import Similarity.adcBatchCount
    val lut = 16L * 64 * 8 + 64 // m=16, ksub=64 — the v7/v8 gate geometry
    val gib = 1L << 30
    // every verified local shape: 128 GiB heap carries the 10x gate whole
    assert(adcBatchCount(20000, 12, lut, 128 * gib) == 1)
    // sf0.1 gate (2k queries) fits even an 8 GiB executor
    assert(adcBatchCount(2000, 12, lut, 8 * gib) == 1)
    // the measured r9 OOM shape: 10x gate on 8 GiB executors -> 4 batches
    assert(adcBatchCount(20000, 12, lut, 8 * gib) == 4)
    // monotone: smaller executors, more batches
    val bs = Seq(128, 64, 16, 8, 4, 2).map(g => adcBatchCount(20000, 12, lut, g * gib))
    assert(bs == bs.sorted)
    // floor and caps
    assert(adcBatchCount(0, 12, lut, gib) == 1)
    // never more batches than queries, even when each query's probe rows
    // alone outgrow the floored budget
    assert(adcBatchCount(3, 12, 1L << 26, 1) == 3)
    assertThrows[IllegalArgumentException](adcBatchCount(10, 0, lut, gib))
  }

  test("batched IVF-PQ probe equals the single-plan probe bit-for-bit") {
    // per-query independence of top-k makes the batch split a no-op on
    // CONTENT; this is the contract that lets executor-memory batching
    // keep every hash oracle green
    val queries = clustered.where($"vec_id" < 12)
    val idx = Similarity.ivfPqBuild(clustered, "vec_id", "embedding",
      nCentroids = 4, m = 4, ksub = 16, iters = 1)
    try {
      val whole = Similarity.ivfPqProbeBatched(idx, queries, "vec_id", "embedding",
        5, 4, 256, Some(clustered), nBatches = 1).collect().map(_.toSeq).toSet
      val batched = Similarity.ivfPqProbeBatched(idx, queries, "vec_id", "embedding",
        5, 4, 256, Some(clustered), nBatches = 3).collect().map(_.toSeq).toSet
      assert(batched == whole)
      // the public entry point derives batch=1 here (tiny probe relation)
      // and must agree too
      val derived = Similarity.ivfPqProbe(idx, queries, "vec_id", "embedding",
        5, nProbe = 4, refine = 256, refineWith = Some(clustered))
        .collect().map(_.toSeq).toSet
      assert(derived == whole)
    } finally idx.unpersist()
  }

  test("ivfProbeFilteredAdaptive: derived depth holds the exact answer at 1/5 and 1/50-style selectivity") {
    // 40 vectors on a ring; a 1-in-8 allowed set is selective enough
    // that a base-depth probe of the 4-cell index would miss eligible
    // rows in unprobed cells — the adaptive depth saturates to 4/4 and
    // must equal the exact filtered baseline
    val ring = (0L until 40L).map { i =>
      val a = 2 * math.Pi * i / 40
      (i, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("vec_id", "embedding")
    val q = ring.where($"vec_id" === 0L)
    val allowed = ring.where($"vec_id" % 8 === 3).select("vec_id")
    val idx = Similarity.ivfBuild(ring, "vec_id", "embedding",
      nCentroids = 4, kmeansIters = 1, persist = false)
    val adaptive = Similarity.ivfProbeFilteredAdaptive(idx, q, "vec_id", "embedding",
      3, baseProbe = 1, allowed)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val exact = Similarity.bruteForceTopK(ring.where($"vec_id" % 8 === 3), q,
      "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(adaptive.toSeq == exact.toSeq)
  }

  test("sqTopK: grid-aligned vectors quantize losslessly — SQ equals brute force exactly") {
    // every coordinate sits on the 8-bit quantization grid of its
    // dimension ([0,255] with 255 levels → integers are exact), so
    // dequantization reproduces the floats and ranking matches the
    // exact baseline bit-for-bit
    val grid = Seq(
      (0L, Array(255.0f, 0.0f)),
      (1L, Array(254.0f, 1.0f)),
      (2L, Array(0.0f, 255.0f)),
      (3L, Array(128.0f, 128.0f))
    ).toDF("vec_id", "embedding")
    val q = grid.where($"vec_id" === 0L)
    val bf = Similarity.bruteForceTopK(grid, q, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val sq = Similarity.sqTopK(grid, q, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(sq.toSeq == bf.toSeq)
  }

  test("sqTopK: a constant dimension (span 0) dequantizes to its min, never NaN") {
    val c = Seq(
      (0L, Array(1.0f, 5.0f)), // dim 1 constant = 5
      (1L, Array(0.9f, 5.0f)),
      (2L, Array(-1.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.sqTopK(c, c.where($"vec_id" === 0L), "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(out.forall(!_.getDouble(2).isNaN))
  }

  test("sqTopK: coarse quantization still recalls well-separated neighbors") {
    val out = Similarity.sqTopK(corpus, corpus.where($"vec_id" === 0L),
      "vec_id", "embedding", 1, bits = 4)
      .collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L)) // nearest cluster survives 16-level codes
  }

  private def drift(rows: (Array[Float], String)*) = {
    val df = rows.toSeq.toDF("embedding", "slice_in")
    Similarity.embeddingDrift(df, "embedding", "slice_in")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
  }

  test("embeddingDrift: hand-computed centroids — orthogonal slices sit 1/√2 from the global mean") {
    // slice a = 2×[1,0], slice b = 2×[0,1] → centroids [1000,0]/[0,1000],
    // global [500,500]: l2² = 500² + 500² = 500000, cos = 1/√2 → 0.707107
    val out = drift(
      (Array(1.0f, 0.0f), "a"), (Array(1.0f, 0.0f), "a"),
      (Array(0.0f, 1.0f), "b"), (Array(0.0f, 1.0f), "b"))
    assert(out == Map(
      "a" -> ((2L, 500000L, Some(0.707107))),
      "b" -> ((2L, 500000L, Some(0.707107)))))
  }

  test("embeddingDrift: negative sums FLOOR the centroid; zero-norm global → NULL cosine") {
    // slice a: sum −1000 over 3 vecs → floor(−333.3) = −334 (truncation
    // would give −333 and a different l2²); global centroid is exactly
    // zero → cosine NULL on both slices, never NaN
    val out = drift(
      (Array(-1.0f, 0.0f), "a"), (Array(0.0f, 0.0f), "a"), (Array(0.0f, 0.0f), "a"),
      (Array(1.0f, 0.0f), "b"))
    assert(out == Map(
      "a" -> ((3L, 334L * 334L, None)),
      "b" -> ((1L, 1000000L, None))))
  }

  test("randomProjection: deterministic, exact-integer components in fixed j order") {
    val df = Seq((1L, Array(0.5f, -0.25f)), (2L, Array(0.5f, -0.25f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // identical inputs → identical projections (pure function of content)
    assert(out(1L) == out(2L) && out(1L).length == 4)
    // every component is a ± combination of the quantized inputs 500, −250
    val allowed = Set(250f, 750f, -250f, -750f)
    assert(out(1L).forall(allowed.contains))
    // and replays exactly across invocations
    val again = Similarity.randomProjection(df, "vec_id", "embedding", 4)
      .where(col("vec_id") === 1L).head().getSeq[Float](1)
    assert(again == out(1L))
  }

  test("rrfFuse: hand-computed micro-unit sums; a doc missing from one list contributes zero") {
    // ranker A: d1@1, d2@2; ranker B: d2@1, d3@2 (K=60)
    //   d2 = 1e6/61 + 1e6/62 = 16393 + 16129 = 32522  (both lists)
    //   d1 = 1e6/61 = 16393, d3 = 1e6/62 = 16129      (one list each)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), rrfK = 60, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(out == Set((20L, 32522L, 2L, 1), (10L, 16393L, 1L, 2), (30L, 16129L, 1L, 3)))
  }

  test("rrfFuse: equal fused scores break ties by neighbor id; k cuts the fused list") {
    // two docs each appearing once at the same rank → equal scores
    val a = Seq((1L, 50L, 3)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 40L, 3)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), rrfK = 60, k = 1).collect()
    assert(out.length == 1 && out.head.getLong(1) == 40L)
  }

  test("tripletMine: hardest positive/negative, equality violates, single-member labels drop") {
    import spark.implicits._
    // label 0: v1=v2=(1,0); label 1: v3=(0,1), v4=(−1,0); label 2: v5 alone
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(-1.0f, 0.0f), 1),
      (5L, Seq(0.5f, 0.5f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMine(emb, emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5), r.getInt(6))))
      .toMap
    assert(out.size == 4 && !out.contains(5L)) // v5 anchors no positive…
    // …but still serves as everyone's hardest negative (cos ±√2/2)
    assert(out(1L) == ((2L, 1.0, 5L, 0.707107, 0)))
    // v3: pos v4 (cos 0); hardest neg v5 at 0.707107 ≥ 0 → violated —
    // exactly the triplet worth training on
    assert(out(3L) == ((4L, 0.0, 5L, 0.707107, 1)))
    assert(out(4L) == ((3L, 0.0, 5L, -0.707107, 0)))
  }

  test("normProfile: zero vectors counted, exact norms², lower-median on even counts") {
    import spark.implicits._
    // norms² at scale 1000: (1,0)→1e6, (2,0)→4e6, zero→0, (0,3)→9e6;
    // n=4 → rank ⌈n/2⌉=2 → lower-median 1e6
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(0.0f, 0.0f), 0), (4L, Seq(0.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.normProfile(emb, "label", "embedding").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((4L, 1L, 0L, 1000000L, 9000000L)))
  }

  test("ivfBqTopK: probing every cell with a corpus-sized rerank equals brute force bit-for-bit") {
    import spark.implicits._
    // the strong composite invariant: with nProbe = nCentroids no cell
    // is missed, and rerank ≥ corpus makes the 1-bit scan a no-op cut —
    // the refine then IS brute force over everything
    val rnd = new scala.util.Random(7)
    val emb = (0L until 30L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") % 5 === 0)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet
    val bq = Similarity.ivfBqTopK(emb, q, "vec_id", "embedding", 3,
      nCentroids = 4, nProbe = 4, rerank = 30, kmeansIters = 1)
      .collect().map(_.toSeq).toSet
    assert(bq == bf)
  }

  test("batched BQ probe equals the single-plan probe bit-for-bit") {
    import spark.implicits._
    // the bq tier's executor-memory batching contract, mirroring the pq
    // spec: hash-split sub-probes union to the exact unbatched answer
    val rnd = new scala.util.Random(11)
    val emb = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") % 4 === 0)
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 4, kmeansIters = 1, persist = false)
    val whole = Similarity.ivfBqProbeBatched(idx, q, "vec_id", "embedding",
      3, 4, 40, 1000000L, nBatches = 1).collect().map(_.toSeq).toSet
    val batched = Similarity.ivfBqProbeBatched(idx, q, "vec_id", "embedding",
      3, 4, 40, 1000000L, nBatches = 3).collect().map(_.toSeq).toSet
    assert(batched == whole)
    // the public entry derives batch=1 here (tiny probe relation, real
    // dim measured from the centroid table) and must agree too
    val derived = Similarity.ivfBqProbe(idx, q, "vec_id", "embedding", 3,
      nProbe = 4, rerank = 40).collect().map(_.toSeq).toSet
    assert(derived == whole)
  }

  test("ivfBqTopK: rerank below k is refused") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.ivfBqTopK(emb, emb, "vec_id", "embedding", 5, rerank = 3)
    }
  }

  test("binaryQuantTopK: signs against floored-mean thresholds, exact signed dot") {
    import spark.implicits._
    // thresholds: per-dim mean of (1e6, −1e6) = 0; a → (+,−), b → (−,+);
    // score(a→b) = 1e6·(−1) + (−1e6)·(+1) = −2e6 exactly (and symmetric)
    val emb = Seq((1L, Seq(1.0f, -1.0f)), (2L, Seq(-1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryQuantTopK(emb, emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((2L, -2000000.0)), 2L -> ((1L, -2000000.0))))
  }

  test("binaryQuantTopK: dimension 63 packs into the long's sign bit and roundtrips") {
    import spark.implicits._
    def oneHot(d: Int, v: Float) =
      Seq.tabulate(64)(i => if (i == d) v else 0.0f)
    val emb = Seq((1L, oneHot(63, 1.0f)), (2L, oneHot(63, -1.0f)))
      .toDF("vec_id", "embedding")
    // sgn of vec 2 at d63 is −1 (−1e6 < threshold 0), +1 elsewhere
    // (zeros tie the threshold and >= sets the bit); query 1 has mass
    // only at d63 → score(1→2) = 1e6·(−1) = −1e6. If bit 63 were
    // mis-packed (arithmetic instead of bitwise) the sign would flip.
    val out = Similarity.binaryQuantTopK(emb, emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> -1000000.0, 2L -> -1000000.0))
  }
}
