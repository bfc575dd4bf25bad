package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd k-means over an embedding column — the clustering
  * workhorse under cluster-balanced curation, SemDeDup-style semantic
  * dedup (Abbas et al. 2023 cluster first, dedup within cells), and
  * data-mixture design. The IVF tier ([[Similarity.kmeansCentroids]])
  * keeps a float k-means as an INTERNAL detail whose output is only
  * consumed through recall gates; this operator makes the cluster
  * assignment itself a first-class, warehouse-replayable result.
  *
  * Determinism design (the g1/PageRank recipe, applied to geometry):
  * every arithmetic step stays on INTEGER-VALUED doubles, so no sum
  * depends on accumulation order and an independent engine replays the
  * rounds bit-for-bit:
  *
  *  - vectors quantize ONCE to `round(x * scaleFp)` — integer-valued,
  *    exact in double below 2^53;
  *  - distances are sums of squared integer differences (exact);
  *  - argmin ties break to the smaller centroid id (struct-min);
  *  - recenter is `floor(sum / n)` per dimension — sum is exact (see
  *    bounds below), the quotient's floor is exact whenever the cell
  *    count n < 1e8 (a correctly-rounded double quotient cannot cross
  *    an integer boundary unless the divisor exceeds ~1/ulp of the
  *    quotient — documented, asserted nowhere because cells at 1e8
  *    members mean k was chosen absurdly small for the corpus);
  *  - seeds are the k rows with the smallest md5(id) — a content-
  *    stable uniform draw both engines can compute, NOT a sampled or
  *    RNG-dependent pick;
  *  - empty cells keep their previous centroid (left-join coalesce),
  *    so k never silently shrinks.
  *
  * Exactness bounds, with B = scaleFp · max|x|: per-dimension cell
  * sums need n·B < 2^53 and distances need dim·(2B)^2 < 2^53. At the
  * defaults (scaleFp=1000, unit-scale embeddings, dim ≤ 4096) that
  * allows corpora of ~10^9 vectors per cell and dims to 4096 with
  * room to spare. Quantization at 1e-3 moves an assignment only for
  * points near-equidistant between centroids at that resolution —
  * exactly the points where float k-means is itself ulp-unstable; the
  * trade buys bit-replayability.
  *
  * Scale shape (what survives 100 TB):
  *  - assignment is ONE narrow codegen pass per round: the centroid
  *    set collapses to a single array row that broadcasts to every
  *    corpus partition (`k·dim` doubles — KBs for any sane k); the
  *    corpus NEVER shuffles;
  *  - recenter's exchange carries one dim-length accumulator per
  *    (partition × cell) via [[graft.functions.VectorSum]] — never the
  *    corpus×dim explode a posexplode+groupBy formulation would ship;
  *  - the quantized corpus is cached once in a bounded [[CacheSlot]]
  *    (re-reading parquet per round is the naive alternative);
  *  - per-round centroid plans cut through [[CheckpointCut]] (k rows —
  *    the cut is cheap and keeps the final plan from nesting `iters`
  *    corpus passes; reliable files when a checkpoint dir is set).
  */
object Clustering {

  private val corpusSlot = new CacheSlot

  private def seedOrder(id: Column): Seq[Column] =
    Seq(md5(id.cast("string")).asc, id.cast("string").asc)

  /** Assign every vector to one of k Lloyd-refined cells.
    *
    * @param corpus  input table
    * @param idCol   unique id column (any castable-to-string type)
    * @param vecCol  `array<float|double>` embedding column, dense
    *                (null elements are caller error)
    * @param k       number of cells
    * @param iters   Lloyd refinement rounds over the md5-picked seeds
    * @param scaleFp fixed-point quantization scale (see bounds above)
    * @return (idCol, cluster LONG, dist_fp DOUBLE) — dist_fp is the
    *         exact integer squared distance to the winning centroid in
    *         quantized units, a ready-made quality/outlier signal
    */
  def kmeansAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      scaleFp: Int = 1000): DataFrame = {
    val (_, cent, assign) = lloyd(corpus, idCol, vecCol, k, iters, scaleFp)
    assign(cent)
      .select(col("km_id").as(idCol), col("cluster"), col("dist_fp"))
  }

  /** The Lloyd machinery shared by [[kmeansAssign]] and
    * [[marginGate]]: quantized corpus, refined centroids, and the
    * single-pass assignment closure.
    */
  private def lloyd(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scaleFp: Int): (DataFrame, DataFrame, DataFrame => DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(scaleFp >= 1, s"scaleFp must be >= 1, got $scaleFp")

    val qv = transform(col(vecCol), x => round(x.cast("double") * scaleFp))
    val q = corpusSlot.persist(
      corpus.select(col(idCol).as("km_id"), qv.as("qv")))

    // seeds: k smallest md5(id) — content-stable, engine-independent;
    // re-keyed to dense 1..k cell ids via row_number over that order
    val seedW = Window.orderBy(seedOrder(col("km_id")): _*)
    var cent: DataFrame = q
      .orderBy(seedOrder(col("km_id")): _*)
      .limit(k)
      .select(row_number().over(seedW).cast("long").as("cid"),
        col("qv").as("cv"))

    def assign(c: DataFrame): DataFrame = {
      // centroid set → ONE array row, broadcast; argmin in a single
      // codegen pass (struct-min: dist ASC, cid ASC — exact integer
      // comparisons, so the tie-break is deterministic, not ulp-lucky)
      val centArr = c.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
      q.crossJoin(broadcast(centArr))
        .select(col("km_id"), col("qv"),
          array_min(transform(col("cents"), cc => struct(
            aggregate(
              zip_with(col("qv"), cc.getField("cv"), (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x).as("dist"),
            cc.getField("cid").as("cid")))).as("win"))
        .select(col("km_id"), col("qv"),
          col("win.cid").as("cluster"), col("win.dist").as("dist_fp"))
    }

    var r = 0
    while (r < iters) {
      val assigned = assign(cent)
      val means = assigned
        .groupBy(col("cluster").as("cid"))
        .agg(graft.functions.VectorSum.vector_sum(col("qv")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("cid"),
          transform(col("vsum"), x => floor(x / col("n")).cast("double")).as("mv"))
      val prev = cent
      cent = CheckpointCut.cut(
        prev.join(means, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv")))
      if (r > 0) CheckpointCut.release(prev)
      r += 1
    }
    (q, cent, assign)
  }

  /** Clustering-quality gate: per-cell separation margins. For every
    * point the margin is `dist2 - dist1` — exact integer squared
    * distance to the SECOND-nearest centroid minus the nearest (0 when
    * two centroids tie for the point; ties order by cell id exactly as
    * [[kmeansAssign]]'s argmin, so the pair both engines pick is the
    * same pair). A cell full of near-zero margins sits on a boundary —
    * its members would flip cells under tiny perturbations, the
    * assignment noise a curation pipeline should not stratify on.
    *
    * The margin pass rides the SAME single broadcast-codegen scan as
    * assignment (one `array_sort` over the k-element struct array
    * replaces the argmin `array_min` — k·dim work per row either way);
    * the per-cell rollup is an ordinary partial-final agg of exact
    * integers, so the whole gate is one corpus pass, zero extra
    * shuffles over plain assignment.
    *
    * @return per-cell (cluster, n BIGINT, margin_sum_fp DOUBLE — exact
    *         integer sum, min_margin_fp / max_margin_fp DOUBLE): the
    *         warehouse-replayable margin profile of the clustering
    */
  /** Nearest-class-centroid accuracy — the cheapest "are these
    * embeddings separable by label" probe (a prototype classifier:
    * Rocchio / nearest-mean). Each label's centroid is the FLOORED
    * integer mean of its quantized vectors (the v15/v22 recipe), every
    * vector assigns to the nearest centroid by EXACT integer squared
    * L2 (ties → smaller label id), and the report is per-true-label
    * accuracy in floored bp. Near-chance accuracy says the embedding
    * space doesn't encode the label; high accuracy justifies paying
    * for k-NN/classifier tiers.
    *
    * Scale shape: one posexplode pass → (labels × dims) sums →
    * a one-row broadcast centroid array; assignment is ONE codegen
    * corpus pass (the corpus never shuffles — the v15 contract);
    * per-label rollup is labels-sized.
    *
    * @return per label: (label, n, n_correct, accuracy_bp)
    */
  def prototypeAccuracy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      scaleFp: Int = 1000): DataFrame = {
    require(scaleFp >= 1, s"scaleFp must be >= 1, got $scaleFp")
    val base = df.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).cast("int").as("label"),
        expr(s"""transform($vecCol, x ->
          CAST(round(CAST(x AS DOUBLE) * $scaleFp) AS BIGINT))""").as("qv"))
    val sums = base
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("(s - ((s % n + n) % n)) div n"))
    val centArr = sums
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("st"))
      .select(col("label"), expr("transform(st, e -> e.c)").as("cv"))
      .agg(sort_array(collect_list(struct(col("label"), col("cv")))).as("cents"))
    base.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        """aggregate(
             transform(cents, e -> named_struct(
               'd', aggregate(zip_with(qv, e.cv, (a, b) -> (a - b) * (a - b)),
                 0L, (x, y) -> x + y),
               'l', e.label)),
             named_struct('d', CAST(NULL AS BIGINT), 'l', CAST(NULL AS INT)),
             (acc, e) -> CASE WHEN acc.d IS NULL OR e.d < acc.d
               OR (e.d = acc.d AND e.l < acc.l) THEN e ELSE acc END)"""))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("best.l") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy_bp", expr("(10000 * n_correct) div n"))
  }

  def marginGate(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      scaleFp: Int = 1000): DataFrame = {
    require(k >= 2, s"margins need k >= 2 centroids, got $k")
    val (q, cent, _) = lloyd(corpus, idCol, vecCol, k, iters, scaleFp)
    val centArr = cent.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    q.crossJoin(broadcast(centArr))
      .select(col("km_id"),
        // sorted (dist, cid) struct array: [0] is the winner (argmin with
        // the id tie-break), [1] the runner-up — one pass, k log k per row
        array_sort(transform(col("cents"), cc => struct(
          aggregate(
            zip_with(col("qv"), cc.getField("cv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("dist"),
          cc.getField("cid").as("cid")))).as("ds"))
      .select(
        element_at(col("ds"), 1).getField("cid").as("cluster"),
        (element_at(col("ds"), 2).getField("dist") -
          element_at(col("ds"), 1).getField("dist")).as("margin_fp"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("margin_fp")).as("margin_sum_fp"),
        min(col("margin_fp")).as("min_margin_fp"),
        max(col("margin_fp")).as("max_margin_fp"))
  }

  /** Cluster-balanced sampling: k-means the corpus, then draw a fixed
    * `nPer` ids per cell by md5 priority ([[Corpus.sampleFixedPerStratum]]
    * — the bounded-heap path, no Window over the corpus). This is the
    * curation shape that keeps a mixture from collapsing onto its head
    * clusters: every semantic region contributes the same count no
    * matter how over-crawled it is.
    *
    * @return (cluster LONG, idCol, sample_rank INT)
    */
  /** Exact DBSCAN (Ester et al. 1996) over the cosine ε-neighborhood
    * graph: neighbors are pairs with cosine ≥ `threshold`; a point is
    * CORE when its neighborhood (point itself included — the textbook
    * minPts convention) reaches `minPts`; clusters are connected
    * components of the core-core subgraph labeled by smallest member
    * id; a BORDER point attaches to the smallest cluster id among its
    * core neighbors (the deterministic resolution of DBSCAN's
    * order-dependent border tie); everything else is NOISE. Density
    * clustering complements [[kmeansAssign]] where cluster count is
    * unknown and outliers must stay OUT of every cell (k-means has no
    * noise concept — every point lands somewhere).
    *
    * Scale shape: composition of proven tiers — the pair pass is
    * [[Similarity.embeddingNearDup]] (or the sign-LSH bucketed path for
    * corpus scale), core detection one partial-combine count on uniform
    * id keys, clustering [[Dedup.connectedComponents]] (pointer-doubling
    * O(log d) rounds, reliable checkpoints under a checkpoint dir), and
    * the border attach two semi/anti joins plus a min-agg. No step
    * shuffles vectors — after the pair pass everything is (id, id) pairs.
    *
    * @return (idCol, role STRING core|border|noise, cluster_id — id type,
    *         null for noise)
    */
  def dbscan(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      minPts: Int,
      scalePath: Boolean = false): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pairs = (if (scalePath)
      Similarity.lshEmbeddingNearDup(embeddings, idCol, vecCol, threshold)
    else Similarity.embeddingNearDup(embeddings, idCol, vecCol, threshold))
      .select("id_a", "id_b")
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val cores = sym.groupBy("id").agg(count(lit(1)).as("n_nb"))
      .where(col("n_nb") + 1 >= minPts).select("id")
    val corePairs = pairs
      .join(cores.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(cores.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // isolated cores (no core neighbor) fall out of the CC relation and
    // label themselves — k never silently loses a dense singleton
    val cc = Dedup.connectedComponents(corePairs)
    val coreLab = cores.join(cc, cores("id") === cc("doc_id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    val borderLab = sym
      .join(coreLab.select(col("id").as("nb"), col("cluster_id").as("nb_cl")),
        Seq("nb"))
      .join(cores, Seq("id"), "left_anti")
      .groupBy("id").agg(min(col("nb_cl")).as("cluster_id"))
    val assigned = coreLab.select(col("id"), lit("core").as("role"), col("cluster_id"))
      .unionByName(borderLab.select(col("id"), lit("border").as("role"), col("cluster_id")))
    embeddings.select(col(idCol).as("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("role"), lit("noise")).as("role"), col("cluster_id"))
  }

  def clusterBalancedSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      nPer: Int,
      scaleFp: Int = 1000): DataFrame = {
    val assigned = kmeansAssign(corpus, idCol, vecCol, k, iters, scaleFp)
    Corpus.sampleFixedPerStratum(assigned, Seq("cluster"), idCol, nPer)
  }
}
