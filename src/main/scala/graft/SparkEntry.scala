package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (IDs in the names), plus the LLM-pipeline extensions
  * (dedup d*, text t*, vectors v*, events e*, multimodal m*).
  *
  * Every computed column is aliased identically in the Spark plan and the
  * DuckDB oracle SQL, and numeric results are engineered for cross-engine
  * bit-equality:
  *   - double aggregates go through exact DECIMAL sums, cast back to
  *     double at the end (sum order then cannot perturb the result);
  *   - per-row double arithmetic uses the identical expression tree in
  *     both engines (IEEE 754 ops are deterministic given the same order);
  *   - integer-ish results are cast to BIGINT on both sides;
  *   - dates/timestamps cross the boundary as formatted strings.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The dense-duplicate corpus of the d4c/d2c collapse gates: the
    * deterministic 10% doc slice, each doc replicated 4× with ids
    * doc_id*4+r — 75% duplicate density, past the collapse-dispatch
    * cutoff at every SF by construction (density is replication-set,
    * not corpus-dependent). Mirrored bit for bit by [[denseDocsSql]].
    */
  private def denseDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") % 10 === 3)
      .select(explode(sequence(lit(0L), lit(3L))).as("r"),
        col("doc_id"), col("text"))
      .select((col("doc_id") * 4 + col("r")).as("doc_id"), col("text"))

  /** The recall-gate query set: the vec_id%10 tenth of the corpus by
    * default. That fraction makes gate work queries × corpus — quadratic
    * in SF by construction — so scale-up benches OOM measuring the GATE,
    * not the engine (the r7 100× finding). SPARK_GRAFT_QUERY_BUDGET=N
    * caps it at the FIRST N of those queries (vec_id < 10N: vec_ids are
    * dense from 0 and the replica stride is a multiple of 10, so the
    * subset is deterministic and identical across scale-ups — the
    * tools.ScaleProbe fixed-budget production shape). BENCH-ONLY knob:
    * correctness runs never set it — the oracle SQL replays the default
    * full tenth, and a budget-capped run would hash-mismatch loudly.
    */
  private def gateQueries(emb: DataFrame): DataFrame = {
    val base = emb.where(col("vec_id") % 10 === 0)
    sys.env.get("SPARK_GRAFT_QUERY_BUDGET") match {
      case Some(n) => base.where(col("vec_id") < 10L * n.toLong)
      case None => base
    }
  }

  /** The deterministic 10% customer slice of the co-purchase relation —
    * the shared input of the g4s/g11s/g12s/g14s slice gates (the full
    * relation's DuckDB oracle is the 10× spill class; the slice keeps
    * each graph operator hash-checked above sf0.1).
    */
  private def copurchaseSlice(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_custkey") % 10 === 3)
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))

  /** The distinct customer–supplier trade pairs (disjoint long ids:
    * customers even, suppliers odd) — the shared edge relation of the
    * supply-chain graph family (PageRank, BFS/diameter, personalized
    * rank, HITS, landmark closeness). The fact join + distinct is the
    * expensive part and identical across all of them, so it goes through
    * [[graft.ops.Graph.cacheEdges]]: one session-cached pair list, every
    * consumer's first exchange reads it instead of re-joining the fact
    * tables (alias names differ per consumer but canonicalized plans
    * don't — Spark erases names, so every variant shares one entry).
    */
  private def supplyPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.cacheEdges(
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct())

  /** Both orientations of [[supplyPairs]] via explode, NOT
    * union(pairs, pairs.swap): union would run the whole fact join +
    * distinct twice.
    */
  private def supplyEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = supplyPairs(s, dir)
    pairs.select(explode(array(
      struct(col("a").as("s"), col("b").as("d")),
      struct(col("b").as("s"), col("a").as("d")))).as("e"))
      .select(col("e.s").as("a"), col("e.d").as("b"))
  }

  /** The 1% centile variant of [[copurchaseSlice]] — the 100× gates'
    * input. A mod-10 slice is slice-QUADRATIC in replica count
    * (custkey strides are powers of 10, so it keeps EVERY replica of
    * 1-in-10 base customers; at 100× the sliced graph's DuckDB wedge
    * replays exhaust the temp budget exactly like the full graph did
    * at 10×). mod-100 keeps every replica of 1-in-100 base customers —
    * the same full-strength within-family structure at the slice size
    * that passes at 10×.
    */
  private def copurchaseCentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_custkey") % 100 === 37)
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))

  /** events.parquet's ts layout has varied across testdata generations
    * (TIMESTAMP(NANOS) read as a raw long under `nanosAsLong`;
    * TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) — normalize to a plain
    * session-UTC TIMESTAMP either way. The layout dispatch, and why the
    * ns path must use truncating integer division, live on
    * [[graft.streaming.EventStreams.normalizeTs]].
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.EventStreams.normalizeTs(t(s, dir, "events"))
  }

  /** Shared recall gate for the IVF checks (v3i in-memory, v5 written
    * index): (n_bf, recall_ok) where recall_ok asserts the approximate
    * result recovers ≥ 0.7 of the exact top-k pairs. ONE definition —
    * the two gates must enforce the same contract, and the oracle
    * recomputes n_bf independently.
    */
  private def recallGate(
      bf0: org.apache.spark.sql.DataFrame,
      approx0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bf = bf0.select("query_id", "neighbor_id")
    val approx = approx0.select("query_id", "neighbor_id")
    val hit = bf.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
    bf.agg(count(lit(1)).as("n_bf"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_bf"),
        (col("n_hit").cast("double") / col("n_bf") >= 0.7).cast("int").as("recall_ok"))
  }

  /** The llm1 corpus funnel — raw docs → Gopher quality gate → exact
    * dedup → exact-Jaccard near-dup connected components → per-language
    * funnel counts and final token budget. One definition serves the
    * full-corpus gate (llm1) and the mod-100 centile gate (llm1s), so
    * the sliced replay proves the SAME composition.
    */
  private def corpusFunnel(docs: DataFrame): DataFrame = {
    val keep = graft.ops.TextAnalysis
      .gopherRules(docs, "doc_id", "text", minWords = 30)
      .where(col("keep")).select("doc_id")
    val qdocs = docs.join(keep, Seq("doc_id"))
    val uniqIds = graft.ops.Dedup.exact(qdocs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val udocs = qdocs.join(uniqIds, Seq("doc_id"))
    val pairs = graft.ops.Dedup.ngramJaccardPairsAuto(udocs, "doc_id", "text", 0.8)
    val dropped = graft.ops.Dedup.connectedComponents(pairs)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val fdocs = udocs.join(dropped, Seq("doc_id"), "left_anti")
    val raw = docs.groupBy("lang").agg(count(lit(1)).as("n_raw"))
    val q = qdocs.groupBy("lang").agg(count(lit(1)).as("n_quality"))
    val u = udocs.groupBy("lang").agg(count(lit(1)).as("n_unique"))
    val f = fdocs.groupBy("lang").agg(count(lit(1)).as("n_final"),
      sum(graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("tokens_final"))
    raw.join(q, Seq("lang"), "left").join(u, Seq("lang"), "left")
      .join(f, Seq("lang"), "left")
      .na.fill(0L, Seq("n_quality", "n_unique", "n_final", "tokens_final"))
  }

  /** Exact-decimal sum of a double column, returned as double. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Documents augmented with a shared tail (the text of doc id%n,
    * joined by `sep`) — cross-doc duplicate content exists by
    * construction, and docs 0..n-1 additionally duplicate themselves.
    * Shared by t14 (paragraph dedup) and t16 (repeated spans); each
    * oracle mirrors it as its `aug`/`multi` CTE, so the modulus and
    * separator here must match the SQL verbatim.
    */
  private def sharedTailDocs(s: SparkSession, dir: String, n: Int, sep: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val shared = d.where(col("doc_id") < n)
      .select(col("doc_id").as("k"), col("text").as("stext"))
    d.withColumn("k", col("doc_id") % n)
      .join(shared, Seq("k"))
      .select(col("doc_id"), concat(col("text"), lit(sep), col("stext")).as("text"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j2_multi_join")(spark, "/root/testdata/sf0.001")

  // ===================================================================
  // Queries
  // ===================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- M: REAL audio decode (javax.sound.sampled) over synthesized
    //      PCM-16 WAV payloads; RMS of a +-A square wave is exactly A,
    //      so the oracle recomputes every stat from the same md5 ----
    "m3_audio_features" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticWavPayload(t(s, dir, "documents"), "doc_id", "text", 32).toDF()
      graft.ops.Multimodal.audioStats(media, 0).toDF()
        .select(col("media_id"), col("format"), col("sample_rate"),
          col("n_samples"), col("rms"))
    }),

    // ---- M: image perceptual-hash near-dup — the multimodal dedup
    //      flow: synthesize 8×8 gray PNGs (base image per id%40 group,
    //      one-pixel variant per id div 40), REAL PNG decode, aHash in
    //      integer arithmetic, pigeonhole hamming join (exact ≤ 3).
    //      Every pixel derives from md5, so the oracle replays hash
    //      construction AND pairing bit-for-bit ----
    "m5_image_neardup" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticGrayPngPayload(t(s, dir, "documents"), "doc_id", 40, 32).toDF()
      val hashes = graft.ops.Multimodal.aHash64(media, 0).toDF()
      graft.ops.Dedup.hammingNearDupPairs(hashes, "media_id", "ahash", 3)
    }),

    // ---- M: audio fingerprint near-dup — the clip-level aHash over a
    //      REAL WAV decode (step waves, 64 md5-derived segment levels,
    //      one-segment variants per group): segment-sum bits vs the
    //      clip mean, pigeonhole hamming pairs. The ×128+64 level
    //      mapping and the 25-sample segment factor cancel in the mean
    //      comparison, so the oracle replays on the raw md5 bytes —
    //      container encode, PCM decode, and hashing all hash-checked ----
    "m7_audio_neardup" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticStepWavPayload(t(s, dir, "documents"), "doc_id", 40, 32).toDF()
      val hashes = graft.ops.Multimodal.audioHash64(media, 0).toDF()
      graft.ops.Dedup.hammingNearDupPairs(hashes, "media_id", "ahash", 3)
    }),

    // ---- AIR1: the reference's three airline pipelines end-to-end
    //      (ingest coercion -> mart -> compensation) under the driver's
    //      oracle. venta/pasajero are shaped deterministically from
    //      orders/customer (so DuckDB can rebuild them); vuelo comes from
    //      literal pipe-delimited lines through the S7 split + coercion
    //      path. Covers SRC1 coercion rules (S3 slash dates, S4 compact
    //      timestamps, dirty-INTEGER policy), J1/J2/W1 joins + dedup,
    //      S1 abs, S2 obfuscation, A1/A2 quota, S5 ages, S6
    //      classification, and the SURVEY 2.8 determinism contract. ----
    "air1_mart_pipeline" -> ((s, dir) => {
      import graft.sources.PipeDelimitedSource.coerce
      import org.apache.spark.sql.types._
      val base = to_timestamp(lit("2020-10-19 00:00:00"))
      val okey = col("o_orderkey")
      val venta = t(s, dir, "orders").select(
        lit("AA").as("codigo_aerolinea"),
        concat(lit("AV"), okey % 3).as("cod_avion"),
        concat(lit("S"), okey % 100).as("asiento"),
        when(okey % 97 === 0, concat(lit("DX"), col("o_custkey")))
          .otherwise(concat(lit("D"), col("o_custkey"))).as("dni"),
        when(okey % 7 === 0, -col("o_totalprice")).otherwise(col("o_totalprice")).as("monto"),
        col("o_orderstatus").as("estado"),
        // compact-format roundtrip: the S4 ingest rule must re-parse its
        // own formatted output losslessly (second granularity, UTC)
        coerce(date_format(base + make_dt_interval(lit(0), lit(0), lit(0), okey.cast("double")),
          "yyyyMMdd HH:mm:ss"), TimestampType).as("fecha_reserva"),
        coerce(date_format(base + make_dt_interval(lit(0), lit(1), lit(0), okey.cast("double")),
          "yyyyMMdd HH:mm:ss"), TimestampType).as("fecha_compra"),
        col("o_orderpriority").as("categoria"))
      val ck = col("c_custkey")
      val pasajero = t(s, dir, "customer").select(
        concat(lit("D"), ck).as("dni"),
        concat(col("c_name"), lit(" "), col("c_mktsegment")).as("nombre_completo"),
        concat(col("c_name"), lit("@mail.test")).as("correo_electronico"),
        concat(lit("Calle "), col("c_nationkey")).as("direccion"),
        // dirty-INTEGER rule: spaces and dashes stripped, sign kept
        coerce(concat(lit("+56 9 "), ck, lit("-"), col("c_nationkey")), LongType)
          .as("telefono"),
        coerce(concat(lit(1940) + ck % 70, lit("/"), lit(1) + ck % 12, lit("/"),
          lit(1) + ck % 28), DateType).as("fecha_de_nacimiento")) // S3 slash date
      import s.implicits._
      val vuelo = Seq(
        "AV0|180|T9|P1|V100|08:00|10:00",
        "AV0|180|T2|P2|V100|08:00|10:00",
        "AV0|200|T5|P3|V200|09:00|11:00",
        "AV1|150|T1|P4|V300|10:00|12:00",
        "AV2|150|T3|P5|V400|11:00|13:00",
        "AVX|100|T7|P6|V500|12:00|14:00").toDF("line")
        .select(graft.airline.AirlineSchemas.vuelo.fields.zipWithIndex.map { case (f, i) =>
          coerce(element_at(split(col("line"), "\\|"), i + 1), f.dataType).as(f.name)
        }.toSeq: _*)
      val mart = graft.airline.MartBuilder.build(venta, pasajero, vuelo)
      graft.airline.Compensation(mart, asOfYear = 2020).select(
        col("codigo_aerolinea"), col("cod_avion"), col("asiento"), col("dni"),
        col("monto"), col("estado"),
        date_format(col("fecha_reserva"), "yyyy-MM-dd HH:mm:ss").as("fecha_reserva"),
        date_format(col("fecha_compra"), "yyyy-MM-dd HH:mm:ss").as("fecha_compra"),
        col("categoria"), col("capacidad"), col("cod_tripulacion"), col("cod_piloto"),
        col("cod_vuelo"), col("horario_salida"), col("horario_llegada"),
        col("nombre_completo"), col("correo_electronico"), col("direccion"),
        col("telefono"),
        date_format(col("fecha_de_nacimiento"), "yyyy-MM-dd").as("fecha_de_nacimiento"),
        col("compensacion"))
    }),

    // ---- A1: grouped aggregation with arithmetic (TPC-H Q1 shape) ----
    "a1_full_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // ---- A2: grouped conditional aggregation ----
    "a2_conditional_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          count(lit(1)).as("n_total"))
        .withColumn("finished_share", col("n_finished").cast("double") / col("n_total"))
    }),

    // ---- P1/F1: projection + filter pushdown ----
    "p1_projection_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R" && col("l_quantity") >= 45 &&
          col("l_shipdate") >= lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
    }),

    // ---- P2: identity projection (SELECT *) scan ----
    "p2_select_star" -> ((s, dir) => t(s, dir, "nation")),

    // ---- J1: broadcast hash join fact⋈dim ----
    "j1_broadcast_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // ---- J2: multi-way join (TPC-H Q5 shape) ----
    "j2_multi_join" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1999-01-01"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- J3/A1/A2/S6/§2.8: decorrelated quota allocation (compensation
    //      shape, re-expressed over orders; deterministic rank contract) ----
    "j3_decorrelated_quota" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val isPre = col("o_orderpriority") === "1-URGENT"
      val quota = orders.groupBy("o_custkey").agg(
        (floor(count(lit(1)) / 2) -
          sum(when(isPre, 1L).otherwise(0L))).as("quota_left"))
      val eligible = (col("o_totalprice") < 60000.0 || col("o_totalprice") > 400000.0) && !isPre
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders
        .withColumn("elig_rank", sum(when(eligible, 1L).otherwise(0L)).over(w))
        // no hint: the quota aggregate materializes a shuffle stage, so
        // AQE broadcasts from its real size (same policy as Compensation)
        .join(quota, Seq("o_custkey"))
        .withColumn("flag",
          when(!(col("quota_left") > 0), lit(null).cast("string"))
            .when(isPre, lit(null).cast("string"))
            .when(eligible && col("elig_rank") <= col("quota_left"),
              when(col("o_totalprice") < 60000.0, "LOW_VALUE").otherwise("HIGH_VALUE"))
            .when(eligible, lit(null).cast("string"))
            .otherwise(lit("NO APLICA")))
        .select("o_orderkey", "o_custkey", "flag")
    }),

    // ---- SRC2: catalog-backed SQL scan (temp-view catalog + spark.sql;
    //      the pushed-down-SQL path of the reference's BigQuerySource) ----
    "src2_sql_scan" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      t(s, dir, "region").createOrReplaceTempView("region_v")
      s.sql("""SELECT r_name, COUNT(*) AS n_nations
               FROM nation_v JOIN region_v ON n_regionkey = r_regionkey
               GROUP BY r_name""")
    }),

    // ---- G: fixed-point PageRank over the customer↔supplier trade
    //      graph (both directions of each distinct (cust, supp) pair
    //      from orders⋈lineitem) — the domain-authority ranking signal
    //      web-corpus pipelines gate crawl quality with. 5 power
    //      iterations, damping 0.85, all-integer micro-unit ranks so
    //      accumulation order cannot move a single bit ----
    // ---- D: containment (overlap-coefficient) near-dup — the
    //      asymmetric tier that catches doc-inside-doc: shared shingles
    //      normalized by the SMALLER set. sharedTailDocs embeds doc
    //      k%40's text inside every doc of its group, so containment
    //      pairs exist by construction where Jaccard stays low ----
    "d13_containment" -> ((s, dir) =>
      graft.ops.Dedup.overlapPairs(
        sharedTailDocs(s, dir, 40, " "), "doc_id", "text", n = 3, minBp = 9000L)),

    // ---- D: containment over the deterministic 10% doc slice — the
    //      10× oracle check for d13's spill-class inverted-index
    //      self-join (same d16s/d17s/g10s rationale) ----
    "d13s_containment_slice" -> ((s, dir) =>
      graft.ops.Dedup.overlapPairs(
        sharedTailDocs(s, dir, 40, " ").where(col("doc_id") % 10 === 3),
        "doc_id", "text", n = 3, minBp = 9000L)),

    // ---- D: containment over the deterministic 1% centile slice —
    //      the 100× gate. The 10% slice is slice-QUADRATIC in replica
    //      count (replica strides are powers of 10, so a mod-10 slice
    //      keeps EVERY copy of 1-in-10 base docs: at 100× that is 500
    //      texts × 100 copies whose exact-tier candidate shuffle
    //      out-spills one box — the measured r8 ENOSPC). mod-100 keeps
    //      every copy of 1-in-100 base docs: same operator, same
    //      full-strength within-group pair structure, slice sized like
    //      the 10% slice at 10× (which passes). d13's exact tier
    //      deliberately has NO collapse dispatch to hide behind —
    //      containment of non-identical doc-in-doc pairs is what it
    //      exists for ----
    "d13s2_containment_centile" -> ((s, dir) =>
      graft.ops.Dedup.overlapPairs(
        sharedTailDocs(s, dir, 40, " ").where(col("doc_id") % 100 === 37),
        "doc_id", "text", n = 3, minBp = 9000L)),

    // ---- D: URL blocklist — domain-SUFFIX matching as a hash join
    //      (C4/RefinedWeb's URL gate): hosts synthesize from doc ids
    //      (every fifth gets a cdn. subdomain), patterns block a whole
    //      zone, an exact host, and a deeper host; the longest match
    //      wins where zones nest ----
    // ---- D: canonical-URL dedup (the C4/RefinedWeb first pass) —
    //      three messy variants of every page (www + case, root dot +
    //      tracker param, https default port + two trackers) must
    //      collapse to ONE canonical key; the fourth variant carries a
    //      NON-default port (http://…:443) and must stay DISTINCT —
    //      the port strip is scheme-aware, not a blanket 80/443 rule;
    //      smallest doc_id survives ----
    "d14_url_canonical" -> ((s, dir) => {
      val urls = t(s, dir, "documents").select(col("doc_id"),
        expr("""CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'https://www.example' || (doc_id % 50) || '.com/p/' || (doc_id % 200)
          WHEN 1 THEN 'HTTPS://Example' || (doc_id % 50) || '.com./p/' || (doc_id % 200)
                      || '?utm_source=feed'
          WHEN 2 THEN 'https://example' || (doc_id % 50) || '.com:443/p/' || (doc_id % 200)
                      || '?gclid=abc&ref=tw#frag'
          ELSE 'http://example' || (doc_id % 50) || '.com:443/p/' || (doc_id % 200)
          END""").as("url"))
      graft.ops.Corpus.dedupByCanonicalUrl(urls, "doc_id", "url")
        .withColumnRenamed("id", "doc_id")
    }),

    "d12_url_blocklist" -> ((s, dir) => {
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(when(col("doc_id") % 5 === 0, lit("cdn.")).otherwise(lit("")),
          lit("d"), col("doc_id") % 97, lit(".s"), col("doc_id") % 7, lit(".com"))
          .as("host"))
      val pats = s.range(1).select(explode(array(
        lit("s3.com"), lit("d17.s3.com"), lit("d11.s4.com"), lit("nomatch.org"))).as("p"))
      graft.ops.Corpus.urlBlocklist(urls, "doc_id", "host", pats, "p")
    }),

    // ---- T: held-out LM scoring — train the bigram model on even doc
    //      ids, score the odd ones with add-one smoothing. Unseen
    //      events fire BY CONSTRUCTION: scored docs ≡1 mod 7 get a
    //      doc-unique `zzqx<n>` token appended, forcing both the
    //      unseen-bigram and unseen-context branches ----
    "t28_lm_heldout" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.where(col("doc_id") % 2 === 0)
      val score = docs.where(col("doc_id") % 2 === 1)
        .withColumn("text",
          when(col("doc_id") % 7 === 1,
            concat(col("text"), lit(" zzqx"), col("doc_id") % 100))
            .otherwise(col("text")))
      graft.ops.TextAnalysis.lmScoreHeldOut(train, score, "doc_id", "text")
    }),

    // ---- V: sparse TF-IDF cosine top-k — lexical retrieval over the
    //      inverted index (one word-keyed equi-join, never |Q|·|corpus|);
    //      integer tf/df/weights/dots + correctly-rounded sqrt/div make
    //      the ranking engine-exact. The sparse complement of v1's dense
    //      tier ----
    "v11_sparse_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Similarity.sparseCosineTopK(
        docs, "doc_id", "text",
        docs.where(col("doc_id") % 100 === 0).select("doc_id"), "doc_id", k = 5)
    }),

    // ---- V: BM25 top-k retrieval — the Okapi ranking law over the
    //      same inverted index as v11: quantized idf (df>N/2 goes
    //      legitimately negative), IEEE-exact tf saturation + length
    //      normalization, per-term rounding into an order-free LONG
    //      sum ----
    "v12_bm25_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Similarity.bm25TopK(
        docs, "doc_id", "text",
        docs.where(col("doc_id") % 100 === 0).select("doc_id"), "doc_id", k = 5)
    }),

    // ---- V: reciprocal-rank fusion — the hybrid-search combiner:
    //      v11's TF-IDF-cosine and v12's BM25 lists (top-20 each)
    //      fuse by 1e6 div (60+rank) micro-unit sums — rank-based, so
    //      no score calibration across incomparable scales; exact
    //      LONGs end to end ----
    "v27_rrf_hybrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id") % 100 === 0).select("doc_id")
      val sparse = graft.ops.Similarity.sparseCosineTopK(
        docs, "doc_id", "text", queries, "doc_id", k = 20)
      val bm = graft.ops.Similarity.bm25TopK(
        docs, "doc_id", "text", queries, "doc_id", k = 20)
      graft.ops.Similarity.rrfFuse(Seq(sparse, bm), rrfK = 60, k = 10)
    }),

    // ---- G: multi-source BFS hop distance over the trade graph —
    //      every node's link distance from a seeded supplier set,
    //      bounded depth. Level-synchronous expansion == MIN(depth)
    //      over the recursive closure, so DuckDB's recursive CTE is an
    //      exact oracle ----
    "g3_bfs_hops" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 10 === 0)
        .select((col("s_suppkey").cast("long") * 2 + 1).as("seed"))
      graft.ops.Graph.bfsHops(
        supplyEdges(s, dir), "a", "b", seeds, "seed", maxHops = 3)
    }),

    // ---- G: landmark closeness + harmonic centrality — per-seed BFS
    //      with seed identity (all landmarks advance in one join per
    //      round), exact hop sums, floored micro-unit reciprocals;
    //      horizon-bounded, the practical web-scale definition ----
    "g15_closeness" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 25 === 0)
        .select((col("s_suppkey").cast("long") * 2 + 1).as("seed"))
      graft.ops.Graph.closenessCentrality(
        supplyEdges(s, dir), "a", "b", seeds, "seed", maxHops = 3)
    }),

    "g1_pagerank" -> ((s, dir) =>
      // disjoint LONG node ids (customers even, suppliers odd) — long
      // keys hash/shuffle several times cheaper than string-prefixed ones
      graft.ops.Graph.pageRank(
        supplyEdges(s, dir), "a", "b", iterations = 5, dampingBp = 8500)),

    // ---- G: per-node triangle counts over the customer co-purchase
    //      graph (pairs sharing >= 3 distinct parts) — co-occurrence
    //      mining via the inverted-index join, then the degree-ordered
    //      node-iterator (out-degree O(sqrt m) under the orientation,
    //      so wedge volume is m^1.5 regardless of hub skew) ----
    // ---- G: label-propagation communities over the co-purchase
    //      projection (one-mode first — synchronous LPA oscillates on
    //      bipartite structure): 3 deterministic rounds, most-frequent
    //      neighbor label, ties to the smallest ----
    "g4_label_prop" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      val pairs = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      val edges = pairs.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"))
      graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3)
    }),

    // ---- G: modularity — is g4's community assignment better than a
    //      degree-preserving random rewiring? all-integer Newman Q in
    //      floored micro-units ----
    "g12_modularity" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      // the co-occurrence join is the expensive part and BOTH the
      // label-prop rounds and every modularity branch consume it —
      // coOccurrenceEdges self-caches its pair list (one artifact for
      // every consumer of this graph in the session)
      val pairs = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      val edges = pairs.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"))
      val labels = graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3)
      graft.ops.Graph.modularity(pairs, "src", "dst", labels, "node", "community")
    }),

    "g12s_modularity_slice" -> ((s, dir) => {
      val pairs = graft.ops.Graph.coOccurrenceEdges(
        copurchaseSlice(s, dir), "cust", "part", minShared = 3)
      val edges = pairs.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"))
      val labels = graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3)
      graft.ops.Graph.modularity(pairs, "src", "dst", labels, "node", "community")
    }),

    "g2_triangles" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      val edges = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
    }),

    "g2s_triangles_slice" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseSlice(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
    }),

    // ---- G: the 1% centile variants — the 100× gates for the six
    //      graph statistics whose 10%-slice DuckDB replays exhaust the
    //      temp budget at 100× (slice-quadratic in replica count —
    //      see copurchaseCentile) ----
    "g2s2_triangles_centile" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseCentile(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
    }),

    "g12s2_modularity_centile" -> ((s, dir) => {
      val pairs = graft.ops.Graph.coOccurrenceEdges(
        copurchaseCentile(s, dir), "cust", "part", minShared = 3)
      val edges = pairs.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"))
      val labels = graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3)
      graft.ops.Graph.modularity(pairs, "src", "dst", labels, "node", "community")
    }),

    // ---- G: local clustering coefficient over the same co-purchase
    //      graph as g2 — neighbor-density share per node, all-integer
    //      floored bp; deg<2 omitted, triangle-free nodes report 0 ----
    "g14_clustering_coeff" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      val edges = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      graft.ops.Graph.clusteringCoefficient(edges, "src", "dst")
    }),

    // ---- E: seasonal-residual anomaly gate — e38's season-shifted
    //      residuals fed through x37's MAD rule (a composition: the
    //      weekday pattern is removed BEFORE the outlier test, so a
    //      quiet-Sunday dip stops masking a real Tuesday anomaly) ----
    "e49_seasonal_anomaly" -> ((s, dir) => {
      val daily = graft.ops.TimeSeries.dailySeries(
        events(s, dir), "event_type", "ts", "value")
      val cur = daily.toDF("key", "day", "a_cents")
      val prev = daily.toDF("key2", "day2", "a7")
      val resid = cur.join(prev,
          col("key") === col("key2") && col("day") === col("day2") + 7)
        .select(col("key"), (col("a_cents") - col("a7")).as("resid_cents"))
      graft.ops.Stats.robustOutliersCents(resid, "key", "resid_cents", k = 3)
        .withColumnRenamed("key", "event_type")
    }),

    // ---- G: degree assortativity — Newman's r over the same
    //      co-purchase graph as g2: do hubs attach to hubs or to
    //      leaves? (exact-moment Pearson, one scan over the
    //      symmetrized edges) ----
    "g11_assortativity" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      val edges = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      graft.ops.Graph.assortativity(edges, "src", "dst")
    }),

    // ---- G: slice variants of the co-purchase-graph statistics — the
    //      SAME operators over the deterministic 10% customer slice.
    //      They exist because g4/g11/g12/g14's DuckDB oracles exhaust
    //      the temp budget on the full 10× graph (the cp self-join is
    //      quadratic in replica count); the engine side runs the full
    //      graph at every SF, and these keep each operator
    //      hash-checked above sf0.1 ----
    "g4s_label_prop_slice" -> ((s, dir) => {
      val rel = copurchaseSlice(s, dir)
      val pairs = graft.ops.Graph.coOccurrenceEdges(rel, "cust", "part", minShared = 3)
      val edges = pairs.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"))
      graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3)
    }),

    "g11s_assortativity_slice" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseSlice(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.assortativity(edges, "src", "dst")
    }),

    "g14s_clustering_coeff_slice" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseSlice(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.clusteringCoefficient(edges, "src", "dst")
    }),

    "g11s2_assortativity_centile" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseCentile(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.assortativity(edges, "src", "dst")
    }),

    "g14s2_clustering_coeff_centile" -> ((s, dir) => {
      val edges = graft.ops.Graph.coOccurrenceEdges(
        copurchaseCentile(s, dir), "cust", "part", minShared = 3)
      graft.ops.Graph.clusteringCoefficient(edges, "src", "dst")
    }),

    // ---- G: personalized PageRank — teleport concentrated on a seed
    //      set (every 10th supplier), rank = proximity to the seeds:
    //      the seed-expansion primitive ("more pages like these
    //      trusted ones"). Same integer fixed-point rounds as g1, base
    //      term zero for non-seeds ----
    "g5_personalized_pagerank" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 10 === 0)
        .select((col("s_suppkey").cast("long") * 2 + 1).as("seed"))
      graft.ops.Graph.personalizedPageRank(
        supplyEdges(s, dir), "a", "b", seeds, "seed", iterations = 3)
    }),

    // ---- SRC5: hive-partitioned parquet roundtrip — documents
    //      partitioned by lang, read back pruned to two partitions
    //      (the filter eliminates the other directories at planning
    //      time; the spec asserts PartitionFilters + file count) ----
    "src5_partitioned_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scratch = java.nio.file.Files.createTempDirectory("graft_src5_part_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.PartitionedSource.write(docs, scratch.getAbsolutePath, Seq("lang"))
      graft.sources.PartitionedSource.read(s, scratch.getAbsolutePath, docs.schema)
        .where(col("lang").isin("en", "de"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- T: fastText-shaped hashed-linear quality classifier — the
    //      corpus-wide model-inference pass (hashing trick over
    //      unigram+bigram features, weights table join, integer
    //      micro-unit score). The synthetic weights stand in for a
    //      trained model; the SHAPE (bucket join + hash agg) is the
    //      production path ----
    "t22_classifier" -> ((s, dir) =>
      graft.ops.Classifier.hashedLinearScore(
        t(s, dir, "documents"), "doc_id", "text",
        graft.ops.Classifier.syntheticWeights(s, 4096), 4096)),

    // ---- T: classifier calibration — precision/recall/F1 per score
    //      threshold vs an is-English label. Scores are QUANTIZED to a
    //      1000-fp grid before the sweep (standard PR-curve practice):
    //      the distinct-threshold table is then bounded by the score
    //      RANGE, not the corpus — prCurve's raise_error ceiling
    //      enforces the bound instead of assuming it ----
    "t33_pr_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = graft.ops.Classifier.hashedLinearScore(
        docs, "doc_id", "text",
        graft.ops.Classifier.syntheticWeights(s, 4096), 4096)
      graft.ops.Classifier.prCurve(
        scored
          .withColumn("score_q", expr("(score_fp div 1000L) * 1000L"))
          .join(docs.select(col("doc_id"),
            (col("lang") === "en").as("is_pos")), Seq("doc_id")),
        "score_q", "is_pos")
    }),

    // ---- T: PMI collocations — corpus-wide phrase mining over
    //      adjacent bigrams, micro-nat fixed-point scores ----
    "t23_pmi" -> ((s, dir) =>
      graft.ops.TextAnalysis.pmiCollocations(
        t(s, dir, "documents"), "doc_id", "text", minCount = 5)),

    // ---- T: distributed BPE tokenizer training — corpus collapses to
    //      the word histogram once, then 8 merge rounds over
    //      vocabulary-sized data (pair counts → deterministic argmax →
    //      portable string-replace merge apply); the oracle replays
    //      every round unrolled ----
    "t24_bpe_train" -> ((s, dir) =>
      graft.ops.TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", merges = 8)),

    // ---- T: BPE encode — tokenize the corpus with the learned merge
    //      table (the real-tokenizer token budget per document; feeds
    //      packing/chunking/mixing). Vocabulary-sized fold, word-keyed
    //      count join ----
    "t26_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.TextAnalysis.bpeEncode(docs, "doc_id", "text",
        graft.ops.TextAnalysis.bpeTrain(docs, "text", merges = 8))
    }),

    // ---- T: canonical text cleanup (NFC + control strip + whitespace
    //      collapse). The testdata is ASCII, so non-NFC spellings,
    //      control debris, and ragged whitespace are INJECTED
    //      deterministically (combining acute, U+212B Angstrom sign,
    //      BEL, CR, tab runs) — both engines must then normalize the
    //      same genuinely-dirty input, not pass on identity ----
    "t25_normalize" -> ((s, dir) => {
      val dirty = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit(" caf" + "e\u0301 \u0007bel")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" \u212Bngstro\u0308m line1\r\nline2\tand   done ")).otherwise(lit(""))
        ).as("text"))
      dirty.select(col("doc_id"),
        graft.ops.TextAnalysis.cleanText(col("text")).as("norm_text"))
        .withColumn("n_chars", length(col("norm_text")).cast("long"))
    }),

    // ---- exact discrete percentiles per group — the PORTABLE
    //      formulation (value at rank ceil(p·n), rank arithmetic as
    //      integer cross-multiplication, never p·n in floats: 0.9·n can
    //      land on either side of an integer depending on the engine's
    //      double grid). Ties in `value` are rank-interchangeable, so
    //      the picked VALUE is deterministic even though row_number
    //      ties are not ----
    // ---- E: OHLC bars — open/high/low/close + volume per (type, hour),
    //      the candlestick aggregation every metrics warehouse runs.
    //      Open/close pick by a TOTAL order ((ts, event_id) both ways),
    //      so equal-timestamp ties cannot flip the bar; sums go through
    //      exact decimals ----
    "e24_ohlc" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"),
        date_trunc("hour", col("ts")).as("h"), col("ts"), col("event_id"), col("value"))
      val wa = Window.partitionBy("event_type", "h")
        .orderBy(col("ts").asc, col("event_id").asc)
      val wd = Window.partitionBy("event_type", "h")
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(max(when(col("ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    }),

    // ---- winsorization — clip a metric at its exact per-group
    //      [p05, p95] (x15's portable integer-rank percentiles), report
    //      cut points, clip counts, and the exact clipped sum: the
    //      outlier-capping pass feature pipelines run before scaling ----
    "x24_winsorize" -> ((s, dir) => {
      // cuts from the value-level histogram (x15's scale shape — rows
      // never enter a window); the raw rows then only pay one
      // broadcast-able cuts join + one agg
      val ev = events(s, dir).select(col("event_type"), col("value"))
      val vc = ev.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("value")
      val cuts = vc.withColumn("hi", sum(col("c")).over(w))
        .withColumn("lo", col("hi") - col("c") + 1)
        .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(when(expr("(500 * n + 9999) div 10000").between(col("lo"), col("hi")),
            col("value"))).as("p05"),
          max(when(expr("(9500 * n + 9999) div 10000").between(col("lo"), col("hi")),
            col("value"))).as("p95"))
      ev.join(cuts, Seq("event_type"))
        .withColumn("v_wins", least(greatest(col("value"), col("p05")), col("p95")))
        .groupBy("event_type")
        .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          sum((col("value") < col("p05")).cast("long")).as("n_low"),
          sum((col("value") > col("p95")).cast("long")).as("n_high"),
          dsum(col("v_wins")).as("sum_wins"))
    }),

    // ---- X: Benford first-digit conformity — forensic DQ gate per
    //      order priority; exact string-derived digits, hardcoded
    //      expected table, full digit grid including zero rows ----
    "x38_benford" -> ((s, dir) =>
      graft.ops.Stats.benfordDeviation(
        t(s, dir, "orders"), "o_orderpriority", "o_totalprice")
        .withColumnRenamed("key", "o_orderpriority")),

    // ---- X: robust outliers — exact median + MAD per event_type
    //      (Hampel's rule; x15's histogram-rank shape, rows never
    //      enter a window), counts beyond 3·MAD in floored bp ----
    "x37_mad_outliers" -> ((s, dir) =>
      graft.ops.Stats.robustOutliers(
        events(s, dir), "event_type", "value", k = 3)
        .withColumnRenamed("key", "event_type")),

    // ---- X: PSI drift gate — per event_type value distribution,
    //      first half of January (ref) vs second half (cur); $20 bins,
    //      Laplace-smoothed over the union grid, micro-unit terms via
    //      the shared psiTermSql tree ----
    "x39_psi_drift" -> ((s, dir) =>
      graft.ops.Stats.psi(events(s, dir), "event_type", "value",
        expr("unix_micros(ts) div 86400000000 < 19738"), binWidthCents = 2000L)
        .withColumnRenamed("key", "event_type")),

    // ---- X: chi-square independence of order status × priority —
    //      full R×C grid (empty cells carry expected mass), micro-unit
    //      terms via the shared chiTermSql tree (no transcendental) ----
    "x40_chi_square" -> ((s, dir) =>
      graft.ops.Stats.chiSquareIndependence(
        t(s, dir, "orders"), "o_orderstatus", "o_orderpriority")),

    // ---- MON1: the monitoring capstone — freshness, PSI drift, CUSUM
    //      alarms, and the key FD check composed into ONE labeled
    //      health report (the llm1/air1 discipline applied to the
    //      monitoring tier: a drift in any member breaks a specific
    //      labeled row) ----
    "mon1_health_report" -> ((s, dir) => {
      val ev = events(s, dir)
      val fresh = graft.ops.DataQuality.freshness(ev, "event_type", "ts")
        .select(lit("freshness").as("check_id"), col("slice").as("key"),
          lit("lag_s").as("metric"), col("lag_s").cast("long").as("value"))
      val psi = graft.ops.Stats.psi(ev, "event_type", "value",
          expr("unix_micros(ts) div 86400000000 < 19738"), binWidthCents = 2000L)
        .select(lit("psi").as("check_id"), col("key"),
          lit("psi_micro").as("metric"), col("psi_micro").cast("long").as("value"))
      val cus = graft.ops.TimeSeries.cusumChangepoints(
          ev, "event_type", "ts", "value", alarmPctOfMean = 50)
        .select(lit("cusum").as("check_id"), col("key"),
          lit("n_alarm_days").as("metric"),
          col("n_alarm_days").cast("long").as("value"))
      val fd = graft.ops.DataQuality.fdViolations(ev, Seq("event_id"),
          "user_id", "event_id_determines_user")
        .select(lit("fd").as("check_id"), col("check_name").as("key"),
          lit("n_violating").as("metric"),
          col("n_violating").cast("long").as("value"))
      fresh.unionByName(psi).unionByName(cus).unionByName(fd)
    }),

    // ---- X: one-way ANOVA — do mean values differ across event
    //      types? (the k-group generalization of the two-sample tests);
    //      rounded group units, one shared F tree ----
    "x56_anova_f" -> ((s, dir) =>
      graft.ops.Stats.anovaF(
        events(s, dir).withColumn("cents",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")),
        "event_type", "cents")),

    // ---- X: Cramér's V — effect size from x40's exact chi-square
    //      (a huge n makes trivial dependence 'significant'; V says
    //      whether it matters); shares the slot-cached cells ----
    "x55_cramers_v" -> ((s, dir) =>
      graft.ops.Stats.chiSquareIndependence(
        t(s, dir, "orders"), "o_orderstatus", "o_orderpriority")
        .withColumn("cramers_v_micro", expr(graft.ops.Stats.cramersVSql(
          "chi2_micro", "n", "r_levels", "c_levels")))),

    // ---- G: double-sweep diameter lower bound — two BFS traversals
    //      give the 'how stretched is this graph' triage number ----
    "g17_diameter" -> ((s, dir) =>
      graft.ops.Graph.diameterDoubleSweep(supplyEdges(s, dir), "a", "b", maxHops = 8)),

    // ---- X: per-cell standardized residuals — x40's drill-down:
    //      WHICH status×priority cells are over/under-represented;
    //      shares x40's slot-cached cell aggregate ----
    "x54_chi_residuals" -> ((s, dir) =>
      graft.ops.Stats.chiResiduals(
        t(s, dir, "orders"), "o_orderstatus", "o_orderpriority")
        .withColumnRenamed("a", "o_orderstatus")
        .withColumnRenamed("b", "o_orderpriority")),

    // ---- X: Gini revenue concentration per nation over customer
    //      totals — histogram-rank formulation (rows never enter a
    //      window), exact decimal terms, floored bp + top-decile share ----
    "x41_gini" -> ((s, dir) => {
      val cust = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("v"))
      graft.ops.Stats.giniConcentration(cust, "c_nationkey", "v")
        .withColumnRenamed("key", "c_nationkey")
    }),

    // ---- X: KS slice drift — each event_type's value distribution vs
    //      the rest of the corpus; all-integer max-CDF-gap, floored bp ----
    "x42_ks_drift" -> ((s, dir) =>
      graft.ops.Stats.ksSliceDrift(events(s, dir), "event_type", "value")
        .withColumnRenamed("key", "event_type")),

    // ---- E: freshness report — per event_type last event, lag behind
    //      the freshest slice, trailing-24h volume; anchored at the
    //      data's own max (reproducible), all integer ----
    "e48_freshness" -> ((s, dir) =>
      graft.ops.DataQuality.freshness(events(s, dir), "event_type", "ts")
        .withColumnRenamed("slice", "event_type")),

    // ---- X: quantile binning — equal-frequency quartiles per
    //      event_type at exact nearest-rank cuts; ties land low (the
    //      honest uneven answer on discrete data) ----
    "x44_quantile_bins" -> ((s, dir) =>
      graft.ops.Stats.quantileBins(events(s, dir), "event_type", "value", nBins = 4)
        .withColumnRenamed("key", "event_type")),

    // ---- E: conversion-latency report — first click → first purchase
    //      at-or-after it; exact nearest-rank p50/p90/p99 seconds plus
    //      floored-bp conversion, histogram shape throughout ----
    "e47_conversion_latency" -> ((s, dir) =>
      graft.ops.Sessions.conversionLatency(
        events(s, dir), "user_id", "ts", "event_type", "click", "purchase")),

    // ---- T: readability grade per document — FK formula in floored
    //      milli-units over exact integer word/sentence/vowel-group
    //      counts; one codegen pass, no shuffle ----
    "t38_readability" -> ((s, dir) =>
      graft.ops.TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")),

    // ---- T: Zipf rank-frequency slope per language — log-log OLS over
    //      the top-500 word ranks in exact micro-nat points; slope ≈ −1
    //      is healthy natural language, the fit r catches broken lines ----
    "t37_zipf_slope" -> ((s, dir) =>
      graft.ops.TextAnalysis.zipfSlope(
        t(s, dir, "documents"), "lang", "text", topRanks = 500)
        .withColumnRenamed("slice", "lang")),

    // ---- G: neighborhood-Jaccard link prediction over the same trade
    //      subgraph as g7 — all-integer |∩|/|∪| in bp, hub-guarded
    //      induced subgraph (numerator and denominator consistent) ----
    "g13_jaccard_links" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_quantity") >= 48)
        .select((col("o_custkey") * 2).as("x"), (col("l_suppkey") * 2 + 1).as("y"))
        .distinct()
      graft.ops.Graph.jaccardLinks(pairs, "x", "y", maxDegree = 10000L, topK = 100)
    }),

    // ---- X: Shannon entropy of each language's source mix — the
    //      diversity gate (micro-nat terms via the shared tree) ----
    "x43_entropy" -> ((s, dir) =>
      graft.ops.Stats.shannonEntropy(t(s, dir, "documents"), "lang", "source")
        .withColumnRenamed("key", "lang")),

    // ---- E: two-proportion A/B z-test — purchase conversion by a
    //      deterministic parity split of user_id (the hash-assignment
    //      stand-in); pooled-variance z via the shared zTestSql tree ----
    "e45_ab_ztest" -> ((s, dir) => {
      val units = events(s, dir)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("int")).as("s"))
        .withColumn("variant",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
      graft.ops.Stats.twoProportionZ(units, "variant", "s")
    }),

    "x15_percentiles" -> ((s, dir) => {
      // Scale shape: the rows NEVER enter a window. A per-row
      // row_number window partitioned by event_type would be one task
      // per type (5 tasks at any data size — the serial choke point);
      // instead the map-side-partial (type, value) histogram collapses
      // the data to distinct values (cent-granular → bounded), and the
      // tiny value-level relation carries the cumulative-rank window.
      // Value at rank r is the value whose cumulative range [lo, hi]
      // contains r — identical to the row_number formulation for every
      // r, tie rows being rank-interchangeable.
      val vc = events(s, dir).groupBy("event_type", "value")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("value")
      vc.withColumn("hi", sum(col("c")).over(w))
        .withColumn("lo", col("hi") - col("c") + 1)
        .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(expr("(5000 * n + 9999) div 10000").between(col("lo"), col("hi")),
            col("value"))).as("p50"),
          max(when(expr("(9000 * n + 9999) div 10000").between(col("lo"), col("hi")),
            col("value"))).as("p90"),
          max(when(expr("(9900 * n + 9999) div 10000").between(col("lo"), col("hi")),
            col("value"))).as("p99"))
    }),

    // ---- one-pass heavy hitters via the misra_gries aggregate — the
    //      bounded-space scale path (k counters per partition cross the
    //      exchange, never a per-key count table). The sketch's
    //      GUARANTEE is the oracled surface: every item above N/(k+1)
    //      must be in the candidate set, so in_sketch is
    //      deterministically 1 even though sketch weights depend on
    //      merge order. Item skew is constructed: even orderkeys fold
    //      to 4 hot items (~1/8 of rows each), odd ones spread over a
    //      ~75k-item tail ----
    "x17_heavy_hitters" -> ((s, dir) => {
      val items = t(s, dir, "lineitem").select(
        expr("IF(l_orderkey % 2 = 0, l_orderkey % 8, 1000000 + l_orderkey div 2)")
          .cast("long").as("item"))
      val sketch = items.agg(expr("misra_gries(item, 50)").as("cand"))
        .select(expr("transform(cand, x -> x.item)").as("cand_items"))
      val exact = items.groupBy("item").agg(count(lit(1)).as("cnt"))
      val n = items.agg(count(lit(1)).as("n_total"))
      exact.crossJoin(n).where(col("cnt") * 51 > col("n_total"))
        .crossJoin(sketch)
        .select(col("item"), col("cnt"), col("n_total"),
          array_contains(col("cand_items"), col("item")).cast("int").as("in_sketch"))
    }),

    // ---- data-quality constraint report — the pre-publish pipeline
    //      gate: completeness/uniqueness/bounds/accepted-values compiled
    //      into ONE agg pass (integer metrics only), plus a referential-
    //      integrity anti-join row. o_custkey uniqueness is a DESIGNED
    //      failure (customers reorder), so both report polarities are
    //      exercised ----
    "x23_dq_report" -> ((s, dir) => {
      import graft.ops.DataQuality._
      val orders = t(s, dir, "orders")
      val rep = report(orders, Seq(
        rowCount(1L),
        completeness("o_custkey", 10000L),
        completeness("o_orderdate", 10000L),
        uniqueness("o_orderkey"),
        uniqueness("o_custkey"),
        bounds("o_totalprice", lit(0.0), lit(1000000.0)),
        acceptedValues("o_orderstatus", Seq("F", "O", "P"))))
      rep.unionAll(refViolations(
        orders, "o_custkey", t(s, dir, "customer"), "c_custkey", "ref_orders_customer"))
    }),

    // ---- table diff — the drill-down x28's checksum triggers: FULL
    //      OUTER join source vs target on the key, classify every row
    //      added / removed / changed / same by null-side and value
    //      comparison. The target derives from source deterministically
    //      (drop keys ≡0 mod 97, flip status for ≡0 mod 13, inject
    //      key+10^9 rows), so both engines build the same diff ----
    "x29_table_diff" -> ((s, dir) => {
      val src = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("v"))
      val dst = src.where(col("k") % 97 =!= 0)
        .select(col("k"),
          when(col("k") % 13 === 0, lit("X")).otherwise(col("v")).as("v"))
        .unionAll(src.where(col("k") % 5 === 0)
          .select((col("k") + 1000000000L).as("k"), col("v")))
      src.as("a").join(dst.as("b"), col("a.k") === col("b.k"), "full_outer")
        .select(
          when(col("a.k").isNull, "added")
            .when(col("b.k").isNull, "removed")
            .when(col("a.v") =!= col("b.v"), "changed")
            .otherwise("same").as("diff_type"))
        .groupBy("diff_type").agg(count(lit(1)).as("n"))
    }),

    // ---- order-independent table checksum — the cross-system
    //      reconciliation primitive ("does the replica hold exactly the
    //      rows the source holds?") without moving the data: each row
    //      serializes to a canonical string (integers/strings only —
    //      double formatting is engine-specific), hashes through md5,
    //      and the hashes SUM (order-free, exact through DECIMAL(38),
    //      folded mod 2^62 into a BIGINT). Any inserted, deleted, or
    //      changed row moves the digest; computable engine-by-engine
    //      and compared as one number. Serialized columns must be
    //      NON-NULL (as here): concat_ws SKIPS nulls, so ('a', NULL,
    //      'b') and ('a', 'b', NULL) would collide — nullable columns
    //      need coalesce-to-sentinel before joining the serialization ----
    "x28_table_checksum" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(expr(
          """cast(conv(substr(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                                             o_orderpriority)), 1, 15), 16, 10)
             as decimal(38,0))""").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("cast(pmod(sum(h), 4611686018427387904) as bigint)").as("checksum"))),

    // ---- approx-percentile rank-error gate — Spark's GK quantile
    //      sketch vs the exact multiset: the returned value's exact
    //      rank window must cover a rank within n/100 of the 0.5·n
    //      target (the sketch's ε-rank guarantee at accuracy 1000,
    //      checked with a wide margin; integer rank arithmetic
    //      throughout). The quantile member of the sketch-gate family
    //      (x4 distinct, x25 HLL union, x17 MG, x22 CMS) ----
    "x32_approx_pct_gate" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("value"))
      val apx = ev.groupBy("event_type")
        .agg(expr("approx_percentile(value, 0.5, 1000)").as("apx"))
      ev.join(apx, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum((col("value") < col("apx")).cast("long")).as("rk_lo"),
          sum((col("value") <= col("apx")).cast("long")).as("rk_hi"))
        .select(col("event_type"), col("n"),
          // the value's rank window [rk_lo+1, rk_hi] must approach the
          // median target within n/100 ranks (100x the sketch's bound)
          (col("rk_hi") * 200 >= col("n") * 99 &&
            (col("rk_lo") + 1) * 200 <= col("n") * 101).cast("int").as("rank_ok"))
    }),

    // ---- ordered string aggregation (LISTAGG) — each customer's
    //      order-status history as one ordered string. collect_list is
    //      arrival-ordered (nondeterministic under parallelism), so the
    //      rows carry their own (date, key) sort key into sort_array
    //      before joining — the only deterministic formulation ----
    "x31_listagg" -> ((s, dir) =>
      t(s, dir, "orders").where(col("o_custkey") % 25 === 0)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          expr("""array_join(transform(
                    sort_array(collect_list(named_struct(
                      'd', date_format(o_orderdate, 'yyyy-MM-dd'),
                      'k', o_orderkey, 's', o_orderstatus))),
                    x -> x.s), '')""").as("status_history"))),

    // ---- distribution window battery — ntile / percent_rank /
    //      cume_dist over a per-customer total order (w2 covers
    //      lag/frames/rank; this closes the distribution functions).
    //      percent_rank and cume_dist are exact small-integer ratios —
    //      IEEE division is deterministic, both engines compute the
    //      same doubles ----
    "x30_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .where(col("o_custkey") % 10 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
    }),

    // ---- recursive CTE (Spark 4's WITH RECURSIVE) — hierarchy walk
    //      over a derived 10-ary tree on customer keys: every node's
    //      root ancestor and depth. The SQL-surface feature the
    //      unrolled-round oracles (g1/g4/t24) work around; here the
    //      ENGINE recurses and DuckDB runs the same statement ----
    "x26_recursive_cte" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""WITH RECURSIVE anc AS (
                 SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
                 FROM customer_v WHERE c_custkey < 10
                 UNION ALL
                 SELECT c.c_custkey, anc.root, anc.depth + 1
                 FROM customer_v c JOIN anc ON c.c_custkey div 10 = anc.node
                 WHERE c.c_custkey >= 10
               )
               SELECT node, root, CAST(depth AS BIGINT) AS depth FROM anc""")
    }),

    // ---- k-anonymity audit — group sizes over a quasi-identifier
    //      tuple (nation, segment, coarsened balance): any group below
    //      k is re-identifiable and must be generalized or suppressed
    //      before release. The privacy gate for published training
    //      data; pure integer grouping, exactly replayable ----
    // ---- X: Pearson correlation matrix over the lineitem metrics —
    //      exact decimal integer moments in ONE scan (k(k+3)/2 sums in
    //      one codegen stage, not a job per pair), one fixed IEEE tree
    //      for the closed form (see Stats.corrSql) ----
    "x35_corr_matrix" -> ((s, dir) =>
      graft.ops.Stats.corrMatrix(t(s, dir, "lineitem"), Seq(
        "q" -> (col("l_quantity").cast("decimal(18,2)") * 100),
        "p" -> (col("l_extendedprice").cast("decimal(18,2)") * 100),
        "d" -> (col("l_discount").cast("decimal(18,4)") * 10000),
        "t" -> (col("l_tax").cast("decimal(18,4)") * 10000)))),

    // ---- X: l-diversity — x27's quasi-identifier groups must also
    //      carry ≥ l DISTINCT sensitive values (k-anonymity alone
    //      leaks when a group is homogeneous in the sensitive column) ----
    "x36_l_diversity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          expr("cast(floor(c_acctbal / 1000) as bigint)").as("bal_bucket"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("c_mktsegment")).as("l_distinct"))
        .withColumn("l_ok", (col("l_distinct") >= 3).cast("int"))),

    "x27_k_anonymity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          col("c_mktsegment"),
          expr("cast(floor(c_acctbal / 1000) as bigint)").as("bal_bucket"))
        .agg(count(lit(1)).as("group_size"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"),
          col("group_size"),
          (col("group_size") >= 5).cast("int").as("k_ok"))),

    // ---- X: weighted percentiles — the order value below which half
    //      the REVENUE sits per priority (weight = the value itself);
    //      weighted-rank histogram, all integer ----
    "x46_weighted_pct" -> ((s, dir) =>
      graft.ops.Stats.weightedPercentiles(
        t(s, dir, "orders")
          .withColumn("cents",
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")),
        "o_orderpriority", "cents", "cents")
        .withColumnRenamed("key", "o_orderpriority")),

    // ---- X: 2-D Pareto skyline — customers no one beats on BOTH
    //      total spend and order recency; histogram-collapsed
    //      frontier, integer cents/epoch-days ----
    "x47_skyline" -> ((s, dir) =>
      graft.ops.Stats.skyline2D(
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(
            sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
              .as("spend_cents"),
            max(expr("unix_timestamp(o_orderdate) div 86400")).as("last_day")),
        "spend_cents", "last_day")
        .withColumnsRenamed(Map(
          "x" -> "spend_cents", "y" -> "last_day", "n_points" -> "n_custs"))),

    // ---- X: key-skew profile — the top-10 hottest join keys with
    //      share and uniform-multiple, via the bounded string-keyed
    //      heap (partials fold before the exchange; no sorted key
    //      list ever ships) ----
    "x48_skew_profile" -> ((s, dir) =>
      graft.ops.Skew.keySkewProfile(t(s, dir, "events"), "user_id", topN = 10)),

    // ---- X: incremental view maintenance — agg(base) ⊎ agg(Δ) with
    //      ±1-weighted CDC rows equals agg(final) without rescanning
    //      the base; the oracle computes the final state directly ----
    "x49_ivm_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      val base = o.where(col("o_orderkey") % 7 =!= 3)
      val baseAgg = base.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      val inserts = o.where(col("o_orderkey") % 7 === 3)
        .select(col("o_orderpriority"), lit(1L).as("op"), col("cents"))
      val deletes = base.where(col("o_orderkey") % 11 === 5)
        .select(col("o_orderpriority"), lit(-1L).as("op"), col("cents"))
      graft.ops.IncrementalAgg.applyDelta(baseAgg, inserts.unionByName(deletes),
        Seq("o_orderpriority"), "op", Seq("cents" -> "sum_cents"))
    }),

    // ---- X: t-closeness — the privacy triad's third leg: each QI
    //      group's sensitive-value MIX must sit near the corpus mix
    //      (total variation in floored bp, full level grid) ----
    "x45_t_closeness" -> ((s, dir) =>
      graft.ops.Stats.tCloseness(
        t(s, dir, "customer")
          .withColumn("bal_bucket", expr("cast(floor(c_acctbal / 1000) as bigint)")),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment", maxTbp = 2000L)),

    // ---- SRC10: gzip JSONL roundtrip — the interchange shape corpora
    //      actually ship (one .json.gz per partition; gz is NOT
    //      splittable, so write-side sharding IS read parallelism) ----
    "src10_jsonl_gzip_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scratch = java.nio.file.Files.createTempDirectory("graft_src10_gz_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.JsonLinesSource.writeGzip(docs, scratch.getAbsolutePath)
      graft.sources.JsonLinesSource.read(s, scratch.getAbsolutePath, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- HLL sketch-union rollup — per-group distinct sketches union
    //      into a global estimate WITHOUT rescanning the fact table: the
    //      two-level rollup `approx_count_distinct` can't express (its
    //      partials aren't a value you can store per group). Gates:
    //      every tier sits within 5% of exact, and the union drifts
    //      ≤ 5% from the direct global sketch (not exact equality: the
    //      datasketches impl keeps small sketches in exact coupon mode,
    //      and the union's promotion to estimating mode can move the
    //      estimate — the bound, not the registers, is the contract) ----
    "x25_hll_union" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val per = li.groupBy("l_returnflag").agg(
        expr("hll_sketch_agg(l_suppkey)").as("sk"),
        countDistinct(col("l_suppkey")).as("d"))
      val perOk = per.select(
        (expr("100 * hll_sketch_estimate(sk)").between(col("d") * 95, col("d") * 105))
          .cast("int").as("ok"))
        .agg(min(col("ok")).as("per_group_ok"), count(lit(1)).as("n_flags"))
      val union = per.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"))
      val direct = li.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_suppkey))").as("est_direct"),
        countDistinct(col("l_suppkey")).as("d_global"))
      perOk.crossJoin(union).crossJoin(direct)
        .select(col("n_flags"), col("d_global"),
          (abs(col("est_union") - col("est_direct")) * 100 <= col("d_global") * 5)
            .cast("int").as("union_close_direct"),
          col("per_group_ok"),
          (col("est_union") * 100).between(col("d_global") * 95, col("d_global") * 105)
            .cast("int").as("global_ok"))
    }),

    // ---- Count-Min sketch — point-frequency estimates from a KB-scale
    //      additive sketch (the estimate complement of x17's membership
    //      summary). Counters are pure SUMs, so the sketch is
    //      bit-identical under any partitioning, and the md5 bucket
    //      recipe is plain SQL — the oracle recomputes every counter and
    //      estimate EXACTLY; the no-underestimate guarantee rides along
    //      as a checked column. Estimation itself is an ordinary
    //      projection over element_at — no second custom function ----
    "x22_countmin" -> ((s, dir) => {
      val items = t(s, dir, "lineitem").select(
        expr("IF(l_orderkey % 2 = 0, l_orderkey % 8, 1000000 + l_orderkey div 2)")
          .cast("long").as("item"))
      val sketch = items.agg(expr("count_min(item, 4, 256)").as("cms"))
      val exact = items.groupBy("item").agg(count(lit(1)).as("cnt"))
      val probes = s.range(1).select(explode(expr(
        "array(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 1000005L, 1000123L, 999999L, 1234567L)"))
        .as("item"))
      val est = probes.crossJoin(sketch)
        .select(col("item"), explode(expr("sequence(0, 3)")).as("j"), col("cms"))
        .withColumn("b",
          expr("cast(conv(substr(md5(concat(j, ':', item)), 1, 8), 16, 10) as bigint) % 256"))
        .withColumn("row_est", expr("element_at(cms, cast(j * 256 + b + 1 as int))"))
        .groupBy("item").agg(min(col("row_est")).as("est"))
      est.join(exact, Seq("item"), "left")
        .select(col("item"), col("est"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          (col("est") >= coalesce(col("cnt"), lit(0L))).cast("int").as("no_underestimate"))
    }),

    // ---- SCD2 dimension build — change-log rows become validity
    //      intervals via lead() over a deterministic per-key total
    //      order (date, then orderkey for same-date ties); the open
    //      version carries a null eff_to. The standard warehouse
    //      dimension-versioning pass, one key-partitioned window ----
    "e18_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("eff_from", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("eff_to", date_format(lead("o_orderdate", 1).over(w),
          "yyyy-MM-dd HH:mm:ss"))
        .withColumn("is_current", (col("eff_to").isNull).cast("int"))
        .select("o_custkey", "version", "o_orderstatus", "eff_from", "eff_to", "is_current")
    }),

    // ---- E: gap-filled hourly resample with LOCF — irregular purchase
    //      events onto each user's own hourly grid; exact decimal sums
    //      per bucket, carried forward across gaps. user_id%5 subset
    //      keeps the grid (users × active-hours) a verify-sized dump ----
    "e19_gapfill" -> ((s, dir) => {
      val purchases = events(s, dir)
        .where(col("event_type") === "purchase" && col("user_id") % 5 === 0)
      graft.ops.TimeSeries.resampleLocf(purchases, "user_id", "ts", "value")
        .select(col("key").as("user_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("v_filled"), col("is_gap"))
    }),

    // ---- E: position-based multi-touch attribution — the U-shaped
    //      credit model (first 40%, last 40%, middles share 20%) over
    //      each user's touches in the 7 days before their FIRST
    //      purchase. Credit is integer basis points with the division
    //      remainder pinned to the earliest middle touch, so the split
    //      sums to exactly 10000 and replays exactly; n=1 takes all,
    //      n=2 splits 50/50 ----
    "e28_multi_touch" -> ((s, dir) => {
      val ev = events(s, dir)
      val conv = ev.where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("c"))
        .select(col("user_id"), col("c.ts").as("conv_ts"))
      val touches = ev.where(col("event_type").isin("view", "click"))
        .join(conv, Seq("user_id"))
        .where(col("ts") < col("conv_ts") &&
          col("ts") >= col("conv_ts") - expr("interval 7 days"))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      touches
        .withColumn("pos", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("credit_bp",
          when(col("n") === 1, 10000L)
            .when(col("n") === 2, 5000L)
            .when(col("pos") === 1 || col("pos") === col("n"), 4000L)
            .when(col("pos") === 2, expr("2000 div (n - 2) + 2000 % (n - 2)"))
            .otherwise(expr("2000 div (n - 2)")))
        .select(col("user_id"), col("event_id"), col("pos"), col("n").as("n_touches"),
          col("credit_bp"))
    }),

    // ---- E: CDC apply — fold an insert/update/delete change log into
    //      the current snapshot: last operation per key wins (total
    //      order: seq, then op-kind for same-seq ties), deletes drop
    //      the key. The log derives deterministically from orders
    //      (every key gets an INSERT; ≡0 mod 3 an UPDATE at seq 2;
    //      ≡0 mod 7 a DELETE at seq 3), so both engines fold the same
    //      log. One key-partitioned window ----
    "e25_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("v"))
      val log = base.select(col("k"), lit(1L).as("seq"), lit("I").as("op"), col("v"))
        .unionAll(base.where(col("k") % 3 === 0)
          .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
            concat(col("v"), lit("2")).as("v")))
        .unionAll(base.where(col("k") % 7 === 0)
          .select(col("k"), lit(3L).as("seq"), lit("D").as("op"), lit(null).cast("string").as("v")))
      val w = Window.partitionBy("k").orderBy(col("seq").desc, col("op").desc)
      log.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op") =!= "D")
        .select(col("k"), col("op").as("last_op"), col("v"))
    }),

    // ---- E: sequence-gap detection — the data-loss monitor for event
    //      feeds carrying a per-key increasing sequence: report every
    //      hole (prev_id+1 .. id-1) per user. lag() over one key
    //      window; events ≡0 mod 11 are dropped first so gaps exist by
    //      construction ----
    "e26_sequence_gaps" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_id") % 11 =!= 0)
        .select(col("user_id"), col("event_id"))
        .withColumn("prev_id",
          lag(col("event_id"), 1).over(
            Window.partitionBy("user_id").orderBy("event_id")))
        .where(col("prev_id").isNotNull && col("event_id") > col("prev_id") + 1)
        .select(col("user_id"),
          (col("prev_id") + 1).as("gap_start"),
          (col("event_id") - 1).as("gap_end"),
          (col("event_id") - col("prev_id") - 1).as("n_missing"))),

    // ---- E: interval union / coverage — per-user activity windows
    //      ([ts, ts+30min)) merged so overlaps count ONCE: total covered
    //      time, merged-island count, active span. The uptime/duty-cycle
    //      op; see TimeSeries.intervalCoverage for why tie order cannot
    //      move a bit. Integer-µs end to end ----
    "e23_interval_coverage" -> ((s, dir) => {
      val iv = events(s, dir).where(col("user_id") % 3 === 0)
        .select(col("user_id"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) + lit(1800000000L)).as("e0"))
      graft.ops.TimeSeries.intervalCoverage(iv, "user_id", "s0", "e0")
        .select(col("key").as("user_id"), col("n_islands"),
          col("covered_us"), col("span_us"))
    }),

    // ---- table profiling — per-column rows/nulls/distincts/bounds in
    //      ONE pass, unpivoted to a columns-sized result ----
    "x14_profile" -> ((s, dir) =>
      graft.ops.Profiling.profile(t(s, dir, "orders"),
        Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))),

    // ---- fixed-width value histogram (floor-of-division bins) ----
    "e17_histogram" -> ((s, dir) =>
      graft.ops.Profiling.histogram(t(s, dir, "orders"), "o_totalprice", 50000L)),

    // ---- explicit GROUPING SETS (the general form rollup/cube are
    //      special cases of) + GROUPING() disambiguation of real vs
    //      aggregate NULLs ----
    "x13_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                 CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                 CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
               FROM orders_v
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                       (o_orderstatus, o_orderpriority), ())""")
    }),

    // ---- SRC3: JSONL corpus roundtrip — write documents as JSON-Lines
    //      (the LLM-corpus interchange format), read back with the
    //      EXPLICIT parquet schema (no inference pass) through the
    //      PERMISSIVE corrupt-line-quarantine path; the oracle is the
    //      original table, so the check is byte-exact roundtrip ----
    // ---- SRC6: RFC 4180 quoted-CSV roundtrip — the general form of
    //      SRC1's pipe format, with separators and quotes IN the data:
    //      every text gains a `, "quoted, field"` tail, crosses the CSV
    //      boundary (doubled-quote dialect), and must come back
    //      byte-exact against the oracle recomputing the same injection
    //      from the original table ----
    "src6_csv_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit(", \"quoted, field\" tail")))
      val scratch = java.nio.file.Files.createTempDirectory("graft_src6_csv_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.CsvSource.write(docs, scratch.getAbsolutePath)
      graft.sources.CsvSource.read(s, scratch.getAbsolutePath, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- SRC7: XML roundtrip (the Wikipedia-dump interchange shape) —
    //      every text gains a markup tail (`<`, `&`, quotes) that must
    //      be escaped on write and restored byte-exact on read, with
    //      surrounding-whitespace trimming disabled (the datasource
    //      default would corrupt text) ----
    "src7_xml_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit(" <tag attr=\"&x\"> & tail ")))
      val scratch = java.nio.file.Files.createTempDirectory("graft_src7_xml_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.XmlSource.write(docs, scratch.getAbsolutePath, rowTag = "doc")
      graft.sources.XmlSource.read(s, scratch.getAbsolutePath, docs.schema, rowTag = "doc")
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- SRC: WARC roundtrip — Content-Length framing must carry a
    //      payload that LOOKS like a WARC record (embedded version
    //      line + headers + CRLFs) byte-exact; content_length is the
    //      parsed UTF-8 byte count ----
    "src8_warc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          lit("\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n tail ")))
      val scratch = java.nio.file.Files.createTempDirectory("graft_src8_warc_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      val recs = docs.select(
        concat(lit("<urn:graft:doc:"), col("doc_id"), lit(">")).as("record_id"),
        concat(lit("urn:graft:uri:"), col("doc_id")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit("text/plain; charset=utf-8").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"))
      graft.sources.WarcSource.write(recs, scratch.getAbsolutePath)
      graft.sources.WarcSource.read(s, scratch.getAbsolutePath)
        .where(col("corrupt").isNull)
        .select(
          regexp_extract(col("record_id"), "doc:(-?\\d+)", 1)
            .cast("long").as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"),
          col("content_length"))
    }),

    // ---- SRC: fixed-width roundtrip — the mainframe-export shape;
    //      orders keys/status/priority/date/cents through positional
    //      fields and back, typed ----
    "src9_fixedwidth_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      val scratch = java.nio.file.Files.createTempDirectory("graft_src9_fw_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      val widths = Seq("o_orderkey" -> 14, "cents" -> 14,
        "o_orderstatus" -> 2, "o_orderpriority" -> 16, "odate" -> 10)
      graft.sources.FixedWidthSource.write(o, scratch.getAbsolutePath, widths)
      graft.sources.FixedWidthSource.read(s, scratch.getAbsolutePath, Seq(
        ("o_orderkey", 14, LongType), ("cents", 14, LongType),
        ("o_orderstatus", 2, StringType), ("o_orderpriority", 16, StringType),
        ("odate", 10, StringType)))
    }),

    "src3_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // unique-by-construction scratch dir (the old pid+dir.hashCode tag
      // could collide across source dirs in one JVM and accumulated
      // forever), deleted at JVM exit — NOT inline, because the
      // roundtrip read below is lazy and later consumers still need the
      // files
      val scratch = java.nio.file.Files.createTempDirectory("graft_src3_jsonl_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.JsonLinesSource.write(docs, scratch.getAbsolutePath)
      graft.sources.JsonLinesSource.read(s, scratch.getAbsolutePath, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- SRC4: ORC roundtrip — write documents as zstd ORC, read back
    //      with the EXPLICIT schema through the vectorized reader; the
    //      oracle is the original table, so the check is byte-exact
    //      roundtrip through the second columnar format ----
    "src4_orc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scratch = java.nio.file.Files.createTempDirectory("graft_src4_orc_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.OrcSource.write(docs, scratch.getAbsolutePath)
      graft.sources.OrcSource.read(s, scratch.getAbsolutePath, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // ---- SRC: Avro object-container roundtrip — typed nullable
    //      unions, a binary column carried as real bytes (surfaced as
    //      its md5 hex at the boundary), deflate blocks; write one
    //      container per partition, read one task per file ----
    "src11_avro_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("text"),
        expr("NULLIF(lang, 'de')").as("lang"), // exercise the null union
        col("n_chars"),
        (col("n_chars") % 2 === 0).as("is_even"),
        unhex(md5(col("text"))).as("payload"))
      val scratch = java.nio.file.Files.createTempDirectory("graft_src11_avro_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.sources.AvroSource.write(docs, scratch.getAbsolutePath)
      graft.sources.AvroSource.read(s, scratch.getAbsolutePath, docs.schema)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
          col("is_even"), lower(hex(col("payload"))).as("payload_md5"))
    }),

    // ---- W1/F1: ranking window dedup ----
    "w1_window_dedup" -> ((s, dir) => {
      // l_linenumber is not unique per order in this synthetic data — add
      // further keys for a deterministic total order (SURVEY §2.3 J2's
      // explicit-dedup-policy lesson applied here).
      val w = Window.partitionBy("l_orderkey").orderBy(
        col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc,
        col("l_extendedprice").asc, col("l_quantity").asc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    }),

    // ---- S1/S3/S4/S5: scalar transforms ----
    "s1_scalar_transforms" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        abs(col("o_totalprice") - lit(250000.0)).as("abs_diff"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("od_str"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HOT")
          .otherwise("COLD").as("pri_class"),
        concat(upper(substring(col("o_orderstatus"), 1, 1)), lit("-"),
          lower(col("o_orderpriority"))).as("status_tag"))
    }),

    // ---- date/time function battery ----
    "s4_datetime_funcs" -> ((s, dir) => {
      val d = to_date(col("o_orderdate"))
      t(s, dir, "orders").select(
        col("o_orderkey"),
        datediff(lit("2002-01-01").cast("date"), d).cast("long").as("days_to_ref"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(d), "yyyy-MM-dd").as("eom"),
        (dayofweek(d) - 1).cast("long").as("dow"), // 0=Sunday on both sides
        quarter(d).cast("long").as("qtr"))
    }),

    // ---- array function battery ----
    "a4_array_funcs" -> ((s, dir) => {
      val w = split(trim(lower(col("text"))), "\\s+")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        array_join(slice(w, 1, 3), " ").as("first3"),
        element_at(sort_array(w), 1).as("alpha_first"),
        array_contains(w, "the").as("has_the"),
        size(array_distinct(w)).cast("long").as("n_uniq"))
    }),

    // ---- S2: name obfuscation (custom codegen expression) ----
    "s2_obfuscate" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        graft.functions.ObfuscateName.obfuscate_name(
          concat(col("c_name"), lit(" "), col("c_mktsegment"))).as("masked"))
    }),

    // ---- distinct aggregation ----
    "x1_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- anti join ----
    "x2_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    }),

    // ---- global top-k (sort + limit, stable tiebreak) ----
    "x3_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- analytic window functions (lag + frame + rank; beyond the
    //      reference's single ranking window) ----
    "w2_analytics" -> ((s, dir) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        rank().over(Window.partitionBy("o_custkey").orderBy(
          col("o_totalprice").desc, col("o_orderkey").asc)).cast("long").as("price_rank"))
    }),

    // ---- correlated scalar subquery (Catalyst decorrelates it into the
    //      same agg+join shape j3 builds by hand — SURVEY §4) ----
    "j4_correlated_scalar" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderkey, o_custkey,
                 CAST(o_totalprice AS DECIMAL(18,2)) *
                   (SELECT COUNT(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
                 > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) FROM orders_v i
                    WHERE i.o_custkey = o.o_custkey) AS above_avg
               FROM orders_v o""")
    }),

    // ---- string function battery ----
    "s3_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "#").as("padded"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        translate(col("p_type"), "AEIOU", "aeiou").as("folded"),
        concat_ws("::", col("p_brand"), col("p_type")).as("joined"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix5"))
    }),

    // ---- ordered statistics: exact percentiles ----
    "x6_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_extendedprice"), lit(0.25)).as("q1_price"),
          percentile(col("l_extendedprice"), lit(0.75)).as("q3_price"))
    }),

    // ---- pivot (wide conditional aggregation) ----
    "x8_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        // empty cells: Spark pivot yields NULL, SQL COUNT(CASE) yields 0
        .na.fill(0L, Seq("F", "O", "P"))
    }),

    // ---- cube (full grouping-set lattice) ----
    "x9_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    }),

    // ---- semi join (EXISTS) ----
    "x10_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // ---- math battery (IEEE-exact ops only: sqrt/ceil/floor/mod/sign) ----
    "s5_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
        floor(col("l_extendedprice")).cast("long").as("floor_price"),
        pmod(col("l_partkey"), lit(97L)).as("pk_mod"),
        signum(col("l_quantity") - 25.0).as("qty_sign"))
    }),

    // ---- D: exact dedup ----
    "d1_dedup_exact" -> ((s, dir) =>
      graft.ops.Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM1: the END-TO-END corpus pipeline, hash-gated like air1 —
    //      raw docs → Gopher quality gate → exact dedup → exact-Jaccard
    //      near-dup connected components → per-language funnel counts
    //      and final token budget. One query proves the tiers COMPOSE. ----
    "llm1_corpus_pipeline" -> ((s, dir) =>
      corpusFunnel(t(s, dir, "documents").select("doc_id", "text", "lang"))),

    // ---- LLM1S: the SAME funnel over the doc_id mod-100 centile — the
    //      bounded-oracle gate for scales where replaying the full
    //      funnel in DuckDB exhausts memory (tokenizing 5M docs at
    //      1000x was the one red cell in r8's four-decade table). The
    //      replica stride is a power of 10, so the centile keeps every
    //      copy of 1% of base docs — safe here because BOTH engines
    //      exact-dedup before the quadratic near-dup stage, and the
    //      oracle's tokenize pass shrinks with the slice. ----
    "llm1s_funnel_centile" -> ((s, dir) =>
      corpusFunnel(t(s, dir, "documents").select("doc_id", "text", "lang")
        .where(col("doc_id") % 100 === 7))),
    // ---- CARD1: the per-language corpus DATACARD — the release
    //      artifact every dataset ships: volume, token budget, quality
    //      rate, uniqueness, type-token ratio, exact median length,
    //      in one report (run-once-per-release: the three corpus
    //      scans are the report's cost, not a pipeline's) ----
    "card1_corpus_datacard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = graft.ops.TextAnalysis
        .gopherFlags(docs.select("doc_id", "text", "lang"), "text", minWords = 30)
        .withColumn("h", md5(col("text")))
        .withColumn("n_toks",
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
      val agg = base.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        countDistinct(col("h")).as("n_unique"))
      val vocab = graft.ops.TextAnalysis.vocabularyStats(docs, "lang", "text")
        .select(col("slice").as("lang"), col("ttr_bp"))
      val tc = base.groupBy("lang", "n_toks").agg(count(lit(1)).as("c"))
      val wd = Window.partitionBy("lang").orderBy("n_toks")
      val med = tc.withColumn("hi", sum(col("c")).over(wd))
        .withColumn("lo", col("hi") - col("c") + 1)
        .withColumn("n", sum(col("c")).over(Window.partitionBy("lang")))
        .groupBy("lang")
        .agg(max(when(expr("(5000 * n + 9999) div 10000")
          .between(col("lo"), col("hi")), col("n_toks"))).as("median_tokens"))
      agg.join(vocab, Seq("lang")).join(med, Seq("lang"))
        .withColumn("quality_bp", expr("(10000 * n_quality) div n_docs"))
        .withColumn("unique_bp", expr("(10000 * n_unique) div n_docs"))
        .select("lang", "n_docs", "n_tokens", "quality_bp", "unique_bp",
          "ttr_bp", "median_tokens")
    }),

    // ---- LLM2: the corpus pipeline's STREAMING head as a REAL stream —
    //      Gopher gate (the same one definition as llm1) → within-stream
    //      (lang, md5) dropDuplicates carrying state across micro-
    //      batches → stateless anti-join vs frozen history; per-language
    //      new-unique counts and token budget ----
    "llm2_stream_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val history = docs.where(col("doc_id") < 250)
      val scratch = java.nio.file.Files.createTempDirectory("graft_llm2_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      val streamDir = scratch.getAbsolutePath
      docs.where(col("doc_id") >= 250).write.mode("overwrite").parquet(streamDir)
      val stream = s.readStream
        .schema(s.read.parquet(streamDir).schema).parquet(streamDir)
      val out = graft.streaming.CorpusStreams.ingestPipeline(
        stream, history, "doc_id", "text", "lang", minWords = 30)
      graft.streaming.EventStreams.runToTable(out, "llm2_sink")
      s.catalog.refreshTable("llm2_sink")
      s.table("llm2_sink").groupBy("lang")
        .agg(count(lit(1)).as("n_new_unique"),
          sum(col("n_tokens")).as("tokens_new"))
    }),

    // ---- D: MinHash+LSH near-dup (verified exact-Jaccard output; shares the d4 oracle) ----
    "d2_minhash_neardup" -> ((s, dir) =>
      graft.ops.Dedup.minhashNearDup(t(s, dir, "documents"), "doc_id", "text", 0.8)),

    // ---- D: SimHash near-dup — EXACT oracle: simhash uses
    //      self-contained FNV-1a/64 token hashing, which DuckDB
    //      recomputes bit-for-bit (HUGEINT modular multiply), and the
    //      pigeonhole candidates are provably complete for hamming<=3,
    //      so the output equals the all-pairs hamming filter ----
    "d3_simhash_neardup" -> ((s, dir) =>
      graft.ops.Dedup.simhashNearDup(t(s, dir, "documents"), "doc_id", "text", 3)),

    // ---- D: simhash invariant — the full pipeline (maxHamming=3) must
    //      recover EVERY identical-text pair (they collide on all four
    //      chunks, so candidate generation cannot miss them); text
    //      equality filters hash-collision false positives ----
    "d3i_simhash_exact_dups" -> ((s, dir) => {
      // inject 50 known duplicates (id + 1e6) so the recall claim is
      // non-vacuous even at SFs whose corpus has no natural dup texts
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val all = docs.unionByName(docs.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.ops.Dedup.simhashNearDup(all, "doc_id", "text", 3)
        .join(all.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
        .join(all.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
        .where(col("text_a") === col("text_b"))
        .select(col("id_a"), col("id_b"))
    }),

    // ---- D: d3i's 4th-decade gate — the same simhash-recovers-every-
    //      identical-pair invariant, AGGREGATE-shaped (the llm1s/t11s
    //      pattern): per duplicate GROUP (md5 of the shared text) the
    //      recovered-pair count, id extremes, and an id checksum. The
    //      output is #groups rows — constant in replica count — where
    //      d3i's per-pair dump is quadratic in it (~250M rows at 1000×:
    //      the pandas-compare harness bound that kept d3i at a 100×
    //      ceiling). The mod-10 doc slice bounds the ENGINE-side
    //      candidate volume the same way; both engines aggregate the
    //      pair stream without materializing it to the harness. Text
    //      equality is compared via md5 so the pair→text join ships
    //      32-byte digests, not document bodies, at every scale. ----
    "d3is_simhash_dup_stats" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .where(col("doc_id") % 10 === 3)
      val all = base.unionByName(base.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val h = all.select(col("doc_id"), md5(col("text")).as("th"))
      graft.ops.Dedup.simhashNearDup(all, "doc_id", "text", 3)
        .join(h.select(col("doc_id").as("id_a"), col("th").as("h_a")), Seq("id_a"))
        .join(h.select(col("doc_id").as("id_b"), col("th").as("h_b")), Seq("id_b"))
        .where(col("h_a") === col("h_b"))
        .groupBy(col("h_a").as("grp"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("id_a")).as("min_id"),
          max(col("id_b")).as("max_id"),
          sum(col("id_a") + col("id_b")).as("id_checksum"))
    }),

    // ---- D: cluster-level dedup — connected components over the
    //      near-dup pairs (cluster_id = smallest reachable doc id);
    //      oracle recomputes components with a recursive transitive
    //      closure over the same exact-Jaccard pairs ----
    "d6_dedup_clusters" -> ((s, dir) =>
      graft.ops.Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text", 0.8)),

    // ---- D: the fused collapse tier's own hash gate — clusters over
    //      the dense replica corpus (see d4c): CC must run on the
    //      rep-level graph and members inherit the label in one
    //      output-sized join; the oracle replays the recursive
    //      transitive closure over the same replicated relation ----
    "d6c_dedup_clusters_dense" -> ((s, dir) =>
      graft.ops.Dedup.nearDupClusters(denseDocs(s, dir), "doc_id", "text", 0.8)),

    // ---- D: clusters over the deterministic 10% doc slice — the 10×
    //      oracle check for d6's spill-class recursive-closure replay
    //      (~77 GB DuckDB temp at 10× full corpus; the d13s/d16s/d17s
    //      rationale — replica strides are multiples of 10, so whole
    //      duplicate groups survive the slice) ----
    "d6s_dedup_clusters_slice" -> ((s, dir) =>
      graft.ops.Dedup.nearDupClusters(
        t(s, dir, "documents").where(col("doc_id") % 10 === 3),
        "doc_id", "text", 0.8)),

    // ---- D: exact n-gram Jaccard pairs ----
    "d4_ngram_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.ngramJaccardPairsAuto(t(s, dir, "documents"), "doc_id", "text", 0.8)),

    // ---- D: exact n-gram Jaccard over a DENSE-duplicate corpus (the
    //      web-crawl replica regime): the deterministic 10% doc slice,
    //      each doc replicated 4× (75% dup density — past the 0.7
    //      cutoff, so the exact-copy collapse tier dispatches; the
    //      DedupSpec tier assertion pins that this fixture shape
    //      provably takes the collapse path). The oracle is d4's own
    //      SQL over the same replication — jaccard of identical texts
    //      is 1 by identity, so the direct quadratic answer IS the
    //      collapse tier's contract ----
    "d4c_ngram_jaccard_dense" -> ((s, dir) =>
      graft.ops.Dedup.ngramJaccardPairsAuto(
        denseDocs(s, dir), "doc_id", "text", 0.8)),

    // ---- D: MinHash near-dup over the same dense corpus — the collapse
    //      dispatch ahead of the signature kernel (exact copies share a
    //      signature and pair at j=1 always, so LSH on distinct-text
    //      reps + group expansion is the same pair set; the LSH==exact
    //      contract makes d4's SQL the oracle here too) ----
    "d2c_minhash_dense" -> ((s, dir) =>
      graft.ops.Dedup.minhashNearDup(
        denseDocs(s, dir), "doc_id", "text", 0.8)),

    // ---- T: token counts + character ratios ----
    "t1_text_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      import graft.ops.TextAnalysis._
      d.select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        punctRatio(col("text")).as("punct_ratio"),
        alphaRatio(col("text")).as("alpha_ratio"))
    }),

    // ---- T: language identification ----
    "t2_langid" -> ((s, dir) =>
      graft.ops.TextAnalysis.withLangPred(t(s, dir, "documents"), "text")
        .select("doc_id", "lang", "lang_pred")),

    // ---- T: quality scoring ----
    "t3_quality" -> ((s, dir) => {
      import graft.ops.TextAnalysis._
      t(s, dir, "documents").select(
        col("doc_id"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        qualityScore(col("text")).as("quality_score"))
    }),

    // ---- T: order-sensitive fingerprint (FNV-1a/64 over the
    //      space-joined token stream; DuckDB recomputes it bit-for-bit) ----
    "t4_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    }),

    // ---- T: Gopher-style repetition metrics (dup-word fraction,
    //      top-word share) ----
    "t7_repetition" -> ((s, dir) =>
      graft.ops.TextAnalysis.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")),

    // ---- T: per-document top-5 TF-IDF terms (smoothed idf; weight
    //      rounded before ranking so the rank order is cross-engine
    //      deterministic) ----
    "t12_tfidf" -> ((s, dir) =>
      graft.ops.TextAnalysis.tfidf(t(s, dir, "documents"), "doc_id", "text", 5)),

    // ---- T: deterministic stratified corpus mixing by language
    //      (keep all en, 60% de/fr/es, 30% zh; md5-bucket content-stable) ----
    "t13_corpus_mix" -> ((s, dir) =>
      graft.ops.Corpus.sampleStratified(
        t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 10000, "de" -> 6000, "fr" -> 6000, "es" -> 6000, "zh" -> 3000))
        .select("doc_id", "lang", "source")),

    // ---- T: paragraph-level exact dedup — multi-paragraph docs are
    //      constructed by appending a SHARED paragraph (text of doc
    //      id%25) to every doc, so cross-doc duplicate paragraphs exist
    //      by construction (and docs 0..24 carry a within-doc dup);
    //      first corpus-wide occurrence by (doc_id, pos) survives ----
    "t14_paragraph_dedup" -> ((s, dir) =>
      graft.ops.Corpus.dedupParagraphs(
        sharedTailDocs(s, dir, 25, "\n\n"), "doc_id", "text")),

    // ---- T: deterministic sequence packing — docs laid head-to-tail in
    //      content-stable (md5-shard, doc_id) order and cut into
    //      256-token sequences; the oracle recomputes the exact layout ----
    "t15_pack_sequences" -> ((s, dir) =>
      graft.ops.Corpus.packSequences(
        t(s, dir, "documents"), "doc_id", "text", seqLen = 256, shards = 8)),

    // ---- D: repeated-substring spans (ExactSubstr-style, char-level) —
    //      docs are augmented with a shared tail (text of doc id%30) so
    //      ≥40-char cross-doc repeats exist by construction (docs 0..29
    //      additionally self-repeat); each gram's first corpus-wide
    //      occurrence stays un-flagged (keep-first), later occurrences
    //      merge into maximal spans ----
    "t16_repeated_spans" -> ((s, dir) =>
      graft.ops.Dedup.repeatedSpans(
        sharedTailDocs(s, dir, 30, " "), "doc_id", "text", minLen = 40)),

    // ---- T: the round-4 capstone — the NEW operators composed as one
    //      declarative pipeline: paragraph dedup (first corpus-wide
    //      occurrence survives) -> quality gate on the CLEANED text ->
    //      deterministic sequence packing. One plan, hash-oracled
    //      end-to-end like t11 ----
    "t17_prepare_packed" -> ((s, dir) => {
      import graft.ops._
      val cleaned = Corpus.dedupParagraphs(
        sharedTailDocs(s, dir, 25, "\n\n"), "doc_id", "text")
      val gated = cleaned.select(col("doc_id"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.alphaRatio(col("text")).as("alpha_ratio"))
        .where(col("n_tokens") >= 10 && col("alpha_ratio") >= 0.5)
      // reuse the gate's token counts — the cleaned text tokenizes once
      Corpus.packSequences(gated, "doc_id", "text", seqLen = 256, shards = 8,
        tokenCountCol = Some("n_tokens"))
    }),

    // ---- T: PII redaction — emails/phones injected deterministically,
    //      masked with the shared Java/RE2 regex subset so the oracle
    //      reproduces the redacted text byte-for-byte ----
    "t8_pii_redaction" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" Contact: user"), col("doc_id"),
          lit("@example.com or +1 555 000 "), lpad(col("doc_id"), 4, "0")).as("text"))
      withPii.select(col("doc_id"),
        graft.ops.TextAnalysis.redactPii(col("text")).as("redacted"))
    }),

    // ---- T: fingerprint invariant — fp equality must coincide with
    //      token-sequence equality on this corpus (no collisions, and
    //      the chained hash is a pure function of the sequence) ----
    "t4i_fingerprint_unique" -> ((s, dir) => {
      t(s, dir, "documents")
        .where(col("text").isNotNull) // NULL text: fp NULL but seq '' — keep the invariant total
        .select(
          concat_ws(" ", graft.ops.TextAnalysis.tokens(col("text"))).as("seq"),
          graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("seq")).as("n_distinct_seq"),
          countDistinct(col("fp")).as("n_distinct_fp"))
    }),

    // ---- T: word count (explode / lateral — the canonical corpus pass) ----
    // ---- T: per-language vocabulary statistics — types/tokens/hapax
    //      + TTR/hapax share in floored bp (the per-source corpus
    //      quality dashboard; one vocab-sized aggregate) ----
    "t36_vocab_stats" -> ((s, dir) =>
      graft.ops.TextAnalysis.vocabularyStats(
        t(s, dir, "documents"), "lang", "text")
        .withColumnRenamed("slice", "lang")),

    // ---- T: character entropy — the encoded-blob / repeated-spam
    //      detector; micro-nat terms via the shared entropy tree over
    //      the per-doc codepoint histogram ----
    "t44_char_entropy" -> ((s, dir) =>
      graft.ops.TextAnalysis.charEntropy(
        t(s, dir, "documents"), "doc_id", "text")),

    // ---- T: word-blocklist gate (the C4 badwords filter) — exact
    //      token membership, never substring; per-language drop rates ----
    "t42_word_blocklist" -> ((s, dir) =>
      graft.ops.Corpus.wordBlocklist(
        t(s, dir, "documents"), "text", Seq("slow", "merge"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("blocked").cast("long")).as("n_blocked"))
        .withColumn("block_bp", expr("(10000 * n_blocked) div n_docs"))),

    // ---- X: price elasticity — log-log OLS of quantity on price per
    //      brand: milli-nat ln points via the shared lnRatioMicroSql
    //      tree (scale 1e3 keeps the e32 moment algebra inside longs),
    //      slope through the exact olsTrend machinery ----
    "x53_price_elasticity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").groupBy("l_partkey")
        .agg(sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)")).as("qty"))
      val pt = t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_cents"))
      val pts = li.join(pt, Seq("l_partkey"))
        .select(col("p_brand"),
          expr(graft.ops.Stats.lnRatioMicroSql("price_cents", "1", 1000L)).as("x"),
          expr(graft.ops.Stats.lnRatioMicroSql("qty", "1", 1000L)).as("y"))
      graft.ops.TimeSeries.olsTrend(pts, "p_brand", "x", "y")
        .withColumnRenamed("key", "p_brand")
    }),

    // ---- T: code-switching gate — 20-token chunk langid votes vs the
    //      doc-level verdict; 'und' chunks reported but excluded from
    //      the disagreement ratio ----
    "t41_code_switching" -> ((s, dir) =>
      graft.ops.TextAnalysis.codeSwitching(
        t(s, dir, "documents"), "doc_id", "text", chunkTokens = 20)),

    // ---- T: NEAR-DUP split leakage — t40's n-gram complement: a test
    //      doc most of whose shingles the train split already contains
    //      is contaminated even when no exact hash matches. novelty_bp
    //      from the t34 kernel (test docs vs the train shingle set),
    //      leaked = novelty < 50% ----
    "t43_split_ngram_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sp = graft.ops.Corpus.assignSplit(docs, "doc_id", 90, 5)
      val withSplit = docs.join(sp, Seq("doc_id"))
      val train = withSplit.where(col("split") === "train")
      val rest = withSplit.where(col("split") =!= "train")
      graft.ops.Corpus.ngramNovelty(rest, train, "doc_id", "text", n = 3)
        .join(sp, Seq("doc_id"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("novelty_bp") < 5000, 1L).otherwise(0L)).as("n_leaked"))
        .withColumn("leak_bp", expr("(10000 * n_leaked) div n_docs"))
    }),

    // ---- T: Jensen–Shannon token-distribution divergence — each
    //      language slice vs the corpus complement; exact cross-
    //      multiplied count ratios through the shared lnRatioMicroSql
    //      tree, uncovered rest-mass folded as cq·ln2 off the
    //      histogram, one positive-mod floor at the boundary ----
    "t39_js_divergence" -> ((s, dir) =>
      graft.ops.TextAnalysis.jsDivergence(
        t(s, dir, "documents"), "lang", "text")
        .withColumnRenamed("key", "lang")),

    "t5_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(graft.ops.TextAnalysis.tokens(lower(col("text")))).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
    }),

    // ---- null semantics battery (F3: null-safe guards as expressions) ----
    "x7_null_semantics" -> ((s, dir) => {
      val status = nullif(col("o_orderstatus"), lit("P")) // P -> null
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(status).as("n_non_p"),            // count skips nulls
          count(lit(1)).as("n_all"),
          sum(when(status.isNull, 1L).otherwise(0L)).as("n_p"),
          first(coalesce(status, lit("PENDING")), ignoreNulls = false).isNotNull
            .as("coalesced_non_null"))
    }),

    // ---- T: composite corpus curation (quality gate -> exact dedup ->
    //      greedy near-dup removal; the end-to-end training-data shape) ----
    "t6_curate_corpus" -> ((s, dir) =>
      graft.ops.Corpus.curate(t(s, dir, "documents"), "doc_id", "text")),

    // ---- D: benchmark decontamination — train docs sharing any word
    //      8-gram with the eval slice are flagged; copies of eval docs
    //      are injected so contamination exists by construction ----
    // ---- T: n-gram novelty — the incremental-crawl score: how much
    //      of each "new batch" doc (doc_id % 5 = 0) has the existing
    //      corpus never seen? shuffle join, never a broadcast ----
    "t34_ngram_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      graft.ops.Corpus.ngramNovelty(
        docs.where(col("doc_id") % 5 === 0),
        docs.where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", n = 3)
    }),

    "d7_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val ev = docs.where(col("doc_id") < 20)
      val train = docs.where(col("doc_id") >= 20)
        .unionByName(ev.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.ops.Corpus.decontaminate(train, ev, "doc_id", "text", 8)
    }),

    // ---- D: BLOOM-filtered decontamination — the same contamination
    //      construction and the same RESULT as d7, by the plan that
    //      never broadcasts eval shingle strings: eval shingles fold
    //      into one fixed-size Bloom filter (distributed build, OR
    //      merge), train shingles probe the one-row broadcast filter
    //      in codegen, and the exact verify join removes the filter's
    //      false positives — so the approximate structure yields an
    //      EXACT, hash-oracled result (no false negatives by
    //      construction). numBits sized small here (1<<20) so the FP
    //      path is actually exercised at test scale ----
    "d9_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val ev = docs.where(col("doc_id") < 20)
      val train = docs.where(col("doc_id") >= 20)
        .unionByName(ev.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.ops.Corpus.decontaminateBloom(train, ev, "doc_id", "text", 8,
        numBits = 1 << 20, numHashes = 7)
    }),

    // ---- D: entity resolution — the master-data dedup pipeline: exact
    //      dups canonicalize first (d1 semantics: min key per distinct
    //      name), then blocked edit-distance matching pairs typo
    //      variants with their canonical record. Typos injected by
    //      construction: every third registry name loses one character
    //      at a key-derived position ----
    // ---- X19: Z-order layout — rewrite lineitem clustered by the
    //      Morton interleave of (l_orderkey, l_partkey), then answer a
    //      partkey-range aggregate from the reorganized files. The
    //      oracle runs against the ORIGINAL table: layout must be
    //      semantically invisible; ZOrderSpec asserts the actual
    //      pruning property (bounded per-file envelopes in BOTH
    //      dimensions) ----
    "x19_zorder" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val scratch = java.nio.file.Files.createTempDirectory("graft_x19_zorder_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.ops.ZOrder.zorderWrite(li, "l_orderkey", "l_partkey",
        scratch.getAbsolutePath, numFiles = 16)
      s.read.parquet(scratch.getAbsolutePath)
        .where(col("l_partkey").between(500, 700))
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- X: HILBERT layout — same invisible-rewrite contract as x19,
    //      filtered on the 45-55% partkey window that STRADDLES the
    //      Z-curve's 50% quadrant boundary (its documented worst case;
    //      the Hilbert curve's unit steps keep boundary files compact,
    //      ZOrderSpec measures the pruning difference) ----
    "x21_hilbert" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val scratch = java.nio.file.Files.createTempDirectory("graft_x21_hilbert_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      graft.ops.ZOrder.hilbertWrite(li, "l_orderkey", "l_partkey",
        scratch.getAbsolutePath, numFiles = 16)
      val maxPk = li.agg(max("l_partkey")).head().getLong(0)
      s.read.parquet(scratch.getAbsolutePath)
        .where(col("l_partkey").between(maxPk * 45 / 100, maxPk * 55 / 100))
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    "d10_entity_resolution" -> ((s, dir) => {
      val reg = t(s, dir, "part")
        .groupBy(col("p_name").as("name")).agg(min("p_partkey").as("rec_id"))
        .select("rec_id", "name")
      val typo = reg.where(col("rec_id") % 3 === 0)
        .select((col("rec_id") + 1000000000L).as("rec_id"),
          expr("concat(substring(name, 1, cast(rec_id % length(name) as int)), " +
            "substring(name, cast(rec_id % length(name) as int) + 2, 1000000))")
            .as("name"))
      graft.ops.EntityResolution.resolveEntities(
        reg.union(typo), "rec_id", "name", maxDist = 1, blockLen = 3)
    }),

    // ---- D: FUZZY decontamination — overlap-FRACTION thresholding
    //      (flag when ≥5% of a doc's distinct 8-grams appear in the
    //      eval set; integer cross-multiply, never a float ratio).
    //      Partial contamination injected by construction: train docs
    //      ≡0 (mod 7) get the first 12 tokens of an eval doc appended,
    //      so the ~5 shared shingles clear 5% for short docs and miss
    //      it for long ones — both sides of the bar are exercised ----
    "d8_fuzzy_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val ev = docs.where(col("doc_id") < 20)
      val snip = ev.select(col("doc_id").as("k"),
        array_join(slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 12), " ").as("sn"))
      val train = docs.where(col("doc_id") >= 20)
        .withColumn("k", col("doc_id") % 20)
        .join(snip, Seq("k"))
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" "), col("sn")))
            .otherwise(col("text")).as("text"))
      graft.ops.Corpus.decontaminateFuzzy(train, ev, "doc_id", "text", 8, 500L)
    }),

    // ---- T: bigram-LM scoring (the CCNet perplexity-filter shape) —
    //      model trained on the corpus itself, docs bucketed
    //      head/middle/tail by mean per-bigram log-prob; terms are
    //      fixed-point micro-nats so the sums are exact integers ----
    "t19_lm_score" -> ((s, dir) =>
      graft.ops.TextAnalysis.lmScore(t(s, dir, "documents"), "doc_id", "text")),

    // ---- T: C4-style line-level boilerplate removal — multi-line docs
    //      constructed by appending a banned-phrase line, a too-short
    //      line, and a valid line to every doc; docs ≡0 (mod 97) are
    //      replaced by junk-only lines and must drop entirely ----
    "t20_boilerplate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          lit("ok bye\nclick here for free stuff"))
          .otherwise(concat(col("text"),
            lit("\nclick here for free stuff\nok bye\nthe quick brown fox jumps again")))
          .as("text"))
      graft.ops.Corpus.cleanLines(d, "doc_id", "text", 3, Seq("click here", "lorem ipsum"))
    }),

    // ---- T: the published Gopher rule gate — per-rule integer-exact
    //      flags + combined keep; minWords=30 splits this corpus ----
    "t21_gopher_gate" -> ((s, dir) =>
      graft.ops.TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        minWords = 30)),

    // ---- T: cluster-based curation — near-dup removal per connected
    //      component (keep each cluster's min id), the principled
    //      variant of t6's greedy pairwise drop ----
    "t9_curate_clustered" -> ((s, dir) =>
      graft.ops.Corpus.curateClustered(t(s, dir, "documents"), "doc_id", "text")),

    // ---- T: deterministic content-stable train/val/test split ----
    "t10_split" -> ((s, dir) =>
      graft.ops.Corpus.assignSplit(t(s, dir, "documents"), "doc_id", 90, 5)),

    // ---- T: split-leakage gate — exact-text contamination of val/test
    //      by train after the id-keyed split (the silent eval-inflation
    //      bug); hash-histogram shape, rows never enter a window ----
    "t40_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sp = graft.ops.Corpus.assignSplit(docs, "doc_id", 90, 5)
      graft.ops.Corpus.splitLeakage(
        docs.select(col("doc_id"), col("text")).join(sp, Seq("doc_id")),
        "split", "text")
    }),

    // ---- X: deterministic fixed-size per-stratum sample — exactly 5
    //      customers per nation by smallest md5 priority, planned as
    //      the bounded-heap partial top-k (constant score, key =
    //      md5hex‖id), never a per-stratum window sort ----
    "x18_group_sample" -> ((s, dir) =>
      graft.ops.Corpus.sampleFixedPerStratum(
        t(s, dir, "customer"), Seq("c_nationkey"), "c_custkey", 5)),

    // ---- weighted sampling without replacement (Efraimidis–Spirakis):
    //      k docs per language, draw probability ∝ n_chars; the E-S
    //      rank ln(u)/w lives as integer fixed point so the sample is
    //      engine-reproducible bit-for-bit ----
    "x20_weighted_sample" -> ((s, dir) =>
      graft.ops.Corpus.sampleWeighted(
        t(s, dir, "documents"), "doc_id", "n_chars", 50, Seq("lang"))),

    // ---- T: the capstone training-data pipeline as ONE declarative
    //      plan: quality gate -> exact dedup -> cluster-level near-dup
    //      removal -> benchmark decontamination (vs the doc_id<20 eval
    //      slice) -> content-stable split ----
    "t11_prepare_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val eval = docs.where(col("doc_id") < 20)
      // pairCorpus = the RAW table read (no projection — plan equality
      // is exact): the signature plan then equals d2/d6/t6/t9's and all
      // five share one cached signature table
      val curated = graft.ops.Corpus
        .curateClustered(docs.where(col("doc_id") >= 20), "doc_id", "text",
          pairCorpus = Some(t(s, dir, "documents")))
        .select("doc_id")
      val keptDocs = docs.join(curated, Seq("doc_id"))
      val contaminated = graft.ops.Corpus
        .decontaminate(keptDocs, eval, "doc_id", "text", 8)
        .select("doc_id")
      val clean = keptDocs.join(contaminated, Seq("doc_id"), "left_anti")
      graft.ops.Corpus.assignSplit(clean, "doc_id", 90, 5)
    }),

    // ---- T: the t11 composition over the doc_id mod-10 slice — the
    //      hash gate for scales where the full shingle-pair replay
    //      out-spills the oracle (quadratic in replica count; >72 GB
    //      DuckDB temp at 10x, measured r9). Same pipeline, same
    //      oracle SQL parameterized by the slice. ----
    "t11s_prepare_slice" -> ((s, dir) => {
      val all = t(s, dir, "documents").where(col("doc_id") % 10 === 3)
      val docs = all.select("doc_id", "text")
      val eval = docs.where(col("doc_id") < 20)
      val curated = graft.ops.Corpus
        .curateClustered(docs.where(col("doc_id") >= 20), "doc_id", "text",
          pairCorpus = Some(all))
        .select("doc_id")
      val keptDocs = docs.join(curated, Seq("doc_id"))
      val contaminated = graft.ops.Corpus
        .decontaminate(keptDocs, eval, "doc_id", "text", 8)
        .select("doc_id")
      val clean = keptDocs.join(contaminated, Seq("doc_id"), "left_anti")
      graft.ops.Corpus.assignSplit(clean, "doc_id", 90, 5)
    }),

    // ---- V: brute-force exact top-k cosine ----
    // 10% of the corpus as queries (self-kNN slice) — the many-query
    // regime ANN indexing exists for; v3 runs the same workload on the
    // IVF index.
    "v1_topk_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.bruteForceTopK(
        emb, gateQueries(emb), "vec_id", "embedding", 5)
    }),

    // ---- V: embedding norm profile — the vector-column DQ gate
    //      (un-normalized or zero vectors break cosine silently);
    //      exact integer norms², x15 median ----
    "v31_norm_profile" -> ((s, dir) =>
      graft.ops.Similarity.normProfile(
        t(s, dir, "embeddings"), "label", "embedding")
        .withColumnRenamed("slice", "label")),

    // ---- V: nearest-class-centroid accuracy — the cheapest "do these
    //      embeddings encode the label" probe; exact integer centroids
    //      and L2², one broadcast-codegen corpus pass ----
    "v30_prototype_accuracy" -> ((s, dir) =>
      graft.ops.Clustering.prototypeAccuracy(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label")),

    // ---- V: contrastive triplet mining — hardest positive (least-
    //      similar same-label) + hardest negative (most-similar
    //      different-label) per anchor, violation flag on full-precision
    //      doubles; the training-pair generation step ----
    "v28_triplet_mine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.tripletMine(
        emb, emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding", "label")
    }),

    // ---- D: quality-aware dedup survivor — near-dup clusters keep the
    //      LONGEST member (the C4 policy), not the smallest id ----
    "d17_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 0.8)
      graft.ops.Corpus.dedupKeepBest(docs, pairs, "doc_id", "n_chars")
    }),

    // ---- D: slice variants of the spill-class dedup gates — the SAME
    //      operators over a deterministic 10% doc slice (replica
    //      strides are multiples of 10, so whole duplicate groups
    //      survive the slice). These exist so d16/d17 keep a real
    //      hash-oracle check at 10×, where the full-corpus DuckDB truth
    //      CTE spills ~77 GB (an oracle-cost problem, not an engine
    //      one — the engine side runs full-corpus at every SF) ----
    "d16s_band_sweep_slice" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") % 10 === 3)
      val rep = graft.ops.Dedup.minhashBandSweep(
        docs, "doc_id", "text", 0.8, 3, 128, Seq(4, 8, 16, 32))
      val w = org.apache.spark.sql.expressions.Window.orderBy("bands")
      rep
        .withColumn("nested_ok",
          (col("n_candidates") >= coalesce(lag("n_candidates", 1).over(w), lit(0L)))
            .cast("int"))
        .withColumn("monotone_ok",
          (col("n_hit") >= coalesce(lag("n_hit", 1).over(w), lit(0L))).cast("int"))
        .agg(count(lit(1)).as("n_tiers"), max(col("n_truth")).as("n_truth"),
          min(col("nested_ok")).as("nested_ok"),
          min(col("monotone_ok")).as("monotone_ok"),
          max(when(col("bands") === 32,
            (col("n_hit") === col("n_truth")).cast("int"))).as("full_recall_ok"))
    }),

    "d17s_keep_best_slice" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") % 10 === 3)
      val pairs = graft.ops.Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 0.8)
      graft.ops.Corpus.dedupKeepBest(docs, pairs, "doc_id", "n_chars")
    }),

    // ---- X: JSON key census — schema-drift monitor over the props
    //      payload; purchases get an augmented payload (built as an
    //      IDENTICAL string in both engines) so the census is
    //      non-degenerate ----
    "x52_json_census" -> ((s, dir) => {
      val aug = events(s, dir).withColumn("props2",
        when(col("event_type") === "purchase",
          concat(lit("{\"k\": "), get_json_object(col("props"), "$.k"),
            lit(", \"cents\": "),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"),
            lit(", \"kind\": \"buy\"}")))
          .otherwise(col("props")))
      graft.ops.DataQuality.jsonKeyCensus(aug, "props2")
    }),

    // ---- V: binary (sign) quantization recall report — 1 bit/dim
    //      packed words vs exact brute force; BOTH tiers deterministic,
    //      so the whole report hash-oracles (the v23 stance: a
    //      measurement operator must be allowed to say no) ----
    "v26_binary_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val bf = graft.ops.Similarity
        .bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val bq = graft.ops.Similarity
        .binaryQuantTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val hit = bf.join(bq, Seq("query_id", "neighbor_id"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .withColumn("recall_bp", expr("(10000 * n_hit) div n_bf"))
    }),

    // ---- V: MMR diversification — retrieve-then-rerank composition:
    //      brute-force top-15 per query, then 5 greedy MMR rounds at
    //      λ=0.7 (integer basis points — see Similarity.mmrDiversify) ----
    "v10_mmr_diversify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cands = graft.ops.Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding", 15)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
      graft.ops.Similarity.mmrDiversify(cands, emb, "vec_id", "embedding", 5, 7000)
    }),

    // ---- V: MMR over a 1% query slice (full corpus) — the 10× check
    //      for v10's spill-class oracle: the replay's brute-force
    //      query×corpus cross is 4×10⁹ rows at 10× with the full query
    //      set; 200 queries keep the greedy-selection replay exact and
    //      affordable ----
    "v10s_mmr_slice" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cands = graft.ops.Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") % 1000 === 0), "vec_id", "embedding", 15)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
      graft.ops.Similarity.mmrDiversify(cands, emb, "vec_id", "embedding", 5, 7000)
    }),

    // the 100× MMR gate: v10s already thins QUERIES to mod-1000, but
    // its oracle still crosses them with the FULL corpus (40M scored
    // rows each dragging a 64-float vector through a per-query sort —
    // the measured 46.5 GB temp blow-up at 100×); slicing the corpus
    // to mod-10 keeps the same greedy-rounds structure at 1/10 the
    // candidate-generation cost
    "v10s2_mmr_centile" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") % 10 === 0)
      val cands = graft.ops.Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") % 1000 === 0), "vec_id", "embedding", 15)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
      graft.ops.Similarity.mmrDiversify(cands, emb, "vec_id", "embedding", 5, 7000)
    }),

    // ---- V: string-keyed top-k — doc-UUID-shaped ids take the
    //      string-keyed bounded heap (not the window fallback); ids are
    //      deliberately UNpadded so binary string order diverges from
    //      numeric order ("doc-10" < "doc-9") and the oracle must agree
    //      on the string tie-break, not the numeric one ----
    "v1s_topk_string_ids" -> ((s, dir) => {
      val emb0 = t(s, dir, "embeddings")
      def strId(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("doc-"), col("vec_id").cast("string")).as("vec_id"), col("embedding"))
      graft.ops.Similarity.bruteForceTopK(
        strId(emb0), strId(emb0.where(col("vec_id") % 10 === 0)),
        "vec_id", "embedding", 5)
    }),

    // ---- V: string-keyed top-k over the centile-sliced corpus — the
    //      100× gate for the string-id tie-break path. The v1s oracle
    //      is queries × corpus BY CONSTRUCTION (a brute-force replay is
    //      the definition of exact top-k), so its full-tenth query set
    //      over the full corpus is hours of DuckDB at 100×; this keeps
    //      queries ⊂ a mod-10 corpus slice with a mod-1000 query set
    //      (strides are powers of 10 — both subsets replicate) ----
    "v1s2_topk_string_centile" -> ((s, dir) => {
      val emb0 = t(s, dir, "embeddings").where(col("vec_id") % 10 === 0)
      def strId(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("doc-"), col("vec_id").cast("string")).as("vec_id"), col("embedding"))
      graft.ops.Similarity.bruteForceTopK(
        strId(emb0), strId(emb0.where(col("vec_id") % 1000 === 0)),
        "vec_id", "embedding", 5)
    }),

    // ---- V: embedding near-dup pairs ----
    "v2_embed_neardup" -> ((s, dir) =>
      graft.ops.Similarity.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding", 0.3)),

    // ---- V: sign-LSH bucketed near-dup at its designed operating
    //      point (high cosine, 64 bands x 8 bits). The corpus has no
    //      natural pairs at >= 0.8, so 50 duplicates are injected as
    //      POSITIVELY SCALED copies (x1.1): scaling preserves every
    //      hyperplane sign exactly, so LSH recall on them is 1.0 by
    //      construction (not probabilistically) and the exact-pairs
    //      oracle applies deterministically ----
    "v4_lsh_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(
        col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val dup = emb.where(col("vec_id") < 50).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.1)).as("embedding"))
      graft.ops.Similarity.lshEmbeddingNearDup(
        emb.unionByName(dup), "vec_id", "embedding", 0.8)
    }),

    // ---- V: IVF approximate top-k (approx; rows-only check) ----
    // ---- V: IVF probe explain — the candidate-set IDENTITY (probed
    //      cells, candidate counts) is an exact deterministic function
    //      of the corpus, so it is fully hash-oracled: the oracle
    //      replays xxhash64 seed selection in SQL arithmetic, the
    //      argmin cell assignment over in-order IEEE double sums, and
    //      the nProbe-deep probe ranking. Only the tie-order of equal
    //      cosines stays engine-internal — and that is pinned by the
    //      v3i/v5/v24 recall gates ----
    "v3_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.ivfProbeReport(
        emb, emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding", 5)
    }),

    // ---- V: IVF recall invariant — recall vs the exact brute force at
    //      nProbe=8/16 with one Lloyd iteration; the gate (0.7) is the
    //      measured 0.79-0.83 on this corpus minus margin. n_bf is
    //      cross-checked against DuckDB's own brute-force top-k ----
    // ---- V: nProbe–recall sweep — the probe-budget planning report
    //      from ONE index build; gates are the order/clustering-immune
    //      invariants (nested tiers → monotone recall; probing every
    //      cell → exactly brute force) ----
    "v24_nprobe_sweep" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      graft.ops.Similarity.nprobeSweep(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, kmeansIters = 1, probes = Seq(1, 4, 16))
    }),

    "v3i_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
          nCentroids = 16, nProbe = 8, kmeansIters = 1))
    }),

    // ---- V: IVF + binary quantization + exact rerank — the three-
    //      stage vector-DB architecture (coarse cells → 1-bit scan →
    //      full-precision refine). rerank = 200: on an unclustered
    //      corpus the 1-bit candidates are near-interchangeable, so the
    //      cut must track in-cell density (measured at sf0.1: 50→0.667,
    //      100→0.74, 200→0.781 vs the ~0.79 nProbe-8 cell ceiling;
    //      tools.ProfileV29) — the knob a deployment sizes per corpus ----
    "v29_ivfbq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = gateQueries(emb)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfBqTopK(emb, q, "vec_id", "embedding", 5,
          nCentroids = 16, nProbe = 8, rerank = 200, kmeansIters = 1))
    }),

    // ---- V: FILTERED ANN — search within a metadata predicate
    //      (label = 3) via a semi-join on the probed cells BEFORE
    //      scoring; index built once, predicate applied at probe (the
    //      vector-DB filtered-search pattern); recall-gated against
    //      the exact filtered baseline ----
    // ---- V: dimension-truncation quality REPORT — what recall@5
    //      would a 16-of-64-dim prefix keep? (the storage-quartering
    //      measurement an MRL-style column demands BEFORE truncating;
    //      Kusupati 2022). Both tiers are exact brute force, so the
    //      whole report hash-oracles — on THIS synthetic corpus the
    //      honest answer is ~0.25: don't truncate. ----
    "v23_matryoshka_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val trunc = (d: org.apache.spark.sql.DataFrame) =>
        d.withColumn("embedding", slice(col("embedding"), 1, 16))
      val full = graft.ops.Similarity
        .bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val pref = graft.ops.Similarity
        .bruteForceTopK(trunc(emb), trunc(q), "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val hit = full.join(pref, Seq("query_id", "neighbor_id"), "left_semi")
      full.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .withColumn("recall_bp", expr("(10000 * n_hit) div n_bf"))
    }),

    // ---- V: JL random-projection recall — 64d → 16d via the
    //      md5-parity ±1 sign matrix (content-derived, no RNG state),
    //      exact-integer components; top-5 recall vs the full-precision
    //      baseline ----
    "v25_random_projection" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val full = graft.ops.Similarity
        .bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val proj = graft.ops.Similarity.randomProjection(emb, "vec_id", "embedding", 16)
      val projQ = proj.join(q.select("vec_id"), Seq("vec_id"))
      val rp = graft.ops.Similarity
        .bruteForceTopK(proj, projQ, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val hit = full.join(rp, Seq("query_id", "neighbor_id"), "left_semi")
      full.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .withColumn("recall_bp", expr("(10000 * n_hit) div n_bf"))
    }),

    // ---- V: embedding drift — per-label centroid vs the corpus
    //      centroid, exact integer L2² and the shared cosine tree
    //      (the per-ingest-batch distribution-shift monitor) ----
    "v22_embedding_drift" -> ((s, dir) =>
      graft.ops.Similarity.embeddingDrift(
        t(s, dir, "embeddings"), "embedding", "label")
        .withColumnRenamed("slice", "label")),

    "v21_filtered_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val allowed = emb.where(col("label") === 3).select("vec_id")
      val idx = graft.ops.Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCentroids = 16, kmeansIters = 1, persist = false)
      // probe depth DERIVED from the filter's measured selectivity
      // (Similarity.adaptiveNProbe) instead of the r8 constant 12: a
      // ~1/5-selective label filter sees ~1/5 of each cell, so the
      // exact filtered top-5 sits ~5x deeper in cell-rank order — at
      // this 16-cell geometry the derivation saturates to full probing
      // (= exact over the eligible set; at sf0.001's 500 vectors the
      // old 8/16 constant honestly missed the 70% gate). More probing
      // only adds candidates, so every larger SF stays green.
      recallGate(
        graft.ops.Similarity.bruteForceTopK(
          emb.where(col("label") === 3), q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfProbeFilteredAdaptive(idx, q, "vec_id", "embedding", 5,
          baseProbe = 8, allowed))
    }),

    // ---- V: filtered ANN at ~1/50 selectivity — the regime the r8
    //      constant (12/16) would MISS: ~2% of each cell is eligible,
    //      so the true filtered top-5 can sit in any cell and only the
    //      selectivity-derived depth (which saturates to all 16 cells
    //      here, i.e. exact over the eligible rows) holds the recall
    //      gate at every SF ----
    "v21b_filtered_selective" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val allowed = emb.where(col("vec_id") % 50 === 7).select("vec_id")
      val idx = graft.ops.Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCentroids = 16, kmeansIters = 1, persist = false)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(
          emb.where(col("vec_id") % 50 === 7), q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfProbeFilteredAdaptive(idx, q, "vec_id", "embedding", 5,
          baseProbe = 8, allowed))
    }),

    // ---- V: scalar quantization (SQ8) — the third compression family
    //      next to raw IVF and PQ: one min/max pass, byte-per-dim
    //      codes, asymmetric (full-precision query vs dequantized
    //      corpus) scoring; recall-gated against the exact baseline ----
    "v20_sq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.sqTopK(emb, q, "vec_id", "embedding", 5, bits = 8))
    }),

    // ---- V: the WRITTEN index path — ivfBuild → ivfWrite (cells
    //      bucketed+sorted by cell, centroid array as a table) →
    //      ivfLoad → ivfProbe, with the same recall gate as v3i. This
    //      is the cluster-scale artifact flow: build once, write once,
    //      probe many times from co-located buckets (bucket pruning on
    //      the probed cells, no corpus shuffle). ----
    "v5_ivf_disk_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val idx = graft.ops.Similarity.ivfBuild(
        emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 1, persist = false)
      graft.ops.Similarity.ivfWrite(idx, "graft_v5_index")
      val loaded = graft.ops.Similarity.ivfLoad(s, "graft_v5_index")
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfProbe(loaded, q, "vec_id", "embedding", 5, nProbe = 8))
    }),

    // ---- V: product-quantization ANN (Jégou et al. 2011) — corpus
    //      compressed to m SMALLINT codes + one norm per vector, scored
    //      by ADC (m adds per pair vs dim multiply-adds), exact-refined
    //      over the top `refine` candidates. The SAME recall gate and
    //      oracle as v3i/v5: brute-force count cross-checked by DuckDB,
    //      recall >= 0.7 asserted by the engine. Operating point chosen
    //      by measurement on this (weakly clustered) corpus: m=16 x
    //      ksub=64 with refine=100 gives recall 1.000 at sf0.01 and
    //      0.986 at sf0.1 (tools.CheckV6); the 8x32/refine=50 point
    //      sits at 0.53-0.77 — too close to the gate ----
    "v6_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.pqTopK(emb, q, "vec_id", "embedding", 5,
          m = 16, ksub = 64, iters = 1, refine = 100))
    }),

    // ---- V: the full IVFADC composition — IVF cells PRUNE the pair
    //      count (nProbe/nCentroids of the corpus per query), PQ codes
    //      COMPRESS the scan (m bytes + norm per vector), exact refine
    //      restores precision. Same gate/oracle as v3i/v5/v6.
    //      nProbe=12/16 measures recall 0.948 (sf0.01) / 0.935 (sf0.1)
    //      vs the gate's 0.7 (tools.CheckV6 sweep) ----
    "v7_ivfpq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
          nCentroids = 16, nProbe = 12, m = 16, ksub = 64, iters = 1, refine = 100))
    }),

    // ---- V: the WRITTEN composite index — ivfPqBuild → ivfPqWrite
    //      (encoded cells bucketed+sorted by cell, both codebooks as
    //      self-describing tables) → ivfPqLoad → ivfPqProbe, same gate
    //      as v7. The artifact flow v5 proved for raw IVF, on the
    //      compressed tier: train+encode ONCE at write time, then every
    //      probe reads codes from co-located buckets with NO retraining
    //      and no corpus-side exchange; the exact refine re-rank fetches
    //      its |Q|·refine survivors from the raw table by id ----
    "v8_ivfpq_disk_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = gateQueries(emb)
      val idx = graft.ops.Similarity.ivfPqBuild(
        emb, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
        iters = 1, persist = false)
      graft.ops.Similarity.ivfPqWrite(idx, "graft_v8_index")
      val loaded = graft.ops.Similarity.ivfPqLoad(s, "graft_v8_index")
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfPqProbe(loaded, q, "vec_id", "embedding", 5,
          nProbe = 12, refine = 100, refineWith = Some(emb)))
    }),

    // ---- V: incremental growth of the written raw-vector index —
    //      build+write on HALF the corpus, [[Similarity.ivfAppend]] the
    //      other half against the FROZEN centroids (no retrain), compact
    //      the append-grown bucket files, probe the loaded result
    //      against the whole corpus. The gate is load-bearing in both
    //      columns: a lost append batch fails n_index exactly and drags
    //      recall to ~0.5 (half the true neighbors aren't indexed) ----
    "v13_ivf_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val base = emb.where(col("vec_id") % 2 === 0)
      val grow = emb.where(col("vec_id") % 2 === 1)
      val idx = graft.ops.Similarity.ivfBuild(
        base, "vec_id", "embedding", nCentroids = 16, kmeansIters = 1, persist = false)
      graft.ops.Similarity.ivfWrite(idx, "graft_v13_index")
      graft.ops.Similarity.ivfAppend(s, "graft_v13_index", grow, "vec_id", "embedding")
      graft.sources.Bucketing.compactBucketed(s, "graft_v13_index_cells")
      val loaded = graft.ops.Similarity.ivfLoad(s, "graft_v13_index")
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfProbe(loaded, q, "vec_id", "embedding", 5, nProbe = 8))
        .crossJoin(loaded.cells.agg(count(lit(1)).as("n_index")))
    }),

    // ---- V: incremental growth of the written COMPRESSED index —
    //      same split as v13 through [[Similarity.ivfPqAppend]]: the new
    //      half encodes against the frozen coarse centroids AND frozen
    //      PQ codebooks (one narrow pass over the batch only — never a
    //      re-train, never a corpus re-encode), lands as bucket-spec-
    //      preserving appends, compacts, and probes with exact refine ----
    "v14_ivfpq_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 10 === 0)
      val base = emb.where(col("vec_id") % 2 === 0)
      val grow = emb.where(col("vec_id") % 2 === 1)
      val idx = graft.ops.Similarity.ivfPqBuild(
        base, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
        iters = 1, persist = false)
      graft.ops.Similarity.ivfPqWrite(idx, "graft_v14_index")
      graft.ops.Similarity.ivfPqAppend(s, "graft_v14_index", grow, "vec_id", "embedding")
      graft.sources.Bucketing.compactBucketed(s, "graft_v14_index_cells")
      val loaded = graft.ops.Similarity.ivfPqLoad(s, "graft_v14_index")
      recallGate(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.ivfPqProbe(loaded, q, "vec_id", "embedding", 5,
          nProbe = 12, refine = 100, refineWith = Some(emb)))
        .crossJoin(loaded.cells.agg(count(lit(1)).as("n_index")))
    }),

    // ---- V: fixed-point k-means cluster assignment — the clustering
    //      step under cluster-balanced curation and SemDeDup-style
    //      cell-wise dedup, made first-class: md5-picked seeds, 2 Lloyd
    //      rounds on integer-quantized vectors (order-immune sums, the
    //      g1 recipe applied to geometry), struct-min argmin with exact
    //      tie-breaks. The oracle replays every round bit-for-bit ----
    "v15_kmeans" -> ((s, dir) =>
      graft.ops.Clustering.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)),

    // ---- V: cluster-balanced sampling — k-means cells, then exactly
    //      nPer ids per cell by md5 priority through the bounded-heap
    //      sampler: every semantic region contributes the same count
    //      no matter how over-crawled it is ----
    "v16_cluster_sample" -> ((s, dir) =>
      graft.ops.Clustering.clusterBalancedSample(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, nPer = 10)),

    // ---- V: clustering-quality gate — per-cell separation margins
    //      (dist to 2nd-nearest minus nearest centroid, exact integers):
    //      near-zero-margin cells sit on assignment boundaries and are
    //      the noise a curation pipeline should not stratify on. Same
    //      single broadcast-codegen corpus pass as assignment ----
    "v17_kmeans_margin" -> ((s, dir) =>
      graft.ops.Clustering.marginGate(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)),

    // ---- V: exact DBSCAN over the cosine ε-neighborhood graph —
    //      density clustering with a NOISE class (k-means assigns every
    //      outlier somewhere; curation wants them out). Core/border/
    //      noise with deterministic border ties; clusters = connected
    //      components of the core-core subgraph ----
    "v18_dbscan" -> ((s, dir) =>
      graft.ops.Clustering.dbscan(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, minPts = 5)),

    // ---- V: DBSCAN over the 1% vector slice — the 10× oracle check
    //      for v18's O(n²) ε-graph replay ----
    "v18s_dbscan_slice" -> ((s, dir) =>
      graft.ops.Clustering.dbscan(
        t(s, dir, "embeddings").where(col("vec_id") % 100 === 3),
        "vec_id", "embedding", threshold = 0.3, minPts = 5)),

    // ---- T: fixed-length token windows with overlap (stride <
    //      maxTokens) — the max-seq-len chunking step upstream of t15's
    //      packing ----
    "t18_chunk_windows" -> ((s, dir) =>
      graft.ops.Corpus.chunkTokenWindows(
        t(s, dir, "documents"), "doc_id", "text", maxTokens = 64, stride = 48)),

    // ---- V: semantic dedup (SemDeDup) — embedding-near-dup pairs →
    //      connected components → one survivor (smallest id) per
    //      cluster; rows in no pair survive untouched. Exact pair tier
    //      here (the oracle anchor); scalePath=true is the LSH-mined
    //      100 TB variant with the same survivor contract ----
    "v9_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Corpus.semanticDedup(emb, "vec_id", "embedding", 0.9)
        .select("vec_id")
    }),

    // ---- V: SemDeDup over the 1% vector slice — the 10× oracle check
    //      for v9's within-cluster pairwise replay ----
    "v9s_semantic_dedup_slice" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") % 100 === 3)
      graft.ops.Corpus.semanticDedup(emb, "vec_id", "embedding", 0.9)
        .select("vec_id")
    }),

    // ---- E: gap sessionization ----
    // ---- E: bot-session detection — sessions whose event RATE is
    //      inhumanly high (≥ 5 events, mean inter-event gap under 2
    //      seconds; integer cross-multiplied on epoch µs, no float
    //      rates). The organic synthetic traffic is too sparse to burst,
    //      so bots exist BY CONSTRUCTION: users ≡0 mod 97 get cloned
    //      into the NEGATIVE id range (-user_id - 1: disjoint from any
    //      organic non-negative id space at every scale factor, unlike
    //      a fixed +10^6 offset) with every event squeezed into a
    //      20-second window — those sessions, and only those, flag ----
    "e29_bot_sessions" -> ((s, dir) => {
      val ev = events(s, dir).select("user_id", "event_id", "ts")
      val bots = ev.where(col("user_id") % 97 === 0)
        .select((-col("user_id") - 1L).as("user_id"), col("event_id"),
          expr("timestamp_micros(1704067200000000 + (event_id % 20) * 1000000)").as("ts"))
      graft.ops.Sessions.assign(ev.unionAll(bots), "user_id", "ts", 3600, Seq("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
        .where(col("n_events") >= 5 &&
          col("t1") - col("t0") < (col("n_events") - 1) * lit(2000000L))
        .select(col("user_id"), col("session_seq"), col("n_events"),
          (col("t1") - col("t0")).as("duration_us"))
    }),

    // ---- E: first-order Markov transition matrix over per-user event
    //      sequences — the behavioral fingerprint (bot flows are
    //      near-deterministic rows; organic users spread). ONE window
    //      shuffle on user_id, then a |type|²-row rollup; probability
    //      as floored basis points, a pure integer function of the
    //      event set ----
    "e30_markov_transitions" -> ((s, dir) =>
      graft.ops.Sessions.transitionMatrix(
        events(s, dir), "user_id", "ts", "event_type", Seq("event_id"))),

    // ---- T: langid evaluation — the confusion matrix of predicted vs
    //      labeled language over the corpus (the quality check any
    //      classifier gate ships with) ----
    "t31_langid_confusion" -> ((s, dir) =>
      graft.ops.TextAnalysis.withLangPred(t(s, dir, "documents"), "text")
        .select(col("lang").as("labeled"), col("lang_pred").as("predicted"))
        .groupBy("labeled", "predicted").agg(count(lit(1)).as("n"))),

    // ---- G: bounded Bellman–Ford — weighted shortest path over the
    //      trade graph (edge cost = cheapest lineitem quantity on the
    //      relation), the weighted complement of g3's hop counting.
    //      3 relaxation rounds == min-cost over ≤3-edge paths; the
    //      oracle unrolls the integer rounds exactly ----
    "g6_sssp" -> ((s, dir) => {
      val weighted = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .agg(min(col("l_quantity").cast("long")).as("w"))
      val edges = weighted.select(explode(array(
        struct(col("a").as("s"), col("b").as("d"), col("w")),
        struct(col("b").as("s"), col("a").as("d"), col("w")))).as("e"))
        .select(col("e.s").as("a"), col("e.d").as("b"), col("e.w").as("w"))
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 10 === 0)
        .select((col("s_suppkey").cast("long") * 2 + 1).as("seed"))
      graft.ops.Graph.ssspBellmanFord(edges, "a", "b", "w", seeds, "seed",
        maxRounds = 3)
    }),

    // ---- E: gaps-and-islands — longest consecutive-day activity
    //      streak per user (engagement/habit metric). One user-keyed
    //      exchange shared by the distinct, both windows, and the
    //      aggregates ----
    "e31_streaks" -> ((s, dir) =>
      graft.ops.Sessions.longestStreak(events(s, dir), "user_id", "ts")
        .withColumnRenamed("user", "user_id")),

    // ---- E: per-type daily-volume OLS trend — exact integer
    //      slope numerator/denominator plus a portable floored
    //      micro-slope (BOTH Spark div and DuckDB // truncate; the
    //      positive-mod subtraction makes truncation = floor) ----
    "e32_trend" -> ((s, dir) => {
      val ev = events(s, dir)
      // day index OFFSET FROM THE SERIES START (scalar min via one-row
      // cross join) keeps x small — the olsTrend exactness bound
      val days = ev.select(col("event_type"),
        expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400").as("day"))
      val d0 = days.agg(min(col("day")).as("day0"))
      val daily = days.crossJoin(d0)
        .groupBy(col("event_type"), (col("day") - col("day0")).as("x"))
        .agg(count(lit(1)).as("y"))
      graft.ops.TimeSeries.olsTrend(daily, "event_type", "x", "y")
        .withColumnRenamed("key", "event_type")
    }),

    // ---- E: Theil–Sen robust trend — median of pairwise slopes over
    //      the same daily series as e32; floored micro-unit slopes,
    //      exact histogram-rank median (29.3% breakdown vs OLS's 0) ----
    "e50_theil_sen" -> ((s, dir) => {
      val ev = events(s, dir)
      val days = ev.select(col("event_type"),
        expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400").as("day"))
      val d0 = days.agg(min(col("day")).as("day0"))
      val daily = days.crossJoin(d0)
        .groupBy(col("event_type"), (col("day") - col("day0")).as("x"))
        .agg(count(lit(1)).as("y"))
      graft.ops.TimeSeries.theilSenTrend(daily, "event_type", "x", "y")
        .withColumnRenamed("key", "event_type")
    }),

    // ---- E: day-of-week seasonality profile — the calendar shape per
    //      event_type (portable dow = (epoch_day+4)%7, 0=Sunday) ----
    "e55_dow_profile" -> ((s, dir) =>
      graft.ops.TimeSeries.dayOfWeekProfile(events(s, dir), "event_type", "ts")
        .withColumnRenamed("key", "event_type")),

    // ---- G: co-purchase edge churn — first half (1995-97) vs second
    //      (1998+): how much of the link structure survived? ----
    "g19_edge_churn" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("a"), col("l_suppkey").as("b"),
          col("o_orderdate"))
      graft.ops.Graph.edgeChurn(
        base.where(col("o_orderdate") < "1998-01-01"),
        base.where(col("o_orderdate") >= "1998-01-01"), "a", "b")
    }),

    // ---- E: Mann–Kendall trend significance — the distribution-free
    //      "is e50's slope noise?" test on the same daily series; S and
    //      the tie-corrected 18·Var(S) are pure integers, z via the
    //      shared mkZSql IEEE tree ----
    "e51_mann_kendall" -> ((s, dir) => {
      val ev = events(s, dir)
      val days = ev.select(col("event_type"),
        expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400").as("day"))
      val d0 = days.agg(min(col("day")).as("day0"))
      val daily = days.crossJoin(d0)
        .groupBy(col("event_type"), (col("day") - col("day0")).as("x"))
        .agg(count(lit(1)).as("y"))
      graft.ops.TimeSeries.mannKendall(daily, "event_type", "x", "y")
        .withColumnRenamed("key", "event_type")
    }),

    // ---- E: Mann–Whitney rank-sum A/B — did the parity-split
    //      treatment shift the value DISTRIBUTION per event_type?
    //      (e45's z-test reads conversion; this reads the whole
    //      magnitude distribution, outlier-robust) 2× integer
    //      midranks, tie-corrected variance, shared rankZSql tree ----
    "e52_mann_whitney" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("cents",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .withColumn("treat", pmod(col("user_id"), lit(2)) === 0)
      graft.ops.Stats.mannWhitneyU(ev, "event_type", "treat", "cents")
        .withColumnRenamed("key", "event_type")
    }),

    // ---- X: Spearman rank correlation — monotone co-movement of
    //      quantity vs extended price per return flag; exact 2×
    //      midranks joined back to rows (never a row-level window),
    //      rank moments through the shared corrSql tree ----
    "x50_spearman" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("qty",
          expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"))
        .withColumn("cents",
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      graft.ops.Stats.spearmanCorr(li, "l_returnflag", "qty", "cents")
        .withColumnRenamed("key", "l_returnflag")
    }),

    // ---- D: cross-source duplication matrix — distinct 3-gram
    //      shingle Jaccard/overlap for every source pair, full grid
    //      (a zero-overlap pair surfaces as 0, never vanishes) ----
    "d15_source_overlap" -> ((s, dir) =>
      graft.ops.Corpus.sourceOverlap(t(s, dir, "documents"), "source", "text")),

    // ---- D: per-domain quota cap (the C4 per-domain limit) — at most
    //      20 docs per source, best-first by (n_chars DESC, id ASC);
    //      WindowGroupLimit keeps a bounded heap per group ----
    "d18_domain_cap" -> ((s, dir) =>
      graft.ops.Corpus.capPerGroup(
        t(s, dir, "documents"), "doc_id", "source", "n_chars", 20)),

    // ---- X: PSI per-bin drill-down — WHICH value range drifted (the
    //      x54 stance applied to x39); signed share delta in bp ----
    "x57_psi_bins" -> ((s, dir) =>
      graft.ops.Stats.psiBins(events(s, dir), "event_type", "value",
        expr("unix_micros(ts) div 86400000000 < 19738"), binWidthCents = 2000L)
        .withColumnRenamed("key", "event_type")),

    // ---- D: MinHash band sweep — capacity planning for the LSH
    //      budget; nested-prefix tiers make candidate growth and recall
    //      monotonicity THEOREMS, the full tier must recover the exact
    //      truth set, and only those order-immune gates cross to the
    //      oracle (mid-tier recalls are hash-draw-dependent) ----
    "d16_minhash_sweep" -> ((s, dir) => {
      val rep = graft.ops.Dedup.minhashBandSweep(
        t(s, dir, "documents"), "doc_id", "text", 0.8, 3, 128, Seq(4, 8, 16, 32))
      val w = org.apache.spark.sql.expressions.Window.orderBy("bands")
      rep
        .withColumn("nested_ok",
          (col("n_candidates") >= coalesce(lag("n_candidates", 1).over(w), lit(0L)))
            .cast("int"))
        .withColumn("monotone_ok",
          (col("n_hit") >= coalesce(lag("n_hit", 1).over(w), lit(0L))).cast("int"))
        .agg(count(lit(1)).as("n_tiers"), max(col("n_truth")).as("n_truth"),
          min(col("nested_ok")).as("nested_ok"),
          min(col("monotone_ok")).as("monotone_ok"),
          max(when(col("bands") === 32,
            (col("n_hit") === col("n_truth")).cast("int"))).as("full_recall_ok"))
    }),

    // ---- X: functional-dependency profiler — candidate-key and
    //      denormalization checks as violating-group counts ----
    "x51_fd_check" -> ((s, dir) => {
      val ev = events(s, dir)
      val ord = t(s, dir, "orders")
      graft.ops.DataQuality.fdViolations(ev, Seq("event_id"), "user_id",
          "event_id_determines_user")
        .unionByName(graft.ops.DataQuality.fdViolations(ev, Seq("user_id"),
          "event_type", "user_id_determines_type"))
        .unionByName(graft.ops.DataQuality.fdViolations(ord, Seq("o_custkey"),
          "o_orderstatus", "custkey_determines_status"))
    }),

    // ---- E: index of dispersion — variance-to-mean of daily counts
    //      per event_type over the global calendar span (zero days
    //      count); the one-number burstiness triage before CUSUM ----
    "e53_dispersion" -> ((s, dir) =>
      graft.ops.TimeSeries.dispersionIndex(events(s, dir), "event_type", "ts")
        .withColumnRenamed("key", "event_type")),

    // ---- T: DSIR importance selection — keep the 100 docs whose
    //      hashed-n-gram log-likelihood ratio most favors the TARGET
    //      distribution (the 'en'-labeled slice) over the raw corpus.
    //      The target corpus never moves — only its bucket histogram ----
    "t32_dsir_select" -> ((s, dir) =>
      graft.ops.Classifier.dsirSelect(
        t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 4096, topK = 100)),

    // ---- X: UNPIVOT/melt — the inverse relational transform of x8's
    //      pivot: per-status order metrics melted to (status, metric,
    //      value) rows. Exact DECIMAL cells: a DOUBLE melt of money
    //      would reformat across engines ----
    "x33_unpivot" -> ((s, dir) => {
      val m = t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("decimal(18,2)").as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total_price"),
          max(col("o_totalprice").cast("decimal(18,2)")).as("max_price"))
      // melt in DECIMAL (exact), surface as DOUBLE — the dsum recipe:
      // a decimal cell crosses pandas/parquet as Decimal on one side
      // and float on the other, so the exact value converts ONCE at
      // the boundary
      m.select(col("o_orderstatus"), expr(
        """stack(3, 'n_orders', n_orders, 'total_price', total_price,
                    'max_price', max_price) AS (metric, value)"""))
        .withColumn("value", col("value").cast("double"))
    }),

    // ---- G: Adamic–Adar link prediction over the high-volume trade
    //      subgraph (quantity ≥ 48 keeps it sparse — the guard a real
    //      deployment sets with maxDegree). Predicts NEW pairs from
    //      shared neighbors weighted 1/ln(deg) ----
    "g7_adamic_adar" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_quantity") >= 48)
        .select((col("o_custkey") * 2).as("x"), (col("l_suppkey") * 2 + 1).as("y"))
        .distinct()
      graft.ops.Graph.adamicAdar(pairs, "x", "y", maxDegree = 10000L, topK = 100)
    }),

    // ---- G: HITS over the DIRECTED customer→supplier purchase graph —
    //      buyers are hubs, suppliers authorities (direction is the
    //      point vs g1's undirected PageRank); 2 rounds, L∞-normalized
    //      integer scores the oracle unrolls exactly ----
    "g8_hits" -> ((s, dir) =>
      // customers (even ids) are the sources: buyers are hubs,
      // suppliers authorities — supplyPairs' (a, b) IS (src, dst)
      graft.ops.Graph.hits(supplyPairs(s, dir), "a", "b", iterations = 2)),

    "g8s_hits_slice" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .where(col("o_custkey") % 10 === 3)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.ops.Graph.hits(edges, "src", "dst", iterations = 2)
    }),

    // the 1% centile variant — the 100× gate (see copurchaseCentile)
    "g8s2_hits_centile" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .where(col("o_custkey") % 100 === 37)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.ops.Graph.hits(edges, "src", "dst", iterations = 2)
    }),

    // ---- G: 3-core of the high-volume trade graph (quantity ≥ 45
    //      sparsifies like g7) — simultaneous peeling, 4 bounded rounds
    //      the oracle unrolls; survivors with their in-core degree ----
    "g9_kcore" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_quantity") >= 45)
        .select((col("o_custkey") * 2).as("x"), (col("l_suppkey") * 2 + 1).as("y"))
      graft.ops.Graph.kCore(pairs, "x", "y", k = 3, rounds = 4)
    }),

    "g9s_kcore_slice" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .where(col("o_custkey") % 10 === 3)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_quantity") >= 45)
        .select((col("o_custkey") * 2).as("x"), (col("l_suppkey") * 2 + 1).as("y"))
      graft.ops.Graph.kCore(pairs, "x", "y", k = 3, rounds = 4)
    }),

    // the 1% centile variant — the 100× gate (see copurchaseCentile)
    "g9s2_kcore_centile" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .where(col("o_custkey") % 100 === 37)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_quantity") >= 45)
        .select((col("o_custkey") * 2).as("x"), (col("l_suppkey") * 2 + 1).as("y"))
      graft.ops.Graph.kCore(pairs, "x", "y", k = 3, rounds = 4)
    }),

    // ---- G: item-item collaborative filtering — suppliers co-bought
    //      by the same customer, cosine over co-occurrence counts,
    //      bounded-heap top-5 neighbors per supplier ----
    "g10_itemcf" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("e"), col("l_suppkey").as("i"))
      graft.ops.Graph.itemCf(rel, "e", "i", k = 5, minShared = 2L)
    }),

    // ---- G: ItemCF over the deterministic 10% customer slice — the
    //      10× oracle check for g10's spill-class wedge self-join ----
    "g10s_itemcf_slice" -> ((s, dir) => {
      val rel = t(s, dir, "orders")
        .where(col("o_custkey") % 10 === 3)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("e"), col("l_suppkey").as("i"))
      graft.ops.Graph.itemCf(rel, "e", "i", k = 5, minShared = 2L)
    }),

    // ---- G: association rules — support/confidence/lift for supplier
    //      pairs sharing orders; lift through decimal(38,0) so the
    //      triple product never wraps at warehouse counts ----
    "g16_assoc_rules" -> ((s, dir) =>
      graft.ops.Graph.associationRules(
        t(s, dir, "lineitem")
          .select(col("l_orderkey").as("t"), col("l_suppkey").as("i")),
        "t", "i", minShared = 3L)),

    // ---- E: cohort LTV triangle — first-purchase-week cohorts ×
    //      weeks-since, exact-cent revenue and running cumulative ----
    "e34_cohort_ltv" -> ((s, dir) =>
      graft.ops.Sessions.cohortLtv(
        events(s, dir).where(col("event_type") === "purchase"),
        "user_id", "ts", "value", periodDays = 7)
        .withColumn("age_periods", col("age_periods").cast("long"))),

    // ---- E: seasonal-naive forecast backtest — per event_type daily
    //      revenue forecast by last week's value; exact-cent MAE and
    //      basis-point WMAPE over the overlap ----
    "e38_forecast_backtest" -> ((s, dir) =>
      graft.ops.TimeSeries.seasonalNaiveBacktest(
        events(s, dir), "event_type", "ts", "value", seasonDays = 7)
        .withColumnRenamed("key", "event_type")),

    // ---- E: per-day CUSUM trajectory — the DEPLOYED monitor shape:
    //      targets calibrated on each key's first 14 in-control days,
    //      full (day, C_t, alarm) trajectory out; one cached daily
    //      series feeds calibration and monitoring ----
    "e44_cusum_daily" -> ((s, dir) => {
      val daily = graft.ops.TimeSeries.dailySeries(
        events(s, dir), "event_type", "ts", "value")
      val targets = graft.ops.TimeSeries.referenceTargets(daily, 14, 50)
      graft.ops.TimeSeries.cusumDaily(daily, targets)
        .withColumnRenamed("key", "event_type")
    }),

    // ---- E: Kaplan–Meier survival — the retention curve with
    //      right-censoring (active-on-final-day users leave the risk
    //      set without counting as churn); delta-counted at-risk,
    //      exact cumulative micro-nat log-survival ----
    "e42_kaplan_meier" -> ((s, dir) =>
      graft.ops.Sessions.kaplanMeier(events(s, dir), "user_id", "ts")),

    // ---- E: lag autocorrelation — which season does each event_type's
    //      daily revenue carry? Pearson over aligned (x_t, x_t−L) day
    //      pairs at lags 1/7/14, exact moments + shared IEEE tree ----
    "e41_autocorr" -> ((s, dir) =>
      graft.ops.TimeSeries.autocorrelation(
        events(s, dir), "event_type", "ts", "value", lags = Seq(1, 7, 14))
        .withColumnRenamed("key", "event_type")),

    // ---- E: CUSUM changepoint detection — per event_type daily
    //      revenue level-shift alarms (two windows over one sort replay
    //      the recursion; all-integer floored mean/threshold) ----
    "e39_cusum_changepoint" -> ((s, dir) =>
      graft.ops.TimeSeries.cusumChangepoints(
        events(s, dir), "event_type", "ts", "value", alarmPctOfMean = 50)
        .withColumnRenamed("key", "event_type")),

    // ---- E: recency-weighted user value — dyadic half-life decay
    //      (integer shift-and-floor-divide, no libm pow), 7-day
    //      half-life anchored at max(day) ----
    "e36_decay_score" -> ((s, dir) =>
      graft.ops.TimeSeries.decayScore(
        events(s, dir).where(col("event_type") === "purchase"),
        "user_id", "ts", "value", halfLifeDays = 7)
        .withColumnRenamed("key", "user_id")),

    // ---- E: top user journeys — each user's first 5 events as a
    //      ">"-path, counted, top-20 (row_number bounds every user to 5
    //      rows BEFORE any aggregation) ----
    "e35_top_paths" -> ((s, dir) =>
      graft.ops.Sessions.topPaths(events(s, dir),
        "user_id", "ts", "event_type", "event_id", pathLen = 5, topN = 20)),

    // ---- E: RFM customer segmentation — recency/frequency/monetary
    //      quintile scores against exact-percentile population cuts ----
    "e33_rfm" -> ((s, dir) =>
      graft.ops.Sessions.rfmSegments(
        events(s, dir).where(col("event_type") === "purchase"),
        "user_id", "ts", "value")
        .withColumnRenamed("user", "user_id")),

    // ---- X: HLL audience overlap — |A∩B| by sketch inclusion-
    //      exclusion (viewers vs purchasers), gated against the exact
    //      intersection; only exact counts and gate bits cross to the
    //      oracle (estimates are engine-specific) ----
    "x34_hll_overlap" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.where(col("event_type") === "view").select("user_id")
      val b = ev.where(col("event_type") === "purchase").select("user_id")
      val ska = a.agg(expr("hll_sketch_agg(user_id)").as("ska"),
        countDistinct(col("user_id")).as("d_a"))
      val skb = b.agg(expr("hll_sketch_agg(user_id)").as("skb"),
        countDistinct(col("user_id")).as("d_b"))
      val inter = a.distinct().join(b.distinct(), Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("d_inter"))
      ska.crossJoin(skb).crossJoin(inter)
        .select(col("d_a"), col("d_b"), col("d_inter"),
          (expr("hll_sketch_estimate(ska)") * 100)
            .between(col("d_a") * 95, col("d_a") * 105).cast("int").as("a_ok"),
          (expr("hll_sketch_estimate(skb)") * 100)
            .between(col("d_b") * 95, col("d_b") * 105).cast("int").as("b_ok"),
          (abs(expr("""hll_sketch_estimate(ska) + hll_sketch_estimate(skb)
                       - hll_sketch_estimate(hll_union(ska, skb))""")
            - col("d_inter")) * 100 <= col("d_inter") * 10)
            .cast("int").as("inter_ok"))
    }),

    "e1_sessionize" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.ops.Sessions.assign(ev, "user_id", "ts", 3600, Seq("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
    }),

    // ---- E: tumbling-window aggregation — SHARED column logic with the
    //      streaming path, so the oracle check covers both ----
    "e2_window_hourly" -> ((s, dir) =>
      graft.streaming.EventStreams.windowedAgg(events(s, dir))),

    // ---- E: HOPPING windows — hourly metrics refreshed every 15 min;
    //      each event fans out to the fixed w/s = 4 overlapping
    //      windows in-pipeline (no self-join) ----
    "e21_hopping" -> ((s, dir) =>
      graft.streaming.EventStreams.hoppingAgg(events(s, dir))),

    // ---- E: rolling z-score anomaly flags — trailing-20 baseline per
    //      event_type, integer-cents cross-multiplied test (exact; no
    //      float stddev near the boundary) ----
    "e22_anomaly" -> ((s, dir) =>
      graft.ops.TimeSeries.anomalies(
        events(s, dir), "event_type", "event_id", "ts", "value")
        .select(col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("value"), col("baseline_n"))),

    // ---- E: semi-structured JSON extraction ----
    "e3_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
    }),

    // ---- rollup (hierarchical grouped aggregation; Catalyst-provided
    //      capability beyond the reference's flat groupBy) ----
    "a3_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // ---- approximate distinct (HLL++; engine-specific estimate →
    //      rows-only check) ----
    "x4_approx_distinct" -> ((s, dir) => {
      // HLL++ estimates are engine-specific; the checkable claim is the
      // accuracy contract. Gate at 10% = 2x the estimator's default 5%
      // relative standard deviation — a zero-margin 5% gate would fail
      // on a perfectly healthy estimator at some scale factor
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_exact"),
          (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
            <= countDistinct(col("l_partkey")).cast("double") * 0.10)
            .cast("int").as("hll_within_10pct"))
    }),

    // ---- E7: a REAL Structured Streaming execution under the
    //      driver's oracle — the canonical events parquet read as a
    //      bounded stream (AvailableNow), watermarked tumbling-window
    //      aggregation, result distributed-written per trigger (the
    //      memory sink would hold it driver-side); the oracle is the
    //      same SQL that checks the batch twin (e2) ----
    // ---- D11: WRITTEN band index — the build-once/probe-many artifact
    //      flow for text dedup (v5/v8's disk-index story, d-side):
    //      history's signature+band tables land bucketed via the staged
    //      swap, the probe joins co-located buckets with no history
    //      kernel pass and no corpus-side exchange; same exact-Jaccard
    //      oracle as the in-memory gate ----
    "d11_banded_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.streaming.CorpusStreams.indexHistory(
        docs.where(col("doc_id") < 250), "doc_id", "text", "d11_hist")
      val idx = graft.streaming.CorpusStreams.loadIndex(s, "d11_hist")
      graft.streaming.CorpusStreams.nearDupVsIndex(
        docs.where(col("doc_id") >= 250), idx, "doc_id", "text", 0.8)
    }),

    // ---- E20: STREAMING near-dup gate — docs >= 250 arrive as a file
    //      stream and are checked against the frozen history (< 250)
    //      via the stateless band-join plan (first-agreeing-band dedup,
    //      no streaming state); output = verified cross-corpus pairs,
    //      hash-matched against DuckDB's exact Jaccard join ----
    "e20_stream_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val history = docs.where(col("doc_id") < 250)
      val scratch = java.nio.file.Files.createTempDirectory("graft_e20_stream_").toFile
      org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
      val streamDir = scratch.getAbsolutePath
      docs.where(col("doc_id") >= 250).write.mode("overwrite").parquet(streamDir)
      val streamDocs = s.readStream
        .schema(s.read.parquet(streamDir).schema).parquet(streamDir)
      val out = graft.streaming.CorpusStreams.nearDupVsHistory(
        streamDocs, history, "doc_id", "text", 0.8)
      graft.streaming.EventStreams.runToTable(out, "e20_sink")
      // the runner refreshes inside the micro-batch session; this outer
      // session may hold a stale file listing from a previous run
      s.catalog.refreshTable("e20_sink")
      s.table("e20_sink").select("stream_id", "hist_id", "jaccard")
    }),

    // ---- E: STREAMING OHLC — the candlestick bars as pick aggregates
    //      (min_by/max_by over the (ts, event_id) total order) running
    //      under real watermarked streaming state; the oracle is e24's
    //      row_number formulation restated, so the query PROVES the two
    //      forms agree ----
    "e27_streaming_ohlc" -> ((s, dir) => {
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
        .withWatermark("ts", "1 hour")
      graft.streaming.EventStreams.runToCompleteTable(
        s, graft.streaming.EventStreams.ohlcAgg(stream), "e27_sink")
    }),

    // ---- E46: STREAMING heavy hitters — Misra-Gries state per
    //      event_type over a skew-engineered item stream (the x17
    //      recipe); the oracle gates the order-immune MG guarantees
    //      (every heavy item present, estimates inside the ⌊n/(k+1)⌋
    //      band) against exact batch counts, never the order-dependent
    //      counter values ----
    "e46_stream_heavy_hitters" -> ((s, dir) => {
      val k = 50
      val itemExpr =
        "CAST(IF(user_id % 2 = 0, user_id % 8, 1000000 + user_id div 2) AS BIGINT)"
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
        .select(col("event_type").as("key"), expr(itemExpr).as("item"))
      val snap = graft.streaming.EventStreams.runToMemorySink(s,
        graft.streaming.EventStreams.heavyHittersStream(s, stream, k),
        "e46_sink", org.apache.spark.sql.streaming.OutputMode.Update())
      // re-aliased aggregate side: a memory-sink view self-join keeps
      // identical attribute ids on both sides and fails to resolve
      val maxN = snap.groupBy("key").agg(max("n_total").as("n_total"))
        .toDF("key2", "n_total2")
      val fin = snap.join(maxN,
        col("key") === col("key2") && col("n_total") === col("n_total2"))
        .drop("key2", "n_total2")
      val items = events(s, dir)
        .select(col("event_type").as("key"), expr(itemExpr).as("item"))
      val exact = items.groupBy("key", "item").agg(count(lit(1)).as("cnt"))
      val tot = items.groupBy("key").agg(count(lit(1)).as("n_exact"))
      exact.join(tot, Seq("key"))
        .where(col("cnt") * (k + 1) > col("n_exact"))
        .join(fin.select("key", "item", "est"), Seq("key", "item"), "left")
        .select(col("key"), col("item"), col("cnt"), col("n_exact"),
          col("est").isNotNull.cast("int").as("in_sketch"),
          (col("est").isNotNull && col("est") <= col("cnt") &&
            col("est") + expr(s"n_exact div ${k + 1}") >= col("cnt"))
            .cast("int").as("est_ok"))
    }),

    "e7_streaming_hourly" -> ((s, dir) => {
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
        .withWatermark("ts", "1 hour")
      graft.streaming.EventStreams.runToCompleteTable(
        s, graft.streaming.EventStreams.windowedAgg(stream, "1 hour"),
        "e7_sink")
    }),

    // ---- E9: stream-static enrichment — the events STREAM joins a
    //      static dimension (derived deterministically from event_type:
    //      weight = length, category = first char) per micro-batch,
    //      then rolls up per hour×category; same AvailableNow harness
    //      and complete-table sink as e7/e8, batch-twin oracle ----
    "e9_stream_enrich" -> ((s, dir) => {
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
        .withWatermark("ts", "1 hour")
      val dim = events(s, dir).select("event_type").distinct()
        .select(col("event_type"),
          length(col("event_type")).cast("long").as("weight"),
          substring(col("event_type"), 1, 1).as("category"))
      graft.streaming.EventStreams.runToCompleteTable(
        s, graft.streaming.EventStreams.enrichedWindowedAgg(stream, dim),
        "e9_sink")
    }),

    // ---- E10: interval-overlap join (bucketed range join — the
    //      primitive Spark would otherwise plan as a nested loop):
    //      user sessions [first event, last event] joined to error-burst
    //      incidents (hours with ≥5 errors, as [h, h+1h)); half-open
    //      epoch-micro intervals, 1-hour buckets ----
    "e10_session_incidents" -> ((s, dir) => {
      val ev = events(s, dir)
      val sess = graft.ops.Sessions.assign(ev, "user_id", "ts", 3600, Seq("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(unix_micros(col("ts"))).as("s_start"),
          (max(unix_micros(col("ts"))) + 1L).as("s_end")) // half-open, last event inclusive
      val inc = ev.where(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_errors"))
        .where(col("n_errors") >= 5)
        .select(unix_micros(col("h")).as("i_start"),
          (unix_micros(col("h")) + 3600000000L).as("i_end"), col("n_errors"))
      graft.ops.RangeJoin
        .overlapJoin(sess, "s_start", "s_end", inc, "i_start", "i_end", 3600000000L)
        .select(col("user_id"), col("session_seq"),
          date_format(timestamp_micros(col("i_start")), "yyyy-MM-dd HH:mm:ss")
            .as("incident_hour"),
          col("n_errors"))
    }),

    // ---- E8: streaming session_window sessionization, same harness;
    //      session starts/counts/sums must equal the batch gap-session
    //      oracle (session_window's end = last+gap, so only the start
    //      crosses the engine boundary) ----
    "e8_streaming_sessions" -> ((s, dir) => {
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
        .withWatermark("ts", "1 hour")
      graft.streaming.EventStreams.runToCompleteTable(
        s, graft.streaming.EventStreams.sessionAgg(stream, "1 hour"),
        "e8_sink")
        .select("user_id", "session_start", "n_events", "session_value")
    }),

    // ---- X11: bucketed co-located join — both sides written bucketed
    //      on the key, so the join itself plans with ZERO exchanges
    //      (write-once, join-many; asserted in PlanQualitySpec) ----
    "x11_bucketed_join" -> ((s, dir) => {
      val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey").as("k"), col("o_totalprice")),
        s"bkt_orders$suffix", "k", 8)
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey").as("k"), col("c_mktsegment")),
        s"bkt_customer$suffix", "k", 8)
      graft.sources.Bucketing
        .bucketedJoin(s, s"bkt_orders$suffix", s"bkt_customer$suffix", "k")
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // ---- X12: salted hot-key join — result must equal the plain join
    //      (the salt spreads hot keys across tasks without changing
    //      semantics) ----
    "x12_salted_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      graft.ops.Skew
        .saltedJoinHotKeys(o, c, "c_custkey", hotKeys = Seq(1L, 2L, 3L), buckets = 8)
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // ---- set operations ----
    "x5_setops" -> ((s, dir) => {
      val hi = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("custkey"))
      val urgent = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      hi.intersect(urgent).withColumn("tag", lit("both"))
        .unionByName(hi.except(urgent).withColumn("tag", lit("hi_only")))
    }),

    // ---- E: as-of (point-in-time) join — clicks enriched with the
    //      user's latest signup at-or-before the click ----
    // ---- E: SLIDING windows — hourly length, 15-minute slide: each
    //      event lands in 4 overlapping windows (tumbling is the e2
    //      special case slide == length) ----
    "e13_sliding_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))),

    // ---- E: trailing time-RANGE window per key — each event's running
    //      count/sum over its user's preceding hour (rangeBetween on
    //      event time, not row counts) ----
    "e14_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      events(s, dir)
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .withColumn("sum_trailing_1h",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
          col("n_trailing_1h"), col("sum_trailing_1h"))
    }),

    // ---- E: FORWARD as-of — earliest signup at-or-after each click
    //      (the merge_asof direction="forward" surface) ----
    "e11_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max(col("value")).as("signup_value"))
      graft.ops.AsOfJoin.asOf(clicks, signups, "user_id", "ts", "signup_ts",
          Seq("signup_ts", "signup_value"), direction = "forward")
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
          date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_time"),
          col("signup_value"))
    }),

    // ---- E: NEAREST as-of with a 1-day tolerance — closer of the
    //      backward/forward signup, exact ties backward, matches beyond
    //      the bound nulled (merge_asof direction="nearest", tolerance) ----
    "e12_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max(col("value")).as("signup_value"))
      graft.ops.AsOfJoin.asOf(clicks, signups, "user_id", "ts", "signup_ts",
          Seq("signup_ts", "signup_value"),
          direction = "nearest", tolerance = Some(86400000000L))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
          date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_time"),
          col("signup_value"))
    }),

    // ---- E: ordered conversion funnel view→click→purchase, each later
    //      step within 7 days of the user's FIRST view; the whole
    //      funnel is one user-keyed shuffle (cumulative windows), and
    //      only three count rows ever leave the executors ----
    "e15_funnel" -> ((s, dir) =>
      graft.ops.Sessions.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSeconds = 7L * 86400,
        tieBreak = Seq("event_id"))),

    // ---- E: weekly cohort retention — users cohorted by first-signup
    //      week, distinct-counted per whole-week offset of later
    //      activity; all boundaries are integer µs arithmetic ----
    "e16_retention" -> ((s, dir) =>
      graft.ops.Sessions.retention(events(s, dir), "user_id", "ts", "event_type",
        anchorType = "signup", maxWeeks = 8)),

    "e4_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // one signup row per (user, ts): simultaneous signups (possible
      // after ns->us truncation) would make both the window carry and
      // DuckDB's ASOF pick arbitrarily
      val signups = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max(col("value")).as("signup_value"))
      graft.ops.AsOfJoin.asOf(clicks, signups, "user_id", "ts", "signup_ts",
          Seq("signup_ts", "signup_value"))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
          date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_time"),
          col("signup_value"))
    }),

    // ---- E5: time-bounded stream-stream join, batch twin under the
    //      driver (same clickAttribution plan runs in streaming with
    //      two-sided watermarks; StreamJoinSpec proves equivalence) ----
    // ---- E54: stream-static SCD2 as-of enrichment — each event picks
    //      up the loyalty-tier VERSION valid at its event time, as a
    //      REAL stateless stream (each micro-batch joins the dimension
    //      snapshot); pre-first-purchase events keep NULL ----
    "e54_stream_scd2" -> ((s, dir) => {
      val ev = events(s, dir)
      val vw = Window.partitionBy("key").orderBy(col("eff_from").asc, col("eid").asc)
      val dim = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts").as("eff_from"),
          col("event_id").as("eid"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("tier_cents"))
        .withColumn("version", row_number().over(vw).cast("long"))
        .withColumn("eff_to", lead("eff_from", 1).over(vw))
        .drop("eid")
      val stream = graft.streaming.EventStreams
        .readNsEventStream(s, s"$dir/events.parquet")
      val out = graft.streaming.EventStreams.scd2Enrich(stream, dim)
        .select(col("event_id"), col("version"), col("tier_cents"))
      graft.streaming.EventStreams.runToTable(out, "e54_sink")
      s.catalog.refreshTable("e54_sink")
      s.table("e54_sink")
        .groupBy("version")
        .agg(count(lit(1)).as("n_events"),
          sum(col("tier_cents")).as("sum_tier_cents"))
    }),

    "e5_click_attribution" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.streaming.EventStreams.clickAttribution(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "signup"), "7 days")
        .select(col("click_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
    }),

    // ---- E37: LEFT-OUTER attribution — conversions AND the
    //      did-not-convert rows; the streaming twin's outer rows emit
    //      on watermark expiry (StreamJoinSpec proves equivalence) ----
    "e37_attribution_outer" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.streaming.EventStreams.clickAttributionOuter(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "signup"), "7 days")
        .select(col("click_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"),
          col("attributed"))
    }),

    // ---- E6: dedup-within-watermark, batch twin (earliest arrival
    //      wins). event_id is unique in the source, so duplicates are
    //      injected 10 minutes later — the dedup must drop exactly
    //      those and keep every original row ----
    "e6_dedup_watermark" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "event_type", "ts", "value")
      val dups = ev.where(col("event_id") % 50 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES"))
      graft.streaming.EventStreams.dedupBatchTwin(ev.unionByName(dups))
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"), col("value"))
    }),

    // ---- M: multimodal binary payload + typed metadata ----
    "m1_media_meta" -> ((s, dir) => {
      graft.ops.Multimodal
        .withBinaryPayload(t(s, dir, "documents"), "doc_id", "text")
        .select(
          col("media_id"),
          col("meta.byte_len").cast("long").as("byte_len"),
          col("meta.content_sha256").as("content_sha256"))
    }),

    // ---- M: REAL image decode (javax.imageio) over synthesized PNG
    //      payloads whose color/dims derive from md5(text) — the oracle
    //      recomputes the expected decode results arithmetically from
    //      the same md5, so the whole encode->decode->stats pass is
    //      hash-checked ----
    "m2_media_features" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticPngPayload(t(s, dir, "documents"), "doc_id", "text", 32).toDF()
      // parallelism 0: the payload pass already hash-balanced on
      // media_id — don't shuffle the blobs a second time
      graft.ops.Multimodal.imageStats(media, 0).toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // ---- M: REAL video demux (pure-JVM RIFF/AVI walk) + REAL per-frame
    //      decode over synthesized motion-PNG AVIs whose frame count,
    //      dims, and per-frame colors derive from md5(text) — the oracle
    //      recomputes every decoded frame row arithmetically, so
    //      container parsing, frame chunking, AND pixel decode are all
    //      hash-checked ----
    "m4_video_frames" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticAviPayload(t(s, dir, "documents"), "doc_id", "text", 32).toDF()
      graft.ops.Multimodal.videoFrameStats(media, 0).toDF()
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // ---- M: video keyframe detection — scene changes by consecutive-
    //      frame mean difference over the REAL demux+decode pass: frame
    //      0 always keys; later frames key when the channel-mean L1
    //      diff exceeds the bar. m4's synthetic frames increment means
    //      by (1,2,3)/frame mod 256, so the diff is 6 everywhere except
    //      the wraparound — scene cuts exist by construction and the
    //      oracle replays them arithmetically. The frame-sampling
    //      pattern video training pipelines run before captioning ----
    "m6_video_keyframes" -> ((s, dir) => {
      val media = graft.ops.Multimodal
        .syntheticAviPayload(t(s, dir, "documents"), "doc_id", "text", 32).toDF()
      val f = graft.ops.Multimodal.videoFrameStats(media, 0).toDF()
      val w = Window.partitionBy("media_id").orderBy("frame_idx")
      f.withColumn("pr", lag(col("mean_r"), 1).over(w))
        .withColumn("pg", lag(col("mean_g"), 1).over(w))
        .withColumn("pb", lag(col("mean_b"), 1).over(w))
        .withColumn("d", (abs(col("mean_r") - col("pr")) +
          abs(col("mean_g") - col("pg")) + abs(col("mean_b") - col("pb"))).cast("long"))
        .where(col("pr").isNull || col("d") > 40)
        .select(col("media_id"), col("frame_idx"),
          coalesce(col("d"), lit(-1L)).as("diff_sum"))
    })
  )

  // ===================================================================
  // DuckDB oracles — names/aliases must match the Spark output exactly.
  // Omitted only for the one genuinely engine-specific demo (v3 IVF
  // cell assignment) → driver records a rows-only check there; it is
  // pinned by the green v3i/v5 recall gates.
  // ===================================================================

  /** Recomputes the brute-force top-k count (n_bf) exactly; recall_ok is
    * asserted by the engine side ([[recallGate]]) and pinned to 1 here.
    * Shared by v3i AND v5 — same gate, same oracle.
    */
  private val ivfRecallCtes: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
       s AS (SELECT query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
         FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
       r AS (SELECT query_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         FROM s)"""

  /** x35's oracle, generated from the SAME [[graft.ops.Stats.corrSql]]
    * closed form the engine evaluates — one definition of the IEEE
    * tree, two engines replaying it over identical exact integer
    * moments (decimal(38,0) sums engine-side, HUGEINT sums in DuckDB).
    */
  private def corrMatrixOracle: String = {
    val vs = Seq("q", "p", "d", "t")
    val pairs = for { i <- vs.indices; j <- i + 1 until vs.size } yield (vs(i), vs(j))
    val corrSel = pairs.map { case (a, b) =>
      graft.ops.Stats.corrSql(s"s_${a}_${b}", s"s_$a", s"s_$b",
        s"s_${a}_${a}", s"s_${b}_${b}") + s" AS corr_${a}_${b}"
    }.mkString(",\n           ")
    val prodSums = (for { i <- vs.indices; j <- i until vs.size } yield {
      val (a, b) = (vs(i), vs(j))
      s"SUM(${a}*${b}) AS s_${a}_${b}"
    }).mkString(", ")
    s"""WITH b AS (SELECT
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS q,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS p,
           CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS d,
           CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS t
         FROM lineitem),
         m AS (SELECT COUNT(*) AS n,
           SUM(q) AS s_q, SUM(p) AS s_p, SUM(d) AS s_d, SUM(t) AS s_t,
           $prodSums
         FROM b)
         SELECT CAST(n AS BIGINT) AS n_rows,
           $corrSel
         FROM m"""
  }

  /** g4's 3-round unrolled label propagation in DuckDB — shared by the
    * g4 oracle and g12's modularity score (one definition of the
    * community assignment; a drift between two copies would grade
    * different clusterings).
    */
  // the co-purchase graph CTEs shared by g4/g12 (and, re-sliced, their
  // 10× slice variants — the cp self-join on part is the DuckDB
  // spill-class member of the graph family)
  // cp and e are MATERIALIZED: DuckDB otherwise re-inlines the CTE per
  // consumer, and g12's modularity branches (intra join, degree sums)
  // recompute the quadratic cp self-join several times — measured as
  // the difference between a 23 s g4s oracle and a g12s that exhausts
  // a 46 GB temp budget on the SAME graph
  private def labelPropOracleCtes(cpWhere: String = ""): String =
    s"""WITH cp AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                   FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey $cpWhere),
       e AS MATERIALIZED (SELECT a.c AS s1, b.c AS s2 FROM cp a JOIN cp b
             ON a.p = b.p AND a.c < b.c
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       eb AS (SELECT s1 AS src, s2 AS dst FROM e UNION ALL SELECT s2, s1 FROM e),
       n AS (SELECT DISTINCT src AS node FROM eb),
       l0 AS (SELECT node, CAST(node AS BIGINT) AS label FROM n),
       c1 AS (SELECT eb.dst AS node, l.label, COUNT(*) AS c
              FROM eb JOIN l0 l ON eb.src = l.node GROUP BY 1, 2),
       w1 AS (SELECT node, label FROM (SELECT node, label,
                ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
              FROM c1) WHERE rn = 1),
       l1 AS (SELECT n.node, COALESCE(w.label, CAST(n.node AS BIGINT)) AS label
              FROM n LEFT JOIN w1 w USING (node)),
       c2 AS (SELECT eb.dst AS node, l.label, COUNT(*) AS c
              FROM eb JOIN l1 l ON eb.src = l.node GROUP BY 1, 2),
       w2 AS (SELECT node, label FROM (SELECT node, label,
                ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
              FROM c2) WHERE rn = 1),
       l2 AS (SELECT n.node, COALESCE(w.label, CAST(n.node AS BIGINT)) AS label
              FROM n LEFT JOIN w2 w USING (node)),
       c3 AS (SELECT eb.dst AS node, l.label, COUNT(*) AS c
              FROM eb JOIN l2 l ON eb.src = l.node GROUP BY 1, 2),
       w3 AS (SELECT node, label FROM (SELECT node, label,
                ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
              FROM c3) WHERE rn = 1),
       l3 AS (SELECT n.node, COALESCE(w.label, CAST(n.node AS BIGINT)) AS label
              FROM n LEFT JOIN w3 w USING (node))"""

  /** The t22 hashed-classifier score replayed in DuckDB — shared by the
    * t22 oracle and t33's calibration sweep (one definition, the
    * corrSql discipline applied to the feature path).
    */
  private val classifierScoreCtes: String =
    """WITH wt AS (SELECT i AS bucket, (i * 2654435761) % 2001 - 1000 AS weight_fp
                   FROM range(4096) t(i)),
       d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
       f AS (SELECT doc_id,
               unnest(w || list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
             FROM d WHERE len(w) >= 1),
       b AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket FROM f),
       sc AS (SELECT doc_id, COUNT(*) AS n_features, CAST(SUM(weight_fp) AS BIGINT) AS score_fp
              FROM b JOIN wt USING (bucket) GROUP BY doc_id)"""

  /** v22's oracle: the v15 quantization replayed (ROUND(x·1000) per
    * dimension), floored integer centroid means via `//`, exact
    * HUGEINT moment sums, and the shared cosine tree
    * ([[graft.ops.Stats.cosineOfMomentsSql]]).
    */
  /** The t2 marker-count langid scoring replayed over a DuckDB token
    * list — emitted by the t41 oracle for both the doc and chunk grains
    * (same five-marker sums, same en/es/fr/de tie order as
    * [[graft.ops.TextAnalysis.langId]]).
    */
  private def langScoresSql(arr: String): String = {
    def cnt(words: Seq[String]) =
      words.map(m => s"len(list_filter($arr, x -> x = '$m'))").mkString(" + ")
    s"""${cnt(Seq("the", "and", "of", "to", "a"))} AS s_en,
       ${cnt(Seq("el", "la", "de", "que", "los"))} AS s_es,
       ${cnt(Seq("le", "les", "des", "et", "une"))} AS s_fr,
       ${cnt(Seq("der", "die", "und", "das", "ein"))} AS s_de"""
  }

  private val langVerdictSql: String =
    """CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
         WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
         WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
         WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
         WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
         ELSE 'und' END"""

  private def embeddingDriftOracle: String = {
    val cos = graft.ops.Stats.cosineOfMomentsSql("dot", "nc", "ng")
    s"""WITH q AS (SELECT label,
                     unnest(range(1, len(embedding)+1)) AS pos,
                     CAST(unnest(list_transform(embedding,
                       x -> ROUND(x::DOUBLE * 1000))) AS BIGINT) AS q
                   FROM embeddings WHERE embedding IS NOT NULL),
        sn AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings
               WHERE embedding IS NOT NULL GROUP BY 1),
        ss AS (SELECT label, pos, CAST(SUM(q) AS BIGINT) AS s
               FROM q GROUP BY 1, 2),
        gsums AS (SELECT pos, CAST(SUM(s) AS BIGINT) AS gs FROM ss GROUP BY 1),
        gcnt AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS gn FROM sn),
        c AS (SELECT ss.label, ss.pos,
                (s - ((s % n_vecs + n_vecs) % n_vecs)) // n_vecs AS c
              FROM ss JOIN sn USING (label)),
        g AS (SELECT pos, (gs - ((gs % gn + gn) % gn)) // gn AS g
              FROM gsums, gcnt),
        m AS (SELECT c.label,
                CAST(SUM(c.c * g.g) AS BIGINT) AS dot,
                CAST(SUM(c.c * c.c) AS BIGINT) AS nc,
                CAST(SUM(g.g * g.g) AS BIGINT) AS ng,
                CAST(SUM((c.c - g.g) * (c.c - g.g)) AS BIGINT) AS l2_sq
              FROM c JOIN g USING (pos) GROUP BY 1)
        SELECT m.label, CAST(sn.n_vecs AS BIGINT) AS n_vecs, m.l2_sq,
          $cos AS cosine_to_global
        FROM m JOIN sn USING (label)"""
  }

  /** e42's oracle: user first/last days, delta-counted at-risk over the
    * calendar, censoring at max_day, and the shared KM factor tree.
    */
  private def kaplanMeierOracle: String = {
    val factor = graft.ops.Sessions.kmFactorSql("n_churned", "n_at_risk")
    s"""WITH e AS (SELECT user_id AS u,
                     epoch_us(ts::TIMESTAMP) // 86400000000 AS day
                   FROM events),
        ud AS (SELECT u, MIN(day) AS first_day, MAX(day) AS last_day
               FROM e GROUP BY 1),
        sp AS (SELECT MIN(first_day) AS min_day, MAX(last_day) AS max_day
               FROM ud),
        dl AS (SELECT first_day AS day, CAST(1 AS BIGINT) AS delta FROM ud
               UNION ALL SELECT last_day + 1, CAST(-1 AS BIGINT) FROM ud),
        dd AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS delta
               FROM dl GROUP BY 1),
        ch AS (SELECT last_day AS day, COUNT(*) AS n_churned FROM ud, sp
               WHERE last_day < max_day GROUP BY 1),
        cal AS (SELECT unnest(range(min_day, max_day + 1)) AS day FROM sp),
        r AS (SELECT cal.day, COALESCE(dd.delta, 0) AS delta,
                CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
              FROM cal LEFT JOIN dd USING (day) LEFT JOIN ch USING (day)),
        s AS (SELECT day, n_churned,
                CAST(SUM(delta) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
              FROM r),
        f AS (SELECT day, n_at_risk, n_churned, $factor AS factor_fp,
                MAX(CASE WHEN n_churned >= n_at_risk AND n_churned > 0
                  THEN 1 ELSE 0 END) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS extinct
              FROM s)
        SELECT day, n_at_risk, n_churned, factor_fp,
          CASE WHEN extinct = 1 THEN NULL
            ELSE CAST(SUM(factor_fp) OVER (ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) END AS surv_lognat_fp
        FROM f"""
  }

  /** e41's oracle: the daily-series CTE, the lag-aligned self-join at
    * the same lags, HUGEINT moments, and the shared Pearson tree.
    */
  private def autocorrOracle: String = {
    val corr = graft.ops.Stats.corrSql("s_xy", "s_x", "s_y", "s_xx", "s_yy")
    s"""WITH e AS (SELECT event_type,
                     epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                   FROM events),
        d AS (SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS a
              FROM e GROUP BY 1, 2),
        lags AS (SELECT CAST(unnest([1, 7, 14]) AS BIGINT) AS lag),
        p AS (SELECT d.event_type, l.lag,
                CAST(d.a AS HUGEINT) AS x, CAST(f.a AS HUGEINT) AS y
              FROM d CROSS JOIN lags l
              JOIN d f ON f.event_type = d.event_type
                AND d.day = f.day + l.lag),
        m AS (SELECT event_type, lag, COUNT(*) AS n,
                SUM(x) AS s_x, SUM(y) AS s_y, SUM(x*x) AS s_xx,
                SUM(x*y) AS s_xy, SUM(y*y) AS s_yy
              FROM p GROUP BY 1, 2)
        SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
          $corr AS acf
        FROM m"""
  }

  /** g11's oracle: rebuild the g2 co-purchase edges, symmetrize, take
    * degree moments in HUGEINT, and evaluate the IDENTICAL closed-form
    * Pearson tree ([[graft.ops.Stats.corrSql]]) the engine evaluates —
    * the x35 determinism contract applied to graph structure.
    */
  /** g8's two unrolled HITS rounds over the bipartite trade graph (the
    * slice variant bounds the edge relation — DuckDB materializes the
    * whole unrolled chain at 10× and exhausts its temp budget).
    */
  private def hitsOracle(pWhere: String): String =
    s"""WITH p AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey $pWhere),
       n AS (SELECT src AS node FROM p UNION SELECT dst FROM p),
       h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_fp FROM n),
       a1r AS (SELECT dst AS node, SUM(hub_fp) AS m
               FROM p JOIN h0 ON p.src = h0.node GROUP BY dst),
       a1 AS (SELECT n.node, COALESCE(a1r.m, 0) * 1000000
                // GREATEST((SELECT COALESCE(MAX(m), 1) FROM a1r), 1) AS auth_fp
              FROM n LEFT JOIN a1r USING (node)),
       h1r AS (SELECT src AS node, SUM(auth_fp) AS m
               FROM p JOIN a1 ON p.dst = a1.node GROUP BY src),
       h1 AS (SELECT n.node, COALESCE(h1r.m, 0) * 1000000
                // GREATEST((SELECT COALESCE(MAX(m), 1) FROM h1r), 1) AS hub_fp
              FROM n LEFT JOIN h1r USING (node)),
       a2r AS (SELECT dst AS node, SUM(hub_fp) AS m
               FROM p JOIN h1 ON p.src = h1.node GROUP BY dst),
       a2 AS (SELECT n.node, COALESCE(a2r.m, 0) * 1000000
                // GREATEST((SELECT COALESCE(MAX(m), 1) FROM a2r), 1) AS auth_fp
              FROM n LEFT JOIN a2r USING (node)),
       h2r AS (SELECT src AS node, SUM(auth_fp) AS m
               FROM p JOIN a2 ON p.dst = a2.node GROUP BY src),
       h2 AS (SELECT n.node, COALESCE(h2r.m, 0) * 1000000
                // GREATEST((SELECT COALESCE(MAX(m), 1) FROM h2r), 1) AS hub_fp
              FROM n LEFT JOIN h2r USING (node))
       SELECT CAST(h2.node AS BIGINT) AS node, CAST(h2.hub_fp AS BIGINT) AS hub_fp,
         CAST(a2.auth_fp AS BIGINT) AS auth_fp
       FROM h2 JOIN a2 USING (node)"""

  /** g9's unrolled 3-core peeling (the slice variant bounds the edge
    * relation the same way — note the predicate composes with the
    * existing l_quantity filter, hence the AND form).
    */
  private def kcoreOracle(pAnd: String): String =
    s"""WITH p AS (SELECT o_custkey * 2 AS x, l_suppkey * 2 + 1 AS y
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                  WHERE l_quantity >= 45 $pAnd),
       e0 AS MATERIALIZED (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM p),
       k1 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
              GROUP BY node HAVING COUNT(*) >= 3),
       e1 AS MATERIALIZED (SELECT a, b FROM e0 WHERE a IN (SELECT node FROM k1)
                AND b IN (SELECT node FROM k1)),
       k2 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1)
              GROUP BY node HAVING COUNT(*) >= 3),
       e2 AS MATERIALIZED (SELECT a, b FROM e1 WHERE a IN (SELECT node FROM k2)
                AND b IN (SELECT node FROM k2)),
       k3 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
              GROUP BY node HAVING COUNT(*) >= 3),
       e3 AS MATERIALIZED (SELECT a, b FROM e2 WHERE a IN (SELECT node FROM k3)
                AND b IN (SELECT node FROM k3)),
       k4 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
              GROUP BY node HAVING COUNT(*) >= 3),
       e4 AS MATERIALIZED (SELECT a, b FROM e3 WHERE a IN (SELECT node FROM k4)
                AND b IN (SELECT node FROM k4))
       SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
       FROM (SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
       GROUP BY node"""

  /** g2's per-node triangle counts over the co-purchase graph (the
    * slice variant passes the same cp predicate).
    */
  private def trianglesOracle(cpWhere: String = ""): String =
    s"""WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                   FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey $cpWhere),
       e AS (SELECT a.c AS s1, b.c AS s2 FROM cp a JOIN cp b
             ON a.p = b.p AND a.c < b.c
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
               FROM e e1
               JOIN e e2 ON e1.s1 = e2.s1 AND e1.s2 < e2.s2
               JOIN e e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2),
       n AS (SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri)
       SELECT node, COUNT(*) AS n_triangles FROM n GROUP BY node"""

  /** g14's per-node triangle/coefficient oracle over the co-purchase
    * graph (the slice variant passes the same cp predicate).
    */
  private def clusteringCoeffOracle(cpWhere: String = ""): String =
    s"""WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                   FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey $cpWhere),
       e AS (SELECT a.c AS s1, b.c AS s2 FROM cp a JOIN cp b
             ON a.p = b.p AND a.c < b.c
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
               FROM e e1
               JOIN e e2 ON e1.s1 = e2.s1 AND e1.s2 < e2.s2
               JOIN e e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2),
       tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
              FROM (SELECT a AS node FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri) GROUP BY 1),
       sym AS (SELECT s1 AS node FROM e UNION ALL SELECT s2 FROM e),
       deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
               FROM sym GROUP BY 1)
       SELECT d.node, d.deg, COALESCE(tn.n_triangles, 0) AS n_triangles,
         CAST((20000 * CAST(COALESCE(tn.n_triangles, 0) AS HUGEINT))
           // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT) AS coeff_bp
       FROM deg d LEFT JOIN tn USING (node) WHERE d.deg >= 2"""

  /** g12's Newman-Q oracle over the shared label-prop CTEs (the slice
    * variant passes the same cp predicate).
    */
  private def modularityOracle(cpWhere: String = ""): String =
    labelPropOracleCtes(cpWhere) + """,
         comm AS (SELECT node, label AS community FROM l3),
         mm AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM e),
         intra AS (SELECT CAST(COUNT(*) AS HUGEINT) AS intra FROM e
                   JOIN comm ca ON e.s1 = ca.node
                   JOIN comm cb ON e.s2 = cb.node
                   WHERE ca.community = cb.community),
         deg AS (SELECT src AS node, COUNT(*) AS deg FROM eb GROUP BY 1),
         dc AS (SELECT c.community, CAST(SUM(d.deg) AS HUGEINT) AS dsum
                FROM deg d JOIN comm c USING (node) GROUP BY 1),
         ag AS (SELECT COUNT(*) AS n_communities,
                  CAST(SUM(dsum * dsum) AS HUGEINT) AS deg_sq FROM dc),
         fin AS (SELECT ag.n_communities, mm.m, intra.intra, ag.deg_sq,
                   CAST(1000000 AS HUGEINT) * (4 * mm.m * intra.intra - ag.deg_sq) AS num,
                   CAST(4 AS HUGEINT) * mm.m * mm.m AS den
                 FROM mm, intra, ag)
         SELECT CAST(n_communities AS BIGINT) AS n_communities,
           CAST(m AS BIGINT) AS m_edges,
           CAST(intra AS BIGINT) AS intra_edges,
           CAST(deg_sq AS BIGINT) AS deg_sq_sum,
           CASE WHEN m = 0 THEN NULL
             ELSE CAST((num - ((num % den + den) % den)) // den AS BIGINT)
             END AS modularity_micro
         FROM fin"""

  private def assortativityOracle(cpWhere: String = ""): String = {
    val corr = graft.ops.Stats.corrSql(
      "s_dx_dy", "s_dx", "s_dy", "s_dx_dx", "s_dy_dy")
    s"""WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey $cpWhere),
        e AS (SELECT a.c AS s1, b.c AS s2 FROM cp a JOIN cp b
              ON a.p = b.p AND a.c < b.c
              GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        sym AS (SELECT s1 AS x, s2 AS y FROM e
                UNION ALL SELECT s2 AS x, s1 AS y FROM e),
        deg AS (SELECT x AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
        pr AS (SELECT CAST(dx.deg AS HUGEINT) AS dx,
                 CAST(dy.deg AS HUGEINT) AS dy
               FROM sym JOIN deg dx ON sym.x = dx.node
                        JOIN deg dy ON sym.y = dy.node),
        m AS (SELECT COUNT(*) AS n, SUM(dx) AS s_dx, SUM(dy) AS s_dy,
                SUM(dx*dx) AS s_dx_dx, SUM(dx*dy) AS s_dx_dy,
                SUM(dy*dy) AS s_dy_dy
              FROM pr),
        shape AS (SELECT COUNT(*) AS n_nodes, MAX(deg) AS max_degree FROM deg)
        SELECT CAST(shape.n_nodes AS BIGINT) AS n_nodes,
          CAST(m.n // 2 AS BIGINT) AS n_edges,
          CAST(m.n AS BIGINT) AS n_endpoints,
          CAST(shape.max_degree AS BIGINT) AS max_degree,
          $corr AS assortativity
        FROM m, shape"""
  }

  private val ivfRecallOracle: String =
    ivfRecallCtes +
      "\n       SELECT COUNT(*) AS n_bf, CAST(1 AS INT) AS recall_ok FROM r WHERE rank <= 5"

  /** d16's oracle parameterized on the document source — `docsSrc` is a
    * table name or parenthesized subquery aliased `documents`; the
    * slice variant (d16s) injects a deterministic doc_id filter so the
    * capacity report stays oracle-checkable at 10× (the full-corpus
    * truth CTE is the documented ~77 GB DuckDB spill case).
    */
  /** The d4c/d2c dense-corpus fixture as a DuckDB relation — the 10%
    * doc slice replicated 4× with ids doc_id*4+r, mirroring
    * [[denseDocs]] bit for bit (range(4) yields 0..3 like
    * sequence(0,3)).
    */
  private val denseDocsSql: String =
    """(SELECT d.doc_id * 4 + t.range AS doc_id, d.text
        FROM documents d CROSS JOIN range(4) t
        WHERE d.doc_id % 10 = 3)"""

  /** d4's exact n-gram Jaccard pair oracle, parameterized over the
    * documents relation: the d4c/d2c dense gates reuse it verbatim —
    * jaccard of identical texts is 1 by identity, so the direct
    * quadratic SQL is also the exact-copy collapse tier's contract, and
    * (by the LSH==exact contract) minhashNearDup's.
    */
  private def d4Oracle(docsSrc: String): String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                  FROM $docsSrc AS docsrc),
       sh AS (SELECT doc_id,
                CASE WHEN len(w) >= 3 THEN
                  list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
              FROM d),
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       sz AS (SELECT doc_id, len(s) AS n FROM sh),
       inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                 FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id)
       SELECT id_a, id_b, ROUND(i / (na.n + nb.n - i), 6) AS jaccard
       FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       WHERE i / (na.n + nb.n - i) >= 0.8"""

  /** d6's cluster oracle (d4's exact-pair CTEs + a recursive transitive
    * closure), parameterized over the documents relation so the d6c
    * dense gate replays it over the replicated slice. AS MATERIALIZED
    * on the pair CTE: DuckDB re-inlines CTEs per consumer (the g12
    * lesson) and `e` consumes `p` twice.
    */
  private def d6Oracle(docsSrc: String): String =
    s"""WITH RECURSIVE d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                    FROM $docsSrc AS docsrc),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         sz AS (SELECT doc_id, len(s) AS n FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY x.doc_id, y.doc_id),
         p AS MATERIALIZED (SELECT id_a, id_b
               FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
               WHERE i / (na.n + nb.n - i) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
         SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         FROM reach GROUP BY src"""

  private def d16Oracle(docsSrc: String): String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                  FROM $docsSrc AS docsrc),
       sh AS (SELECT doc_id,
                CASE WHEN len(w) >= 3 THEN
                  list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
              FROM d),
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       sz AS (SELECT doc_id, len(s) AS n FROM sh),
       inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                 FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
       tr AS (SELECT COUNT(*) AS n_truth
              FROM inter JOIN sz na ON id_a = na.doc_id
                         JOIN sz nb ON id_b = nb.doc_id
              WHERE i / (na.n + nb.n - i) >= 0.8)
       SELECT CAST(4 AS BIGINT) AS n_tiers, CAST(n_truth AS BIGINT) AS n_truth,
         1 AS nested_ok, 1 AS monotone_ok, 1 AS full_recall_ok
       FROM tr"""

  /** d17's oracle parameterized the same way (both `FROM documents`
    * sites take the source).
    */
  private def d17Oracle(docsSrc: String): String =
    s"""WITH RECURSIVE d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                  FROM $docsSrc AS docsrc),
       sh AS (SELECT doc_id,
                CASE WHEN len(w) >= 3 THEN
                  list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
              FROM d),
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       sz AS (SELECT doc_id, len(s) AS n FROM sh),
       inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                 FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
       pr AS (SELECT id_a, id_b
             FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
             WHERE i / (na.n + nb.n - i) >= 0.8),
       e AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
       reach(src, dst) AS (
         SELECT src, dst FROM e
         UNION
         SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       lab AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
               FROM reach GROUP BY src),
       al AS (SELECT d0.doc_id, COALESCE(lab.cluster, d0.doc_id) AS cluster,
                d0.n_chars AS score
              FROM $docsSrc d0 LEFT JOIN lab USING (doc_id)),
       r AS (SELECT doc_id, cluster, score,
               COUNT(*) OVER (PARTITION BY cluster) AS n_members,
               ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY score DESC, doc_id ASC) AS rn
             FROM al)
       SELECT doc_id, cluster, CAST(n_members AS BIGINT) AS n_members,
         CAST(score AS BIGINT) AS score
       FROM r WHERE rn = 1"""

  /** v9's SemDeDup replay, parameterized on a corpus slice (the 10x
    * slice gate; same scheme as dbscanOracle).
    */
  private def semdedupOracle(where: String): String = {
    val base =
      """WITH RECURSIVE e0 AS (SELECT vec_id, embedding FROM embeddings),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) >= 0.9),
         e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         cl AS (SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
                FROM reach GROUP BY src)
         SELECT vec_id FROM embeddings
         WHERE vec_id NOT IN (SELECT vec_id FROM cl WHERE vec_id <> cluster_id)"""
    if (where.isEmpty) base
    else base.replace("FROM embeddings", s"FROM (SELECT * FROM embeddings $where)")
  }

  /** v18's exact DBSCAN replay, parameterized on a corpus slice (the
    * slice gate bounds the O(n^2) eps-graph distance join at 10x).
    */
  private def dbscanOracle(where: String): String = {
    val base =
      """WITH RECURSIVE p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) >= 0.3),
         sym AS (SELECT id_a AS id, id_b AS nb FROM p UNION ALL SELECT id_b, id_a FROM p),
         cnt AS (SELECT id, COUNT(*) AS n FROM sym GROUP BY id),
         core AS (SELECT id FROM cnt WHERE n + 1 >= 5),
         cp AS (SELECT id_a, id_b FROM p
                WHERE id_a IN (SELECT id FROM core) AND id_b IN (SELECT id FROM core)),
         ce AS (SELECT id_a AS src, id_b AS dst FROM cp UNION SELECT id_b, id_a FROM cp),
         reach(src, dst) AS (SELECT src, dst FROM ce
           UNION SELECT r.src, ce.dst FROM reach r JOIN ce ON r.dst = ce.src),
         cl AS (SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src),
         corelab AS (SELECT c.id, COALESCE(cl.cluster_id, c.id) AS cluster_id
                     FROM core c LEFT JOIN cl ON c.id = cl.id),
         border AS (SELECT s.id, MIN(k.cluster_id) AS cluster_id
                    FROM sym s JOIN corelab k ON s.nb = k.id
                    WHERE s.id NOT IN (SELECT id FROM core) GROUP BY s.id)
         SELECT e.vec_id,
           CASE WHEN c.id IS NOT NULL THEN 'core'
                WHEN b.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
           COALESCE(c.cluster_id, b.cluster_id) AS cluster_id
         FROM embeddings e LEFT JOIN corelab c ON e.vec_id = c.id
         LEFT JOIN border b ON e.vec_id = b.id"""
    if (where.isEmpty) base
    else base
      .replace("WITH RECURSIVE p AS",
        s"WITH RECURSIVE embx AS (SELECT * FROM embeddings $where), p AS")
      .replace("embeddings a JOIN embeddings b", "embx a JOIN embx b")
      .replace("FROM embeddings e LEFT JOIN", "FROM embx e LEFT JOIN")
  }

  /** v10's greedy-MMR replay, parameterized on the query-slice
    * modulus: the replay's brute-force query-corpus cross is the 10x
    * spill class with the full (mod 10) query set, so the slice gate
    * (mod 1000, ~1%% of vectors) keeps the selection replay exact and
    * affordable above sf0.1.
    */
  private def mmrOracle(mod: Int): String =
    mmrOracleBase.replace("vec_id % 10 = 0", s"vec_id % $mod = 0")

  /** [[mmrOracle]] with the CORPUS side also sliced (the 100× gate —
    * see the v10s2 queries entry). */
  private def mmrOracleSliced(qMod: Int, cMod: Int): String =
    mmrOracle(qMod).replace(
      "FROM embeddings c",
      s"FROM (SELECT * FROM embeddings WHERE vec_id % $cMod = 0) c")

  /** The string-keyed brute-force top-k replay (v1s / v1s2): queries
    * from the mod-`qMod` subset, corpus optionally mod-`cMod` sliced.
    */
  private def v1sOracle(qMod: Int, cMod: Option[Int]): String = {
    val corpus = cMod
      .map(m => s"(SELECT * FROM embeddings WHERE vec_id % $m = 0)")
      .getOrElse("embeddings")
    s"""WITH q AS (SELECT 'doc-' || CAST(vec_id AS VARCHAR) AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % $qMod = 0),
         s AS (SELECT query_id, 'doc-' || CAST(c.vec_id AS VARCHAR) AS neighbor_id,
           list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM $corpus c CROSS JOIN q
           WHERE 'doc-' || CAST(c.vec_id AS VARCHAR) <> query_id),
         r AS (SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
           FROM s)
         SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
         FROM r WHERE rank <= 5"""
  }

  private val mmrOracleBase: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id, c.embedding AS vec,
             list_sum(list_transform(range(1, len(qe)+1), x -> qe[x]::DOUBLE * c.embedding[x]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(qe)+1), x -> qe[x]::DOUBLE * qe[x]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), x -> c.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         cand AS MATERIALIZED (SELECT query_id, neighbor_id, ROUND(cos, 6) AS rel, vec FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
             FROM sc) WHERE rn <= 15),
         pair AS MATERIALIZED (SELECT a.query_id, a.neighbor_id AS ci, b.neighbor_id AS cj,
             list_sum(list_transform(range(1, len(a.vec)+1), x -> a.vec[x]::DOUBLE * b.vec[x]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(a.vec)+1), x -> a.vec[x]::DOUBLE * a.vec[x]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(b.vec)+1), x -> b.vec[x]::DOUBLE * b.vec[x]::DOUBLE)))) AS sim
           FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
         sel1 AS MATERIALIZED (SELECT query_id, neighbor_id, rel AS mmr, 1 AS round FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id ASC) AS rn
             FROM cand) WHERE rn = 1),
         sims2 AS (SELECT c.query_id, c.neighbor_id,
             ROUND((7000*c.rel - 3000*MAX(p.sim)) / 10000.0, 6) AS mmr
           FROM cand c JOIN sel1 s ON s.query_id = c.query_id
             JOIN pair p ON p.query_id = c.query_id AND p.ci = c.neighbor_id AND p.cj = s.neighbor_id
           WHERE NOT EXISTS (SELECT 1 FROM sel1 x WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
           GROUP BY c.query_id, c.neighbor_id, c.rel),
         pick2 AS (SELECT query_id, neighbor_id, mmr, 2 AS round FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC) AS rn
             FROM sims2) WHERE rn = 1),
         sel2 AS MATERIALIZED (SELECT * FROM sel1 UNION ALL SELECT * FROM pick2),
         sims3 AS (SELECT c.query_id, c.neighbor_id,
             ROUND((7000*c.rel - 3000*MAX(p.sim)) / 10000.0, 6) AS mmr
           FROM cand c JOIN sel2 s ON s.query_id = c.query_id
             JOIN pair p ON p.query_id = c.query_id AND p.ci = c.neighbor_id AND p.cj = s.neighbor_id
           WHERE NOT EXISTS (SELECT 1 FROM sel2 x WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
           GROUP BY c.query_id, c.neighbor_id, c.rel),
         pick3 AS (SELECT query_id, neighbor_id, mmr, 3 AS round FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC) AS rn
             FROM sims3) WHERE rn = 1),
         sel3 AS MATERIALIZED (SELECT * FROM sel2 UNION ALL SELECT * FROM pick3),
         sims4 AS (SELECT c.query_id, c.neighbor_id,
             ROUND((7000*c.rel - 3000*MAX(p.sim)) / 10000.0, 6) AS mmr
           FROM cand c JOIN sel3 s ON s.query_id = c.query_id
             JOIN pair p ON p.query_id = c.query_id AND p.ci = c.neighbor_id AND p.cj = s.neighbor_id
           WHERE NOT EXISTS (SELECT 1 FROM sel3 x WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
           GROUP BY c.query_id, c.neighbor_id, c.rel),
         pick4 AS (SELECT query_id, neighbor_id, mmr, 4 AS round FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC) AS rn
             FROM sims4) WHERE rn = 1),
         sel4 AS MATERIALIZED (SELECT * FROM sel3 UNION ALL SELECT * FROM pick4),
         sims5 AS (SELECT c.query_id, c.neighbor_id,
             ROUND((7000*c.rel - 3000*MAX(p.sim)) / 10000.0, 6) AS mmr
           FROM cand c JOIN sel4 s ON s.query_id = c.query_id
             JOIN pair p ON p.query_id = c.query_id AND p.ci = c.neighbor_id AND p.cj = s.neighbor_id
           WHERE NOT EXISTS (SELECT 1 FROM sel4 x WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
           GROUP BY c.query_id, c.neighbor_id, c.rel),
         pick5 AS (SELECT query_id, neighbor_id, mmr, 5 AS round FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC) AS rn
             FROM sims5) WHERE rn = 1),
         sel5 AS (SELECT * FROM sel4 UNION ALL SELECT * FROM pick5)
         SELECT query_id, neighbor_id, round, mmr FROM sel5"""

  /** d13's oracle with an optional predicate on the augmented-doc side
    * (the slice variant bounds the inverted-index self-join at 10×).
    */
  private def d13Oracle(augWhere: String): String =
    s"""WITH aug AS (SELECT d.doc_id,
                      d.text || ' ' || s.text AS text
                    FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 40
                    $augWhere),
       t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM aug),
       sh AS (SELECT doc_id,
                CASE WHEN len(w) >= 3 THEN
                  list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
              FROM t),
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       sz AS (SELECT doc_id, len(s) AS n FROM sh),
       inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS shared
                 FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT i.id_a, i.id_b, CAST(i.shared AS BIGINT) AS shared,
         CAST(LEAST(a.n, b.n) AS BIGINT) AS n_small,
         CAST(i.shared * 10000 // LEAST(a.n, b.n) AS BIGINT) AS contain_bp
       FROM inter i JOIN sz a ON a.doc_id = i.id_a JOIN sz b ON b.doc_id = i.id_b
       WHERE i.shared * 10000 >= 9000 * LEAST(a.n, b.n)"""

  /** g10's oracle with an optional relation-level predicate (the slice
    * variant bounds the wedge self-join at 10×).
    */
  private def g10Oracle(relWhere: String): String =
    s"""WITH r AS (SELECT DISTINCT o_custkey AS e, l_suppkey AS i
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey $relWhere),
       p AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS n_shared
             FROM r a JOIN r b ON a.e = b.e AND a.i < b.i
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       d AS (SELECT i, COUNT(*) AS deg FROM r GROUP BY i),
       dir AS (SELECT src AS item, dst AS neighbor, n_shared FROM p
               UNION ALL SELECT dst, src, n_shared FROM p),
       s AS (SELECT item, neighbor,
               ROUND(CAST(n_shared AS DOUBLE)
                 / sqrt(CAST(da.deg AS DOUBLE) * CAST(db.deg AS DOUBLE)), 6) AS cosine
             FROM dir JOIN d da ON da.i = dir.item JOIN d db ON db.i = dir.neighbor),
       rk AS (SELECT item, neighbor, cosine,
                CAST(ROW_NUMBER() OVER (PARTITION BY item
                  ORDER BY cosine DESC, neighbor ASC) AS INT) AS rank FROM s)
       SELECT CAST(item AS BIGINT) AS item, CAST(neighbor AS BIGINT) AS neighbor,
         cosine, rank
       FROM rk WHERE rank <= 5"""

  // ---- xxhash64(BIGINT, seed 42) replayed in DuckDB arithmetic: the
  // exact Spark XXH64.hashLong chain (one 8-byte block + avalanche)
  // staged as CTE columns. Products run mod 2^64 through a 32-bit
  // split (a direct 64×64 product overflows INT128), rotations are
  // shift-sum (the halves never overlap bits), xors on the UBIGINT
  // view, and the final value converts back to the SIGNED ordering
  // Spark sorts by. Value-identical to Spark's xxhash64 — the v3
  // oracle hash gate re-proves it corpus-wide every round. ----
  private def xxhMulMod(a: String, b: String): String =
    s"((((($a) % 4294967296::HUGEINT) * ($b)) + ((((($a) // 4294967296::HUGEINT) * ($b))" +
      s" % 4294967296::HUGEINT) * 4294967296::HUGEINT)) % 18446744073709551616::HUGEINT)"
  private def xxhRotl(x: String, r: Int): String =
    s"(((($x) * ${BigInt(2).pow(r)}::HUGEINT) % 18446744073709551616::HUGEINT)" +
      s" + (($x) // ${BigInt(2).pow(64 - r)}::HUGEINT))"
  private def xxhXor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** CTE chain `hx1..hsg` computing `xh` = xxhash64(idExpr) for every
    * row of `srcCte`; join back on `xid`. P1..P5 are the XXH64 primes;
    * 2870177450012600311 = (42 + P5 + 8) — the seeded accumulator.
    */
  private def xxh64Ctes(srcCte: String, idExpr: String): String = {
    val P1 = "11400714785074694791::HUGEINT"
    val P2 = "14029467366897019727::HUGEINT"
    val P3 = "1609587929392839161::HUGEINT"
    val P4 = "9650029242287828579::HUGEINT"
    s"""hx1 AS (SELECT $idExpr AS xid, ${xxhMulMod(s"CAST($idExpr AS HUGEINT)", P2)} AS k0
                FROM $srcCte),
       hx2 AS (SELECT xid, ${xxhMulMod(xxhRotl("k0", 31), P1)} AS kk FROM hx1),
       hx3 AS (SELECT xid, ${xxhXor("2870177450012600311::HUGEINT", "kk")} AS h0 FROM hx2),
       hx4 AS (SELECT xid, ((${xxhMulMod(xxhRotl("h0", 27), P1)} + $P4)
                 % 18446744073709551616::HUGEINT) AS h2 FROM hx3),
       hx5 AS (SELECT xid, ${xxhXor("h2", "h2 // 8589934592::HUGEINT")} AS h3 FROM hx4),
       hx6 AS (SELECT xid, ${xxhMulMod("h3", P2)} AS h4 FROM hx5),
       hx7 AS (SELECT xid, ${xxhXor("h4", "h4 // 536870912::HUGEINT")} AS h5 FROM hx6),
       hx8 AS (SELECT xid, ${xxhMulMod("h5", P3)} AS h6 FROM hx7),
       hx9 AS (SELECT xid, ${xxhXor("h6", "h6 // 4294967296::HUGEINT")} AS h7 FROM hx8),
       hsg AS (SELECT xid, CASE WHEN h7 >= 9223372036854775808::HUGEINT
                 THEN CAST(h7 - 18446744073709551616::HUGEINT AS BIGINT)
                 ELSE CAST(h7 AS BIGINT) END AS xh FROM hx9)"""
  }

  /** v3's oracle: the full IVF candidate-set identity replayed —
    * xxhash64 seed selection ([[xxh64Ctes]]), argmin cell assignment
    * over IN-ORDER IEEE double sums (list_reduce is a sequential left
    * fold, matching the kernel's loop; subtraction/multiply/add are
    * correctly rounded, so the doubles are bit-identical), ties to the
    * smaller cell id, probes nProbe-deep by the same order, candidate
    * counts from the assignment histogram, and n_results derived as
    * least(k, n_candidates − 1) — the query's own cell is always probe
    * rank 1, so the query is always a self-excluded candidate.
    */
  private val ivfProbeReportOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
       ${xxh64Ctes("emb", "vec_id")},
       seeds AS (SELECT e.embedding,
                   ROW_NUMBER() OVER (ORDER BY h.xh ASC, h.xid ASC) AS centroid_id
                 FROM emb e JOIN hsg h ON e.vec_id = h.xid
                 ORDER BY h.xh ASC, h.xid ASC LIMIT 16),
       dist AS (SELECT e.vec_id, s.centroid_id,
                  list_reduce(list_transform(range(1, len(e.embedding) + 1),
                    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.embedding[i] AS DOUBLE))
                       * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.embedding[i] AS DOUBLE))),
                    (x, y) -> x + y) AS d
                FROM emb e CROSS JOIN seeds s),
       ranked AS (SELECT vec_id, centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY d ASC, centroid_id ASC) AS rn
                  FROM dist),
       cells AS (SELECT vec_id, centroid_id AS cell FROM ranked WHERE rn = 1),
       csz AS (SELECT cell, COUNT(*) AS cell_n FROM cells GROUP BY 1),
       probes AS (SELECT vec_id AS query_id, centroid_id AS cell, rn AS probe_rank
                  FROM ranked WHERE vec_id % 10 = 0 AND rn <= 4),
       rep AS (SELECT p.query_id,
                 string_agg(CAST(p.cell AS VARCHAR), ',' ORDER BY p.probe_rank)
                   AS probed_cells,
                 COUNT(*) AS n_cells_probed,
                 SUM(COALESCE(z.cell_n, 0)) AS n_candidates
               FROM probes p LEFT JOIN csz z ON p.cell = z.cell GROUP BY 1)
       SELECT query_id, probed_cells,
         CAST(n_cells_probed AS BIGINT) AS n_cells_probed,
         CAST(n_candidates AS BIGINT) AS n_candidates,
         CAST(LEAST(5, n_candidates - 1) AS BIGINT) AS n_results
       FROM rep"""

  /** v13/v14's oracle: the recall count plus the EXACT grown index row
    * count — append correctness is pinned by both (a lost append batch
    * fails n_index exactly and drags recall to ~0.5 besides).
    */
  private val ivfAppendOracle: String =
    ivfRecallCtes +
      """
       SELECT COUNT(*) AS n_bf, CAST(1 AS INT) AS recall_ok,
              (SELECT COUNT(*) FROM embeddings) AS n_index
       FROM r WHERE rank <= 5"""

  /** v15/v16's oracle, shared: the two Lloyd rounds unrolled (the g1
    * recipe applied to geometry). Every value is an integer-valued
    * double — quantized coordinates, squared-difference sums, floored
    * cell means — so SUM order can't move a bit and the engines agree
    * exactly; ties argmin to the smaller cell id in both.
    */
  private val kmeansOracleCtes: String =
    """WITH q AS (
         SELECT vec_id,
                unnest(range(1, len(embedding)+1)) AS pos,
                unnest(list_transform(embedding, x -> ROUND(x::DOUBLE * 1000))) AS qv
         FROM embeddings),
       seeds AS (
         SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                  CAST(vec_id AS VARCHAR)) AS cid
         FROM embeddings QUALIFY cid <= 8),
       c0 AS (SELECT s.cid, q.pos, q.qv AS cv FROM seeds s JOIN q ON q.vec_id = s.vec_id),
       d1 AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.cv)*(q.qv - c.cv)) AS dist
              FROM q JOIN c0 c USING (pos) GROUP BY 1,2),
       a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) rn
              FROM d1) WHERE rn=1),
       m1 AS (SELECT a.cid, q.pos, FLOOR(SUM(q.qv)/COUNT(*)) AS mv
              FROM a1 a JOIN q USING (vec_id) GROUP BY 1,2),
       c1 AS (SELECT c0.cid, c0.pos, COALESCE(m1.mv, c0.cv) AS cv
              FROM c0 LEFT JOIN m1 USING (cid, pos)),
       d2 AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.cv)*(q.qv - c.cv)) AS dist
              FROM q JOIN c1 c USING (pos) GROUP BY 1,2),
       a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) rn
              FROM d2) WHERE rn=1),
       m2 AS (SELECT a.cid, q.pos, FLOOR(SUM(q.qv)/COUNT(*)) AS mv
              FROM a2 a JOIN q USING (vec_id) GROUP BY 1,2),
       c2 AS (SELECT c1.cid, c1.pos, COALESCE(m2.mv, c1.cv) AS cv
              FROM c1 LEFT JOIN m2 USING (cid, pos)),
       df AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.cv)*(q.qv - c.cv)) AS dist
              FROM q JOIN c2 c USING (pos) GROUP BY 1,2),
       fin AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist AS dist_fp
               FROM (SELECT vec_id, cid, dist,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) rn
                     FROM df) WHERE rn=1)"""

  /** t24's oracle, generated: BPE merge rounds unroll to CTE chains
    * (the g1 recipe). Round i recounts pairs from the round-(i-1)
    * vocabulary, argmaxes with the (count DESC, lhs, rhs) tie-break,
    * and applies the merge with the SAME doubled-fence string replace
    * the engine uses — plain `replace` is left-to-right non-overlapping
    * in both engines, so the vocabularies stay bit-identical round by
    * round.
    */
  private def bpeOracleSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      raw"""p$i AS (SELECT p[1] AS l, p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
             FROM (SELECT freq, unnest(list_transform(range(1, len(s)),
                     x -> [s[x], s[x+1]])) AS p
                   FROM (SELECT list_filter(string_split(rep, '||'), y -> y <> '') AS s,
                           freq FROM w${i - 1}))
             GROUP BY 1, 2),
           b$i AS (SELECT l, r, cnt, $i AS merge_rank FROM p$i
                   ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
           w$i AS (SELECT replace(rep, '|' || l || '||' || r || '|',
                     '|' || l || r || '|') AS rep, freq FROM w${i - 1}, b$i)"""
    }.mkString(",\n         ")
    val out = (1 to k)
      .map(i => s"SELECT merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM b$i")
      .mkString("\n         UNION ALL ")
    raw"""WITH w0 AS (
           SELECT '||' || array_to_string(regexp_extract_all(w, '.'), '||') || '||' AS rep,
                  CAST(COUNT(*) AS BIGINT) AS freq
           FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
           WHERE NOT contains(w, '|') GROUP BY w),
         $rounds
         $out"""
  }

  /** t26 oracle: replay the k training rounds (same CTE chain as t24),
    * then ENCODE — nested replace() applying each round's one-row merge
    * in rank order over the distinct-word reps, token counts joined back
    * to word instances.
    */
  private def bpeEncodeOracleSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      raw"""p$i AS (SELECT p[1] AS l, p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
             FROM (SELECT freq, unnest(list_transform(range(1, len(s)),
                     x -> [s[x], s[x+1]])) AS p
                   FROM (SELECT list_filter(string_split(rep, '||'), y -> y <> '') AS s,
                           freq FROM w${i - 1}))
             GROUP BY 1, 2),
           b$i AS (SELECT l, r, cnt FROM p$i
                   ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
           w$i AS (SELECT replace(rep, '|' || l || '||' || r || '|',
                     '|' || l || r || '|') AS rep, freq FROM w${i - 1}, b$i)"""
    }.mkString(",\n         ")
    // merge i applies to what i-1 produced: nested replaces, innermost first
    val applied = (1 to k).foldLeft("rep") { (acc, i) =>
      s"replace($acc, '|' || m$i.l || '||' || m$i.r || '|', '|' || m$i.l || m$i.r || '|')"
    }
    val mergeFrom = (1 to k).map(i => s"b$i AS m$i").mkString(", ")
    raw"""WITH w0 AS (
           SELECT '||' || array_to_string(regexp_extract_all(w, '.'), '||') || '||' AS rep,
                  CAST(COUNT(*) AS BIGINT) AS freq
           FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
           WHERE NOT contains(w, '|') GROUP BY w),
         $rounds,
         vocab AS (
           SELECT DISTINCT w,
             '||' || array_to_string(regexp_extract_all(w, '.'), '||') || '||' AS rep
           FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
           WHERE NOT contains(w, '|')),
         enc AS (
           SELECT w, len(list_filter(string_split($applied, '||'), y -> y <> '')) AS nt
           FROM vocab, $mergeFrom),
         inst AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
                  FROM documents)
         SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(nt) AS BIGINT) AS n_tokens
         FROM inst JOIN enc USING (w) GROUP BY doc_id"""
  }

  private val oracleBase: Map[String, String] = Map(
    "a1_full_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         GROUP BY l_returnflag, l_linestatus""",

    "a2_conditional_agg" ->
      """SELECT o_orderpriority,
         CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_finished,
         CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
         COUNT(*) AS n_total,
         CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / COUNT(*) AS finished_share
         FROM orders GROUP BY o_orderpriority""",

    "p1_projection_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity >= 45
           AND l_shipdate >= TIMESTAMP '1997-01-01'""",

    "p2_select_star" -> "SELECT * FROM nation",

    "e5_click_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS t FROM events),
         c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
         g AS (SELECT user_id, t FROM e WHERE event_type = 'signup')
         SELECT c.event_id AS click_id, c.user_id,
           strftime(c.t, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(g.t, '%Y-%m-%d %H:%M:%S') AS signup_ts
         FROM c JOIN g ON c.user_id = g.user_id
           AND c.t >= g.t AND c.t <= g.t + INTERVAL 7 DAY""",

    "e37_attribution_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS t FROM events),
         c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
         g AS (SELECT user_id, t FROM e WHERE event_type = 'signup')
         SELECT c.event_id AS click_id, c.user_id,
           strftime(c.t, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(g.t, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           CASE WHEN g.t IS NULL THEN 0 ELSE 1 END AS attributed
         FROM c LEFT JOIN g ON c.user_id = g.user_id
           AND c.t >= g.t AND c.t <= g.t + INTERVAL 7 DAY""",

    "e6_dedup_watermark" ->
      """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS t, value FROM events),
         d AS (SELECT event_id, user_id, event_type, t + INTERVAL 10 MINUTE AS t, value
               FROM e WHERE event_id % 50 = 0),
         a AS (SELECT * FROM e UNION ALL SELECT * FROM d),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY t) AS rn FROM a)
         SELECT event_id, user_id, event_type,
           strftime(t, '%Y-%m-%d %H:%M:%S') AS ts, value
         FROM r WHERE rn = 1""",

    // identical contract to e20 (the written index must change NOTHING
    // semantically — only where the history tables live)
    "d11_banded_index" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
                    FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         sz AS (SELECT doc_id, len(s) AS n FROM sh),
         inter AS (SELECT x.doc_id AS stream_id, y.doc_id AS hist_id, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g
                    AND x.doc_id >= 250 AND y.doc_id < 250
                   GROUP BY 1, 2)
         SELECT stream_id, hist_id, ROUND(i / (na.n + nb.n - i), 6) AS jaccard
         FROM inter JOIN sz na ON stream_id = na.doc_id
                    JOIN sz nb ON hist_id = nb.doc_id
         WHERE i / (na.n + nb.n - i) >= 0.8""",

    // exact cross-corpus trigram Jaccard (stream half >= 250 vs history
    // half < 250) — the LSH banding is recall-complete at these
    // parameters (miss ~ 5e-8), the exact verify removes every false
    // positive, so streaming output == this exact join
    "e20_stream_neardup" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
                    FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         sz AS (SELECT doc_id, len(s) AS n FROM sh),
         inter AS (SELECT x.doc_id AS stream_id, y.doc_id AS hist_id, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g
                    AND x.doc_id >= 250 AND y.doc_id < 250
                   GROUP BY 1, 2)
         SELECT stream_id, hist_id, ROUND(i / (na.n + nb.n - i), 6) AS jaccard
         FROM inter JOIN sz na ON stream_id = na.doc_id
                    JOIN sz nb ON hist_id = nb.doc_id
         WHERE i / (na.n + nb.n - i) >= 0.8""",

    "e7_streaming_hourly" ->
      """SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    "e10_session_incidents" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type FROM events),
         x AS (SELECT user_id, event_id, t,
             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                    OR epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) > 3600000000
                  THEN 1 ELSE 0 END AS st
           FROM e),
         sq AS (SELECT user_id, t,
             CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM x),
         sess AS (SELECT user_id, session_seq,
             MIN(epoch_us(t)) AS s_start, MAX(epoch_us(t)) + 1 AS s_end
           FROM sq GROUP BY user_id, session_seq),
         inc AS (SELECT epoch_us(date_trunc('hour', t)) AS i_start,
             epoch_us(date_trunc('hour', t)) + 3600000000 AS i_end,
             COUNT(*) AS n_errors
           FROM e WHERE event_type = 'error'
           GROUP BY 1, 2 HAVING COUNT(*) >= 5)
         SELECT s.user_id, s.session_seq,
           strftime(make_timestamp(i.i_start), '%Y-%m-%d %H:%M:%S') AS incident_hour,
           i.n_errors
         FROM sess s JOIN inc i ON s.s_start < i.i_end AND i.i_start < s.s_end""",

    "e9_stream_enrich" ->
      """WITH dim AS (SELECT DISTINCT event_type,
             CAST(length(event_type) AS BIGINT) AS weight,
             substr(event_type, 1, 1) AS category
           FROM events)
         SELECT strftime(date_trunc('hour', e.ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
           d.category, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE) AS weighted_value
         FROM events e JOIN dim d USING (event_type)
         GROUP BY 1, 2""",

    "e8_streaming_sessions" ->
      """WITH e AS (SELECT user_id, event_id, value, ts::TIMESTAMP AS t FROM events),
         x AS (SELECT user_id, event_id, value, t,
           CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                  OR epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) > 3600000000
                THEN 1 ELSE 0 END AS st
           FROM e),
         sq AS (SELECT user_id, value, t,
           CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM x)
         SELECT user_id,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM sq GROUP BY user_id, session_seq""",

    "j1_broadcast_join" ->
      """SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "j2_multi_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY r_name, n_name""",

    "j3_decorrelated_quota" ->
      """WITH quota AS (
           SELECT o_custkey,
             CAST(FLOOR(COUNT(*) / 2) AS BIGINT)
               - COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS quota_left
           FROM orders GROUP BY o_custkey),
         ranked AS (
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
             (o_totalprice < 60000.0 OR o_totalprice > 400000.0)
               AND o_orderpriority <> '1-URGENT' AS eligible,
             CAST(SUM(CASE WHEN (o_totalprice < 60000.0 OR o_totalprice > 400000.0)
               AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS elig_rank
           FROM orders)
         SELECT o_orderkey, r.o_custkey,
           CASE WHEN NOT (q.quota_left > 0) THEN NULL
                WHEN o_orderpriority = '1-URGENT' THEN NULL
                WHEN eligible AND elig_rank <= q.quota_left THEN
                  CASE WHEN o_totalprice < 60000.0 THEN 'LOW_VALUE' ELSE 'HIGH_VALUE' END
                WHEN eligible THEN NULL
                ELSE 'NO APLICA' END AS flag
         FROM ranked r JOIN quota q ON r.o_custkey = q.o_custkey""",

    "src2_sql_scan" ->
      """SELECT r_name, COUNT(*) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",

    "src3_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    // same identity contract through the gzip codec
    "src10_jsonl_gzip_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    // per-key counts, rank by (cnt desc, key asc) — the heap's exact
    // tie-break — then floored-bp shares and the uniform multiple
    "x48_skew_profile" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt
               FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
         r AS (SELECT key, CAST(cnt AS BIGINT) AS cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS INTEGER) AS rank
               FROM c),
         s AS (SELECT rank, key, cnt,
                 CAST(SUM(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM r WHERE rank <= 10)
         SELECT rank, key, cnt,
           (10000 * cnt) // total AS share_bp,
           (10000 * cum) // total AS cum_share_bp,
           (cnt * n_keys) // total AS skew_x
         FROM s CROSS JOIN t""",

    // the maintained view's final state computed directly: inserts are
    // k%7=3, deletes k%11=5 of the base — survivors are
    // (k%7=3) OR (k%11<>5)
    "x49_ivm_agg" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS sum_cents
         FROM orders
         WHERE (o_orderkey % 7 = 3) OR (o_orderkey % 11 <> 5)
         GROUP BY 1""",

    // dominance replayed on the same distinct-(x,y) histogram: per-x
    // maxima, then the strict running max over greater x via the
    // identical integer RANGE frame
    "x47_skyline" ->
      """WITH c AS (SELECT o_custkey,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x,
                  CAST(MAX(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                    AS BIGINT) AS y
                FROM orders GROUP BY 1),
         g AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_points
               FROM c WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2),
         mx AS (SELECT x, MAX(y) AS y FROM g GROUP BY 1),
         cand AS (SELECT g.x, g.y, g.n_points FROM mx JOIN g USING (x, y)),
         f AS (SELECT x, y, n_points,
                 MAX(y) OVER (ORDER BY x
                   RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS my
               FROM cand)
         SELECT x AS spend_cents, y AS last_day, n_points AS n_custs
         FROM f WHERE my IS NULL OR my < y""",

    // weighted ranks over cumulative weight, same ⌈p·W⌉ nearest-rank
    // rule, HUGEINT cumulative sums
    "x46_weighted_pct" ->
      """WITH vc AS (SELECT o_orderpriority AS key,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS HUGEINT) AS w
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
                GROUP BY 1, 2),
         rk AS (SELECT key, v, w,
                  SUM(w) OVER (PARTITION BY key ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS hi,
                  SUM(w) OVER (PARTITION BY key) AS tw
                FROM vc)
         SELECT key AS o_orderpriority, COUNT(*) AS n_values,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           MAX(CASE WHEN (5000 * tw + 9999) // 10000
             BETWEEN hi - w + 1 AND hi THEN v END) AS wp50,
           MAX(CASE WHEN (9000 * tw + 9999) // 10000
             BETWEEN hi - w + 1 AND hi THEN v END) AS wp90
         FROM rk GROUP BY 1""",

    // total variation replayed over the same full QI × level grid:
    // HUGEINT cross-products, floored bp
    "x45_t_closeness" ->
      """WITH gc AS (SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
                  AS bal_bucket, c_mktsegment AS sens, COUNT(*) AS c
                FROM customer WHERE c_mktsegment IS NOT NULL
                GROUP BY 1, 2, 3),
         g AS (SELECT c_nationkey, bal_bucket, CAST(SUM(c) AS BIGINT) AS n_g
               FROM gc GROUP BY 1, 2),
         lv AS (SELECT sens, CAST(SUM(c) AS BIGINT) AS c_all FROM gc GROUP BY 1),
         tt AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_all FROM lv),
         grid AS (SELECT g.c_nationkey, g.bal_bucket, g.n_g, lv.c_all, tt.n_all,
                    COALESCE(gc.c, 0) AS c
                  FROM g CROSS JOIN lv CROSS JOIN tt
                  LEFT JOIN gc ON gc.c_nationkey = g.c_nationkey
                    AND gc.bal_bucket = g.bal_bucket AND gc.sens = lv.sens),
         agg AS (SELECT c_nationkey, bal_bucket,
                   CAST(MAX(n_g) AS BIGINT) AS group_size, MAX(n_all) AS n_all,
                   CAST(SUM(ABS(CAST(c AS HUGEINT) * n_all
                     - CAST(c_all AS HUGEINT) * n_g)) AS HUGEINT) AS dsum
                 FROM grid GROUP BY 1, 2)
         SELECT c_nationkey, bal_bucket, group_size,
           CAST((10000 * dsum) // (2 * CAST(group_size AS HUGEINT) * n_all)
             AS BIGINT) AS t_bp,
           CASE WHEN (10000 * dsum) // (2 * CAST(group_size AS HUGEINT) * n_all)
             <= 2000 THEN 1 ELSE 0 END AS t_ok
         FROM agg""",

    // the injected markup tail exercises XML escaping both ways; the
    // trailing space pins ignoreSurroundingSpaces=false
    "src7_xml_roundtrip" ->
      """SELECT doc_id, text || ' <tag attr="&x"> & tail ' AS text,
           lang, source, n_chars FROM documents""",

    // identity after positional serialize + parse; cents keep amounts
    // integral through the string form
    "src9_fixedwidth_roundtrip" ->
      """SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           o_orderstatus, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
         FROM orders""",

    // the payload embeds a fake WARC record (version line, header,
    // double CRLF): Content-Length framing must return it byte-exact,
    // and content_length is the UTF-8 byte count (strlen, not length)
    "src8_warc_roundtrip" ->
      """SELECT doc_id,
           text || (chr(13) || chr(10) || 'WARC/1.0' || chr(13) || chr(10)
             || 'Content-Length: 0' || chr(13) || chr(10) || chr(13) || chr(10)
             || ' tail ') AS text,
           CAST(strlen(text || (chr(13) || chr(10) || 'WARC/1.0' || chr(13) || chr(10)
             || 'Content-Length: 0' || chr(13) || chr(10) || chr(13) || chr(10)
             || ' tail ')) AS BIGINT) AS content_length
         FROM documents""",

    // the injected tail exercises separator+quote-in-data; roundtrip
    // must return it byte-exact
    "src6_csv_roundtrip" ->
      """SELECT doc_id, text || ', "quoted, field" tail' AS text,
           lang, source, n_chars FROM documents""",

    "src4_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    // what a lossless container roundtrip must reproduce, including the
    // binary payload's md5 identity and the NULLified union cells
    "src11_avro_roundtrip" ->
      """SELECT doc_id, text, NULLIF(lang, 'de') AS lang, n_chars,
           n_chars % 2 = 0 AS is_even, md5(text) AS payload_md5
         FROM documents""",

    // the engine's fixed-point power iteration replayed exactly: 5
    // unrolled rounds, all-integer micro-unit ranks (both `//` and
    // Spark's `div` truncate — equal on the non-negative ranks), so both engines
    // compute the identical long at every node after every round
    // the Okapi law verbatim: same literals (2.2 = 1+k1, 0.25 = 1-b),
    // same rounding points, rank by the exact integer score
    "v12_bm25_topk" ->
      """WITH w0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
                     FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w0 GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         st AS (SELECT (SELECT COUNT(*) FROM documents WHERE text IS NOT NULL) AS n_docs,
                       (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_dl),
         dfr AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
         idf AS (SELECT word,
                   CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5)) * 1000) AS BIGINT) AS idf_fp,
                   CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                 FROM dfr CROSS JOIN st),
         q AS (SELECT DISTINCT doc_id AS query_id, word FROM w0 WHERE doc_id % 100 = 0),
         t AS (SELECT q.query_id, tf.doc_id AS neighbor_id,
                 CAST(ROUND(idf_fp * ((CAST(tf AS DOUBLE) * 2.2) /
                   (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                    (CAST(dl.dl AS DOUBLE) / avgdl))))) AS BIGINT) AS term_fp
               FROM q JOIN tf USING (word) JOIN idf USING (word)
                      JOIN dl ON dl.doc_id = tf.doc_id
               WHERE tf.doc_id <> q.query_id),
         sc AS (SELECT query_id, neighbor_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp
                FROM t GROUP BY 1, 2),
         r AS (SELECT query_id, neighbor_id, score_fp,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_fp DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM sc)
         SELECT query_id, neighbor_id, score_fp, rank FROM r WHERE rank <= 5""",

    // the whole sparse pipeline replayed: same tokenization as t12, the
    // same milli-nat idf quantization, integer dots/norms, rank by RAW
    // cosine (round only for display) with id tie-break
    "v11_sparse_topk" ->
      """WITH w0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
                     FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w0 GROUP BY 1, 2),
         dfr AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
         wt AS (SELECT doc_id, word,
                  tf * CAST(ROUND((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000) AS BIGINT) AS w
                FROM tf JOIN dfr USING (word) CROSS JOIN n),
         nm AS (SELECT doc_id, SUM(w * w) AS n2 FROM wt GROUP BY 1),
         q AS (SELECT doc_id AS query_id, word, w AS wq FROM wt WHERE doc_id % 100 = 0),
         dt AS (SELECT q.query_id, wt.doc_id AS neighbor_id, SUM(q.wq * wt.w) AS dot
                FROM q JOIN wt USING (word) WHERE wt.doc_id <> q.query_id
                GROUP BY 1, 2),
         sc AS (SELECT dt.query_id, dt.neighbor_id,
                  CAST(dot AS DOUBLE) /
                    sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
                FROM dt JOIN nm a ON a.doc_id = dt.query_id
                         JOIN nm b ON b.doc_id = dt.neighbor_id),
         r AS (SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM sc)
         SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
         FROM r WHERE rank <= 5""",

    // both retrieval pipelines replayed to top-20 (the v11 and v12
    // CTEs verbatim), then the fusion law: floored micro-unit
    // reciprocal ranks, LONG sums, id tie-break
    "v27_rrf_hybrid" ->
      """WITH w0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
                     FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w0 GROUP BY 1, 2),
         dfr AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
         wt AS (SELECT doc_id, word,
                  tf * CAST(ROUND((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000) AS BIGINT) AS w
                FROM tf JOIN dfr USING (word) CROSS JOIN n),
         nm AS (SELECT doc_id, SUM(w * w) AS n2 FROM wt GROUP BY 1),
         q AS (SELECT doc_id AS query_id, word, w AS wq FROM wt WHERE doc_id % 100 = 0),
         dt AS (SELECT q.query_id, wt.doc_id AS neighbor_id, SUM(q.wq * wt.w) AS dot
                FROM q JOIN wt USING (word) WHERE wt.doc_id <> q.query_id
                GROUP BY 1, 2),
         sc AS (SELECT dt.query_id, dt.neighbor_id,
                  CAST(dot AS DOUBLE) /
                    sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
                FROM dt JOIN nm a ON a.doc_id = dt.query_id
                         JOIN nm b ON b.doc_id = dt.neighbor_id),
         cr AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM sc),
         dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         st AS (SELECT (SELECT COUNT(*) FROM documents WHERE text IS NOT NULL) AS n_docs,
                       (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_dl),
         idf AS (SELECT word,
                   CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5)) * 1000) AS BIGINT) AS idf_fp,
                   CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                 FROM dfr CROSS JOIN st),
         bq AS (SELECT DISTINCT doc_id AS query_id, word FROM w0 WHERE doc_id % 100 = 0),
         bt AS (SELECT bq.query_id, tf.doc_id AS neighbor_id,
                  CAST(ROUND(idf_fp * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                     (CAST(dl.dl AS DOUBLE) / avgdl))))) AS BIGINT) AS term_fp
                FROM bq JOIN tf USING (word) JOIN idf USING (word)
                       JOIN dl ON dl.doc_id = tf.doc_id
                WHERE tf.doc_id <> bq.query_id),
         bs AS (SELECT query_id, neighbor_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp
                FROM bt GROUP BY 1, 2),
         br AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score_fp DESC, neighbor_id ASC) AS rank
                FROM bs),
         u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS contrib
               FROM cr WHERE rank <= 20
               UNION ALL
               SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS contrib
               FROM br WHERE rank <= 20),
         f AS (SELECT query_id, neighbor_id,
                 CAST(SUM(contrib) AS BIGINT) AS rrf_fp,
                 CAST(COUNT(*) AS BIGINT) AS n_rankers
               FROM u GROUP BY 1, 2),
         fr AS (SELECT query_id, neighbor_id, rrf_fp, n_rankers,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY rrf_fp DESC, neighbor_id ASC) AS INTEGER) AS rank
                FROM f)
         SELECT query_id, neighbor_id, rrf_fp, n_rankers, rank
         FROM fr WHERE rank <= 10""",

    // BFS distance == MIN(d) over the depth-bounded recursive closure;
    // UNION (not UNION ALL) dedups (node, d) pairs so the recursion
    // terminates at the bound
    "g3_bfs_hops" ->
      """WITH RECURSIVE p AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT a AS src, b AS dst FROM p
               UNION ALL SELECT b, a FROM p),
         sd AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_suppkey % 10 = 0),
         r AS (SELECT node, 0 AS d FROM sd
               UNION
               SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.node WHERE r.d < 3)
         SELECT CAST(node AS BIGINT) AS node, CAST(MIN(d) AS BIGINT) AS hops
         FROM r GROUP BY 1""",

    // per-seed min-depth closure, then the exact-integer centrality
    // forms: Σhops, Σ(1e6 // d) micro-units, (1e6·n) // Σhops — all
    // floored positive divisions, bit-replayable
    "g15_closeness" ->
      """WITH RECURSIVE p AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT a AS src, b AS dst FROM p
               UNION ALL SELECT b, a FROM p),
         sd AS (SELECT s_suppkey * 2 + 1 AS seed FROM supplier WHERE s_suppkey % 25 = 0),
         r AS (SELECT seed, seed AS node, 0 AS d FROM sd
               UNION
               SELECT r.seed, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.node WHERE r.d < 3),
         md AS (SELECT seed, node, MIN(d) AS d FROM r GROUP BY 1, 2),
         ag AS (SELECT seed,
                  CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
                  CAST(SUM(d) AS BIGINT) AS sum_hops,
                  CAST(SUM(CASE WHEN d > 0 THEN 1000000 // d ELSE 0 END) AS BIGINT)
                    AS harmonic_fp
                FROM md GROUP BY 1)
         SELECT CAST(seed AS BIGINT) AS seed, n_reached, sum_hops, harmonic_fp,
           CASE WHEN sum_hops > 0
             THEN CAST((1000000 * n_reached) // sum_hops AS BIGINT) END AS closeness_fp
         FROM ag""",

    "g1_pagerank" ->
      """WITH p AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT a AS src, b AS dst FROM p
               UNION ALL SELECT b, a FROM p),
         deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_fp FROM n),
         r1 AS (SELECT n.node, CAST(150000 + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM n LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                  FROM ed JOIN r0 ON ed.src = r0.node GROUP BY dst) s USING (node)),
         r2 AS (SELECT n.node, CAST(150000 + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM n LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                  FROM ed JOIN r1 ON ed.src = r1.node GROUP BY dst) s USING (node)),
         r3 AS (SELECT n.node, CAST(150000 + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM n LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                  FROM ed JOIN r2 ON ed.src = r2.node GROUP BY dst) s USING (node)),
         r4 AS (SELECT n.node, CAST(150000 + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM n LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                  FROM ed JOIN r3 ON ed.src = r3.node GROUP BY dst) s USING (node)),
         r5 AS (SELECT n.node, CAST(150000 + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM n LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                  FROM ed JOIN r4 ON ed.src = r4.node GROUP BY dst) s USING (node))
         SELECT node, rank_fp FROM r5""",

    // three personalized rounds: teleport base only for seed nodes,
    // seeds start with the whole initial mass
    "g5_personalized_pagerank" ->
      """WITH p AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT a AS src, b AS dst FROM p
               UNION ALL SELECT b, a FROM p),
         deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         sd AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_suppkey % 10 = 0),
         ns AS (SELECT n.node, (sd.node IS NOT NULL) AS is_seed
                FROM n LEFT JOIN sd USING (node)),
         r0 AS (SELECT node, CAST(CASE WHEN is_seed THEN 1000000 ELSE 0 END AS BIGINT) AS rank_fp FROM ns),
         r1 AS (SELECT ns.node, CAST(CASE WHEN ns.is_seed THEN 150000 ELSE 0 END
                       + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM ns LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                   FROM ed JOIN r0 ON ed.src = r0.node GROUP BY dst) s USING (node)),
         r2 AS (SELECT ns.node, CAST(CASE WHEN ns.is_seed THEN 150000 ELSE 0 END
                       + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM ns LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                   FROM ed JOIN r1 ON ed.src = r1.node GROUP BY dst) s USING (node)),
         r3 AS (SELECT ns.node, CAST(CASE WHEN ns.is_seed THEN 150000 ELSE 0 END
                       + (8500 * CAST(COALESCE(s.m, 0) AS BIGINT)) // 10000 AS BIGINT) AS rank_fp
                FROM ns LEFT JOIN (SELECT dst AS node, SUM(rank_fp // outdeg) AS m
                                   FROM ed JOIN r2 ON ed.src = r2.node GROUP BY dst) s USING (node))
         SELECT node, rank_fp FROM r3""",

    // triangles enumerated independently (id-ordered a<b<c joins — the
    // orientation trick is the ENGINE's plan, not the semantics)
    // three synchronous rounds unrolled; per-round argmax as row_number
    // (count DESC, label ASC) — the mirror of the struct-max
    "g4_label_prop" ->
      (labelPropOracleCtes() + "\n         SELECT node, label AS community FROM l3"),

    // Newman Q over the SAME unrolled label-prop communities (shared
    // CTEs — one definition): exact HUGEINT counts, floored micro-unit
    // quotient via the positive-mod subtraction (Q < 0 is possible, so
    // truncation-vs-floor matters here)
    // first digits from the exact cents STRING, the same nine hardcoded
    // expected constants, zero-count digits materialized by the grid
    "x38_benford" ->
      ("""WITH exp_t(digit, exp_micro) AS (VALUES """ +
        graft.ops.Stats.benfordMicro
          .map { case (d, p) => s"($d, ${p}::BIGINT)" }.mkString(", ") + """),
         v AS (SELECT o_orderpriority AS key,
                 ABS(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
               FROM orders),
         c AS (SELECT key, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
                 COUNT(*) AS n_digit
               FROM v WHERE v > 0 GROUP BY 1, 2),
         n AS (SELECT key, CAST(SUM(n_digit) AS BIGINT) AS n FROM c GROUP BY 1)
         SELECT n.key AS o_orderpriority, e.digit, n.n,
           CAST(COALESCE(c.n_digit, 0) AS BIGINT) AS n_digit,
           (1000000 * CAST(COALESCE(c.n_digit, 0) AS BIGINT)) // n.n AS obs_micro,
           e.exp_micro,
           ABS((1000000 * CAST(COALESCE(c.n_digit, 0) AS BIGINT)) // n.n
             - e.exp_micro) AS dev_micro
         FROM n CROSS JOIN exp_t e
         LEFT JOIN c ON c.key = n.key AND c.digit = e.digit"""),

    // exact nearest-rank median + MAD replayed at histogram grain; the
    // k·MAD comparison and basis points are pure integer arithmetic
    "x37_mad_outliers" ->
      """WITH e AS (SELECT event_type AS key,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                    FROM events WHERE value IS NOT NULL),
         vc AS (SELECT key, v, COUNT(*) AS c FROM e GROUP BY 1, 2),
         n AS (SELECT key, CAST(SUM(c) AS BIGINT) AS n,
                 (5000 * CAST(SUM(c) AS BIGINT) + 9999) // 10000 AS r
               FROM vc GROUP BY 1),
         rk AS (SELECT key, v, c, SUM(c) OVER (PARTITION BY key ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS hi FROM vc),
         med AS (SELECT rk.key, n.n, rk.v AS median_cents
                 FROM rk JOIN n USING (key)
                 WHERE rk.hi - rk.c + 1 <= n.r AND n.r <= rk.hi),
         dv AS (SELECT vc.key, ABS(vc.v - m.median_cents) AS d,
                  CAST(SUM(vc.c) AS BIGINT) AS c
                FROM vc JOIN med m USING (key) GROUP BY 1, 2),
         rd AS (SELECT key, d, c, SUM(c) OVER (PARTITION BY key ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS hi FROM dv),
         mad AS (SELECT rd.key, rd.d AS mad_cents FROM rd JOIN n USING (key)
                 WHERE rd.hi - rd.c + 1 <= n.r AND n.r <= rd.hi)
         SELECT vc.key AS event_type, MAX(m.n) AS n,
           MAX(m.median_cents) AS median_cents,
           MAX(mad.mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN ABS(vc.v - m.median_cents) > 3 * mad.mad_cents
             THEN vc.c ELSE 0 END) AS BIGINT) AS n_outliers,
           (10000 * CAST(SUM(CASE WHEN ABS(vc.v - m.median_cents)
               > 3 * mad.mad_cents THEN vc.c ELSE 0 END) AS BIGINT))
             // MAX(m.n) AS outlier_bp
         FROM vc JOIN med m USING (key) JOIN mad USING (key)
         GROUP BY 1""",

    // PSI replayed over the same bin grid: HUGEINT smoothed cross-
    // products feed the IDENTICAL psiTermSql tree (one shared
    // definition), per-key sums are exact integers
    "x39_psi_drift" ->
      (s"""WITH b AS (SELECT event_type AS key,
                  CASE WHEN epoch_us(ts::TIMESTAMP) // 86400000000 < 19738
                    THEN 1 ELSE 0 END AS is_ref,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                FROM events WHERE value IS NOT NULL),
         b2 AS (SELECT key, is_ref,
                  (cents - ((cents % 2000 + 2000) % 2000)) // 2000 AS bin
                FROM b),
         cells AS (SELECT key, bin, CAST(SUM(is_ref) AS BIGINT) AS c_ref,
                     CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
                   FROM b2 GROUP BY 1, 2),
         tot AS (SELECT key, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur,
                   CAST(COUNT(*) AS BIGINT) AS n_bins
                 FROM cells GROUP BY 1),
         tm AS (SELECT c.key, t.n_ref, t.n_cur, t.n_bins,
                  CAST(c.c_cur + 1 AS HUGEINT) * (t.n_ref + t.n_bins) AS ra,
                  CAST(c.c_ref + 1 AS HUGEINT) * (t.n_cur + t.n_bins) AS rb,
                  CAST(t.n_cur + t.n_bins AS HUGEINT) * (t.n_ref + t.n_bins) AS den
                FROM cells c JOIN tot t USING (key))
         SELECT key AS event_type, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
           MAX(n_bins) AS n_bins,
           CAST(SUM(${graft.ops.Stats.psiTermSql("ra", "rb", "den")})
             AS BIGINT) AS psi_micro
         FROM tm GROUP BY 1"""),

    // full R×C grid (empty cells materialized), the IDENTICAL
    // chiTermSql tree — every op correctly rounded, no ln caveat
    "x40_chi_square" ->
      (s"""WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                  CAST(COUNT(*) AS BIGINT) AS o
                FROM orders
                WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
                GROUP BY 1, 2),
         rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.rt, ct.ct, tot.n,
                    COALESCE(cells.o, 0) AS o
                  FROM rt CROSS JOIN ct CROSS JOIN tot
                  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
         SELECT MAX(n) AS n,
           CAST(COUNT(DISTINCT a) AS BIGINT) AS r_levels,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS c_levels,
           CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
             AS BIGINT) AS dof,
           CAST(SUM(${graft.ops.Stats.chiTermSql("o", "n", "rt", "ct")})
             AS BIGINT) AS chi2_micro
         FROM grid"""),

    // per-group exact sums, the SAME rounded group-term and F trees
    "x56_anova_f" ->
      (s"""WITH v AS (SELECT event_type AS g,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM events
                WHERE event_type IS NOT NULL AND value IS NOT NULL),
         gg AS (SELECT g, COUNT(*) AS n_g, CAST(SUM(v) AS HUGEINT) AS s_g,
                  CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q_g
                FROM v GROUP BY 1),
         f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                 CAST(SUM(n_g) AS BIGINT) AS n,
                 CAST(SUM(s_g) AS HUGEINT) AS s,
                 CAST(SUM(q_g) AS HUGEINT) AS q,
                 CAST(SUM(${graft.ops.Stats.anovaGroupTermSql("s_g", "n_g")})
                   AS BIGINT) AS a
               FROM gg),
         f2 AS (SELECT k_groups, n, q, a,
                  ${graft.ops.Stats.anovaGroupTermSql("s", "n")} AS b
                FROM f)
         SELECT k_groups, n, k_groups - 1 AS dfb, n - k_groups AS dfw,
           ${graft.ops.Stats.anovaFSql("a", "b", "q", "n", "k_groups")} AS f_micro
         FROM f2"""),

    // x40's statistic plus the SAME cramersVSql tree over it
    "x55_cramers_v" ->
      (s"""WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                  CAST(COUNT(*) AS BIGINT) AS o
                FROM orders
                WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
                GROUP BY 1, 2),
         rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.rt, ct.ct, tot.n,
                    COALESCE(cells.o, 0) AS o
                  FROM rt CROSS JOIN ct CROSS JOIN tot
                  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         f AS (SELECT MAX(n) AS n,
                 CAST(COUNT(DISTINCT a) AS BIGINT) AS r_levels,
                 CAST(COUNT(DISTINCT b) AS BIGINT) AS c_levels,
                 CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
                   AS BIGINT) AS dof,
                 CAST(SUM(${graft.ops.Stats.chiTermSql("o", "n", "rt", "ct")})
                   AS BIGINT) AS chi2_micro
               FROM grid)
         SELECT n, r_levels, c_levels, dof, chi2_micro,
           ${graft.ops.Stats.cramersVSql("chi2_micro", "n", "r_levels", "c_levels")}
             AS cramers_v_micro
         FROM f"""),

    // both sweeps as bounded recursive closures: min-id seed, farthest
    // = (max hops, min node), second closure's max hop + reach count
    "g17_diameter" ->
      """WITH RECURSIVE p AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT a AS src, b AS dst FROM p
               UNION ALL SELECT b, a FROM p),
         s0 AS (SELECT MIN(LEAST(src, dst)) AS node FROM e),
         r1 AS (SELECT node, 0 AS d FROM s0
                UNION
                SELECT e.dst, r1.d + 1 FROM r1 JOIN e ON e.src = r1.node
                WHERE r1.d < 8),
         h1 AS (SELECT node, MIN(d) AS hops FROM r1 GROUP BY 1),
         far AS (SELECT node AS far_node, hops AS ecc_seed FROM h1
                 ORDER BY hops DESC, node ASC LIMIT 1),
         r2 AS (SELECT far_node AS node, 0 AS d FROM far
                UNION
                SELECT e.dst, r2.d + 1 FROM r2 JOIN e ON e.src = r2.node
                WHERE r2.d < 8),
         h2 AS (SELECT node, MIN(d) AS hops FROM r2 GROUP BY 1)
         SELECT (SELECT CAST(node AS BIGINT) FROM s0) AS seed_node,
           (SELECT CAST(far_node AS BIGINT) FROM far) AS far_node,
           (SELECT CAST(ecc_seed AS BIGINT) FROM far) AS ecc_seed,
           CAST(MAX(hops) AS BIGINT) AS diameter_lb,
           COUNT(*) AS n_reached
         FROM h2""",

    // x40's grid, per cell through the SAME chiResidualSql tree
    "x54_chi_residuals" ->
      (s"""WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                  CAST(COUNT(*) AS BIGINT) AS o
                FROM orders
                WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
                GROUP BY 1, 2),
         rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.rt, ct.ct, tot.n,
                    COALESCE(cells.o, 0) AS o
                  FROM rt CROSS JOIN ct CROSS JOIN tot
                  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
         SELECT a AS o_orderstatus, b AS o_orderpriority, o, rt, ct,
           ${graft.ops.Stats.chiResidualSql("o", "n", "rt", "ct")}
             AS resid_micro,
           CASE WHEN ABS(${graft.ops.Stats.chiResidualSql("o", "n", "rt", "ct")})
             > 2000000 THEN 1 ELSE 0 END AS flagged
         FROM grid"""),

    // histogram-rank Gini: tied runs contribute v·(lo+hi)·c exactly
    // (consecutive-integer sum); HUGEINT terms, nonneg numerators so
    // // truncation IS floor on both engines
    "x41_gini" ->
      """WITH cust AS (SELECT c.c_nationkey AS key, o.o_custkey,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS v
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2),
         vc AS (SELECT key, v, COUNT(*) AS c FROM cust
                WHERE v IS NOT NULL AND v >= 0 GROUP BY 1, 2),
         r AS (SELECT key, v, c,
                 SUM(c) OVER (PARTITION BY key ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS hi
               FROM vc),
         r2 AS (SELECT key, v, c, hi, hi - c + 1 AS lo FROM r),
         n AS (SELECT key, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s
               FROM vc GROUP BY 1),
         agg AS (SELECT r2.key, n.n, n.s, (n.n + 9) // 10 AS k,
                   CAST(SUM(CAST(v AS HUGEINT) * (lo + hi) * c) AS HUGEINT)
                     AS num2,
                   CAST(SUM(CAST(v AS HUGEINT) * GREATEST(0,
                     hi - GREATEST(n.n - ((n.n + 9) // 10), lo - 1)))
                     AS HUGEINT) AS top_sum
                 FROM r2 JOIN n USING (key) GROUP BY 1, 2, 3, 4)
         SELECT key AS c_nationkey, n, CAST(s AS BIGINT) AS sum_cents,
           CAST((10000 * (num2 - (n + 1) * s)) // (CAST(n AS HUGEINT) * s)
             AS BIGINT) AS gini_bp,
           CAST(k AS BIGINT) AS top_decile_n,
           CAST((10000 * top_sum) // s AS BIGINT) AS top_decile_bp
         FROM agg WHERE s > 0""",

    // all-integer KS: max |cum_k·n_rest − cum_r·n_key| over the merged
    // value grid; ties resolve to the smallest value on both sides
    "x42_ks_drift" ->
      """WITH e AS (SELECT event_type AS key,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL),
         ck AS (SELECT key, v, CAST(COUNT(*) AS BIGINT) AS c
                FROM e GROUP BY 1, 2),
         ca AS (SELECT v, CAST(SUM(c) AS BIGINT) AS c_all FROM ck GROUP BY 1),
         keys AS (SELECT DISTINCT key FROM ck),
         grid AS (SELECT k.key, a.v, COALESCE(ck.c, 0) AS c,
                    a.c_all - COALESCE(ck.c, 0) AS c_rest
                  FROM keys k CROSS JOIN ca a
                  LEFT JOIN ck ON ck.key = k.key AND ck.v = a.v),
         cum AS (SELECT key, v,
                   SUM(c) OVER (PARTITION BY key ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum_k,
                   SUM(c_rest) OVER (PARTITION BY key ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum_r,
                   SUM(c) OVER (PARTITION BY key) AS n_key,
                   SUM(c_rest) OVER (PARTITION BY key) AS n_rest
                 FROM grid),
         d AS (SELECT key, v, n_key, n_rest,
                 ABS(CAST(cum_k AS HUGEINT) * n_rest
                   - CAST(cum_r AS HUGEINT) * n_key) AS diff
               FROM cum WHERE n_key > 0 AND n_rest > 0),
         m AS (SELECT key, CAST(MAX(n_key) AS BIGINT) AS n_key,
                 CAST(MAX(n_rest) AS BIGINT) AS n_rest, MAX(diff) AS maxd
               FROM d GROUP BY 1),
         arg AS (SELECT d.key, MIN(d.v) AS at_cents
                 FROM d JOIN m ON d.key = m.key AND d.diff = m.maxd
                 GROUP BY 1)
         SELECT m.key AS event_type, m.n_key, m.n_rest,
           CAST((10000 * m.maxd) // (CAST(m.n_key AS HUGEINT) * m.n_rest)
             AS BIGINT) AS ks_bp,
           arg.at_cents
         FROM m JOIN arg USING (key)""",

    // per-slice last/lag/trailing-window counts off the same
    // (slice, second) histogram, anchored at the data's own max
    "e48_freshness" ->
      """WITH bh AS (SELECT event_type AS slice,
                  epoch_us(ts::TIMESTAMP) // 1000000 AS es, COUNT(*) AS c
                FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         per AS (SELECT slice, CAST(SUM(c) AS BIGINT) AS n,
                   MAX(es) AS last_epoch_s
                 FROM bh GROUP BY 1),
         a AS (SELECT MAX(last_epoch_s) AS t_max FROM per),
         rec AS (SELECT slice, CAST(SUM(c) AS BIGINT) AS n_recent
                 FROM bh CROSS JOIN a WHERE es > t_max - 86400 GROUP BY 1)
         SELECT per.slice AS event_type, per.n, per.last_epoch_s,
           a.t_max - per.last_epoch_s AS lag_s,
           COALESCE(rec.n_recent, 0) AS n_recent
         FROM per CROSS JOIN a LEFT JOIN rec ON rec.slice = per.slice""",

    // exact nearest-rank quartile cuts replayed over the same value
    // histogram; ties land in the lower bin via the same <= rule
    "x44_quantile_bins" ->
      """WITH vc AS (SELECT event_type AS key,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                  COUNT(*) AS c
                FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         rk AS (SELECT key, v, c,
                  SUM(c) OVER (PARTITION BY key ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS hi,
                  SUM(c) OVER (PARTITION BY key) AS n
                FROM vc),
         cuts AS (SELECT key,
                    MAX(CASE WHEN (1 * n + 3) // 4 BETWEEN hi - c + 1 AND hi
                      THEN v END) AS cut_1,
                    MAX(CASE WHEN (2 * n + 3) // 4 BETWEEN hi - c + 1 AND hi
                      THEN v END) AS cut_2,
                    MAX(CASE WHEN (3 * n + 3) // 4 BETWEEN hi - c + 1 AND hi
                      THEN v END) AS cut_3
                  FROM rk GROUP BY 1),
         b AS (SELECT vc.key, vc.c,
                 CASE WHEN vc.v > cut_3 THEN 3 WHEN vc.v > cut_2 THEN 2
                      WHEN vc.v > cut_1 THEN 1 ELSE 0 END AS bin,
                 CASE WHEN vc.v > cut_3 THEN NULL WHEN vc.v > cut_2 THEN cut_3
                      WHEN vc.v > cut_1 THEN cut_2 ELSE cut_1 END AS cut_hi
               FROM vc JOIN cuts USING (key))
         SELECT key AS event_type, CAST(bin AS INT) AS bin,
           CAST(SUM(c) AS BIGINT) AS n_bin, MAX(cut_hi) AS cut_hi
         FROM b GROUP BY 1, 2""",

    // first-anchor join replayed; latency histogram percentiles are the
    // x15 nearest-rank formulation, conversion in floored bp
    "e47_conversion_latency" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts::TIMESTAMP)) AS t_from
                FROM events WHERE event_type = 'click' GROUP BY 1),
         cv AS (SELECT e.user_id AS u, MIN(epoch_us(e.ts::TIMESTAMP)) AS t_to,
                  MAX(a.t_from) AS t_from
                FROM events e JOIN a ON e.user_id = a.u
                WHERE e.event_type = 'purchase'
                  AND epoch_us(e.ts::TIMESTAMP) >= a.t_from
                GROUP BY 1),
         l AS (SELECT (t_to - t_from) // 1000000 AS lat_s FROM cv),
         vc AS (SELECT lat_s, COUNT(*) AS c FROM l GROUP BY 1),
         rk AS (SELECT lat_s, c,
                  SUM(c) OVER (ORDER BY lat_s ROWS UNBOUNDED PRECEDING) AS hi,
                  SUM(c) OVER () AS n
                FROM vc),
         p AS (SELECT CAST(MAX(n) AS BIGINT) AS n_conv,
                 MAX(CASE WHEN (5000 * n + 9999) // 10000
                   BETWEEN hi - c + 1 AND hi THEN lat_s END) AS p50_s,
                 MAX(CASE WHEN (9000 * n + 9999) // 10000
                   BETWEEN hi - c + 1 AND hi THEN lat_s END) AS p90_s,
                 MAX(CASE WHEN (9900 * n + 9999) // 10000
                   BETWEEN hi - c + 1 AND hi THEN lat_s END) AS p99_s
               FROM rk),
         nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_from FROM a)
         SELECT nf.n_from, p.n_conv, (10000 * p.n_conv) // nf.n_from AS conv_bp,
           p.p50_s, p.p90_s, p.p99_s
         FROM p CROSS JOIN nf""",

    // same integer counts (t5 tokens, [.!?]+ runs, vowel groups) and
    // the same positive-mod floored milli-unit formula
    "t38_readability" ->
      """WITH b AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                  GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
                    AS n_sentences,
                  GREATEST(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT), 1) AS n_syllables
                FROM documents),
         f AS (SELECT *, 390 * CAST(n_words AS HUGEINT) * n_words
                  + 11800 * CAST(n_syllables AS HUGEINT) * n_sentences
                  - 15590 * CAST(n_sentences AS HUGEINT) * n_words AS num,
                 CAST(n_sentences AS HUGEINT) * n_words AS den
               FROM b WHERE n_words > 0)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST((num - ((num % den + den) % den)) // den AS BIGINT)
             AS fk_grade_milli
         FROM f""",

    // log-log OLS replayed: exact ranks (same total order), micro-nat
    // points, HUGEINT moments, positive-mod floored slope (negative),
    // fit r via the IDENTICAL corrSql tree
    "t37_zipf_slope" ->
      (s"""WITH w AS (SELECT lang AS slice,
                  unnest(regexp_extract_all(lower(text), '\\S+')) AS word
                FROM documents),
         wc AS (SELECT slice, word, CAST(COUNT(*) AS BIGINT) AS c FROM w
                WHERE length(word) > 0 GROUP BY 1, 2),
         rk AS (SELECT slice, c, ROW_NUMBER() OVER (PARTITION BY slice
                  ORDER BY c DESC, word ASC) AS rank
                FROM wc),
         pts AS (SELECT slice,
                   CAST(ROUND(LN(CAST(rank AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x,
                   CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT) AS y
                 FROM rk WHERE rank <= 500),
         m AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                 CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
               FROM pts GROUP BY 1),
         f AS (SELECT slice, n, n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS den, sxy, sx, sy, sxx, syy
               FROM m)
         SELECT slice AS lang, n AS n_ranks,
           CAST((1000000 * num - ((1000000 * num % den + den) % den)) // den
             AS BIGINT) AS slope_micro,
           ${graft.ops.Stats.corrSql("sxy", "sx", "sy", "sxx", "syy")} AS fit_corr
         FROM f WHERE den > 0"""),

    // the g7 wedge join with integer Jaccard: induced-subgraph degrees
    // (hub centers removed from BOTH counts), floored bp, no floats
    "g13_jaccard_links" ->
      """WITH p0 AS (SELECT DISTINCT o_custkey * 2 AS x, l_suppkey * 2 + 1 AS y
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                     WHERE l_quantity >= 48),
         e0 AS (SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM p0),
         adj AS (SELECT a AS w, b AS n FROM e0 UNION ALL SELECT b, a FROM e0),
         elig AS (SELECT w FROM (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w)
                  WHERE deg <= 10000),
         adje AS (SELECT adj.w, adj.n FROM adj JOIN elig USING (w)),
         dege AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM adje GROUP BY 1),
         pr AS (SELECT a1.n AS a, a2.n AS b, CAST(COUNT(*) AS BIGINT) AS n_common
                FROM adje a1 JOIN adje a2 ON a1.w = a2.w AND a1.n < a2.n
                GROUP BY 1, 2),
         sc AS (SELECT pr.a, pr.b, pr.n_common, da.deg AS deg_a, db.deg AS deg_b,
                  (10000 * pr.n_common) // (da.deg + db.deg - pr.n_common)
                    AS jaccard_bp
                FROM pr JOIN dege da ON pr.a = da.n JOIN dege db ON pr.b = db.n),
         nn AS (SELECT sc.* FROM sc ANTI JOIN e0 ON sc.a = e0.a AND sc.b = e0.b)
         SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, n_common,
           deg_a, deg_b, CAST(jaccard_bp AS BIGINT) AS jaccard_bp
         FROM nn ORDER BY jaccard_bp DESC, a, b LIMIT 100""",

    // micro-nat entropy terms via the IDENTICAL entropyTermSql tree;
    // per-key sums are exact integers
    "x43_entropy" ->
      (s"""WITH gc AS (SELECT lang AS key, source AS grp,
                  CAST(COUNT(*) AS BIGINT) AS cc
                FROM documents WHERE source IS NOT NULL GROUP BY 1, 2),
         kt AS (SELECT key, CAST(SUM(cc) AS BIGINT) AS nn, COUNT(*) AS n_groups
                FROM gc GROUP BY 1),
         tm AS (SELECT gc.key, gc.cc, kt.nn, kt.n_groups
                FROM gc JOIN kt USING (key))
         SELECT key AS lang, MAX(nn) AS n,
           CAST(MAX(n_groups) AS BIGINT) AS n_groups,
           CAST(SUM(${graft.ops.Stats.entropyTermSql("cc", "nn")}) AS BIGINT)
             AS entropy_micro
         FROM tm GROUP BY 1"""),

    // pooled-variance z via the IDENTICAL zTestSql tree; the 5% flag
    // compares the ALREADY-ROUNDED z, so it replays deterministically
    "e45_ab_ztest" ->
      (s"""WITH u AS (SELECT user_id,
                  CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
                FROM events GROUP BY 1),
         v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(s) AS BIGINT) AS x
               FROM u GROUP BY 1),
         p AS (SELECT a.variant AS variant_a, a.n AS n_a, a.x AS x_a,
                 b.variant AS variant_b, b.n AS n_b, b.x AS x_b
               FROM v a JOIN v b ON a.variant < b.variant),
         z AS (SELECT *, ${graft.ops.Stats.zTestSql("x_a", "n_a", "x_b", "n_b")}
                 AS z FROM p)
         SELECT variant_a, n_a, x_a, variant_b, n_b, x_b, z,
           CASE WHEN z IS NULL THEN NULL
             ELSE CAST(ABS(z) >= 1.959964 AS INT) END AS significant
         FROM z"""),

    "g12_modularity" -> modularityOracle(),

    "g12s_modularity_slice" -> modularityOracle("WHERE o.o_custkey % 10 = 3"),

    "g2_triangles" -> trianglesOracle(),

    "g2s_triangles_slice" -> trianglesOracle("WHERE o.o_custkey % 10 = 3"),

    // the 1% centile gates — the 100× checks for the six graph
    // statistics whose 10%-slice replays are themselves slice-
    // quadratic in replica count (see copurchaseCentile)
    "g2s2_triangles_centile" -> trianglesOracle("WHERE o.o_custkey % 100 = 37"),
    "g12s2_modularity_centile" -> modularityOracle("WHERE o.o_custkey % 100 = 37"),
    "g11s2_assortativity_centile" ->
      assortativityOracle("WHERE o.o_custkey % 100 = 37"),
    "g14s2_clustering_coeff_centile" ->
      clusteringCoeffOracle("WHERE o.o_custkey % 100 = 37"),

    "g11_assortativity" -> assortativityOracle(),

    // the same graph statistics over the 10% customer slice — the 10×
    // checks for the co-purchase-graph spill-class oracles (g4/g11/
    // g12/g14's cp self-join exhausts DuckDB temp at 10×; the engine
    // side runs full-graph at every SF)
    "g11s_assortativity_slice" -> assortativityOracle("WHERE o.o_custkey % 10 = 3"),
    "g4s_label_prop_slice" ->
      (labelPropOracleCtes("WHERE o.o_custkey % 10 = 3") +
        "\n         SELECT node, label AS community FROM l3"),

    // g2's triangle CTEs + symmetrized degrees; the bp ratio is pure
    // integer (HUGEINT headroom), deg<2 filtered identically
    "g14_clustering_coeff" -> clusteringCoeffOracle(),

    "g14s_clustering_coeff_slice" ->
      clusteringCoeffOracle("WHERE o.o_custkey % 10 = 3"),

    // e38's season-shifted residuals through x37's MAD CTEs — the same
    // day arithmetic, the same histogram-rank medians, over residual
    // cents (negative values exercise the ABS deviations)
    "e49_seasonal_anomaly" ->
      """WITH ev AS (SELECT event_type AS key,
                  epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                FROM events),
         d AS (SELECT key, day, CAST(SUM(cents) AS BIGINT) AS a
               FROM ev GROUP BY 1, 2),
         r AS (SELECT d.key, d.a - p.a AS v
               FROM d JOIN d p ON d.key = p.key AND d.day = p.day + 7),
         vc AS (SELECT key, v, COUNT(*) AS c FROM r GROUP BY 1, 2),
         n AS (SELECT key, CAST(SUM(c) AS BIGINT) AS n,
                 (5000 * CAST(SUM(c) AS BIGINT) + 9999) // 10000 AS r
               FROM vc GROUP BY 1),
         rk AS (SELECT key, v, c, SUM(c) OVER (PARTITION BY key ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS hi FROM vc),
         med AS (SELECT rk.key, n.n, rk.v AS median_cents
                 FROM rk JOIN n USING (key)
                 WHERE rk.hi - rk.c + 1 <= n.r AND n.r <= rk.hi),
         dv AS (SELECT vc.key, ABS(vc.v - m.median_cents) AS d,
                  CAST(SUM(vc.c) AS BIGINT) AS c
                FROM vc JOIN med m USING (key) GROUP BY 1, 2),
         rd AS (SELECT key, d, c, SUM(c) OVER (PARTITION BY key ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS hi FROM dv),
         mad AS (SELECT rd.key, rd.d AS mad_cents FROM rd JOIN n USING (key)
                 WHERE rd.hi - rd.c + 1 <= n.r AND n.r <= rd.hi)
         SELECT vc.key AS event_type, MAX(m.n) AS n,
           MAX(m.median_cents) AS median_cents,
           MAX(mad.mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN ABS(vc.v - m.median_cents) > 3 * mad.mad_cents
             THEN vc.c ELSE 0 END) AS BIGINT) AS n_outliers,
           (10000 * CAST(SUM(CASE WHEN ABS(vc.v - m.median_cents)
               > 3 * mad.mad_cents THEN vc.c ELSE 0 END) AS BIGINT))
             // MAX(m.n) AS outlier_bp
         FROM vc JOIN med m USING (key) JOIN mad USING (key)
         GROUP BY 1""",

    "src5_partitioned_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         WHERE lang IN ('en', 'de')""",

    // the hashed classifier replayed exactly: same md5 bucketing, same
    // synthetic weight formula, integer score sum — engine-exact
    "t22_classifier" ->
      (classifierScoreCtes + """
         SELECT doc_id, n_features, score_fp,
           CASE WHEN score_fp >= 0 THEN 'keep' ELSE 'drop' END AS label
         FROM sc"""),

    // the whole pipeline replayed stage by stage from the PROVEN oracle
    // fragments (t21 gopher, d1 md5-min, d4/d6 exact-Jaccard + recursive
    // CC), then the per-language funnel — one hash gate over the
    // composition, the air1 discipline applied to the LLM tier
    "llm1_corpus_pipeline" -> llm1FunnelSql(""),
    // the centile replay: identical funnel over the mod-100 slice — the
    // tokenize/shingle CTEs shrink with the slice, so this oracle stays
    // tractable at 1000x where the full replay OOMs DuckDB
    "llm1s_funnel_centile" -> llm1FunnelSql("WHERE doc_id % 100 = 7"),

    // the t22 score replayed, quantized to the same 1000-fp grid
    // (// truncates toward zero exactly like Spark's div), then the
    // cumulative sweep over the bounded distinct-threshold grain:
    // tp/fp are DESC running sums, fn/tn derive from the one-row
    // totals, ratios are floored basis points
    "t33_pr_curve" ->
      (classifierScoreCtes + """,
         lab AS (SELECT (sc.score_fp // 1000) * 1000 AS score_fp,
                   (doc.lang = 'en') AS is_pos
                 FROM sc JOIN documents doc USING (doc_id)
                 WHERE doc.lang IS NOT NULL),
         ps AS (SELECT score_fp AS threshold_fp,
                  COUNT(CASE WHEN is_pos THEN 1 END) AS n_pos,
                  COUNT(CASE WHEN NOT is_pos THEN 1 END) AS n_neg
                FROM lab GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos,
                   CAST(SUM(n_neg) AS BIGINT) AS total_neg FROM ps),
         cum AS (SELECT threshold_fp,
                   CAST(SUM(n_pos) OVER (ORDER BY threshold_fp DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
                   CAST(SUM(n_neg) OVER (ORDER BY threshold_fp DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
                 FROM ps)
         SELECT threshold_fp, tp, fp,
           CAST(tot.total_pos - tp AS BIGINT) AS fn,
           CAST(tot.total_neg - fp AS BIGINT) AS tn,
           (10000 * tp) // (tp + fp) AS precision_bp,
           CASE WHEN tot.total_pos > 0 THEN (10000 * tp) // tot.total_pos
             ELSE NULL END AS recall_bp,
           (20000 * tp) // (tp + fp + tot.total_pos) AS f1_bp
         FROM cum, tot"""),

    "t24_bpe_train" -> bpeOracleSql(8),
    "t26_bpe_encode" -> bpeEncodeOracleSql(8),

    // chr() builds the SAME decomposed/control codepoints the query
    // injects; nfc_normalize is DuckDB's UAX#15 NFC — byte parity with
    // java.text.Normalizer is the contract under test
    "t25_normalize" ->
      """WITH dirty AS (
           SELECT doc_id,
             text ||
             CASE WHEN doc_id % 7 = 0
               THEN ' caf' || 'e' || chr(769) || ' ' || chr(7) || 'bel'
               ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
               THEN ' ' || chr(8491) || 'ngstro' || chr(776) || 'm line1' ||
                    chr(13) || chr(10) || 'line2' || chr(9) || 'and   done '
               ELSE '' END AS text
           FROM documents),
         norm AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(nfc_normalize(text),
               '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'), '[ \t]+', ' ', 'g')) AS norm_text
           FROM dirty)
         SELECT doc_id, norm_text, length(norm_text) AS n_chars FROM norm""",

    // identical IEEE expression tree: double(c2)·N / (double(cx)·cy),
    // ln, round to micro-nats — engine-exact like t19
    "t23_pmi" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         bg AS (SELECT unnest(list_transform(range(1, len(w)),
                  i -> struct_pack(w1 := w[i], w2 := w[i+1])), recursive := true)
                FROM d WHERE len(w) >= 2),
         cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
         cx AS (SELECT w1, COUNT(*) AS cx FROM bg GROUP BY 1),
         cy AS (SELECT w2, COUNT(*) AS cy FROM bg GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_bigrams FROM bg)
         SELECT w1, w2, c2,
           CAST(round(ln(CAST(c2 AS DOUBLE) * n_bigrams /
             (CAST(cx AS DOUBLE) * cy)) * 1000000, 0) AS BIGINT) AS pmi_fp
         FROM cb JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
         WHERE c2 >= 5""",

    // same manual disc-percentile formulation — integer rank targets,
    // so both engines pick the value at the identical rank
    // both row_number directions over the same (ts, event_id) total
    // order: the tie-proof open/close pick
    "e24_ohlc" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
                    FROM events),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts ASC, event_id ASC) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts DESC, event_id DESC) AS rd
               FROM b)
         SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM r GROUP BY 1, 2""",

    // x15's integer rank targets pick the cut values; clipping and the
    // counts replay exactly
    "x24_winsorize" ->
      """WITH r AS (SELECT event_type, value,
                      CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS rn,
                      COUNT(*) OVER (PARTITION BY event_type) AS n
                    FROM events),
         c AS (SELECT event_type,
                 MAX(CASE WHEN rn = (500 * n + 9999) // 10000 THEN value END) AS p05,
                 MAX(CASE WHEN rn = (9500 * n + 9999) // 10000 THEN value END) AS p95
               FROM r GROUP BY 1)
         SELECT r.event_type, MAX(c.p05) AS p05, MAX(c.p95) AS p95,
           CAST(SUM(CASE WHEN r.value < c.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN r.value > c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CAST(LEAST(GREATEST(r.value, c.p05), c.p95) AS DECIMAL(18,2))) AS DOUBLE) AS sum_wins
         FROM r JOIN c USING (event_type) GROUP BY 1""",

    "x15_percentiles" ->
      """WITH r AS (SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, MAX(n) AS n,
           MAX(CASE WHEN rn = (5000 * n + 9999) // 10000 THEN value END) AS p50,
           MAX(CASE WHEN rn = (9000 * n + 9999) // 10000 THEN value END) AS p90,
           MAX(CASE WHEN rn = (9900 * n + 9999) // 10000 THEN value END) AS p99
         FROM r GROUP BY event_type""",

    // the sketch GUARANTEE is the oracle: membership of every true
    // heavy hitter is certain (in_sketch ≡ 1); weights never cross
    "x17_heavy_hitters" ->
      """WITH it AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_orderkey % 8
                                 ELSE 1000000 + l_orderkey // 2 END AS item
                     FROM lineitem),
         ex AS (SELECT item, COUNT(*) AS cnt FROM it GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_total FROM it)
         SELECT item, cnt, n_total, 1 AS in_sketch
         FROM ex CROSS JOIN n WHERE cnt * 51 > n_total""",

    // exact side recomputed per event_type; the MG guarantees (heavy
    // item present, estimate in the floor band) are the literal-1 gates
    "e46_stream_heavy_hitters" ->
      """WITH it AS (SELECT event_type AS key,
                  CASE WHEN user_id % 2 = 0 THEN user_id % 8
                       ELSE 1000000 + user_id // 2 END AS item
                FROM events),
         ex AS (SELECT key, item, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM it GROUP BY 1, 2),
         n AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_exact
               FROM it GROUP BY 1)
         SELECT ex.key, CAST(ex.item AS BIGINT) AS item, ex.cnt, n.n_exact,
           1 AS in_sketch, 1 AS est_ok
         FROM ex JOIN n USING (key) WHERE ex.cnt * 51 > n.n_exact""",

    // exact side recomputed; the sketch guarantee is the literal-1 gate
    "x32_approx_pct_gate" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, 1 AS rank_ok
         FROM events GROUP BY 1""",

    "x31_listagg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
           string_agg(o_orderstatus, ''
             ORDER BY strftime(o_orderdate, '%Y-%m-%d'), o_orderkey) AS status_history
         FROM orders WHERE o_custkey % 25 = 0
         GROUP BY o_custkey""",

    "x30_window_dist" ->
      """SELECT o_custkey, o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
         FROM orders WHERE o_custkey % 10 = 0
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""",

    "x29_table_diff" ->
      """WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS v FROM orders),
         dst AS (SELECT k, CASE WHEN k % 13 = 0 THEN 'X' ELSE v END AS v
                 FROM src WHERE k % 97 <> 0
                 UNION ALL
                 SELECT k + 1000000000, v FROM src WHERE k % 5 = 0)
         SELECT CASE WHEN a.k IS NULL THEN 'added'
                     WHEN b.k IS NULL THEN 'removed'
                     WHEN a.v <> b.v THEN 'changed'
                     ELSE 'same' END AS diff_type,
           COUNT(*) AS n
         FROM src a FULL OUTER JOIN dst b ON a.k = b.k
         GROUP BY 1""",

    // same canonical serialization, same md5-prefix hash, same
    // sum-mod fold — the digest must agree engine to engine
    "x28_table_checksum" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
                       o_orderstatus, o_orderpriority)), 1, 15))::BIGINT)
                % 4611686018427387904 AS BIGINT) AS checksum
         FROM orders""",

    // the same recursion, dialect-translated (div -> //)
    "x26_recursive_cte" ->
      """WITH RECURSIVE anc AS (
           SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
           FROM customer WHERE c_custkey < 10
           UNION ALL
           SELECT c.c_custkey, anc.root, anc.depth + 1
           FROM customer c JOIN anc ON c.c_custkey // 10 = anc.node
           WHERE c.c_custkey >= 10
         )
         SELECT node, root, CAST(depth AS BIGINT) AS depth FROM anc""",

    // IDENTICAL closed-form tree via Stats.corrSql (single definition,
    // both engines); DuckDB sums in HUGEINT — exact 128-bit like the
    // engine's decimal(38,0) sums
    "x35_corr_matrix" -> corrMatrixOracle,

    "x36_l_diversity" ->
      """SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS group_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           CASE WHEN COUNT(DISTINCT c_mktsegment) >= 3 THEN 1 ELSE 0 END AS l_ok
         FROM customer GROUP BY 1, 2""",

    "x27_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS group_size,
           CASE WHEN COUNT(*) >= 5 THEN 1 ELSE 0 END AS k_ok
         FROM customer GROUP BY 1, 2, 3""",

    // the deterministic side recomputed (group count, exact distinct);
    // the sketch gates are Spark-side guarantees, literal-1 like the
    // recall gates
    "x25_hll_union" ->
      """SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_global,
           1 AS union_close_direct, 1 AS per_group_ok, 1 AS global_ok
         FROM lineitem""",

    // each constraint replayed as its defining aggregate; integer
    // metrics (counts, surpluses, floored basis points) only
    "x23_dq_report" ->
      """SELECT check_name, CAST(metric AS BIGINT) AS metric, passed FROM (
         SELECT 'row_count' AS check_name, CAST(COUNT(*) AS BIGINT) AS metric,
           CASE WHEN COUNT(*) >= 1 THEN 1 ELSE 0 END AS passed FROM orders
         UNION ALL
         SELECT 'completeness_o_custkey',
           10000 * COUNT(o_custkey) // GREATEST(COUNT(*), 1),
           CASE WHEN 10000 * COUNT(o_custkey) // GREATEST(COUNT(*), 1) >= 10000
                THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'completeness_o_orderdate',
           10000 * COUNT(o_orderdate) // GREATEST(COUNT(*), 1),
           CASE WHEN 10000 * COUNT(o_orderdate) // GREATEST(COUNT(*), 1) >= 10000
                THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'uniqueness_o_orderkey', COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey),
           CASE WHEN COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey) THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'uniqueness_o_custkey', COUNT(o_custkey) - COUNT(DISTINCT o_custkey),
           CASE WHEN COUNT(o_custkey) = COUNT(DISTINCT o_custkey) THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'bounds_o_totalprice',
           COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END), 0),
           CASE WHEN COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END), 0) = 0
                THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'accepted_o_orderstatus',
           COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END), 0),
           CASE WHEN COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END), 0) = 0
                THEN 1 ELSE 0 END
         FROM orders
         UNION ALL
         SELECT 'ref_orders_customer',
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL),
           CASE WHEN (SELECT COUNT(*) FROM orders o
                      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) = 0
                THEN 1 ELSE 0 END
         )""",

    // every CMS counter replayed exactly: counter[j][b] = Σ counts of
    // items hashing to b in row j, estimate = min over rows
    "x22_countmin" ->
      """WITH it AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_orderkey % 8
                                 ELSE 1000000 + l_orderkey // 2 END AS item
                     FROM lineitem),
         cn AS (SELECT item, COUNT(*) AS cnt FROM it GROUP BY 1),
         probes AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7,
                                   1000005, 1000123, 999999, 1234567]) AS item),
         js AS (SELECT unnest(generate_series(0, 3)) AS j),
         db AS (SELECT js.j,
                  ('0x' || substr(md5(js.j::VARCHAR || ':' || cn.item::VARCHAR), 1, 8))::BIGINT
                    % 256 AS b,
                  SUM(cn.cnt) AS cell
                FROM cn CROSS JOIN js GROUP BY 1, 2),
         pb AS (SELECT p.item, js.j,
                  ('0x' || substr(md5(js.j::VARCHAR || ':' || p.item::VARCHAR), 1, 8))::BIGINT
                    % 256 AS b
                FROM probes p CROSS JOIN js),
         es AS (SELECT pb.item, MIN(COALESCE(db.cell, 0)) AS est
                FROM pb LEFT JOIN db ON db.j = pb.j AND db.b = pb.b
                GROUP BY 1)
         SELECT CAST(es.item AS BIGINT) AS item, CAST(es.est AS BIGINT) AS est,
           CAST(COALESCE(cn.cnt, 0) AS BIGINT) AS cnt,
           CASE WHEN es.est >= COALESCE(cn.cnt, 0) THEN 1 ELSE 0 END AS no_underestimate
         FROM es LEFT JOIN cn ON cn.item = es.item""",

    "e18_scd2" ->
      """SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderstatus,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS eff_from,
           strftime(LEAD(o_orderdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS eff_to,
           CASE WHEN LEAD(o_orderdate, 1) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    // mirrors resampleLocf: per-user hourly buckets (exact decimal
    // sums), per-user grid span, LOCF via last_value IGNORE NULLS
    "e19_gapfill" ->
      """WITH obs AS (
           SELECT user_id, date_trunc('hour', ts::TIMESTAMP) AS bucket,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' AND user_id % 5 = 0
           GROUP BY 1, 2),
         span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
                  FROM obs GROUP BY 1),
         grid AS (SELECT user_id,
                    unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
                  FROM span)
         SELECT g.user_id, strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           (o.v IS NULL) AS is_gap
         FROM grid g LEFT JOIN obs o
           ON g.user_id = o.user_id AND g.bucket = o.bucket""",

    // e24's window formulation restated per (type, hour) — if the pick
    // aggregates and the row_number picks ever disagreed, this hash
    // would catch it
    "e27_streaming_ohlc" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
                    FROM events),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts ASC, event_id ASC) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts DESC, event_id DESC) AS rd
               FROM b)
         SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM r GROUP BY 1, 2""",

    // the same first-purchase anchor, the same U-split with the
    // remainder pinned to the earliest middle
    "e28_multi_touch" ->
      """WITH conv AS (SELECT user_id, MIN(ts) AS conv_ts
                       FROM (SELECT user_id, ts,
                               ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn
                             FROM events WHERE event_type = 'purchase')
                       WHERE rn = 1 GROUP BY user_id),
         t AS (SELECT e.user_id, e.event_id, e.ts
               FROM events e JOIN conv USING (user_id)
               WHERE e.event_type IN ('view', 'click')
                 AND e.ts < conv.conv_ts
                 AND e.ts >= conv.conv_ts - INTERVAL 7 DAY),
         r AS (SELECT user_id, event_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS BIGINT) AS pos,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
               FROM t)
         SELECT user_id, event_id, pos, CAST(n AS BIGINT) AS n_touches,
           CAST(CASE WHEN n = 1 THEN 10000
                     WHEN n = 2 THEN 5000
                     WHEN pos = 1 OR pos = n THEN 4000
                     WHEN pos = 2 THEN 2000 // (n - 2) + 2000 % (n - 2)
                     ELSE 2000 // (n - 2) END AS BIGINT) AS credit_bp
         FROM r""",

    "e25_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS v FROM orders),
         log AS (SELECT k, 1 AS seq, 'I' AS op, v FROM base
                 UNION ALL
                 SELECT k, 2, 'U', v || '2' FROM base WHERE k % 3 = 0
                 UNION ALL
                 SELECT k, 3, 'D', NULL FROM base WHERE k % 7 = 0),
         r AS (SELECT k, seq, op, v,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC, op DESC) AS rn
               FROM log)
         SELECT k, op AS last_op, v FROM r WHERE rn = 1 AND op <> 'D'""",

    "e26_sequence_gaps" ->
      """WITH e AS (SELECT user_id, event_id FROM events WHERE event_id % 11 <> 0),
         l AS (SELECT user_id, event_id,
                 LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id
               FROM e)
         SELECT user_id, prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
           event_id - prev_id - 1 AS n_missing
         FROM l WHERE prev_id IS NOT NULL AND event_id > prev_id + 1""",

    // the same sweep-line windows replayed: running-max-of-ends island
    // flags, running-sum island ids, per-island collapse
    "e23_interval_coverage" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
                     FROM events WHERE user_id % 3 = 0),
         m AS (SELECT user_id, s, e,
                 MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
               FROM iv),
         fl AS (SELECT user_id, s, e,
                  CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni FROM m),
         isl AS (SELECT user_id, s, e,
                   SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                 FROM fl),
         g AS (SELECT user_id, island, MIN(s) AS i_s, MAX(e) AS i_e FROM isl GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(i_e - i_s) AS BIGINT) AS covered_us,
           CAST(MAX(i_e) - MIN(i_s) AS BIGINT) AS span_us
         FROM g GROUP BY 1""",

    // bounds cross as strings — doubles through DECIMAL(18,2) (shortest-
    // double formatting is engine-specific; fixed-scale strings are not)
    "x14_profile" ->
      """SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_non_null, COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
         FROM orders
         UNION ALL
         SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
         FROM orders""",

    // FLOOR of the double division (never a double->int cast: Spark
    // truncates, DuckDB rounds); both engines divide identically
    "e17_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
         CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) * 50000 AS bin_lo,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders WHERE o_totalprice IS NOT NULL
         GROUP BY 1""",

    "x13_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority), ())""",

    "w1_window_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity) AS rn
           FROM lineitem) WHERE rn = 1""",

    "s1_scalar_transforms" ->
      """SELECT o_orderkey,
         ABS(o_totalprice - 250000.0) AS abs_diff,
         CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         strftime(o_orderdate, '%Y/%m/%d') AS od_str,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HOT' ELSE 'COLD' END AS pri_class,
         UPPER(SUBSTR(o_orderstatus,1,1)) || '-' || LOWER(o_orderpriority) AS status_tag
         FROM orders""",

    "s4_datetime_funcs" ->
      """SELECT o_orderkey,
         date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_ref,
         strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
         strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
         FROM orders""",

    "a4_array_funcs" ->
      """WITH d AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\s+') AS w FROM documents)
         SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         array_to_string(w[1:3], ' ') AS first3,
         list_sort(w)[1] AS alpha_first,
         list_contains(w, 'the') AS has_the,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
         FROM d""",

    "s2_obfuscate" ->
      """WITH t AS (SELECT c_custkey, c_name || ' ' || c_mktsegment AS f FROM customer),
         u AS (SELECT c_custkey, split_part(f,' ',1) AS fn,
                      substr(f, strpos(f,' ')+1) AS ln FROM t)
         SELECT c_custkey,
           fn || ' ' || array_to_string(list_transform(split(ln, ''),
             c -> CASE WHEN c = substr(ln,1,1) OR c = ' ' THEN c ELSE '*' END), '') AS masked
         FROM u""",

    "x11_bucketed_join" ->
      """SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "x12_salted_join" ->
      """SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "x1_distinct_agg" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT l_partkey) AS n_part,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",

    "x2_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",

    "x3_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "w2_analytics" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS prev_price,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
         CAST(RANK() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "j4_correlated_scalar" ->
      """SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) *
           (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
         > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) FROM orders i
            WHERE i.o_custkey = o.o_custkey) AS above_avg
         FROM orders o""",

    "s3_string_funcs" ->
      """SELECT p_partkey,
         lpad(p_brand, 12, '#') AS padded,
         regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
         translate(p_type, 'AEIOU', 'aeiou') AS folded,
         concat_ws('::', p_brand, p_type) AS joined,
         CAST(length(p_name) AS BIGINT) AS name_len,
         substr(p_name, 1, 5) AS prefix5
         FROM part""",

    "x6_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.5) AS median_qty,
         quantile_cont(l_extendedprice, 0.25) AS q1_price,
         quantile_cont(l_extendedprice, 0.75) AS q3_price
         FROM lineitem GROUP BY l_returnflag""",

    "x8_pivot" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
         FROM orders GROUP BY o_orderpriority""",

    "x9_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    "x10_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""",

    "s5_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
         sqrt(l_quantity) AS sqrt_qty,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
         CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
         l_partkey % 97 AS pk_mod,
         CASE WHEN l_quantity - 25.0 > 0 THEN 1.0
              WHEN l_quantity - 25.0 < 0 THEN -1.0 ELSE 0.0 END AS qty_sign
         FROM lineitem""",

    "air1_mart_pipeline" ->
      """WITH venta AS (
           SELECT 'AA' AS codigo_aerolinea,
             'AV' || (o_orderkey % 3) AS cod_avion,
             'S' || (o_orderkey % 100) AS asiento,
             CASE WHEN o_orderkey % 97 = 0 THEN 'DX' || o_custkey
                  ELSE 'D' || o_custkey END AS dni,
             CASE WHEN o_orderkey % 7 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS monto,
             o_orderstatus AS estado,
             TIMESTAMP '2020-10-19 00:00:00' + to_seconds(o_orderkey) AS fecha_reserva,
             TIMESTAMP '2020-10-19 01:00:00' + to_seconds(o_orderkey) AS fecha_compra,
             o_orderpriority AS categoria
           FROM orders),
         pasajero AS (
           SELECT 'D' || c_custkey AS dni,
             c_name || ' ' || c_mktsegment AS nombre_completo,
             c_name || '@mail.test' AS correo_electronico,
             'Calle ' || c_nationkey AS direccion,
             CAST('569' || c_custkey || c_nationkey AS BIGINT) AS telefono,
             make_date(1940 + c_custkey % 70, 1 + c_custkey % 12, 1 + c_custkey % 28)
               AS fecha_de_nacimiento
           FROM customer),
         vuelo(cod_avion, capacidad, cod_tripulacion, cod_piloto, cod_vuelo,
               horario_salida, horario_llegada) AS (
           VALUES ('AV0','180','T9','P1','V100','08:00','10:00'),
                  ('AV0','180','T2','P2','V100','08:00','10:00'),
                  ('AV0','200','T5','P3','V200','09:00','11:00'),
                  ('AV1','150','T1','P4','V300','10:00','12:00'),
                  ('AV2','150','T3','P5','V400','11:00','13:00'),
                  ('AVX','100','T7','P6','V500','12:00','14:00')),
         v1 AS (SELECT *, ROW_NUMBER() OVER
                  (PARTITION BY cod_vuelo ORDER BY cod_tripulacion) AS rn FROM vuelo),
         v2 AS (SELECT *, ROW_NUMBER() OVER
                  (PARTITION BY cod_avion ORDER BY cod_vuelo, cod_tripulacion) AS rn2
                FROM v1 WHERE rn = 1),
         vd AS (SELECT cod_avion, capacidad, cod_tripulacion, cod_piloto, cod_vuelo,
                  horario_salida, horario_llegada FROM v2 WHERE rn2 = 1),
         mart AS (
           SELECT v.codigo_aerolinea, v.cod_avion, v.asiento, v.dni,
             abs(v.monto) AS monto, v.estado, v.fecha_reserva, v.fecha_compra,
             v.categoria, f.capacidad, f.cod_tripulacion, f.cod_piloto, f.cod_vuelo,
             f.horario_salida, f.horario_llegada,
             CASE WHEN p.nombre_completo IS NULL THEN NULL
               ELSE split_part(p.nombre_completo, ' ', 1) || ' ' ||
                 regexp_replace(
                   substr(p.nombre_completo, strpos(p.nombre_completo, ' ') + 1),
                   '[^' || substr(substr(p.nombre_completo, strpos(p.nombre_completo, ' ') + 1), 1, 1) || ' ]',
                   '*', 'g')
             END AS nombre_completo,
             p.correo_electronico, p.direccion, p.telefono, p.fecha_de_nacimiento
           FROM venta v
           LEFT JOIN pasajero p ON v.dni = p.dni
           LEFT JOIN vd f ON v.cod_avion = f.cod_avion),
         quota AS (SELECT cod_vuelo, CAST(floor(COUNT(*) / 20) AS BIGINT) * 3 AS quota_left
                   FROM mart GROUP BY cod_vuelo),
         aged AS (SELECT m.*, CASE WHEN fecha_de_nacimiento IS NOT NULL
                    THEN 2020 - year(fecha_de_nacimiento) END AS anios FROM mart m),
         ranked AS (SELECT a.*,
             SUM(CASE WHEN anios IS NOT NULL AND (anios < 14 OR anios > 60)
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY cod_vuelo ORDER BY dni, fecha_reserva
                     ROWS UNBOUNDED PRECEDING) AS elig_rank
           FROM aged a),
         fin AS (SELECT r.*, q.quota_left,
             CASE WHEN anios IS NULL OR COALESCE(q.quota_left, 0) <= 0 THEN NULL
                  WHEN (anios < 14 OR anios > 60) AND elig_rank <= q.quota_left THEN
                    CASE WHEN anios < 14 THEN 'ASISTENCIA_PREFERENCIAL'
                         ELSE 'ASIENTO_PREFERENCIAL' END
                  WHEN anios < 14 OR anios > 60 THEN NULL
                  ELSE 'NO APLICA' END AS compensacion
           FROM ranked r LEFT JOIN quota q USING (cod_vuelo))
         SELECT codigo_aerolinea, cod_avion, asiento, dni, monto, estado,
           strftime(fecha_reserva, '%Y-%m-%d %H:%M:%S') AS fecha_reserva,
           strftime(fecha_compra, '%Y-%m-%d %H:%M:%S') AS fecha_compra,
           categoria, capacidad, cod_tripulacion, cod_piloto, cod_vuelo,
           horario_salida, horario_llegada, nombre_completo, correo_electronico,
           direccion, telefono,
           strftime(fecha_de_nacimiento, '%Y-%m-%d') AS fecha_de_nacimiento,
           compensacion
         FROM fin""",

    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_hash,
         MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY md5(text)""",

    // d2 emits exactly the pairs with true n-gram Jaccard >= 0.8: LSH
    // banding (k=128, b=32, r=4) has candidate-recall 1-(1-0.8^4)^32 ~
    // 1-5e-8 at the threshold, and every candidate is verified with the
    // exact Jaccard — so the exact-pairs oracle applies (verified
    // missed=0/extra=0 vs ngramJaccardPairs at sf0.01 and sf0.1).
    "d2_minhash_neardup" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
                    FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         sz AS (SELECT doc_id, len(s) AS n FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY x.doc_id, y.doc_id)
         SELECT id_a, id_b, ROUND(i / (na.n + nb.n - i), 6) AS jaccard
         FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
         WHERE i / (na.n + nb.n - i) >= 0.8""",

    "d6_dedup_clusters" -> d6Oracle("documents"),

    // the fused-collapse cluster gate over the dense replica corpus
    // (see denseDocsSql); the closure's cliques contract to the same
    // per-doc labels the engine's rep-level CC + expansion assigns
    "d6c_dedup_clusters_dense" -> d6Oracle(denseDocsSql),

    // d6 over the deterministic 10% doc slice — the tractable 10×
    // replay of the spill-class full-corpus closure
    "d6s_dedup_clusters_slice" ->
      d6Oracle("(SELECT * FROM documents WHERE doc_id % 10 = 3)"),

    // simhash64 recomputed EXACTLY: per-token FNV-1a/64 as a byte fold
    // (UBIGINT xor + HUGEINT modular multiply emulate the wrapping
    // 64-bit arithmetic), per-bit +/-1 votes, two's-complement signature,
    // then the all-pairs hamming<=3 filter — which the engine's
    // pigeonhole candidate generation provably equals.
    "d3_simhash_neardup" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tk
           FROM documents WHERE text IS NOT NULL),
         hashes AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(14695981039346656037::UBIGINT,
                 list_transform(range(octet_length(encode(tk))),
                   i -> ('0x' || substr(hex(encode(tk)), CAST(2*i+1 AS INT), 2))::UBIGINT)),
               (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                              % 18446744073709551616 AS UBIGINT)) AS h
           FROM tok),
         votes AS (
           SELECT doc_id, k,
             SUM(CASE WHEN (h >> CAST(k AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM hashes, range(64) t(k)
           GROUP BY doc_id, k),
         sig0 AS (
           SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN
               CASE WHEN k = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << CAST(k AS INT)) END
               ELSE 0 END) AS BIGINT) AS sig
           FROM votes GROUP BY doc_id),
         sigs AS (
           SELECT d.doc_id, COALESCE(s.sig, 0) AS sig
           FROM documents d LEFT JOIN sig0 s USING (doc_id)
           WHERE d.text IS NOT NULL)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3""",

    "d4_ngram_jaccard" -> d4Oracle("documents"),

    // the dense-corpus collapse gates: d4's own SQL over the replicated
    // slice (see denseDocsSql); d2c shares it through the LSH==exact
    // contract
    "d4c_ngram_jaccard_dense" -> d4Oracle(denseDocsSql),
    "d2c_minhash_dense" -> d4Oracle(denseDocsSql),

    // the exact-Jaccard truth count (d4's CTEs) plus the theorem gates:
    // divisibility-chain tiers are nested/monotone by construction, and
    // the full 32-band tier recovers the truth set (the d2 contract,
    // verified exhaustively at both test SFs)
    "d16_minhash_sweep" -> d16Oracle("documents"),

    // the same report over the deterministic 10% doc slice — the 10×
    // check for the spill-class oracle (the full-corpus truth CTE
    // spills ~77 GB DuckDB-side at 10×; the slice keeps whole replica
    // groups because the replica stride is a multiple of 10, so the
    // duplicate structure survives intact)
    "d16s_band_sweep_slice" ->
      d16Oracle("(SELECT * FROM documents WHERE doc_id % 10 = 3)"),

    "t1_text_stats" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio
         FROM documents""",

    // e1's session CTE verbatim over the bot-augmented stream, rolled
    // to rate-gated sessions
    "e29_bot_sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t FROM events
                    UNION ALL
                    SELECT -user_id - 1, event_id,
                      make_timestamp(1704067200000000 + (event_id % 20) * 1000000)
                    FROM events WHERE user_id % 97 = 0),
         x AS (SELECT user_id, event_id, t,
           CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                  OR epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) > 3600000000
                THEN 1 ELSE 0 END AS st
           FROM e),
         s AS (SELECT user_id, t,
           CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM x),
         agg AS (SELECT user_id, session_seq, COUNT(*) AS n_events,
                   MIN(epoch_us(t)) AS t0, MAX(epoch_us(t)) AS t1
                 FROM s GROUP BY 1, 2)
         SELECT user_id, session_seq, n_events,
           CAST(t1 - t0 AS BIGINT) AS duration_us
         FROM agg
         WHERE n_events >= 5 AND t1 - t0 < (n_events - 1) * 2000000""",

    "e30_markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS t FROM events),
         pr AS (SELECT event_type AS from_type,
                  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS to_type
                FROM e),
         c AS (SELECT from_type, to_type, COUNT(*) AS n
               FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                CAST((n * 10000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_bp
         FROM c""",

    // t2's scoring CTE rolled up to (labeled, predicted) counts
    "t31_langid_confusion" ->
      """WITH d AS (SELECT doc_id, lang, text,
           regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sc AS (SELECT doc_id, lang, text,
           len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and'))
             + len(list_filter(w, x -> x = 'of')) + len(list_filter(w, x -> x = 'to'))
             + len(list_filter(w, x -> x = 'a')) AS s_en,
           len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'la'))
             + len(list_filter(w, x -> x = 'de')) + len(list_filter(w, x -> x = 'que'))
             + len(list_filter(w, x -> x = 'los')) AS s_es,
           len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'les'))
             + len(list_filter(w, x -> x = 'des')) + len(list_filter(w, x -> x = 'et'))
             + len(list_filter(w, x -> x = 'une')) AS s_fr,
           len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die'))
             + len(list_filter(w, x -> x = 'und')) + len(list_filter(w, x -> x = 'das'))
             + len(list_filter(w, x -> x = 'ein')) AS s_de
           FROM d),
         p AS (SELECT lang AS labeled,
           CASE WHEN text IS NULL THEN NULL
                WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
                WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
                ELSE 'und' END AS predicted
           FROM sc)
         SELECT labeled, predicted, COUNT(*) AS n FROM p GROUP BY 1, 2""",

    // bounded Bellman–Ford == 3 unrolled relax-and-min rounds over the
    // same integer weights (g1's unrolling recipe, min instead of sum)
    "g6_sssp" ->
      """WITH p AS (SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b,
                      MIN(CAST(l_quantity AS BIGINT)) AS w
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    GROUP BY 1, 2),
         e AS (SELECT a AS src, b AS dst, w FROM p
               UNION ALL SELECT b, a, w FROM p),
         d0 AS (SELECT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS dist
                FROM supplier WHERE s_suppkey % 10 = 0),
         d1 AS (SELECT node, MIN(dist) AS dist FROM (
                  SELECT node, dist FROM d0
                  UNION ALL SELECT e.dst, d0.dist + e.w FROM d0 JOIN e ON e.src = d0.node)
                GROUP BY node),
         d2 AS (SELECT node, MIN(dist) AS dist FROM (
                  SELECT node, dist FROM d1
                  UNION ALL SELECT e.dst, d1.dist + e.w FROM d1 JOIN e ON e.src = d1.node)
                GROUP BY node),
         d3 AS (SELECT node, MIN(dist) AS dist FROM (
                  SELECT node, dist FROM d2
                  UNION ALL SELECT e.dst, d2.dist + e.w FROM d2 JOIN e ON e.src = d2.node)
                GROUP BY node)
         SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist FROM d3""",

    // day − row_number() is constant exactly while days are consecutive;
    // both engines floor the positive epoch division
    "e31_streaks" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS t FROM events),
         d AS (SELECT DISTINCT user_id, epoch_us(t) // 86400000000 AS day FROM e),
         r AS (SELECT user_id, day,
                 day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
               FROM d),
         st AS (SELECT user_id, island, COUNT(*) AS len, MIN(day) AS start_day
                FROM r GROUP BY 1, 2),
         mx AS (SELECT user_id, MAX(len) AS longest FROM st GROUP BY 1)
         SELECT st.user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(MIN(CASE WHEN len = longest THEN start_day END) AS BIGINT)
             AS longest_streak_start_day
         FROM st JOIN mx USING (user_id) GROUP BY 1""",

    // exact integer OLS sums; the positive-mod subtraction makes the
    // floored // and Spark's truncating div agree on negative slopes
    "e32_trend" ->
      """WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day
                    FROM events),
         d0 AS (SELECT MIN(day) AS day0 FROM e),
         daily AS (SELECT event_type, day - day0 AS x, COUNT(*) AS y
                   FROM e, d0 GROUP BY 1, 2),
         a AS (SELECT event_type, COUNT(*) AS n_points, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy_raw, SUM(x * x) AS sxx_raw
               FROM daily GROUP BY 1),
         b AS (SELECT event_type, n_points,
                 n_points * sxy_raw - sx * sy AS sxy,
                 n_points * sxx_raw - sx * sx AS sxx
               FROM a)
         SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
           CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
           CAST(CASE WHEN sxx = 0 THEN NULL ELSE
             (sxy * 1000000 - ((sxy * 1000000 % sxx + sxx) % sxx)) // sxx END
             AS BIGINT) AS slope_micro
         FROM b""",

    // the same daily series, all pairwise slopes with the positive-mod
    // floor, then the exact lower nearest-rank median over the slope
    // histogram
    "e50_theil_sen" ->
      """WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day
                    FROM events),
         d0 AS (SELECT MIN(day) AS day0 FROM e),
         daily AS (SELECT event_type, day - day0 AS x, COUNT(*) AS y
                   FROM e, d0 GROUP BY 1, 2),
         pr AS (SELECT a.event_type AS key,
                  ((b.y - a.y) * 1000000 -
                   (((b.y - a.y) * 1000000 % (b.x - a.x) + (b.x - a.x)) % (b.x - a.x)))
                    // (b.x - a.x) AS slope
                FROM daily a JOIN daily b
                  ON a.event_type = b.event_type AND b.x > a.x),
         h AS (SELECT key, slope, COUNT(*) AS c FROM pr GROUP BY 1, 2),
         rk AS (SELECT key, slope, c,
                  SUM(c) OVER (PARTITION BY key ORDER BY slope
                    ROWS UNBOUNDED PRECEDING) AS hi,
                  SUM(c) OVER (PARTITION BY key) AS n
                FROM h)
         SELECT key AS event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN (n + 1) // 2 BETWEEN hi - c + 1 AND hi
             THEN slope END) AS BIGINT) AS ts_slope_micro
         FROM rk GROUP BY 1""",

    // portable integer dow, ≤7 rows per key, peak = (max n, min dow)
    "e55_dow_profile" ->
      """WITH c AS (SELECT event_type,
                  ((epoch_us(ts::TIMESTAMP) // 86400000000) + 4) % 7 AS dow,
                  COUNT(*) AS n
                FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, dow, n,
                 SUM(n) OVER (PARTITION BY event_type) AS tot,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY n DESC, dow ASC) AS rk
               FROM c),
         p AS (SELECT event_type, dow AS peak_dow FROM w WHERE rk = 1)
         SELECT w.event_type, CAST(dow AS BIGINT) AS dow,
           CAST(n AS BIGINT) AS n,
           (10000 * CAST(n AS BIGINT)) // CAST(tot AS BIGINT) AS share_bp,
           CASE WHEN dow = peak_dow THEN 1 ELSE 0 END AS is_peak
         FROM w JOIN p USING (event_type)""",

    // canonicalized distinct edge sets per period, one full-outer set
    // comparison, integer churn counts + stability Jaccard
    "g19_edge_churn" ->
      """WITH base AS (SELECT o_custkey AS a, l_suppkey AS b, o_orderdate
                       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         ea AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
                FROM base WHERE o_orderdate < '1998-01-01'),
         eb AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
                FROM base WHERE o_orderdate >= '1998-01-01'),
         j AS (SELECT COALESCE(ea.u, eb.u) AS u, COALESCE(ea.v, eb.v) AS v,
                 CASE WHEN ea.u IS NOT NULL THEN 1 ELSE 0 END AS in_a,
                 CASE WHEN eb.u IS NOT NULL THEN 1 ELSE 0 END AS in_b
               FROM ea FULL OUTER JOIN eb ON ea.u = eb.u AND ea.v = eb.v)
         SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
           CAST(SUM(in_b) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CASE WHEN SUM(in_a) + SUM(in_b)
                  - SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) > 0
             THEN (10000 * CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT))
               // CAST(SUM(in_a) + SUM(in_b)
                  - SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           END AS jaccard_bp
         FROM j""",

    // the same daily series; S = Σ sgn pairs and the tie-corrected
    // 18·Var(S) are exact integers, the continuity-corrected z goes
    // through the SAME mkZSql IEEE tree the engine evaluates
    "e51_mann_kendall" ->
      s"""WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day
                     FROM events),
         d0 AS (SELECT MIN(day) AS day0 FROM e),
         daily AS (SELECT event_type, day - day0 AS x, COUNT(*) AS y
                   FROM e, d0 GROUP BY 1, 2),
         pr AS (SELECT a.event_type AS key,
                  CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
                FROM daily a JOIN daily b
                  ON a.event_type = b.event_type AND b.x > a.x),
         sa AS (SELECT key, SUM(sgn) AS s_stat FROM pr GROUP BY 1),
         t AS (SELECT event_type AS key, y, COUNT(*) AS c FROM daily GROUP BY 1, 2),
         ties AS (SELECT key, SUM(c) AS n_points,
                    SUM(c * (c - 1) * (2 * c + 5)) AS tsum FROM t GROUP BY 1),
         f AS (SELECT ties.key, n_points, COALESCE(s_stat, 0) AS s_stat,
                 n_points * (n_points - 1) * (2 * n_points + 5) - tsum AS var18
               FROM ties LEFT JOIN sa ON ties.key = sa.key),
         g AS (SELECT key, n_points, s_stat, var18,
                 CASE WHEN s_stat > 0 THEN s_stat - 1
                      WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS s_adj
               FROM f)
         SELECT key AS event_type, CAST(n_points AS BIGINT) AS n_points,
           CAST(s_stat AS BIGINT) AS s_stat, CAST(var18 AS BIGINT) AS var18,
           CASE WHEN var18 > 0 THEN
             ${graft.ops.TimeSeries.mkZSql("s_adj", "var18")} END AS z_micro
         FROM g""",

    // 2× integer midranks over the per-key value histogram, doubled
    // rank sum → 2U, tie-corrected integer variance ratio, z through
    // the SAME rankZSql IEEE tree the engine evaluates
    "e52_mann_whitney" ->
      s"""WITH v AS (SELECT event_type AS key, user_id % 2 = 0 AS t,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM events
                WHERE value IS NOT NULL AND user_id IS NOT NULL),
         h AS (SELECT key, v, COUNT(*) AS c,
                 SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ca
               FROM v GROUP BY 1, 2),
         r AS (SELECT key, c, ca,
                 SUM(c) OVER (PARTITION BY key ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS hi
               FROM h),
         a AS (SELECT key, SUM(c) AS n, SUM(ca) AS n_a,
                 SUM(CAST(ca AS HUGEINT) * (hi - c + 1 + hi)) AS r2a,
                 SUM(CAST(c AS HUGEINT) * (c - 1) * (c + 1)) AS tsum
               FROM r GROUP BY 1),
         b AS (SELECT key, n, n_a, n - n_a AS n_b, tsum,
                 r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2_a
               FROM a),
         c2 AS (SELECT key, n, n_a, n_b, u2_a,
                  u2_a - CAST(n_a AS HUGEINT) * n_b AS s2,
                  CAST(n_a AS HUGEINT) * n_b *
                    (CAST(n AS HUGEINT) * (n + 1) * (n - 1) - tsum) AS var_num,
                  3 * CAST(n AS HUGEINT) * (n - 1) AS var_den
                FROM b),
         d AS (SELECT key, n, n_a, n_b, u2_a, var_num, var_den,
                 CASE WHEN s2 > 0 THEN s2 - 1
                      WHEN s2 < 0 THEN s2 + 1 ELSE 0 END AS s2_adj
               FROM c2)
         SELECT key AS event_type, CAST(n AS BIGINT) AS n,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(u2_a AS BIGINT) AS u2_a,
           ${graft.ops.Stats.rankZSql("s2_adj", "var_num", "var_den")} AS z_micro
         FROM d""",

    // exact 2× midranks per column from the value histograms, joined
    // back to rows, rank moments through the SAME corrSql tree
    "x50_spearman" ->
      s"""WITH b0 AS (SELECT l_returnflag AS key,
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         hx AS (SELECT key, x, COUNT(*) AS c FROM b0 GROUP BY 1, 2),
         rxt AS (SELECT key, x,
                   2 * SUM(c) OVER (PARTITION BY key ORDER BY x
                     ROWS UNBOUNDED PRECEDING) - c + 1 AS rx
                 FROM hx),
         hy AS (SELECT key, y, COUNT(*) AS c FROM b0 GROUP BY 1, 2),
         ryt AS (SELECT key, y,
                   2 * SUM(c) OVER (PARTITION BY key ORDER BY y
                     ROWS UNBOUNDED PRECEDING) - c + 1 AS ry
                 FROM hy),
         j AS (SELECT b0.key, CAST(rx AS HUGEINT) AS rx, CAST(ry AS HUGEINT) AS ry
               FROM b0
               JOIN rxt ON b0.key = rxt.key AND b0.x = rxt.x
               JOIN ryt ON b0.key = ryt.key AND b0.y = ryt.y),
         m AS (SELECT key, COUNT(*) AS n, SUM(rx) AS s_x, SUM(ry) AS s_y,
                 SUM(rx * rx) AS s_xx, SUM(ry * ry) AS s_yy,
                 SUM(rx * ry) AS s_xy
               FROM j GROUP BY 1)
         SELECT key AS l_returnflag, CAST(n AS BIGINT) AS n,
           ${graft.ops.Stats.corrSql("s_xy", "s_x", "s_y", "s_xx", "s_yy")} AS rho
         FROM m""",

    // t22's feature/bucket recipe + the DSIR log-ratio weights: the
    // identical IEEE tree (two exact-integer-double products, one
    // divide, one ln, micro-nat round) on both engines
    "t32_dsir_select" ->
      """WITH d AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS w
                    FROM documents),
         f AS (SELECT doc_id, lang = 'en' AS is_tgt,
                 unnest(w || list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
               FROM d WHERE len(w) >= 1),
         b AS (SELECT doc_id, is_tgt,
                 ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket FROM f),
         c AS (SELECT bucket, COUNT(*) AS cr,
                 SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct FROM b GROUP BY 1),
         tt AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM c),
         wt AS (SELECT bucket,
                  CAST(ROUND(LN((CAST(ct + 1 AS DOUBLE) * CAST(nr + 4096 AS DOUBLE)) /
                    (CAST(cr + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))) * 1000000)
                    AS BIGINT) AS w_fp
                FROM c, tt),
         sc AS (SELECT doc_id, COUNT(*) AS n_features, CAST(SUM(w_fp) AS BIGINT) AS weight_fp
                FROM b JOIN wt USING (bucket) GROUP BY 1)
         SELECT doc_id, n_features, weight_fp FROM sc
         ORDER BY weight_fp DESC, doc_id LIMIT 100""",

    // pivot's inverse: the metric matrix melted back to rows; DECIMAL
    // cells so money crosses engines exactly
    "x33_unpivot" ->
      """WITH m AS (SELECT o_orderstatus,
                      CAST(COUNT(*) AS DECIMAL(18,2)) AS n_orders,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                        AS total_price,
                      CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                        AS max_price
                    FROM orders GROUP BY 1)
         SELECT o_orderstatus, metric, CAST(value AS DOUBLE) AS value FROM (
           SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM m
           UNION ALL SELECT o_orderstatus, 'total_price', total_price FROM m
           UNION ALL SELECT o_orderstatus, 'max_price', max_price FROM m)""",

    // same wedge join, same fixed-point 1/ln(deg) weights, same
    // (score DESC, a, b) top-100 boundary order
    "g7_adamic_adar" ->
      """WITH p0 AS (SELECT DISTINCT o_custkey * 2 AS x, l_suppkey * 2 + 1 AS y
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                     WHERE l_quantity >= 48),
         e0 AS (SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM p0),
         adj AS (SELECT a AS w, b AS n FROM e0 UNION ALL SELECT b, a FROM e0),
         wts AS (SELECT w, CAST(ROUND(1000000 / LN(CAST(deg AS DOUBLE))) AS BIGINT) AS w_fp
                 FROM (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w)
                 WHERE deg >= 2 AND deg <= 10000),
         pr AS (SELECT a1.n AS a, a2.n AS b, COUNT(*) AS n_common,
                  CAST(SUM(w.w_fp) AS BIGINT) AS score_fp
                FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.n < a2.n
                JOIN wts w ON w.w = a1.w
                GROUP BY 1, 2),
         nn AS (SELECT pr.a, pr.b, pr.n_common, pr.score_fp FROM pr
                ANTI JOIN e0 ON pr.a = e0.a AND pr.b = e0.b)
         SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(n_common AS BIGINT) AS n_common, score_fp
         FROM nn ORDER BY score_fp DESC, a, b LIMIT 100""",

    // 2 unrolled HITS rounds: integer half-round sums, L∞ floor-division
    // normalization (all values non-negative, so DuckDB's floor `//`
    // equals Spark's truncating `div`)
    "g8_hits" -> hitsOracle(""),

    "g8s_hits_slice" -> hitsOracle("WHERE o_custkey % 10 = 3"),

    // the 1% centile gate — the 100× check (see copurchaseCentile)
    "g8s2_hits_centile" -> hitsOracle("WHERE o_custkey % 100 = 37"),

    // 4 unrolled simultaneous-peeling rounds (converged rounds are
    // no-ops, so bounded rounds == the true 3-core once peeling settles)
    "g9_kcore" -> kcoreOracle(""),

    "g9s_kcore_slice" -> kcoreOracle("AND o_custkey % 10 = 3"),

    // the 1% centile gate — the 100× check (see copurchaseCentile)
    "g9s2_kcore_centile" -> kcoreOracle("AND o_custkey % 100 = 37"),

    // integer co-occurrence counts and degrees; the only floating ops
    // (one sqrt, one divide) are correctly rounded in any engine;
    // heap order == (cosine DESC, neighbor ASC) row_number order
    // the same inverted-index pairing, then the three floored ratios —
    // lift via HUGEINT (the decimal(38,0) twin) before the single floor
    "g16_assoc_rules" ->
      """WITH r AS (SELECT DISTINCT l_orderkey AS t, l_suppkey AS i FROM lineitem),
         p AS (SELECT a.i AS src, b.i AS dst, CAST(COUNT(*) AS BIGINT) AS n_ab
               FROM r a JOIN r b ON a.t = b.t AND a.i < b.i
               GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         d AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS deg FROM r GROUP BY 1),
         n AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_tx FROM r),
         dir AS (SELECT src AS antecedent, dst AS consequent, n_ab FROM p
                 UNION ALL SELECT dst, src, n_ab FROM p)
         SELECT antecedent, consequent, n_ab,
           (10000 * n_ab) // n_tx AS support_bp,
           (10000 * n_ab) // da.deg AS confidence_bp,
           CAST((CAST(1000000 AS HUGEINT) * n_ab * n_tx) //
             (CAST(da.deg AS HUGEINT) * db.deg) AS BIGINT) AS lift_fp
         FROM dir JOIN d da ON da.i = antecedent
                  JOIN d db ON db.i = consequent
                  CROSS JOIN n""",

    "g10_itemcf" -> g10Oracle(""),

    // ItemCF over the deterministic 10% customer slice — the 10× check
    // for this spill-class oracle (the full wedge self-join was the
    // run that threatened to fill the disk at 10×)
    "g10s_itemcf_slice" -> g10Oracle("WHERE o_custkey % 10 = 3"),

    // exact integer epoch-week indices, DECIMAL-exact cents, cumulative
    // over the weeks-sized triangle
    "e34_cohort_ltv" ->
      """WITH e AS (SELECT user_id,
                      (epoch_us(ts::TIMESTAMP) // 86400000000) // 7 AS m,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, MIN(m) AS cohort_m FROM e GROUP BY user_id),
         cell AS (SELECT cohort_m, m - cohort_m AS age_periods,
                    COUNT(DISTINCT e.user_id) AS n_users,
                    CAST(SUM(cents) AS BIGINT) AS revenue_cents
                  FROM e JOIN c USING (user_id) GROUP BY 1, 2),
         w AS (SELECT *, CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_m
                 ORDER BY age_periods ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_revenue_cents FROM cell)
         SELECT strftime(DATE '1970-01-01' + CAST(cohort_m * 7 AS INT),
             '%Y-%m-%d') AS cohort_start,
           CAST(age_periods AS BIGINT) AS age_periods,
           CAST(n_users AS BIGINT) AS n_users, revenue_cents, cum_revenue_cents
         FROM w""",

    // seasonal-naive alignment and integer-floored MAE/WMAPE replayed
    "e38_forecast_backtest" ->
      """WITH e AS (SELECT event_type,
                      epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events),
         d AS (SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS a
               FROM e GROUP BY 1, 2),
         j AS (SELECT d.event_type, d.a, f.a AS f
               FROM d JOIN d f ON d.event_type = f.event_type
                 AND d.day = f.day + 7),
         s AS (SELECT event_type, COUNT(*) AS n_days,
                 CAST(SUM(a) AS BIGINT) AS sum_actual_cents,
                 CAST(SUM(ABS(a - f)) AS BIGINT) AS sum_abs_err_cents
               FROM j GROUP BY 1)
         SELECT event_type, n_days, sum_actual_cents, sum_abs_err_cents,
           sum_abs_err_cents // n_days AS mae_cents,
           CASE WHEN sum_actual_cents > 0
             THEN (10000 * sum_abs_err_cents) // sum_actual_cents
             ELSE NULL END AS wmape_bp
         FROM s""",

    // delta-counted at-risk, censoring on the final day, the SHARED
    // micro-nat factor tree (Sessions.kmFactorSql — one definition),
    // extinction → NULL rather than a -inf
    "e42_kaplan_meier" -> kaplanMeierOracle,

    // reference-window calibration (first 14 observed days per key,
    // positive-mod floors) then the per-day prefix-sum replay
    "e44_cusum_daily" ->
      """WITH e AS (SELECT event_type AS key,
                      epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events),
         d AS (SELECT key, day, CAST(SUM(cents) AS BIGINT) AS a_cents
               FROM e GROUP BY 1, 2),
         fd AS (SELECT key, MIN(day) AS first_day FROM d GROUP BY 1),
         ref AS (SELECT d.key, COUNT(*) AS n, CAST(SUM(a_cents) AS BIGINT) AS sa
                 FROM d JOIN fd USING (key)
                 WHERE d.day < fd.first_day + 14 GROUP BY 1),
         tg AS (SELECT key, (sa - ((sa % n + n) % n)) // n AS target_cents
                FROM ref),
         tg2 AS (SELECT key, target_cents,
                   (target_cents * 50
                     - ((target_cents * 50 % 100 + 100) % 100)) // 100
                     AS threshold_cents
                 FROM tg),
         w AS (SELECT d.key, d.day, d.a_cents, tg2.threshold_cents,
                 CAST(SUM(d.a_cents - tg2.target_cents) OVER (
                   PARTITION BY d.key ORDER BY d.day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_t
               FROM d JOIN tg2 USING (key)),
         c AS (SELECT *, s_t - LEAST(0, MIN(s_t) OVER (
                 PARTITION BY key ORDER BY day
                 ROWS UNBOUNDED PRECEDING)) AS cusum FROM w)
         SELECT key AS event_type, day, a_cents, s_t,
           CAST(cusum AS BIGINT) AS cusum,
           CASE WHEN cusum > threshold_cents THEN 1 ELSE 0 END AS alarm
         FROM c""",

    // pairwise-complete sample ACF: HUGEINT moments over the lag-aligned
    // day pairs, then the IDENTICAL closed-form Pearson tree the engine
    // evaluates (Stats.corrSql — one definition, both engines)
    "e41_autocorr" -> autocorrOracle,

    // CUSUM via the prefix-sum identity C_t = S_t − min(0, min_{s≤t} S_s);
    // the floored integer mean/threshold (both engines' integer division
    // TRUNCATES, so BOTH sides use the positive-mod subtraction — with a
    // divisible operand truncation is floor) keep every C_t exact
    "e39_cusum_changepoint" ->
      """WITH e AS (SELECT event_type,
                      epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events),
         d AS (SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS a
               FROM e GROUP BY 1, 2),
         st AS (SELECT event_type, COUNT(*) AS n_days,
                  CAST(SUM(a) AS BIGINT) AS sa
                FROM d GROUP BY 1),
         st1 AS (SELECT event_type, n_days,
                   (sa - ((sa % n_days + n_days) % n_days)) // n_days
                     AS target_cents
                 FROM st),
         st2 AS (SELECT *,
                   (target_cents * 50
                     - ((target_cents * 50 % 100 + 100) % 100)) // 100
                     AS threshold_cents
                 FROM st1),
         w AS (SELECT d.event_type, d.day, st2.n_days, st2.target_cents,
                 st2.threshold_cents,
                 CAST(SUM(d.a - st2.target_cents) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_t
               FROM d JOIN st2 USING (event_type)),
         c AS (SELECT *, s_t - LEAST(0, MIN(s_t) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING)) AS cusum FROM w)
         SELECT event_type, CAST(MAX(n_days) AS BIGINT) AS n_days,
           CAST(MAX(target_cents) AS BIGINT) AS target_cents,
           CAST(MAX(threshold_cents) AS BIGINT) AS threshold_cents,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           CAST(COUNT(CASE WHEN cusum > threshold_cents THEN 1 END)
             AS BIGINT) AS n_alarm_days,
           MIN(CASE WHEN cusum > threshold_cents THEN day END)
             AS first_alarm_day
         FROM c GROUP BY event_type""",

    // dyadic staircase decay: identical shift-and-floor-divide terms
    // (both engines' integer division truncates, so the oracle carries
    // the same positive-mod subtraction — negative refund cents agree)
    "e36_decay_score" ->
      """WITH e AS (SELECT user_id,
                      epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
         r AS (SELECT MAX(day) AS ref_day FROM e),
         w AS (SELECT user_id, cents,
                 (CAST(1 AS BIGINT)
                   << CAST(LEAST((ref_day - day) // 7, 62) AS INT)) AS pw
               FROM e, r),
         t AS (SELECT user_id, cents,
                 (cents * 1000000
                   - ((cents * 1000000 % pw + pw) % pw)) // pw AS term_fp
               FROM w)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(term_fp) AS BIGINT) AS decayed_fp
         FROM t GROUP BY user_id""",

    // first-5 path per user (total order on ts, event_id), counted,
    // top-20 on the (n_users DESC, path) boundary order
    "e35_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts::TIMESTAMP, event_id) AS rn
                    FROM events),
         p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
               FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 20""",

    // exact integer metrics, exact histogram-rank quintile cuts,
    // strictly-greater (recency strictly-less) scoring
    "e33_rfm" ->
      """WITH e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
         ref AS (SELECT MAX(day) AS ref_day FROM e),
         m AS (SELECT user_id, MAX(ref_day) - MAX(day) AS r_days,
                 COUNT(*) AS f_n, CAST(SUM(cents) AS BIGINT) AS m_cents
               FROM e, ref GROUP BY user_id),
         nn AS (SELECT COUNT(*) AS n FROM m),
         rc AS (SELECT MIN(CASE WHEN cum >= (2000 * n + 9999) // 10000 THEN v END) AS t20,
                  MIN(CASE WHEN cum >= (4000 * n + 9999) // 10000 THEN v END) AS t40,
                  MIN(CASE WHEN cum >= (6000 * n + 9999) // 10000 THEN v END) AS t60,
                  MIN(CASE WHEN cum >= (8000 * n + 9999) // 10000 THEN v END) AS t80
                FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
                      FROM (SELECT r_days AS v, COUNT(*) AS cnt FROM m GROUP BY 1)), nn),
         fc AS (SELECT MIN(CASE WHEN cum >= (2000 * n + 9999) // 10000 THEN v END) AS t20,
                  MIN(CASE WHEN cum >= (4000 * n + 9999) // 10000 THEN v END) AS t40,
                  MIN(CASE WHEN cum >= (6000 * n + 9999) // 10000 THEN v END) AS t60,
                  MIN(CASE WHEN cum >= (8000 * n + 9999) // 10000 THEN v END) AS t80
                FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
                      FROM (SELECT f_n AS v, COUNT(*) AS cnt FROM m GROUP BY 1)), nn),
         mc AS (SELECT MIN(CASE WHEN cum >= (2000 * n + 9999) // 10000 THEN v END) AS t20,
                  MIN(CASE WHEN cum >= (4000 * n + 9999) // 10000 THEN v END) AS t40,
                  MIN(CASE WHEN cum >= (6000 * n + 9999) // 10000 THEN v END) AS t60,
                  MIN(CASE WHEN cum >= (8000 * n + 9999) // 10000 THEN v END) AS t80
                FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
                      FROM (SELECT m_cents AS v, COUNT(*) AS cnt FROM m GROUP BY 1)), nn),
         sc AS (SELECT m.user_id, m.r_days, m.f_n, m.m_cents,
                  1 + CAST(m.r_days < rc.t80 AS BIGINT) + CAST(m.r_days < rc.t60 AS BIGINT)
                    + CAST(m.r_days < rc.t40 AS BIGINT) + CAST(m.r_days < rc.t20 AS BIGINT)
                    AS r_score,
                  1 + CAST(m.f_n > fc.t20 AS BIGINT) + CAST(m.f_n > fc.t40 AS BIGINT)
                    + CAST(m.f_n > fc.t60 AS BIGINT) + CAST(m.f_n > fc.t80 AS BIGINT)
                    AS f_score,
                  1 + CAST(m.m_cents > mc.t20 AS BIGINT) + CAST(m.m_cents > mc.t40 AS BIGINT)
                    + CAST(m.m_cents > mc.t60 AS BIGINT) + CAST(m.m_cents > mc.t80 AS BIGINT)
                    AS m_score
                FROM m, rc, fc, mc)
         SELECT user_id, r_days, f_n, m_cents,
           CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
             CAST(m_score AS VARCHAR) AS segment
         FROM sc""",

    // only exact counts and gate bits cross engines (x25's recipe):
    // the sketch estimates themselves are implementation-specific
    "x34_hll_overlap" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS d_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS d_b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a SEMI JOIN b USING (user_id)) AS d_inter,
           1 AS a_ok, 1 AS b_ok, 1 AS inter_ok""",

    "t2_langid" ->
      """WITH d AS (SELECT doc_id, lang, text,
           regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sc AS (SELECT doc_id, lang, text,
           len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and'))
             + len(list_filter(w, x -> x = 'of')) + len(list_filter(w, x -> x = 'to'))
             + len(list_filter(w, x -> x = 'a')) AS s_en,
           len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'la'))
             + len(list_filter(w, x -> x = 'de')) + len(list_filter(w, x -> x = 'que'))
             + len(list_filter(w, x -> x = 'los')) AS s_es,
           len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'les'))
             + len(list_filter(w, x -> x = 'des')) + len(list_filter(w, x -> x = 'et'))
             + len(list_filter(w, x -> x = 'une')) AS s_fr,
           len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die'))
             + len(list_filter(w, x -> x = 'und')) + len(list_filter(w, x -> x = 'das'))
             + len(list_filter(w, x -> x = 'ein')) AS s_de
           FROM d)
         SELECT doc_id, lang,
           CASE WHEN text IS NULL THEN NULL
                WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
                WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
                ELSE 'und' END AS lang_pred
         FROM sc""",

    "t3_quality" ->
      """WITH b AS (SELECT doc_id, text,
           regexp_extract_all(lower(text), '\S+') AS w,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS nt
           FROM documents),
         r AS (SELECT doc_id, text, nt,
           len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'a'))
             + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of'))
             + len(list_filter(w, x -> x = 'to')) + len(list_filter(w, x -> x = 'in'))
             + len(list_filter(w, x -> x = 'is')) + len(list_filter(w, x -> x = 'that')) AS hits,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS ar
           FROM b),
         f AS (SELECT doc_id,
           CASE WHEN nt = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / nt END AS stopword_ratio,
           ar, pr, nt FROM r)
         SELECT doc_id, stopword_ratio,
           ROUND(ar * 0.5 + (1.0 - LEAST(pr * 5.0, 1.0)) * 0.2
             + LEAST(CAST(nt AS DOUBLE) / 100.0, 1.0) * 0.2
             + LEAST(stopword_ratio * 4.0, 1.0) * 0.1, 6) AS quality_score
         FROM f""",

    "t5_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
           FROM documents)
         WHERE length(word) > 0 GROUP BY word""",

    // the t5 tokenizer per language, rolled to vocabulary grain then
    // slice grain; ratios in floored integer basis points
    "t36_vocab_stats" ->
      """WITH w AS (SELECT lang,
                      unnest(regexp_extract_all(lower(text), '\S+')) AS word
                    FROM documents),
         wc AS (SELECT lang, word, COUNT(*) AS c FROM w
                WHERE length(word) > 0 GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax,
           (10000 * COUNT(*)) // CAST(SUM(c) AS BIGINT) AS ttr_bp,
           (10000 * CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT))
             // COUNT(*) AS hapax_bp
         FROM wc GROUP BY lang""",

    // the row_number replay of the (score DESC, id ASC) cap
    "d18_domain_cap" ->
      """WITH r AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
                FROM documents)
         SELECT doc_id, source, score, rank FROM r WHERE rank <= 20""",

    // x39's smoothed cross-products emitted per bin through the SAME
    // psiTermSql tree, plus the signed share delta (positive-mod floor)
    "x57_psi_bins" ->
      (s"""WITH b AS (SELECT event_type AS key,
                  CASE WHEN epoch_us(ts::TIMESTAMP) // 86400000000 < 19738
                    THEN 1 ELSE 0 END AS is_ref,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                FROM events WHERE value IS NOT NULL),
         c AS (SELECT key,
                 (cents - ((cents % 2000 + 2000) % 2000)) // 2000 AS bin,
                 SUM(is_ref) AS c_ref, SUM(1 - is_ref) AS c_cur
               FROM b GROUP BY 1, 2),
         t AS (SELECT key, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                 CAST(SUM(c_cur) AS BIGINT) AS n_cur,
                 COUNT(*) AS n_bins FROM c GROUP BY 1),
         m AS (SELECT c.key, c.bin, c.c_ref, c.c_cur,
                 CAST(c.c_cur + 1 AS HUGEINT) * (t.n_ref + t.n_bins) AS ra,
                 CAST(c.c_ref + 1 AS HUGEINT) * (t.n_cur + t.n_bins) AS rb,
                 CAST(t.n_cur + t.n_bins AS HUGEINT) * (t.n_ref + t.n_bins) AS den
               FROM c JOIN t USING (key))
         SELECT key AS event_type, CAST(bin AS BIGINT) AS bin,
           CAST(c_ref AS BIGINT) AS c_ref, CAST(c_cur AS BIGINT) AS c_cur,
           ${graft.ops.Stats.psiTermSql("ra", "rb", "den")} AS term_micro,
           CAST((10000 * (ra - rb)
             - (((10000 * (ra - rb)) % den + den) % den)) // den AS BIGINT)
             AS share_delta_bp
         FROM m"""),

    // per-doc codepoint histogram through the SAME entropy term tree
    "t44_char_entropy" ->
      (s"""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents WHERE text IS NOT NULL),
         c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch
               WHERE length(ch) > 0 GROUP BY 1, 2),
         w AS (SELECT doc_id, c,
                 SUM(c) OVER (PARTITION BY doc_id) AS n FROM c)
         SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_chars,
           COUNT(*) AS n_distinct_chars,
           CAST(SUM(${graft.ops.Stats.entropyTermSql("c", "n")}) AS BIGINT)
             AS entropy_micro
         FROM w GROUP BY 1"""),

    // t10's split + t34's shingle/novelty replay with train as the
    // reference set; leaked = novelty below 5000 bp
    "t43_split_ngram_leakage" ->
      """WITH sp AS (SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
           FROM documents),
         d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
               FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         dg AS (SELECT sh.doc_id, unnest(s) AS g
                FROM sh JOIN sp USING (doc_id) WHERE sp.split <> 'train'),
         rg AS (SELECT DISTINCT unnest(s) AS g
                FROM sh JOIN sp USING (doc_id) WHERE sp.split = 'train'),
         nv AS (SELECT dg.doc_id, COUNT(*) AS n_ngrams,
                  CAST(COUNT(CASE WHEN rg.g IS NULL THEN 1 END) AS BIGINT)
                    AS n_novel
                FROM dg LEFT JOIN rg ON dg.g = rg.g GROUP BY 1),
         nb AS (SELECT doc_id, (10000 * n_novel) // n_ngrams AS novelty_bp
                FROM nv)
         SELECT sp.split, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN novelty_bp < 5000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked,
           (10000 * CAST(SUM(CASE WHEN novelty_bp < 5000 THEN 1 ELSE 0 END)
             AS BIGINT)) // COUNT(*) AS leak_bp
         FROM nb JOIN sp USING (doc_id) GROUP BY 1""",

    // exact token membership via list overlap, per-lang floored bp
    "t42_word_blocklist" ->
      """WITH d AS (SELECT lang,
                  CASE WHEN len(list_intersect(
                    regexp_extract_all(lower(text), '\S+'),
                    ['slow', 'merge'])) > 0 THEN 1 ELSE 0 END AS blocked
                FROM documents)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(blocked) AS BIGINT) AS n_blocked,
           (10000 * CAST(SUM(blocked) AS BIGINT)) // COUNT(*) AS block_bp
         FROM d GROUP BY 1""",

    // milli-nat ln points through the SAME lnRatioMicroSql tree, then
    // the e32 moment algebra verbatim
    "x53_price_elasticity" ->
      s"""WITH li AS (SELECT l_partkey,
                  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem GROUP BY 1),
         pt AS (SELECT p_partkey AS l_partkey, p_brand,
                  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
                FROM part),
         pts AS (SELECT p_brand AS key,
                   ${graft.ops.Stats.lnRatioMicroSql("price_cents", "1", 1000L)} AS x,
                   ${graft.ops.Stats.lnRatioMicroSql("qty", "1", 1000L)} AS y
                 FROM li JOIN pt USING (l_partkey)),
         a AS (SELECT key, COUNT(*) AS n_points, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy_raw, SUM(x * x) AS sxx_raw
               FROM pts GROUP BY 1),
         b AS (SELECT key, n_points,
                 n_points * sxy_raw - sx * sy AS sxy,
                 n_points * sxx_raw - sx * sx AS sxx
               FROM a)
         SELECT key AS p_brand, CAST(n_points AS BIGINT) AS n_points,
           CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
           CAST(CASE WHEN sxx = 0 THEN NULL ELSE
             (sxy * 1000000 - ((sxy * 1000000 % sxx + sxx) % sxx)) // sxx END
             AS BIGINT) AS slope_micro
         FROM b""",

    // doc-level and chunk-level verdicts from the SAME t2 scoring tree
    // (langScoresSql/langVerdictSql); chunks are 20-token list slices
    "t41_code_switching" ->
      s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                     FROM documents WHERE text IS NOT NULL),
         d2 AS (SELECT doc_id, w FROM d WHERE len(w) >= 1),
         ds AS (SELECT doc_id, w, ${langScoresSql("w")} FROM d2),
         doc AS (SELECT doc_id, w, $langVerdictSql AS doc_pred FROM ds),
         ch AS (SELECT doc_id, doc_pred,
                  unnest(list_transform(range(0, CAST(ceil(len(w) / 20.0) AS INT)),
                    i -> w[(i*20+1):(i*20+20)])) AS cw
                FROM doc),
         cs AS (SELECT doc_id, doc_pred, ${langScoresSql("cw")} FROM ch),
         cp AS (SELECT doc_id, doc_pred, $langVerdictSql AS chunk_pred FROM cs)
         SELECT doc_id, doc_pred, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN chunk_pred = 'und' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_und,
           CAST(SUM(CASE WHEN chunk_pred <> 'und' AND chunk_pred <> doc_pred
             THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
           CASE WHEN COUNT(*) >
               SUM(CASE WHEN chunk_pred = 'und' THEN 1 ELSE 0 END) THEN
             (10000 * CAST(SUM(CASE WHEN chunk_pred <> 'und'
                AND chunk_pred <> doc_pred THEN 1 ELSE 0 END) AS BIGINT))
             // CAST(COUNT(*) - SUM(CASE WHEN chunk_pred = 'und'
                THEN 1 ELSE 0 END) AS BIGINT)
           END AS mixed_bp
         FROM cp GROUP BY 1, 2""",

    // the t36 vocab histogram feeding the shared lnRatioMicroSql tree;
    // uncovered rest mass is the 693147·(n2 − Σcq) closed form, final
    // ratio positive-mod floored
    "t39_js_divergence" ->
      s"""WITH w AS (SELECT lang AS key,
                  unnest(regexp_extract_all(lower(text), '\\S+')) AS word
                FROM documents WHERE lang IS NOT NULL),
         wc AS (SELECT key, word, COUNT(*) AS cp FROM w
                WHERE length(word) > 0 GROUP BY 1, 2),
         tot AS (SELECT word, SUM(cp) AS ct FROM wc GROUP BY 1),
         sl AS (SELECT key, SUM(cp) AS n1, COUNT(*) AS n_types
                FROM wc GROUP BY 1),
         na AS (SELECT SUM(n1) AS n_all FROM sl),
         j AS (SELECT wc.key, sl.n1, sl.n_types, na.n_all - sl.n1 AS n2,
                 CAST(wc.cp AS HUGEINT) AS cp,
                 CAST(tot.ct - wc.cp AS HUGEINT) AS cq
               FROM wc JOIN tot USING (word) JOIN sl ON wc.key = sl.key, na),
         tm AS (SELECT key, n1, n2, n_types, cq,
                  2 * cp * n2 AS num_p, 2 * cq * n1 AS num_q,
                  cp * n2 + cq * n1 AS den, cp
                FROM j),
         t2 AS (SELECT key, n1, n2, n_types, cq,
                  CASE WHEN den > 0 THEN
                    cp * ${graft.ops.Stats.lnRatioMicroSql("num_p", "den")}
                  ELSE 0 END AS term_p,
                  CASE WHEN cq > 0 THEN
                    cq * ${graft.ops.Stats.lnRatioMicroSql("num_q", "den")}
                  ELSE 0 END AS term_q
                FROM tm),
         a AS (SELECT key, MAX(n1) AS n_slice, MAX(n2) AS n_rest,
                 MAX(n_types) AS n_types, SUM(term_p) AS stp,
                 SUM(term_q) AS stq_cov, SUM(cq) AS sq_cov
               FROM t2 GROUP BY 1),
         f AS (SELECT key, n_slice, n_rest, n_types,
                 CAST(n_rest AS HUGEINT) * stp + CAST(n_slice AS HUGEINT) *
                   (stq_cov + 693147 * (CAST(n_rest AS HUGEINT) - sq_cov)) AS aa,
                 2 * CAST(n_slice AS HUGEINT) * n_rest AS bb
               FROM a)
         SELECT key AS lang, CAST(n_slice AS BIGINT) AS n_slice,
           CAST(n_rest AS BIGINT) AS n_rest,
           CAST(n_types AS BIGINT) AS n_types,
           CASE WHEN n_rest > 0 THEN
             CAST((aa - ((aa % bb + bb) % bb)) // bb AS BIGINT)
           END AS jsd_micro
         FROM f""",

    // the t34/d7 shingle kernel per source, distinct sets, one
    // shingle-grain self-join, FULL pair grid with coalesced zeros
    "d15_source_overlap" ->
      """WITH d AS (SELECT source, regexp_extract_all(lower(text), '\S+') AS w
                    FROM documents WHERE source IS NOT NULL),
         sh AS (SELECT source, CASE WHEN len(w) >= 3 THEN
                  list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i]||' '||w[i+1]||' '||w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         sg AS (SELECT DISTINCT source AS slice, unnest(s) AS g FROM sh),
         sizes AS (SELECT slice, COUNT(*) AS n_sh FROM sg GROUP BY 1),
         shared AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
                      COUNT(*) AS n_shared
                    FROM sg a JOIN sg b ON a.g = b.g AND a.slice < b.slice
                    GROUP BY 1, 2),
         grid AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
                    a.n_sh AS n_a, b.n_sh AS n_b
                  FROM sizes a JOIN sizes b ON a.slice < b.slice)
         SELECT slice_a, slice_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
           (10000 * CAST(COALESCE(n_shared, 0) AS BIGINT))
             // (n_a + n_b - COALESCE(n_shared, 0)) AS jaccard_bp,
           (10000 * CAST(COALESCE(n_shared, 0) AS BIGINT))
             // LEAST(n_a, n_b) AS overlap_bp
         FROM grid LEFT JOIN shared USING (slice_a, slice_b)""",

    // three determinant groupings, each rolled to one report row
    "x51_fd_check" ->
      """WITH c1 AS (SELECT event_id, COUNT(DISTINCT user_id) AS nd
                     FROM events GROUP BY 1),
         c2 AS (SELECT user_id, COUNT(DISTINCT event_type) AS nd
                FROM events GROUP BY 1),
         c3 AS (SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS nd
                FROM orders GROUP BY 1),
         u AS (
           SELECT 'event_id_determines_user' AS check_name, COUNT(*) AS n_groups,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
             MAX(nd) AS max_distinct FROM c1
           UNION ALL
           SELECT 'user_id_determines_type', COUNT(*),
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd) FROM c2
           UNION ALL
           SELECT 'custkey_determines_status', COUNT(*),
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd) FROM c3)
         SELECT check_name, CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_violating AS BIGINT) AS n_violating,
           (10000 * CAST(n_violating AS BIGINT)) // n_groups AS violation_bp,
           CAST(max_distinct AS BIGINT) AS max_distinct,
           CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS passed
         FROM u""",

    // daily histogram → exact integer moments; the global calendar
    // span makes zero days count without materializing them
    "e53_dispersion" ->
      """WITH e AS (SELECT event_type AS key,
                  epoch_us(ts::TIMESTAMP) // 86400000000 AS day FROM events),
         sp AS (SELECT MAX(day) - MIN(day) + 1 AS n_days FROM e),
         d AS (SELECT key, day, COUNT(*) AS y FROM e GROUP BY 1, 2),
         a AS (SELECT key, SUM(y) AS s, SUM(CAST(y AS HUGEINT) * y) AS ssq
               FROM d GROUP BY 1)
         SELECT key AS event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS n_events,
           CAST((CAST(n_days AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s)
             * 1000000 // (CAST(n_days AS HUGEINT) * s) AS BIGINT)
             AS dispersion_micro
         FROM a, sp""",

    "x7_null_semantics" ->
      """SELECT o_orderpriority,
         COUNT(NULLIF(o_orderstatus, 'P')) AS n_non_p,
         COUNT(*) AS n_all,
         CAST(COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 END) AS BIGINT) AS n_p,
         (FIRST(COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')) IS NOT NULL) AS coalesced_non_null
         FROM orders GROUP BY o_orderpriority""",

    "t6_curate_corpus" ->
      """WITH s AS (
           SELECT doc_id, text,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio
           FROM documents),
         q AS (SELECT * FROM s WHERE n_tokens >= 10 AND alpha_ratio >= 0.5),
         ke AS (SELECT doc_id, text, n_tokens, alpha_ratio FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                  FROM q) WHERE rn = 1),
         d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM ke),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sset
                FROM d),
         inv AS (SELECT doc_id, unnest(sset) AS g FROM sh),
         sz AS (SELECT doc_id, len(sset) AS nsh FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY x.doc_id, y.doc_id),
         dups AS (SELECT DISTINCT id_b FROM inter
                  JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
                  WHERE i / (na.nsh + nb.nsh - i) >= 0.8)
         SELECT doc_id, n_tokens, alpha_ratio FROM ke
         WHERE doc_id NOT IN (SELECT id_b FROM dups)""",

    "d3i_simhash_exact_dups" ->
      """WITH d AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id""",

    // d3i's invariant, aggregate-shaped for the 4th decade: the pair
    // stream is GROUPed before it reaches the harness, so the replay is
    // a hash join + streaming aggregate at every replica count (DuckDB
    // SUM(BIGINT) returns HUGEINT — cast back for schema parity)
    "d3is_simhash_dup_stats" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 3),
         d AS (SELECT doc_id, text FROM base
               UNION ALL
               SELECT doc_id + 1000000, text FROM base WHERE doc_id < 50),
         p AS (SELECT md5(a.text) AS grp, a.doc_id AS id_a, b.doc_id AS id_b
               FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id)
         SELECT grp, COUNT(*) AS n_pairs, MIN(id_a) AS min_id, MAX(id_b) AS max_id,
                CAST(SUM(id_a + id_b) AS BIGINT) AS id_checksum
         FROM p GROUP BY grp""",

    // the engine's FNV-1a/64 fingerprint recomputed EXACTLY over the
    // space-joined token sequence: byte fold with UBIGINT xor + HUGEINT
    // modular multiply (wrapping 64-bit arithmetic), then a
    // two's-complement reinterpret to BIGINT — the d3 simhash recipe
    "t4_fingerprint" ->
      """WITH seqd AS (
           SELECT doc_id, array_to_string(regexp_extract_all(text, '\S+'), ' ') AS seq
           FROM documents),
         h AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(14695981039346656037::UBIGINT,
                 list_transform(range(octet_length(encode(seq))),
                   i -> ('0x' || substr(hex(encode(seq)), CAST(2*i+1 AS INT), 2))::UBIGINT)),
               (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                              % 18446744073709551616 AS UBIGINT)) AS u
           FROM seqd WHERE seq IS NOT NULL),
         f AS (
           SELECT doc_id,
             CAST(CAST(u AS HUGEINT)
               - CASE WHEN u >= 9223372036854775808::UBIGINT
                      THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS fingerprint
           FROM h)
         SELECT d.doc_id, f.fingerprint
         FROM seqd d LEFT JOIN f USING (doc_id)""",

    "t4i_fingerprint_unique" ->
      """SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT array_to_string(regexp_extract_all(text, '\S+'), ' ')) AS n_distinct_seq,
         COUNT(DISTINCT array_to_string(regexp_extract_all(text, '\S+'), ' ')) AS n_distinct_fp
         FROM documents WHERE text IS NOT NULL""",

    "t13_corpus_mix" ->
      """WITH b AS (SELECT doc_id, lang, source,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
           FROM documents)
         SELECT doc_id, lang, source FROM b
         WHERE bucket < CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 6000
                                  WHEN 'fr' THEN 6000 WHEN 'es' THEN 6000
                                  WHEN 'zh' THEN 3000 ELSE 0 END""",

    "t17_prepare_packed" ->
      """WITH multi AS (
           SELECT d.doc_id, d.text || chr(10) || chr(10) || s.text AS text
           FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 25),
         p AS (SELECT doc_id,
             unnest(string_split(text, chr(10)||chr(10))) AS para,
             unnest(range(len(string_split(text, chr(10)||chr(10))))) AS pos
           FROM multi),
         k AS (SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM p),
         clean AS (SELECT doc_id,
             string_agg(para, chr(10)||chr(10) ORDER BY pos) AS text
           FROM k WHERE rn = 1 GROUP BY doc_id),
         gated AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio
           FROM clean),
         q AS (SELECT doc_id, n_tokens FROM gated
           WHERE n_tokens >= 10 AND alpha_ratio >= 0.5),
         b AS (SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
             n_tokens
           FROM q),
         o AS (SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
           FROM b)
         SELECT doc_id, shard, n_tokens, tok_offset,
           tok_offset // 256 AS seq_first,
           (tok_offset + GREATEST(n_tokens, 1) - 1) // 256 AS seq_last
         FROM o""",

    "t16_repeated_spans" ->
      """WITH aug AS (
           SELECT d.doc_id, d.text || ' ' || s.text AS text
           FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 30),
         g AS (SELECT doc_id,
             unnest(range(length(text) - 39)) AS pos,
             unnest(list_transform(range(length(text) - 39),
               i -> substr(text, (i + 1)::INT, 40))) AS gram
           FROM aug WHERE length(text) >= 40),
         r AS (SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
           FROM g),
         d2 AS (SELECT doc_id, pos FROM r WHERE rn > 1),
         m AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
                  THEN 1 ELSE 0 END AS brk
           FROM d2),
         i AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
           FROM m)
         SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 40 AS BIGINT) AS span_end
         FROM i GROUP BY doc_id, island""",

    "t14_paragraph_dedup" ->
      """WITH multi AS (
           SELECT d.doc_id, d.text || chr(10) || chr(10) || s.text AS text
           FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 25),
         p AS (SELECT doc_id,
             unnest(string_split(text, chr(10)||chr(10))) AS para,
             unnest(range(len(string_split(text, chr(10)||chr(10))))) AS pos
           FROM multi),
         k AS (SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM p)
         SELECT doc_id,
           string_agg(para, chr(10)||chr(10) ORDER BY pos) AS text,
           COUNT(*) AS n_kept
         FROM k WHERE rn = 1 GROUP BY doc_id""",

    "t15_pack_sequences" ->
      """WITH b AS (SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
           FROM documents WHERE text IS NOT NULL),
         o AS (SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
           FROM b)
         SELECT doc_id, shard, n_tokens, tok_offset,
           tok_offset // 256 AS seq_first,
           (tok_offset + GREATEST(n_tokens, 1) - 1) // 256 AS seq_last
         FROM o""",

    "t12_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
                    FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
         df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
         n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
         x AS (SELECT doc_id, word, tf, df,
                 ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
               FROM tf JOIN df USING (word) CROSS JOIN n),
         r AS (SELECT doc_id, word, tf, df, tfidf,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, word ASC) AS INT) AS rank
               FROM x)
         SELECT doc_id, word, tf, df, tfidf, rank FROM r WHERE rank <= 5""",

    "t7_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
                    FROM documents),
         c AS (SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word),
         a AS (SELECT doc_id, SUM(n) AS n_words, COUNT(*) AS n_distinct_words,
                 MAX(n) AS top_freq FROM c GROUP BY doc_id)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
           ROUND(1.0 - CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS dup_word_frac,
           ROUND(CAST(top_freq AS DOUBLE) / n_words, 6) AS top_word_frac
         FROM a""",

    "t8_pii_redaction" ->
      """WITH p AS (SELECT doc_id,
           text || ' Contact: user' || doc_id || '@example.com or +1 555 000 '
             || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text
           FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS redacted
         FROM p""",

    // ONE oracle for both recall gates (v3i in-memory, v5 written index)
    // — they enforce the same contract via the shared recallGate helper,
    // and a drift between two copies would gate different invariants
    "v3i_ivf_recall" -> ivfRecallOracle,

    // the probe-report identity: xxhash64 seeds, argmin cells, probe
    // ranks, candidate counts — all replayed exactly (see
    // ivfProbeReportOracle's Scaladoc); the last rows-only entry
    // becomes a full hash oracle
    "v3_ivf_topk" -> ivfProbeReportOracle,

    "v29_ivfbq_recall" -> ivfRecallOracle,

    // exact n_bf recomputed once; the per-tier gate bits are the
    // literal-1 invariants (monotone nesting, full-probe exactness)
    "v24_nprobe_sweep" ->
      (ivfRecallCtes + """,
         nb AS (SELECT COUNT(*) AS n_bf FROM r WHERE rank <= 5)
         SELECT t.n_probe, nb.n_bf, 1 AS monotone_ok, 1 AS full_exact
         FROM (VALUES (1), (4), (16)) AS t(n_probe) CROSS JOIN nb"""),
    "v20_sq_recall" -> ivfRecallOracle,

    "v22_embedding_drift" -> embeddingDriftOracle,

    // the datacard replayed from proven fragments: t21's gopher
    // predicate, md5 uniqueness, t36's (lang, word) vocab for TTR,
    // x15's histogram-rank median over token counts
    "card1_corpus_datacard" ->
      """WITH d AS (SELECT doc_id, lang, text, md5(text) AS h,
                  regexp_extract_all(lower(text), '\S+') AS w,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_toks,
                  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nc
                FROM documents),
         r AS (SELECT lang, h, n_toks,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(len(list_filter(w, x ->
                   len(regexp_replace(x, '[^a-z]', '', 'g')) > 0)) AS BIGINT) AS n_alpha,
                 (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) AS n_stop,
                 nc
               FROM d),
         agg AS (SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN n_words >= 30 AND n_words <= 100000
                     AND nc >= n_words * 3 AND nc <= n_words * 10
                     AND n_alpha * 10 >= n_words * 8 AND n_stop >= 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
                   CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
                 FROM r GROUP BY 1),
         wv AS (SELECT lang, word, COUNT(*) AS c
                FROM (SELECT lang, unnest(w) AS word FROM d)
                WHERE length(word) > 0 GROUP BY 1, 2),
         vocab AS (SELECT lang,
                     (10000 * COUNT(*)) // CAST(SUM(c) AS BIGINT) AS ttr_bp
                   FROM wv GROUP BY 1),
         tc AS (SELECT lang, n_toks, COUNT(*) AS c FROM d GROUP BY 1, 2),
         rk AS (SELECT lang, n_toks, c,
                  SUM(c) OVER (PARTITION BY lang ORDER BY n_toks
                    ROWS UNBOUNDED PRECEDING) AS hi,
                  SUM(c) OVER (PARTITION BY lang) AS n
                FROM tc),
         med AS (SELECT lang,
                   CAST(MAX(CASE WHEN (5000 * n + 9999) // 10000
                     BETWEEN hi - c + 1 AND hi THEN n_toks END) AS BIGINT)
                     AS median_tokens
                 FROM rk GROUP BY 1)
         SELECT agg.lang, agg.n_docs, agg.n_tokens,
           (10000 * n_quality) // n_docs AS quality_bp,
           (10000 * n_unique) // n_docs AS unique_bp,
           vocab.ttr_bp, med.median_tokens
         FROM agg JOIN vocab USING (lang) JOIN med USING (lang)""",

    // the t21 gopher predicate on the stream half, distinct (lang, md5)
    // with per-group token count (identical text → identical count, so
    // MIN is THE value), history hashes anti-joined, per-lang rollup
    "llm2_stream_pipeline" ->
      """WITH st AS (SELECT doc_id, text, lang FROM documents WHERE doc_id >= 250),
         hist AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
         d AS (SELECT lang, text, md5(text) AS h,
                 regexp_extract_all(lower(text), '\S+') AS w,
                 CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nc
               FROM st),
         r AS (SELECT lang, text, h, nc,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(len(list_filter(w, x ->
                   len(regexp_replace(x, '[^a-z]', '', 'g')) > 0)) AS BIGINT) AS n_alpha,
                 (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END +
                  CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) AS n_stop
               FROM d),
         g AS (SELECT lang, h,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
               FROM r
               WHERE n_words >= 30 AND n_words <= 100000
                 AND nc >= n_words * 3 AND nc <= n_words * 10
                 AND n_alpha * 10 >= n_words * 8 AND n_stop >= 2),
         u AS (SELECT lang, h, MIN(n_tokens) AS n_tokens FROM g GROUP BY 1, 2),
         u2 AS (SELECT u.lang, u.n_tokens FROM u
                LEFT JOIN hist ON u.h = hist.h WHERE hist.h IS NULL)
         SELECT lang, COUNT(*) AS n_new_unique,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_new
         FROM u2 GROUP BY 1""",

    // the purchase-versioned SCD2 dim replayed (row_number + lead over
    // the (ts, event_id) order), the disjoint-interval as-of join, and
    // the per-version rollup — pre-first-purchase events in the NULL
    // version group
    "e54_stream_scd2" ->
      """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts, value
                    FROM events),
         p AS (SELECT user_id AS key, ts AS eff_from,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS tier_cents,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS BIGINT) AS version,
                 LEAD(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS eff_to
               FROM e WHERE event_type = 'purchase'),
         j AS (SELECT e.event_id, p.version, p.tier_cents
               FROM e LEFT JOIN p ON e.user_id = p.key AND e.ts >= p.eff_from
                 AND (p.eff_to IS NULL OR e.ts < p.eff_to))
         SELECT version, COUNT(*) AS n_events,
           CAST(SUM(tier_cents) AS BIGINT) AS sum_tier_cents
         FROM j GROUP BY 1""",

    // exact integer norms² over quantized vectors, histogram-rank median
    "v31_norm_profile" ->
      """WITH n AS (SELECT label AS slice,
                  CAST(list_sum(list_transform(embedding,
                    x -> CAST(ROUND(x::DOUBLE * 1000) AS BIGINT) *
                         CAST(ROUND(x::DOUBLE * 1000) AS BIGINT))) AS BIGINT) AS n2
                FROM embeddings WHERE embedding IS NOT NULL),
         h AS (SELECT slice, n2, COUNT(*) AS c FROM n GROUP BY 1, 2),
         r AS (SELECT slice, n2, c,
                 SUM(c) OVER (PARTITION BY slice ORDER BY n2
                   ROWS UNBOUNDED PRECEDING) AS hi,
                 SUM(c) OVER (PARTITION BY slice) AS n
               FROM h)
         SELECT slice AS label, CAST(MAX(n) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN n2 < 1 THEN c ELSE 0 END) AS BIGINT) AS n_zeroish,
           CAST(MIN(n2) AS BIGINT) AS min_norm_sq,
           CAST(MAX(CASE WHEN (5000 * n + 9999) // 10000
             BETWEEN hi - c + 1 AND hi THEN n2 END) AS BIGINT) AS median_norm_sq,
           CAST(MAX(n2) AS BIGINT) AS max_norm_sq
         FROM r GROUP BY 1""",

    // floored integer per-label centroids (the v22 recipe), exact
    // integer L2² distances, (d, label) argmin, per-true-label rollup
    "v30_prototype_accuracy" ->
      """WITH b AS (SELECT vec_id, label,
                  list_transform(embedding,
                    x -> CAST(ROUND(x::DOUBLE * 1000) AS BIGINT)) AS qv
                FROM embeddings
                WHERE embedding IS NOT NULL AND label IS NOT NULL),
         e AS (SELECT label, unnest(range(1, len(qv)+1)) AS pos,
                 unnest(qv) AS x FROM b),
         s AS (SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n
               FROM e GROUP BY 1, 2),
         c AS (SELECT label AS clabel, pos,
                 (s - ((s % n + n) % n)) // n AS c FROM s),
         q AS (SELECT vec_id, label, unnest(range(1, len(qv)+1)) AS pos,
                 unnest(qv) AS x FROM b),
         d AS (SELECT q.vec_id, q.label, c.clabel,
                 CAST(SUM((q.x - c.c) * (q.x - c.c)) AS BIGINT) AS d2
               FROM q JOIN c USING (pos) GROUP BY 1, 2, 3),
         a AS (SELECT vec_id, label, clabel,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY d2 ASC, clabel ASC) AS rn
               FROM d)
         SELECT label, COUNT(*) AS n,
           CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           (10000 * CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
             AS BIGINT)) // COUNT(*) AS accuracy_bp
         FROM a WHERE rn = 1 GROUP BY 1""",

    // the v1 cosine tree scored once; hardest positive = (cos ASC, id
    // ASC) rank 1 among same-label, hardest negative = (cos DESC, id
    // DESC) rank 1 among different-label — the struct-extreme
    // tie-breaks mirrored exactly; violation compared pre-rounding
    "v28_triplet_mine" ->
      """WITH a AS (SELECT vec_id AS anchor_id, embedding AS qe, label AS al
                    FROM embeddings WHERE vec_id % 10 = 0),
         s AS (SELECT anchor_id, al, c.vec_id AS nid, c.label AS cl,
             list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN a WHERE c.vec_id <> anchor_id),
         p AS (SELECT anchor_id, al, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY anchor_id
                   ORDER BY cos ASC, nid ASC) AS rn
               FROM s WHERE cl = al),
         n AS (SELECT anchor_id, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY anchor_id
                   ORDER BY cos DESC, nid DESC) AS rn
               FROM s WHERE cl <> al)
         SELECT p.anchor_id, p.al AS label, p.nid AS pos_id,
           ROUND(p.cos, 6) AS cos_pos, n.nid AS neg_id,
           ROUND(n.cos, 6) AS cos_neg,
           CASE WHEN n.cos >= p.cos THEN 1 ELSE 0 END AS violated
         FROM p JOIN n ON p.anchor_id = n.anchor_id
         WHERE p.rn = 1 AND n.rn = 1""",

    // d6's recursive closure over the EXACT-Jaccard pairs, then the
    // per-cluster (score DESC, id ASC) survivor with member counts
    "d17_keep_best" -> d17Oracle("documents"),

    // keep-best over the deterministic 10% doc slice — the 10× check
    // for this spill-class oracle (same rationale as d16s)
    "d17s_keep_best_slice" ->
      d17Oracle("(SELECT * FROM documents WHERE doc_id % 10 = 3)"),

    // the identical augmented-payload string, keys via json_keys,
    // values as unquoted strings, share over parseable rows
    "x52_json_census" ->
      """WITH e AS (SELECT CASE WHEN event_type = 'purchase' THEN
                  '{"k": ' || json_extract_string(props, '$.k') || ', "cents": ' ||
                  CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) ||
                  ', "kind": "buy"}'
                ELSE props END AS p
              FROM events),
         e2 AS (SELECT p FROM e WHERE p IS NOT NULL),
         kv AS (SELECT unnest(json_keys(p)) AS key, p FROM e2),
         kv2 AS (SELECT key, json_extract_string(p, '$.' || key) AS value FROM kv),
         tot AS (SELECT COUNT(*) AS n_rows FROM e2)
         SELECT key, COUNT(*) AS n_present,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
           (10000 * COUNT(*)) // (SELECT n_rows FROM tot) AS share_bp
         FROM kv2 GROUP BY 1""",

    // both tiers replayed exactly: the v1 cosine tree AND the binary
    // tier (integer quantize → floored-mean thresholds → ±1 signs →
    // exact signed dot), so recall_bp itself hash-matches
    "v26_binary_recall" ->
      """WITH ci AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(ROUND(x::DOUBLE * 1000000) AS BIGINT)) AS cv
                FROM embeddings),
         dx AS (SELECT pos, CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n
                FROM (SELECT unnest(range(1, len(cv)+1)) AS pos,
                        unnest(cv) AS x FROM ci) GROUP BY 1),
         th AS (SELECT pos, (s - ((s % n + n) % n)) // n AS t FROM dx),
         thl AS (SELECT list(t ORDER BY pos) AS tl FROM th),
         sg AS (SELECT vec_id AS neighbor_id,
                  list_transform(range(1, len(cv)+1),
                    i -> CASE WHEN cv[i] >= tl[i] THEN 1 ELSE -1 END) AS sgn
                FROM ci, thl),
         qi AS (SELECT vec_id AS query_id, cv AS qv FROM ci
                WHERE vec_id % 10 = 0),
         sb AS (SELECT query_id, neighbor_id,
                  CAST(list_sum(list_transform(range(1, len(qv)+1),
                    i -> qv[i] * sgn[i])) AS BIGINT) AS score
                FROM sg CROSS JOIN qi WHERE neighbor_id <> query_id),
         rb AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, neighbor_id ASC) AS rank
                FROM sb),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id % 10 = 0),
         sf AS (SELECT query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         rf AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM sf)
         SELECT (SELECT COUNT(*) FROM rf WHERE rank <= 5) AS n_bf,
           (SELECT COUNT(*) FROM rf JOIN rb USING (query_id, neighbor_id)
            WHERE rf.rank <= 5 AND rb.rank <= 5) AS n_hit,
           (10000 * (SELECT COUNT(*) FROM rf JOIN rb USING (query_id, neighbor_id)
                     WHERE rf.rank <= 5 AND rb.rank <= 5))
             // (SELECT COUNT(*) FROM rf WHERE rank <= 5) AS recall_bp""",

    // BOTH tiers replayed exactly (the v1 cosine tree, once over all
    // dims and once over the 16-dim prefix), so the recall itself
    // hash-matches — stronger than the literal-1 gates, possible here
    // because truncation search is exact, not approximate
    "v23_matryoshka_recall" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 10 = 0),
         sf AS (SELECT query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         rf AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM sf),
         sp AS (SELECT query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 17), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, 17), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 17), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         rp AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM sp)
         SELECT CAST(nb.n AS BIGINT) AS n_bf, CAST(nh.n AS BIGINT) AS n_hit,
           (10000 * CAST(nh.n AS BIGINT)) // CAST(nb.n AS BIGINT) AS recall_bp
         FROM (SELECT COUNT(*) AS n FROM rf WHERE rank <= 5) nb,
              (SELECT COUNT(*) AS n FROM rf JOIN rp USING (query_id, neighbor_id)
               WHERE rf.rank <= 5 AND rp.rank <= 5) nh""",

    // the projection replayed: md5-parity signs over quantized integer
    // components, then the identical cosine tree on the exact-integer
    // 16d vectors; same recall join as v23
    "v25_random_projection" ->
      """WITH pr AS (SELECT vec_id,
             list_transform(range(0, 16), j ->
               list_sum(list_transform(range(1, len(embedding) + 1), i ->
                 (CASE WHEN strpos('02468ace',
                     substr(md5(CAST(i - 1 AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) > 0
                   THEN 1 ELSE -1 END)
                 * CAST(ROUND(embedding[i] * 1000) AS BIGINT)))) AS p
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id % 10 = 0),
         sf AS (SELECT query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         rf AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM sf),
         pq AS (SELECT vec_id AS query_id, p AS qp FROM pr WHERE vec_id % 10 = 0),
         sp AS (SELECT query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 17), i -> qp[i]::DOUBLE * c.p[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, 17), i -> qp[i]::DOUBLE * qp[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 17), i -> c.p[i]::DOUBLE * c.p[i]::DOUBLE)))) AS cos
           FROM pr c CROSS JOIN pq WHERE c.vec_id <> query_id),
         rp AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM sp)
         SELECT CAST(nb.n AS BIGINT) AS n_bf, CAST(nh.n AS BIGINT) AS n_hit,
           (10000 * CAST(nh.n AS BIGINT)) // CAST(nb.n AS BIGINT) AS recall_bp
         FROM (SELECT COUNT(*) AS n FROM rf WHERE rank <= 5) nb,
              (SELECT COUNT(*) AS n FROM rf JOIN rp USING (query_id, neighbor_id)
               WHERE rf.rank <= 5 AND rp.rank <= 5) nh""",
    // exact baseline restricted to the predicate (label = 3) — the
    // same recall-gate recipe over the filtered corpus
    "v21_filtered_topk" -> (ivfRecallCtes.replace(
      "WHERE c.vec_id <> query_id",
      "WHERE c.vec_id <> query_id AND c.label = 3") +
      "\n       SELECT COUNT(*) AS n_bf, CAST(1 AS INT) AS recall_ok FROM r WHERE rank <= 5"),
    // the 1/50-selective predicate: same recall-gate recipe, eligible
    // set = the vec_id mod-50 residue
    "v21b_filtered_selective" -> (ivfRecallCtes.replace(
      "WHERE c.vec_id <> query_id",
      "WHERE c.vec_id <> query_id AND c.vec_id % 50 = 7") +
      "\n       SELECT COUNT(*) AS n_bf, CAST(1 AS INT) AS recall_ok FROM r WHERE rank <= 5"),
    "v5_ivf_disk_index" -> ivfRecallOracle,
    "v6_pq_recall" -> ivfRecallOracle,
    "v7_ivfpq_recall" -> ivfRecallOracle,
    "v8_ivfpq_disk_index" -> ivfRecallOracle,
    "v13_ivf_append" -> ivfAppendOracle,
    "v14_ivfpq_append" -> ivfAppendOracle,

    "v15_kmeans" -> (kmeansOracleCtes +
      """
       SELECT vec_id, cluster, dist_fp FROM fin"""),

    "v16_cluster_sample" -> (kmeansOracleCtes +
      """
       SELECT cluster, vec_id, sample_rank FROM (
         SELECT cluster, vec_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY cluster
                  ORDER BY md5(CAST(vec_id AS VARCHAR)) || CAST(vec_id AS VARCHAR))
                  AS INTEGER) AS sample_rank
         FROM fin)
       WHERE sample_rank <= 10"""),

    "v18_dbscan" -> dbscanOracle(""),

    // DBSCAN over a 1% vector slice - the 10x check for v18's
    // spill-class oracle (the exact eps-graph replay is an O(n^2)
    // distance join: 4x10^10 pairs at 10x with the full corpus)
    "v18s_dbscan_slice" -> dbscanOracle("WHERE vec_id % 100 = 3"),

    "v17_kmeans_margin" -> (kmeansOracleCtes +
      """,
       rk AS (SELECT vec_id, cid, dist,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
              FROM df),
       mg AS (SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster, b.dist - a.dist AS margin_fp
              FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
       SELECT cluster, COUNT(*) AS n, SUM(margin_fp) AS margin_sum_fp,
              MIN(margin_fp) AS min_margin_fp, MAX(margin_fp) AS max_margin_fp
       FROM mg GROUP BY cluster"""),

    "v4_lsh_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
                    FROM embeddings
                    UNION ALL
                    SELECT vec_id + 1000000,
                      list_transform(embedding, x -> x::DOUBLE * 1.1)
                    FROM embeddings WHERE vec_id < 50),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i] * b.embedding[i]))
           / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i] * a.embedding[i])))
            * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i] * b.embedding[i])))) AS cos
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.8""",

    "m2_media_features" ->
      """SELECT doc_id AS media_id,
         'png' AS format,
         8 + (('0x' || substr(md5(text), 7, 2))::INT % 9) AS width,
         8 + (('0x' || substr(md5(text), 9, 2))::INT % 9) AS height,
         CAST(('0x' || substr(md5(text), 1, 2))::INT AS DOUBLE) AS mean_r,
         CAST(('0x' || substr(md5(text), 3, 2))::INT AS DOUBLE) AS mean_g,
         CAST(('0x' || substr(md5(text), 5, 2))::INT AS DOUBLE) AS mean_b
         FROM documents WHERE text IS NOT NULL""",

    // m5's bit arithmetic with the 'wav:' seed chain: the affine level
    // mapping cancels in 64·s_i ≥ Σ, so raw md5 bytes ARE the levels
    "m7_audio_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id % 40 AS k, doc_id // 40 AS v FROM documents),
         js AS (SELECT unnest(generate_series(0, 3)) AS j),
         i16 AS (SELECT unnest(generate_series(0, 15)) AS ii),
         px0 AS (SELECT d.doc_id, d.v, js.j * 16 + i16.ii AS i,
                   ('0x' || substr(md5('wav:' || d.k::VARCHAR || ':' || js.j::VARCHAR),
                                   2 * i16.ii + 1, 2))::INT AS p
                 FROM d CROSS JOIN js CROSS JOIN i16),
         px AS (SELECT doc_id, i,
                  CASE WHEN v > 0 AND i = v % 64 THEN (p + 128) % 256 ELSE p END AS p
                FROM px0),
         s AS (SELECT doc_id, SUM(p) AS tot FROM px GROUP BY 1),
         bits AS (SELECT px.doc_id, px.i,
                    CASE WHEN 64 * px.p >= s.tot THEN 1 ELSE 0 END AS b
                  FROM px JOIN s USING (doc_id)),
         h AS (SELECT doc_id,
                 CAST(SUM(CASE WHEN i = 63 THEN 0 ELSE b * (1::BIGINT << i) END) AS BIGINT)
                   + CASE WHEN MAX(CASE WHEN i = 63 THEN b ELSE 0 END) = 1
                          THEN (-9223372036854775807 - 1) ELSE 0 END AS ahash
               FROM bits GROUP BY 1),
         pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  bit_count(xor(a.ahash, b.ahash)) AS hamming
                FROM h a JOIN h b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pr WHERE hamming <= 3""",

    // pixels from md5 hex, integer mean bits, signed 64-bit assembly
    // (bit 63 contributes -2^63 in two's complement), all-pairs
    // bit_count(xor) — the pigeonhole join is exact for hamming <= 3,
    // so all-pairs is the correct oracle
    "m5_image_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id % 40 AS k, doc_id // 40 AS v FROM documents),
         js AS (SELECT unnest(generate_series(0, 3)) AS j),
         i16 AS (SELECT unnest(generate_series(0, 15)) AS ii),
         px0 AS (SELECT d.doc_id, d.v, js.j * 16 + i16.ii AS i,
                   ('0x' || substr(md5('gray:' || d.k::VARCHAR || ':' || js.j::VARCHAR),
                                   2 * i16.ii + 1, 2))::INT AS p
                 FROM d CROSS JOIN js CROSS JOIN i16),
         px AS (SELECT doc_id, i,
                  CASE WHEN v > 0 AND i = v % 64 THEN (p + 128) % 256 ELSE p END AS p
                FROM px0),
         s AS (SELECT doc_id, SUM(p) AS tot FROM px GROUP BY 1),
         bits AS (SELECT px.doc_id, px.i,
                    CASE WHEN 64 * px.p >= s.tot THEN 1 ELSE 0 END AS b
                  FROM px JOIN s USING (doc_id)),
         h AS (SELECT doc_id,
                 CAST(SUM(CASE WHEN i = 63 THEN 0 ELSE b * (1::BIGINT << i) END) AS BIGINT)
                   + CASE WHEN MAX(CASE WHEN i = 63 THEN b ELSE 0 END) = 1
                          THEN (-9223372036854775807 - 1) ELSE 0 END AS ahash
               FROM bits GROUP BY 1),
         pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  bit_count(xor(a.ahash, b.ahash)) AS hamming
                FROM h a JOIN h b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pr WHERE hamming <= 3""",

    "m3_audio_features" ->
      """SELECT doc_id AS media_id,
         'wav' AS format,
         8000 + 1000 * (('0x' || substr(md5(text), 15, 2))::INT % 8) AS sample_rate,
         CAST(400 + 2 * ('0x' || substr(md5(text), 13, 2))::INT AS BIGINT) AS n_samples,
         CAST(127 * (1 + ('0x' || substr(md5(text), 11, 2))::INT) AS DOUBLE) AS rms
         FROM documents WHERE text IS NOT NULL""",

    "x4_approx_distinct" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS n_exact,
         CAST(1 AS INT) AS hll_within_10pct
         FROM lineitem GROUP BY l_returnflag""",

    // the shared shingle kernel at n=3, old/new batch split replayed;
    // LEFT-join misses are the novel shingles, ratio in floored bp
    "t34_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i]||' '||w[i+1]||' '||w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 5 = 0),
         rg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 5 <> 0)
         SELECT dg.doc_id, COUNT(*) AS n_ngrams,
           CAST(COUNT(CASE WHEN rg.g IS NULL THEN 1 END) AS BIGINT) AS n_novel,
           (10000 * CAST(COUNT(CASE WHEN rg.g IS NULL THEN 1 END) AS BIGINT))
             // COUNT(*) AS novelty_bp
         FROM dg LEFT JOIN rg ON dg.g = rg.g
         GROUP BY 1""",

    "d7_decontaminate" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 8 THEN
                    list_distinct(list_transform(range(1, len(w)-6),
                      i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                           w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
         tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 20
                UNION ALL
                SELECT doc_id + 1000000, unnest(s) FROM sh WHERE doc_id < 20)
         SELECT tr.doc_id, COUNT(DISTINCT tr.g) AS n_shared_ngrams
         FROM tr JOIN ev ON tr.g = ev.g
         GROUP BY tr.doc_id""",

    // same oracle as d7: the Bloom pre-filter changes the PLAN, not the
    // result (no false negatives; the exact verify join removes false
    // positives)
    "d9_bloom_decontaminate" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 8 THEN
                    list_distinct(list_transform(range(1, len(w)-6),
                      i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                           w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM d),
         ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
         tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 20
                UNION ALL
                SELECT doc_id + 1000000, unnest(s) FROM sh WHERE doc_id < 20)
         SELECT tr.doc_id, COUNT(DISTINCT tr.g) AS n_shared_ngrams
         FROM tr JOIN ev ON tr.g = ev.g
         GROUP BY tr.doc_id""",

    // the oracle reads the ORIGINAL table: a layout rewrite must be
    // semantically invisible
    "x19_zorder" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem WHERE l_partkey BETWEEN 500 AND 700
         GROUP BY l_returnflag""",

    // the hilbert layout must be semantically invisible: the oracle runs
    // the same filter+agg on the ORIGINAL table (integer window bounds
    // recomputed identically — maxPk*45/100 is integer div in both)
    "x21_hilbert" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_partkey BETWEEN (SELECT MAX(l_partkey) * 45 // 100 FROM lineitem)
                             AND (SELECT MAX(l_partkey) * 55 // 100 FROM lineitem)
         GROUP BY l_returnflag""",

    // mirrors the query verbatim: canonical registry (min key per
    // distinct name), key-derived one-char deletions, prefix/suffix
    // blocking passes, length filter, levenshtein verify
    "d10_entity_resolution" ->
      """WITH reg AS (SELECT MIN(p_partkey) AS rec_id, p_name AS name
                      FROM part GROUP BY p_name),
         typo AS (SELECT rec_id + 1000000000 AS rec_id,
                    substr(name, 1, CAST(rec_id % length(name) AS INT)) ||
                    substr(name, CAST(rec_id % length(name) AS INT) + 2) AS name
                  FROM reg WHERE rec_id % 3 = 0),
         all_recs AS (SELECT rec_id, name FROM reg
                      UNION ALL SELECT rec_id, name FROM typo),
         blocked AS (
           SELECT rec_id, name, substr(name, 1, 3) AS bk, 0 AS pass FROM all_recs
           UNION ALL
           SELECT rec_id, name, substr(name, length(name) - 2, 3) AS bk, 1 AS pass
           FROM all_recs),
         cand AS (SELECT DISTINCT x.rec_id AS id_a, y.rec_id AS id_b,
                    x.name AS na, y.name AS nb
                  FROM blocked x JOIN blocked y
                    ON x.bk = y.bk AND x.pass = y.pass AND x.rec_id < y.rec_id
                   AND abs(length(x.name) - length(y.name)) <= 1)
         SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INT) AS dist
         FROM cand WHERE levenshtein(na, nb) <= 1""",

    // mirrors the query's injection verbatim: first 12 RAW tokens of the
    // eval doc at doc_id%20 appended (single space) for train docs ≡0
    // (mod 7); shingles then lowercase like the kernel
    "d8_fuzzy_decontaminate" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
         sn AS (SELECT doc_id AS k,
                  array_to_string(regexp_extract_all(text, '\S+')[1:12], ' ') AS sn
                FROM docs WHERE doc_id < 20),
         train AS (SELECT d.doc_id,
                     CASE WHEN d.doc_id % 7 = 0 THEN d.text || ' ' || sn.sn
                          ELSE d.text END AS text
                   FROM docs d JOIN sn ON d.doc_id % 20 = sn.k
                   WHERE d.doc_id >= 20),
         tw AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM train),
         tsh AS (SELECT doc_id,
                   CASE WHEN len(w) >= 8 THEN
                     list_distinct(list_transform(range(1, len(w)-6),
                       i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                            w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))
                   ELSE [array_to_string(w, ' ')] END AS s
                 FROM tw),
         ew AS (SELECT regexp_extract_all(lower(text), '\S+') AS w
                FROM docs WHERE doc_id < 20),
         esh AS (SELECT DISTINCT unnest(
                   CASE WHEN len(w) >= 8 THEN
                     list_distinct(list_transform(range(1, len(w)-6),
                       i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                            w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))
                   ELSE [array_to_string(w, ' ')] END) AS g
                 FROM ew),
         tg AS (SELECT doc_id, unnest(s) AS g FROM tsh),
         agg AS (SELECT tg.doc_id,
                   COUNT(*) AS n_ngrams, COUNT(esh.g) AS n_shared
                 FROM tg LEFT JOIN esh ON tg.g = esh.g
                 GROUP BY tg.doc_id)
         SELECT doc_id, n_ngrams, n_shared FROM agg
         WHERE n_shared * 10000 >= n_ngrams * 500""",

    // fixed-point micro-nat terms (round half away from zero, both
    // engines) summed as exact integers; bucket thresholds are long
    // cross-multiplications — see TextAnalysis.lmScore
    // d4's shingle CTE over the shared-tail construction; containment
    // thresholds replay as integer cross-multiplications
    "d13_containment" -> d13Oracle(""),

    // the same pairs over the 10% slice (tail SOURCES stay unsliced —
    // they are the doc_id % 40 lookup table, not the corpus)
    "d13s_containment_slice" -> d13Oracle("WHERE d.doc_id % 10 = 3"),

    // the 1% centile slice (the 100× gate — see the queries entry)
    "d13s2_containment_centile" -> d13Oracle("WHERE d.doc_id % 100 = 37"),

    // reversed-label prefixes joined against reversed patterns; the
    // longest (most specific) match survives per doc
    // the same canonicalization pipeline in DuckDB's dialect (global
    // regexp flags explicit; lower() preserves length so the scheme
    // length locates '://' exactly as the engine does; the port strip
    // is scheme-aware — only the scheme's DEFAULT port collapses)
    "d14_url_canonical" ->
      """WITH u AS (SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'https://www.example' || CAST(doc_id % 50 AS VARCHAR)
                         || '.com/p/' || CAST(doc_id % 200 AS VARCHAR)
             WHEN 1 THEN 'HTTPS://Example' || CAST(doc_id % 50 AS VARCHAR)
                         || '.com./p/' || CAST(doc_id % 200 AS VARCHAR) || '?utm_source=feed'
             WHEN 2 THEN 'https://example' || CAST(doc_id % 50 AS VARCHAR)
                         || '.com:443/p/' || CAST(doc_id % 200 AS VARCHAR)
                         || '?gclid=abc&ref=tw#frag'
             ELSE 'http://example' || CAST(doc_id % 50 AS VARCHAR)
                         || '.com:443/p/' || CAST(doc_id % 200 AS VARCHAR)
           END AS url FROM documents),
         s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS nofrag FROM u),
         s2 AS (SELECT doc_id, nofrag,
                  lower(split_part(nofrag, '://', 1)) AS scheme FROM s1),
         s3 AS (SELECT doc_id, scheme,
                  substr(nofrag, length(scheme) + 4) AS rest FROM s2),
         s4 AS (SELECT doc_id, scheme, rest,
                  split_part(rest, '/', 1) AS hostport FROM s3),
         s5 AS (SELECT doc_id, scheme,
                  regexp_replace(regexp_replace(
                    CASE WHEN scheme = 'http'
                           THEN regexp_replace(lower(hostport), ':80$', '')
                         WHEN scheme = 'https'
                           THEN regexp_replace(lower(hostport), ':443$', '')
                         ELSE lower(hostport) END,
                    '\.+$', ''), '^www\.', '') AS host,
                  regexp_replace(regexp_replace(regexp_replace(
                    substr(rest, length(hostport) + 1),
                    '[?&](utm_[^&=#?]*|fbclid|gclid|ref)=[^&]*', '', 'g'),
                    '^([^?&]*)&', '\1?'), '[?&]+$', '') AS pathq
                FROM s4),
         c AS (SELECT doc_id, scheme || '://' || host || pathq AS canonical_url FROM s5)
         SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_aliases
         FROM c GROUP BY canonical_url""",

    "d12_url_blocklist" ->
      """WITH u AS (SELECT doc_id,
             (CASE WHEN doc_id % 5 = 0 THEN 'cdn.' ELSE '' END) ||
             'd' || CAST(doc_id % 97 AS VARCHAR) || '.s' ||
             CAST(doc_id % 7 AS VARCHAR) || '.com' AS host
           FROM documents),
         r AS (SELECT doc_id, list_reverse(string_split(host, '.')) AS ls FROM u),
         p AS (SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
                 k -> array_to_string(list_slice(ls, 1, k), '.'))) AS rp
               FROM r),
         pat AS (SELECT unnest(['s3.com', 'd17.s3.com', 'd11.s4.com', 'nomatch.org']) AS mp),
         pr AS (SELECT array_to_string(list_reverse(string_split(mp, '.')), '.') AS rp, mp
                FROM pat),
         m AS (SELECT p.doc_id, pr.mp FROM p JOIN pr USING (rp)),
         w AS (SELECT doc_id, mp, ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY length(mp) DESC, mp) AS rn FROM m)
         SELECT doc_id, mp AS matched_pattern FROM w WHERE rn = 1""",

    // add-one smoothing replayed: (c2+1)/(c1+V) with left-join zeros,
    // V = train vocab + 1; same micro-nat quantization points
    "t28_lm_heldout" ->
      """WITH tr AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
                     FROM documents WHERE doc_id % 2 = 0),
         s0 AS (SELECT doc_id,
                  CASE WHEN doc_id % 7 = 1
                       THEN text || ' zzqx' || CAST(doc_id % 100 AS VARCHAR)
                       ELSE text END AS text
                FROM documents WHERE doc_id % 2 = 1),
         sw AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM s0),
         bgt AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                   i -> struct_pack(w1 := w[i], w2 := w[i+1])), recursive := true)
                 FROM tr WHERE len(w) >= 2),
         bgs AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                   i -> struct_pack(w1 := w[i], w2 := w[i+1])), recursive := true)
                 FROM sw WHERE len(w) >= 2),
         c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bgt GROUP BY 1, 2),
         c1 AS (SELECT w1, COUNT(*) AS c1 FROM bgt GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT w) + 1 AS v
               FROM (SELECT unnest(w) AS w FROM tr)),
         sc AS (SELECT bgs.doc_id, COUNT(*) AS n_bigrams,
                  CAST(SUM(CAST(round(ln(
                    CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE) /
                    (COALESCE(c1.c1, 0) + v.v)) * 1000000, 0) AS BIGINT)) AS BIGINT)
                    AS logprob_fp
                FROM bgs LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
                CROSS JOIN v
                GROUP BY bgs.doc_id)
         SELECT doc_id, n_bigrams, logprob_fp,
           CAST(-((-logprob_fp) // n_bigrams) AS BIGINT) AS avg_fp
         FROM sc""",

    "t19_lm_score" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                  i -> struct_pack(w1 := w[i], w2 := w[i+1])), recursive := true)
                FROM d WHERE len(w) >= 2),
         c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
         sc AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
                  CAST(SUM(CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1000000, 0) AS BIGINT)) AS BIGINT) AS logprob_fp
                FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                GROUP BY bg.doc_id)
         SELECT doc_id, n_bigrams, logprob_fp,
           CASE WHEN logprob_fp >= -3370000 * n_bigrams THEN 'head'
                WHEN logprob_fp < -3400000 * n_bigrams THEN 'tail'
                ELSE 'middle' END AS bucket
         FROM sc""",

    "t20_boilerplate" ->
      """WITH d AS (SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN 'ok bye' || chr(10) || 'click here for free stuff'
                ELSE text || chr(10) || 'click here for free stuff' || chr(10) ||
                     'ok bye' || chr(10) || 'the quick brown fox jumps again' END AS text
           FROM documents),
         k AS (SELECT doc_id,
           list_filter(string_split(text, chr(10)),
             l -> len(regexp_extract_all(l, '\S+')) >= 3
                  AND NOT contains(lower(l), 'click here')
                  AND NOT contains(lower(l), 'lorem ipsum')) AS kept,
           len(string_split(text, chr(10))) AS n_lines
           FROM d)
         SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(n_lines - len(kept) AS BIGINT) AS n_dropped
         FROM k WHERE len(kept) >= 1""",

    // every rule is an integer comparison (cross-multiplied mean-length
    // bounds), so the booleans are engine-exact
    "t21_gopher_gate" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nc
           FROM documents),
         r AS (SELECT doc_id, nc,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_filter(w, x ->
               len(regexp_replace(x, '[^a-z]', '', 'g')) > 0)) AS BIGINT) AS n_alpha,
             (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) AS n_stop
           FROM d)
         SELECT doc_id, n_words,
           (n_words >= 30 AND n_words <= 100000) AS ok_words,
           (nc >= n_words * 3 AND nc <= n_words * 10) AS ok_mean_len,
           (n_alpha * 10 >= n_words * 8) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           ((n_words >= 30 AND n_words <= 100000)
            AND (nc >= n_words * 3 AND nc <= n_words * 10)
            AND (n_alpha * 10 >= n_words * 8)
            AND (n_stop >= 2)) AS keep
         FROM r""",

    "t9_curate_clustered" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, text,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio
           FROM documents),
         q AS (SELECT * FROM s WHERE n_tokens >= 10 AND alpha_ratio >= 0.5),
         ke AS (SELECT doc_id, text, n_tokens, alpha_ratio FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                  FROM q) WHERE rn = 1),
         d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sset
                FROM d),
         inv AS (SELECT doc_id, unnest(sset) AS g FROM sh),
         sz AS (SELECT doc_id, len(sset) AS nsh FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY x.doc_id, y.doc_id),
         p AS (SELECT id_a, id_b FROM inter
               JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
               WHERE i / (na.nsh + nb.nsh - i) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         cc AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
                FROM reach GROUP BY src),
         kl AS (SELECT cc.doc_id, cc.cluster_id,
                       MIN(cc.doc_id) OVER (PARTITION BY cc.cluster_id) AS keep_id
                FROM cc JOIN ke ON cc.doc_id = ke.doc_id),
         drops AS (SELECT doc_id FROM kl WHERE doc_id <> keep_id)
         SELECT doc_id, n_tokens, alpha_ratio FROM ke
         WHERE doc_id NOT IN (SELECT doc_id FROM drops)""",

    "t10_split" ->
      """SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
         FROM documents""",

    // t10's split replayed, then the (text-md5, split) histogram with a
    // hash-partitioned train-membership flag — exact-hash leakage only
    "t40_split_leakage" ->
      """WITH sp AS (SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
           FROM documents),
         c AS (SELECT md5(d.text) AS h, sp.split, COUNT(*) AS c
               FROM documents d JOIN sp USING (doc_id)
               WHERE d.text IS NOT NULL GROUP BY 1, 2),
         w AS (SELECT split, c,
                 MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY h) AS in_ref
               FROM c)
         SELECT split, CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN in_ref = 1 THEN c ELSE 0 END) AS BIGINT) AS n_leaked,
           (10000 * CAST(SUM(CASE WHEN in_ref = 1 THEN c ELSE 0 END) AS BIGINT))
             // CAST(SUM(c) AS BIGINT) AS leak_bp
         FROM w WHERE split <> 'train' GROUP BY 1""",

    // same md5-priority recipe as t10's buckets: md5 of the id's decimal
    // string; the fixed-width hex prefix makes string order == (md5, id)
    "x18_group_sample" ->
      """SELECT c_nationkey, c_custkey, sample_rank FROM (
           SELECT c_nationkey, c_custkey,
                  CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                    ORDER BY md5(CAST(c_custkey AS VARCHAR)) || CAST(c_custkey AS VARCHAR))
                    AS INTEGER) AS sample_rank
           FROM customer)
         WHERE sample_rank <= 5""",

    // the E-S key replayed exactly: 48 md5 bits -> u, round(ln(u)·1e6)
    // micro-nats, integer // by the weight (positive operands: floor ==
    // truncate, so DuckDB's // and Spark's div agree)
    "x20_weighted_sample" ->
      """WITH keyed AS (
           SELECT lang, doc_id,
             -((-CAST(round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS DOUBLE) + 0.5)
                   / 281474976710656.0) * 1e6) AS BIGINT)) * 1000000 // n_chars) AS key
           FROM documents WHERE n_chars > 0)
         SELECT lang, doc_id, sample_rank FROM (
           SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key DESC, doc_id ASC)
               AS INTEGER) AS sample_rank
           FROM keyed)
         WHERE sample_rank <= 50""",

    "t11_prepare_corpus" -> t11PrepareSql(""),
    // the mod-10 slice replay (see t11PrepareSql scaladoc)
    "t11s_prepare_slice" -> t11PrepareSql("WHERE doc_id % 10 = 3"),

    "v1_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         s AS (SELECT query_id, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * c.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
         r AS (SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
           FROM s)
         SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
         FROM r WHERE rank <= 5""",

    // greedy rounds unrolled (k=5 is a query constant); `pair` holds all
    // candidate-candidate cosines so one expression serves every round.
    // Integer λ coefficients (7000/3000/10000.0) mirror the engine's
    // basis-point arithmetic bit-for-bit
    "v10_mmr_diversify" -> mmrOracle(10),

    "v10s_mmr_slice" -> mmrOracle(1000),

    "v10s2_mmr_centile" -> mmrOracleSliced(1000, 10),

    "v1s_topk_string_ids" -> v1sOracle(10, None),

    // the 100× string-id gate: mod-1000 queries over the mod-10 corpus
    "v1s2_topk_string_centile" -> v1sOracle(1000, Some(10)),

    "v2_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS cos
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.3""",

    "t18_chunk_windows" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
                    FROM documents),
         nz AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         w AS (SELECT doc_id, toks, unnest(range(0, n, 48)) AS start FROM nz),
         c AS (SELECT doc_id, CAST(start // 48 AS INT) AS chunk_idx,
                 list_slice(toks, start + 1, start + 64) AS chunk
               FROM w)
         SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           array_to_string(chunk, ' ') AS chunk_text
         FROM c""",

    // v2's pair construction at θ=0.9 + d6's recursive reachability:
    // survivors = all ids minus non-representative cluster members
    "v9_semantic_dedup" -> semdedupOracle(""),

    // SemDeDup over the 1% vector slice - the 10x check for v9's
    // spill-class oracle (within-cluster pairwise cosines grow ~100x
    // per 10x of corpus in the replay)
    "v9s_semantic_dedup_slice" -> semdedupOracle("WHERE vec_id % 100 = 3"),

    "e1_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, ts::TIMESTAMP AS t FROM events),
         x AS (SELECT user_id, event_id, value, t,
           CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                  OR epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) > 3600000000
                THEN 1 ELSE 0 END AS st
           FROM e),
         s AS (SELECT user_id, value, t,
           CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM x)
         SELECT user_id, session_seq, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(t), '%Y-%m-%d %H:%M:%S') AS session_end
         FROM s GROUP BY user_id, session_seq""",

    "e2_window_hourly" ->
      """SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    // hopping-window membership replayed as an explicit offset fan-out:
    // an event's 4 windows start at (floor(epoch/900) - i)*900 for
    // i in 0..3 (every one satisfies start <= ts < start + 3600 by
    // construction, since ts - start = ts mod 900 + i*900 < 3600);
    // integer epoch grid == Spark's epoch-aligned slide grid
    "e21_hopping" ->
      """SELECT strftime(make_timestamp(
             (((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 900) - i) * 900)
             * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) offs
         GROUP BY 1, 2""",

    // the exact integer replay of the rolling z-test: cents, trailing
    // window sums, (n·x − S1)² > z²·(n·S2 − S1²)
    "e22_anomaly" ->
      """WITH v AS (
           SELECT event_type, event_id, ts::TIMESTAMP AS ts, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cv
           FROM events),
         w AS (
           SELECT event_type, event_id, ts, value, cv,
             SUM(cv) OVER win AS s1,
             SUM(cv * cv) OVER win AS s2,
             COUNT(*) OVER win AS cnt
           FROM v
           WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         SELECT event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value,
           CAST(20 AS INT) AS baseline_n
         FROM w
         WHERE cnt = 20
           AND (20 * cv - s1) * (20 * cv - s1) > 9 * (20 * s2 - s1 * s1)""",

    "e3_json_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         COUNT(*) AS n
         FROM events GROUP BY event_type""",

    "a3_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",

    "x5_setops" ->
      """SELECT custkey, 'both' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
           INTERSECT
           SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         UNION ALL
         SELECT custkey, 'hi_only' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')""",

    "e4_asof_join" ->
      """SELECT l.event_id, l.user_id,
         strftime(l.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS click_time,
         strftime(r.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS signup_time,
         r.value AS signup_value
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts, MAX(value) AS value
                         FROM events WHERE event_type = 'signup'
                         GROUP BY user_id, ts::TIMESTAMP) r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",

    // Spark's sliding windows are epoch-aligned: window starts are the
    // slide multiples k with ts-len < k*slide <= ts, i.e.
    // k in [(eps-len) // slide + 1, eps // slide] (integer µs, `//`)
    "e13_sliding_hourly" ->
      """WITH e AS (SELECT epoch_us(ts::TIMESTAMP) AS eps, event_type, value FROM events),
         x AS (SELECT event_type, value,
                 unnest(range((eps - 3600000000) // 900000000 + 1,
                              eps // 900000000 + 1)) AS k
               FROM e)
         SELECT strftime(make_timestamp(k * 900000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM x GROUP BY 1, 2""",

    "e14_trailing_window" ->
      """SELECT event_id, user_id,
         strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS t,
         COUNT(*) OVER w AS n_trailing_1h,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",

    // layered cumulative windows (one per step) over the same
    // (user, ts, event_id) ordering — the same staging the engine plans;
    // 604800000000 µs = the 7-day horizon anchored at the first view
    "e15_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts::TIMESTAMP) AS m FROM events),
         w0 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN m END)
                  OVER (PARTITION BY user_id ORDER BY m, event_id
                        ROWS UNBOUNDED PRECEDING) AS s0_ts FROM e),
         w1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND s0_ts IS NOT NULL
                                    AND m <= s0_ts + 604800000000 THEN m END)
                  OVER (PARTITION BY user_id ORDER BY m, event_id
                        ROWS UNBOUNDED PRECEDING) AS s1_ts FROM w0),
         w2 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s1_ts IS NOT NULL
                                    AND m <= s0_ts + 604800000000 THEN m END)
                  OVER (PARTITION BY user_id ORDER BY m, event_id
                        ROWS UNBOUNDED PRECEDING) AS s2_ts FROM w1),
         pu AS (SELECT user_id, MIN(s0_ts) AS s0, MIN(s1_ts) AS s1, MIN(s2_ts) AS s2
                FROM w2 GROUP BY user_id)
         SELECT 1 AS step, 'view' AS step_name, COUNT(s0) AS n_users FROM pu
         UNION ALL
         SELECT 2, 'click', COUNT(s1) FROM pu
         UNION ALL
         SELECT 3, 'purchase', COUNT(s2) FROM pu""",

    // `//` and Spark's `div` both truncate — identical for the
    // non-negative gaps that survive the m >= m0 guard; both engines
    // truncate weeks on exact µs integers
    "e16_retention" ->
      """WITH e AS (SELECT user_id, event_type,
                      epoch_us(ts::TIMESTAMP) AS m, ts::TIMESTAMP AS t FROM events),
         a AS (SELECT user_id, MIN(m) AS m0, MIN(t) AS t0 FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
         j AS (SELECT e.user_id, a.t0,
                 (e.m - a.m0) // 604800000000 AS wo
               FROM e JOIN a USING (user_id) WHERE e.m >= a.m0)
         SELECT strftime(date_trunc('week', t0), '%Y-%m-%d') AS cohort_week,
           CAST(wo AS INT) AS week_offset,
           COUNT(DISTINCT user_id) AS n_active
         FROM j WHERE wo <= 8 GROUP BY 1, 2""",

    // both ts sides cast to µs TIMESTAMP: the engine compares truncated
    // µs values, and an un-truncated ns left side would miss equal-µs
    // forward matches the engine sees
    "e11_asof_forward" ->
      """SELECT l.event_id, l.user_id,
         strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
         strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS signup_time,
         r.value AS signup_value
         FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
               FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts, MAX(value) AS value
                         FROM events WHERE event_type = 'signup'
                         GROUP BY user_id, ts::TIMESTAMP) r
         ON l.user_id = r.user_id AND l.ts <= r.ts""",

    // nearest = closer of the two ASOF directions, exact ties backward,
    // 1-day tolerance on each side (86400000000 µs)
    "e12_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                    FROM events WHERE event_type = 'click'),
         s AS (SELECT user_id, ts::TIMESTAMP AS ts, MAX(value) AS value
               FROM events WHERE event_type = 'signup'
               GROUP BY user_id, ts::TIMESTAMP),
         b AS (SELECT c.event_id, s.ts AS bts, s.value AS bval
               FROM c ASOF LEFT JOIN s
               ON c.user_id = s.user_id AND c.ts >= s.ts),
         f AS (SELECT c.event_id, s.ts AS fts, s.value AS fval
               FROM c ASOF LEFT JOIN s
               ON c.user_id = s.user_id AND c.ts <= s.ts),
         j AS (SELECT c.event_id, c.user_id, c.ts, bts, bval, fts, fval,
                 (bts IS NOT NULL AND epoch_us(c.ts) - epoch_us(bts) <= 86400000000) AS bok,
                 (fts IS NOT NULL AND epoch_us(fts) - epoch_us(c.ts) <= 86400000000) AS fok,
                 epoch_us(c.ts) - epoch_us(bts) AS db,
                 epoch_us(fts) - epoch_us(c.ts) AS df
               FROM c JOIN b USING (event_id) JOIN f USING (event_id)),
         p AS (SELECT event_id, user_id, ts,
                 CASE WHEN bok AND fok THEN (CASE WHEN db <= df THEN bts ELSE fts END)
                      WHEN bok THEN bts WHEN fok THEN fts END AS sts,
                 CASE WHEN bok AND fok THEN (CASE WHEN db <= df THEN bval ELSE fval END)
                      WHEN bok THEN bval WHEN fok THEN fval END AS sval
               FROM j)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_time,
           strftime(sts, '%Y-%m-%d %H:%M:%S') AS signup_time,
           sval AS signup_value
         FROM p""",

    "m1_media_meta" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         sha256(text) AS content_sha256
         FROM documents""",

    "m4_video_frames" ->
      """WITH f AS (
           SELECT doc_id, md5(text) AS h,
                  CAST(unnest(range(0, 2 + (('0x' || substr(md5(text), 17, 2))::INT % 4))) AS INT) AS frame_idx
           FROM documents WHERE text IS NOT NULL)
         SELECT doc_id AS media_id, frame_idx,
           8 + (('0x' || substr(h, 7, 2))::INT % 9) AS width,
           8 + (('0x' || substr(h, 9, 2))::INT % 9) AS height,
           CAST((('0x' || substr(h, 1, 2))::INT + frame_idx) % 256 AS DOUBLE) AS mean_r,
           CAST((('0x' || substr(h, 3, 2))::INT + 2 * frame_idx) % 256 AS DOUBLE) AS mean_g,
           CAST((('0x' || substr(h, 5, 2))::INT + 3 * frame_idx) % 256 AS DOUBLE) AS mean_b
         FROM f""",

    // the same md5 frame arithmetic, lagged: diff 6 everywhere except
    // the mod-256 wrap, where one channel jumps ~255
    "m6_video_keyframes" ->
      """WITH f AS (
           SELECT doc_id, md5(text) AS h,
                  CAST(unnest(range(0, 2 + (('0x' || substr(md5(text), 17, 2))::INT % 4))) AS INT) AS frame_idx
           FROM documents WHERE text IS NOT NULL),
         m AS (SELECT doc_id AS media_id, frame_idx,
                 (('0x' || substr(h, 1, 2))::INT + frame_idx) % 256 AS r,
                 (('0x' || substr(h, 3, 2))::INT + 2 * frame_idx) % 256 AS g,
                 (('0x' || substr(h, 5, 2))::INT + 3 * frame_idx) % 256 AS b
               FROM f),
         l AS (SELECT media_id, frame_idx, r, g, b,
                 LAG(r, 1) OVER w AS pr, LAG(g, 1) OVER w AS pg, LAG(b, 1) OVER w AS pb
               FROM m
               WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx))
         SELECT media_id, frame_idx,
           CAST(COALESCE(abs(r - pr) + abs(g - pg) + abs(b - pb), -1) AS BIGINT) AS diff_sum
         FROM l
         WHERE pr IS NULL OR abs(r - pr) + abs(g - pg) + abs(b - pb) > 40"""
  )

  /** The mon1 capstone oracle is BUILT FROM the member monitors'
    * oracles (the corrSql one-definition discipline lifted to whole
    * queries): each sub-oracle runs verbatim as a subquery and melts to
    * the common (check_id, key, metric, value) grain — a drift in any
    * member breaks a specific labeled row.
    */

  /** The llm1 funnel oracle, parameterized by the doc0 slice predicate
    * (empty = the full corpus; the llm1s gate passes the mod-100
    * centile). Every CTE downstream of doc0 shrinks with the slice.
    */
  private def llm1FunnelSql(doc0Where: String): String =
    s"""WITH RECURSIVE
         doc0 AS (SELECT doc_id, text, lang FROM documents $doc0Where),
         gw AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w,
                  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS nc
                FROM doc0),
         gr AS (SELECT doc_id, nc, CAST(len(w) AS BIGINT) AS n_words,
                  CAST(len(list_filter(w, x ->
                    len(regexp_replace(x, '[^a-z]', '', 'g')) > 0)) AS BIGINT) AS n_alpha,
                  (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END +
                   CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END +
                   CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END +
                   CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END +
                   CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) AS n_stop
                FROM gw),
         keep AS (SELECT doc_id FROM gr
                  WHERE n_words >= 30 AND n_words <= 100000
                    AND nc >= n_words * 3 AND nc <= n_words * 10
                    AND n_alpha * 10 >= n_words * 8 AND n_stop >= 2),
         q AS (SELECT doc0.* FROM doc0 JOIN keep USING (doc_id)),
         ex AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         u AS (SELECT q.* FROM q JOIN ex USING (doc_id)),
         uw AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM u),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS s
                FROM uw),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         sz AS (SELECT doc_id, len(s) AS n FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY 1, 2),
         p AS (SELECT id_a, id_b
               FROM inter JOIN sz na ON id_a = na.doc_id
                 JOIN sz nb ON id_b = nb.doc_id
               WHERE i / (na.n + nb.n - i) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         cc AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cid
                FROM reach GROUP BY src),
         dropped AS (SELECT doc_id FROM cc WHERE doc_id <> cid),
         f AS (SELECT u.* FROM u
               WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
         sr AS (SELECT lang, COUNT(*) AS n_raw FROM doc0 GROUP BY 1),
         sq AS (SELECT lang, COUNT(*) AS n_quality FROM q GROUP BY 1),
         su AS (SELECT lang, COUNT(*) AS n_unique FROM u GROUP BY 1),
         sf AS (SELECT lang, COUNT(*) AS n_final,
                  CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                    AS tokens_final
                FROM f GROUP BY 1)
         SELECT sr.lang, sr.n_raw,
           COALESCE(sq.n_quality, 0) AS n_quality,
           COALESCE(su.n_unique, 0) AS n_unique,
           COALESCE(sf.n_final, 0) AS n_final,
           COALESCE(sf.tokens_final, 0) AS tokens_final
         FROM sr LEFT JOIN sq USING (lang) LEFT JOIN su USING (lang)
           LEFT JOIN sf USING (lang)"""

  /** The t11 prepare-corpus oracle, parameterized by the docs0 slice
    * predicate: the shingle inv-self-join + recursive closure replay is
    * quadratic in replica count, so above sf0.1 the full-corpus replay
    * exhausts the oracle temp budget (>72 GB measured at 10x, r9) and
    * the mod-10 slice gate (t11s) carries the hash evidence instead.
    */
  private def t11PrepareSql(slice: String): String =
    s"""WITH RECURSIVE
         docs0 AS (SELECT doc_id, text FROM documents $slice),
         base AS (SELECT doc_id, text FROM docs0 WHERE doc_id >= 20),
         s AS (
           SELECT doc_id, text,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio
           FROM base),
         q AS (SELECT * FROM s WHERE n_tokens >= 10 AND alpha_ratio >= 0.5),
         ke AS (SELECT doc_id, text FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                  FROM q) WHERE rn = 1),
         d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM docs0),
         sh AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3 THEN
                    list_distinct(list_transform(range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sset
                FROM d),
         inv AS (SELECT doc_id, unnest(sset) AS g FROM sh),
         sz AS (SELECT doc_id, len(sset) AS nsh FROM sh),
         inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                   FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
                   GROUP BY x.doc_id, y.doc_id),
         p AS (SELECT id_a, id_b FROM inter
               JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
               WHERE i / (na.nsh + nb.nsh - i) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         cc AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
                FROM reach GROUP BY src),
         kl AS (SELECT cc.doc_id,
                       MIN(cc.doc_id) OVER (PARTITION BY cc.cluster_id) AS keep_id
                FROM cc JOIN ke ON cc.doc_id = ke.doc_id),
         kept AS (SELECT ke.doc_id, ke.text FROM ke
                  WHERE ke.doc_id NOT IN (SELECT doc_id FROM kl WHERE doc_id <> keep_id)),
         w8 AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM docs0),
         sh8 AS (SELECT doc_id,
                  CASE WHEN len(w) >= 8 THEN
                    list_distinct(list_transform(range(1, len(w)-6),
                      i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                           w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))
                  ELSE [array_to_string(w, ' ')] END AS s8
                FROM w8),
         ev AS (SELECT DISTINCT unnest(s8) AS g FROM sh8 WHERE doc_id < 20),
         tr AS (SELECT k.doc_id, unnest(s8.s8) AS g FROM kept k JOIN sh8 s8 USING (doc_id)),
         cont AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.g = ev.g),
         clean AS (SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM cont))
         SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM clean"""

  def oracleSql: Map[String, String] =
    oracleBase + ("mon1_health_report" ->
      s"""SELECT 'freshness' AS check_id, event_type AS key, 'lag_s' AS metric,
            CAST(lag_s AS BIGINT) AS value
          FROM (${oracleBase("e48_freshness")})
          UNION ALL
          SELECT 'psi', event_type, 'psi_micro', CAST(psi_micro AS BIGINT)
          FROM (${oracleBase("x39_psi_drift")})
          UNION ALL
          SELECT 'cusum', event_type, 'n_alarm_days', CAST(n_alarm_days AS BIGINT)
          FROM (${oracleBase("e39_cusum_changepoint")})
          UNION ALL
          SELECT 'fd', check_name, 'n_violating', CAST(n_violating AS BIGINT)
          FROM (${oracleBase("x51_fd_check")})
          WHERE check_name = 'event_id_determines_user'""")
}
