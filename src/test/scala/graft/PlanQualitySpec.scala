package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard: the physical plans the 100 TB design
  * depends on, asserted as tests so a refactor can't silently lose
  * pushdown, broadcast, or the WindowGroupLimit dedup optimization.
  */
class PlanQualitySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("a1: filter and projection reach the parquet scan") {
    val p = plan("a1_full_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p) // map-side combine
    assert(!p.contains("l_comment")) // column pruning (narrow ReadSchema)
  }

  test("j1/j2: dimension joins broadcast; fact side is never exchanged") {
    val p2 = plan("j2_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p2).length == 4, p2)
    // the only Exchange allowed is the final aggregation's
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p2).length
    assert(exchanges == 1, s"fact-side shuffle leaked:\n$p2")
  }

  test("d9: the bloom probe is a subquery filter, not a joined-in value") {
    // the filter must reach the probe as a scalar subquery (one
    // execution, inlined literal, in-place byte-array reads): a
    // crossJoin(broadcast(filt)) re-reads the BINARY cell per row and
    // UnsafeRow.getBinary copies it — measured 95% of the query's CPU
    val p = plan("d9_bloom_decontaminate")
    assert(p.contains("bloom_contains(Subquery") || p.contains("bloom_contains(scalar-subquery"),
      s"bloom filter not delivered via scalar subquery:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"filter re-joined per row:\n$p")
  }

  test("w1: row_number dedup compiles to partial+final WindowGroupLimit") {
    val p = plan("w1_window_dedup")
    assert("WindowGroupLimit".r.findAllIn(p).length == 2, p)
  }

  test("j3: AQE broadcasts the quota aggregate back at runtime, no static hint") {
    // the quota join carries no broadcast() hint (the engine-wide
    // policy): AQE must still pick a broadcast join from the
    // materialized aggregate's real size
    val df = SparkEntry.queries("j3_decorrelated_quota")(spark, dir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("strategy=broadcast"), s"j3 still hints broadcast:\n$opt")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d2: minhash kernel evaluated once, after the repartition exchange") {
    val p = plan("d2_minhash_neardup")
    val scanSide = p.linesIterator.filter(_.contains("REPARTITION_BY_NUM")).toSeq
    assert(scanSide.nonEmpty, p)
    // the kernel must not appear in any Filter below an exchange
    val badFilter = p.linesIterator.exists(l =>
      l.contains("Filter") && (l.contains("minhash_sig") || l.contains("minhash_bands")))
    assert(!badFilter, s"minhash kernel pushed into a pre-shuffle filter:\n$p")
    // the signature table is persisted: banding and verification read the
    // in-memory relation instead of re-running the kernel per consumer
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"), p)
  }

  test("d2/v4: candidate-id pruning joins carry no static broadcast hint") {
    // a forced broadcast of the candidate set OOMs the driver on a
    // duplicate-heavy corpus (candidates ≈ corpus); the decision belongs
    // to AQE at runtime. Guard both LSH pipelines.
    for (q <- Seq("d2_minhash_neardup", "v4_lsh_neardup")) {
      val opt = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      assert(!opt.contains("strategy=broadcast"), s"$q still hints broadcast:\n$opt")
    }
  }

  test("v1: exact top-k ranks via partial bounded-heap agg, no scored-pair window shuffle") {
    val p = plan("v1_topk_cosine")
    // the old shape shuffled every scored (query, neighbor) pair through a
    // row_number window; the aggregate must fold map-side BEFORE the
    // exchange so the shuffle carries ≤ k entries per (partition × query)
    assert(!p.contains("Window"), s"scored-pair window shuffle is back:\n$p")
    assert(p.contains("partial_top_k_by_score"), s"no map-side partial top-k:\n$p")
    // partial agg feeds the exchange, not the other way around
    val partialIdx = p.indexOf("partial_top_k_by_score")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial top-k is not below the exchange:\n$p")
  }

  test("v1-string: string-keyed corpora also rank via the partial bounded heap") {
    // doc-UUID-shaped ids must not silently regress to the scored-pair
    // window shuffle (the round-4 generality gap): the string-keyed
    // sibling aggregate keeps the map-side fold
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("doc-"),
        org.apache.spark.sql.functions.col("vec_id").cast("string")).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val p = graft.ops.Similarity.bruteForceTopK(
      emb, emb.limit(20), "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"string ids fell back to the window shuffle:\n$p")
    assert(p.contains("partial_top_k_by_score_str"), s"no map-side string partial top-k:\n$p")
  }

  test("v6: PQ scoring is kernel ADC + partial bounded-heap, never a window") {
    // assert on pqTopK directly — inside the v6 gate the baseline/PQ
    // subtrees hide behind cached InMemoryRelations
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ops.Similarity.pqTopK(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") % 10 === 0),
      "vec_id", "embedding", 5, m = 16, ksub = 64, iters = 1, refine = 100)
      .queryExecution.executedPlan.toString
    // corpus side carries codes (pq_encode project), queries carry the
    // LUT (pq_lut), pairs score via adc_score — all codegen kernels
    assert(p.contains("pq_encode"), s"corpus not PQ-encoded:\n$p")
    assert(p.contains("pq_lut"), s"query LUT missing:\n$p")
    assert(p.contains("adc_score"), s"ADC scoring missing:\n$p")
    // both ranking stages (ADC candidates, exact refine) fold map-side;
    // neither may regress to a scored-pair window shuffle. (The ksub-row
    // seed sampler legitimately uses a row_number window — only a window
    // PARTITIONED BY query_id is the bad shape.)
    val scoredWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("query_id"))
    assert(!scoredWindow, s"scored-pair window shuffle in the PQ path:\n$p")
    assert(p.contains("partial_top_k_by_score"), s"no map-side partial top-k:\n$p")
  }

  test("v7: the probe exchange carries q_vec; ADC tables build above the shuffle") {
    // the LUT is m·ksub doubles (8 KB at 16×64) vs a 256 B query vector —
    // shuffling luts instead of vectors multiplies probe exchange volume
    // ~32×. pq_lut must sit ABOVE the cell repartition (plan prints
    // top-down: the project line comes before its child exchange).
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ops.Similarity.ivfPqTopK(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") % 10 === 0),
      "vec_id", "embedding", 5, nCentroids = 16, nProbe = 12,
      m = 16, ksub = 64, iters = 1, refine = 100)
      .queryExecution.executedPlan.toString
    // the plan prints top-down, left (corpus) subtree before right
    // (probes): the corpus side's own cell exchange comes first, so the
    // shape to require is a cell exchange BELOW the lut projection —
    // i.e. another "Exchange hashpartitioning(cell" after pq_lut's line
    val lutIdx = p.indexOf("pq_lut")
    assert(lutIdx >= 0, p)
    assert(p.indexOf("Exchange hashpartitioning(cell", lutIdx) > 0,
      s"pq_lut was pushed below the probe exchange (lut shuffles instead of q_vec):\n$p")
  }

  test("v8: loaded-index probe — LUT above the probe exchange, corpus side never exchanges") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.ops.Similarity.ivfPqBuild(
      emb, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
      iters = 1, persist = false)
    graft.ops.Similarity.ivfPqWrite(idx, "planspec_v8", numBuckets = 8)
    try {
      val loaded = graft.ops.Similarity.ivfPqLoad(spark, "planspec_v8")
      val p = graft.ops.Similarity.ivfPqProbe(
        loaded, emb.where(org.apache.spark.sql.functions.col("vec_id") % 10 === 0),
        "vec_id", "embedding", 5, nProbe = 12)
        .queryExecution.executedPlan.toString
      // same invariant as v7: the probe exchange carries the 256 B q_vec,
      // the 8 KB ADC table builds above it
      val lutIdx = p.indexOf("pq_lut")
      assert(lutIdx >= 0, p)
      assert(p.indexOf("Exchange hashpartitioning(cell", lutIdx) > 0,
        s"pq_lut was pushed below the probe exchange:\n$p")
      // the written index's whole point: the encoded corpus reads its
      // co-located buckets — the ONLY cell exchange in the plan is the
      // probe side's (the corpus side would add a second one)
      assert("Exchange hashpartitioning\\(cell".r.findAllIn(p).length == 1,
        s"corpus-side exchange on the bucketed cells:\n$p")
      // and nothing in the probe retrains: no recenter aggregate lineage
      assert(!p.contains("vector_sum"), s"probe plan contains training lineage:\n$p")
    } finally {
      for (t <- Seq("planspec_v8_cells", "planspec_v8_cents", "planspec_v8_pq"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("v1/v2: no static broadcast hint — the planner/AQE owns the decision") {
    for (q <- Seq("v1_topk_cosine", "v2_embed_neardup")) {
      val opt = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      assert(!opt.contains("strategy=broadcast"), s"$q still hints broadcast:\n$opt")
    }
  }

  test("x11: bucketed join plans with no exchange below the join") {
    val p = plan("x11_bucketed_join")
    // the only Exchange allowed is the final aggregation's — the join
    // reads co-located buckets on both sides
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"bucketed join leaked a shuffle:\n$p")
  }

  test("x3: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("x3_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s2/t4: custom expressions stay inside whole-stage codegen") {
    val df = SparkEntry.queries("s2_obfuscate")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("obfuscate_name"), p)
    assert(p.contains("*(1)"), s"no whole-stage codegen span:\n$p")
  }

  // ------------------------------------------------- post-AQE runtime plans
  // The 100 TB story leans on AQE (partition coalescing, skew-join
  // splitting). These tests EXECUTE and then assert the shape of the
  // final adaptive plan, not the static one.

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces the over-provisioned shuffle at runtime") {
    // 32 shuffle partitions on toy data: a fixed-partition engine would
    // run 32 near-empty reducers; AQE must fold them after the map stage
    withConf("spark.sql.shuffle.partitions" -> "32") {
      val df = SparkEntry.queries("x1_distinct_agg")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead"), p)
      assert(p.contains("coalesced"), s"no runtime partition coalescing:\n$p")
    }
  }

  test("t14: paragraph dedup cuts groups map-side; exactly two data exchanges") {
    val p = plan("t14_paragraph_dedup")
    // first-occurrence filter must be a partial+final WindowGroupLimit
    // (each md5(para) group collapses to 1 row BEFORE the exchange)
    assert("WindowGroupLimit".r.findAllIn(p).length == 2, p)
    // pipeline: pre-fan-out spread (REPARTITION_BY_NUM) -> group-limit
    // exchange on the digest -> reassembly exchange on the doc id.
    // Anything more is a leak.
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 3, p)
    assert(p.contains("REPARTITION_BY_NUM"), s"pre-explode spread missing:\n$p")
    // reassembly aggregates fold map-side too
    assert(p.contains("partial_collect_list"), p)
  }

  test("t15: sequence packing is one narrow pass + one shard exchange") {
    val p = plan("t15_pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    // only (doc_id, text) leave the scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t16: one gram-kernel pass per doc; three data exchanges") {
    val p = plan("t16_repeated_spans")
    // grams digest inside the CharGrams kernel (one O(len·L) pass per
    // doc); a per-gram substring chain is the quadratic shape this
    // kernel replaced and must not come back
    assert(p.contains("char_gram_digests"), s"gram kernel missing:\n$p")
    assert(!p.contains("substr("), s"per-gram substring chain is back:\n$p")
    // pre-fan-out spread + occurrence-rank exchange on the 16-byte
    // digest + island exchange on the doc id; corpus text crosses only
    // the (narrow) spread
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 3, p)
    assert(p.contains("REPARTITION_BY_NUM"), s"pre-explode spread missing:\n$p")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, concat_ws, length, lit, reverse, sha2, sum, when}
    // one celebrity key carrying ~100x the median partition, thresholds
    // lowered to make toy sizes eligible; broadcast disabled so the join
    // stays sort-merge (the skew-split target)
    withConf(
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB") {
      // payload must be INCOMPRESSIBLE (sha2 of the row id, repeated) —
      // shuffle blocks are compressed, and a constant pad deflates the
      // hot partition below every skew threshold
      val digest = sha2(concat_ws("", $"id".cast("string")), 256)
      val large = spark.range(0, 120000).select(
        when($"id" % 6 =!= 0, lit(0L)).otherwise($"id").as("k"),
        concat(digest, reverse(digest), digest, reverse(digest)).as("payload"))
      val small = spark.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("w"))
      // aggregate INSIDE the asserted plan: collect() of the raw join
      // would haul the hot partition to the driver, and a detached
      // count() would execute a different QueryExecution than the one
      // inspected — the sum keeps payload flowing through the join
      // shuffle while returning one row
      val joined = large.join(small, Seq("k")).agg(sum(length($"payload")))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("skew=true"), s"no runtime skew split:\n$p")
    }
  }

  test("d4: prefix-filtered jaccard — no forced broadcast, candidate join " +
       "keys on prefix postings only") {
    // no STATIC hint — the planner/AQE may still broadcast at test
    // scale, which is exactly the policy
    val opt = SparkEntry.queries("d4_ngram_jaccard")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("strategy=broadcast"), s"static hint leaked:\n$opt")
    // no window sort anywhere: ordering work is per-doc array sort, and
    // ranking never becomes a row_number shuffle
    assert(!plan("d4_ngram_jaccard").contains(" Window "), plan("d4_ngram_jaccard"))
  }

  test("t26: BPE encode — merge table folds as a one-row broadcast, not a join per merge") {
    val p = plan("t26_bpe_encode")
    // the merge array reaches the vocabulary through broadcast nested
    // loop (one row x vocab): merges apply as ONE fold, so there must
    // be exactly one aggregate() pass and no per-merge shuffle chain
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("aggregate\\(".r.findAllIn(p).length >= 1, p)
  }

  test("e19: gap-fill — grid generation is in-pipeline explode, " +
       "agg and LOCF window share the key domain") {
    val p = plan("e19_gapfill")
    // sequence+explode must NOT introduce its own exchange: generate
    // appears fused above the span aggregate
    assert(p.contains("Generate explode(sequence"), p)
    // exactly one window (the LOCF carry), partitioned by the key
    assert(" Window ".r.findAllIn(p).length == 1, p)
  }

  test("e15: the whole funnel is ONE user-keyed shuffle — every step window " +
       "shares a single sort, the per-user finalize reuses the partitioning, " +
       "and only the three counters cross the closing exchange") {
    val p = plan("e15_funnel")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert("\\+- Sort ".r.findAllIn(p).length == 1, p)
    assert("Window \\[min".r.findAllIn(p).length == 3, p)
    assert("Exchange SinglePartition".r.findAllIn(p).length == 1, p)
    // the single-partition exchange must sit ABOVE the partial count —
    // i.e. the global agg ships 3 counters, not per-user rows
    assert(p.indexOf("partial_count") > p.indexOf("Exchange SinglePartition"), p)
    // pruning reaches the scan: the untouched wide columns never load
    assert(!p.contains("props"), p)
  }

  test("v11: sparse retrieval joins the inverted index — no scored-pair window, " +
       "partial top-k below the exchange, partial dot sums collapse the fan-out") {
    val p = plan("v11_sparse_topk")
    // the bounded heap, not a row_number over all scored pairs
    assert(p.contains("partial_top_k_by_score"), p)
    assert(!p.contains(" Window "), p)
    // the postings join collapses map-side: the dot aggregate has a
    // partial_sum before its exchange
    assert(p.contains("partial_sum"), p)
    // corpus relations never cartesian; the BroadcastNestedLoopJoins in
    // this plan are all the ONE-ROW n_docs count crossing into the
    // weights projection (once per consumer subtree), asserted by their
    // build side being an IdentityBroadcastMode of a one-row aggregate
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length ==
      "BroadcastExchange IdentityBroadcastMode".r.findAllIn(p).length, p)
  }

  test("x15/x24: exact percentiles rank over the VALUE histogram, never the rows") {
    // a row_number window partitioned by event_type is one task per
    // type at any data size; the histogram form keeps per-row work in
    // map-side-partial aggregates and windows only distinct values
    for (q <- Seq("x15_percentiles", "x24_winsorize")) {
      val p = plan(q)
      assert(!p.contains("row_number"), s"$q rows entered a window:\n$p")
      assert(p.contains("partial_count"), s"$q histogram not map-side partial:\n$p")
    }
  }

  test("e23: interval coverage — the three sweep windows share ONE sort and " +
       "one key exchange; both collapse aggs reuse the partitioning") {
    val p = plan("e23_interval_coverage")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert("\\+- Sort ".r.findAllIn(p).length == 1, p)
    // pruning: the untouched wide events columns never load
    assert(!p.contains("props"), p)
  }

  test("e39: one scan, one key sort — target/threshold are whole-partition window " +
       "aggregates, so the whole recursion rides a single sorted pass") {
    val p = plan("e39_cusum_changepoint")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"events scanned more than once:\n$p")
    assert("\\+- Sort ".r.findAllIn(p).length == 1, p)
    assert(!p.contains("row_number"), p)
  }

  test("t34: no static broadcast hint on the reference shingle set — the " +
       "planner owns the decision (broadcast at toy scale, shuffle at corpus scale)") {
    val logical = SparkEntry.queries("t34_ngram_novelty")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!logical.contains("ResolvedHint"), logical)
  }

  test("v22: embedding drift reads the corpus through ONE cached aggregate — " +
       "every downstream branch is an InMemoryTableScan, no uncached re-scan") {
    val p = plan("v22_embedding_drift")
    // each FileScan rendering sits INSIDE a cached-relation block; an
    // uncached branch would print a FileScan without its InMemoryRelation
    assert("InMemoryTableScan".r.findAllIn(p).length >= 4, p)
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length,
      s"an uncached corpus scan leaked:\n$p")
  }

  test("x42: KS slice drift reads the corpus through ONE cached histogram — " +
       "the complement side derives, it never rescans") {
    val p = plan("x42_ks_drift")
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length,
      s"an uncached corpus scan leaked:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).length >= 3, p)
  }

  test("x40: chi-square reads orders through ONE cached cell aggregate " +
       "across marginals, totals, and the grid join") {
    val p = plan("x40_chi_square")
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length,
      s"an uncached orders scan leaked:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).length >= 4, p)
  }

  test("t39: JSD reads the corpus through ONE cached token histogram — " +
       "word totals, slice totals, the global total, and the term join all derive") {
    val p = plan("t39_js_divergence")
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length,
      s"an uncached corpus tokenization leaked:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).length >= 4, p)
  }

  test("d15: source overlap shingles the corpus ONCE — sizes and both " +
       "self-join sides read the cached distinct relation") {
    val p = plan("d15_source_overlap")
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length,
      s"an uncached shingle scan leaked:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).length >= 3, p)
  }

  test("e51: Mann–Kendall's pair join and tie histogram read the cached series — " +
       "no uncached event re-scan per consumer") {
    val p = plan("e51_mann_kendall")
    assert("FileScan parquet".r.findAllIn(p).length ==
      "InMemoryRelation".r.findAllIn(p).length * 2, // series lineage = days + day0 scans
      s"an uncached series derivation leaked:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).length >= 3, p)
  }

  test("d18: the per-domain cap plans as WindowGroupLimit — a bounded heap per " +
       "group below the exchange, never a full per-group sort") {
    val p = plan("d18_domain_cap")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("x39: PSI is one scan — bin cells feed totals and terms through one window chain") {
    val p = plan("x39_psi_drift")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"events scanned more than once:\n$p")
  }

  test("x37: MAD outliers — rows never enter a window (value-histogram shape)") {
    val p = plan("x37_mad_outliers")
    assert(!p.contains("row_number"), p)
    assert(p.contains("partial_count"), p)
  }

  // ------------------------------------------------------------------
  // The x47 lesson as a standing rule: an unpartitioned window plans as
  // ONE task — a serial sort of its whole input. That is only
  // acceptable when the input is provably bounded by something OTHER
  // than the data (a config knob, a fixed tier list, a quantized grid),
  // and every such window must say so HERE. The sweep walks the
  // OPTIMIZED logical plan of every query in the surface (subqueries
  // included) and fails on any unpartitioned Window in a query that is
  // not in the allowlist — so the next x47 is caught at review time,
  // with this table as the place its bound must be argued.
  // ------------------------------------------------------------------
  test("no single-partition window over a data-sized relation anywhere " +
      "in the query surface") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    GraftExtensions.register(spark) // some queries resolve SQL-registered functions
    // query name -> why its unpartitioned window is domain-bounded
    val bounded: Map[String, String] = Map(
      "d16_minhash_sweep" -> "|bandTiers| rows (4) — the tier report, not the corpus",
      "d16s_band_sweep_slice" -> "|bandTiers| rows (4) — same gate as d16 over the slice",
      "e33_rfm" -> "cumSumParallel's pass-2 prefix — <= shuffle.partitions rows per metric",
      "e42_kaplan_meier" -> "distinct event-day grain — the risk-set table",
      "e47_conversion_latency" -> "distinct latency seconds (domain-bounded grain)",
      "t33_pr_curve" -> "quantized score grid — prCurve raise_errors past 65536 thresholds",
      "v24_nprobe_sweep" -> "|probes| tiers (3) — the sweep report, not the corpus",
      "x47_skyline" -> "two-pass suffix max pass 2 — <= shuffle.partitions bucket maxima",
      "x48_skew_profile" -> "top-N hot keys (N fixed by the caller)")
    val found = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      var n = 0
      plan.foreachWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => n += 1
        case _ =>
      }
      if (n > 0) Some(name -> n) else None
    }.toMap
    val offenders = found.keySet -- bounded.keySet
    assert(offenders.isEmpty,
      s"unpartitioned window(s) in: ${offenders.toSeq.sorted.mkString(", ")} — " +
        "either partition the window or argue its bound in the allowlist above")
    // the allowlist must stay honest: an entry whose query no longer
    // has an unpartitioned window is stale documentation
    val stale = bounded.keySet -- found.keySet
    assert(stale.isEmpty,
      s"stale allowlist entries (no unpartitioned window left): ${stale.toSeq.sorted}")
  }
}
