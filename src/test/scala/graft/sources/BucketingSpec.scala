package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("join of co-bucketed tables plans with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS bkt_fact")
    spark.sql("DROP TABLE IF EXISTS bkt_dim")
    val fact = (1 to 1000).map(i => (i % 50L, s"f$i")).toDF("k", "fv")
    val dim = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(fact, "bkt_fact", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(dim, "bkt_dim", "k", 8, sortCols = Seq("k"))

    // disable auto-broadcast so the shuffle-elision is what's being tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bkt_fact", "bkt_dim", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bkt_fact")
      spark.sql("DROP TABLE bkt_dim")
    }
  }

  test("appendBucketed grows the table; compactBucketed folds the small files back") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS bkt_grow")
    def tableFiles(): Int = {
      val loc = spark.sql("DESCRIBE EXTENDED bkt_grow")
        .where(col("col_name") === "Location").head().getString(1)
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(f => f.getPath.getName.startsWith("part-"))
    }
    try {
      Bucketing.writeBucketed(
        (1 to 100).map(i => (i % 10L, s"v$i")).toDF("k", "v"), "bkt_grow", "k", 4,
        sortCols = Seq("k"))
      // three appends → three extra file sets per bucket
      for (round <- 1 to 3)
        Bucketing.appendBucketed(
          Seq((round % 10L, s"a$round")).toDF("k", "v"), "bkt_grow")
      val before = tableFiles()
      val content = spark.table("bkt_grow").collect().map(_.toSeq).toSet
      assert(content.size == 103)
      Bucketing.compactBucketed(spark, "bkt_grow")
      // identical content, strictly fewer files, spec preserved
      assert(spark.table("bkt_grow").collect().map(_.toSeq).toSet == content)
      assert(tableFiles() < before, s"compact did not reduce files (before=$before)")
      val meta = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("bkt_grow"))
      assert(meta.bucketSpec.exists(s =>
        s.numBuckets == 4 && s.bucketColumnNames == Seq("k") && s.sortColumnNames == Seq("k")))
      // appending a mismatched-name table is refused up front
      intercept[IllegalStateException] {
        spark.range(1).selectExpr("id as k", "'x' as v").write.saveAsTable("bkt_plain")
        try Bucketing.appendBucketed(Seq((1L, "x")).toDF("k", "v"), "bkt_plain")
        finally spark.sql("DROP TABLE IF EXISTS bkt_plain")
      }
    } finally spark.sql("DROP TABLE IF EXISTS bkt_grow")
  }

  test("loaded IVF index: probe join reads co-located buckets, never exchanges the corpus") {
    import org.apache.spark.sql.functions._
    val emb = spark.range(0, 2000).select(
      $"id".as("vec_id"),
      expr("transform(sequence(0, 15), d -> cast(sin(xxhash64(id, d)) as float))").as("embedding"))
    val idx = graft.ops.Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 8, persist = false)
    // numBuckets == shuffle partitions so the probe-side repartition lands
    // directly on the bucket layout
    graft.ops.Similarity.ivfWrite(idx, "ivf_probe_spec",
      numBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val loaded = graft.ops.Similarity.ivfLoad(spark, "ivf_probe_spec")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle join — the property under test is that the
      // bucketed corpus side never needs an exchange even then
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val probed = graft.ops.Similarity.ivfProbe(
        loaded, emb.where($"vec_id" % 10 === 0), "vec_id", "embedding", 5, nProbe = 2)
      assert(probed.select("query_id").distinct().count() == 200)
      val p = probed.queryExecution.executedPlan.toString
      // exactly two shuffles — probes repartitioned on cell, top-k agg on
      // query_id; a third would mean the corpus side shuffled
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 2, s"corpus-side shuffle leaked:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), s"cells scan is not bucket-aware:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ivf_probe_spec_cells")
      spark.sql("DROP TABLE IF EXISTS ivf_probe_spec_cents")
    }
  }

  test("replaceTable never loses the only complete copy: crash-window recovery") {
    val t = "swap_recovery_t"
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    spark.sql(s"DROP TABLE IF EXISTS `${t}__old`")
    Bucketing.replaceTable(Seq((1, "a")).toDF("k", "v"), t)
    // simulate a crash between the two swap renames: the live table has
    // been retired, nothing holds the live name
    spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__old`")
    Bucketing.replaceTable(Seq((2, "b")).toDF("k", "v"), t)
    assert(spark.table(t).collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((2, "b")))
    assert(!spark.catalog.tableExists(s"${t}__old"), "retired copy must be cleaned up")
    assert(!spark.catalog.tableExists(s"${t}__staging"), "staging must be cleaned up")
    spark.sql(s"DROP TABLE `$t`")
  }

  test("loaded band index: probe joins read co-located buckets, corpus never exchanges") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nb = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft.streaming.CorpusStreams.indexHistory(
        docs.where($"doc_id" < 250), "doc_id", "text", "band_idx_spec",
        numBuckets = nb)
      val idx = graft.streaming.CorpusStreams.loadIndex(spark, "band_idx_spec")
      // force shuffle joins — the property is that the bucketed history
      // sides still never need an exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val probed = graft.streaming.CorpusStreams.nearDupVsIndex(
        docs.where($"doc_id" >= 250), idx, "doc_id", "text", 0.8)
      probed.collect()
      // the adaptive plan echoes the pre-execution plan under
      // "== Initial Plan ==" — count only the final section
      val p = probed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // probe-side exchanges only: bands join + sigs join (+ none for
      // history); a third hashpartitioning would be the corpus leaking
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 2, s"corpus-side shuffle leaked:\n$p")
      assert("Bucketed: true".r.findAllIn(p).length == 2,
        s"history scans are not bucket-aware:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      Seq("_sigs", "_bands", "_meta").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS band_idx_spec$s"))
    }
  }

  test("writeBucketed keeps the bucket spec through the staged swap") {
    val t = "swap_bucketed_t"
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    val df = (1 to 100).map(i => (i % 10L, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(df, t, "k", 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(df, t, "k", 4, sortCols = Seq("k")) // idempotent re-write
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED `$t`").collect().map(_.toString).mkString
    assert(desc.contains("4") && desc.toLowerCase.contains("bucket"), desc)
    assert(spark.table(t).count() == 100)
    spark.sql(s"DROP TABLE `$t`")
  }
}
