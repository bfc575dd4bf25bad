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
