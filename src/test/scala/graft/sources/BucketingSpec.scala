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
}
