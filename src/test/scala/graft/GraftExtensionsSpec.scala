package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the custom Catalyst expressions registered as functions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("custom expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT obfuscate_name('Lane Weber Obama') AS m,
                simhash64(array('a','b')) AS sh,
                vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
                vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                vec_l2sq(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS l""").head()
    assert(r.getAs[String]("m") == "Lane W**** *****")
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("l") == 25.0)
  }

  test("zero-norm cosine is NULL in SQL too") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_cosine(array(0.0F), array(1.0F)) AS c").head().isNullAt(0))
  }

  test("round-2 kernels callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT fingerprint('a b c') AS fp,
                sig_overlap(minhash_sig(array('a','b','c'), 16),
                            minhash_sig(array('a','b','c'), 16)) AS same,
                sig_overlap(minhash_sig(array('a','b'), 16),
                            minhash_sig(array('x','y'), 16)) AS diff""").head()
    assert(r.getAs[Long]("fp") != 0L)
    assert(r.getAs[Double]("same") == 1.0)
    assert(r.getAs[Double]("diff") < 0.5)
  }

  test("round-4 aggregates callable from spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((0L, 1L, 0.5, Seq(1.0, 2.0)), (0L, 2L, 0.9, Seq(3.0, 4.0)),
        (1L, 3L, 0.1, Seq(5.0, 6.0)))
      .toDF("g", "id", "score", "v").createOrReplaceTempView("vs_sql")
    val r = spark.sql(
      """SELECT g,
                vector_sum(v) AS s,
                top_k_by_score(score, id, 1) AS tk
         FROM vs_sql GROUP BY g ORDER BY g""").collect()
    assert(r(0).getSeq[Double](1) == Seq(4.0, 6.0))
    assert(r(0).getSeq[org.apache.spark.sql.Row](2).head.getLong(0) == 2L) // best id
    assert(r(1).getSeq[Double](1) == Seq(5.0, 6.0))
  }

  test("string-keyed top-k callable from spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((0L, "b", 0.5), (0L, "a", 0.9), (1L, "c", 0.1))
      .toDF("g", "id", "score").createOrReplaceTempView("vs_str_sql")
    val r = spark.sql(
      """SELECT g, top_k_by_score_str(score, id, 1) AS tk
         FROM vs_str_sql GROUP BY g ORDER BY g""").collect()
    assert(r(0).getSeq[org.apache.spark.sql.Row](1).head.getString(0) == "a")
    assert(r(1).getSeq[org.apache.spark.sql.Row](1).head.getString(0) == "c")
  }

  test("wrong arity raises a clean AnalysisException") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT obfuscate_name()").head())
    assert(e.getMessage.contains("obfuscate_name"))
  }

  test("count_min callable from spark.sql; estimate is a plain projection") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(5L, 5L, 5L, 9L).toDF("item").createOrReplaceTempView("cms_sql")
    val r = spark.sql(
      """WITH sk AS (SELECT count_min(item, 2, 16) AS cms FROM cms_sql)
         SELECT element_at(cms, cast(
           conv(substr(md5(concat(0, ':', 5)), 1, 8), 16, 10) % 16 + 1 as int)) AS c0
         FROM sk""").head()
    assert(r.getLong(0) >= 3L) // row-0 cell holds at least item 5's count
  }
}
