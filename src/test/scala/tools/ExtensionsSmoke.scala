package tools

import org.apache.spark.sql.SparkSession

/** Drives the `spark.sql.extensions` config path (the standard way a
  * cluster enables graft's SQL functions) in a fresh session.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-smoke")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT obfuscate_name('Lane Weber Obama') AS m,
               vec_cosine(array(1.0F,0.0F), array(1.0F,0.0F)) AS c""").head()
    println(s"EXT_SMOKE m=${r.getString(0)} c=${r.getDouble(1)}")
    assert(r.getString(0) == "Lane W**** *****")
    assert(r.getDouble(1) == 1.0)
    spark.stop()
  }
}
