package tools
import org.apache.spark.sql.functions._
object XxhPrint {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("2", "xxh-print")
    import spark.implicits._
    Seq(0L,1L,2L,3L,10L,100L,12345L,999999999L).toDF("vec_id")
      .select(col("vec_id"), xxhash64(col("vec_id")).as("xxh"))
      .collect().foreach(r => println(s"XXH ${r.getLong(0)} ${r.getLong(1)}"))
    spark.stop()
  }
}
