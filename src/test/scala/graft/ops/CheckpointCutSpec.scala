package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CheckpointCutSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def leafRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => fail(s"expected a checkpoint leaf, got ${other.getClass}")
    }

  test("no checkpoint dir: cut is an executor-local checkpoint leaf") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val cut = CheckpointCut.cut(Seq(1, 2, 3).toDF("x"))
    val rdd = leafRdd(cut)
    assert(rdd.isCheckpointed)
    // localCheckpoint has blocks, never files — the property that makes
    // it unsafe under executor loss
    assert(rdd.getCheckpointFile.isEmpty)
    assert(cut.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    CheckpointCut.release(cut)
  }

  test("checkpoint dir set: cut is a RELIABLE checkpoint and release deletes its files") {
    val dir = java.nio.file.Files.createTempDirectory("cut-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val cut = CheckpointCut.cut(Seq(4, 5).toDF("x"))
      val rdd = leafRdd(cut)
      assert(rdd.isCheckpointed)
      assert(rdd.getCheckpointFile.isDefined, "expected checkpoint FILES (cluster-survivable)")
      assert(cut.as[Int].collect().sorted.toSeq == Seq(4, 5))
      import scala.jdk.CollectionConverters._
      def rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .count(_.getFileName.toString.startsWith("rdd-"))
      assert(rddDirs == 1)
      // Spark's ContextCleaner ignores checkpoint files by default;
      // release is what keeps an iterative loop from leaking a dir/round
      CheckpointCut.release(cut)
      assert(rddDirs == 0, "release must delete the reliable-checkpoint files")
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
