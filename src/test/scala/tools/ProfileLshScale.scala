package tools

import org.apache.spark.sql.functions._

/** autoBits scaling sweep: candidate volume of the sign-LSH near-dup
  * pipeline as the corpus grows 10⁴ → 10⁶ synthetic (near-uniform)
  * vectors, with band width derived from the corpus-size hint
  * (`Similarity.autoBits`: bits ≈ log2(n) − 1 clamped [16, 32]) vs the
  * fixed 16-bit legacy default. Random vectors have no true near-dups,
  * so every candidate is a FALSE POSITIVE — exactly the volume the bits
  * rule must keep near-linear (collisions per band ≈ n²/2^(bits+1)).
  *
  * Method: band keys for a SAMPLE of bands (collision statistics are
  * iid across bands — the hyperplanes differ but the key distribution
  * doesn't), per-band candidate count Σ C(bucket, 2) by group-count,
  * extrapolated ×autoBands(θ, bits). Run:
  * `sbt "Test/runMain tools.ProfileLshScale [dim] [theta]"`
  */
object ProfileLshScale {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 64
    val theta = if (args.length > 1) args(1).toDouble else 0.8
    val sampleBands = 8
    val spark = graft.EngineSession.local("32", "lsh-scale-profile")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    println(f"[lsh-scale] theta=$theta dim=$dim sampled_bands=$sampleBands")
    println("[lsh-scale] n        bits bands    cand/band      total_est  cand_per_vec")
    for (n <- Seq(10000L, 100000L, 1000000L); mode <- Seq("auto", "fixed16")) {
      val bits = if (mode == "auto") graft.ops.Similarity.autoBits(n, theta) else 16
      val bands = graft.ops.Similarity.autoBands(theta, bits)
      val vecs = spark.range(n).select(col("id").as("doc_id"),
        expr(s"transform(sequence(0, ${dim - 1}), d -> cast(sin(xxhash64(id, d)) as float))")
          .as("vec"))
      val perBand = vecs
        .select(posexplode(
          graft.functions.SignBands.sign_bands(col("vec"), sampleBands, bits))
          .as(Seq("band_idx", "band_key")))
        .groupBy("band_idx", "band_key").count()
        .groupBy("band_idx").agg(sum(col("count") * (col("count") - 1) / 2).as("cand"))
        .agg(avg("cand")).head().getDouble(0)
      val total = perBand * bands
      println(f"[lsh-scale] $n%-8d $bits%4d $bands%5d ${perBand}%12.1f ${total}%14.0f ${total / n}%13.2f  ($mode)")
    }
    spark.stop()
  }
}
