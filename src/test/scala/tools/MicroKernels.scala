package tools

import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Pure-JVM microbenchmark of the hot kernels (no Spark session): isolates
  * kernel arithmetic from stage overhead (shuffle, codegen, row copy) when
  * the stage-level CPU numbers look implausible for the flop count.
  */
object MicroKernels {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(7)
    val dim = 64
    val n = 2000
    val vecs = Array.fill(n) {
      new GenericArrayData(Array.fill(dim)(java.lang.Float.valueOf(rnd.nextFloat() * 2 - 1)))
    }
    def bench(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { f; r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $label%-28s ${sec / reps}%8.4fs per pass ($reps reps)")
    }
    bench("sign_bands 64x8 all rows", 5) {
      var i = 0
      while (i < n) {
        graft.functions.SignBands.bandKeys(vecs(i), 64, 8, true)
        i += 1
      }
    }
    bench("cosine all pairs 2000x200", 3) {
      var i = 0
      while (i < n) {
        var j = 0
        while (j < 200) {
          graft.functions.VectorKernels.cosine(vecs(i), vecs(j), true, true)
          j += 1
        }
        i += 1
      }
    }
    // the shingle kernel on realistic text
    val words = Array.fill(400)(s"w${rnd.nextInt(5000)}")
    val text = org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" "))
    bench("shingles 400w x 2000 docs", 3) {
      var i = 0
      while (i < n) {
        graft.functions.NGramShingles.shingleKernel(text, 3)
        i += 1
      }
    }
    val sh = graft.functions.NGramShingles.shingleKernel(text, 3)
    bench("minhash k=128 x 2000 docs", 3) {
      var i = 0
      while (i < n) {
        graft.functions.MinHash.minhashValues(sh, 128)
        i += 1
      }
    }
  }
}
