package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AdcScoreExpr, BloomAgg, BloomMightContain, CountMinSketch, FingerprintExpr, MinHashSigExpr, MisraGries, NfcNormalizeExpr, ObfuscateNameExpr, PqEncodeExpr, PqLutExpr, SigOverlapExpr, SimHash64Expr, TopKByScore, TopKByScoreStr, VectorKernelExpr, VectorSum}

/** Catalyst extension point: registers graft's native expressions as SQL
  * functions, so the engine surface is reachable from `spark.sql(...)` as
  * well as the Column API:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions") ...
  *
  * or for an existing session, [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.2", "", "built-in")

  /** Arity guard: SQL callers get a clean AnalysisException instead of
    * a NoSuchElementException from naive Seq indexing.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString, "docroot" -> ""))
      build(es)
    }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("obfuscate_name",
      info("obfuscate_name", "obfuscate_name(str) - reference S2 name mask"),
      arity("obfuscate_name", 1)(es => ObfuscateNameExpr(es.head))),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization (UAX #15)"),
      arity("nfc_normalize", 1)(es => NfcNormalizeExpr(es.head))),
    ("simhash64",
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash signature"),
      arity("simhash64", 1)(es => SimHash64Expr(es.head))),
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - fused double dot product over array<float|double>"),
      arity("vec_dot", 2)(es => VectorKernelExpr(es(0), es(1), "dot"))),
    ("vec_cosine",
      info("vec_cosine", "vec_cosine(a, b) - fused cosine similarity; NULL for zero norms"),
      arity("vec_cosine", 2)(es => VectorKernelExpr(es(0), es(1), "cosine"))),
    ("vec_l2sq",
      info("vec_l2sq", "vec_l2sq(a, b) - fused squared L2 distance"),
      arity("vec_l2sq", 2)(es => VectorKernelExpr(es(0), es(1), "l2Sq"))),
    ("fingerprint",
      info("fingerprint", "fingerprint(str) - FNV-1a/64 token-sequence fingerprint (warehouse-recomputable)"),
      arity("fingerprint", 1)(es => FingerprintExpr(es.head))),
    ("vector_sum",
      info("vector_sum", "vector_sum(array<float|double>) - grouped element-wise vector sum (partial-combining aggregate)"),
      arity("vector_sum", 1)(es => VectorSum(es.head))),
    ("top_k_by_score",
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - bounded-heap top-k per group as array<struct<neighbor_id,cosine>>, (score DESC, id ASC); k must be a literal"),
      arity("top_k_by_score", 3)(es => TopKByScore(es(0), es(1), es(2)))),
    ("top_k_by_score_str",
      info("top_k_by_score_str",
        "top_k_by_score_str(score, id, k) - STRING-id sibling of top_k_by_score, binary id order; k must be a literal"),
      arity("top_k_by_score_str", 3)(es => TopKByScoreStr(es(0), es(1), es(2)))),
    ("misra_gries",
      info("misra_gries",
        "misra_gries(item, k) - bounded-space frequent-items summary as array<struct<item,weight>>; every item with freq > N/(k+1) guaranteed present; k must be a literal"),
      arity("misra_gries", 2)(es => MisraGries(es(0), es(1)))),
    ("count_min",
      info("count_min",
        "count_min(item, depth, width) - Count-Min sketch over BIGINT items as a row-major array<bigint> of depth*width additive counters; md5-derived buckets, warehouse-replayable; depth/width must be literals"),
      arity("count_min", 3)(es => CountMinSketch(es(0), es(1), es(2)))),
    ("pq_encode",
      info("pq_encode",
        "pq_encode(vec, cents, m, ksub) - product-quantization codes (array<smallint>); m/ksub must be literals"),
      arity("pq_encode", 4)(es => PqEncodeExpr(es(0), es(1),
        litInt("pq_encode", "m", es(2)), litInt("pq_encode", "ksub", es(3))))),
    ("pq_lut",
      info("pq_lut",
        "pq_lut(vec, cents, m, ksub) - ADC lookup table of partial dots (array<double>, length m*ksub)"),
      arity("pq_lut", 4)(es => PqLutExpr(es(0), es(1),
        litInt("pq_lut", "m", es(2)), litInt("pq_lut", "ksub", es(3))))),
    ("adc_score",
      info("adc_score",
        "adc_score(lut, codes) - asymmetric-distance approximate dot product (m adds per pair)"),
      arity("adc_score", 2)(es => AdcScoreExpr(es(0), es(1)))),
    ("sig_overlap",
      info("sig_overlap", "sig_overlap(a, b) - fraction of agreeing minhash positions (estimated Jaccard)"),
      arity("sig_overlap", 2)(es => SigOverlapExpr(es(0), es(1)))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(array<string>, k) - K-value minhash signature; k must be a literal"),
      arity("minhash_sig", 2)(es => MinHashSigExpr(es.head, litInt("minhash_sig", "k", es(1))))),
    ("bloom_agg",
      info("bloom_agg",
        "bloom_agg(hash, numBits, numHashes) - distributed Bloom-filter build over BIGINT hashes; one BINARY value, bitwise-OR merge; numBits/numHashes must be literals"),
      arity("bloom_agg", 3)(es => BloomAgg(es(0), es(1), es(2)))),
    ("bloom_contains",
      info("bloom_contains",
        "bloom_contains(filter, hash) - Bloom membership probe; false positives possible, false negatives never"),
      arity("bloom_contains", 2)(es => BloomMightContain(es(0), es(1))))
  )

  /** Extract a literal INT argument (codegen-time config, not data).
    * NON_FOLDABLE_ARGUMENT is a live Spark 4.1.2 error class — a retired
    * class id would make the error path itself die with INTERNAL_ERROR
    * instead of the intended message.
    */
  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case _ => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$arg`", "paramType" -> "\"INT\""))
  }

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.graft.shims.sessionState(spark).functionRegistry
    functions.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}
