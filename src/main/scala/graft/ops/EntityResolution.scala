package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over a master-data registry: find record pairs
  * whose NAMES are within a small edit distance — the typo/variant
  * matching step of supplier/customer/part deduplication, a different
  * dedup family from the token-set similarity in [[Dedup]] (edit
  * distance sees transposed letters and dropped characters that shingle
  * Jaccard is blind to at short string lengths).
  *
  * Shape: blocking passes + exact verification — the same
  * candidates-then-verify discipline as every near-dup tier here.
  * Blocking keys are the name's first `blockLen` and last `blockLen`
  * characters (two passes, unioned): a SINGLE edit (substitution,
  * insertion, deletion) at position p leaves the prefix intact when
  * p ≥ blockLen, and leaves the last `blockLen` characters intact when
  * p < blockLen (lengths shift but the tail characters are untouched) —
  * so for `maxDist = 1` and names of length ≥ blockLen + 1 per side,
  * candidate recall is EXACT, not probabilistic (proved against
  * brute-force in the spec). For `maxDist ≥ 2` the pigeonhole breaks
  * (one edit can hit each end); the blocking still finds most pairs but
  * the guarantee is gone — documented, and the oracle mirrors the
  * algorithm either way. A length filter (|len(a) − len(b)| ≤ maxDist,
  * a lower bound on edit distance) prunes inside the candidate join.
  *
  * Scale: candidate volume is Σ_blocks |block|², the standard ER
  * blocking trade — block keys here are name fragments, so cardinality
  * tracks name diversity. A degenerate block (every name sharing one
  * prefix) is the salting case: pre-split such keys or lengthen
  * `blockLen`. Verification is codegen `levenshtein` per candidate —
  * O(len²) per pair on the surviving few. Exact-duplicate names (dist
  * 0) form quadratic cliques by construction; canonicalize exact dups
  * FIRST ([[Dedup.exact]]) and resolve the distinct-name registry, as
  * the d10 query does.
  *
  * @return (id_a, id_b, dist) — id_a < id_b, dist ≤ maxDist
  */
object EntityResolution {

  def resolveEntities(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int = 1,
      blockLen: Int = 3): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen >= 1, "blockLen must be >= 1")
    val base = df.select(col(idCol).as("rec_id"), col(nameCol).as("name"))
    val pre = base.withColumn("bk", substring(col("name"), 1, blockLen))
      .withColumn("pass", lit(0))
    val suf = base.withColumn("bk", substring(col("name"), -blockLen, blockLen))
      .withColumn("pass", lit(1))
    val blocked = pre.union(suf)
    blocked.as("x")
      .join(blocked.as("y"),
        col("x.bk") === col("y.bk") && col("x.pass") === col("y.pass") &&
          col("x.rec_id") < col("y.rec_id") &&
          abs(length(col("x.name")) - length(col("y.name"))) <= maxDist)
      .select(col("x.rec_id").as("id_a"), col("y.rec_id").as("id_b"),
        col("x.name").as("name_a"), col("y.name").as("name_b"))
      // the same pair can surface from both the prefix and suffix pass
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
