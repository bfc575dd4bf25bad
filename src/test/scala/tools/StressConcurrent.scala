package tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concurrency evidence (VERDICT r5 item 3): several logical "sessions"
  * (threads submitting independent query DAGs — Spark schedules jobs
  * from any thread of one SparkContext) against ONE JVM, measuring
  *
  *  1. throughput of DISJOINT operator families run concurrently vs the
  *     same work run sequentially (scheduler fairness / no global lock
  *     in the engine paths), and
  *  2. the documented CacheSlot eviction churn: the SAME operator driven
  *     on two different corpora from two threads — each call evicts the
  *     other thread's slot occupant ([[graft.ops.CacheSlot]] holds one
  *     per operator), which must cost recompute only, never a wrong
  *     answer.
  *
  * Every concurrent result is hash-compared against its single-threaded
  * baseline (order-insensitive 64-bit row-hash sum), so "no wrong
  * answers" is asserted, not assumed — the run FAILS loudly on any
  * mismatch.
  */
object StressConcurrent {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.EngineSession.local("*", "stress-concurrent")
    spark.sparkContext.setLogLevel("WARN")

    def rowHash(df: DataFrame): (BigDecimal, Long) = {
      // order-insensitive content hash: per-row xxhash64 summed as
      // DECIMAL(38,0) — a LONG sum of uniform 64-bit values overflows
      // almost surely, and ANSI mode (the Spark 4 default) throws on it
      val cols = df.columns.map(c => col(c).cast("string"))
      val r = df.select(
        coalesce(sum(xxhash64(concat_ws("", cols: _*)).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("h"),
        count(lit(1)).as("n")).head()
      (BigDecimal(r.getDecimal(0)), r.getLong(1))
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.streaming.EventStreams.normalizeTs(
      spark.read.parquet(s"$dir/events.parquet"))
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    Seq(docs, emb, events, lineitem).foreach(_.count()) // warm FS cache

    // ---- workload definitions: four disjoint operator families ----
    val workloads: Seq[(String, () => DataFrame)] = Seq(
      ("d2_minhash", () =>
        graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8)),
      ("v1_topk", () =>
        graft.ops.Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding", 5)),
      ("e1_sessionize", () =>
        graft.ops.Sessions.assign(events, "user_id", "ts", 1800)),
      ("a_agg", () =>
        lineitem.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("q"), avg("l_extendedprice").as("p"),
            count(lit(1)).as("n"))))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- baselines: single-threaded, also captures expected hashes ----
    println("== phase 1: disjoint operator families ==")
    // one warm run: slot caches populate exactly as the concurrent runs see them
    workloads.foreach { case (_, q) => rowHash(q()) }
    val expected = workloads.map { case (n, q) => n -> rowHash(q()) }.toMap
    val (_, seqWall) = timed { workloads.foreach { case (_, q) => rowHash(q()) } }
    println(f"sequential (4 families, warm): $seqWall%.1fs")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(workloads.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val (hashes, concWall) = timed {
      val fs = workloads.map { case (n, q) =>
        scala.concurrent.Future { n -> rowHash(q()) }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
    }
    hashes.foreach { case (n, h) =>
      assert(h == expected(n), s"CONCURRENT WRONG ANSWER in $n: $h vs ${expected(n)}")
    }
    println(f"concurrent (4 threads, warm):  $concWall%.1fs  " +
      f"(speedup ${seqWall / concWall}%.2fx, all hashes match)")

    // ---- phase 2: CacheSlot churn — same operator, two corpora ----
    println("== phase 2: slot churn (same operator, alternating corpora) ==")
    val corpusA = docs.where(col("doc_id") % 2 === 0)
    val corpusB = docs.where(col("doc_id") % 2 === 1)
    val rounds = 4
    def churn(c: DataFrame): (BigDecimal, Long) =
      rowHash(graft.ops.Dedup.minhashNearDup(c, "doc_id", "text", 0.8))
    val expA = churn(corpusA)
    val expB = churn(corpusB)
    // sequential alternation: every call after the first evicts the
    // previous corpus's signature slot — the single-session worst case
    val (_, churnSeq) = timed {
      (1 to rounds).foreach { _ =>
        assert(churn(corpusA) == expA); assert(churn(corpusB) == expB)
      }
    }
    println(f"alternating sequential ($rounds%dx2 calls): $churnSeq%.1fs")
    val (_, churnConc) = timed {
      val fa = scala.concurrent.Future {
        (1 to rounds).foreach(_ => assert(churn(corpusA) == expA, "A wrong"))
      }
      val fb = scala.concurrent.Future {
        (1 to rounds).foreach(_ => assert(churn(corpusB) == expB, "B wrong"))
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(Seq(fa, fb)),
        scala.concurrent.duration.Duration.Inf)
    }
    println(f"concurrent 2 threads ($rounds%dx2 calls):   $churnConc%.1fs  " +
      f"(vs sequential ${churnSeq / churnConc}%.2fx, all ${2 * rounds} answers correct)")

    // ---- phase 3: label-memo LRU under concurrent distinct pair plans ----
    println("== phase 3: connected-components memo (4-entry LRU) x 2 threads ==")
    def cc(c: DataFrame): (BigDecimal, Long) = {
      val pairs = graft.ops.Dedup.minhashNearDup(c, "doc_id", "text", 0.8)
      rowHash(graft.ops.Dedup.connectedComponents(pairs))
    }
    val expCcA = cc(corpusA)
    val expCcB = cc(corpusB)
    val (_, ccWall) = timed {
      val fs = Seq(
        scala.concurrent.Future((1 to 2).foreach(_ => assert(cc(corpusA) == expCcA, "ccA"))),
        scala.concurrent.Future((1 to 2).foreach(_ => assert(cc(corpusB) == expCcB, "ccB"))))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
    }
    println(f"concurrent cc (2 threads x 2 calls): $ccWall%.1fs (memo-hit path, correct)")

    // ---- phase 4: ResultMemo (LPA) — compute-outside-lock under
    //      concurrent first callers of the SAME key (both threads race
    //      the loop; first put wins, both answers must equal the
    //      single-threaded baseline) and of DIFFERENT keys (must not
    //      serialize behind each other's rounds) ----
    println("== phase 4: label-propagation ResultMemo x 2 threads ==")
    def lpaEdges(c: DataFrame): DataFrame = {
      val pairs = graft.ops.Dedup.minhashNearDup(c, "doc_id", "text", 0.8)
      pairs.select(col("id_a").as("s"), col("id_b").as("d"))
        .unionByName(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
    }
    def lpa(c: DataFrame): (BigDecimal, Long) =
      rowHash(graft.ops.Graph.labelPropagation(lpaEdges(c), "s", "d", rounds = 3))
    val expLpaA = lpa(corpusA)
    val expLpaB = lpa(corpusB)
    val (_, lpaWall) = timed {
      val fs = Seq(
        // same-key race: two first callers for corpusA simultaneously
        scala.concurrent.Future(assert(lpa(corpusA) == expLpaA, "lpaA-1")),
        scala.concurrent.Future(assert(lpa(corpusA) == expLpaA, "lpaA-2")),
        // different key concurrently — must not block on A's loop
        scala.concurrent.Future(assert(lpa(corpusB) == expLpaB, "lpaB")))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
    }
    println(f"concurrent lpa (same-key race + distinct key): $lpaWall%.1fs (all correct)")

    pool.shutdown()
    println("[stress-concurrent] PASS — no failures, no wrong answers")
    spark.stop()
  }
}
