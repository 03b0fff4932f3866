package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder evidence for the heavy five (VERDICT r9 item 7): build a
  * seed-free DETERMINISTIC ~sf0.3 corpus in /tmp as three
  * content-disjoint replicas of sf0.1, then run
  * q_dedup_clusters / q_minhash_lsh / q_simhash_neardup / q_bfs /
  * q_pagerank on both scales under the structural counter.
  *
  * Replica construction (the property that makes the ladder MEANINGFUL):
  *  - documents: replica k maps every letter through a Caesar shift of k
  *    (`translate`) — a bijection on characters, so shingle equality
  *    WITHIN a replica is exactly preserved (each replica's near-dup
  *    graph is isomorphic to sf0.1's) while shingles ACROSS replicas
  *    almost never collide (cross-replica jaccard ≈ 0) — 3× data ⇒
  *    exactly 3× the pair graph, never 9×. doc_ids offset by 10M·k.
  *  - lineitem/part: order/part keys offset by 10M·k ⇒ three disjoint
  *    copies of the co-purchase graph (same diameter, 3× edges).
  * So a scale-right operator should cost ~3× wall-clock and KEEP its
  * structural shape (same CC convergence cycles, ~same job/stage
  * counts — per-task data grows instead). A quadratic operator would
  * cost ~9×.
  *
  * `Test/runMain graft.ScaleLadder [build|run]` */
object ScaleLadder {
  val Out = "/tmp/graft_sf0.3"
  val Src = "/root/testdata/sf0.1"

  private def shifted(c: org.apache.spark.sql.Column, k: Int) = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String) = s.drop(k) + s.take(k)
    translate(c, lower + upper, rot(lower) + rot(upper))
  }

  def build(spark: SparkSession): Unit = {
    val docs = spark.read.parquet(s"$Src/documents.parquet")
    val docs3 = (0 to 2).map { k =>
      docs.select(
        (col("doc_id") + lit(10000000L * k)).as("doc_id"),
        shifted(col("text"), k).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    docs3.write.mode("overwrite").parquet(s"$Out/documents.parquet")

    val li = spark.read.parquet(s"$Src/lineitem.parquet")
    val li3 = (0 to 2).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(10000000L * k))
        .withColumn("l_partkey", col("l_partkey") + lit(10000000L * k))
    }.reduce(_ unionByName _)
    li3.write.mode("overwrite").parquet(s"$Out/lineitem.parquet")

    val part = spark.read.parquet(s"$Src/part.parquet")
    val part3 = (0 to 2).map { k =>
      part.withColumn("p_partkey", col("p_partkey") + lit(10000000L * k))
    }.reduce(_ unionByName _)
    part3.write.mode("overwrite").parquet(s"$Out/part.parquet")
    println(s"LADDER built $Out: docs=${docs3.count()} li=${li3.count()} " +
      s"part=${part3.count()}")
  }

  val Five = Seq("q_dedup_clusters", "q_minhash_lsh", "q_simhash_neardup",
    "q_bfs", "q_pagerank")

  def run(spark: SparkSession): Unit = {
    for (dir <- Seq(Src, Out); q <- Five) {
      val c = new StructuralCounter
      spark.sparkContext.addSparkListener(c)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (j, s, sh, t) = c.drainAndRead()
      spark.sparkContext.removeSparkListener(c)
      println(f"LADDER $dir $q rows=$n wall=$wall%.2fs jobs=$j stages=$s " +
        f"shuffles=$sh tasks=$t " +
        s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some("build") => build(spark)
      case Some("run") => run(spark)
      case _ => build(spark); run(spark)
    }
    spark.stop()
  }
}
