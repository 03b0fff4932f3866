package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev probe for the StructureSpec pagerank pin flake (judge r12 #1):
  * runs pagerank at sf0.01 repeatedly under a detail listener and, for
  * every run whose (jobs, stages, shuffles, tasks) deviate from the
  * pinned shape, prints the full per-job breakdown (stage ids, task
  * counts, shuffle dep ids) so the extra job can be IDENTIFIED instead
  * of guessed at. Run concurrently with a full `sbt test` in another
  * working copy to reproduce the load-dependent bimodality.
  *
  * `Test/runMain graft.PagerankFlakeProbe [iterations] [dir]` */
object PagerankFlakeProbe {
  class DetailListener(groupId: String) extends SparkListener {
    case class JobRec(desc: String, stageIds: Seq[Int])
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, JobRec)]()
    val stageTasks = new ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    val stageShuffle = new ConcurrentHashMap[Int, Int]()
    val stageNames = new ConcurrentHashMap[Int, String]()
    private val member = ConcurrentHashMap.newKeySet[Int]()

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val grp = Option(e.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      if (grp.contains(groupId)) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.add((e.jobId, JobRec(desc.take(80), e.stageIds.toSeq)))
        e.stageIds.foreach(member.add(_))
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (member.contains(e.stageInfo.stageId)) {
        stageNames.put(e.stageInfo.stageId, e.stageInfo.name.take(60))
        org.apache.spark.scheduler.GraftStageInfoAccess
          .shuffleDepId(e.stageInfo).foreach(stageShuffle.put(e.stageInfo.stageId, _))
      }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (member.contains(e.stageId))
        stageTasks.computeIfAbsent(e.stageId,
          _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(30)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    val pinned = (23, 23, 9, 28) // StructureSpec's round-13 pagerank pin
    var deviations = 0
    val seen = scala.collection.mutable.Map[(Int, Int, Int, Int), Int]()
    (1 to iters).foreach { i =>
      val group = s"graft-pr-probe-$i"
      val detail = new DetailListener(group)
      val counter = new StructuralCounter(Some(group))
      spark.sparkContext.addSparkListener(detail)
      spark.sparkContext.addSparkListener(counter)
      spark.sparkContext.setJobGroup(group, "pagerank flake probe")
      val counts = try {
        require(graft.ops.GraphOps.pageRank(spark, dir).count() > 0)
        counter.drainAndRead()
      } finally spark.sparkContext.clearJobGroup()
      seen(counts) = seen.getOrElse(counts, 0) + 1
      Thread.sleep(600) // let the detail listener drain
      spark.sparkContext.removeSparkListener(detail)
      spark.sparkContext.removeSparkListener(counter)
      val tag = if (counts == pinned) "OK " else { deviations += 1; "DEV" }
      println(s"PR-PROBE run$i $tag counts=$counts " +
        s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")
      if (counts != pinned) {
        import scala.jdk.CollectionConverters._
        detail.jobs.asScala.toSeq.sortBy(_._1).foreach { case (jid, rec) =>
          val per = rec.stageIds.sorted.map { sid =>
            val t = Option(detail.stageTasks.get(sid)).map(_.get).getOrElse(0)
            val sh = Option(detail.stageShuffle.get(sid)).map("sh" + _).getOrElse("-")
            val nm = Option(detail.stageNames.get(sid)).getOrElse("(skipped)")
            s"  stage$sid tasks=$t $sh $nm"
          }.mkString("\n")
          println(s" job$jid ${rec.desc}\n$per")
        }
      }
    }
    println(s"PR-PROBE DONE deviations=$deviations/$iters shapes=$seen")
    spark.stop()
  }
}
