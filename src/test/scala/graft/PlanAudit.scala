package graft

/** r19 measurement tooling (guide §1.1/§7.2): dump the formatted physical
  * plan of EVERY declared query in one JVM so the whole surface can be
  * swept for plan anti-patterns (cartesian products, oversized
  * BroadcastNestedLoopJoins, Expand blowups, scans without pushed
  * filters/pruned schemas, unexpected exchanges). Query construction runs
  * each operator's side effects (lifecycle writes, streams), so the dump
  * also doubles as a smoke pass. `Test/runMain graft.PlanAudit [sfDir [out]]`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = if (args.length > 1) args(1) else "/tmp/plan_audit.txt"
    val out = new java.io.PrintWriter(outPath)
    var failed = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      out.println(s"\n===== $name")
      try {
        val df = fn(spark, dir)
        out.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } catch {
        case e: Throwable =>
          failed += 1
          out.println(s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      out.flush()
    }
    out.close()
    println(s"PLAN-AUDIT wrote $outPath failed=$failed")
    spark.stop()
    // a smoke gate must fail MECHANICALLY, not only in the printed count
    if (failed > 0) sys.exit(1)
  }
}
