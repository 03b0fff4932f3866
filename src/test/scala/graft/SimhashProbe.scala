package graft

/** Dev probe for the scale-aware simhash banding: per scale, the corpus
  * size, chosen band width, candidate-pair volume at the ADAPTIVE width
  * vs the legacy FIXED 4-bit width (same wide hash), and the verified
  * output size. Establishes (and re-verifies) DedupSpec's pinned
  * values. `Test/runMain graft.SimhashProbe [dirs...]` */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq(TestSpark.Sf0001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val n = graft.sources.Tables.documents(spark, dir).count()
      val bb = graft.ops.DedupOps.simhashBandBits(n)
      val adaptive = graft.ops.DedupOps.simhashCandidateCount(spark, dir, bb)
      val fixed = graft.ops.DedupOps.simhashCandidateCount(spark, dir, 4)
      val out = graft.ops.DedupOps.simhashNearDupBanded(spark, dir, bb).count()
      println(s"SIMHASH $dir: n=$n bandBits=$bb candidates_adaptive=$adaptive " +
        s"candidates_fixed4=$fixed output=$out")
    }
    spark.stop()
  }
}
