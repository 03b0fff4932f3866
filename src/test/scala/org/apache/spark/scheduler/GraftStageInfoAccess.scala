package org.apache.spark.scheduler

/** Test-only accessor: `StageInfo.shuffleDepId` is `private[spark]`, but
  * it is exactly the fact the structural-cost pin needs — which shuffle
  * dependency (exchange) a completed map stage materialized. One-line
  * package-escape, no behavior. */
object GraftStageInfoAccess {
  def shuffleDepId(si: StageInfo): Option[Int] = si.shuffleDepId
}
