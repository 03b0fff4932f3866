package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{EventOps, Relational}

/** Property checks for the algorithmic operators against brute-force /
  * sequential references on generated inputs (fixed scalacheck seeds —
  * deterministic). The DuckDB oracle pins the production corpora; these
  * pin the ALGORITHMS on adversarial shapes (dense ties, tiny domains)
  * the corpora may not exhibit. */
class OpsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // small value domains force heavy price/date ties — the regime where
  // the frontier's peer handling and strictness can silently go wrong
  val pointGen: Gen[(Long, Long, Long)] = for {
    p <- Gen.choose(0L, 6L)
    d <- Gen.choose(0L, 6L)
  } yield (0L, p, d)
  val pointsGen: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(pointGen).map(_.take(60).zipWithIndex
      .map { case ((_, p, d), i) => (i.toLong, p, d) })

  test("skyline ≡ brute-force dominance filter on generated point sets") {
    (1L to 25L).foreach { seed =>
      val pts = pointsGen.pureApply(Gen.Parameters.default, Seed(seed))
      val df = pts.toDF("o_orderkey", "price_cents", "d_us")
      val got = Relational.skylineOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = pts.filter { case (_, p, d) =>
        !pts.exists { case (_, p2, d2) =>
          p2 >= p && d2 >= d && (p2 > p || d2 > d)
        }
      }.toSet
      assert(got == want, s"seed=$seed pts=$pts")
    }
  }

  val evGen: Gen[(Long, Long, Long, Long)] = for {
    user <- Gen.choose(1L, 4L)
    us <- Gen.choose(0L, 9L) // dense ts ties: event_id must break them
    c <- Gen.choose(0L, 999L)
  } yield (user, us, 0L, c)
  val evsGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.nonEmptyListOf(evGen).map(_.take(80).zipWithIndex
      .map { case ((u, us, _, c), i) => (u, us, i.toLong, c) })

  test("ewma fold ≡ a plain sequential Scala fold on generated sequences") {
    (1L to 25L).foreach { seed =>
      val evs = evsGen.pureApply(Gen.Parameters.default, Seed(seed))
      val df = evs.toDF("user_id", "us", "event_id", "c")
      val got = EventOps.ewmaOf(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = evs.groupBy(_._1).map { case (u, rows) =>
        val cs = rows.sortBy(r => (r._2, r._3)).map(_._4)
        u -> (cs.length.toLong, cs.tail.foldLeft(cs.head)((s, x) => (s + x) / 2))
      }
      assert(got == want, s"seed=$seed evs=$evs")
    }
  }
}
