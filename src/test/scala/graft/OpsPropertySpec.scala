package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{EventOps, Relational, TextOps}

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

  // short, heavily-overlapping intervals on a tiny time domain: spans
  // swallow later intervals, ties on (s,e) are frequent — the regime
  // where an off-by-one in the strict `s > prev_end` test shows up
  val ivGen: Gen[(Long, Long, Long)] = for {
    user <- Gen.choose(1L, 3L)
    s <- Gen.choose(0L, 30L)
    len <- Gen.choose(0L, 8L) // zero-length and point-touching intervals
  } yield (user, s, s + len)
  val ivsGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.nonEmptyListOf(ivGen).map(_.take(60).zipWithIndex
      .map { case ((u, s, e), i) => (u, i.toLong, s, e) })

  test("interval sweep ≡ sequential merge on generated interval sets") {
    (1L to 25L).foreach { seed =>
      val ivs = ivsGen.pureApply(Gen.Parameters.default, Seed(seed))
      val df = ivs.toDF("user_id", "event_id", "s_us", "e_us")
      val got = EventOps.intervalSpansOf(df).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      // sequential reference: sort per user, sweep, merge on s <= maxEnd
      val want = ivs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.map { case (_, id, s, e) => (s, e, id) }.sorted
        val spans = scala.collection.mutable.ListBuffer
          .empty[(Long, Long, Long)] // (start, maxEnd, n)
        sorted.foreach { case (s, e, _) =>
          if (spans.nonEmpty && s <= spans.last._2) {
            val (st, en, n) = spans.last
            spans(spans.length - 1) = (st, math.max(en, e), n + 1)
          } else spans += ((s, e, 1L))
        }
        spans.zipWithIndex.map { case ((st, en, n), i) =>
          (u, i + 1, st, en, n, en - st)
        }
      }.toSet
      assert(got == want, s"seed=$seed ivs=$ivs")
    }
  }

  val docGen: Gen[(String, Long)] = for {
    lang <- Gen.oneOf("aa", "bb", "cc", "dd")
    id <- Gen.choose(0L, 500L)
  } yield (lang, id)
  val docsGen: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(docGen).map(_.take(80).distinct)

  test("mix rebalance ≡ sequential hash-ordered pick under per-mille budgets") {
    val weights = Seq("aa" -> 400, "bb" -> 300, "cc" -> 200, "dd" -> 100)
    val budget = 40
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    (1L to 15L).foreach { seed =>
      val docs = docsGen.pureApply(Gen.Parameters.default, Seed(seed))
      val df = docs.toDF("lang", "doc_id")
      val got = TextOps.mixRebalanceOf(df, budget, weights).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))).toSet
      val want = docs.groupBy(_._1).flatMap { case (lang, rows) =>
        val w = weights.toMap.getOrElse(lang, 0)
        val nSource = rows.length.toLong
        val nTarget = math.min(nSource, budget.toLong * w / 1000)
        if (nTarget == 0) None
        else {
          val sel = rows.map(_._2)
            .sortBy(id => (md5hex(s"mix:$id"), id)).take(nTarget.toInt)
          Some((lang, w, nSource, nTarget, sel.length.toLong,
            md5hex(sel.sorted.mkString(","))))
        }
      }.toSet
      assert(got == want, s"seed=$seed docs=$docs")
    }
  }

  test("curriculumOrder ≡ the global row_number window it replaces " +
    "(dense 0-based positions in (band, doc_id) order), on testdata") {
    import org.apache.spark.sql.functions.{col, expr}
    val got = TextOps.curriculumOrder(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), expr(
        s"least(size(split(text, ' ')) div ${TextOps.CurriculumBandTokens}, " +
          s"${TextOps.CurriculumMaxBand})").cast("int").as("band"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy { case (id, band) => (band, id) }
      .zipWithIndex.map { case ((id, band), i) => (id, band, i.toLong) }
    assert(got.length == expected.length && got.length > 0)
    assert(got.sortBy(_._3).toSeq == expected.toSeq)
  }

  test("minLabelComponents ≡ union-find on random graphs (the property " +
    "sweep that exposed the round-9 follower-staleness bug)") {
    // random sparse graphs over small node sets, several per seed —
    // the shapes (multi-hop chains through contraction, follower nodes
    // with no incident contracted edge) arise naturally and caught the
    // jump-less-confirmation mis-convergence off-line before this test
    // pinned it in-repo. Reference: sequential union-find with min
    // labeling.
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(1L, 9L)
      b <- Gen.choose(1L, 9L) if a != b
    } yield (a, b)
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(8, edgeGen)
    (1L to 15L).foreach { seed =>
      val edges = graphGen.pureApply(Gen.Parameters.default, Seed(seed))
        .distinct
      val nodes = (1L to 9L).toSeq
      // union-find reference
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(n => n -> find(n)).toMap
      val pairs = edges.toDF("doc_a", "doc_b").persist()
      val got =
        try ops.DedupOps.minLabelComponents(nodes.toDF("doc_id"), pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally pairs.unpersist()
      assert(got == want,
        s"seed $seed, edges $edges: ${got.filter { case (k, v) => want(k) != v }}")
    }
  }
}
