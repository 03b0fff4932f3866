package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{LongDotProduct, SortedIntersectSize}

/** Custom codegen Expressions vs their composable built-in equivalents. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rnd = new scala.util.Random(42)

  test("LongDotProduct ≡ aggregate(zip_with(...)) on random long arrays") {
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextInt(2001) - 1000L),
      Seq.fill(64)(rnd.nextInt(2001) - 1000L)))
    val df = rows.toDF("a", "b")
      .withColumn("fast", LongDotProduct.longDot(col("a"), col("b")))
      .withColumn("ref", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    // spot value
    val r0 = df.select("fast").head().getLong(0)
    val expect = rows.head._1.zip(rows.head._2).map { case (x, y) => x * y }.sum
    assert(r0 == expect)
  }

  test("SortedIntersectSize ≡ size(array_intersect) on sorted distinct arrays") {
    def randSet() = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(100).toLong).distinct.sorted
    val rows = Seq.fill(300)((randSet(), randSet()))
    val df = rows.toDF("a", "b")
      .withColumn("fast", SortedIntersectSize.sortedIntersectSize(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("SortedIntersectSize string variant") {
    def randSet() = Seq.fill(rnd.nextInt(30) + 1)("w" + rnd.nextInt(50)).distinct.sorted
    val rows = Seq.fill(300)((randSet(), randSet()))
    val df = rows.toDF("a", "b")
      .withColumn("fast", SortedIntersectSize.sortedIntersectSize(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("non-ANSI cast semantics (SURVEY §7.4): garbage → null, float-like → truncated") {
    // BigQuery CAST would ERROR on '1.5' and 'abc'; Spark non-ANSI
    // truncates numeric strings and nulls non-numeric ones.
    val df = Seq("12", "1.5", "abc", "").toDF("s")
      .withColumn("i", col("s").cast("int"))
    val got = df.collect().map(r => Option(r.get(1))).toSeq
    assert(got == Seq(Some(12), Some(1), None, None))
  }

  test("cast(avg) truncates toward zero in Spark") {
    val v = Seq(1, 2).toDF("x").agg(avg("x").cast("int")).head().getInt(0)
    assert(v == 1) // 1.5 → 1 (DuckDB CAST would round; oracles use // instead)
  }
}
