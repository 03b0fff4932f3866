package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{GraftExtensions, GraftFunctions}

/** SQL surface of the custom Catalyst Expressions. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    val d = spark.sql("SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(d == 32L)
    val s = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS s")
      .head().getLong(0)
    assert(s == 2L)
  }

  test("extension class injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  // id-derived arrays: non-foldable, so the optimized plan keeps the
  // rewritten expression visible instead of constant-folding it away
  private def hofDot(a: String, b: String) = {
    GraftFunctions.register(spark) // installs the optimizer rewrite too
    spark.range(1).selectExpr(s"$a AS a", s"$b AS b").selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS dot")
  }

  test("RewriteLongDot: the composable HOF dot product fuses to long_dot") {
    val df = hofDot("array(id + 1L, 2L, 3L)", "array(4L, 5L, 6L)")
    assert(df.queryExecution.optimizedPlan.toString.contains("long_dot"),
      s"HOF shape not rewritten:\n${df.queryExecution.optimizedPlan}")
    assert(df.head().getLong(0) == 32L)
  }

  test("RewriteLongDot preserves the HOF null discipline exactly") {
    // length mismatch (zip_with null-pads) and a null element both yield
    // NULL through the Add chain — the strict-mode rewrite must agree
    val mismatch = hofDot("array(id + 1L, 2L)", "array(3L)")
    assert(mismatch.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(mismatch.head().isNullAt(0), "length mismatch must stay NULL")
    val nullElem = hofDot("array(id, CAST(NULL AS BIGINT))", "array(3L, 4L)")
    assert(nullElem.head().isNullAt(0), "null element must stay NULL")
    // a non-matching shape (different merge op) is left alone
    val other = spark.range(1).selectExpr("array(id + 1L) AS a", "array(2L) AS b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc - v) AS dot")
    assert(!other.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(other.head().getLong(0) == -2L)
  }
}
