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
}
