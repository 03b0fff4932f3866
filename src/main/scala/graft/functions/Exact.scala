package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers shared by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Floating-point SUMs are order-dependent, so any query that
  * emits a raw `sum(double)` is a hash landmine. Discipline:
  *
  *   - money/value doubles (2-decimal by construction) → exact integer
  *     cents BEFORE aggregation: `round(x*100)::long`. The product's FP
  *     error is ~1e-10 so the rounded integer is exact in both engines.
  *   - averages → integral division of two exact longs (`div` in Spark,
  *     `//` in DuckDB — both truncate toward zero).
  *   - ratios/similarities → a SINGLE IEEE double op (one division, one
  *     sqrt) over exact integers is bit-deterministic and therefore safe
  *     to emit, unlike a sum of doubles.
  */
object Exact {
  /** 2-decimal double → exact integer cents (long). */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** 2-decimal fraction (e.g. l_discount 0.05) → exact integer percent. */
  def pct(c: Column): Column = round(c * lit(100)).cast("long")

  /** Truncating integral division over longs, matching DuckDB's `//`.
    * `(a - a % b)` is exactly divisible by `b`, so the double division is
    * exact for |quotient| < 2^53 and the cast is deterministic — unlike
    * `(a/b).cast("long")`, where the FP quotient can round across an
    * integer boundary.
    */
  def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
}
