package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity-resolution operators — fuzzy record linkage, the step that
  * reconciles dirty free-text identifiers (vendor feeds, OCR, user
  * input) against a canonical catalog before anything joins on them.
  */
object MatchOps {

  /** Blocked fuzzy matching: every record's corrupted name is resolved
    * to its best canonical catalog entry by edit distance, with
    * candidates restricted to a shared BLOCK (here the first character;
    * production stacks more blocking keys — length bands, phonetic
    * codes — the same way [[DedupOps.ngramJaccard]] stacks its size
    * band). The corruption is deterministic — one character dropped at
    * a key-derived position (never position 1, so the block key
    * survives) — which is what lets the oracle rebuild the same dirty
    * names and distances in SQL.
    *
    * Scale shape: the catalog side is the DISTINCT name dimension
    * (tiny → broadcast; Catalyst picks that up automatically), so the
    * candidate rows are generated map-side, and the per-record argmin
    * is a `min(struct(dist, name))` AGGREGATE — partial aggregation
    * collapses each record's candidates before the only shuffle (a
    * rank window here would instead shuffle and sort every candidate
    * row). Determinism: best = min distance, ties to the
    * lexicographically smallest name (exactly the struct ordering);
    * `levenshtein` is exact integer edit distance in both engines. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(spark, dir)
      .filter(col("p_name").isNotNull && length(col("p_name")) >= 2)
    // drop 1-based char at 2 + key mod (len-1) ∈ [2, len]
    val dirty = base.select(col("p_partkey"), expr(
      "concat(substring(p_name, 1, cast(1 + p_partkey % (length(p_name) - 1) AS INT)), " +
        "substring(p_name, cast(3 + p_partkey % (length(p_name) - 1) AS INT), length(p_name)))")
      .as("dirty_name"))
    val catalog = base.select(col("p_name").as("matched_name")).distinct()
      .withColumn("blk", substring(col("matched_name"), 1, 1))
    dirty.withColumn("blk", substring(col("dirty_name"), 1, 1))
      .join(catalog, "blk")
      .withColumn("dist", levenshtein(col("dirty_name"), col("matched_name")).cast("int"))
      .groupBy("p_partkey", "dirty_name")
      .agg(min(struct(col("dist"), col("matched_name"))).as("best"))
      .select(col("p_partkey"), col("dirty_name"),
        col("best.matched_name").as("matched_name"), col("best.dist").as("dist"))
  }
}
