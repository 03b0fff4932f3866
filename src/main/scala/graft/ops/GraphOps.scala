package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over relations the star schema implies. Sibling of
  * [[DedupOps.dedupClusters]] (connected components) on the same
  * principle: the graph is a DataFrame of edges and every step is a
  * join/aggregate Catalyst can plan — no driver-side adjacency.
  */
object GraphOps {

  /** (deg, id) total order — the orientation key of [[triangleCount]]. */
  private def ordLt(da: Column, a: Column, db: Column, b: Column): Column =
    da < db || (da === db && a < b)

  /** Triangle counting on the PROMO co-purchase graph (parts are
    * adjacent when some order contains both), the standard cohesion
    * measure over a market-basket projection. Exact, via the
    * degree-ordered orientation (Suri & Vassilvitskii, "Counting
    * triangles and the curse of the last reducer", WWW 2011): each
    * undirected edge points from its (degree, id)-smaller endpoint, so
    * every triangle forms exactly one wedge at its smallest vertex and
    * the wedge fan-out per node is bounded by out-degree ≤ O(√m) —
    * a hub of degree d contributes d² wedges under naive id-orientation
    * but only its out-wedges here, which is what survives a power-law
    * degree distribution at 100 TB.
    *
    * Edge building groups items in-order (orders are tiny baskets;
    * the pair fan-out happens inside the row, never a self-join that
    * rescans lineitem). The edge list feeds three branches (degrees,
    * wedges, the closing-edge probe), so it is MATERIALIZED once to
    * process-scratch parquet rather than recomputed per branch or
    * pinned in executor memory for the query's lifetime.
    *
    * Output is the one-row graph summary (nodes, edges, triangles);
    * the orientation is internal, so the oracle counts the same
    * triangles with the plain a<b<c three-way join. */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val baskets = Tables.lineitem(spark, dir)
      // a null order key is not a basket: the oracle's equality self-
      // join never matches NULL, but a groupBy would happily build one
      // null-keyed mega-basket — drop them up front (null part keys
      // vanish inside collect_set either way)
      .filter(col("l_orderkey").isNotNull)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    val edgesOut = graft.ingest.Materialize.processScratchDir(
      s"graft_tri_edges_${java.lang.Integer.toHexString(dir.hashCode)}")
    baskets
      .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("b"))
      .distinct()
      .write.mode("overwrite").parquet(edgesOut)
    val edges = spark.read.parquet(edgesOut)

    val deg = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(ordLt(col("da"), col("a"), col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(ordLt(col("da"), col("a"), col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(ordLt(col("da"), col("a"), col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("ddst"))
    // wedges at the triangle's (deg,id)-minimal vertex; the two out-
    // neighbors keep the same order, so the closing edge is src=v, dst=w
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = e1.join(e2, "src")
      .filter(ordLt(col("dv"), col("v"), col("dw"), col("w")))
    val tri = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))

    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }
}
