package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators over `documents` (north-star: the dedup half of
  * a training-data pipeline).
  *
  * Determinism design: every hash is md5 (identical across engines, unlike
  * xxhash64), minhash signatures are lexicographic minima of md5 hex
  * prefixes, and jaccard is a single IEEE division over exact integer
  * set sizes — so even the LSH-approximate candidate set is
  * oracle-reproducible in DuckDB.
  *
  * Scale design: nothing here collects to the driver. The LSH candidate
  * join shuffles on (band, band_sig) — the classic shingle→minhash→band→
  * bucket-join pipeline, which is how you dedup 100 TB without the O(n²)
  * all-pairs comparison. The exact-jaccard verify only touches candidate
  * pairs.
  */
object DedupOps {

  val NumHashes = 16
  val RowsPerBand = 4 // 4 bands × 4 rows: P(candidate) = 1-(1-J^4)^4

  private def tokenSet: Column = array_distinct(split(col("text"), " "))

  /** Exact content dedup on the normalized token set: documents whose
    * sorted distinct-token sets are identical share an md5 group key.
    * A pure hash-groupBy — one shuffle, fully scalable. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(tokenSet))).as("content_key"))
      .groupBy("content_key")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))

  /** MinHash + LSH near-dup pairs: 16 md5-based minhashes, 4 bands of 4
    * rows; docs sharing any full band signature become candidates; each
    * candidate pair is then verified with exact token-set jaccard >= 0.8.
    *
    * Band signatures concatenate (h, minhash) sorted by NUMERIC h —
    * sorting the strings would order "10:" before "8:" and diverge from
    * the oracle's ORDER BY h.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenSet.as("s"))

    val minhashes = sets
      .select(col("doc_id"), explode(col("s")).as("tok"))
      .withColumn("h", explode(sequence(lit(0), lit(NumHashes - 1))))
      .select(col("doc_id"), col("h"),
        substring(md5(concat(col("h").cast("string"), lit(":"), col("tok"))), 1, 16)
          .as("hv"))
      .groupBy("doc_id", "h")
      .agg(min(col("hv")).as("mh"))

    val bands = minhashes
      .withColumn("band", expr(s"h div $RowsPerBand"))
      .groupBy("doc_id", "band")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("h"), col("mh")))),
          s => concat(s.getField("h").cast("string"), lit(":"), s.getField("mh"))),
        "|").as("band_sig"))

    val candidates = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("band_sig")),
        Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()

    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("long"))
      .filter(col("inter") * 10 >= col("uni") * 8)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** Word 3-gram (shingle) jaccard pairs, blocked by (lang, source) —
    * the n-gram variant of near-dup mining. Blocking keys bound the pair
    * space; at 100 TB the blocks shard across the cluster and no block is
    * ever materialized on one node. Emits every intersecting pair with
    * its exact shingle-jaccard. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(expr(
          "transform(sequence(1, size(t)-2), i -> " +
            "concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2)))"))
          .as("sh"))
    val a = sh.select(col("lang"), col("source"),
      col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = sh.select(col("lang"), col("source"),
      col("doc_id").as("doc_b"), col("sh").as("shb"))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .filter(col("inter") > 0)
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("long"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** 16-bit SimHash per document from md5 nibbles: for bit b, every
    * distinct token votes ±1 with bit b of its md5's first 16 bits; the
    * sign of the vote sum sets the bit. One explode + one groupBy —
    * linear in corpus size. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // nibble value of hex char #(c+1) of md5(tok), 0-based c in 0..3
    def nib(c: Int): Column =
      conv(substring(md5(col("tok")), c + 1, 1), 16, 10).cast("long")
    // vote for bit b: +1 if bit (b%4) of nibble (b/4) is set, else -1
    def vote(b: Int): Column =
      (shiftright(nib(b / 4), 3 - b % 4) % 2) * 2 - 1
    val aggs = (0 until 16).map(b => sum(vote(b)).as(s"s$b"))
    val votes = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokenSet).as("tok"))
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
    votes.select(col("doc_id"),
      (0 until 16).map(b =>
        when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }
}
