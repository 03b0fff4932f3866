package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{ColStat, CommittedFile, ManifestBatchWrite, ManifestSink, ManifestStreamingWrite}

/** Scale rung for the LAKE surface (VERDICT r11 item 5): the text/graph
  * ladder proves the QUERY side; this drives the epoch LOG itself to
  * 1,000 commits — two streaming writers interleaved with batch appends,
  * the exact mixed-writer traffic the round-12 identity protocol
  * serves — and measures what a long-lived table costs:
  *
  *  - per-commit metadata bytes (non-compacting commits must stay FLAT
  *    as the table ages; only the every-interval compaction pays the
  *    union — the r11 scheme re-wrote the union on EVERY commit),
  *  - AS-OF snapshot reconstruction and incremental-window reads at
  *    age 1,000 (O(fragments) = O(epochs/interval) metadata reads),
  *  - the streaming replay check (txnWatermark) at age 1,000 — #txn
  *    records lead every fragment, so it reads O(writers) bytes,
  *  - a filtered snap SQL read whose `#stats` prune 999 of 1,000 files
  *    at scan build (the data-skipping economics at table age),
  *  - VACUUM over a 5,000-file orphan set next to 1,000 committed files.
  *
  * Commits drive the connector protocol directly (the commit path is
  * driver-side metadata by design — no cluster needed to exercise it);
  * the final reads go through the real catalog SQL face. Results are
  * recorded in COVERAGE.md's round-12 ledger.
  *
  * `Test/runMain graft.LakeLadder [epochs]` */
object LakeLadder {
  private def nowS(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    // default 1005: five epochs stay loose past the last compaction, so
    // the incremental-window probe has a servable tail (a multiple of
    // the interval leaves everything compacted — windows then refuse,
    // which is itself asserted below)
    val epochs = args.headOption.map(_.toInt).getOrElse(1005)
    val root = Files.createTempDirectory("graft_lake_ladder")
    val log = root.resolve("big").toString
    val dataDir = Files.createDirectories(Paths.get(log, "data"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType)))
    val batch = ManifestBatchWrite(log, schema)
    val streamA = ManifestStreamingWrite(log, schema, 10, "ladderA", "runA")
    val streamB = ManifestStreamingWrite(log, schema, 10, "ladderB", "runB")
    var (engineA, engineB) = (-1L, -1L)

    // ——— 1,000 mixed commits: ~1/3 stream A, ~1/7 stream B, rest batch.
    // Data files go through the REAL task writer (parquet, round 13),
    // so the rung measures the actual data plane end to end.
    val deltas = new Array[Long](epochs)
    var (batchN, streamN) = (0, 0)
    val t0 = System.nanoTime()
    (0 until epochs).foreach { i =>
      val name = f"f$i%06d.parquet"
      val w = graft.sources.ManifestWriters.create(log,
        Array("k", "name"), Array("long", "string"), name)
      w.write(org.apache.spark.sql.catalyst.InternalRow(i.toLong,
        org.apache.spark.unsafe.types.UTF8String.fromString("x")))
      val msg = w.commit().asInstanceOf[CommittedFile]
      val before = ManifestSink.metadataBytes.get()
      if (i % 3 == 2) { engineA += 1; streamA.commit(engineA, Array(msg)); streamN += 1 }
      else if (i % 7 == 6) { engineB += 1; streamB.commit(engineB, Array(msg)); streamN += 1 }
      else { batch.commit(Array(msg)); batchN += 1 }
      deltas(i) = ManifestSink.metadataBytes.get() - before
    }
    val buildWall = nowS(t0)
    val flat = deltas.zipWithIndex.filterNot(_._2 % 10 == 9).map(_._1)
    val compacting = deltas.zipWithIndex.filter(_._2 % 10 == 9).map(_._1)
    def count(prefix: String): Int = {
      val s = Files.list(Paths.get(log))
      try s.iterator().asScala.count(_.getFileName.toString.startsWith(prefix))
      finally s.close()
    }
    require(count("compact-") == 1 && count("epoch-") == epochs % 10,
      s"fragment shape: ${count("compact-")} compacts ${count("epoch-")} loose")
    require(ManifestSink.newestVersion(log) == epochs - 1,
      s"mixed commits must serialize onto $epochs distinct epochs")
    println(f"LAKE build epochs=$epochs (batch=$batchN stream=$streamN) " +
      f"wall=$buildWall%.2fs metaBytesPerCommit[noncompact min/median/max]=" +
      f"${flat.min}/${flat.sorted.apply(flat.length / 2)}/${flat.max} " +
      f"compactBytes[first/last]=${compacting.head}/${compacting.last} " +
      s"fragments=${1 + epochs % 10}")
    // bound allows digit growth of monotone counters only (epoch id,
    // row-id base/watermark: O(log n) bytes, round 19) — NEVER O(files)
    require(flat.max <= flat.min + 32,
      s"non-compacting commit metadata grew with age: ${flat.min}..${flat.max}")

    // ——— ROW TRACKING (round 19): O(1) log cost per add — the
    // `#rowid`/`#rowidhwm` lines are covered by the flat-commit pin
    // above. Every live file carries a distinct base, and the id
    // space is exactly the reserved row count (1 row per file here):
    // bases 0..epochs-1 with no range ever issued twice, across THREE
    // interleaved writers racing the same log.
    val rtBases = ManifestSink.rowIdBases(log)
    require(rtBases.size == epochs,
      s"every live file has a #rowid base: ${rtBases.size}/$epochs")
    require(rtBases.values.toSet == (0L until epochs.toLong).toSet,
      "bases are the exact dense reservation 0..n-1 (no reuse, no gap)")
    println(s"LAKE row tracking files=$epochs distinctBases=${rtBases.size} " +
      s"idSpace=[0,$epochs) linesPerCommit=2")

    // ——— reads at table age: AS-OF, incremental window, replay check
    val t1 = System.nanoTime()
    val full = ManifestSink.committedFilesAsOf(log, epochs - 1)
    val asOfWall = nowS(t1)
    require(full.size == epochs, s"as-of newest lists ${full.size}")
    val t2 = System.nanoTime()
    val window = ManifestSink.committedFilesBetween(log, epochs - 6, epochs - 1)
    val incrWall = nowS(t2)
    require(window.size == 5, s"(n-6, n-1] window lists ${window.size}")
    // a window reaching past the sweep refuses loudly (retention bounds
    // incremental reads — never a silently-wrong delta)
    val swept = try { ManifestSink.committedFilesBetween(log, 0, 20); false }
    catch { case e: IllegalStateException =>
      e.getMessage.contains("re-read the full snapshot") }
    require(swept, "swept incremental window did not refuse")
    // the replay check: commit engineA's CURRENT watermark again — a
    // replay — with a planted orphan; the log must not change
    val t3 = System.nanoTime()
    val orphan = "replay-orphan.csv"
    Files.write(dataDir.resolve(orphan), "0,z\n".getBytes(StandardCharsets.UTF_8))
    val sizeBefore = ManifestSink.committedFiles(log).size
    streamA.commit(engineA, Array(CommittedFile(orphan, 1, Seq())))
    val replayWall = nowS(t3)
    require(ManifestSink.committedFiles(log).size == sizeBefore &&
      !Files.exists(dataDir.resolve(orphan)),
      "replayed epoch at age 1000 changed the snapshot or left its orphan")
    println(f"LAKE reads asOf(newest)=$asOfWall%.3fs incrWindow=$incrWall%.3fs " +
      f"replayCheck+cleanup=$replayWall%.3fs (txn read is O(writers): " +
      "#txn records lead each fragment)")

    // ——— the SQL face at age 1,000: full count + a stats-pruned point read
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftCatalog.register(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.sql.catalog.graft.snap.dir", root.toString)
    spark.conf.set("spark.sql.catalog.graft.snap.big.schema", "k LONG, name STRING")
    val t4 = System.nanoTime()
    val n = spark.sql("SELECT count(*) FROM graft.snap.big").collect().head.getLong(0)
    val fullReadWall = nowS(t4)
    require(n == epochs, s"SQL count $n != $epochs")
    val t5 = System.nanoTime()
    val one = spark.sql(s"SELECT k FROM graft.snap.big WHERE k = ${epochs / 2}")
      .collect()
    val pointWall = nowS(t5)
    val (listed, planned) = graft.sources.SnapTable.lastPruneOf("big")
    require(one.length == 1 && one.head.getLong(0) == epochs / 2)
    require(listed == epochs && planned == 1,
      s"stats skipping at age $epochs: planned $planned of $listed")
    println(f"LAKE sql fullCount=$fullReadWall%.2fs pointRead=$pointWall%.2fs " +
      s"filesPlanned=$planned/$listed (#stats prune at scan build)")

    // ——— MERGE-ON-READ deletes at table age (round 15): a 10-row
    // delete across a 1,005-file table must cost O(deleted rows) —
    // one dv epoch, ten tiny dv files, ZERO data files moved — and
    // the SQL face must serve the post-delete answers at full speed
    spark.conf.set("spark.sql.catalog.graft.snap.big.deleteMode", "mor")
    val dvKeys = (0 until 10).map(i => epochs / 2 + i * 7)
    val preDelete = ManifestSink.committedFiles(log).toSet
    val t7 = System.nanoTime()
    spark.sql(s"DELETE FROM graft.snap.big WHERE k IN (${dvKeys.mkString(",")})")
    val dvWall = nowS(t7)
    require(ManifestSink.committedFiles(log).toSet == preDelete,
      "merge-on-read delete moved data files")
    val dvMap = ManifestSink.deleteVectors(log)
    require(dvMap.size == dvKeys.size &&
      dvMap.values.flatten.map(_._2).sum == dvKeys.size,
      s"ten 1-position dvs expected: $dvMap")
    val dvBytes = dvMap.values.flatten
      .map(e => Files.size(dataDir.resolve(e._1))).sum
    require(dvBytes < 200L, s"dv plane must be O(deleted rows): $dvBytes B")
    val t8 = System.nanoTime()
    val n2 = spark.sql("SELECT count(*) FROM graft.snap.big")
      .collect().head.getLong(0)
    val dvReadWall = nowS(t8)
    require(n2 == epochs - dvKeys.size, s"post-dv count $n2")
    println(f"LAKE dv delete(10 rows of $epochs files)=$dvWall%.2fs " +
      f"dvBytes=$dvBytes fullCountWithDvs=$dvReadWall%.2fs")

    // ——— MERGE-ON-READ UPSERT at table age (round 16): a 10-row MERGE
    // (5 updates + 5 inserts) across the 1,005-file table must cost
    // O(changed rows) — ONE position-delta epoch, five 1-position dvs,
    // a handful of appended rows, ZERO data files moved — the CDC
    // trickle-upsert economics the SupportsDelta plan exists for
    val updKeys = (0 until 5).map(i => epochs / 3 + i * 11)
    val insKeys = (0 until 5).map(i => 9000000 + i)
    locally { import spark.implicits._
      (updKeys.map(k => (k.toLong, "upserted")) ++
        insKeys.map(k => (k.toLong, "inserted")))
        .toDF("k", "name").createOrReplaceTempView("ladder_upsert_src") }
    val preMerge = ManifestSink.committedFiles(log).toSet
    val preMergeVersion = ManifestSink.newestVersion(log)
    val preMergeDvs = dvMap.values.flatten.size
    val t9 = System.nanoTime()
    spark.sql("""MERGE INTO graft.snap.big t USING ladder_upsert_src s
                |ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val upsertWall = nowS(t9)
    val postMerge = ManifestSink.committedFiles(log).toSet
    require(preMerge.subsetOf(postMerge),
      "merge-on-read upsert moved original data files")
    require(ManifestSink.newestVersion(log) == preMergeVersion + 1,
      "the upsert must land as ONE atomic epoch")
    val dvMap2 = ManifestSink.deleteVectors(log)
    val newDvs = dvMap2.values.flatten.size - preMergeDvs
    require(newDvs == updKeys.size &&
      dvMap2.values.flatten.map(_._2).sum == (dvKeys.size + updKeys.size).toLong,
      s"five new 1-position dvs expected: $dvMap2")
    val upsertDvBytes = dvMap2.values.flatten
      .map(e => Files.size(dataDir.resolve(e._1))).sum
    require(upsertDvBytes < 300L,
      s"dv plane must stay O(changed rows): $upsertDvBytes B")
    val t10 = System.nanoTime()
    val n3 = spark.sql("SELECT count(*) FROM graft.snap.big")
      .collect().head.getLong(0)
    val upsertReadWall = nowS(t10)
    require(n3 == epochs - dvKeys.size + insKeys.size, s"post-upsert count $n3")
    val upd = spark.sql(s"SELECT name FROM graft.snap.big WHERE k IN " +
      s"(${updKeys.mkString(",")})").collect().map(_.getString(0))
    require(upd.length == updKeys.size && upd.forall(_ == "upserted"),
      s"updated rows must serve the new value: ${upd.toSeq}")
    println(f"LAKE dv upsert(10 rows of $epochs files)=$upsertWall%.2fs " +
      f"newDvBytes=${upsertDvBytes - dvBytes} filesMoved=0 " +
      f"fullCountAfter=$upsertReadWall%.2fs")

    // ——— VACUUM over a big orphan set next to the committed files —
    // 50,000 orphans (judge r12 #6): the listing is a STREAMED
    // single-pass directory walk (never materialized), so driver memory
    // stays O(committed snapshot); the measured wall below is the
    // documented driver cost bound at this rung
    val orphanN = 50000
    (0 until orphanN).foreach { i =>
      val p = dataDir.resolve(f"orphan-$i%05d.csv")
      Files.write(p, "9,z\n".getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(0))
    }
    val t6 = System.nanoTime()
    val reclaimed = ManifestSink.vacuum(log, 60000)
    val vacWall = nowS(t6)
    require(reclaimed.size == orphanN, s"vacuum reclaimed ${reclaimed.size}")
    require(ManifestSink.committedFiles(log).size == postMerge.size &&
      Files.exists(dataDir.resolve(f"f${epochs / 2}%06d.parquet")),
      "vacuum touched committed data")
    require(dvMap2.values.flatten.forall(e =>
      Files.exists(dataDir.resolve(e._1))),
      "vacuum reclaimed a LIVE position-delete file")
    println(f"LAKE vacuum orphans=$orphanN committedKept=${postMerge.size} " +
      f"wall=$vacWall%.2fs " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // ——— DISTRIBUTED PLANNING at 10,000 files (round 16): a table
    // whose checkpoint crosses the threshold plans through a Spark job
    // over the parquet checkpoint — the driver never walks the 10k
    // per-file stats. Both planners must agree exactly (files planned
    // AND values); the wall of each is printed for the ledger.
    val wideLog = root.resolve("wide").toString
    val wideN = 10000
    val perCommit = 1000
    val wideBatch = ManifestBatchWrite(wideLog, schema)
    val tw = System.nanoTime()
    (0 until wideN / perCommit).foreach { c =>
      val msgs = (0 until perCommit).map { j =>
        val i = c * perCommit + j
        val w = graft.sources.ManifestWriters.create(wideLog,
          Array("k", "name"), Array("long", "string"), f"w$i%06d.parquet")
        w.write(org.apache.spark.sql.catalyst.InternalRow(i.toLong,
          org.apache.spark.unsafe.types.UTF8String.fromString(s"n$i")))
        w.commit()
      }
      wideBatch.commit(msgs.toArray)
    }
    val wideBuild = nowS(tw)
    require(ManifestSink.planningCheckpoint(Paths.get(wideLog))
      .exists(_._3 == wideN.toLong),
      "the 10k-file table must carry a full planning checkpoint")
    spark.conf.set("spark.sql.catalog.graft.snap.wide.schema",
      "k LONG, name STRING")
    def widePoint(): (Long, (Int, Int), Double) = {
      val t = System.nanoTime()
      val v = spark.sql(s"SELECT k FROM graft.snap.wide WHERE k = ${wideN / 2}")
        .collect().head.getLong(0)
      (v, graft.sources.SnapTable.lastPruneOf("wide"), nowS(t))
    }
    val (vE, pruneE, wallE) = widePoint() // driver walk (default threshold)
    spark.conf.set("spark.graft.plan.distributedThreshold", "1")
    val (vD, pruneD, wallD) =
      try widePoint()
      finally spark.conf.unset("spark.graft.plan.distributedThreshold")
    require(vE == wideN / 2 && vD == vE, s"point values: $vE vs $vD")
    require(pruneE == ((wideN, 1)) && pruneD == pruneE,
      s"both planners must plan 1 of $wideN: eager=$pruneE dist=$pruneD")
    println(f"LAKE distributed planning files=$wideN build=$wideBuild%.1fs " +
      f"pointRead driverWalk=$wallE%.2fs checkpointJob=$wallD%.2fs " +
      "plannedFiles=1/10000 both")

    // ——— SPEC EVOLUTION at 10,000 files (round 16): evolving the wide
    // table's layout is ONE tiny metadata epoch, zero files moved; the
    // next append stamps the new spec's id, and BOTH planners keep
    // planning 1 file for point reads over the mixed-era table
    val preEvo = ManifestSink.committedFiles(wideLog).toSet
    val preEvoBytes = ManifestSink.metadataBytes.get()
    val tEvo = System.nanoTime()
    val evoRow = spark.sql(
      "CALL graft.sys.set_partition_spec('wide', 'k')").collect().head
    val evoWall = nowS(tEvo)
    val evoBytes = ManifestSink.metadataBytes.get() - preEvoBytes
    require(evoRow.getLong(0) == 1L &&
      ManifestSink.committedFiles(wideLog).toSet == preEvo,
      "spec evolution must move zero data files")
    // one #spec record + the r17 #ts commit-time header
    require(evoBytes <= 64L, s"spec evolution wrote $evoBytes B of metadata")
    spark.sql(s"INSERT INTO graft.snap.wide VALUES ($wideN, 'n$wideN')")
    require(ManifestSink.filePartitions(wideLog).values
      .exists(_.specId == 1), "the post-evolution file must stamp spec id 1")
    val (vE2, pruneE2, _) = widePoint() // an era-0 file: #stats prune
    spark.conf.set("spark.graft.plan.distributedThreshold", "1")
    val (vD2, pruneD2, _) =
      try widePoint()
      finally spark.conf.unset("spark.graft.plan.distributedThreshold")
    require(vE2 == wideN / 2 && vD2 == vE2 &&
      pruneE2 == ((wideN + 1, 1)) && pruneD2 == pruneE2,
      s"mixed-era point read plans 1: eager=$pruneE2 dist=$pruneD2")
    // the era-1 file prunes by its identity TUPLE (exact, both planners)
    spark.sql(s"SELECT k FROM graft.snap.wide WHERE k = $wideN").collect()
    require(graft.sources.SnapTable.lastPruneOf("wide") == ((wideN + 1, 1)),
      s"era-1 point read: ${graft.sources.SnapTable.lastPruneOf("wide")}")
    println(f"LAKE spec evolution files=$wideN epochBytes=$evoBytes " +
      f"wall=$evoWall%.2fs filesMoved=0 mixedEraPointRead=1/${wideN + 1} both")

    // ——— BLOOM SKIPPING at 400 interleaved files (round 18): every
    // file i holds {i, 2N-i}, so file envelopes NEST — a point read on
    // k=37 admits 38 files by min/max alone but exactly ONE by its
    // `#bloom` record. The twin table without filters pins the
    // min/max-only baseline; the record-size bound and both-planners
    // parity are asserted.
    val blN = 400
    val blBits = 16384
    def buildInterleaved(name: String, bloomed: Boolean): String = {
      val blog = root.resolve(name).toString
      val bw = ManifestBatchWrite(blog, schema)
      (0 until blN).foreach { i =>
        val w = graft.sources.ManifestWriters.create(blog,
          Array("k", "name"), Array("long", "string"), f"b$i%06d.parquet",
          if (bloomed) Seq("k") else Seq.empty, blBits)
        w.write(org.apache.spark.sql.catalyst.InternalRow(i.toLong,
          org.apache.spark.unsafe.types.UTF8String.fromString(s"n$i")))
        w.write(org.apache.spark.sql.catalyst.InternalRow((2L * blN - i),
          org.apache.spark.unsafe.types.UTF8String.fromString(s"m$i")))
        bw.commit(Array(w.commit()))
      }
      spark.conf.set(s"spark.sql.catalog.graft.snap.$name.schema",
        "k LONG, name STRING")
      blog
    }
    val tBl = System.nanoTime()
    val blLog = buildInterleaved("blwide", bloomed = true)
    buildInterleaved("blctl", bloomed = false)
    val blBuild = nowS(tBl)
    def blPoint(t: String): ((Int, Int), Double) = {
      val w = System.nanoTime()
      val v = spark.sql(s"SELECT k FROM graft.snap.$t WHERE k = 37")
        .collect().map(_.getLong(0)).toSeq
      require(v == Seq(37L), s"zero false negatives on $t: $v")
      (graft.sources.SnapTable.lastPruneOf(t), nowS(w))
    }
    val (blPrune, blWall) = blPoint("blwide")
    val (ctlPrune, ctlWall) = blPoint("blctl")
    require(blPrune == ((blN, 1)),
      s"bloom plans exactly the holding file: $blPrune")
    require(ctlPrune == ((blN, 38)),
      s"min/max-only baseline (nested envelopes): $ctlPrune")
    // both planners agree through the checkpoint's bloom column
    spark.conf.set("spark.graft.plan.distributedThreshold", "1")
    val (blPruneD, blWallD) =
      try blPoint("blwide")
      finally spark.conf.unset("spark.graft.plan.distributedThreshold")
    require(blPruneD == blPrune,
      s"checkpoint planner parity: eager=$blPrune dist=$blPruneD")
    // record-size bound: 16384 bits = 2 KiB payload -> < 3.5 KB b64 line
    val blLines = {
      val s0 = Files.list(Paths.get(blLog))
      try s0.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("epoch-") ||
          p.getFileName.toString.startsWith("compact-"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .filter(_.startsWith("#bloom ")).toSeq
      finally s0.close()
    }
    require(blLines.size == blN && blLines.forall(_.length < 3500),
      s"bloom record bound: n=${blLines.size} " +
        s"maxLen=${if (blLines.isEmpty) 0 else blLines.map(_.length).max}")
    println(f"LAKE bloom skipping files=$blN build=$blBuild%.1fs " +
      f"pointRead bloom=1/$blN ($blWall%.2fs eager, $blWallD%.2fs ckpt) " +
      f"minmaxOnly=38/$blN ($ctlWall%.2fs) " +
      s"maxRecordBytes=${blLines.map(_.length).max}")

    // ——— BLOOM RESIDENCY CAP (round 19): driver-resident payload
    // bytes must stay FLAT as the bloomed-file count grows past the
    // cap — here 400 files' payloads (~1.1 MB) against a cap sized
    // for ~40, a 10× overrun. The newest files stay resident (still
    // bloom-prune to exactly 1); evicted older files fall back to the
    // min/max envelope (38 planned, the ctl baseline) with values
    // still exact — eviction costs pruning, never correctness.
    val uncappedResident = ManifestSink.residentBloomBytes(blLog)
    val blCap = 100000L // ~36 of the ~2.8 KB b64 payloads
    require(uncappedResident > 10L * blCap,
      s"rung needs a 10× overrun: uncapped=$uncappedResident cap=$blCap")
    spark.sql("ALTER TABLE graft.snap.blwide " +
      s"SET TBLPROPERTIES ('bloom.resident.bytes'='$blCap')")
    val cappedResident = ManifestSink.residentBloomBytes(blLog)
    require(cappedResident <= blCap && cappedResident > 0L,
      s"resident bloom bytes under cap: $cappedResident <= $blCap")
    // the NEWEST ~36 files' payloads fit under the cap
    val nResident = ManifestSink.fileStats(blLog)
      .count(_._2.blooms.nonEmpty)
    require(nResident > 20 && nResident < 60,
      s"cap keeps a newest-suffix of ~36 filters: $nResident")
    // k=401 admits ALL 400 envelopes by min/max; only RESIDENT blooms
    // can prune, and the holder (newest file b000399, {399, 401}) is
    // resident — so exactly the other resident filters prune
    val v401 = spark.sql("SELECT k FROM graft.snap.blwide WHERE k = 401")
      .collect().map(_.getLong(0)).toSeq
    require(v401 == Seq(401L), s"capped newest-file point read: $v401")
    require(graft.sources.SnapTable.lastPruneOf("blwide") ==
      ((blN, blN - nResident + 1)),
      s"resident blooms prune, evicted ones cannot (resident=" +
        s"$nResident): ${graft.sources.SnapTable.lastPruneOf("blwide")}")
    // old file (b000037) evicted: k=37 falls back to the 38-file
    // min/max envelope, values exact
    val v37 = spark.sql("SELECT k FROM graft.snap.blwide WHERE k = 37")
      .collect().map(_.getLong(0)).toSeq
    require(v37 == Seq(37L), s"capped evicted-file point read: $v37")
    require(graft.sources.SnapTable.lastPruneOf("blwide") == ((blN, 38)),
      "evicted file falls back to min/max: " +
        s"${graft.sources.SnapTable.lastPruneOf("blwide")}")
    println(f"LAKE bloom residency files=$blN uncapped=$uncappedResident " +
      s"cap=$blCap resident=$cappedResident residentFilters=$nResident " +
      s"newestPrune=${blN - nResident + 1}/$blN evictedPrune=38/$blN")
    spark.stop()
    graft.util.Fs.deleteRecursively(root)
    println("LAKE-LADDER ALL GREEN")
  }
}
