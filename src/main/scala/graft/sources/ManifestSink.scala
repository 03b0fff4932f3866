package graft.sources

import java.io.{BufferedWriter, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 SINK with a manifest-based two-phase commit — the
  * atomic-visibility primitive every lake table format is built on,
  * spelled out as connector code:
  *
  *  1. each task's [[DataWriter]] writes its partition to a uniquely
  *     named data file and returns the name in its [[WriterCommitMessage]]
  *     (nothing is visible yet — a file on disk is NOT data);
  *  2. the driver's [[BatchWrite.commit]] collects every task's message
  *     and publishes the file list as ONE epoch manifest, written to a
  *     temp name and ATOMIC_MOVE'd into place — the single metadata
  *     operation that flips the whole multi-file write visible at once.
  *     Batch and streaming commits share the SAME append-only epoch log
  *     (round 11): each batch append claims the next epoch id with
  *     optimistic concurrency, so `mode("append")` really appends (the
  *     pre-r11 replace-the-manifest behavior silently dropped earlier
  *     appends from the listing) and batch-written tables get time
  *     travel / incremental reads for free; readers of a stale MANIFEST
  *     keep a consistent (merely older) snapshot;
  *  3. [[BatchWrite.abort]] deletes the orphaned task files — a failed
  *     job leaves no visible trace because visibility IS the manifest.
  *
  * Readers list the manifest (bounded metadata) and load exactly those
  * files; uncommitted/orphaned part files in the same directory are
  * invisible by construction. Task files are named by the
  * application-unique taskId, so a speculative/retried attempt writes a
  * DIFFERENT file and the commit coordinator decides which one the
  * manifest publishes — the loser is aborted and deleted. The path must
  * be storage shared by driver and executors (local-fs under local[*];
  * an object-store/NFS path on a cluster), the same assumption every
  * file-based sink makes. The row format is deliberately plain CSV
  * of longs/strings — the COMMIT PROTOCOL is the deliverable, the same
  * way `upsertMerge`'s bucket overwrite and the parquet sink's
  * `_spark_metadata` log carry the exactly-once story elsewhere in the
  * engine. IngestSpec drives write→read round trips, manifest-miss
  * invisibility, and abort cleanup. */
class ManifestSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft manifest sink is write-only; read the manifest-listed files")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "manifest sink needs a path option")
    val interval = Option(opts.get("compactInterval"))
      .map(_.toInt).getOrElse(ManifestSink.DefaultCompactInterval)
    require(interval >= 2, s"compactInterval must be >= 2, got $interval")
    ManifestTable(path, schema, interval)
  }
}

object ManifestSink {
  val ManifestName = "MANIFEST"

  /** Compact once this many LOOSE epoch manifests accumulate (table
    * option `compactInterval`). Keeps `republish` at O(epochs/N)
    * metadata reads instead of O(epochs) — the `_spark_metadata`
    * compaction pattern of the built-in file sink. */
  val DefaultCompactInterval = 10

  /** Zero-padded so lexicographic directory order IS epoch order. */
  private[sources] def epochName(epochId: Long): String = f"epoch-$epochId%020d"

  /** A compacted manifest carrying the union of every epoch manifest
    * with id <= epochId; its id ordering is name ordering, same as
    * epochs. */
  private[sources] def compactName(epochId: Long): String = f"compact-$epochId%020d"

  private def idOf(p: Path): Long =
    p.getFileName.toString.dropWhile(!_.isDigit).toLong

  /** The committed file list (absolute paths), i.e. the current visible
    * snapshot — empty if no commit ever published. */
  def committedFiles(path: String): Seq[String] = {
    val m = Paths.get(path, ManifestName)
    if (!Files.exists(m)) Seq.empty
    else Files.readAllLines(m, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(f => Paths.get(path, "data", f).toString)
  }

  private def listPrefixed(dir: Path, prefix: String): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith(prefix))
      .sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Newest compacted manifest and the max epoch id it covers. */
  private[sources] def latestCompact(dir: Path): Option[(Long, Path)] =
    listPrefixed(dir, "compact-").lastOption.map(p => (idOf(p), p))

  /** Loose (not-yet-compacted) epoch manifests NEWER than the compaction
    * horizon, in epoch order. Stale loose files at or below the horizon
    * (a crash mid-compaction) are subsets of the compact file and are
    * ignored here, then swept by the next compaction. */
  private[sources] def looseEpochs(dir: Path, compactedThrough: Long): Seq[(Long, Path)] =
    listPrefixed(dir, "epoch-").map(p => (idOf(p), p))
      .filter(_._1 > compactedThrough)

  /** The manifest FRAGMENTS whose union is the committed snapshot: the
    * newest compact file (if any) plus the loose epochs after it —
    * O(epochs/compactInterval) files, not O(epochs). */
  private[sources] def manifestFragments(dir: Path): Seq[Path] = {
    val compact = latestCompact(dir)
    val horizon = compact.map(_._1).getOrElse(-1L)
    compact.map(_._2).toSeq ++ looseEpochs(dir, horizon).map(_._2)
  }

  /** Bounded retry for metadata reads racing a concurrent compaction
    * sweep (round 11, concurrent batch committers): a listed fragment
    * vanishing mid-read means a compaction just absorbed it — the
    * committed union only grows, so re-deriving from a fresh listing is
    * always a consistent (newer) snapshot. */
  private def retryVanish[T](attempts: Int = 8)(f: => T): T =
    try f catch {
      case _: java.nio.file.NoSuchFileException if attempts > 1 =>
        retryVanish(attempts - 1)(f)
    }

  /** Union of the fragment contents. `distinct` guards the one crash
    * window where a loose epoch survives alongside the compact file
    * that already absorbed it. */
  private[sources] def fragmentUnion(dir: Path): Seq[String] = retryVanish() {
    manifestFragments(dir)
      .flatMap(f => Files.readAllLines(f, StandardCharsets.UTF_8).asScala)
      .filter(_.nonEmpty).distinct
  }

  /** TIME TRAVEL: the table's committed file list AS OF epoch
    * `version` — the union of epoch manifests with id <= version. The
    * epoch manifests ARE the snapshot log (each one is an atomic
    * commit), so every historical snapshot is reconstructible for free
    * as long as its epochs survive: a compact file serves any version
    * >= its horizon exactly (it is the union through the horizon, plus
    * the loose epochs up to the version); versions BELOW the horizon
    * need the swept loose epochs and are REFUSED with the retention
    * boundary spelled out — the Delta/Iceberg contract that log
    * retention bounds time travel, surfaced instead of silently
    * serving a wrong snapshot. A version beyond the newest commit is
    * refused too (it names a snapshot that never existed). */
  def committedFilesAsOf(path: String, version: Long): Seq[String] = retryVanish() {
    require(version >= 0, s"version must be >= 0, got $version")
    val dir = Paths.get(path)
    val loose = listPrefixed(dir, "epoch-").map(p => (idOf(p), p))
    val compact = latestCompact(dir)
    val horizon = compact.map(_._1).getOrElse(-1L)
    val newest = (horizon +: loose.map(_._1)).max
    if (newest < 0 || version > newest)
      throw new IllegalArgumentException(
        s"manifest table $path has no version $version " +
          s"(newest committed epoch: ${if (newest < 0) "none" else newest})")
    def read(p: Path): Seq[String] =
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq.filter(_.nonEmpty)
    val names =
      if (version >= horizon)
        (compact.map(_._2).toSeq ++
          loose.filter(e => e._1 > horizon && e._1 <= version).map(_._2))
          .flatMap(read).distinct
      else {
        // below the horizon, ONLY the pre-sweep crash window can serve:
        // the sweep deletes absorbed epoch manifests AFTER the compact
        // move, so if the loose epochs at-or-below the horizon still
        // union to EXACTLY the compact's content, the loose log is
        // provably complete (every task file is listed by exactly one
        // epoch manifest, so a missing non-empty epoch shrinks the
        // union) and any prefix of it is an exact snapshot — including
        // tables whose first epoch is > 0 (a checkpointed query
        // restarted into a fresh dir; advisor r10). Each fragment is
        // read ONCE (the old 0..version∀-over-a-rebuilt-Set was O(n²)
        // and hard-required epoch 0). Once the sweep lands, the union
        // shrinks below the compact set and the version is refused:
        // log retention bounds time travel (the Delta/Iceberg
        // contract), surfaced instead of silently serving a wrong
        // snapshot.
        val compactContent = compact.map(_._2).toSeq.flatMap(read).toSet
        val looseBelow = loose.filter(_._1 <= horizon)
        if (looseBelow.flatMap(e => read(e._2)).toSet == compactContent)
          loose.filter(_._1 <= version).sortBy(_._1)
            .flatMap(e => read(e._2)).distinct
        else throw new IllegalStateException(
          s"version $version predates the compaction horizon $horizon " +
            "and its epoch manifests were swept — retained time travel " +
            s"starts at epoch $horizon")
      }
    names.map(f => Paths.get(path, "data", f).toString)
  }

  /** Re-derive the top-level MANIFEST as the union of committed
    * manifest fragments — the same file batch readers use. REPLACE is
    * safe because the committed set is append-only: the union only
    * grows, so old-manifest readers keep a consistent (merely stale)
    * snapshot. O(epochs/compactInterval) small metadata reads per
    * commit thanks to [[maybeCompact]]. */
  private[sources] def republish(dir: Path): Unit = {
    val all = fragmentUnion(dir)
    // a UNIQUE temp name per call: concurrent committers republishing
    // under one shared `.MANIFEST.tmp` raced each other's move (the
    // round-11 concurrent-append test caught the loser's
    // NoSuchFileException); with per-call temps both moves land and
    // last-writer-wins is fine — the union only grows, so either
    // result is a consistent snapshot and the next commit re-derives
    val mtmp = Files.createTempFile(dir, s".$ManifestName", ".tmp")
    Files.write(mtmp, all.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(mtmp, dir.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Fold the loose epoch manifests into ONE compact file once
    * `compactInterval` of them accumulate — the `_spark_metadata`
    * compaction pattern. Durability order makes every crash window
    * benign: (1) the compact file lands by atomic move FIRST, so the
    * union is never less than the committed set; (2) only then are the
    * absorbed fragments deleted — a crash in between leaves duplicates
    * that [[ManifestSink.fragmentUnion]] de-dupes and the NEXT
    * compaction sweeps (any epoch at-or-below / compact below the new
    * horizon). */
  private[sources] def maybeCompact(dir: Path, priorHorizon: Long,
      compactInterval: Int): Unit = retryVanish() {
    // retryVanish: a concurrent committer's sweep can delete a listed
    // fragment mid-read here; re-running from a fresh listing is always
    // consistent (and usually a no-op — the racer compacted for us)
    val loose = looseEpochs(dir, priorHorizon)
    if (loose.size < compactInterval) return
    val prior = latestCompact(dir)
    val names = (prior.map(_._2).toSeq ++ loose.map(_._2))
      .flatMap(f => Files.readAllLines(f, StandardCharsets.UTF_8).asScala)
      .filter(_.nonEmpty).distinct
    val upTo = loose.map(_._1).max
    // unique temp per attempt (concurrent committers can both trigger
    // this compaction); the compact-<upTo> content is deterministic —
    // the union through upTo — so when a racer already landed it, the
    // loser's work is simply done
    val ctmp = Files.createTempFile(dir, s".${compactName(upTo)}", ".tmp")
    Files.write(ctmp, names.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(dir.resolve(compactName(upTo)), ctmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => }
    finally Files.deleteIfExists(ctmp)
    // superseded fragments: every loose epoch now covered, every older
    // compact, and any stale leftovers from a previously-crashed sweep
    looseEpochs(dir, -1L).filter(_._1 <= upTo)
      .foreach(p => Files.deleteIfExists(p._2))
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("compact-"))
      .sortBy(_.getFileName.toString).dropRight(1)
      .foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  /** The next unclaimed epoch id (one past the newest committed). */
  private[sources] def nextEpochId(dir: Path): Long =
    (latestCompact(dir).map(_._1).getOrElse(-1L) +:
      listPrefixed(dir, "epoch-").map(idOf)).max + 1

  /** STORAGE RECLAMATION (the VACUUM contract): delete data files NOT
    * referenced by any committed manifest fragment AND older than
    * `olderThanMs`. Age-gating is what makes this safe next to live
    * writers — an unlisted file younger than the cutoff may belong to
    * an epoch still committing (task files land before the manifest
    * flips them visible), while crash orphans (a driver that died
    * before abort(), a replaced speculative attempt) only ever age.
    * Committed files are NEVER candidates regardless of age, and since
    * time travel serves only epochs the log retains, nothing a
    * servable version references is reclaimed. Returns the deleted
    * names. */
  def vacuum(path: String, olderThanMs: Long): Seq[String] = {
    require(olderThanMs >= 0, s"olderThanMs must be >= 0, got $olderThanMs")
    val dir = Paths.get(path)
    val dataDir = dir.resolve("data")
    if (!Files.isDirectory(dataDir)) return Seq.empty
    val keep = fragmentUnion(dir).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val victims = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.toSeq
        .filter(p => !keep.contains(p.getFileName.toString) &&
          Files.getLastModifiedTime(p).toMillis <= cutoff)
      finally s.close()
    }
    victims.foreach(Files.deleteIfExists(_))
    victims.map(_.getFileName.toString).sorted
  }

  /** Newest committed epoch id — the current snapshot's version. */
  def newestVersion(path: String): Long = {
    val dir = Paths.get(path)
    val newest = (latestCompact(dir).map(_._1).getOrElse(-1L) +:
      listPrefixed(dir, "epoch-").map(idOf)).max
    if (newest < 0) throw new IllegalArgumentException(
      s"manifest table $path has no committed epochs")
    newest
  }

  /** INCREMENTAL READ (the lake-CDC primitive — Delta CDF / Iceberg
    * incremental-scan analog, the "process only what landed since
    * yesterday's run" story a training pipeline lives on): the files
    * appended by epochs in (`since`, `asOf`] — each epoch manifest IS
    * that epoch's append delta, so the window is their concatenation.
    * `since` = -1 reads from the beginning (≡ snapshot `asOf`).
    * Unlike a snapshot, a swept epoch's DELTA is unrecoverable from
    * the compact union (which collapses epoch boundaries), so every
    * epoch in the window must still be loose — a window reaching past
    * the sweep is REFUSED naming the missing epochs (log retention
    * bounds incremental reads exactly as it bounds time travel;
    * consumers that fall too far behind re-read the full snapshot). */
  def committedFilesBetween(path: String, since: Long, asOf: Long): Seq[String] = retryVanish() {
    require(since >= -1, s"since must be >= -1 (exclusive lower bound), got $since")
    require(since <= asOf, s"empty window: since $since > asOf $asOf")
    val dir = Paths.get(path)
    val loose = listPrefixed(dir, "epoch-").map(p => (idOf(p), p))
    val horizon = latestCompact(dir).map(_._1).getOrElse(-1L)
    val newest = (horizon +: loose.map(_._1)).max
    if (newest < 0 || asOf > newest)
      throw new IllegalArgumentException(
        s"manifest table $path has no version $asOf " +
          s"(newest committed epoch: ${if (newest < 0) "none" else newest})")
    val window = loose.filter(e => e._1 > since && e._1 <= asOf).sortBy(_._1)
    // an absent epoch id is fine only if it NEVER EXISTED: above the
    // horizon (id <= horizon means it committed and was absorbed) and
    // below the first loose epoch (ids start wherever a restarted
    // query's first batch lands — advisor r10 — and commit contiguously
    // from there, so an absent id at-or-after firstLoose is a swept gap)
    val firstLoose = loose.map(_._1).minOption.getOrElse(Long.MaxValue)
    val missing = ((since + 1) to asOf)
      .filterNot(window.map(_._1).toSet)
      .filterNot(id => id > horizon && id < firstLoose)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"incremental read ($since, $asOf] needs epoch manifests " +
          s"${missing.mkString(", ")} which are gone " +
          s"(compaction horizon $horizon) — per-epoch deltas are " +
          "unrecoverable from the compact union; re-read the full " +
          "snapshot instead")
    window
      .flatMap(e => Files.readAllLines(e._2, StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty))
      .distinct
      .map(f => Paths.get(path, "data", f).toString)
  }
}

case class ManifestTable(path: String, writeSchema: StructType,
    compactInterval: Int = ManifestSink.DefaultCompactInterval)
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava

  /** TABLE-AS-A-STREAM (round 11): `spark.readStream` on the SAME
    * format/path TAILS the epoch log — offsets are epoch ids, each
    * micro-batch is [[ManifestSink.committedFilesBetween]] of its
    * offset window, so replay-from-checkpoint is exactly the committed
    * append deltas (the Delta "streaming from a table" shape: batch
    * writers, streaming writers and streaming readers all share one
    * log). `maxEpochsPerTrigger` rate-limits admission; a tailing
    * consumer that falls behind a compaction sweep gets the same loud
    * window refusal as any incremental reader. */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    val maxEpochs = options.getInt("maxEpochsPerTrigger", Int.MaxValue)
    require(maxEpochs >= 1, s"maxEpochsPerTrigger must be >= 1, got $maxEpochs")
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = writeSchema
          override def toMicroBatchStream(checkpointLocation: String)
              : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
            new ManifestMicroBatchStream(path,
              writeSchema.fields.map(_.dataType.typeName), maxEpochs)
        }
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = ManifestBatchWrite(path, info.schema(), compactInterval)
        // one StreamingWrite per query RUN, so the token is run-unique:
        // a post-restart replay writes under a different token and can
        // never collide with (and thus never truncate or delete) a file
        // the original run committed — taskId alone does NOT guarantee
        // that, because taskIds restart from 0 in a new SparkContext
        override def toStreaming: StreamingWrite =
          ManifestStreamingWrite(path, info.schema(), compactInterval,
            java.util.UUID.randomUUID.toString.take(8))
      }
    }
}

/** One task's contribution: the data file it wrote (name only — the
  * driver owns the directory) and its row count. */
case class CommittedFile(name: String, rows: Long) extends WriterCommitMessage

case class ManifestBatchWrite(path: String, schema: StructType,
    compactInterval: Int = ManifestSink.DefaultCompactInterval) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(path, schema.fields.map(_.dataType.typeName))

  /** Batch appends are VERSIONED commits on the same epoch log the
    * streaming face writes (round 11) — before this, each batch commit
    * REPLACED the top-level MANIFEST with only its own files, which (a)
    * silently dropped every earlier append from the listing despite
    * `mode("append")` semantics and (b) left batch-written tables
    * outside time travel / incremental reads. Now a batch commit CLAIMS
    * the next epoch id with `Files.createLink` — link(2) is
    * atomic-EXCLUSIVE (fails on an existing target, no TOCTOU window,
    * unlike a rename's check-then-move) and the link carries the fully
    * written content, so the claim and the publish are one operation.
    * A committer losing the race retries against the refreshed newest —
    * the filesystem analog of a conditional put (an object-store
    * committer would use if-none-match). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Files.createDirectories(Paths.get(path))
    val names = messages.collect { case CommittedFile(n, _) => n }.sorted
    val tmp = Files.createTempFile(dir, ".batch-epoch", ".tmp")
    Files.write(tmp, names.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try {
      var claimed = -1L
      while (claimed < 0) {
        val next = ManifestSink.nextEpochId(dir)
        try {
          Files.createLink(dir.resolve(ManifestSink.epochName(next)), tmp)
          claimed = next
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => // lost; retry
        }
      }
    } finally Files.deleteIfExists(tmp)
    ManifestSink.republish(dir)
    ManifestSink.maybeCompact(dir,
      ManifestSink.latestCompact(dir).map(_._1).getOrElse(-1L), compactInterval)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CommittedFile(n, _) =>
        Files.deleteIfExists(Paths.get(path, "data", n))
      case _ =>
    }
}

/** The STREAMING face of the same manifest contract: each micro-batch
  * (epoch) commits by publishing its task-file list as ONE epoch
  * manifest via atomic move, then re-deriving the top-level MANIFEST as
  * the union of all committed epochs — so batch readers
  * ([[ManifestSink.committedFiles]]) see streaming commits through the
  * identical snapshot mechanism. The engine's delivery to the sink is
  * at-least-once (a crash between the sink commit and the engine's own
  * commit log replays the epoch on restart), so EXACTLY-ONCE table
  * content is the sink's job: an epoch whose manifest already exists is
  * a replay — the first commit won, and the replay attempt's files are
  * deleted so it leaves no trace. StreamingSpec restarts a checkpointed
  * query with the engine commit marker removed and pins that the
  * replayed epoch changes nothing. */
case class ManifestStreamingWrite(path: String, schema: StructType,
    compactInterval: Int, runToken: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ManifestStreamingWriterFactory(path, schema.fields.map(_.dataType.typeName),
      runToken)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Files.createDirectories(Paths.get(path))
    val epoch = dir.resolve(ManifestSink.epochName(epochId))
    val compactedThrough =
      ManifestSink.latestCompact(dir).map(_._1).getOrElse(-1L)
    // an epoch is already committed if its manifest exists OR it was
    // folded into a compact file (epochs commit in strictly increasing
    // order, so id <= horizon means a prior run published it)
    if (Files.exists(epoch) || epochId <= compactedThrough) {
      // replayed epoch: the first commit already published this epoch's
      // files; discard the replay's output (idempotence), then still
      // re-derive MANIFEST — a crash BETWEEN the epoch move and the
      // manifest move leaves the epoch durable but unlisted, and the
      // replay is exactly the moment to self-heal that window instead
      // of waiting for the next live epoch. NEVER delete a name the
      // committed union lists: run-unique tokens make a collision
      // impossible among this sink's own files, and the guard keeps a
      // foreign file (or a future naming bug) from turning the replay
      // cleanup into committed-data loss.
      val published = ManifestSink.fragmentUnion(dir).toSet
      messages.foreach {
        case CommittedFile(n, _) if !published.contains(n) =>
          Files.deleteIfExists(Paths.get(path, "data", n))
        case _ =>
      }
      republish(dir)
      return
    }
    val names = messages.collect { case CommittedFile(n, _) => n }.sorted
    val tmp = dir.resolve(s".${ManifestSink.epochName(epochId)}.tmp")
    Files.write(tmp, names.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, epoch, StandardCopyOption.ATOMIC_MOVE)
    republish(dir)
    maybeCompact(dir, epochId, compactedThrough)
  }

  private def republish(dir: Path): Unit = ManifestSink.republish(dir)

  private def maybeCompact(dir: Path, epochId: Long, priorHorizon: Long): Unit =
    ManifestSink.maybeCompact(dir, priorHorizon, compactInterval)

  /** Abort must clean THIS attempt's orphans without ever touching
    * committed data: if commit fails after the epoch-manifest move
    * (e.g. a republish IO error), Spark calls abort with messages whose
    * files the durable epoch manifest already lists — deleting those
    * would leave the manifest pointing at nothing. */
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    val published =
      if (Files.exists(dir)) ManifestSink.fragmentUnion(dir).toSet
      else Set.empty[String]
    messages.foreach {
      case CommittedFile(n, _) if !published.contains(n) =>
        Files.deleteIfExists(Paths.get(path, "data", n))
      case _ =>
    }
  }
}

case class ManifestStreamingWriterFactory(path: String, fieldTypes: Array[String],
    runToken: String) extends StreamingDataWriterFactory {
  // the epoch is baked into the file name so replayed-epoch files are
  // recognizable on disk; taskId distinguishes attempts within a run,
  // and the run token distinguishes RUNS — a replay in a fresh JVM
  // (taskIds reset to 0) still cannot collide with committed files
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    ManifestWriters.create(path, fieldTypes,
      f"${ManifestSink.epochName(epochId)}-part-$partitionId%05d-$taskId-$runToken.csv")
}

case class ManifestWriterFactory(path: String, fieldTypes: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    // taskId is unique across the application, so re-runs into the
    // same directory never collide — superseded files become
    // manifest-invisible orphans
    ManifestWriters.create(path, fieldTypes, f"part-$partitionId%05d-$taskId.csv")
}

/** One task-file writer, shared by the batch and streaming factories —
  * the factories differ only in how they NAME the file. */
private[sources] object ManifestWriters {
  def create(path: String, fieldTypes: Array[String],
      fileName: String): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val name = fileName
      private val file: Path = {
        val d = Files.createDirectories(Paths.get(path, "data"))
        d.resolve(name)
      }
      private val out: BufferedWriter =
        Files.newBufferedWriter(file, StandardCharsets.UTF_8)
      private var rows = 0L

      override def write(row: InternalRow): Unit = {
        val line = fieldTypes.indices.map { i =>
          fieldTypes(i) match {
            case "long" => row.getLong(i).toString
            case "string" =>
              val s = row.getUTF8String(i).toString
              // the sink's CSV lines are read back unquoted; refuse a
              // value that would silently shift columns rather than
              // corrupt the round trip
              if (s.exists(c => c == ',' || c == '\n' || c == '\r' || c == '"'))
                throw new IOException(
                  s"manifest sink cannot encode delimiter/quote/newline in: $s")
              s
            case other => throw new IOException(
              s"manifest sink supports long/string columns, got $other")
          }
        }.mkString(",")
        out.write(line)
        out.newLine()
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        CommittedFile(name, rows)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(file)
      }
      override def close(): Unit = ()
    }
}

/** Stream offset = the newest epoch id INCLUDED so far (-1 before the
  * first batch), json-serialized into the streaming checkpoint. */
case class EpochOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** One committed data file of the batch's epoch window. */
case class ManifestFilePartition(file: String)
    extends org.apache.spark.sql.connector.read.InputPartition

/** The epoch log as a micro-batch SOURCE. STATELESS admission (the
  * [[graft.sources.SyntheticSource]] convention): Spark hands
  * `latestOffset(start, limit)` the last committed offset, so the next
  * batch is a pure function of the checkpoint + the log — a restart
  * resumes at the committed epoch with nothing re-read and nothing
  * skipped, because `planInputPartitions` resolves the SAME
  * (start, end] window through [[ManifestSink.committedFilesBetween]]
  * every time (epoch manifests are immutable once published). */
class ManifestMicroBatchStream(path: String, fieldTypes: Array[String],
    maxEpochs: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

  private def newest: Long =
    try ManifestSink.newestVersion(path)
    catch { case _: IllegalArgumentException => -1L } // no commits yet

  override def initialOffset(): Offset = EpochOffset(-1L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EpochOffset].id
    val capped =
      if (maxEpochs == Int.MaxValue) newest
      else math.min(newest, s + maxEpochs)
    EpochOffset(math.max(s, capped)) // never regress past the checkpoint
  }
  override def reportLatestOffset(): Offset = EpochOffset(newest)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft manifest stream is admission-controlled; " +
        "latestOffset(start, limit) is the only valid form")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EpochOffset].id
    val e = end.asInstanceOf[EpochOffset].id
    if (e <= s) Array.empty
    else ManifestSink.committedFilesBetween(path, s, e)
      .map(f => ManifestFilePartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    ManifestReadFactory(fieldTypes)
  override def deserializeOffset(json: String): Offset = EpochOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Reads back the sink's own unquoted CSV lines (the writer refuses
  * delimiter/quote/newline characters, so `split` is exact). */
case class ManifestReadFactory(fieldTypes: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ManifestFilePartition].file
    new PartitionReader[InternalRow] {
      private val in = Files.newBufferedReader(
        Paths.get(file), StandardCharsets.UTF_8)
      private var line: String = _
      override def next(): Boolean = { line = in.readLine(); line != null }
      override def get(): InternalRow = {
        val cells = line.split(",", -1)
        require(cells.length == fieldTypes.length,
          s"manifest row arity ${cells.length} != schema ${fieldTypes.length}: $line")
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          fieldTypes.indices.map[Any] { i =>
            fieldTypes(i) match {
              case "long" => cells(i).toLong
              case "string" =>
                org.apache.spark.unsafe.types.UTF8String.fromString(cells(i))
              case other => throw new IllegalArgumentException(
                s"manifest stream supports long/string columns, got $other")
            }
          }.toArray)
      }
      override def close(): Unit = in.close()
    }
  }
}
