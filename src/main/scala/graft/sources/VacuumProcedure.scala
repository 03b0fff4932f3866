package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** VACUUM as a catalog STORED PROCEDURE — the retention story operable
  * from pure SQL (round 12; it was library-only before):
  *
  * {{{ CALL graft.sys.vacuum('ev', 86400000) }}}
  *
  * resolves through Spark's `ProcedureCatalog` face on
  * [[GraftCatalog]], runs [[ManifestSink.vacuum]] on the
  * `<snap.dir>/<table>` manifest log, and returns the reclaimed file
  * names as a one-column result set (a [[LocalScan]] — the names are
  * driver-side metadata, never a distributed read). The semantics are
  * the library call's, unchanged: only files NO committed manifest
  * fragment references AND older than `older_than_ms` are deleted —
  * age-gating keeps a mid-commit epoch's task files safe, and committed
  * files are never candidates regardless of age (SnapshotSpec pins both
  * invariants through this SQL path). This is the Delta `VACUUM`
  * shape: storage reclamation is an operator-invoked, retention-gated
  * command, not a side effect of reads or writes. */
class VacuumProcedure(snapDir: () => String) extends UnboundProcedure {
  override def name(): String = "vacuum"
  override def description(): String =
    "reclaim data files unreferenced by any committed epoch manifest " +
      "and older than older_than_ms from a graft.snap manifest table; " +
      "returns the deleted file names"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = VacuumProcedure.this.name()
    override def description(): String = VacuumProcedure.this.description()
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under the snap.dir catalog conf").build(),
      ProcedureParameter.in("older_than_ms", LongType)
        .comment("minimum age of an unreferenced file before reclaim").build())
    override def isDeterministic: Boolean = false // deletes files

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(!input.isNullAt(0) && !input.isNullAt(1),
        "vacuum(table, older_than_ms): arguments must not be null")
      val table = input.getUTF8String(0).toString
      val dir = new java.io.File(snapDir(), table)
      require(dir.isDirectory, s"graft.snap.$table: no manifest table at $dir")
      val deleted = ManifestSink.vacuum(dir.toString, input.getLong(1))
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType =
          new StructType().add("deleted", StringType, nullable = false)
        override def rows(): Array[InternalRow] =
          deleted.map(n => InternalRow(UTF8String.fromString(n))).toArray
      }
      java.util.List.of(scan).iterator()
    }
  }
}
