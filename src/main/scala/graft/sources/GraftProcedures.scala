package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The maintenance verbs as SQL — Spark 4's DataSourceV2 stored
  * procedures (`CALL catalog.system.<verb>(...)`, the Iceberg-style
  * surface), so a SQL-only user can compact, expire, roll back, audit
  * and clone without touching the Scala API:
  *
  * {{{
  * CALL graft.system.optimize(tbl => 'db.t', small_bytes => 134217728)
  * CALL graft.system.optimize(tbl => 'db.t', zorder_by => 'x,y', buckets => 8)
  * CALL graft.system.vacuum(tbl => 'db.t', keep_last => 10,
  *                          min_age_ms => 604800000, dry_run => true)
  * CALL graft.system.restore(tbl => 'db.t', version => 3)
  * CALL graft.system.history(tbl => 'db.t')         -- DESCRIBE HISTORY
  * CALL graft.system.clone(tbl => 'db.t', target => 'db.t2')
  * CALL graft.system.reorg(tbl => 'db.t')   -- REORG … APPLY (PURGE)
  * }}}
  *
  * Each procedure resolves `tbl` through the owning [[GraftCatalog]]'s
  * warehouse, runs the corresponding log verb, and returns its result
  * as rows (a metadata-sized LocalScan) — `history` returns the full
  * audit trail, the rest return one summary row. All verbs are
  * metadata-sized or maintenance-sized by the log's own contracts;
  * nothing here adds driver state.
  */
object GraftProcedures {
  val Names: Seq[String] =
    Seq("optimize", "vacuum", "restore", "history", "clone", "detail",
      "reorg", "set_not_null", "set_partitioning")

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(
      name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def scanOf(
      schema: StructType, data: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(new LocalScan {
      override def rows(): Array[InternalRow] = data
      override def readSchema(): StructType = schema
    }: Scan).iterator()

  private def oneRow(
      schema: StructType, values: Any*): java.util.Iterator[Scan] =
    scanOf(schema,
      Array[InternalRow](new GenericInternalRow(values.toArray)))

  /** One bound maintenance procedure; `resolve` maps the `tbl` argument
    * (`ns.table` within the owning catalog) to its table root. */
  private abstract class Verb(
      procName: String, resolve: String => String,
      params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // mutates / reads live state
    protected def rootOf(input: InternalRow): String =
      resolve(input.getUTF8String(0).toString)
  }

  def load(name: String, resolve: String => String): UnboundProcedure =
    name match {
      case "optimize" =>
        new Verb("optimize", resolve, Seq(
          in("tbl", StringType),
          inDefault("small_bytes", LongType, "134217728"),
          inDefault("zorder_by", StringType, "NULL"),
          inDefault("buckets", IntegerType, "8"))) {
          private val schema = StructType(Seq(
            StructField("version", IntegerType),
            StructField("rewritten_batches", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val root = rootOf(input)
            // no explicit zorder_by: a table with a DECLARED write
            // sort order (graft.write.sortOrder) compacts CLUSTERED on
            // it — OPTIMIZE must not collapse the layout sorted writes
            // paid for (the Iceberg sort-order-aware rewrite); tables
            // without one keep the plain small-file pack
            val cols =
              if (!input.isNullAt(2))
                input.getUTF8String(2).toString
                  .split(",").map(_.trim).filter(_.nonEmpty).toSeq
              else
                CommitLog.tblPropsOf(root, CommitLog.latestVersion(root))
                  .get(CommitLogWrite.SortOrderProp).toSeq
                  .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
            if (cols.nonEmpty) {
              val r = CommitLogOptimize.optimizeClustered(
                spark, root, cols, input.getInt(3))
              oneRow(schema, Int.box(r.version), Int.box(r.sources.size))
            } else {
              val r = CommitLogOptimize.optimize(spark, root, input.getLong(1))
              oneRow(schema, Int.box(r.version), Int.box(r.sources.size))
            }
          }
        }
      case "vacuum" =>
        new Verb("vacuum", resolve, Seq(
          in("tbl", StringType),
          in("keep_last", IntegerType),
          in("min_age_ms", LongType),
          inDefault("dry_run", BooleanType, "false"))) {
          private val schema = StructType(Seq(
            StructField("expired_manifests", IntegerType),
            StructField("swept_batches", IntegerType),
            StructField("retained_from", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val root = rootOf(input)
            val st =
              if (input.getBoolean(3))
                CommitLog.vacuumDryRun(root, input.getInt(1), input.getLong(2))
              else CommitLog.vacuum(root, input.getInt(1), input.getLong(2))
            oneRow(schema, Int.box(st.expiredManifests),
              Int.box(st.sweptBatches.size), Int.box(st.retainedFrom))
          }
        }
      case "restore" =>
        new Verb("restore", resolve, Seq(
          in("tbl", StringType),
          in("version", IntegerType))) {
          private val schema = StructType(Seq(
            StructField("restored_to", IntegerType),
            StructField("new_version", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val to = input.getInt(1)
            val c = CommitLog.restore(rootOf(input), to)
            oneRow(schema, Int.box(to), Int.box(c.version))
          }
        }
      case "history" =>
        new Verb("history", resolve, Seq(in("tbl", StringType))) {
          private val schema = StructType(Seq(
            StructField("version", IntegerType),
            StructField("operation", StringType),
            StructField("n_added", IntegerType),
            StructField("n_removed", IntegerType),
            StructField("data_change", BooleanType),
            StructField("txn_app", StringType),
            StructField("txn_epoch", LongType),
            StructField("timestamp", TimestampType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val rows = CommitLog.history(rootOf(input)).map { h =>
              new GenericInternalRow(Array[Any](
                Int.box(h.version), h.operation.map(utf8).orNull,
                Int.box(h.nAdded), Int.box(h.nRemoved),
                Boolean.box(h.dataChange),
                h.txnApp.map(utf8).orNull,
                h.txnEpoch.map(Long.box).orNull,
                Long.box(h.timestampMs * 1000L))): InternalRow
            }.toArray
            scanOf(schema, rows)
          }
        }
      case "detail" =>
        // Delta's DESCRIBE DETAIL: one metadata-sized summary row —
        // everything answers from manifests (zero data reads; bytes
        // come from the batch directory listings)
        new Verb("detail", resolve, Seq(in("tbl", StringType))) {
          private val schema = StructType(Seq(
            StructField("format", StringType),
            StructField("location", StringType),
            StructField("version", IntegerType),
            StructField("num_batches", IntegerType),
            StructField("num_rows", LongType), // null if any batch uncounted
            StructField("size_bytes", LongType),
            StructField("partition_columns", StringType),
            StructField("sort_order", StringType),
            StructField("num_properties", IntegerType),
            StructField("num_constraints", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val root = rootOf(input)
            val v = CommitLog.latestVersion(root)
            val batches = CommitLog.files(root, v)
            val counts = CommitLog.rowsOf(root, v)
            val rows: Any =
              if (batches.forall(counts.contains))
                Long.box(batches.map(counts).sum)
              else null
            val props = CommitLog.tblPropsOf(root, v)
            oneRow(schema,
              utf8("commitlog"), utf8(root), Int.box(v),
              Int.box(batches.size), rows,
              Long.box(batches.map(b =>
                CommitLogSource.batchBytes(root, b)).sum),
              utf8(CommitLog.partColsOf(root, v).mkString(",")),
              props.get(CommitLogWrite.SortOrderProp).map(utf8).orNull,
              Int.box(props.size),
              Int.box(CommitLog.constraintsOf(root, v).size))
          }
        }
      case "reorg" =>
        // Delta's `REORG TABLE … APPLY (PURGE)` as a procedure:
        // deletion-vector compaction ([[CommitLogOptimize.purge]]) —
        // rewrite vector-referenced batches with deletions applied,
        // drop every vector in one dataChange=false commit. The SQL
        // escape hatch the DV planning-cap error points to.
        new Verb("reorg", resolve, Seq(
          in("tbl", StringType),
          inDefault("target_partitions", IntegerType, "1"))) {
          private val schema = StructType(Seq(
            StructField("version", IntegerType),
            StructField("purged_batches", IntegerType),
            StructField("dropped_vectors", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val r = CommitLogOptimize.purge(
              SparkSession.active, rootOf(input), input.getInt(1))
            oneRow(schema, Int.box(r.version),
              Int.box(r.purged.size), Int.box(r.dropped.size))
          }
        }
      case "set_not_null" =>
        // `ALTER COLUMN … SET NOT NULL` is refused by Spark's own
        // CheckAnalysis on v2 tables ("Cannot change nullable column
        // to non-nullable" — the analyzer cannot validate data), so
        // the SQL surface for TIGHTENING is this procedure; the verb
        // proves existing data itself (zero-read from exact null
        // counts, one filtered scan otherwise). DROP NOT NULL — the
        // loosening the analyzer does allow — stays on ALTER TABLE.
        new Verb("set_not_null", resolve, Seq(
          in("tbl", StringType),
          in("col", StringType))) {
          private val schema = StructType(Seq(
            StructField("version", IntegerType),
            StructField("column", StringType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val root = rootOf(input)
            val col = input.getUTF8String(1).toString
            CommitLogWrite.setNotNull(SparkSession.active, root, col)
            oneRow(schema,
              Int.box(CommitLog.latestVersion(root)), utf8(col))
          }
        }
      case "set_partitioning" =>
        // partition spec evolution (Iceberg's surface is also a
        // procedure-ish extension; Spark SQL has no ALTER for it):
        // `cols` is the new comma-separated spec, '' un-partitions.
        // Metadata-only — existing batches keep their era's tuples.
        new Verb("set_partitioning", resolve, Seq(
          in("tbl", StringType),
          in("cols", StringType))) {
          private val schema = StructType(Seq(
            StructField("version", IntegerType),
            StructField("partitioning", StringType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val root = rootOf(input)
            val cols = input.getUTF8String(1).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq
            CommitLog.setPartitioning(root, cols)
            oneRow(schema,
              Int.box(CommitLog.latestVersion(root)),
              utf8(if (cols.isEmpty) "(none)" else cols.mkString(",")))
          }
        }
      case "clone" =>
        new Verb("clone", resolve, Seq(
          in("tbl", StringType),
          in("target", StringType))) {
          private val schema = StructType(Seq(
            StructField("cloned_version", IntegerType)))
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val c = CommitLog.cloneTable(rootOf(input),
              resolve(input.getUTF8String(1).toString))
            oneRow(schema, Int.box(c.version))
          }
        }
      case other =>
        throw new UnsupportedOperationException(
          s"no procedure system.$other — available: " +
            s"system.{${Names.mkString(",")}}")
    }
}
