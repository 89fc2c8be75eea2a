package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.util.SerializableConfiguration

/** VECTORIZED read path for the commitlog connector: data files decode
  * through Spark's own `VectorizedParquetRecordReader` into
  * `ColumnarBatch`es (the ~GB/s/core inner loop every built-in parquet
  * scan uses — dictionary-aware, null-bitmap vectors, feeding
  * whole-stage codegen through `ColumnarToRow`), instead of
  * materializing one parquet-hadoop `Group` record at a time. At 100 TB
  * this is THE number for full-snapshot scans of a commitlog table;
  * the row-at-a-time [[CommitLogPartitionReader]] remains only for the
  * shapes that need per-row bookkeeping the vectorized reader cannot
  * do — deletion-vector position skips, change-feed constants, and the
  * `_batch`/`_row_file`/`_row_pos` metadata columns of row-level
  * rewrites (all version-delta- or touched-batch-sized by contract).
  *
  * Schema authority stays the LOG: the requested schema is the scan's
  * (pruned) logical schema, so pre-evolution files NULL-FILL missing
  * columns inside the vectorized reader (Spark's standard
  * missing-column vectors), and RENAMED columns resolve per file
  * through the column-map name chain — the requested schema sent to
  * the reader carries the PHYSICAL name the file was written with
  * (batch columns are consumed by ordinal, so the name never leaks).
  * The one extra footer read that resolution needs is paid only when a
  * rename is actually in force, and is handed to the reader so it is
  * never read twice.
  *
  * Rebase modes are CORRECTED/UTC: every file in a commitlog table was
  * written either by this engine's sink (proleptic micros/epoch-days by
  * construction) or by Spark 3+'s writer during a COW rewrite — there
  * is no pre-Spark-3 legacy-calendar era to rebase.
  */
object CommitLogColumnar {
  /** Column vector capacity per batch — Spark's own default. */
  val Capacity = 4096

  /** Test observability: readers opened since JVM start (local-mode
    * executors share the driver JVM, so specs pin leg selection by
    * counter delta — streaming plans aren't inspectable post-hoc). */
  private[graft] val readersOpened = new java.util.concurrent.atomic.AtomicLong

  /** The hadoop conf a columnar read ships to executors: the session's
    * full hadoop conf (filesystem credentials etc.) plus the SQL
    * entries Spark's parquet ReadSupport and schema converter read
    * RAW (`conf.get(key).toBoolean` — unset keys would NPE, so every
    * one is pinned here from the live session conf). */
  def readerConf(spark: SparkSession): SerializableConfiguration = {
    val sqlc = spark.sessionState.conf
    val hc = spark.sessionState.newHadoopConf()
    hc.set("parquet.read.support.class", classOf[ParquetReadSupport].getName)
    hc.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlc.sessionLocalTimeZone)
    hc.set(SQLConf.CASE_SENSITIVE.key, sqlc.caseSensitiveAnalysis.toString)
    hc.set(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlc.isParquetBinaryAsString.toString)
    hc.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlc.isParquetINT96AsTimestamp.toString)
    hc.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED).toString)
    hc.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlc.getConf(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG).toString)
    hc.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_FIELD_ID_READ_ENABLED).toString)
    hc.set(SQLConf.PARQUET_IGNORE_VARIANT_ANNOTATION.key,
      sqlc.getConf(SQLConf.PARQUET_IGNORE_VARIANT_ANNOTATION).toString)
    hc.set(SQLConf.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION.key,
      sqlc.getConf(SQLConf.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION)
        .toString)
    hc.set(SQLConf.VARIANT_ALLOW_READING_SHREDDED.key,
      sqlc.getConf(SQLConf.VARIANT_ALLOW_READING_SHREDDED).toString)
    new SerializableConfiguration(hc)
  }
}

/** One data file decoded as ColumnarBatches (see [[CommitLogColumnar]]).
  * Schema resolution is by NAME per file: `formers` maps each logical
  * column to its rename chain, newest first, and the requested schema
  * uses whichever chain name the file physically carries. */
class CommitLogColumnarReader(
    file: String, schema: StructType,
    formers: Map[String, Seq[String]],
    baseConf: Configuration,
    fileLength: Long = -1L,
    stamp: Option[(String, Int)] = None)
    extends PartitionReader[ColumnarBatch] {

  CommitLogColumnar.readersOpened.incrementAndGet()

  // per-file copy: the requested schema differs per file under renames,
  // and Configuration is mutable — never write into the shared one
  private val conf = new Configuration(baseConf)
  private val path = new Path(file)

  // CONSTANT-STAMPED change-feed read: `_change_type`/`_commit_version`
  // are constant for a whole-file feed partition, so they ride every
  // batch as constant TRAILING vectors (initBatch partition columns —
  // the eligibility gate in CommitLogScan guarantees the stamps trail
  // the pruned schema) while the file part excludes them
  private val stampFields = schema.fields.filter(f =>
    CommitLogSource.StampCols.contains(f.name))
  private val fileSchema: StructType =
    if (stamp.isEmpty) schema
    else StructType(schema.fields.filterNot(f =>
      CommitLogSource.StampCols.contains(f.name)))
  private val (stampSchema, stampRow) = stamp match {
    case Some((ct, v)) if stampFields.nonEmpty =>
      val vals: Array[Any] = stampFields.map { f =>
        if (f.name == CommitLogCdf.ChangeTypeCol)
          org.apache.spark.unsafe.types.UTF8String.fromString(ct)
        else Int.box(v)
      }.toArray
      (StructType(stampFields),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals))
    case _ =>
      (new StructType(), org.apache.spark.sql.catalyst.InternalRow.empty)
  }

  // the footer is read here ONLY when a rename is in force (name
  // resolution needs the file's physical fields); it is then handed to
  // the reader so the file's footer is still read exactly once
  private val footer: Option[org.apache.parquet.hadoop.metadata.ParquetMetadata] =
    if (formers.isEmpty || !formers.keys.exists(fileSchema.fieldNames.contains))
      None
    else {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try Some(r.getFooter) finally r.close()
    }

  private val requested: StructType = footer match {
    case None => fileSchema
    case Some(f) =>
      val fileType = f.getFileMetaData.getSchema
      StructType(fileSchema.fields.map { sf =>
        val physical = (sf.name +: formers.getOrElse(sf.name, Seq.empty))
          .find(fileType.containsField).getOrElse(sf.name)
        sf.copy(name = physical)
      })
  }

  private val reader: VectorizedParquetRecordReader = {
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
    // planning hands the length from its own directory listing (files
    // are immutable once committed); only ad-hoc callers re-stat
    val len =
      if (fileLength >= 0) fileLength
      else path.getFileSystem(conf).getFileStatus(path).getLen
    val split = new FileSplit(path, 0, len, Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf, new TaskAttemptID())
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, CommitLogColumnar.Capacity)
    var ok = false
    try {
      r.initialize(split, ctx, None, None, footer)
      r.initBatch(stampSchema, stampRow)
      r.enableReturningBatches()
      ok = true
    } finally if (!ok) r.close()
    r
  }

  override def next(): Boolean = reader.nextKeyValue()
  override def get(): ColumnarBatch =
    reader.getCurrentValue.asInstanceOf[ColumnarBatch]
  override def close(): Unit = reader.close()
}
