package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 [[TableCatalog]] over a warehouse directory of
  * [[CommitLog]] tables — the surface that makes the lakehouse
  * SQL-addressable. Register it once:
  *
  * {{{
  * spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *             spark.sql.catalog.graft.warehouse = /data/warehouse
  * }}}
  *
  * and every verb the log implements becomes a SQL statement:
  *
  *  - `CREATE TABLE graft.db.t (k BIGINT, v BIGINT)` — v1 declares the
  *    DDL (schema-only commit, op=CREATE TABLE)
  *  - `INSERT INTO graft.db.t SELECT …` — the commitlog sink's batch
  *    append (fresh-named batch + born-prunable stats)
  *  - `SELECT … FROM graft.db.t` — the pruning batch scan
  *  - `SELECT … FROM graft.db.t VERSION AS OF 3` /
  *    `TIMESTAMP AS OF '…'` — time travel through Spark's own SQL
  *    time-travel clauses (loadTable version/timestamp overloads),
  *    planned with the schema in force at that version
  *  - `ALTER TABLE graft.db.t RENAME COLUMN a TO b` / `DROP COLUMN a` /
  *    `ADD COLUMN c TYPE` — the column-mapping verbs and additive
  *    evolution as TableChange translations
  *  - `DROP TABLE graft.db.t`, `SHOW TABLES IN graft.db`
  *
  * A table IS its directory (`<warehouse>/<ns…>/<name>`), a namespace
  * IS a directory of tables — the catalog holds no state of its own,
  * so any number of concurrent sessions resolve the same warehouse and
  * the commit log's optimistic protocol arbitrates their writes
  * exactly as it does for path-addressed use. At 100 TB the catalog
  * costs what the log costs: table resolution is one `latestVersion`
  * listing, nothing table-sized. */
object GraftCatalog {
  /** Catalog-reserved keys that must never enter the stored facet —
    * the connector computes/owns them (see CommitLogTable.properties). */
  private[sources] val ReservedProps: Set[String] =
    Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION)

  /** The user TBLPROPERTIES of a CREATE/REPLACE, as the facet delta. */
  private[sources] def userProps(
      properties: java.util.Map[String, String])
      : Map[String, Option[String]] = {
    import scala.jdk.CollectionConverters._
    properties.asScala.toMap
      .filterNot { case (k, _) => ReservedProps.contains(k) }
      .map { case (k, v) => k -> Some(v) }
  }
}

class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  // ---- the `bucket` partition-transform function (SURVEY S81) ----
  //
  // Spark's storage-partitioned joins resolve a scan's reported
  // bucket(N, col) transform through THIS interface
  // (V2ExpressionUtils: `loadFunction(Identifier.of(Array.empty,
  // "bucket"))`), so the function catalog is what turns two bucketed
  // commitlog tables into a zero-shuffle join.

  private val TimeUnits = Set("days", "hours", "months", "years")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      ("bucket" +: "truncate" +: TimeUnits.toSeq.sorted)
        .map(Identifier.of(namespace, _)).toArray
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name match {
      case "bucket" => GraftBucketFunction
      case "truncate" => GraftTruncateFunction
      case u if TimeUnits.contains(u) => new GraftTimeFunction(u)
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  // ---- maintenance verbs as SQL (see [[GraftProcedures]]) ----
  //
  // `CALL <catalog>.system.optimize|vacuum|restore|history|clone(...)`
  // — Spark 4's DSv2 stored procedures, resolving `tbl` arguments
  // (`ns.table`) against this catalog's warehouse.

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.Names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace.sameElements(Array("system")))
      throw new UnsupportedOperationException(
        s"no procedure ${ident.namespace.mkString(".")}.${ident.name} — " +
          s"available: system.{${GraftProcedures.Names.mkString(",")}}")
    GraftProcedures.load(ident.name, ref => {
      val parts = ref.split('.').toSeq
      require(parts.nonEmpty && parts.forall(_.nonEmpty),
        s"procedure table argument '$ref' — expected [ns.]table")
      dirOf(Identifier.of(parts.init.toArray, parts.last))
    })
  }

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** SQL column DEFAULTs are supported: `CREATE TABLE … (c INT
    * DEFAULT <expr>)` — the analyzer fills omitted INSERT columns, the
    * log persists the expressions as their own facet (see
    * [[CommitLog.defaultsOf]]; they cannot ride the DDL string).
    * GENERATED ALWAYS AS columns are supported too: Spark validates
    * the expression at CREATE (deterministic, no subqueries, type
    * match), the catalog persists it as a `graft.generated.<col>`
    * table property (riding the props facet's REPLACE/RESTORE/clone
    * machinery), and the SINK computes the column on every write —
    * see [[CommitLogWrite.boundGenerators]]. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  /** Split a CREATE schema into its bare shape and the default-value
    * expressions Spark encoded as field metadata. */
  private def extractDefaults(schema: StructType)
      : Map[String, Option[(String, String)]] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains("CURRENT_DEFAULT"))
        Some(f.name -> Some((
          f.metadata.getString("CURRENT_DEFAULT"),
          if (f.metadata.contains("EXISTS_DEFAULT"))
            f.metadata.getString("EXISTS_DEFAULT")
          else f.metadata.getString("CURRENT_DEFAULT"))))
      else None
    }.toMap

  /** GENERATED ALWAYS AS expressions from the CREATE schema's field
    * metadata, as the table properties the sink reads. */
  private def extractGenerated(schema: StructType)
      : Map[String, Option[String]] =
    schema.fields.flatMap { f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f)
        .map(e => s"${CommitLogWrite.GeneratedPropPrefix}${f.name}" -> Some(e))
    }.toMap

  /** Resolve a table's schema WITH its default-value metadata (what
    * the analyzer reads to fill omitted INSERT columns) in ONE
    * checkpoint+delta replay — the loadTable hot path. */
  private def schemaWithDefaults(root: String, v: Int): StructType = {
    val (ddlOpt, dfs) = CommitLog.schemaAndDefaultsOf(root, v)
    val base = ddlOpt.map(StructType.fromDDL)
      .getOrElse(CommitLogSource.tableSchema(root, v)) // undeclared: footer
    // identity definitions deliberately do NOT ride the loadTable
    // schema as field metadata: Spark refuses to null-fill an
    // identity column omitted from an INSERT (it expects connector
    // analysis rules to fill it in the plan), which would break the
    // omit-the-column path our SINK-side generation serves. The
    // definition stays user-visible via SHOW TBLPROPERTIES
    // (`graft.identity.<col>`).
    if (dfs.isEmpty) return base
    StructType(base.fields.map { f =>
      dfs.get(f.name) match {
        case Some((cur, ex)) =>
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString("CURRENT_DEFAULT", cur)
            .putString("EXISTS_DEFAULT", ex).build())
        case None => f
      }
    })
  }

  private def checkPart(p: String): String = {
    require(p.nonEmpty && !p.contains('/') && p != ".." &&
        !p.startsWith("_") && !p.startsWith("."),
      s"invalid catalog identifier part '$p'")
    p
  }

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(checkPart) :+
      checkPart(ident.name)).mkString("/")

  private def dirOf(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq.map(checkPart)).mkString("/")

  private def isTable(dir: java.nio.file.Path): Boolean =
    java.nio.file.Files.isDirectory(dir.resolve("_log"))

  /** Materialized directory listing — the stream is CLOSED before
    * returning (Files.list/walk leak an fd per call otherwise). */
  private def listChildren(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Delete a tree depth-first, with the walk stream closed. */
  private def deleteTree(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(dir)
    val all = try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.toList finally s.close()
    all.foreach(java.nio.file.Files.delete)
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = java.nio.file.Paths.get(dirOf(namespace))
    if (!java.nio.file.Files.isDirectory(ns))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    listChildren(ns)
      .filter(p => isTable(p) && !p.getFileName.toString.startsWith("."))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray.sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val root = dirOf(ident)
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "_log")) &&
      CommitLog.latestVersion(root) > 0
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident))
      return changesTableOf(ident, from = None).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          (ident.namespace :+ ident.name).toSeq))
    val root = dirOf(ident)
    val v = CommitLog.latestVersion(root)
    new CommitLogTable(root, schemaWithDefaults(root, v))
  }

  /** `VERSION AS OF <v>` — plan with the schema AND column map in
    * force at that version (on a `<table>.changes` metadata table the
    * clause sets the STARTING version instead: changes since v). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident))
      return changesTableOf(ident, from = Some(version.toInt)).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          (ident.namespace :+ ident.name).toSeq))
    val root = dirOf(ident)
    val v = version.toInt
    new CommitLogTable(root, schemaWithDefaults(root, v),
      Map("versionAsOf" -> version))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) {
      val fromTs = changesTableOf(ident, from = None, ts = Some(timestamp))
      return fromTs.getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          (ident.namespace :+ ident.name).toSeq))
    }
    val root = dirOf(ident)
    val v = CommitLog.versionAt(root, timestamp / 1000L)
    new CommitLogTable(root, schemaWithDefaults(root, v),
      Map("versionAsOf" -> v.toString))
  }

  /** Iceberg-style METADATA TABLE for the change feed: `SELECT * FROM
    * <cat>.<ns>.<table>.changes` serves the row-granularity CDF
    * (`_change_type` / `_commit_version` on top of the data schema) as
    * a fully DISTRIBUTED scan — the SQL spelling of the DataFrame
    * `readChangeFeed` option, nothing collected to the driver.
    * `VERSION AS OF v` on the changes table means "changes from
    * version v onward" — start-INCLUSIVE, Delta's table_changes
    * semantics (a consumer asking for v expects v's own rows; silently
    * excluding them is row loss in a change feed). The bare table
    * reads the full feed from the first commit (v1 data from a CTAS
    * included). Resolved only when no real table of that name exists,
    * so a genuine table named `changes` still wins. */
  private def changesTableOf(
      ident: Identifier, from: Option[Int],
      ts: Option[Long] = None): Option[Table] = {
    if (ident.name != "changes" || ident.namespace.isEmpty) return None
    val parent = Identifier.of(
      ident.namespace.init, ident.namespace.last)
    if (!tableExists(parent)) return None
    val root = dirOf(parent)
    // the scan's startingVersion bound is EXCLUSIVE (changes of
    // (start, end]), so the inclusive SQL clause passes v-1 — clamped:
    // VERSION AS OF 0 means "everything" (Delta's table_changes
    // accepts it), not a read of the nonexistent v0 manifest
    val start = from.map(f => math.max(0, f - 1)).orElse(
      ts.map(t => CommitLog.versionAt(root, t / 1000L))).getOrElse(0)
    val base = schemaWithDefaults(root, CommitLog.latestVersion(root))
    // a row-tracked table's feed exposes the stable row id (see the
    // readChangeFeed schema leg in CommitLogSource)
    val withId =
      if (CommitLogWrite.rowTrackingOn(
          CommitLog.tblPropsOf(root, CommitLog.latestVersion(root))))
        base.add(CommitLogWrite.RowIdCol, org.apache.spark.sql.types.LongType)
      else base
    val schema = withId
      .add(CommitLogCdf.ChangeTypeCol, org.apache.spark.sql.types.StringType)
      .add(CommitLogCdf.CommitVersionCol, org.apache.spark.sql.types.IntegerType)
    Some(new CommitLogTable(root, schema, Map(
      "readChangeFeed" -> "true", "startingVersion" -> start.toString)) {
      override def name(): String =
        (ident.namespace :+ ident.name).mkString(".")
      private def readOnly(verb: String): Nothing =
        throw new UnsupportedOperationException(
          s"$verb on a `.changes` metadata table — it is a read-only " +
            "view of the change feed; write to the base table " +
            s"${ident.namespace.mkString(".")}")
      override def newWriteBuilder(
          info: org.apache.spark.sql.connector.write.LogicalWriteInfo) =
        readOnly("write")
      override def canDeleteWhere(
          filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
        readOnly("DELETE")
      override def deleteWhere(
          filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
        readOnly("DELETE")
      override def newRowLevelOperationBuilder(
          info: org.apache.spark.sql.connector.write.RowLevelOperationInfo) =
        readOnly("row-level DML")
    })
  }

  /** `CREATE TABLE … PARTITIONED BY (c1, bucket(8, c2))` — identity
    * and hash-bucket transforms: identity columns record verbatim,
    * `bucket(N, col)` records the spec entry `bucketN(col)`
    * ([[CommitLogBucket]]) so a high-cardinality key drives partition
    * pruning and SPJ through N hash buckets. Other expression
    * transforms (days, truncate, …) are refused — derive a GENERATED
    * column and identity-partition on it, or cluster with OPTIMIZE
    * ZORDER. */
  private def identityPartCols(
      schema: StructType, partitions: Array[Transform]): Seq[String] = {
    val partCols = partitions.toSeq.map { t =>
      require(t.references.length == 1 &&
          t.references.head.fieldNames.length == 1,
        s"commitlog partitioning transforms take ONE top-level column — got $t")
      val src = t.references.head.fieldNames.head
      def dtOf: Option[DataType] =
        schema.fields.find(_.name == src).map(_.dataType)
      def litInt(what: String): Int = {
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value.isInstanceOf[Number] =>
            l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw new IllegalArgumentException(
          s"$what transform needs a literal argument — got $t"))
        require(n > 0, s"$what argument must be positive — got $n in $t")
        n
      }
      t.name match {
        case "identity" => src
        case "bucket" =>
          val n = litInt("bucket")
          require(dtOf.exists(CommitLogBucket.supported),
            s"bucket source '$src' must be an integral, date/timestamp " +
              s"or string column — got ${dtOf.map(_.simpleString).getOrElse("?")}")
          CommitLogBucket.render(n, src)
        case u @ ("days" | "hours" | "months" | "years") =>
          val spec = CommitLogMonotone.Time(u, src)
          require(dtOf.exists(CommitLogMonotone.supported(spec, _)),
            s"$u source '$src' must be a timestamp or date column — got " +
              dtOf.map(_.simpleString).getOrElse("?"))
          spec.render
        case "truncate" =>
          val spec = CommitLogMonotone.Trunc(litInt("truncate"), src)
          require(dtOf.exists(CommitLogMonotone.supported(spec, _)),
            s"truncate source '$src' must be an integral or string " +
              s"column — got ${dtOf.map(_.simpleString).getOrElse("?")}")
          spec.render
        case other => throw new IllegalArgumentException(
          s"commitlog tables support identity, bucket, days/hours/months/" +
            s"years and truncate partitioning — got $other($src) (derive " +
            "a GENERATED column, or cluster via OPTIMIZE ZORDER)")
      }
    }
    partCols.foreach(c => require(
      schema.fieldNames.contains(CommitLogBucket.sourceOf(c)),
      s"partition column '${CommitLogBucket.sourceOf(c)}' is not in the " +
        "table schema"))
    partCols
  }

  /** Spark routes `GENERATED ALWAYS AS` through the Column[] overload
    * ONLY — `CatalogV2Util.v2ColumnsToStructType` keeps defaults in
    * field metadata but DROPS generation expressions, so this overload
    * must capture them before the conversion. */
  override def createTable(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    createTableImpl(ident, GraftShims.v2ColumnsToStructType(columns),
      partitions, properties, colFacetsOf(columns))

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    createTableImpl(ident, schema, partitions, properties,
      extractGenerated(schema))

  private def createTableImpl(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String],
      generated: Map[String, Option[String]]): Table = {
    val partCols = identityPartCols(schema, partitions)
    requireNoIdentityPartition(partCols, generated)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace :+ ident.name).toSeq)
    val root = dirOf(ident)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    CommitLog.commit(root, CommitLog.latestVersion(root), added = Nil,
      schema = Some(CommitLog.bareDdl(schema)), partCols = partCols,
      defaults = extractDefaults(schema),
      props = GraftCatalog.userProps(properties) ++ generated,
      op = Some("CREATE TABLE"))
    new CommitLogTable(root, schema)
  }

  /** Generation expressions straight off the v2 Columns (see
    * [[createTable]]). */
  private def generatedOf(columns: Array[Column])
      : Map[String, Option[String]] =
    columns.flatMap(c => Option(c.generationExpression()).map(e =>
      s"${CommitLogWrite.GeneratedPropPrefix}${c.name}" -> Some(e))).toMap

  /** IDENTITY definitions off the v2 Columns — persisted as
    * `graft.identity.<col>` -> "start,step,allowExplicitInsert"; the
    * sink assigns values and advances the per-column watermark
    * atomically in each data commit (see
    * [[CommitLogWrite.IdentityPropPrefix]]). */
  private def identityOf(columns: Array[Column])
      : Map[String, Option[String]] =
    columns.flatMap(c => Option(c.identityColumnSpec()).map { s =>
      require(c.dataType == org.apache.spark.sql.types.LongType ||
          c.dataType == org.apache.spark.sql.types.IntegerType,
        s"identity column '${c.name}' must be BIGINT or INT, " +
          s"got ${c.dataType.simpleString}")
      require(s.getStep != 0,
        s"identity column '${c.name}': INCREMENT BY must be non-zero")
      s"${CommitLogWrite.IdentityPropPrefix}${c.name}" ->
        Some(s"${s.getStart},${s.getStep},${s.isAllowExplicitInsert}")
    }).toMap

  /** Column-definition facets (generated + identity) of a CREATE's v2
    * Columns, as props-facet entries. */
  private def colFacetsOf(columns: Array[Column])
      : Map[String, Option[String]] =
    generatedOf(columns) ++ identityOf(columns)

  /** Identity values are near-unique per row — partitioning by one
    * would route one batch per row (generated DATE columns, by
    * contrast, are the canonical partition key and stay allowed). */
  private def requireNoIdentityPartition(
      partCols: Seq[String], facets: Map[String, Option[String]]): Unit =
    partCols.foreach(c => require(
      !facets.contains(s"${CommitLogWrite.IdentityPropPrefix}$c"),
      s"cannot partition by identity column '$c' — identity values " +
        "are unique per row (one batch per row); partition by a " +
        "derived GENERATED column instead"))

  /** Column-DEFINITION facets (generated / identity / the identity
    * watermark) are owned by DDL and the sink's data commits — a
    * SET/UNSET TBLPROPERTIES rewrite would silently change what a
    * column means (or resurrect spent identity values). */
  private def requireNotColumnFacet(key: String): Unit =
    require(!key.startsWith(CommitLogWrite.GeneratedPropPrefix) &&
        !key.startsWith(CommitLogWrite.IdentityPropPrefix) &&
        !key.startsWith(CommitLogWrite.IdentityHwmPrefix),
      s"'$key' is a column-definition facet — declared at CREATE/" +
        "REPLACE TABLE, not settable via TBLPROPERTIES")

  // ---- ATOMIC CTAS / RTAS / REPLACE TABLE (StagingTableCatalog) ----
  //
  // Spark routes CREATE TABLE AS SELECT / REPLACE TABLE [AS SELECT]
  // through the Atomic*Exec plans when the catalog stages: the write
  // lands in a HIDDEN stage table first and nothing becomes visible
  // until commitStagedChanges — a failed CTAS leaves no half-written
  // table (the non-staged fallback drops a partially-created table on
  // failure, a visibility window a concurrent reader can fall into).
  //
  //  - CTAS commit = ONE directory rename of the staged table into its
  //    final name (create-if-absent: a racing CTAS of the same name
  //    loses loudly).
  //  - RTAS/REPLACE commit = adopt the staged batches into the TARGET
  //    table's own log as ONE serializable manifest (removed = every
  //    live batch, added = the staged data, schema restated, CHECK
  //    constraints of the old definition tombstoned) — readers see the
  //    old table or the new one, never neither, and the old versions
  //    stay time-travelable exactly like an OVERWRITE. Repartitioning
  //    and reuse of renamed/dropped column names are refused — both
  //    would strand metadata the replay still carries.

  private def stageDirOf(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(checkPart)).mkString("/") +
      s"/.stage-${checkPart(ident.name)}-${java.util.UUID.randomUUID().toString.take(8)}"

  // the Column[] staging overloads exist for the same reason as
  // createTable's: v2ColumnsToStructType drops generation expressions
  override def stageCreate(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace :+ ident.name).toSeq)
    stage(ident, GraftShims.v2ColumnsToStructType(columns), partitions,
      replace = false, properties, colFacetsOf(columns))
  }

  override def stageReplace(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace :+ ident.name).toSeq)
    stage(ident, GraftShims.v2ColumnsToStructType(columns), partitions,
      replace = true, properties, colFacetsOf(columns))
  }

  override def stageCreateOrReplace(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    stage(ident, GraftShims.v2ColumnsToStructType(columns), partitions,
      replace = tableExists(ident), properties, colFacetsOf(columns))

  private def stage(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], replace: Boolean,
      properties: java.util.Map[String, String],
      generated: Map[String, Option[String]] = Map.empty): StagedTable = {
    val partCols = identityPartCols(schema, partitions)
    requireNoIdentityPartition(partCols, generated)
    val target = dirOf(ident)
    if (replace) {
      val v = CommitLog.latestVersion(target)
      val inForce = CommitLog.partColsOf(target, v)
      // EXACT match required, both ways: partCols replay keeps the last
      // non-empty declaration, so an unpartitioned→partitioned REPLACE
      // could never be RESTOREd back (the schema would roll back but
      // the partitioning would not — the table wedges)
      require(inForce == partCols,
        s"REPLACE TABLE cannot change partitioning of $target " +
          s"((${inForce.mkString(",")}) -> (${partCols.mkString(",")})): " +
          "partitioning is immutable for the table's lifetime — create a " +
          "new table instead")
      val reserved = CommitLog.formerNamesOf(target, v).values.flatten.toSet ++
        CommitLog.droppedOf(target, v)
      val zombie = schema.fieldNames.filter(reserved.contains)
      require(zombie.isEmpty,
        s"REPLACE TABLE schema reuses renamed/dropped name(s) " +
          s"${zombie.mkString(",")} of $target — old versions still " +
          "resolve them through the column map; pick fresh names")
    }
    val stageRoot = stageDirOf(ident)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stageRoot))
    CommitLog.commit(stageRoot, 0, added = Nil,
      schema = Some(CommitLog.bareDdl(schema)), partCols = partCols,
      defaults = extractDefaults(schema),
      props = GraftCatalog.userProps(properties) ++
        extractGenerated(schema) ++ generated,
      op = Some("CREATE TABLE"))
    new StagedCommitLogTable(stageRoot, target, schema, replace,
      onAbort = () => deleteTree(java.nio.file.Paths.get(stageRoot)))
  }

  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace :+ ident.name).toSeq)
    stage(ident, schema, partitions, replace = false, properties)
  }

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace :+ ident.name).toSeq)
    stage(ident, schema, partitions, replace = true, properties)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, replace = tableExists(ident),
      properties)

  /** ALTER TABLE: RENAME COLUMN / DROP COLUMN map onto the
    * column-mapping verbs; ADD COLUMN onto additive evolution. Each
    * change is one commit — SQL's one-change-per-ALTER shape. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = dirOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace :+ ident.name).toSeq)
    val partCols = CommitLog.partColsOf(root, CommitLog.latestVersion(root))
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "commitlog columns are top-level — nested renames unsupported")
        // the partition registry and every recorded tuple key by this
        // name — a rename would orphan them all
        require(!partCols.contains(c.fieldNames.head),
          s"'${c.fieldNames.head}' is a partition column — partitioning " +
            "is immutable; create a new table and reload")
        require(c.newName != CommitLogWrite.RowIdCol,
          s"'${CommitLogWrite.RowIdCol}' is the engine's reserved " +
            "row-tracking column name")
        CommitLog.renameColumn(root, c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "commitlog columns are top-level — nested drops unsupported")
        require(!partCols.contains(c.fieldNames.head),
          s"'${c.fieldNames.head}' is a partition column — partitioning " +
            "is immutable; create a new table and reload")
        CommitLog.dropColumn(root, c.fieldNames.head)
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1,
          "commitlog columns are top-level — nested adds unsupported")
        require(c.isNullable,
          "evolved columns null-fill old files — ADD COLUMN must be nullable")
        // an ADD COLUMN default would need EXISTS_DEFAULT read
        // semantics (old files' rows answering the default instead of
        // NULL) — the reader null-fills, so accepting it would
        // silently change what existing rows read as
        require(c.defaultValue() == null,
          "ADD COLUMN … DEFAULT is unsupported on commitlog tables: " +
            "evolved columns null-fill pre-evolution files — add the " +
            "column, then backfill with UPDATE")
        require(c.fieldNames.head != CommitLogWrite.RowIdCol,
          s"'${CommitLogWrite.RowIdCol}' is the engine's reserved " +
            "row-tracking column name")
        val v = CommitLog.latestVersion(root)
        val cur = CommitLog.schemaOf(root, v).getOrElse(
          throw new IllegalStateException(s"$root has no declared schema"))
        val next = StructType.fromDDL(cur)
          .add(c.fieldNames.head, c.dataType, nullable = true)
        CommitLog.commit(root, v, added = Nil, schema = Some(next.toDDL),
          op = Some("ADD COLUMN"))
      case c: TableChange.SetProperty =>
        require(!GraftCatalog.ReservedProps.contains(c.property),
          s"'${c.property}' is a reserved catalog property")
        requireNotColumnFacet(c.property)
        // ROW TRACKING can only be switched ON while the table holds
        // no data: existing files lack the hidden row-id column, and
        // there is no backfill — a null id would silently break the
        // stable-identity contract for every pre-enablement row
        if (c.property == CommitLogWrite.RowTrackingProp &&
            c.value != null && c.value.trim.equalsIgnoreCase("true")) {
          val v = CommitLog.latestVersion(root)
          require(
            CommitLogWrite.rowTrackingOn(CommitLog.tblPropsOf(root, v)) ||
              CommitLog.files(root, v).isEmpty,
            s"rowTracking can only be ENABLED while the table holds no " +
              "data — set it at CREATE TABLE, or TRUNCATE first")
        }
        // ...and only switched OFF the same way: on a tracked table
        // with data, appends after the flip would write id-less files,
        // the change feed would lose its id column mid-stream, and
        // re-enabling is blocked by the non-empty gate above — a
        // silent, irreversible identity loss. Mirror the enable gate.
        if (c.property == CommitLogWrite.RowTrackingProp &&
            (c.value == null || !c.value.trim.equalsIgnoreCase("true"))) {
          val v = CommitLog.latestVersion(root)
          require(
            !CommitLogWrite.rowTrackingOn(CommitLog.tblPropsOf(root, v)) ||
              CommitLog.files(root, v).isEmpty,
            s"rowTracking can only be DISABLED while the table holds no " +
              "data — TRUNCATE first (row identities cannot be dropped " +
              "in place)")
        }
        CommitLog.commit(root, CommitLog.latestVersion(root), added = Nil,
          props = Map(c.property -> Some(c.value)),
          op = Some("SET TBLPROPERTIES"))
      case c: TableChange.RemoveProperty =>
        require(!GraftCatalog.ReservedProps.contains(c.property),
          s"'${c.property}' is a reserved catalog property")
        requireNotColumnFacet(c.property)
        if (c.property == CommitLogWrite.RowTrackingProp) {
          val v = CommitLog.latestVersion(root)
          require(
            !CommitLogWrite.rowTrackingOn(CommitLog.tblPropsOf(root, v)) ||
              CommitLog.files(root, v).isEmpty,
            s"rowTracking can only be DISABLED while the table holds no " +
              "data — TRUNCATE first (row identities cannot be dropped " +
              "in place)")
        }
        if (CommitLog.tblPropsOf(root, CommitLog.latestVersion(root))
            .contains(c.property))
          CommitLog.commit(root, CommitLog.latestVersion(root), added = Nil,
            props = Map(c.property -> None),
            op = Some("UNSET TBLPROPERTIES"))
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1,
          "commitlog columns are top-level — nested type changes unsupported")
        // the ladder/partition/generated gates live in the verb; the
        // catalog only routes (Delta's type widening surface)
        CommitLog.widenColumn(root, c.fieldNames.head, c.newDataType)
      case c: TableChange.UpdateColumnNullability =>
        require(c.fieldNames.length == 1,
          "commitlog columns are top-level — nested nullability unsupported")
        // SET NOT NULL proves existing data first (zero-read when the
        // manifest's exact null counts carry it); DROP NOT NULL is the
        // always-legal loosening — both verbs own their gates
        if (c.nullable)
          CommitLogWrite.dropNotNull(root, c.fieldNames.head)
        else
          CommitLogWrite.setNotNull(
            org.apache.spark.sql.SparkSession.active, root, c.fieldNames.head)
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change $other is not supported on commitlog tables")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = java.nio.file.Paths.get(dirOf(ident))
    if (!java.nio.file.Files.isDirectory(root)) return false
    deleteTree(root)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (oldIdent.namespace :+ oldIdent.name).toSeq)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (newIdent.namespace :+ newIdent.name).toSeq)
    val oldRoot = dirOf(oldIdent)
    // deletion vectors record ABSOLUTE file paths: moving the
    // directory would orphan every DV reference and silently
    // resurrect the deleted rows — same path-dependence that makes
    // shallow clone refuse DV sources. Compact first.
    val v = CommitLog.latestVersion(oldRoot)
    require(!CommitLog.files(oldRoot, v).exists(_.startsWith("dv-")),
      s"cannot rename table at $oldRoot: outstanding deletion vectors " +
        "reference its absolute path — run a COW rewrite or compaction " +
        "first")
    val to = java.nio.file.Paths.get(dirOf(newIdent))
    java.nio.file.Files.createDirectories(to.getParent)
    java.nio.file.Files.move(java.nio.file.Paths.get(oldRoot), to)
  }

  // ---- namespaces (directories of tables) ----

  override def listNamespaces(): Array[Array[String]] = {
    val w = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(w)) return Array.empty
    listChildren(w)
      .filter(p => java.nio.file.Files.isDirectory(p) && !isTable(p) &&
        !p.getFileName.toString.startsWith("_"))
      .map(p => Array(p.getFileName.toString)).toArray.sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
          namespace.toSeq)
      Array.empty // one level of namespaces is plenty for a warehouse dir
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dirOf(namespace)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    new java.util.HashMap[String, String]()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dirOf(namespace)))

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "commitlog namespaces carry no metadata to alter")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = java.nio.file.Paths.get(dirOf(namespace))
    if (!java.nio.file.Files.isDirectory(dir)) return false
    if (listChildren(dir).nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty — use CASCADE")
    deleteTree(dir)
    true
  }
}

/** A staged commitlog table (see [[GraftCatalog]]'s staging section):
  * a fully functional table over a HIDDEN stage directory — the CTAS/
  * RTAS write lands here through the ordinary sink, stats/blooms/
  * tuples/row counts and all — plus the two-sided publish contract.
  *
  *  - CREATE commit: one atomic directory rename into the final name
  *    (create-if-absent — a racing CTAS of the same name fails loudly,
  *    and its abort sweeps only its own stage).
  *  - REPLACE commit: the staged batches are adopted into the TARGET
  *    table's log as ONE serializable manifest — removed = every live
  *    batch (deletion vectors included), added = the staged data with
  *    its manifest facets carried verbatim, schema restated (the one
  *    verb besides RESTORE allowed to roll the DDL backward), old
  *    CHECK constraints tombstoned (REPLACE re-defines the table).
  *    Old versions stay readable behind time travel until vacuum,
  *    exactly like an OVERWRITE.
  */
class StagedCommitLogTable(
    stageRoot: String, targetRoot: String, tableSchema: StructType,
    replace: Boolean, onAbort: () => Unit)
    extends CommitLogTable(stageRoot, tableSchema)
    with StagedTable {
  import java.nio.file.{Files, Paths}

  override def commitStagedChanges(): Unit = {
    if (!replace) {
      val to = Paths.get(targetRoot)
      Files.createDirectories(to.getParent)
      try Files.move(Paths.get(stageRoot), to)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          onAbort()
          throw new org.apache.spark.sql.catalyst.analysis
            .TableAlreadyExistsException(
              s"`$targetRoot` (CTAS target was created by a rival first)")
      }
      return
    }
    val sv = CommitLog.latestVersion(stageRoot)
    val snap = CommitLog.snapshotAt(stageRoot, sv)
    try {
      // adopt the staged batch directories under the target root —
      // invisible there until the single manifest below lists them
      // (fresh write-id names make collisions a hard error, not a
      // race). Inside the try: a mid-loop failure must run the
      // un-adopt below, or already-moved dirs linger as unlisted
      // debris under the target
      snap.files.foreach { b =>
        require(!b.startsWith("@"), s"staged batches are local, got $b")
        val from = Paths.get(CommitLog.batchPath(stageRoot, b))
        val to = Paths.get(CommitLog.batchPath(targetRoot, b))
        require(!Files.exists(to),
          s"REPLACE TABLE batch name collision at $to")
        if (Files.exists(from)) Files.move(from, to)
      }
      var attempts = 0
      while (attempts < 50) {
        attempts += 1
        // TRUNCATE's discipline: the removal list re-resolves per
        // attempt, so a mid-race rival append falls INSIDE the replace
        val v = CommitLog.latestVersion(targetRoot)
        val live = CommitLog.files(targetRoot, v)
        // re-check the stage-time gates against THIS attempt's version:
        // a rival RENAME/DROP COLUMN (or partitioning change) landing
        // between staging and commit could otherwise slip a REPLACE
        // whose schema reuses a just-reserved name — exactly the
        // zombie the stage-time gate refuses
        val stagedParts = CommitLog.partColsOf(stageRoot, sv)
        val inForce = CommitLog.partColsOf(targetRoot, v)
        require(inForce == stagedParts,
          s"REPLACE TABLE cannot change partitioning of $targetRoot " +
            s"((${inForce.mkString(",")}) -> (${stagedParts.mkString(",")}))" +
            ": partitioning is immutable for the table's lifetime")
        val reserved =
          CommitLog.formerNamesOf(targetRoot, v).values.flatten.toSet ++
            CommitLog.droppedOf(targetRoot, v)
        val zombie = tableSchema.fieldNames.filter(reserved.contains)
        require(zombie.isEmpty,
          s"REPLACE TABLE schema reuses renamed/dropped name(s) " +
            s"${zombie.mkString(",")} of $targetRoot — old versions still " +
            "resolve them through the column map; pick fresh names")
        // the old definition's constraints and column defaults die
        // with it — a REPLACE that kept them would reject writes the
        // new DDL permits / fill columns the new DDL never declared
        val tombstones = CommitLog.constraintsOf(targetRoot, v)
          .map { case (n, _) => n -> CommitLog.ConstraintTombstone }
        val newDefaults = CommitLog.defaultsOf(stageRoot, sv)
        // the stored TBLPROPERTIES swap with the new definition too
        val propSwap = CommitLog.propSwap(
          targetRoot, v, CommitLog.tblPropsOf(stageRoot, sv))
        val defaultSwap: Map[String, Option[(String, String)]] =
          CommitLog.defaultsOf(targetRoot, v).keys
            .filterNot(newDefaults.contains)
            .map(_ -> (None: Option[(String, String)])).toMap ++
            newDefaults.map { case (c, p) => c -> Some(p) }
        if (CommitLog.tryCommit(targetRoot, v + 1,
            added = snap.files, removed = live,
            schema = CommitLog.schemaOf(stageRoot, sv),
            stats = snap.stats, blooms = snap.blooms, parts = snap.parts,
            rows = snap.rows,
            partCols = CommitLog.partColsOf(stageRoot, sv),
            constraints = tombstones,
            defaults = defaultSwap,
            props = propSwap,
            op = Some("REPLACE TABLE"))) {
          if ((v + 1) % CommitLog.checkpointInterval == 0)
            CommitLog.writeCheckpoint(targetRoot, v + 1)
          // the stage dir now holds only the log of the adopted
          // batches — drop it
          onAbort()
          return
        }
      }
      throw new IllegalStateException(
        s"REPLACE TABLE on $targetRoot gave up after 50 attempts (livelock?)")
    } catch {
      case e: Throwable =>
        // un-adopt: staged data must not linger unlisted in the target
        snap.files.foreach { b =>
          val p = Paths.get(CommitLog.batchPath(targetRoot, b))
          if (Files.exists(p)) {
            val s = Files.walk(p)
            val all = try {
              import scala.jdk.CollectionConverters._
              s.sorted(java.util.Comparator.reverseOrder())
                .iterator().asScala.toList
            } finally s.close()
            all.foreach(Files.delete)
          }
        }
        onAbort()
        throw e
    }
  }

  override def abortStagedChanges(): Unit = onAbort()
}
