package graft.sources

/** Versioned commit log with OPTIMISTIC CONCURRENCY for the S22
  * lakehouse table layout (`queries/Sources.scala` s22_time_travel):
  * every commit publishes an immutable manifest `_log/v<N>.json`
  * recording the batches its commit added and removed (the snapshot at
  * N is reconstructed by delta replay — see the metadata-scaling note
  * below), and the Delta/Iceberg conflict protocol arbitrates
  * concurrent writers:
  *
  *  1. A writer snapshots version R, stages its data files (writes are
  *     always NEW files — data files are immutable), and attempts to
  *     publish manifest v(R+1) with CREATE-IF-ABSENT semantics. The
  *     create is atomic (content is fully written to a hidden temp
  *     file, then hard-linked into place — `link(2)` fails with EEXIST
  *     if a rival won), so exactly ONE writer can ever own a version
  *     number: the history is linear by construction.
  *  2. The loser re-reads the new latest snapshot and conflict-checks:
  *     if every file it REMOVES (copy-on-write rewrite set; empty for
  *     pure appends) still exists in the current manifest, the rival's
  *     commit was disjoint — REBASE (recompute the file list on top of
  *     current) and retry at the next version. If a removed file is
  *     gone, a rival rewrote or dropped the same data — ABORT with
  *     `ConcurrentModificationException`; retrying would resurrect or
  *     double-delete rows.
  *
  * Pure appends therefore always commit (livelock aside — bounded by
  * `maxAttempts`); conflicting copy-on-write deletes abort cleanly,
  * exactly once, with no partial state: an unpublished manifest is
  * invisible, and staged data files without a manifest entry are dead
  * bytes a compactor may sweep.
  *
  * METADATA SCALES AS O(delta), NOT O(table): each manifest records
  * only its commit's `{"add":[...],"remove":[...]}` — at 100 TB a
  * table holds millions of data files, and a format that rewrites the
  * full file list per commit (what s22 shipped first) turns every
  * append into a table-sized metadata write. Snapshot reconstruction
  * replays deltas forward from the nearest CHECKPOINT
  * (`_log/ckpt-v<N>.json`, the full list at N, written every
  * [[checkpointInterval]] commits and at vacuum cutoffs), so a read
  * touches at most one checkpoint + [[checkpointInterval]] deltas —
  * the Delta-log/Iceberg-snapshot layout. Checkpoints are derived
  * state: publishing them uses the same atomic create-if-absent (any
  * racer computes identical content), and a crash that skips one only
  * lengthens replay until the next multiple.
  *
  * At 100 TB the mechanism is unchanged — manifests are delta-sized
  * and the atomic create maps onto whatever the store offers
  * (HDFS rename-if-absent, S3 conditional PUT, a DynamoDB/JDBC lock
  * row); this implementation targets a POSIX filesystem, which is what
  * the fixtures and CI use.
  */
object CommitLog {
  import java.nio.file.{Files, Path, Paths}

  final case class Commit(version: Int, attempts: Int)

  /** Full-snapshot cadence: replay cost is bounded by one checkpoint
    * read + at most this many delta manifests. Delta Lake's default
    * cadence is 10; 8 keeps the spec's 8-way race crossing a boundary. */
  private[graft] val checkpointInterval = 8

  private def manifest(root: String, v: Int): Path =
    Paths.get(root, "_log", s"v$v.json")

  private def ckptPath(root: String, v: Int): Path =
    Paths.get(root, "_log", s"ckpt-v$v.json")

  /** Highest committed version; 0 = empty table (no manifests). */
  def latestVersion(root: String): Int = {
    import scala.jdk.CollectionConverters._
    val log = Paths.get(root, "_log")
    if (!Files.isDirectory(log)) return 0
    val it = Files.list(log)
    try it.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case VersionName(v) => v }
      .foldLeft(0)(math.max)
    finally it.close()
  }

  private object VersionName {
    private val Re = "v(\\d+)\\.json".r
    def unapply(name: String): Option[Int] = name match {
      case Re(d) => Some(d.toInt)
      case _ => None
    }
  }

  /** Everything one checkpoint+delta replay derives at version `v`:
    * the live batch list plus the accumulated stats boxes, blooms and
    * partition tuples of those batches. Callers needing more than one
    * facet (the connector's pruned scan needs all of them) pay ONE
    * replay — each manifest's bytes are read once and all fields
    * parsed from that one string. */
  final case class Snapshot(
      files: Seq[String], stats: Stats, blooms: Blooms,
      parts: Parts = Map.empty, rows: Rows = Map.empty)

  def snapshotAt(root: String, v: Int): Snapshot = {
    if (v == 0) return Snapshot(Nil, Map.empty, Map.empty)
    val (start, baseFiles) =
      latestCheckpointAtOrBelow(root, v).getOrElse((0, Seq.empty[String]))
    var state = baseFiles
    // one read of the checkpoint's bytes serves all four facet parses
    val ckptTxt = if (start == 0) "" else textOf(ckptPath(root, start))
    var stats: Stats =
      if (start == 0) Map.empty else parseStats(listField(ckptTxt, "stats"))
    var blooms: Blooms =
      if (start == 0) Map.empty else parseBlooms(listField(ckptTxt, "bloom"))
    var parts: Parts =
      if (start == 0) Map.empty else parseParts(listField(ckptTxt, "parts"))
    var rows: Rows =
      if (start == 0) Map.empty else parseRows(listField(ckptTxt, "rows"))
    ((start + 1) to v).foreach { i =>
      val txt = textOf(manifest(root, i))
      val add = parseList(extractField(txt, "add"))
      val remove = parseList(extractField(txt, "remove"))
      val rm = remove.toSet
      val kept = state.filterNot(rm)
      // dedupe on replay: a manifest re-adding a name already in the
      // snapshot (possible only in logs written before commit() rejected
      // duplicates) must not double-list the batch — a duplicate entry
      // double-counts every row in it on read
      val keptSet = kept.toSet
      state = kept ++ add.filterNot(keptSet)
      stats = (stats -- remove) ++
        parseStats(listField(txt, "stats")).filter { case (b, _) => add.contains(b) }
      blooms = (blooms -- remove) ++
        parseBlooms(listField(txt, "bloom")).filter { case (b, _) => add.contains(b) }
      parts = (parts -- remove) ++
        parseParts(listField(txt, "parts")).filter { case (b, _) => add.contains(b) }
      rows = (rows -- remove) ++
        parseRows(listField(txt, "rows")).filter { case (b, _) => add.contains(b) }
    }
    val live = state.toSet
    Snapshot(state,
      stats.filter { case (b, _) => live(b) },
      blooms.filter { case (b, _) => live(b) },
      parts.filter { case (b, _) => live(b) },
      rows.filter { case (b, _) => live(b) })
  }

  /** Files-only replay for metadata hot paths (the commit retry loop's
    * conflict check, vacuum's live-set scan): same add/remove fold as
    * [[snapshotAt]] without parsing the stats boxes and bloom hex
    * blobs those callers immediately discard — on a bloom-heavy table
    * that parse is the dominant cost of every retry. */
  private def filesAt(root: String, v: Int): Seq[String] = {
    if (v == 0) return Nil
    val (start, baseFiles) =
      latestCheckpointAtOrBelow(root, v).getOrElse((0, Seq.empty[String]))
    var state = baseFiles
    ((start + 1) to v).foreach { i =>
      val txt = textOf(manifest(root, i))
      val add = parseList(extractField(txt, "add"))
      val rm = parseList(extractField(txt, "remove")).toSet
      val kept = state.filterNot(rm)
      val keptSet = kept.toSet
      state = kept ++ add.filterNot(keptSet)
    }
    state
  }

  private def textOf(p: Path): String =
    new String(Files.readAllBytes(p), "UTF-8")

  /** The `[...]` list of `name` out of already-read manifest text, or
    * Nil when absent (optional fields). */
  private def listField(txt: String, name: String): Seq[String] =
    if (txt.contains("\"" + name + "\":")) parseList(extractField(txt, name))
    else Nil

  /** The batch names visible at version `v` (v0 = empty table):
    * nearest checkpoint at or below `v`, plus forward delta replay.
    * Reads of expired versions fail cleanly — their delta chain back
    * to a surviving checkpoint is broken, and the replay surfaces the
    * missing manifest as NoSuchFileException. */
  def files(root: String, v: Int): Seq[String] = filesAt(root, v)

  /** Resolve a manifest batch name to its data directory: local names
    * live under the table root; `@/abs/dir` external references
    * (shallow clone) resolve to the referenced directory verbatim.
    * Every reader resolves through here; writers only ever create
    * LOCAL batches, so a clone localizes incrementally as COW verbs
    * rewrite its referenced data. */
  def batchPath(root: String, name: String): String =
    if (name.startsWith("@")) name.drop(1) else s"$root/$name"

  /** SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW CLONE src`): make
    * `targetRoot` a new table whose v1 manifest REFERENCES the source's
    * data files at `version` (default latest) — a metadata-sized
    * commit, zero bytes copied. Schema, per-batch stats boxes, blooms,
    * and CHECK constraints in force all carry over, so manifest
    * pruning and constraint enforcement work on the clone from birth;
    * history and txn watermarks do NOT (the clone is a new table with
    * its own lineage, audited as op=CLONE).
    *
    * After the clone, the two tables are INDEPENDENT: writes to either
    * never touch the other. Clone-side rewrites (MERGE/DELETE/UPDATE/
    * OPTIMIZE) replace external references with local batches —
    * incremental localization — and clone-side vacuum only ever sweeps
    * LOCAL directories, so it can never delete source data. The one
    * cross-table hazard is Delta's own: vacuuming the SOURCE deletes
    * files a clone still references — retain source history for as
    * long as clones of it live.
    *
    * The source must be DV-free at `version` (compact first): a `dv-`
    * batch's semantics ride its name prefix, which an external
    * reference does not preserve. */
  def cloneTable(sourceRoot: String, targetRoot: String,
      version: Int = -1): Commit = {
    val src = Paths.get(sourceRoot).toAbsolutePath.normalize.toString
    val v = if (version < 0) latestVersion(src) else version
    require(v >= 1, s"cannot clone empty table $src")
    val snap = snapshotAt(src, v)
    require(!snap.files.exists(_.startsWith("dv-")),
      s"cannot shallow-clone $src at v$v: outstanding deletion vectors " +
        "— run a COW merge or compaction first")
    require(latestVersion(targetRoot) == 0,
      s"clone target $targetRoot is not an empty table")
    def ext(n: String): String =
      if (n.startsWith("@")) n else s"@$src/$n" // clone-of-clone: keep refs
    val added = snap.files.map(ext)
    commit(targetRoot, 0, added = added,
      schema = schemaOf(src, v),
      stats = snap.stats.map { case (n, box) => ext(n) -> box },
      blooms = snap.blooms.map { case (n, bs) => ext(n) -> bs },
      constraints = constraintsOf(src, v),
      props = tblPropsOf(src, v).map { case (k, p) => k -> Some(p) },
      // renamed/dropped-name state must ride along: the referenced
      // files answer through the source's name chains, and reserved
      // names stay reserved on the clone
      colMap = formerNamesOf(src, v),
      droppedCols = droppedOf(src, v),
      // partition layout rides along: the clone prunes and
      // partition-overwrites from birth like its source
      parts = snap.parts.map { case (n, tuple) => ext(n) -> tuple },
      partCols = partColsOf(src, v),
      rows = snap.rows.map { case (n, c) => ext(n) -> c },
      op = Some("CLONE"))
  }

  private object CkptName {
    private val Re = "ckpt-v(\\d+)\\.json".r
    def unapply(name: String): Option[Int] = name match {
      case Re(d) => Some(d.toInt)
      case _ => None
    }
  }

  private def latestCheckpointAtOrBelow(
      root: String, v: Int): Option[(Int, Seq[String])] = {
    val log = Paths.get(root, "_log")
    if (!Files.isDirectory(log)) return None
    val candidates = listDir(log)
      .map(_.getFileName.toString)
      .collect { case CkptName(cv) if cv <= v => cv }
    if (candidates.isEmpty) None
    else {
      val cv = candidates.max
      val txt = new String(Files.readAllBytes(ckptPath(root, cv)), "UTF-8")
      Some((cv, parseList(extractField(txt, "files"))))
    }
  }

  /** Whether the commit at `v` changed table CONTENT (the Delta
    * `dataChange` flag): true for appends/deletes/merges, false for a
    * layout-only rewrite (compaction, clustering) whose add/remove
    * sets restate exactly the same rows. Incremental consumers skip
    * dataChange=false commits — that is the whole point of the flag. */
  def isDataChange(root: String, v: Int): Boolean =
    !textOf(manifest(root, v)).contains("\"dataChange\":false")

  /** The table schema in force at version `v` (None = never declared).
    * Schema is versioned state exactly like the file set: a manifest
    * that changed it carries the new DDL, checkpoints snapshot the
    * DDL in force, and reconstruction is the same
    * nearest-checkpoint-plus-replay walk — so time travel reads OLD
    * versions under their OLD schema, and vacuum preserves the schema
    * through the cutoff checkpoint. */
  def schemaOf(root: String, v: Int): Option[String] = {
    if (v == 0) return None
    val (start, base) =
      latestCheckpointAtOrBelow(root, v).map { case (cv, _) =>
        (cv, readSchemaField(ckptPath(root, cv)))
      }.getOrElse((0, None))
    ((start + 1) to v).foldLeft(base) { (cur, i) =>
      readSchemaField(manifest(root, i)).orElse(cur)
    }
  }

  private def readSchemaField(p: Path): Option[String] =
    readStringField(p, "schema")

  /** Thrown when a commit declares a schema the current one cannot
    * evolve to (dropped column or changed type — additive nullable
    * columns are the only permitted evolution, the Delta mergeSchema
    * contract). */
  final class SchemaChangeException(msg: String)
    extends IllegalArgumentException(msg)

  /** Additive evolution check: every current field must survive in
    * `next` with the same type; new fields may only be appended. */
  /** The declared DDL owns each existing column's NULLABILITY — a
    * write's plan schema (all-NOT-NULL under a VALUES of literals)
    * keeps the declaration's flag. A genuinely NEW column is forced
    * NULLABLE: additive evolution null-fills it in every
    * pre-evolution file, so recording a plan's NOT NULL would both
    * lie about the data and make later inserts that omit the column
    * fail analysis. */
  private[sources] def alignNullability(cur: String, next: String): String = {
    import org.apache.spark.sql.types.StructType
    val curNull = StructType.fromDDL(cur).fields
      .map(f => f.name -> f.nullable).toMap
    val nextF = StructType.fromDDL(next).fields
    // already aligned: keep the caller's DDL string VERBATIM (callers
    // and replay models compare recorded strings, not parsed shapes)
    if (nextF.forall(f => curNull.get(f.name).getOrElse(true) == f.nullable))
      next
    else StructType(nextF.map { f =>
      curNull.get(f.name) match {
        case Some(n) if n != f.nullable => f.copy(nullable = n)
        case None if !f.nullable => f.copy(nullable = true)
        case _ => f
      }
    }).toDDL
  }

  private def checkEvolution(cur: String, next: String): Unit = {
    import org.apache.spark.sql.types.StructType
    val curF = StructType.fromDDL(cur).fields.map(f => f.name -> f.dataType).toMap
    val nextF = StructType.fromDDL(next).fields.map(f => f.name -> f.dataType).toMap
    val dropped = curF.keySet -- nextF.keySet
    if (dropped.nonEmpty)
      throw new SchemaChangeException(
        s"schema change drops columns ${dropped.mkString(",")} — " +
          "rewrite the table instead of evolving it")
    val retyped = curF.collect {
      case (n, t) if nextF(n) != t => s"$n: $t -> ${nextF(n)}"
    }
    if (retyped.nonEmpty)
      throw new SchemaChangeException(
        s"schema change retypes ${retyped.mkString("; ")} — " +
          "only additive nullable columns may evolve")
  }

  /** A WIDEN commit may retype along [[Widenings]] and change nothing
    * else — the deliberate-verb discipline DROP and RENAME follow:
    * a plain write can never retype implicitly. */
  private def checkWiden(cur: String, next: String): Unit = {
    import org.apache.spark.sql.types.StructType
    val curF = StructType.fromDDL(cur).fields
    val nextF = StructType.fromDDL(next).fields
    if (curF.map(_.name).toSeq != nextF.map(_.name).toSeq)
      throw new SchemaChangeException(
        "a WIDEN commit must keep every column name and position")
    curF.zip(nextF).foreach { case (c, n) =>
      if (c.dataType != n.dataType && !Widenings.contains((c.dataType, n.dataType)))
        throw new SchemaChangeException(
          s"WIDEN retypes ${c.name}: ${c.dataType.simpleString} -> " +
            s"${n.dataType.simpleString}, which is off the widening ladder")
    }
  }

  /** A NULLABILITY commit may flip column NOT NULL flags and change
    * nothing else — the deliberate-verb discipline WIDEN/DROP/RENAME
    * follow. [[alignNullability]] launders plain writes' plan-schema
    * nullability back to the declaration precisely so that ONLY this
    * verb (and catalog CREATE TABLE) can put a NOT NULL on record. */
  private def checkNullabilityOnly(cur: String, next: String): Unit = {
    import org.apache.spark.sql.types.StructType
    val curF = StructType.fromDDL(cur).fields
    val nextF = StructType.fromDDL(next).fields
    if (curF.map(_.name).toSeq != nextF.map(_.name).toSeq)
      throw new SchemaChangeException(
        "a NULLABILITY commit must keep every column name and position")
    curF.zip(nextF).foreach { case (c, n) =>
      if (c.dataType != n.dataType)
        throw new SchemaChangeException(
          s"a NULLABILITY commit retypes ${c.name}: " +
            s"${c.dataType.simpleString} -> ${n.dataType.simpleString}")
    }
  }

  /** Pull the `[...]` value of `"name":` out of a flat one-level JSON
    * object (the only shape this log writes). */
  private def extractField(txt: String, name: String): String = {
    val key = "\"" + name + "\":"
    val i = txt.indexOf(key)
    require(i >= 0, s"manifest missing field $name: $txt")
    val from = txt.indexOf('[', i + key.length)
    val to = txt.indexOf(']', from)
    txt.substring(from, to + 1)
  }

  private def parseList(txt: String): Seq[String] = {
    val body = txt.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Nil
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private def renderList(files: Seq[String]): String =
    files.map(f => "\"" + f + "\"").mkString("[", ",", "]")

  /** Atomic create-if-absent publish: content is fully durable before
    * the name appears (write temp, then hard-link — `link(2)` fails
    * with EEXIST if a rival won), so a concurrent reader can never
    * observe a partial file. True iff this call created the name. */
  private def atomicCreate(target: Path, content: String): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s"_tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content.getBytes("UTF-8"))
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Atomically publish the DELTA manifest for `v` — true iff this
    * call won the version. `schema` is recorded only by the commit
    * that changes it (O(delta) applies to schema metadata too). */
  /** Batch names must survive the flat manifest encoding (naive
    * quote-wrap + comma-split) and the vacuum sweep's top-level-entry
    * scan: a name with a ',' or '"' would replay as the WRONG file
    * set — and vacuum would then sweep the real on-disk directory as
    * an orphan (silent data loss). Rejecting at publish time keeps
    * the failure loud and local to the bad writer. */
  private def requireValidNames(names: Seq[String]): Unit = {
    names.foreach { n =>
      val local = n.nonEmpty && !n.exists(",\"[]\\".contains(_)) &&
        !n.startsWith("_") && !n.startsWith(".") && !n.contains('/')
      // external batch REFERENCE (shallow clone): '@' + absolute dir.
      // No '..' segments — a reference must name its directory plainly,
      // never traverse; resolution is [[batchPath]].
      val external = n.startsWith("@/") && n.length > 2 &&
        !n.exists(",\"[]\\".contains(_)) &&
        !n.substring(1).split("/").contains("..")
      require(local || external,
        s"invalid batch name '$n': must be non-empty, contain none of " +
          ", \" [ ] \\ /, and not start with _ or . — or be an external " +
          "reference '@/absolute/dir' with no '..' segments")
    }
    // a duplicate within ONE manifest's own list would double-list on
    // replay (files()'s dedupe only filters adds already in the prior
    // snapshot) — reject at publish, for direct tryCommit callers too
    require(names.distinct == names,
      s"duplicate batch names within one manifest list: $names")
  }

  def tryCommit(
      root: String, v: Int,
      added: Seq[String], removed: Seq[String],
      schema: Option[String] = None,
      stats: Stats = Map.empty,
      txn: Option[(String, Long)] = None,
      dataChange: Boolean = true,
      op: Option[String] = None,
      blooms: Blooms = Map.empty,
      constraints: Constraints = Map.empty,
      colMap: ColMap = Map.empty,
      droppedCols: Seq[String] = Nil,
      parts: Parts = Map.empty,
      partCols: Seq[String] = Nil,
      rows: Rows = Map.empty,
      defaults: Map[String, Option[(String, String)]] = Map.empty,
      props: Map[String, Option[String]] = Map.empty,
      changeFiles: Option[Boolean] = None): Boolean = {
    requireValidNames(added); requireValidNames(removed)
    requireValidProps(props)
    requireValidStats(stats, added)
    requireValidBlooms(blooms, added)
    requireValidParts(parts, added)
    requireValidRows(rows, added)
    requireValidDefaults(defaults)
    partCols.foreach(c => require(
      c.nonEmpty && !c.exists(",\"[]\\|".contains(_)),
      s"partition column name '$c' must be non-empty and grammar-safe"))
    requireValidConstraints(constraints)
    requireValidColMap(colMap)
    requireValidTxn(txn)
    // a version beyond latest+1 would publish a manifest with a HOLE
    // below it — every later replay of the skipped version dies on the
    // missing file. (Racers legitimately aim at latest+1 and lose;
    // nothing legitimately aims higher.)
    require(v <= latestVersion(root) + 1,
      s"cannot publish v$v of $root: latest is v${latestVersion(root)} — " +
        "a gap in the version sequence would break every replay across it")
    requireValidDataChange(dataChange, added, removed, schema)
    op.foreach(o => require(o.nonEmpty && !o.exists("\",[]\\".contains(_)),
      s"operation label '$o' must be non-empty and quote/bracket-free"))
    schema.foreach(s => require(!s.contains('"'),
      "schema DDL must not contain double quotes"))
    val schemaField = schema.map(s => s""","schema":"$s"""").getOrElse("")
    val statsField =
      if (stats.isEmpty) ""
      else s""","stats":${renderList(renderStats(stats))}"""
    val txnField = txn.map { case (app, epoch) =>
      s""","txn":${renderList(Seq(s"$app|$epoch"))}"""
    }.getOrElse("")
    val dcField = if (dataChange) "" else ""","dataChange":false"""
    val opField = op.map(o => s""","operation":"$o"""").getOrElse("")
    val bloomField =
      if (blooms.isEmpty) ""
      else s""","bloom":${renderList(renderBlooms(blooms))}"""
    val consField =
      if (constraints.isEmpty) ""
      else s""","constraint":${renderList(renderConstraints(constraints))}"""
    val colMapField =
      if (colMap.isEmpty) ""
      else s""","colmap":${renderList(renderColMap(colMap))}"""
    droppedCols.foreach(n => require(
      n.nonEmpty && !n.exists(",\"[]\\".contains(_)),
      s"dropped-column name '$n' must be non-empty and grammar-safe"))
    val droppedField =
      if (droppedCols.isEmpty) ""
      else s""","dropped":${renderList(droppedCols)}"""
    val partsField =
      if (parts.isEmpty) ""
      else s""","parts":${renderList(renderParts(parts))}"""
    val partColsField =
      if (partCols.isEmpty) ""
      else s""","partcols":${renderList(partCols)}"""
    val rowsField =
      if (rows.isEmpty) ""
      else s""","rows":${renderList(renderRows(rows))}"""
    val defaultsField =
      if (defaults.isEmpty) ""
      else s""","default":${renderList(renderDefaults(defaults))}"""
    val propsField =
      if (props.isEmpty) ""
      else s""","tblprops":${renderList(renderProps(props))}"""
    // tri-state on purpose: Some records whether this version PROMOTED
    // materialized change rows (_changes/v<N>); None (legacy writers,
    // non-row-level verbs) leaves readers to their listing fallback
    val chgField =
      changeFiles.map(p => s""","changeFiles":$p""").getOrElse("")
    atomicCreate(manifest(root, v),
      s"""{"add":${renderList(added)},"remove":${renderList(removed)}$schemaField$statsField$txnField$dcField$opField$bloomField$consField$colMapField$droppedField$partsField$partColsField$rowsField$defaultsField$propsField$chgField}""")
  }

  /** A dataChange=false commit promises its add/remove sets restate
    * the same rows — only a REWRITE (both sides non-empty, no schema
    * edit) can keep that promise; an append or delete flagged
    * layout-only would silently drop rows from every tail. */
  private def requireValidDataChange(
      dataChange: Boolean, added: Seq[String], removed: Seq[String],
      schema: Option[String]): Unit =
    if (!dataChange) {
      require(added.nonEmpty && removed.nonEmpty,
        "dataChange=false requires a rewrite commit (non-empty add AND " +
          "remove): appends and deletes always change content")
      require(schema.isEmpty,
        "dataChange=false cannot carry a schema change")
    }

  // ---- STATS-IN-MANIFEST: per-batch numeric (min, max) boxes ----
  //
  // The Delta/Iceberg design S15's side table approximates: pruning
  // stats ride the COMMIT METADATA, so predicate planning intersects
  // boxes already in hand from snapshot replay — ZERO extra reads (S15
  // pays one side-table read; a footer-based planner pays one open per
  // file, a million opens at 100 TB). Stats are delta-sized like
  // everything else in a manifest: each commit records boxes only for
  // the batches IT adds; checkpoints snapshot the accumulated boxes of
  // surviving batches so replay stays bounded. Encoding is flat
  // ("batch|col|min|max" or, since r15, "batch|col|min|max|nulls"
  // strings in the manifest's list grammar); a batch committed without
  // stats simply never prunes (unknown = keep).

  /** Per-(batch, column) manifest statistics: the numeric (lo, hi)
    * pruning box, an optional EXACT NULL COUNT (r15), and optional
    * STRING BOUNDS (r15) — truncated byte-lexicographic min/max of a
    * string column's UTF-8 bytes (hex in the grammar; Spark's
    * UTF8String and DuckDB both compare binary UTF-8, so the bounds
    * prune string ranges, equality and `LIKE 'prefix%'` exactly like
    * numeric boxes do). Truncation keeps bounds SOUND: the stored
    * lower is a byte-prefix of the true min (≤ it), the stored upper
    * is byte-incremented past the true max when cut (see
    * [[CommitLogWrite]]); a bound shorter than [[ColStat.StrCap]]
    * bytes is EXACT (metadata MIN/MAX may serve it).
    *
    * An entry may be UNBOXED (`lo > hi` — no boxable non-null numeric
    * value) when it carries a null count or string bounds;
    * [[ColStat.box]] is the numeric facet, None when unboxed. */
  final case class ColStat(lo: Double, hi: Double, nulls: Option[Long] = None,
      strLo: Option[Array[Byte]] = None, strHi: Option[Array[Byte]] = None,
      ndv: Option[Array[Byte]] = None, sum: Option[Long] = None) {
    def boxed: Boolean = lo <= hi
    def box: Option[(Double, Double)] = if (boxed) Some((lo, hi)) else None
    // case-class equality on Array fields is reference equality —
    // compare by value so stats round-trip comparisons behave
    override def equals(o: Any): Boolean = o match {
      case s: ColStat =>
        lo == s.lo && hi == s.hi && nulls == s.nulls &&
          strLo.map(_.toSeq) == s.strLo.map(_.toSeq) &&
          strHi.map(_.toSeq) == s.strHi.map(_.toSeq) &&
          ndv.map(_.toSeq) == s.ndv.map(_.toSeq) &&
          sum == s.sum
      case _ => false
    }
    override def hashCode(): Int =
      (lo, hi, nulls, strLo.map(_.toSeq), strHi.map(_.toSeq),
        ndv.map(_.toSeq), sum).hashCode()
    override def toString: String =
      s"ColStat($lo,$hi,$nulls," +
        s"${strLo.map(b => new String(b, "UTF-8"))}," +
        s"${strHi.map(b => new String(b, "UTF-8"))}," +
        s"ndv=${ndv.isDefined},sum=$sum)"
  }
  object ColStat {
    /** Byte cap for stored string bounds (Iceberg truncates at 16;
      * 32 keeps most real keys exact while bounding manifest size). */
    val StrCap = 32
    def boxOnly(lo: Double, hi: Double): ColStat = ColStat(lo, hi, None)
  }

  /** batch -> column -> [[ColStat]]. */
  type Stats = Map[String, Map[String, ColStat]]

  private def requireValidStats(stats: Stats, added: Seq[String]): Unit = {
    val addedSet = added.toSet
    stats.foreach { case (b, cols) =>
      require(addedSet(b),
        s"stats declared for '$b', which this commit does not add")
      cols.foreach { case (c, st) =>
        require(!b.contains('|') && !c.exists(",\"[]\\|".contains(_)),
          s"stats names must not contain | , \" [ ] \\ : '$b'.'$c'")
        require(!st.lo.isNaN && !st.hi.isNaN,
          s"invalid stats box for '$b'.'$c': [${st.lo}, ${st.hi}]")
        // an unboxed entry exists only to carry null counts or bounds
        require(st.boxed || st.nulls.isDefined || st.strLo.isDefined,
          s"unboxed stats entry without a null count: '$b'.'$c'")
        require(st.nulls.forall(_ >= 0L),
          s"negative null count for '$b'.'$c': ${st.nulls.get}")
        require(st.strLo.isDefined == st.strHi.isDefined,
          s"string bounds must come in pairs: '$b'.'$c'")
        require(st.strLo.forall(_.length <= ColStat.StrCap) &&
          st.strHi.forall(_.length <= ColStat.StrCap),
          s"string bound over ${ColStat.StrCap} bytes: '$b'.'$c'")
        require(st.ndv.forall(_.length == CommitLogNdv.M),
          s"ndv sketch must be ${CommitLogNdv.M} registers: '$b'.'$c'")
      }
    }
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def renderStats(stats: Stats): Seq[String] =
    stats.toSeq.sortBy(_._1).flatMap { case (b, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, st) =>
        val base = s"$b|$c|${st.lo}|${st.hi}"
        (st.nulls, st.strLo, st.strHi, st.ndv, st.sum) match {
          case (None, None, None, None, None) => base
          case (n, None, None, None, None) => s"$base|${n.getOrElse("")}"
          // string bounds require the nulls slot (empty if unknown)
          case (n, Some(slo), Some(shi), None, None) =>
            s"$base|${n.map(_.toString).getOrElse("")}|${hex(slo)}|${hex(shi)}"
          // the ndv sketch requires all slots; ABSENT string bounds
          // render as `-` — an empty hex string is a legal (empty)
          // bound, so emptiness cannot mean absence in fields 6/7
          case (n, slo, shi, Some(nd), None) if slo.isDefined == shi.isDefined =>
            s"$base|${n.map(_.toString).getOrElse("")}" +
              s"|${slo.map(hex).getOrElse("-")}" +
              s"|${shi.map(hex).getOrElse("-")}|${hex(nd)}"
          // the exact sum (field 9) requires all slots; an absent ndv
          // renders as the empty string (its own absence form)
          case (n, slo, shi, nd, Some(sm)) if slo.isDefined == shi.isDefined =>
            s"$base|${n.map(_.toString).getOrElse("")}" +
              s"|${slo.map(hex).getOrElse("-")}" +
              s"|${shi.map(hex).getOrElse("-")}" +
              s"|${nd.map(hex).getOrElse("")}|$sm"
          case other =>
            throw new IllegalStateException(s"unrenderable stat: $other")
        }
      }
    }

  private def parseStats(entries: Seq[String]): Stats =
    // limit -1 keeps TRAILING empty fields (an empty-string bound is
    // legal: hex("") = "", and plain split would collapse the arity)
    entries.map(_.split("\\|", -1)).collect {
      case Array(b, c, lo, hi) =>
        (b, c, ColStat(lo.toDouble, hi.toDouble))
      case Array(b, c, lo, hi, n) =>
        // empty nulls slot is legal here too (renderStats' 5-field arm
        // emits n.getOrElse("")) — degrade to unknown, same as 7-field
        (b, c, ColStat(lo.toDouble, hi.toDouble,
          if (n.isEmpty) None else Some(n.toLong)))
      case Array(b, c, lo, hi, n, slo, shi) =>
        (b, c, ColStat(lo.toDouble, hi.toDouble,
          if (n.isEmpty) None else Some(n.toLong),
          Some(unhex(slo)), Some(unhex(shi))))
      case Array(b, c, lo, hi, n, slo, shi, nd) =>
        // 8-field arity: `-` marks ABSENT string bounds ("" stays a
        // legal empty bound); an empty ndv slot degrades to unknown
        (b, c, ColStat(lo.toDouble, hi.toDouble,
          if (n.isEmpty) None else Some(n.toLong),
          if (slo == "-") None else Some(unhex(slo)),
          if (shi == "-") None else Some(unhex(shi)),
          if (nd.isEmpty) None else Some(unhex(nd))))
      case Array(b, c, lo, hi, n, slo, shi, nd, sm) =>
        // 9-field arity adds the exact non-null sum (integral columns
        // only); an empty sum slot degrades to unknown like the rest
        (b, c, ColStat(lo.toDouble, hi.toDouble,
          if (n.isEmpty) None else Some(n.toLong),
          if (slo == "-") None else Some(unhex(slo)),
          if (shi == "-") None else Some(unhex(shi)),
          if (nd.isEmpty) None else Some(unhex(nd)),
          if (sm.isEmpty) None else Some(sm.toLong)))
    }.groupBy(_._1).map { case (b, rows) =>
      b -> rows.map(r => r._2 -> r._3).toMap
    }

  /** The accumulated stats boxes of the batches visible at `v` — one
    * facet of [[snapshotAt]]'s single replay, so planning cost is
    * manifest-sized metadata, never a data read. */
  def statsOf(root: String, v: Int): Stats = snapshotAt(root, v).stats

  /** MANIFEST-STATS PRUNING: the batches of snapshot `v` whose box for
    * `column` intersects [lo, hi] — plus every batch with no box for it
    * (unknown must be read). The caller still applies the exact
    * predicate; pruning is a fast path, never a correctness risk (the
    * S8 residual-filter contract, at file granularity). */
  def prunedFiles(
      root: String, v: Int, column: String,
      lo: Double, hi: Double): Seq[String] = {
    val snap = snapshotAt(root, v)
    snap.files.filter { b =>
      snap.stats.get(b).flatMap(_.get(column)).flatMap(_.box) match {
        case Some((bMin, bMax)) => bMax >= lo && bMin <= hi
        case None => true
      }
    }
  }

  // ---- ROW COUNTS-IN-MANIFEST: per-batch exact cardinality ----
  //
  // The third pruning-metadata modality (Delta's numRecords / Iceberg's
  // record_count): each commit may record the EXACT row count of every
  // batch it adds, delta-sized and checkpoint-snapshotted exactly like
  // the stats boxes. Two table-level payoffs, both metadata-only:
  //
  //  - '''planner statistics''' ([[CommitLogScan]] reports rowCount +
  //    sizeInBytes): Spark's join planning auto-broadcasts a small
  //    commitlog table with no hint — at 100 TB the difference between
  //    a broadcast hash join and an accidental 100 TB shuffle;
  //  - '''aggregate pushdown''': an unfiltered COUNT(*) answers from
  //    the manifest in ZERO data reads (the snapshot replay the plan
  //    already paid), MIN/MAX from the stats boxes where provably
  //    exact.
  //
  // Counts are committed only where the writer KNOWS them (the sink
  // counts rows as they stream through; OPTIMIZE unions its sources'
  // counts — a layout rewrite restates exactly the same rows); a batch
  // without a count never lies, it just reports "unknown", and any
  // metadata answer requires EVERY live batch to carry one.

  /** batch -> exact row count. */
  type Rows = Map[String, Long]

  private def requireValidRows(rows: Rows, added: Seq[String]): Unit = {
    val addedSet = added.toSet
    rows.foreach { case (b, n) =>
      require(addedSet(b),
        s"row count declared for '$b', which this commit does not add")
      require(!b.contains('|'), s"row-count batch name must not contain |: '$b'")
      require(n >= 0, s"negative row count for '$b': $n")
    }
  }

  private def renderRows(rows: Rows): Seq[String] =
    rows.toSeq.sortBy(_._1).map { case (b, n) => s"$b|$n" }

  private def parseRows(entries: Seq[String]): Rows =
    entries.map(_.split('|')).collect {
      case Array(b, n) => b -> n.toLong
    }.toMap

  /** The exact row counts of the batches visible at `v` — one facet of
    * [[snapshotAt]]'s single replay. Batches without a recorded count
    * are absent from the map (unknown, never zero). */
  def rowsOf(root: String, v: Int): Rows = snapshotAt(root, v).rows

  // ---- BLOOMS-IN-MANIFEST: per-batch membership filters ----
  //
  // The point-lookup twin of the stats boxes (see [[CommitLogBloom]]):
  // each commit may record a hex-encoded bloom per (added batch,
  // string column); replay, checkpointing, vacuum survival and the
  // added-batches-only rule are identical to stats. A batch without a
  // bloom for a probed column is always read (unknown = keep).

  /** batch -> column -> hex-encoded bloom bitset. */
  type Blooms = Map[String, Map[String, String]]

  private def requireValidBlooms(blooms: Blooms, added: Seq[String]): Unit = {
    val addedSet = added.toSet
    blooms.foreach { case (b, cols) =>
      require(addedSet(b),
        s"bloom declared for '$b', which this commit does not add")
      cols.foreach { case (c, hex) =>
        require(!b.contains('|') && !c.exists(",\"[]\\|".contains(_)),
          s"bloom names must not contain | , \" [ ] \\ : '$b'.'$c'")
        require(hex.nonEmpty && hex.length % 16 == 0 &&
            hex.forall(ch => ch.isDigit || (ch >= 'a' && ch <= 'f')),
          s"bloom for '$b'.'$c' must be non-empty lowercase hex, 16-aligned")
      }
    }
  }

  private def renderBlooms(blooms: Blooms): Seq[String] =
    blooms.toSeq.sortBy(_._1).flatMap { case (b, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, hex) => s"$b|$c|$hex" }
    }

  private def parseBlooms(entries: Seq[String]): Blooms =
    entries.map(_.split('|')).collect {
      case Array(b, c, hex) => (b, c, hex)
    }.groupBy(_._1).map { case (b, rows) =>
      b -> rows.map(r => r._2 -> r._3).toMap
    }

  /** The accumulated blooms of the batches visible at `v` — one facet
    * of [[snapshotAt]]'s single replay. */
  def bloomsOf(root: String, v: Int): Blooms = snapshotAt(root, v).blooms

  // ---- PARTITIONS-IN-MANIFEST: per-batch partition tuples ----
  //
  // The Delta/Iceberg partition design at batch granularity: a
  // partitioned table declares identity partition COLUMNS once
  // (`partcols`, versioned like schema), and every partitioned write
  // lands ONE BATCH PER PARTITION TUPLE, recording the tuple in the
  // commit manifest. Planning then prunes EXACTLY — any deterministic
  // predicate over partition columns evaluates to a definite
  // true/false against a single tuple value, which is what min/max
  // boxes (ranges only, numerics only) and blooms (membership only,
  // false positives) cannot give. Partition tuples are also what make
  // partition-level verbs METADATA-ONLY: dynamic partition overwrite
  // and partition-aligned replaceWhere drop whole batches from the
  // manifest without reading a byte. Values are base64-wrapped in the
  // flat grammar ('n' = the null partition); a batch without a
  // recorded tuple (an engine rewrite) is simply never partition-pruned
  // — unknown = keep, the residual-filter contract.

  /** batch -> partition column -> value ('n' = null, else 'v'+base64
    * of the value's string form — Long/Int/Double/Boolean/String as
    * written, timestamps as micros, dates as epoch days). */
  type Parts = Map[String, Map[String, String]]

  /** Encode one partition value for the manifest grammar. URL-safe
    * base64 (no '/', '+'): the same token doubles as a file-name and
    * batch-name segment in the partitioned sink. */
  def partToken(v: Option[String]): String =
    v.map(s => "v" + java.util.Base64.getUrlEncoder
      .encodeToString(s.getBytes("UTF-8")).replace("=", "")).getOrElse("n")

  /** Decode a manifest partition token back to its value. */
  def partValue(token: String): Option[String] =
    if (token == "n") None
    else Some(new String(
      java.util.Base64.getUrlDecoder.decode(token.drop(1)), "UTF-8"))

  private def requireValidParts(parts: Parts, added: Seq[String]): Unit = {
    val addedSet = added.toSet
    parts.foreach { case (b, cols) =>
      require(addedSet(b),
        s"partition tuple declared for '$b', which this commit does not add")
      require(cols.nonEmpty, s"empty partition tuple for '$b'")
      cols.foreach { case (c, tok) =>
        require(!b.contains('|') && !c.exists(",\"[]\\|".contains(_)),
          s"partition names must not contain | , \" [ ] \\ : '$b'.'$c'")
        require(tok == "n" || (tok.startsWith("v") &&
            !tok.exists(",\"[]\\|".contains(_))),
          s"invalid partition token for '$b'.'$c': $tok")
      }
    }
  }

  private def renderParts(parts: Parts): Seq[String] =
    parts.toSeq.sortBy(_._1).flatMap { case (b, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, tok) => s"$b|$c|$tok" }
    }

  private def parseParts(entries: Seq[String]): Parts =
    entries.map(_.split('|')).collect {
      case Array(b, c, tok) => (b, c, tok)
    }.groupBy(_._1).map { case (b, rows) =>
      b -> rows.map(r => r._2 -> r._3).toMap
    }

  /** The partition tuples of the batches visible at `v` — one facet of
    * [[snapshotAt]]'s single replay. */
  def partsOf(root: String, v: Int): Parts = snapshotAt(root, v).parts

  /** The identity partition COLUMNS in force at `v` (empty = table is
    * unpartitioned). Versioned exactly like schema — nearest checkpoint
    * plus forward replay — but IMMUTABLE once declared on a non-empty
    * table: re-partitioning existing batches would strand their
    * recorded tuples. Declare at CREATE. */
  def partColsOf(root: String, v: Int): Seq[String] = {
    if (v == 0) return Nil
    val (start, base) =
      latestCheckpointAtOrBelow(root, v).map { case (cv, _) =>
        (cv, listField(textOf(ckptPath(root, cv)), "partcols"))
      }.getOrElse((0, Nil))
    ((start + 1) to v).foldLeft(base) { (cur, i) =>
      val declared = listField(textOf(manifest(root, i)), "partcols")
      // the sentinel is EXPLICIT un-partitioning; an absent/empty
      // declaration inherits the spec in force (partition evolution
      // re-declares; ordinary commits declare nothing)
      if (declared == Seq(NoPartSentinel)) Nil
      else if (declared.nonEmpty) declared
      else cur
    }
  }

  // ---- CONSTRAINTS-IN-MANIFEST: log-governed CHECK invariants ----
  //
  // Delta's ADD CONSTRAINT: a named boolean SQL expression every row of
  // every FUTURE write must satisfy — enforced by the sink at publish
  // (one filter over the staged epoch, see CommitLogWrite) and
  // validated against EXISTING data when declared (addConstraint's
  // caller scans once). Constraint state is versioned like schema:
  // manifests record only the commit's own declarations, checkpoints
  // snapshot the set in force, vacuum preserves it. Expressions are
  // base64-wrapped in the flat grammar (SQL text is bracket/comma/
  // quote-hostile).

  /** name -> boolean SQL expression (over the table's columns). */
  type Constraints = Map[String, String]

  /** Thrown pre-publish when rows violate a CHECK constraint in force —
    * nothing staged becomes visible, no version is consumed. */
  final class ConstraintViolationException(
      val name: String, val expr: String, val violations: Long)
    extends IllegalStateException(
      s"CHECK constraint '$name' ($expr) violated by $violations row(s) " +
        "— nothing was committed")

  private def b64e(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64d(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private def requireValidConstraints(cs: Constraints): Unit =
    cs.foreach { case (n, expr) =>
      require(n.nonEmpty && !n.exists(",\"[]\\|".contains(_)),
        s"constraint name '$n' must be non-empty and grammar-safe")
      require(expr.nonEmpty, s"constraint '$n' needs an expression")
    }

  /** The expr value encoding a DROP CONSTRAINT tombstone: '-' is not
    * in the base64 alphabet, so the rendered `name|-` entry can never
    * collide with a real expression. */
  private[graft] val ConstraintTombstone = "-"

  private def renderConstraints(cs: Constraints): Seq[String] =
    cs.toSeq.sortBy(_._1).map {
      case (n, ConstraintTombstone) => s"$n|$ConstraintTombstone"
      case (n, e) => s"$n|${b64e(e)}"
    }

  private def parseConstraints(entries: Seq[String]): Constraints =
    entries.map(_.split('|')).collect {
      case Array(n, e) if e != ConstraintTombstone => n -> b64d(e)
    }.toMap

  /** Fold one manifest's constraint entries into the running state:
    * adds declare, tombstones retract. */
  private def foldConstraints(
      state: Constraints, entries: Seq[String]): Constraints =
    entries.foldLeft(state) { (s, entry) =>
      entry.split('|') match {
        case Array(n, ConstraintTombstone) => s - n
        case Array(n, e) => s + (n -> b64d(e))
        case _ => s
      }
    }

  /** The CHECK constraints in force at `v` — accumulated add-only over
    * the prefix (like txn watermarks: never dropped by data removals),
    * checkpoint-snapshotted so they survive vacuum. */
  // ---- COLUMN DEFAULTS-IN-MANIFEST ----
  //
  // SQL `CREATE TABLE … (c INT DEFAULT <expr>)`: Spark's analyzer
  // fills omitted INSERT columns from the CURRENT_DEFAULT metadata of
  // the table's schema, so the ENGINE's only job is to persist the
  // default expressions and hand them back on loadTable. They CANNOT
  // ride the DDL string (StructType.toDDL emits `DEFAULT <expr>`
  // clauses that fromDDL cannot parse — a stored DDL with one would
  // brick every later read), so they are their own manifest facet,
  // versioned exactly like CHECK constraints: entries accumulate,
  // tombstones retract (DROP COLUMN, REPLACE TABLE), checkpoints
  // snapshot the set in force. Values are (current, exists) SQL-text
  // pairs, base64 in the flat grammar — CURRENT_DEFAULT is what new
  // INSERTs evaluate, EXISTS_DEFAULT the frozen fold Spark computed at
  // declaration.

  /** col -> (CURRENT_DEFAULT sql, EXISTS_DEFAULT sql), in force. */
  type Defaults = Map[String, (String, String)]

  private[graft] val DefaultTombstone = "-"

  private def requireValidDefaults(
      ds: Map[String, Option[(String, String)]]): Unit =
    ds.foreach { case (c, v) =>
      require(c.nonEmpty && !c.exists(",\"[]\\|".contains(_)),
        s"default column name '$c' must be non-empty and grammar-safe")
      v.foreach { case (cur, ex) =>
        require(cur.nonEmpty && ex.nonEmpty,
          s"default for '$c' needs non-empty expressions")
      }
    }

  private def renderDefaults(
      ds: Map[String, Option[(String, String)]]): Seq[String] =
    ds.toSeq.sortBy(_._1).map {
      case (c, None) => s"$c|$DefaultTombstone"
      case (c, Some((cur, ex))) => s"$c|${b64e(cur)}|${b64e(ex)}"
    }

  private def foldDefaults(state: Defaults, entries: Seq[String]): Defaults =
    entries.foldLeft(state) { (s, entry) =>
      entry.split('|') match {
        case Array(c, DefaultTombstone) => s - c
        case Array(c, cur, ex) => s + (c -> (b64d(cur), b64d(ex)))
        case _ => s
      }
    }

  // ---- TABLE PROPERTIES-IN-MANIFEST ----
  //
  // SQL `CREATE TABLE … TBLPROPERTIES('k'='v')` / `ALTER TABLE … SET
  // TBLPROPERTIES` / `UNSET TBLPROPERTIES` / `SHOW TBLPROPERTIES`:
  // user key-value metadata versioned exactly like CHECK constraints
  // and defaults — entries accumulate, an UNSET is a tombstone,
  // checkpoints snapshot the folded state, REPLACE TABLE and RESTORE
  // swap the whole set with the definition they install. Values ride
  // base64 so any string is storable; keys must be grammar-safe.

  /** User table properties in force (reserved catalog keys —
    * provider/location/owner — are NEVER stored here). */
  type TblProps = Map[String, String]

  private[graft] val PropTombstone = "-"

  private def requireValidProps(ps: Map[String, Option[String]]): Unit =
    ps.foreach { case (k, _) =>
      require(k.nonEmpty && !k.exists(",\"[]\\|".contains(_)),
        s"table property key '$k' must be non-empty and grammar-safe")
    }

  private def renderProps(ps: Map[String, Option[String]]): Seq[String] =
    ps.toSeq.sortBy(_._1).map {
      case (k, None) => s"$k|$PropTombstone"
      case (k, Some(v)) => s"$k|${b64e(v)}"
    }

  private def foldProps(state: TblProps, entries: Seq[String]): TblProps =
    entries.foldLeft(state) { (s, entry) =>
      entry.split('|') match {
        case Array(k, PropTombstone) => s - k
        case Array(k, v) => s + (k -> b64d(v))
        case _ => s
      }
    }

  /** The user table properties in force at `v`. */
  def tblPropsOf(root: String, v: Int): TblProps = {
    if (v == 0) return Map.empty
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) =>
        (cv, foldProps(Map.empty,
          listField(textOf(ckptPath(root, cv)), "tblprops")))
      case None => (0, Map.empty: TblProps)
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      foldProps(state, listField(textOf(manifest(root, i)), "tblprops"))
    }
  }

  /** The tombstone-and-redeclare delta that moves the properties in
    * force at `fromV` to exactly `target` — what REPLACE TABLE and
    * RESTORE commit (shared so the two verbs can never drift). */
  private[sources] def propSwap(
      root: String, fromV: Int,
      target: TblProps): Map[String, Option[String]] = {
    val cur = tblPropsOf(root, fromV)
    cur.keys.filterNot(target.contains)
      .map(_ -> (None: Option[String])).toMap ++
      target.filter { case (k, v) => !cur.get(k).contains(v) }
        .map { case (k, v) => k -> Some(v) }
  }

  /** The column defaults in force at `v`. */
  def defaultsOf(root: String, v: Int): Defaults = {
    if (v == 0) return Map.empty
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) =>
        (cv, foldDefaults(Map.empty,
          listField(textOf(ckptPath(root, cv)), "default")))
      case None => (0, Map.empty: Defaults)
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      foldDefaults(state, listField(textOf(manifest(root, i)), "default"))
    }
  }

  /** Schema scrubbed to what the log's flat DDL grammar stores: the
    * two DEFAULT-VALUE metadata keys must never reach toDDL — they
    * render as `DEFAULT <expr>` clauses fromDDL cannot parse, bricking
    * every later read. Everything else (column COMMENTs) round-trips
    * and is kept. Every commit site that receives a LIVE schema
    * (catalog DDL, write builders) goes through here. */
  def bareDdl(schema: org.apache.spark.sql.types.StructType): String =
    org.apache.spark.sql.types.StructType(schema.fields
      // the hidden row-tracking column is a FILE-level artifact
      // governed by graft.rowTracking — it never enters the schema of
      // record, no matter which write path records DDL
      .filterNot(_.name == CommitLogWrite.RowIdCol)
      .map { f =>
        val m = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .remove("CURRENT_DEFAULT").remove("EXISTS_DEFAULT").build()
        org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable, m)
      }).toDDL

  /** What an engine REWRITE (optimize/zorder/copy-on-write DML) must
    * read and re-write: the declared DDL plus the hidden row-id column
    * when the table is row-tracked — dropping it in a file swap would
    * silently unmake every row's identity. */
  def rewriteDdl(root: String, v: Int): Option[String] =
    schemaOf(root, v).map { d =>
      if (CommitLogWrite.rowTrackingOn(tblPropsOf(root, v)))
        s"$d, ${CommitLogWrite.RowIdCol} BIGINT"
      else d
    }

  /** Schema DDL and column defaults in ONE checkpoint+delta replay —
    * the catalog's loadTable hot path (a per-facet accessor pair would
    * read every manifest twice per table resolution). */
  def schemaAndDefaultsOf(root: String, v: Int): (Option[String], Defaults) = {
    if (v == 0) return (None, Map.empty)
    val (start, ckptTxt) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) => (cv, Some(textOf(ckptPath(root, cv))))
      case None => (0, None)
    }
    var schema: Option[String] = ckptTxt.flatMap(stringField(_, "schema"))
    var dfs: Defaults = ckptTxt
      .map(t => foldDefaults(Map.empty, listField(t, "default")))
      .getOrElse(Map.empty)
    ((start + 1) to v).foreach { i =>
      val txt = textOf(manifest(root, i))
      stringField(txt, "schema").foreach(s0 => schema = Some(s0))
      dfs = foldDefaults(dfs, listField(txt, "default"))
    }
    (schema, dfs)
  }

  // ---- COLUMN MAPPING: rename without rewrite ----

  /** Logical column name → its FORMER names, newest first (Delta's
    * column mapping, name-based): data files keep whatever name was
    * logical when they were written; readers resolve each logical
    * column through its former-name chain. Manifest field `colmap`
    * restates the FULL map (column-count-sized); replay takes the
    * newest restatement. */
  type ColMap = Map[String, Seq[String]]

  private def renderColMap(m: ColMap): Seq[String] =
    m.toSeq.sortBy(_._1).map { case (l, fs) => (l +: fs).mkString("|") }

  private def parseColMap(entries: Seq[String]): ColMap =
    entries.map { e =>
      val parts = e.split("\\|").toSeq
      parts.head -> parts.tail
    }.toMap

  private def requireValidColMap(m: ColMap): Unit = {
    val all = m.toSeq.flatMap { case (l, fs) => l +: fs }
    all.foreach(n => require(n.nonEmpty && !n.exists(",\"[]\\|".contains(_)),
      s"column-map name '$n' must be non-empty and grammar-safe"))
    require(all.distinct == all,
      s"column map repeats a name — every logical and former name must " +
        s"be unique: $m")
  }

  /** The column map in force at `v` (empty: no renames ever). */
  def formerNamesOf(root: String, v: Int): ColMap = {
    if (v == 0) return Map.empty
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) =>
        (cv, parseColMap(listField(textOf(ckptPath(root, cv)), "colmap")))
      case None => (0, Map.empty: ColMap)
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      val restated = parseColMap(listField(textOf(manifest(root, i)), "colmap"))
      if (restated.isEmpty) state else restated
    }
  }

  /** RENAME COLUMN as a metadata-only commit (Delta's
    * `ALTER TABLE … RENAME COLUMN`): no data file is rewritten — the
    * commit records the renamed DDL plus a column-map entry chaining
    * the new logical name to every name the column ever had, and
    * readers coalesce through the chain per file era. Writers always
    * write CURRENT logical names, so any later COW rewrite of an old
    * batch localizes the rename for that batch, exactly like a shallow
    * clone localizes external references. Requires a log-declared
    * schema (the map is meaningless against inferred-schema reads);
    * the new name must be fresh — not a live column and not any
    * still-mapped former name (reuse would make the coalesce chain
    * ambiguous). */
  def renameColumn(root: String, oldName: String, newName: String): Commit = {
    import org.apache.spark.sql.types.StructType
    require(oldName != newName, "rename must change the name")
    val v = latestVersion(root)
    val ddl = schemaOf(root, v).getOrElse(throw new IllegalArgumentException(
      s"RENAME COLUMN needs a log-declared schema on $root — declare one " +
        "(schema-enforced write) before renaming"))
    val st = StructType.fromDDL(ddl)
    require(st.fieldNames.contains(oldName),
      s"no column '$oldName' in $root (schema: ${st.fieldNames.mkString(",")})")
    require(!st.fieldNames.contains(newName),
      s"column '$newName' already exists in $root")
    val cur = formerNamesOf(root, v)
    require(!cur.values.flatten.toSet.contains(newName),
      s"'$newName' is a still-mapped former name — reusing it would make " +
        "old files' columns ambiguous")
    require(!droppedOf(root, v).contains(newName),
      s"'$newName' was DROPPED and is reserved forever — old files still " +
        "carry data under it")
    // a CHECK referencing the old name would fail analysis at the next
    // publish — drop or re-declare the constraint first (Delta blocks
    // this rename the same way)
    constraintsOf(root, v).foreach { case (cn, ce) =>
      val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(ce).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }
      require(!refs.contains(oldName),
        s"cannot rename '$oldName': CHECK constraint '$cn' ($ce) references " +
          "it — drop and re-declare the constraint around the rename")
    }
    val newDdl = StructType(st.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f)).toDDL
    val chain = oldName +: cur.getOrElse(oldName, Seq.empty)
    val next = (cur - oldName) + (newName -> chain)
    // a column DEFAULT migrates with its column (default expressions
    // are constant — they reference no names)
    val movedDefault: Map[String, Option[(String, String)]] =
      defaultsOf(root, v).get(oldName) match {
        case Some(p) => Map(oldName -> None, newName -> Some(p))
        case None => Map.empty
      }
    commit(root, v, added = Nil, removed = Nil, schema = Some(newDdl),
      op = Some("RENAME COLUMN"), colMap = next, defaults = movedDefault)
  }

  /** The widening ladder TYPE WIDENING accepts: every pair is a pure
    * value-preserving injection whose parquet read the engine serves
    * from the NARROW physical layout (INT32 under a LONG request,
    * FLOAT under DOUBLE), so old files never rewrite. */
  val Widenings: Set[(org.apache.spark.sql.types.DataType,
      org.apache.spark.sql.types.DataType)] = Set(
    (org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType),
    (org.apache.spark.sql.types.FloatType,
      org.apache.spark.sql.types.DoubleType))

  /** TYPE WIDENING as a metadata-only commit (Delta's type-widening
    * `ALTER TABLE … ALTER COLUMN … TYPE`): no data file is rewritten —
    * the commit records the widened DDL and readers serve old files'
    * narrow physical values under the wide logical type (the row leg
    * dispatches on the FILE's primitive type exactly as wide decimals
    * already do; the vectorized leg rides Spark's own parquet type
    * widening). Every manifest facet survives by construction: boxes
    * are double-typed (width-blind), null counts are type-free,
    * integral blooms key on the DECIMAL-STRING canonical form both
    * widths derive identically, the NDV hash of an int IS the hash of
    * its long, and declared sort orders keep their order under an
    * injection — so pruning, top-N, metadata aggregates and DPP work
    * unchanged across the widening boundary. Time travel still serves
    * pre-widening versions under the era's narrow schema. Refused:
    * non-ladder pairs (narrowing loses values; int→double loses
    * exactness past 2^53), partition columns (the tuple registry keys
    * on parse type), and GENERATED columns (the stored expression's
    * output type is the narrow one — re-declare the table instead). */
  /** The `partcols` manifest value that means "explicitly NONE": a
    * bare empty list cannot express un-partitioning because replay
    * treats an absent/empty declaration as "inherit the spec in
    * force" ([[partColsOf]]). */
  val NoPartSentinel = "-"

  /** PARTITION EVOLUTION (SURVEY S80): re-declare the table's
    * partition spec as a METADATA-ONLY commit (Iceberg's partition
    * spec evolution). No data file moves: every already-committed
    * batch keeps its own era's recorded tuple, and the read side is
    * per-batch by construction — tuple pruning evaluates each pushed
    * filter against whatever tokens a batch carries (old-era batches
    * keep pruning on old columns, new-era on new), SPJ claims a
    * partitioning only when ALL live batches carry full current-spec
    * tuples (mixed eras decline to UnknownPartitioning, and
    * `optimizeRepartition` re-lands everything under the current spec
    * to restore it), and metadata GROUP BY answers from token
    * presence, not the current spec. Only FUTURE writes bucket by the
    * new columns. `cols = Nil` un-partitions (recorded via
    * [[NoPartSentinel]] — an empty declaration would read as
    * "inherit"). At 100 TB this turns a petabyte re-layout decision
    * into one manifest line, with the physical migration an optional
    * OPTIMIZE side effect. */
  def setPartitioning(root: String, cols: Seq[String]): Commit = {
    import org.apache.spark.sql.types._
    val v = latestVersion(root)
    val ddl = schemaOf(root, v).getOrElse(throw new IllegalArgumentException(
      s"SET PARTITIONING needs a log-declared schema on $root — declare " +
        "one (schema-enforced write) before evolving the spec"))
    val st = StructType.fromDDL(ddl)
    require(cols.distinct == cols,
      s"duplicate partition column in (${cols.mkString(",")})")
    cols.foreach { c =>
      val src = CommitLogBucket.sourceOf(c)
      val field = st.fields.find(_.name == src).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$src' in $root (schema: ${st.fieldNames.mkString(",")})"))
      if (CommitLogBucket.isBucket(c))
        require(CommitLogBucket.supported(field.dataType),
          s"'$src' has type ${field.dataType.simpleString}, which cannot " +
            "key a hash bucket (integral, date/timestamp or string only)")
      else if (CommitLogMonotone.isMonotone(c))
        require(CommitLogMonotone.parse(c)
            .exists(CommitLogMonotone.supported(_, field.dataType)),
          s"'$src' has type ${field.dataType.simpleString}, which cannot " +
            s"source '$c' (time transforms need timestamp/date, truncate " +
            "needs integral or string)")
      else field.dataType match {
        // exactly the partitioned writer's supported value forms —
        // anything else could never produce a tuple token
        case LongType | IntegerType | TimestampType | DateType |
            DoubleType | FloatType | BooleanType | StringType |
            _: DecimalType => ()
        case other => throw new IllegalArgumentException(
          s"'$c' has type ${other.simpleString}, which cannot key a " +
            "partition tuple")
      }
    }
    if (partColsOf(root, v) == cols) return Commit(v, 0) // already the spec
    commit(root, v, added = Nil, removed = Nil,
      op = Some("SET PARTITIONING"),
      partCols = if (cols.isEmpty) Seq(NoPartSentinel) else cols,
      repartition = true)
  }

  def widenColumn(
      root: String, name: String,
      to: org.apache.spark.sql.types.DataType): Commit = {
    import org.apache.spark.sql.types.StructType
    val v = latestVersion(root)
    val ddl = schemaOf(root, v).getOrElse(throw new IllegalArgumentException(
      s"TYPE WIDENING needs a log-declared schema on $root — declare one " +
        "(schema-enforced write) before widening"))
    val st = StructType.fromDDL(ddl)
    val field = st.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' in $root (schema: ${st.fieldNames.mkString(",")})"))
    if (field.dataType == to) return Commit(v, 0) // already that width
    require(Widenings.contains((field.dataType, to)),
      s"cannot widen '$name': ${field.dataType.simpleString} -> " +
        s"${to.simpleString} is not on the widening ladder " +
        s"(${Widenings.map { case (f, t) =>
          s"${f.simpleString}->${t.simpleString}" }.mkString(", ")})")
    require(!partColsOf(root, v).contains(name),
      s"'$name' is a partition column — partition tuples key on its " +
        "parse type; evolve it out of the spec (setPartitioning) before " +
        "widening")
    require(!tblPropsOf(root, v).contains(
        s"${CommitLogWrite.GeneratedPropPrefix}$name"),
      s"'$name' is GENERATED — its stored expression produces the " +
        s"narrow type; re-declare the generation instead")
    val newDdl = StructType(st.fields.map(f =>
      if (f.name == name) f.copy(dataType = to) else f)).toDDL
    commit(root, v, added = Nil, removed = Nil, schema = Some(newDdl),
      op = Some("WIDEN COLUMN"), schemaWiden = true)
  }


  /** Names RESERVED forever by DROP COLUMN at `v`: the dropped logical
    * name plus every former name of its chain. Old files still carry
    * data under these names, so re-declaring any of them would
    * resurrect zombie values — the evolution gate rejects them for the
    * table's lifetime. Manifest field `dropped` restates the full
    * (only-growing) list; replay takes the newest restatement. */
  def droppedOf(root: String, v: Int): Seq[String] = {
    if (v == 0) return Nil
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) => (cv, listField(textOf(ckptPath(root, cv)), "dropped"))
      case None => (0, Nil: Seq[String])
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      val restated = listField(textOf(manifest(root, i)), "dropped")
      if (restated.isEmpty) state else restated
    }
  }

  /** DROP COLUMN as a metadata-only commit (Delta's
    * `ALTER TABLE … DROP COLUMN` under column mapping): no data file
    * is rewritten — the commit records the narrowed DDL and reserves
    * the column's whole name chain forever. Readers simply stop
    * projecting the column; time travel still sees it (the era's
    * schema governs); the dead bytes persist in old files until any
    * COW rewrite or OPTIMIZE re-lands those batches under the current
    * logical columns — physical purge is a side effect of the
    * maintenance the table already runs. Dropping a column a CHECK
    * references, or the last column, is rejected. */
  def dropColumn(root: String, name: String): Commit = {
    import org.apache.spark.sql.types.StructType
    val v = latestVersion(root)
    val ddl = schemaOf(root, v).getOrElse(throw new IllegalArgumentException(
      s"DROP COLUMN needs a log-declared schema on $root"))
    val st = StructType.fromDDL(ddl)
    require(st.fieldNames.contains(name),
      s"no column '$name' in $root (schema: ${st.fieldNames.mkString(",")})")
    require(st.fields.length > 1,
      s"cannot drop the last column of $root")
    constraintsOf(root, v).foreach { case (cn, ce) =>
      val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(ce).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }
      require(!refs.contains(name),
        s"cannot drop '$name': CHECK constraint '$cn' ($ce) references it " +
          "— drop the constraint first")
    }
    val newDdl = StructType(st.fields.filterNot(_.name == name)).toDDL
    // reserve the dropped name AND its whole rename chain; the colmap
    // entry (if any) stays in place harmlessly — the logical name is no
    // longer in the schema, so nothing ever projects through it again
    val reserve = (droppedOf(root, v) ++ (name +:
      formerNamesOf(root, v).getOrElse(name, Seq.empty))).distinct
    // the dropped column's DEFAULT dies with it
    val dropDefault: Map[String, Option[(String, String)]] =
      if (defaultsOf(root, v).contains(name)) Map(name -> None) else Map.empty
    commit(root, v, added = Nil, removed = Nil, schema = Some(newDdl),
      op = Some("DROP COLUMN"), schemaDrop = true, droppedCols = reserve,
      defaults = dropDefault)
  }

  /** A commit restating the column map may change the DDL exactly by
    * renames the map explains: each dropped name must reappear as the
    * newest former of exactly one added name, same type. */
  private def checkRename(cur: String, next: String, colMap: ColMap): Unit = {
    import org.apache.spark.sql.types.StructType
    val curF = StructType.fromDDL(cur).fields.map(f => f.name -> f.dataType).toMap
    val nextF = StructType.fromDDL(next).fields.map(f => f.name -> f.dataType).toMap
    val dropped = curF.keySet -- nextF.keySet
    val added = nextF.keySet -- curF.keySet
    dropped.foreach { d =>
      val to = added.filter(a => colMap.get(a).exists(_.headOption.contains(d)))
      if (to.size != 1 || nextF(to.head) != curF(d))
        throw new SchemaChangeException(
          s"schema change drops column '$d' without a matching same-type " +
            s"rename in the column map ($colMap)")
    }
    val retyped = curF.collect {
      case (n, t) if nextF.get(n).exists(_ != t) => s"$n: $t -> ${nextF(n)}"
    }
    if (retyped.nonEmpty)
      throw new SchemaChangeException(
        s"schema change retypes ${retyped.mkString("; ")} — a rename " +
          "commit may only rename (and add nullable columns)")
  }

  /** A DROP COLUMN commit may change the DDL only by removing columns
    * (each of which it must reserve), never adding or retyping. */
  private def checkDrop(cur: String, next: String, reserve: Seq[String]): Unit = {
    import org.apache.spark.sql.types.StructType
    val curF = StructType.fromDDL(cur).fields.map(f => f.name -> f.dataType).toMap
    val nextF = StructType.fromDDL(next).fields.map(f => f.name -> f.dataType).toMap
    val dropped = curF.keySet -- nextF.keySet
    val bad = dropped.filterNot(reserve.contains)
    if (bad.nonEmpty || (nextF.keySet -- curF.keySet).nonEmpty ||
        curF.exists { case (n, t) => nextF.get(n).exists(_ != t) })
      throw new SchemaChangeException(
        s"a DROP COLUMN commit may only remove reserved columns " +
          s"(dropped=$dropped, unreserved=$bad)")
  }

  def constraintsOf(root: String, v: Int): Constraints = {
    if (v == 0) return Map.empty
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) =>
        (cv, parseConstraints(listField(textOf(ckptPath(root, cv)), "constraint")))
      case None => (0, Map.empty: Constraints)
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      foldConstraints(state, listField(textOf(manifest(root, i)), "constraint"))
    }
  }

  /** DROP CONSTRAINT: retract a CHECK from force as a metadata-only
    * commit (a tombstone entry in the constraint field; checkpoints
    * snapshot the resolved set, so the tombstone itself expires with
    * its manifest). Writes that race the drop may still validate
    * against the old set — validating too strictly is safe. This is
    * what makes `renameColumn`/`dropColumn`'s "drop the constraint
    * first" guidance actionable, and the escape hatch if a declared
    * constraint must be retired. */
  def dropConstraint(root: String, name: String): Commit = {
    val v = latestVersion(root)
    require(constraintsOf(root, v).contains(name),
      s"no CHECK constraint '$name' in force on $root")
    commit(root, v, added = Nil, removed = Nil,
      op = Some("DROP CONSTRAINT"),
      constraints = Map(name -> ConstraintTombstone))
  }

  // ---- TXN-IN-MANIFEST: idempotent-writer watermarks ----
  //
  // The Delta `txn` action: a commit may record ("application id",
  // epoch) — for Structured Streaming, (queryId, epochId) — and replay
  // accumulates the HIGHEST epoch per application. A sink that replays
  // an epoch after a crash (Structured Streaming is at-least-once at
  // the sink boundary) asks the log "did I already commit this epoch?"
  // and skips if so — exactly-once WRITES without any side cursor
  // file. Watermarks are version state like schema: delta manifests
  // carry only their own commit's txn, checkpoints snapshot the
  // accumulated map, and vacuum's cutoff checkpoint preserves it —
  // a retention sweep must never resurrect an already-written epoch.

  /** application id -> highest committed epoch. */
  type Txns = Map[String, Long]

  /** Thrown (pre-publish, nothing staged is visible) when a commit
    * declares a txn epoch at or below the application's recorded
    * watermark: the caller already committed this unit of work and
    * must treat the replay as a no-op. */
  final class TxnAlreadyCommittedException(
      val appId: String, val epoch: Long, val watermark: Long)
    extends IllegalStateException(
      s"txn $appId epoch $epoch already committed (watermark $watermark): " +
        "replayed unit of work — drop staged files and continue")

  private def requireValidTxn(txn: Option[(String, Long)]): Unit =
    txn.foreach { case (app, epoch) =>
      require(app.nonEmpty && !app.exists(",\"[]\\|".contains(_)),
        s"txn app id '$app' must be non-empty and contain none of , \" [ ] \\ |")
      require(epoch >= 0L, s"txn epoch must be non-negative: $epoch")
    }

  private def renderTxns(txns: Txns): Seq[String] =
    txns.toSeq.sortBy(_._1).map { case (app, epoch) => s"$app|$epoch" }

  private def parseTxns(entries: Seq[String]): Txns =
    entries.map(_.split('|')).collect {
      case Array(app, epoch) => app -> epoch.toLong
    }.toMap

  private def readTxnsField(p: Path): Seq[String] = {
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    if (txt.contains("\"txn\":")) parseList(extractField(txt, "txn"))
    else Nil
  }

  /** The idempotence watermarks in force at `v` — nearest checkpoint
    * plus delta replay, folding each commit's txn in with max(). Unlike
    * [[statsOf]] this is NOT filtered by live batches: a watermark
    * outlives the data its epoch wrote (a later delete of those rows
    * must not re-open the epoch). */
  def txnsOf(root: String, v: Int): Txns = {
    if (v == 0) return Map.empty
    val (start, base) = latestCheckpointAtOrBelow(root, v) match {
      case Some((cv, _)) => (cv, parseTxns(readTxnsField(ckptPath(root, cv))))
      case None => (0, Map.empty: Txns)
    }
    ((start + 1) to v).foldLeft(base) { (state, i) =>
      parseTxns(readTxnsField(manifest(root, i))).foldLeft(state) {
        case (st, (app, epoch)) =>
          st.updated(app, math.max(epoch, st.getOrElse(app, Long.MinValue)))
      }
    }
  }

  /** One committed version's change set. `dataChange` false marks a
    * layout-only rewrite (compaction/clustering): same rows, new
    * files — incremental consumers skip it. `op` is the committing
    * verb's audit label (see [[HistoryEntry]]) — the change feed uses
    * it to tell a REPLACE-semantics commit (OVERWRITE/TRUNCATE/
    * RESTORE: no row identity between sides, file-granularity
    * delete+insert is exact) from a row-level rewrite (which needs
    * materialized change rows). */
  /** `changeFiles`: whether the version promoted materialized change
    * rows to `_changes/v<N>` — `Some` when the committing writer
    * recorded it (round-16 grammar; every materializing path does),
    * `None` for legacy manifests, where a consumer that needs the
    * answer must fall back to listing the change dir. Keeps planning
    * (e.g. the variant-pushdown insert-only-window check) metadata-
    * only instead of O(versions) remote listings. */
  final case class Change(
      version: Int, added: Seq[String], removed: Seq[String],
      dataChange: Boolean = true, op: Option[String] = None,
      changeFiles: Option[Boolean] = None)

  /** CHANGE FEED: the per-version add/remove sets for
    * `fromVersion < v <= toVersion` — what an incremental consumer
    * (MV maintenance, downstream sync, streaming tail) processes
    * instead of re-reading the table. Delta manifests make this a
    * direct read of each version's own commit record: cost is
    * O(changes), independent of table size. Fails like any expired
    * read (NoSuchFileException) when the range has been vacuumed. */
  def changes(root: String, fromVersion: Int, toVersion: Int): Seq[Change] =
    ((fromVersion + 1) to toVersion).map { v =>
      val txt = textOf(manifest(root, v))
      Change(v, parseList(extractField(txt, "add")),
        parseList(extractField(txt, "remove")),
        !txt.contains("\"dataChange\":false"),
        stringField(txt, "operation"),
        if (txt.contains("\"changeFiles\":true")) Some(true)
        else if (txt.contains("\"changeFiles\":false")) Some(false)
        else None)
    }

  /** True when version `v` is a BLIND DATA APPEND: it adds at least
    * one data batch, removes nothing, touches no deletion vectors and
    * carries no schema / constraint / column-map / drop / default
    * facet, and its only property writes are identity-watermark
    * advances (the sink's bookkeeping). This is the one commit shape a
    * row-level rewrite can serialize AFTER without re-reading: the
    * appended rows did not exist at the rewrite's read version, so the
    * statement's predicate never saw them (write-serializable, the
    * Delta conflict-matrix cell for DML vs concurrent ingest), and
    * nothing the rewrite staged — survivors, CHECK validation, CDC
    * diff, recorded schema — is invalidated by rows in batches it
    * neither reads nor removes. */
  def blindDataAppend(root: String, v: Int): Boolean = {
    val txt = textOf(manifest(root, v))
    val add = parseList(extractField(txt, "add"))
    val remove = parseList(extractField(txt, "remove"))
    // the OPERATION gate closes the shape-only hole: an add-only
    // RESTORE (re-adding batches a prior delete removed, nothing else
    // changed) is manifest-indistinguishable from an append, but its
    // rows EXISTED at the rebasing statement's read version — the
    // statement's predicate should have seen them, so rebasing across
    // it would violate write-serializability. Only verbs that mint
    // genuinely NEW rows qualify.
    // `exists`, not `forall`: an op-LESS add-only manifest (direct
    // CommitLog.commit with op=None) must abort the rebase too — the
    // shape alone cannot prove the rows are new, and forall would let
    // it slide past exactly like the pre-gate RESTORE did.
    val appendVerb = stringField(txt, "operation").exists(op =>
      op == "WRITE" || op == "STREAMING UPDATE" || op == "MERGE")
    appendVerb && add.nonEmpty && remove.isEmpty &&
      !add.exists(_.startsWith(CommitLogMerge.DvPrefix)) &&
      !txt.contains("\"schema\":") &&
      !txt.contains("\"constraint\":") &&
      !txt.contains("\"colmap\":") &&
      !txt.contains("\"dropped\":") &&
      !txt.contains("\"default\":") &&
      !txt.contains("\"dataChange\":false") &&
      listField(txt, "tblprops").forall(e =>
        e.takeWhile(_ != '|').startsWith(CommitLogWrite.IdentityHwmPrefix))
  }

  /** WriteSerializable rebase check: the latest version, when EVERY
    * rival commit in `(from, latest]` is a [[blindDataAppend]]; None
    * when any rival did anything else (the caller must abort — the
    * rival may have changed rows the statement read). Bounded
    * metadata: one manifest read per rival version. */
  def appendOnlySince(root: String, from: Int): Option[Int] = {
    val latest = latestVersion(root)
    if (latest > from && ((from + 1) to latest).forall(blindDataAppend(root, _)))
      Some(latest)
    else None
  }

  /** The WRITE-SERIALIZABLE REBASE COMMIT LOOP shared by every
    * row-level rewrite (the COW replace write and the merge-on-read
    * delta write — one seam, so the conflict matrix has exactly one
    * implementation): attempt the commit at `base + 1`; on losing the
    * race, rebase forward iff every rival in `(base, latest]` was a
    * [[blindDataAppend]] (rows the statement's predicate never saw),
    * else CLEAN UP the staged batches and abort with the typed
    * conflict error; exhaustion (livelock) cleans up the same way.
    * Returns the committed version.
    *
    * `beforeAttempt(base)` runs before each try (the delta leg
    * re-validates its identity watermark against the rebased base);
    * `tryOnce(base)` must attempt exactly `tryCommit(root, base + 1,
    * …)`; `cleanup()` must be idempotent. */
  def rewriteCommitLoop(
      root: String, readVersion: Int, verb: String,
      beforeAttempt: Int => Unit,
      tryOnce: Int => Boolean,
      cleanup: () => Unit): Int = {
    var base = readVersion
    var committed = false
    var attempts = 0
    while (!committed && attempts < 50) {
      attempts += 1
      beforeAttempt(base)
      if (tryOnce(base)) committed = true
      else appendOnlySince(root, base) match {
        case Some(latest) => base = latest
        case None =>
          cleanup()
          throw new java.util.ConcurrentModificationException(
            s"$verb lost the race at v${base + 1} of $root: a rival " +
              "other than a blind append committed first — re-run the " +
              "statement (a row-level rewrite only rebases across pure " +
              "appends; any other rival may have changed rows this " +
              "statement read)")
      }
    }
    if (!committed) {
      // exhaustion must not orphan staged batches or change rows
      cleanup()
      throw new IllegalStateException(
        s"$verb on $root gave up after 50 rebase attempts (livelock?)")
    }
    if ((base + 1) % checkpointInterval == 0)
      writeCheckpoint(root, base + 1)
    base + 1
  }

  /** One audit row of [[history]]. `operation` is the label the
    * committing verb recorded (null for unlabeled direct commits);
    * `timestampMs` is the manifest file's mtime — audit metadata, not
    * versioned state (retention rewrites never touch it). */
  final case class HistoryEntry(
      version: Int, operation: Option[String],
      nAdded: Int, nRemoved: Int, dataChange: Boolean,
      txnApp: Option[String], txnEpoch: Option[Long],
      timestampMs: Long)

  private def readStringField(p: Path, name: String): Option[String] =
    stringField(textOf(p), name)

  private def stringField(txt: String, name: String): Option[String] = {
    val key = "\"" + name + "\":\""
    val i = txt.indexOf(key)
    if (i < 0) None
    else {
      val from = i + key.length
      Some(txt.substring(from, txt.indexOf('"', from)))
    }
  }

  /** DESCRIBE HISTORY: the audit trail of every still-readable version
    * (vacuum expires manifests, so history reaches back exactly as far
    * as time travel does). Cost is one manifest read per version —
    * bounded metadata, never data. */
  def history(root: String): Seq[HistoryEntry] = {
    val latest = latestVersion(root)
    val from = lowestReadable(root)
    (from to latest).flatMap { v =>
      val m = manifest(root, v)
      if (!Files.exists(m)) None // `from` may be a checkpoint-only cutoff
      else {
        // one byte-read per manifest; every field parses from that text
        val txt = textOf(m)
        val add = parseList(extractField(txt, "add"))
        val remove = parseList(extractField(txt, "remove"))
        val txn = listField(txt, "txn") match {
          case Seq(one) => one.split('|') match {
            case Array(app, epoch) => Some((app, epoch.toLong))
            case _ => None
          }
          case _ => None
        }
        Some(HistoryEntry(v, stringField(txt, "operation"),
          add.size, remove.size, !txt.contains("\"dataChange\":false"),
          txn.map(_._1), txn.map(_._2),
          Files.getLastModifiedTime(m).toMillis))
      }
    }
  }

  /** RESTORE (Delta's RESTORE TABLE … TO VERSION): roll the table back
    * to snapshot `toVersion` by publishing a NEW commit whose add/
    * remove sets transform the current snapshot into the old one —
    * history stays append-only (the bad versions remain readable for
    * forensics until vacuum), data files are reused, not copied (a
    * restore is metadata-sized). Restoring past expired history fails
    * on the broken replay chain like any time travel; restoring
    * batches a vacuum already SWEPT is impossible for the same reason
    * (only still-readable versions can restore). The commit is
    * dataChange=true — a restore re-states rows incremental consumers
    * saw and retracts ones they kept, so tails fault on it exactly
    * like any rewrite (the change feed computes its diff instead).
    * Returns the new version (current == target is a no-op). */
  def restore(root: String, toVersion: Int): Commit = {
    val cur = latestVersion(root)
    require(toVersion >= 1 && toVersion <= cur,
      s"cannot restore $root to v$toVersion (latest is v$cur)")
    val snapT = snapshotAt(root, toVersion) // throws if expired
    val target = snapT.files
    val current = files(root, cur)
    val added = target.filterNot(current.toSet)
    val removed = current.filterNot(target.toSet)
    // no-op only when METADATA agrees too: a restore across a
    // rename/REPLACE may move no files yet still need to roll the
    // schema and defaults facets back
    if (added.isEmpty && removed.isEmpty &&
        schemaOf(root, toVersion) == schemaOf(root, cur) &&
        defaultsOf(root, toVersion) == defaultsOf(root, cur) &&
        tblPropsOf(root, toVersion) == tblPropsOf(root, cur))
      return Commit(cur, 0)
    // re-added batches bring their pruning metadata back with them —
    // "plan exactly like the old version" includes stats and blooms
    val addedSet = added.toSet
    val reStats = snapT.stats.filter { case (b, _) => addedSet.contains(b) }
    val reBlooms = snapT.blooms.filter { case (b, _) => addedSet.contains(b) }
    val reRows = snapT.rows.filter { case (b, _) => addedSet.contains(b) }
    // restore the schema in force at the target too: reads of the new
    // version must plan exactly like reads of the old one. This may
    // roll the DDL BACKWARD (dropping since-evolved columns), which the
    // additive-evolution gate exists to reject from ordinary commits —
    // a restore is the one verb where that reversal is the point, and
    // it only ever re-records a DDL the table itself once declared.
    val reParts = snapT.parts.filter { case (b, _) => addedSet.contains(b) }
    // the DEFAULTS facet rolls back with the schema: tombstone defaults
    // not in force at the target, re-declare the target's where they
    // differ — otherwise an INSERT after restore fills columns with a
    // LATER definition's default (or a rename-migrated one), silently
    // writing values the restored definition never declared (the same
    // swap REPLACE TABLE runs)
    val targetDefaults = defaultsOf(root, toVersion)
    val curDefaults = defaultsOf(root, cur)
    val defaultSwap: Map[String, Option[(String, String)]] =
      curDefaults.keys.filterNot(targetDefaults.contains)
        .map(_ -> (None: Option[(String, String)])).toMap ++
        targetDefaults.filter { case (c, p) => !curDefaults.get(c).contains(p) }
          .map { case (c, p) => c -> Some(p) }
    commit(root, cur, added = added, removed = removed,
      schema = schemaOf(root, toVersion), op = Some("RESTORE"),
      schemaRollback = true, stats = reStats, blooms = reBlooms,
      parts = reParts, rows = reRows, defaults = defaultSwap,
      props = propSwap(root, cur, tblPropsOf(root, toVersion)))
  }

  /** TIMESTAMP-based time travel: the highest still-readable version
    * whose commit time (manifest mtime — see [[HistoryEntry]]) is at
    * or before `timestampMs`. Fails when the time predates every
    * readable version (matching version-based reads of expired
    * history). Commit times are audit metadata with filesystem
    * resolution: concurrent commits within one tick resolve to the
    * larger version, which is the snapshot a reader at that instant
    * would have seen anyway. */
  def versionAt(root: String, timestampMs: Long): Int = {
    val at = history(root).filter(_.timestampMs <= timestampMs)
    require(at.nonEmpty,
      s"no readable version of $root at or before $timestampMs — " +
        "history starts later (or was vacuumed past that point)")
    at.map(_.version).max
  }

  /** Publish the full-snapshot checkpoint at `v` (idempotent: derived
    * content + create-if-absent, so racers and re-runs are no-ops).
    * Carries the schema in force so schema replay never needs an
    * expired delta chain. */
  private[graft] def writeCheckpoint(root: String, v: Int): Unit = {
    if (v == 0) return
    if (!Files.exists(ckptPath(root, v))) {
      val schemaField =
        schemaOf(root, v).map(s => s""","schema":"$s"""").getOrElse("")
      // ONE replay yields files + all per-batch facets (a per-facet
      // accessor here would multiply manifest I/O by facet count)
      val snap = snapshotAt(root, v)
      val stats = snap.stats
      val statsField =
        if (stats.isEmpty) ""
        else s""","stats":${renderList(renderStats(stats))}"""
      val txns = txnsOf(root, v)
      val txnField =
        if (txns.isEmpty) ""
        else s""","txn":${renderList(renderTxns(txns))}"""
      val blooms = snap.blooms
      val bloomField =
        if (blooms.isEmpty) ""
        else s""","bloom":${renderList(renderBlooms(blooms))}"""
      val cons = constraintsOf(root, v)
      val consField =
        if (cons.isEmpty) ""
        else s""","constraint":${renderList(renderConstraints(cons))}"""
      val cm = formerNamesOf(root, v)
      val colMapField =
        if (cm.isEmpty) ""
        else s""","colmap":${renderList(renderColMap(cm))}"""
      val dr = droppedOf(root, v)
      val droppedField =
        if (dr.isEmpty) ""
        else s""","dropped":${renderList(dr)}"""
      val pt = snap.parts
      val partsField =
        if (pt.isEmpty) ""
        else s""","parts":${renderList(renderParts(pt))}"""
      val pc = partColsOf(root, v)
      val partColsField =
        if (pc.isEmpty) ""
        else s""","partcols":${renderList(pc)}"""
      val rc = snap.rows
      val rowsField =
        if (rc.isEmpty) ""
        else s""","rows":${renderList(renderRows(rc))}"""
      val dfs = defaultsOf(root, v)
      val defaultsField =
        if (dfs.isEmpty) ""
        else s""","default":${renderList(renderDefaults(
          dfs.map { case (c, p) => c -> Some(p) }))}"""
      val tps = tblPropsOf(root, v)
      val propsField =
        if (tps.isEmpty) ""
        else s""","tblprops":${renderList(renderProps(
          tps.map { case (k, p) => k -> Some(p) }))}"""
      atomicCreate(ckptPath(root, v),
        s"""{"files":${renderList(snap.files)}$schemaField$statsField$txnField$bloomField$consField$colMapField$droppedField$partsField$partColsField$rowsField$defaultsField$propsField}""")
    }
  }

  final case class VacuumStats(
      expiredManifests: Int, sweptBatches: Seq[String], retainedFrom: Int)

  /** RETENTION — the maintenance half of the log (Delta VACUUM /
    * Iceberg expire-snapshots): drop every manifest older than the
    * last `keepLast` versions, then sweep data batches referenced by
    * NO surviving manifest. Order matters for crash safety: manifests
    * are deleted FIRST, so a crash at any point leaves either extra
    * expired manifests (re-vacuum) or orphaned data batches — and
    * orphans are exactly what the sweep detects (any root entry not
    * referenced by a surviving manifest), so a later vacuum finishes
    * the job. Retained versions are never touched: time travel within
    * the retention window keeps working; reads of expired versions
    * fail cleanly on the missing manifest.
    *
    * `minAgeMs` guards the one unsafe race: a concurrent committer's
    * STAGED batch exists on disk before its manifest publishes, and
    * would look orphaned. It is deliberately a REQUIRED parameter (no
    * default — a default of 0 made the unsafe setting the silent one):
    * production setting = comfortably above the longest stage-to-commit
    * latency (the same contract as Delta's retention-hours check);
    * pass 0 explicitly only when no writer can be in flight. */
  /** Lowest version whose replay chain is still intact: v1 when the
    * log was never vacuumed, else the oldest surviving checkpoint
    * (every successful vacuum leaves one at its cutoff). */
  private def lowestReadable(root: String): Int = {
    if (Files.exists(manifest(root, 1))) 1
    else {
      val log = Paths.get(root, "_log")
      if (!Files.isDirectory(log)) return 1
      val ckpts = listDir(log).map(_.getFileName.toString)
        .collect { case CkptName(v) => v }
      if (ckpts.isEmpty) 1 else ckpts.min
    }
  }

  /** `VACUUM … DRY RUN`: what [[vacuum]] with the same arguments WOULD
    * expire and sweep, deleting nothing — the pre-flight a retention
    * job runs before an irreversible sweep (Delta's DRY RUN). Computed
    * from the same cutoff and liveness rules; the age guard is applied
    * against now, so a dry run slightly UNDER-reports batches that
    * will age into eligibility by the real run. */
  def vacuumDryRun(root: String, keepLast: Int, minAgeMs: Long): VacuumStats = {
    require(keepLast >= 1, "must retain at least the latest version")
    require(minAgeMs >= 0L, "minAgeMs must be non-negative")
    val latest = latestVersion(root)
    if (latest == 0) return VacuumStats(0, Nil, 0)
    val cutoff = math.max(
      math.max(1, latest - keepLast + 1), lowestReadable(root))
    val expired = (1 until cutoff).count(v => Files.exists(manifest(root, v)))
    val live = (cutoff to latest).flatMap(files(root, _)).toSet
    val now = System.currentTimeMillis()
    val swept = listDir(Paths.get(root)).flatMap { p =>
      val name = p.getFileName.toString
      val isData = !name.startsWith("_") && !name.startsWith(".")
      if (isData && !live.contains(name) &&
          now - Files.getLastModifiedTime(p).toMillis >= minAgeMs) Some(name)
      else None
    }
    VacuumStats(expired, swept.sorted, cutoff)
  }

  def vacuum(root: String, keepLast: Int, minAgeMs: Long): VacuumStats = {
    require(keepLast >= 1, "must retain at least the latest version")
    require(minAgeMs >= 0L, "minAgeMs must be non-negative")
    val latest = latestVersion(root)
    if (latest == 0) return VacuumStats(0, Nil, 0)
    // The retention boundary can only move FORWARD: a keepLast larger
    // than a previous vacuum's would put the cutoff below the already-
    // expired floor, where no replay chain survives to checkpoint
    // (found by CommitLogProps — the naive cutoff crashed there).
    val cutoff = math.max(
      math.max(1, latest - keepLast + 1), lowestReadable(root))
    // The retained range must stay reconstructible once the delta chain
    // below it is gone: publish the cutoff checkpoint FIRST (idempotent,
    // so a crash anywhere after this line re-vacuums safely), then
    // expire manifests and pre-cutoff checkpoints.
    writeCheckpoint(root, cutoff)
    var expired = 0
    (1 until cutoff).foreach { v =>
      if (Files.deleteIfExists(manifest(root, v))) expired += 1
      Files.deleteIfExists(ckptPath(root, v))
    }
    // change-data files are versioned like manifests: expired versions'
    // CDC rows go with their manifests, and orphaned `_tmp-` stages
    // (lost merge races, crashes) age out under the same in-flight guard
    val changesDir = Paths.get(root, "_changes")
    if (Files.isDirectory(changesDir)) {
      val VRe = "v(\\d+)".r
      listDir(changesDir).foreach { p =>
        p.getFileName.toString match {
          case VRe(d) if d.toInt < cutoff => deleteTree(p)
          case n if n.startsWith("_tmp-") &&
              System.currentTimeMillis() -
                Files.getLastModifiedTime(p).toMillis >= minAgeMs =>
            deleteTree(p)
          case _ => ()
        }
      }
    }
    val live = (cutoff to latest).flatMap(files(root, _)).toSet
    val now = System.currentTimeMillis()
    val swept = scala.collection.mutable.ArrayBuffer.empty[String]
    listDir(Paths.get(root)).foreach { p =>
      val name = p.getFileName.toString
      val isData = !name.startsWith("_") && !name.startsWith(".")
      if (isData && !live.contains(name) &&
          now - Files.getLastModifiedTime(p).toMillis >= minAgeMs) {
        deleteTree(p)
        swept += name
      }
    }
    VacuumStats(expired, swept.toSeq.sorted, cutoff)
  }

  /** Materialized directory listing (safe to delete entries after). */
  private def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val it = Files.list(dir)
    try it.iterator().asScala.toList finally it.close()
  }

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteTree)
    Files.deleteIfExists(p)
  }

  /** Optimistic commit: stage happened already (data files written);
    * publish `added`, retire `removed`, starting from the snapshot the
    * writer read at `readVersion`. Returns the committed version.
    * Throws `ConcurrentModificationException` when a rival removed any
    * of THIS writer's `removed` set first (overlapping copy-on-write).
    *
    * `schema` declares the writer's DDL: the first declaration is
    * recorded as the table schema; a matching declaration inherits (no
    * manifest bytes); an ADDITIVE change (new columns, existing ones
    * intact — the Delta mergeSchema contract) is recorded as the new
    * schema in force; a dropped or retyped column throws
    * [[SchemaChangeException]] BEFORE any manifest is published — the
    * enforcement half of S11's evolution story, now log-governed. */
  /** `txn` declares an idempotence watermark: the commit records
    * (appId, epoch) and FAILS with [[TxnAlreadyCommittedException]] —
    * before any manifest publishes — when the log already holds this
    * epoch or a later one for the app (re-checked per rebase, so a
    * rival replay that wins the race is detected, not double-applied).
    * The caller treats that failure as "already done": drop staged
    * files, advance. */
  def commit(
      root: String, readVersion: Int,
      added: Seq[String], removed: Seq[String] = Nil,
      schema: Option[String] = None,
      maxAttempts: Int = 50,
      stats: Stats = Map.empty,
      txn: Option[(String, Long)] = None,
      dataChange: Boolean = true,
      op: Option[String] = None,
      blooms: Blooms = Map.empty,
      schemaRollback: Boolean = false,
      constraints: Constraints = Map.empty,
      colMap: ColMap = Map.empty,
      schemaDrop: Boolean = false,
      droppedCols: Seq[String] = Nil,
      parts: Parts = Map.empty,
      partCols: Seq[String] = Nil,
      rows: Rows = Map.empty,
      defaults: Map[String, Option[(String, String)]] = Map.empty,
      props: Map[String, Option[String]] = Map.empty,
      propsExpected: Map[String, Option[String]] = Map.empty,
      schemaWiden: Boolean = false,
      schemaNullability: Boolean = false,
      repartition: Boolean = false): Commit = {
    requireValidTxn(txn)
    requireValidConstraints(constraints)
    requireValidColMap(colMap)
    requireValidDataChange(dataChange, added, removed, schema)
    val removedSet = removed.toSet
    require(added.distinct == added,
      s"duplicate batch names within one commit: $added")
    require(added.toSet.intersect(removedSet).isEmpty,
      s"a commit cannot both add and remove ${added.toSet.intersect(removedSet)}")
    require(readVersion <= latestVersion(root),
      s"cannot commit on $root from readVersion $readVersion: latest is " +
        s"v${latestVersion(root)} — the caller read a version that does " +
        "not exist")
    var base = readVersion
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      // Idempotence check FIRST, against the base this attempt commits
      // on (re-checked per rebase: the epoch may have been committed by
      // a rival replay of the same writer after a crash-restart race).
      // Order matters: a rival replay publishes the SAME deterministic
      // batch name, so the duplicate-name check below would also trip —
      // but the caller's contract for a replayed unit of work is
      // TxnAlreadyCommittedException ("already done, drop staged
      // files"), not the loud duplicate-name error.
      txn.foreach { case (app, epoch) =>
        txnsOf(root, base).get(app).filter(_ >= epoch).foreach { w =>
          throw new TxnAlreadyCommittedException(app, epoch, w)
        }
      }
      // Property PRECONDITIONS, re-checked per rebase: a caller that
      // planned work against a property value (the identity watermark)
      // must abort if a rival moved it — the files it staged were
      // derived from the stale value and cannot be patched post hoc.
      if (propsExpected.nonEmpty) {
        val cur = tblPropsOf(root, base)
        propsExpected.foreach { case (k, expected) =>
          if (cur.get(k) != expected)
            throw new java.util.ConcurrentModificationException(
              s"conflict at v$base: property '$k' is ${cur.get(k)}, " +
                s"this write planned against $expected (a rival advanced " +
                "it first) — re-run the statement")
        }
      }
      // Conflict + duplicate check against the snapshot at the base this
      // attempt commits on (re-checked per rebase). The snapshot read is
      // bounded metadata — one checkpoint + at most [[checkpointInterval]]
      // deltas — never table-sized. Rejecting an already-listed batch
      // name here is what makes a RETRIED ambiguous commit safe: a
      // writer that crashed after publish and replays its commit gets a
      // loud IllegalArgumentException instead of double-listing the
      // file (every row in it would double-count on read).
      if (removedSet.nonEmpty || added.nonEmpty) {
        val cur = files(root, base).toSet
        if (base != readVersion && !removedSet.subsetOf(cur))
          throw new java.util.ConcurrentModificationException(
            s"conflict at v$base: rival commit removed " +
              s"${removedSet -- cur} first (overlapping copy-on-write)")
        val dup = added.toSet.intersect(cur)
        require(dup.isEmpty,
          s"batch name(s) $dup already listed in snapshot v$base: batch " +
            "names are immutable identities — a re-add would double-list " +
            "the file (retried commit? pick a fresh name per attempt)")
      }
      // Schema arbitration against the base ACTUALLY COMMITTED under
      // (re-checked per rebase: a rival may have evolved it first).
      // Record only a changed schema — inheritance costs zero bytes.
      val toRecord = schema.flatMap { next =>
        schemaOf(root, base) match {
          case None => Some(next)
          case Some(cur) if cur == next => None
          case Some(cur) =>
            // [[restore]] may legally roll the DDL backward, a
            // column-map restatement may rename, a DROP commit may
            // narrow; every other commit must evolve additively —
            // and never by re-declaring a DROPPED (reserved) name,
            // whose data still lives in old files
            // a plain WRITE's schema carries the incoming PLAN's
            // nullability (a VALUES of literals is all-NOT-NULL) —
            // declaration-owned nullability must not tighten under it,
            // or a later INSERT that null-fills an omitted column is
            // refused by the analyzer against the leaked NOT NULL
            val recorded =
              if (schemaRollback || colMap.nonEmpty || schemaDrop ||
                schemaWiden || schemaNullability) next
              else alignNullability(cur, next)
            if (recorded == cur) None // nullability-only drift: inherit
            else {
              if (!schemaRollback) {
                if (colMap.nonEmpty) checkRename(cur, next, colMap)
                else if (schemaDrop) checkDrop(cur, next, droppedCols)
                else if (schemaWiden) checkWiden(cur, recorded)
                else if (schemaNullability) checkNullabilityOnly(cur, recorded)
                else checkEvolution(cur, recorded)
              }
              if (!schemaDrop) {
                import org.apache.spark.sql.types.StructType
                val reserved = droppedOf(root, base)
                val zombie = StructType.fromDDL(recorded).fieldNames
                  .filter(reserved.contains)
                if (zombie.nonEmpty)
                  throw new SchemaChangeException(
                    s"column name(s) ${zombie.mkString(",")} were DROPPED and " +
                      "are reserved forever: old files still carry data under " +
                      "them, and re-declaring would resurrect it — pick a " +
                      "fresh name")
              }
              Some(recorded)
            }
        }
      }
      // a plain write cannot change the partition spec implicitly —
      // only the deliberate SET PARTITIONING verb (`repartition`)
      // re-declares it (re-checked per rebase — a rival CREATE may
      // have declared first)
      if (partCols.nonEmpty && !repartition) {
        val inForce = partColsOf(root, base)
        require(inForce.isEmpty || inForce == partCols,
          s"table is partitioned by (${inForce.mkString(",")}) — a write " +
            s"cannot re-partition by (${partCols.mkString(",")}); use " +
            "CommitLog.setPartitioning (partition evolution) to change " +
            "the spec deliberately")
      }
      if (tryCommit(root, base + 1, added, removed, toRecord, stats, txn,
          dataChange, op, blooms, constraints, colMap, droppedCols,
          parts, partCols, rows, defaults, props)) {
        if ((base + 1) % checkpointInterval == 0)
          writeCheckpoint(root, base + 1)
        return Commit(base + 1, attempts)
      }
      base = latestVersion(root) // lost the race: rebase onto the winner
    }
    throw new IllegalStateException(
      s"commit on $root gave up after $maxAttempts attempts (livelock?)")
  }
}
