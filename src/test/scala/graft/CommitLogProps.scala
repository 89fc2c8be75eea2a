package graft

import graft.sources.CommitLog
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck model check for the commit-log protocol: arbitrary
  * interleavings of appends, copy-on-write rewrites, pure deletes,
  * schema declarations, and vacuums are applied in lockstep to the
  * REAL filesystem log and to a trivial in-memory model (a list of
  * (fileSet, schema) snapshots). After every op, every RETAINED
  * version must replay to exactly the model's snapshot — across
  * checkpoint boundaries, after vacuums that sever the delta chain,
  * and under any schema history — and every EXPIRED version must fail
  * cleanly. This is the law the hand-written ConcurrentCommitSpec
  * cases instantiate; here the sequences are adversarial and random. */
object CommitLogProps extends Properties("graft.commitlog") {

  // one model snapshot per version (index 0 = v1)
  private final case class Model(
      versions: Vector[(Vector[String], Option[String])] = Vector.empty,
      expiredBelow: Int = 1) { // lowest retained version
    def latest: Int = versions.size
    def current: Vector[String] =
      versions.lastOption.map(_._1).getOrElse(Vector.empty)
    def currentSchema: Option[String] =
      versions.lastOption.flatMap(_._2)
  }

  private sealed trait Op
  private case class Append(n: Int, schema: Option[String]) extends Op
  private case class Rewrite(k: Int) extends Op // COW: remove k, add 1
  private case class Delete(k: Int) extends Op // pure remove
  private case class Vacuum(keep: Int) extends Op

  private val schemaGen: Gen[Option[String]] = Gen.frequency(
    5 -> Gen.const(None),
    // evolution chain: each declared schema is a prefix-extension of
    // the previous (the only legal change), realized by indexing a
    // fixed additive family
    1 -> Gen.choose(1, 4).map(i =>
      Some((1 to i).map(c => s"c$c BIGINT").mkString(", "))))

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.zip(Gen.choose(1, 3), schemaGen).map { case (n, s) => Append(n, s) },
    2 -> Gen.choose(1, 2).map(Rewrite(_)),
    1 -> Gen.choose(1, 2).map(Delete(_)),
    2 -> Gen.choose(1, 4).map(Vacuum(_)))

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("cl_props").toString

  private def stage(root: String, name: String): Unit = {
    val d = java.nio.file.Paths.get(root, name)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("part-0.bin"), Array[Byte](7))
  }

  /** The legal-evolution guard: schemas in the additive family are
    * ordered by column count; declaring a SHORTER one than current is
    * illegal (drops columns) and must throw without publishing. */
  private def cols(s: String): Int = s.count(_ == ',') + 1

  property("random op sequences: every retained version replays the model; expired reads fail") =
    Prop.forAll(Gen.listOfN(30, opGen)) { ops =>
      val root = freshRoot()
      var model = Model()
      var fresh = 0
      def nextName(): String = { fresh += 1; s"f$fresh" }

      ops.foreach {
        case Append(n, schema) =>
          val names = Vector.fill(n)(nextName())
          names.foreach(stage(root, _))
          val legal = schema.forall(s =>
            model.currentSchema.forall(cur => cols(s) >= cols(cur)))
          if (legal) {
            CommitLog.commit(root, model.latest, added = names, schema = schema)
            model = model.copy(versions = model.versions :+
              ((model.current ++ names,
                schema.orElse(model.currentSchema))))
          } else {
            val before = model.latest
            try {
              CommitLog.commit(root, model.latest, added = names, schema = schema)
              throw new AssertionError("illegal schema change accepted")
            } catch { case _: CommitLog.SchemaChangeException => () }
            assert(CommitLog.latestVersion(root) == before,
              "rejected schema change must publish nothing")
          }
        case Rewrite(k0) =>
          val cur = model.current
          if (cur.nonEmpty) {
            val k = math.min(k0, cur.size)
            val removed = cur.takeRight(k)
            val added = Vector(nextName())
            added.foreach(stage(root, _))
            CommitLog.commit(root, model.latest,
              added = added, removed = removed)
            model = model.copy(versions = model.versions :+
              ((cur.filterNot(removed.toSet) ++ added, model.currentSchema)))
          }
        case Delete(k0) =>
          val cur = model.current
          if (cur.nonEmpty) {
            val k = math.min(k0, cur.size)
            val removed = cur.take(k)
            CommitLog.commit(root, model.latest, added = Nil,
              removed = removed)
            model = model.copy(versions = model.versions :+
              ((cur.filterNot(removed.toSet), model.currentSchema)))
          }
        case Vacuum(keep) =>
          if (model.latest >= 1) {
            CommitLog.vacuum(root, keepLast = keep, minAgeMs = 0L)
            model = model.copy(expiredBelow =
              math.max(model.expiredBelow, math.max(1, model.latest - keep + 1)))
          }
      }

      // the laws, checked over the ENTIRE history at the end (each
      // retained version must replay across whatever mix of
      // checkpoints and deltas the run left behind)
      val latestOk = CommitLog.latestVersion(root) == model.latest
      val retainedOk = (model.expiredBelow to model.latest).forall { v =>
        val (files, schema) = model.versions(v - 1)
        CommitLog.files(root, v) == files &&
          CommitLog.schemaOf(root, v) == schema
      }
      val expiredOk = (1 until model.expiredBelow).forall { v =>
        try { CommitLog.files(root, v); false }
        catch { case _: java.nio.file.NoSuchFileException => true }
      }
      // vacuum must never have swept a batch any retained version needs
      val liveOk = (model.expiredBelow to model.latest)
        .flatMap(v => model.versions(v - 1)._1).toSet
        .forall(f => java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, f)))

      Prop(latestOk) :| "latestVersion matches model" &&
        Prop(retainedOk) :| "every retained version replays the model" &&
        Prop(expiredOk) :| "every expired version fails cleanly" &&
        Prop(liveOk) :| "no live batch swept"
    }

  // ---- Round-11 manifest state: stats boxes, blooms, txn watermarks,
  // dataChange — the same lockstep-model law over the NEW per-commit
  // metadata. Replay of each retained version must reproduce: the
  // boxes/blooms of exactly its live batches, the monotone per-app txn
  // watermark over its whole prefix (surviving vacuum via the cutoff
  // checkpoint), and the dataChange flag of every readable manifest;
  // and a replayed txn epoch must throw WITHOUT publishing.

  private sealed trait Op2
  private case class Append2(
      n: Int, withStats: Boolean, withBloom: Boolean,
      withRows: Boolean, txnEpoch: Option[Long]) extends Op2
  private case class Rewrite2(k: Int, layoutOnly: Boolean) extends Op2
  private case class Vacuum2(keep: Int) extends Op2

  private val op2Gen: Gen[Op2] = Gen.frequency(
    6 -> (for {
      n <- Gen.choose(1, 3)
      st <- Gen.oneOf(true, false)
      bl <- Gen.oneOf(true, false)
      rw <- Gen.oneOf(true, false)
      tx <- Gen.frequency(
        2 -> Gen.const(None),
        // epochs from a SMALL range so replays (epoch <= watermark)
        // actually occur and must be rejected
        2 -> Gen.choose(0L, 5L).map(Some(_)))
    } yield Append2(n, st, bl, rw, tx)),
    2 -> Gen.zip(Gen.choose(1, 2), Gen.oneOf(true, false))
      .map { case (k, lo) => Rewrite2(k, lo) },
    2 -> Gen.choose(1, 4).map(Vacuum2(_)))

  property("round-11 metadata: stats/blooms/txn/dataChange replay the model under vacuum") =
    Prop.forAll(Gen.listOfN(25, op2Gen)) { ops =>
      import graft.sources.CommitLogBloom
      val root = freshRoot()
      var files = Vector.empty[Vector[String]] // per version
      var dataChange = Vector.empty[Boolean]
      var txnAt = Vector.empty[Map[String, Long]]
      var boxes = Map.empty[String, Map[String, graft.sources.CommitLog.ColStat]]
      var blooms = Map.empty[String, Map[String, String]]
      var rowCounts = Map.empty[String, Long]
      var expiredBelow = 1
      var fresh = 0
      def latest = files.size
      def cur = files.lastOption.getOrElse(Vector.empty)
      def curTxn = txnAt.lastOption.getOrElse(Map.empty)
      def nextName(): String = { fresh += 1; s"g$fresh" }

      ops.foreach {
        case Append2(n, withStats, withBloom, withRows, txnEpoch) =>
          val names = Vector.fill(n)(nextName())
          names.foreach(stage(root, _))
          val st: CommitLog.Stats =
            if (!withStats) Map.empty
            else names.map(b => b -> Map("x" -> CommitLog.ColStat(fresh.toDouble, fresh + 1.0))).toMap
          val bl: CommitLog.Blooms =
            if (!withBloom) Map.empty
            else names.map { b =>
              val bits = CommitLogBloom.emptyBits(64)
              CommitLogBloom.add(bits, b)
              b -> Map("k" -> CommitLogBloom.toHex(bits))
            }.toMap
          val rw: CommitLog.Rows =
            if (!withRows) Map.empty
            else names.map(b => b -> (fresh.toLong % 7)).toMap
          val replay = txnEpoch.exists(e => curTxn.get("app1").exists(_ >= e))
          if (replay) {
            val before = latest
            try {
              CommitLog.commit(root, before, added = names, stats = st,
                blooms = bl, rows = rw, txn = txnEpoch.map(("app1", _)))
              throw new AssertionError("replayed txn epoch accepted")
            } catch { case _: CommitLog.TxnAlreadyCommittedException => () }
            assert(CommitLog.latestVersion(root) == before,
              "rejected replay must publish nothing")
          } else {
            CommitLog.commit(root, latest, added = names, stats = st,
              blooms = bl, rows = rw, txn = txnEpoch.map(("app1", _)))
            files = files :+ (cur ++ names)
            dataChange = dataChange :+ true
            txnAt = txnAt :+ txnEpoch.fold(curTxn)(e => curTxn + ("app1" -> e))
            boxes ++= st
            blooms ++= bl
            rowCounts ++= rw
          }
        case Rewrite2(k0, layoutOnly) =>
          if (cur.nonEmpty) {
            val k = math.min(k0, cur.size)
            val removed = cur.takeRight(k)
            val added = Vector(nextName())
            added.foreach(stage(root, _))
            // a layout rewrite restates its sources' rows: the pack
            // carries their summed count exactly when all are counted
            // (the OPTIMIZE contract); a data rewrite carries none
            val packRows: CommitLog.Rows =
              if (layoutOnly && removed.forall(rowCounts.contains))
                Map(added.head -> removed.map(rowCounts).sum)
              else Map.empty
            CommitLog.commit(root, latest, added = added, removed = removed,
              dataChange = !layoutOnly, rows = packRows)
            rowCounts ++= packRows
            files = files :+ (cur.filterNot(removed.toSet) ++ added)
            dataChange = dataChange :+ !layoutOnly
            txnAt = txnAt :+ curTxn
            // boxes/blooms stay in the append-only assignment map: an
            // EARLIER retained version where the batch is still live
            // must keep replaying them — the live-set filter below is
            // what models removal, per version
          }
        case Vacuum2(keep) =>
          if (latest >= 1) {
            CommitLog.vacuum(root, keepLast = keep, minAgeMs = 0L)
            expiredBelow = math.max(expiredBelow, math.max(1, latest - keep + 1))
          }
      }

      val retained = (expiredBelow to latest)
      val statsOk = retained.forall { v =>
        val live = files(v - 1).toSet
        CommitLog.statsOf(root, v) ==
          boxes.filter { case (b, _) => live(b) }
      }
      val bloomsOk = retained.forall { v =>
        val live = files(v - 1).toSet
        CommitLog.bloomsOf(root, v) ==
          blooms.filter { case (b, _) => live(b) }
      }
      val rowsOk = retained.forall { v =>
        val live = files(v - 1).toSet
        CommitLog.rowsOf(root, v) ==
          rowCounts.filter { case (b, _) => live(b) }
      }
      val txnOk = retained.forall { v =>
        CommitLog.txnsOf(root, v) == txnAt(v - 1)
      }
      val dcOk = retained.forall { v =>
        // dataChange rides the manifest; a version whose manifest was
        // vacuumed but survives via checkpoint has no manifest to ask
        !java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, "_log", s"v$v.json")) ||
          CommitLog.isDataChange(root, v) == dataChange(v - 1)
      }
      val changesOk = retained.drop(1).forall { v =>
        CommitLog.changes(root, v - 1, v).head.dataChange == dataChange(v - 1)
      }

      Prop(statsOk) :| "statsOf replays live-batch boxes at every retained version" &&
        Prop(bloomsOk) :| "bloomsOf replays live-batch blooms at every retained version" &&
        Prop(rowsOk) :| "rowsOf replays live-batch counts at every retained version" &&
        Prop(txnOk) :| "txnsOf replays the monotone watermark at every retained version" &&
        Prop(dcOk) :| "isDataChange reads the manifest flag" &&
        Prop(changesOk) :| "changes() carries the dataChange flag"
    }

  // ---- Schema-verb state machine: RENAME COLUMN / DROP COLUMN /
  // constraint add+tombstone under vacuum. The lockstep model tracks
  // (columns, column map, dropped registry, constraints) per version;
  // every retained version must replay all four, illegal verbs
  // (renaming onto a live/former/reserved name, dropping the last
  // column or a CHECK-referenced one, re-declaring a dropped name)
  // must throw without publishing, and the registries must survive
  // checkpoint-severed replay after vacuum.

  private final case class SchemaState(
      cols: Vector[String],
      colMap: Map[String, Seq[String]],
      dropped: Seq[String],
      cons: Map[String, String])

  private sealed trait Op3
  private case object Append3 extends Op3
  private case class Rename3(colIdx: Int, illegalKind: Int) extends Op3
  private case class Drop3(colIdx: Int) extends Op3
  private case object AddCol3 extends Op3
  private case class ReAddDropped3() extends Op3
  private case class AddCons3(colIdx: Int) extends Op3
  private case object DropCons3 extends Op3
  private case class Vacuum3(keep: Int) extends Op3

  private val op3Gen: Gen[Op3] = Gen.frequency(
    4 -> Gen.const(Append3),
    3 -> Gen.zip(Gen.choose(0, 9), Gen.choose(0, 3))
      .map { case (i, k) => Rename3(i, k) },
    2 -> Gen.choose(0, 9).map(Drop3(_)),
    2 -> Gen.const(AddCol3),
    1 -> Gen.const(ReAddDropped3()),
    2 -> Gen.choose(0, 9).map(AddCons3(_)),
    1 -> Gen.const(DropCons3),
    2 -> Gen.choose(1, 4).map(Vacuum3(_)))

  property("schema verbs: rename/drop/constraints replay the model; illegal verbs publish nothing") =
    Prop.forAll(Gen.listOfN(25, op3Gen)) { ops =>
      import org.apache.spark.sql.types.StructType
      val root = freshRoot()
      var fresh = 0
      def nextName(): String = { fresh += 1; s"n$fresh" }
      def nextBatch(): String = { fresh += 1; s"b$fresh" }

      // v1: declare the table
      val b0 = nextBatch(); stage(root, b0)
      CommitLog.commit(root, 0, added = Seq(b0),
        schema = Some("c1 BIGINT, c2 BIGINT, c3 BIGINT"))
      val s0 = SchemaState(Vector("c1", "c2", "c3"), Map.empty, Nil, Map.empty)
      var hist = Vector(s0)
      var expiredBelow = 1
      def cur = hist.last
      def latest = hist.size

      def mustNotPublish(body: => Unit): Unit = {
        val before = latest
        try { body; throw new AssertionError("illegal verb accepted") }
        catch {
          case _: IllegalArgumentException => ()
          case _: CommitLog.SchemaChangeException => ()
        }
        assert(CommitLog.latestVersion(root) == before,
          "rejected verb must publish nothing")
      }

      ops.foreach {
        case Append3 =>
          val b = nextBatch(); stage(root, b)
          CommitLog.commit(root, latest, added = Seq(b))
          hist = hist :+ cur
        case Rename3(i, kind) =>
          val c = cur.cols(i % cur.cols.size)
          val refd = cur.cons.values.exists(_.contains(c))
          val reservedPool = cur.dropped ++ cur.colMap.values.flatten
          kind match {
            case 0 => // legal rename to a fresh name (unless CHECK'd)
              val to = nextName()
              if (refd) mustNotPublish(CommitLog.renameColumn(root, c, to))
              else {
                CommitLog.renameColumn(root, c, to)
                val chain = c +: cur.colMap.getOrElse(c, Seq.empty)
                hist = hist :+ cur.copy(
                  cols = cur.cols.map(x => if (x == c) to else x),
                  colMap = (cur.colMap - c) + (to -> chain))
              }
            case 1 => // onto a live column: illegal
              val other = cur.cols((i + 1) % cur.cols.size)
              if (other != c)
                mustNotPublish(CommitLog.renameColumn(root, c, other))
            case 2 => // onto a reserved former/dropped name: illegal
              if (reservedPool.nonEmpty)
                mustNotPublish(CommitLog.renameColumn(root, c,
                  reservedPool(i % reservedPool.size)))
            case _ => // unknown source column: illegal
              mustNotPublish(CommitLog.renameColumn(root, "ghost", nextName()))
          }
        case Drop3(i) =>
          val c = cur.cols(i % cur.cols.size)
          val refd = cur.cons.values.exists(_.contains(c))
          if (cur.cols.size == 1 || refd)
            mustNotPublish(CommitLog.dropColumn(root, c))
          else {
            CommitLog.dropColumn(root, c)
            hist = hist :+ cur.copy(
              cols = cur.cols.filterNot(_ == c),
              dropped = (cur.dropped ++
                (c +: cur.colMap.getOrElse(c, Seq.empty))).distinct)
          }
        case AddCol3 =>
          val c = nextName()
          val ddl = cur.cols.map(x => s"$x BIGINT").mkString(", ") +
            s", $c BIGINT"
          CommitLog.commit(root, latest, added = Nil, schema = Some(ddl))
          hist = hist :+ cur.copy(cols = cur.cols :+ c)
        case ReAddDropped3() =>
          if (cur.dropped.nonEmpty) {
            val ddl = (cur.cols :+ cur.dropped.head)
              .map(x => s"$x BIGINT").mkString(", ")
            mustNotPublish(
              CommitLog.commit(root, latest, added = Nil, schema = Some(ddl)))
          }
        case AddCons3(i) =>
          val c = cur.cols(i % cur.cols.size)
          val name = s"cons_$fresh"; fresh += 1
          CommitLog.commit(root, latest, added = Nil, removed = Nil,
            constraints = Map(name -> s"$c > 0"))
          hist = hist :+ cur.copy(cons = cur.cons + (name -> s"$c > 0"))
        case DropCons3 =>
          if (cur.cons.nonEmpty) {
            val name = cur.cons.keys.min
            CommitLog.dropConstraint(root, name)
            hist = hist :+ cur.copy(cons = cur.cons - name)
          }
        case Vacuum3(keep) =>
          CommitLog.vacuum(root, keepLast = keep, minAgeMs = 0L)
          expiredBelow = math.max(expiredBelow,
            math.max(1, latest - keep + 1))
      }

      val retained = (expiredBelow to latest)
      val schemaOk = retained.forall { v =>
        CommitLog.schemaOf(root, v).exists(d =>
          StructType.fromDDL(d).fieldNames.toSeq == hist(v - 1).cols)
      }
      val mapOk = retained.forall { v =>
        CommitLog.formerNamesOf(root, v) == hist(v - 1).colMap
      }
      val droppedOk = retained.forall { v =>
        CommitLog.droppedOf(root, v).toSet == hist(v - 1).dropped.toSet
      }
      val consOk = retained.forall { v =>
        CommitLog.constraintsOf(root, v) == hist(v - 1).cons
      }

      Prop(schemaOk) :| "schemaOf replays the column list at every retained version" &&
        Prop(mapOk) :| "formerNamesOf replays the column map" &&
        Prop(droppedOk) :| "droppedOf replays the reserve registry" &&
        Prop(consOk) :| "constraintsOf replays adds and tombstones"
    }
}
