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
}
