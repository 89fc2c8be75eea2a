package graft

import graft.sources.CommitLog
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic concurrency on the S22 commit log: concurrent appends
  * both land exactly once on a linear version history; overlapping
  * copy-on-write deletes abort cleanly (Delta/Iceberg conflict
  * semantics). Pure JVM-level — no Spark needed: the protocol under
  * test is manifest arbitration, not scan planning (the s22 decl and
  * its DuckDB oracle cover the read side). */
class ConcurrentCommitSpec extends AnyFunSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"commitlog_$tag").toString

  test("sequential appends land at consecutive versions, first attempt") {
    val root = freshRoot("seq")
    val c1 = CommitLog.commit(root, 0, added = Seq("b1"))
    val c2 = CommitLog.commit(root, c1.version, added = Seq("b2"))
    assert((c1.version, c1.attempts) == (1, 1))
    assert((c2.version, c2.attempts) == (2, 1))
    assert(CommitLog.files(root, 1) == Seq("b1"))
    assert(CommitLog.files(root, 2) == Seq("b1", "b2"))
    assert(CommitLog.latestVersion(root) == 2)
  }

  test("a forced lost race rebases: the stale appender lands on top of the winner") {
    // deterministic interleaving: A snapshots v1, B commits v2, then A
    // commits from its STALE readVersion — must rebase onto B's files
    val root = freshRoot("rebase")
    CommitLog.commit(root, 0, added = Seq("base"))
    val aReadVersion = CommitLog.latestVersion(root) // A snapshots here
    CommitLog.commit(root, aReadVersion, added = Seq("by_b")) // B wins v2
    val a = CommitLog.commit(root, aReadVersion, added = Seq("by_a"))
    assert(a.version == 3, "loser must land at the NEXT version, not overwrite")
    assert(a.attempts == 2, "exactly one rebase retry")
    assert(CommitLog.files(root, 3) == Seq("base", "by_b", "by_a"),
      "rebase must keep the winner's files")
    assert(CommitLog.files(root, 2) == Seq("base", "by_b"),
      "the winner's manifest must be untouched")
  }

  test("two writers racing the SAME version: both appends land exactly once") {
    val root = freshRoot("race2")
    CommitLog.commit(root, 0, added = Seq("base"))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, CommitLog.Commit]()
    val threads = Seq("x", "y").map { tag =>
      new Thread(() => {
        barrier.await()
        results.put(tag, CommitLog.commit(root, 1, added = Seq(s"by_$tag")))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val (vx, vy) = (results.get("x").version, results.get("y").version)
    assert(Set(vx, vy) == Set(2, 3), s"versions must be linear, got $vx/$vy")
    val finalFiles = CommitLog.files(root, 3)
    assert(finalFiles.count(_ == "by_x") == 1 && finalFiles.count(_ == "by_y") == 1,
      s"both appends exactly once: $finalFiles")
    assert(finalFiles.head == "base")
  }

  test("8-way append race: every commit lands once, history stays linear") {
    val root = freshRoot("race8")
    CommitLog.commit(root, 0, added = Seq("base"))
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          CommitLog.commit(root, 1, added = Seq(s"f$i"))
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(failures.isEmpty, s"no append may abort: ${failures.peek()}")
    assert(CommitLog.latestVersion(root) == 1 + n,
      "one version per committer — dense, no gaps, no overwrites")
    val last = CommitLog.files(root, 1 + n)
    assert(last.sorted == ("base" +: (1 to n).map(i => s"f$i")).sorted,
      s"all $n appends visible exactly once: $last")
    // every intermediate manifest is a strict superset chain: version v
    // holds exactly v files here (base + one per commit)
    (1 to n + 1).foreach(v => assert(CommitLog.files(root, v).size == v))
  }

  test("cross-PROCESS race: four separate JVMs all land exactly once on one log") {
    // thread races exercise the protocol; this exercises the CLAIM the
    // protocol rests on — manifest creation is atomic at the
    // filesystem level (link(2) EEXIST), so even committers in
    // different processes (two Spark drivers on a shared table) can
    // never both own a version
    val root = freshRoot("xproc")
    CommitLog.commit(root, 0, added = Seq("base"))
    val barrier = java.nio.file.Paths.get(root, "go")
    val javaBin = sys.props("java.home") + "/bin/java"
    val n = 4
    val procs = (1 to n).map { i =>
      new ProcessBuilder(
        javaBin, "-cp", sys.props("java.class.path"),
        "graft.CommitRaceMain", root, s"p$i", barrier.toString, "1")
        .redirectErrorStream(true).start()
    }
    Thread.sleep(1500) // let every JVM reach the barrier poll
    java.nio.file.Files.createFile(barrier)
    val outs = procs.map { p =>
      val ok = p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
      if (!ok) p.destroyForcibly()
      new String(p.getInputStream.readAllBytes(), "UTF-8")
    }
    procs.zip(outs).foreach { case (p, o) =>
      assert(p.exitValue() == 0, s"committer process failed:\n$o")
    }
    val landed = outs.flatMap(
      "RACE (p\\d+) (\\d+) (\\d+)".r.findFirstMatchIn(_))
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    assert(landed.size == n, s"every process must report a commit: $outs")
    assert(landed.values.toSet == (2 to n + 1).toSet,
      s"versions must be dense and linear across processes: $landed")
    val last = CommitLog.files(root, n + 1)
    assert(last.sorted == ("base" +: (1 to n).map(i => s"by_p$i")).sorted,
      s"all $n cross-process appends visible exactly once: $last")
  }

  test("overlapping copy-on-write deletes: the loser ABORTS, history stays consistent") {
    val root = freshRoot("cow")
    CommitLog.commit(root, 0, added = Seq("b1", "b2"))
    // writer A rewrites b1 -> b1a (copy-on-write delete) and wins v2
    CommitLog.commit(root, 1, added = Seq("b1a"), removed = Seq("b1"))
    // writer B, still holding the v1 snapshot, also rewrites b1 -> b1b:
    // its removed file is gone from the current manifest — rebasing
    // would resurrect deleted rows, so the protocol must abort
    val ex = intercept[java.util.ConcurrentModificationException] {
      CommitLog.commit(root, 1, added = Seq("b1b"), removed = Seq("b1"))
    }
    assert(ex.getMessage.contains("b1"))
    assert(CommitLog.latestVersion(root) == 2, "the aborted commit left no manifest")
    assert(CommitLog.files(root, 2).sorted == Seq("b1a", "b2"),
      "winner's state intact after the abort")
  }

  private def stage(root: String, batch: String): Unit = {
    val d = java.nio.file.Paths.get(root, batch)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("part-0.bin"), Array[Byte](1, 2, 3))
  }

  test("manifests are O(delta) metadata: a late append's manifest never mentions earlier batches") {
    // the 100 TB property under test: commit metadata must not grow
    // with table size. 30 appends, then check the LAST manifest's bytes
    // name only its own batch — a full-file-list format fails this at
    // the second commit.
    val root = freshRoot("odelta")
    var v = 0
    (1 to 30).foreach { i => v = CommitLog.commit(root, v, added = Seq(f"b$i%03d")).version }
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_log", "v30.json")), "UTF-8")
    assert(txt.contains("b030") && !txt.contains("b001") && !txt.contains("b029"),
      s"manifest not delta-sized: $txt")
    // and the replayed snapshot is still the full table
    assert(CommitLog.files(root, 30) == (1 to 30).map(i => f"b$i%03d"))
  }

  test("checkpoints land at the interval cadence and bound replay; a skipped one only lengthens replay") {
    val root = freshRoot("ckpt")
    val k = CommitLog.checkpointInterval
    var v = 0
    (1 to 2 * k + 3).foreach { i => v = CommitLog.commit(root, v, added = Seq(s"b$i")).version }
    val log = java.nio.file.Paths.get(root, "_log")
    assert(java.nio.file.Files.exists(log.resolve(s"ckpt-v$k.json")))
    assert(java.nio.file.Files.exists(log.resolve(s"ckpt-v${2 * k}.json")))
    val expect = (1 to 2 * k + 3).map(i => s"b$i")
    assert(CommitLog.files(root, 2 * k + 3) == expect)
    // a checkpoint is DERIVED state: losing one (crash between manifest
    // publish and checkpoint write) must not lose data, only lengthen
    // the replay back to the previous checkpoint
    java.nio.file.Files.delete(log.resolve(s"ckpt-v${2 * k}.json"))
    assert(CommitLog.files(root, 2 * k + 3) == expect,
      "replay must survive a missing checkpoint")
    // removes replay too, across a checkpoint boundary
    CommitLog.commit(root, v, added = Seq("rw"), removed = Seq("b1", s"b$k"))
    assert(CommitLog.files(root, v + 1) ==
      expect.filterNot(Set("b1", s"b$k")) :+ "rw")
  }

  test("vacuum checkpoints the cutoff so retained versions survive the expired delta chain") {
    // cutoff NOT on the interval cadence: without the vacuum-written
    // checkpoint, the retained versions' replay would start at an
    // expired manifest and throw
    val root = freshRoot("vacckpt")
    var v = 0
    (1 to 5).foreach { i => v = CommitLog.commit(root, v, added = Seq(s"b$i")).version }
    assert(CommitLog.checkpointInterval > 5, "test premise: no cadence checkpoint yet")
    val stats = CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L) // cutoff = 4
    assert(stats.retainedFrom == 4 && stats.expiredManifests == 3)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_log", "ckpt-v4.json")))
    assert(CommitLog.files(root, 4) == (1 to 4).map(i => s"b$i"))
    assert(CommitLog.files(root, 5) == (1 to 5).map(i => s"b$i"))
    intercept[java.nio.file.NoSuchFileException](CommitLog.files(root, 3))
  }

  test("a wider retention AFTER a narrower one clamps forward, never crashes on the expired floor") {
    // CommitLogProps' first shrunk counterexample: vacuum(keep=1) then
    // vacuum(keep=3) — the naive second cutoff (v1) sits below the
    // already-expired floor, where no replay chain survives to
    // checkpoint; the boundary must clamp to the floor instead
    val root = freshRoot("vac_widen")
    stage(root, "b1"); stage(root, "b2"); stage(root, "b3")
    CommitLog.commit(root, 0, added = Seq("b1", "b2", "b3"))
    CommitLog.commit(root, 1, added = Nil, removed = Seq("b2", "b3"))
    CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L) // floor moves to v2
    val st = CommitLog.vacuum(root, keepLast = 3, minAgeMs = 0L) // wider: must clamp, not crash
    assert(st.retainedFrom == 2, s"cutoff must clamp to the floor: $st")
    assert(st.expiredManifests == 0 && st.sweptBatches.isEmpty)
    assert(CommitLog.files(root, 2) == Seq("b1"))
    intercept[java.nio.file.NoSuchFileException](CommitLog.files(root, 1))
  }

  test("batch names that would corrupt the manifest encoding are rejected at publish") {
    // a name with ',' would comma-split into the WRONG file set on
    // replay — and vacuum would then sweep the real directory as an
    // orphan; '_'/'.'-prefixed names collide with the log/tmp namespace
    val root = freshRoot("names")
    for (bad <- Seq("a,b", "a\"b", "_log", ".hidden", "a/b", "")) {
      intercept[IllegalArgumentException] {
        CommitLog.commit(root, 0, added = Seq(bad))
      }
    }
    assert(CommitLog.latestVersion(root) == 0, "no manifest may publish")
    CommitLog.commit(root, 0, added = Seq("fine-name.parquet"))
    assert(CommitLog.files(root, 1) == Seq("fine-name.parquet"))
  }

  test("schema: first declaration records, inheritance costs zero manifest bytes, history replays") {
    val root = freshRoot("schema")
    val ddl = "id BIGINT, name STRING"
    CommitLog.commit(root, 0, added = Seq("b1"), schema = Some(ddl))
    CommitLog.commit(root, 1, added = Seq("b2"), schema = Some(ddl))
    assert(CommitLog.schemaOf(root, 1).contains(ddl))
    assert(CommitLog.schemaOf(root, 2).contains(ddl))
    // the inheriting commit must NOT re-record the DDL (O(delta)
    // applies to schema metadata too)
    val v2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_log", "v2.json")), "UTF-8")
    assert(!v2.contains("schema"), s"inheriting manifest re-recorded schema: $v2")
  }

  test("schema: additive evolution is recorded in force; time travel keeps the old DDL") {
    val root = freshRoot("schema_evo")
    val v1ddl = "id BIGINT"
    val v2ddl = "id BIGINT, score DOUBLE"
    CommitLog.commit(root, 0, added = Seq("b1"), schema = Some(v1ddl))
    CommitLog.commit(root, 1, added = Seq("b2"), schema = Some(v2ddl))
    assert(CommitLog.schemaOf(root, 1).contains(v1ddl), "old version, old schema")
    assert(CommitLog.schemaOf(root, 2).contains(v2ddl))
  }

  test("schema: dropped or retyped columns are rejected before any manifest publishes") {
    val root = freshRoot("schema_rej")
    CommitLog.commit(root, 0, added = Seq("b1"),
      schema = Some("id BIGINT, name STRING"))
    intercept[CommitLog.SchemaChangeException] {
      CommitLog.commit(root, 1, added = Seq("b2"), schema = Some("id BIGINT"))
    }
    intercept[CommitLog.SchemaChangeException] {
      CommitLog.commit(root, 1, added = Seq("b2"),
        schema = Some("id INT, name STRING"))
    }
    assert(CommitLog.latestVersion(root) == 1,
      "a rejected schema change must leave no manifest behind")
  }

  test("schema: survives vacuum through the cutoff checkpoint") {
    val root = freshRoot("schema_vac")
    stage(root, "b1"); stage(root, "b2"); stage(root, "b3")
    val ddl = "id BIGINT, payload STRING"
    CommitLog.commit(root, 0, added = Seq("b1"), schema = Some(ddl))
    CommitLog.commit(root, 1, added = Seq("b2"))
    CommitLog.commit(root, 2, added = Seq("b3"))
    CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L) // expires the declaring manifest
    assert(CommitLog.schemaOf(root, 3).contains(ddl),
      "schema must ride the cutoff checkpoint past the expired declaration")
  }

  test("vacuum expires old manifests and sweeps only batches no retained version references") {
    val root = freshRoot("vac")
    stage(root, "b1"); stage(root, "b2"); stage(root, "b3")
    CommitLog.commit(root, 0, added = Seq("b1", "b2"))       // v1
    CommitLog.commit(root, 1, added = Seq("b3"))             // v2 = b1,b2,b3
    CommitLog.commit(root, 2, added = Nil, removed = Seq("b2")) // v3 = b1,b3
    val stats = CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L)
    assert(stats.expiredManifests == 2 && stats.retainedFrom == 3)
    // b2 is referenced only by expired versions -> swept; b1 is still
    // live in v3 despite being a v1 file -> kept
    assert(stats.sweptBatches == Seq("b2"), s"swept: ${stats.sweptBatches}")
    assert(CommitLog.latestVersion(root) == 3)
    assert(CommitLog.files(root, 3).sorted == Seq("b1", "b3"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "b1")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "b2")))
    // an expired version now fails cleanly on its missing manifest
    intercept[java.nio.file.NoSuchFileException](CommitLog.files(root, 1))
    // time travel WITHIN retention is untouched: commit v4, keep 2,
    // and v3 must stay readable
    CommitLog.commit(root, 3, added = Seq({ stage(root, "b4"); "b4" }))
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLog.files(root, 3).sorted == Seq("b1", "b3"))
  }

  test("vacuum sweeps orphans from a crashed commit but never a FRESH staged batch") {
    val root = freshRoot("vac_orphan")
    stage(root, "b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    // an old orphan: staged long ago, its commit never published
    stage(root, "orphan_old")
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(root, "orphan_old"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600 * 1000))
    // a racing writer's batch: staged just now, manifest not yet up
    stage(root, "staged_fresh")
    val stats = CommitLog.vacuum(root, keepLast = 1, minAgeMs = 60 * 1000)
    assert(stats.sweptBatches == Seq("orphan_old"),
      s"age guard violated: ${stats.sweptBatches}")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "staged_fresh")),
      "vacuum deleted a concurrent writer's staged batch")
    // the racing writer can still publish after the vacuum
    val c = CommitLog.commit(root, 1, added = Seq("staged_fresh"))
    assert(CommitLog.files(root, c.version).contains("staged_fresh"))
  }

  test("append racing a copy-on-write delete: the append rebases and survives") {
    // disjoint by definition — the append removes nothing, so whichever
    // side loses the version race can rebase
    val root = freshRoot("cowapp")
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Seq("b1a"), removed = Seq("b1")) // delete wins v2
    val app = CommitLog.commit(root, 1, added = Seq("b2")) // stale append
    assert(app.version == 3)
    assert(CommitLog.files(root, 3).sorted == Seq("b1a", "b2"),
      "append must land on the post-delete file set")
    // and the mirrored order: append wins v2 first, delete rebases on top
    val root2 = freshRoot("cowapp2")
    CommitLog.commit(root2, 0, added = Seq("b1"))
    CommitLog.commit(root2, 1, added = Seq("b2")) // append wins v2
    val del = CommitLog.commit(root2, 1, added = Seq("b1a"), removed = Seq("b1"))
    assert(del.version == 3)
    assert(CommitLog.files(root2, 3).sorted == Seq("b1a", "b2"),
      "delete must rebase over the disjoint append")
  }

  test("re-adding a batch name already in the snapshot is rejected loudly") {
    // the retried-ambiguous-commit failure mode: a writer crashes after
    // publish, replays its commit verbatim — without the check the file
    // would be double-listed and every row in it double-counted on read
    val root = freshRoot("dup")
    CommitLog.commit(root, 0, added = Seq("b1"))
    val e = intercept[IllegalArgumentException] {
      CommitLog.commit(root, 1, added = Seq("b1"))
    }
    assert(e.getMessage.contains("already listed"), e.getMessage)
    assert(CommitLog.latestVersion(root) == 1, "no manifest may publish")
    // the check re-runs on rebase: a STALE writer whose name landed via
    // a rival must also be refused
    CommitLog.commit(root, 1, added = Seq("b2")) // rival wins v2
    val stale = intercept[IllegalArgumentException] {
      CommitLog.commit(root, 1, added = Seq("b2"))
    }
    assert(stale.getMessage.contains("already listed"), stale.getMessage)
    // duplicates WITHIN one commit and add∩remove are refused up front
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, 2, added = Seq("b3", "b3"))
    }
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, 2, added = Seq("b1"), removed = Seq("b1"))
    }
  }

  test("manifest stats replay with the snapshot, survive checkpoints and vacuum, drop with their batch") {
    // stats are pure manifest metadata: no data files needed to pin the
    // replay/pruning protocol
    val root = freshRoot("stats")
    def box(b: String, lo: Double, hi: Double) = Map(b -> Map("k" -> CommitLog.ColStat(lo, hi)))
    CommitLog.commit(root, 0, added = Seq("b1"), stats = box("b1", 0, 99))
    CommitLog.commit(root, 1, added = Seq("b2"), stats = box("b2", 100, 199))
    CommitLog.commit(root, 2, added = Seq("b3"))  // no stats: never prunes
    assert(CommitLog.prunedFiles(root, 3, "k", 0, 50) == Seq("b1", "b3"),
      "b2's box misses [0,50]; statless b3 must be kept")
    assert(CommitLog.prunedFiles(root, 3, "k", 150, 160) == Seq("b2", "b3"))
    assert(CommitLog.prunedFiles(root, 3, "other_col", 0, 1)
      == Seq("b1", "b2", "b3"), "an un-boxed column never prunes")
    // a removed batch's box leaves the snapshot with it
    CommitLog.commit(root, 3, added = Seq("b1a"),
      removed = Seq("b1"), stats = box("b1a", 0, 49))
    assert(CommitLog.prunedFiles(root, 4, "k", 60, 99) == Seq("b3"),
      "b1's [0,99] box must not survive its removal; b1a's [0,49] prunes")
    // force the cadence checkpoint (interval 8) and replay THROUGH it
    (5 to 8).foreach(i => CommitLog.commit(root, i - 1, added = Seq(s"x$i")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_log", "ckpt-v8.json")))
    assert(CommitLog.statsOf(root, 8)("b1a")("k").box.contains((0.0, 49.0)),
      "boxes must ride the checkpoint")
    // time travel keeps the OLD boxes: v3 still sees b1's
    assert(CommitLog.statsOf(root, 3)("b1")("k").box.contains((0.0, 99.0)))
    // vacuum to the floor: surviving boxes re-read from the cutoff ckpt
    CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L)
    assert(CommitLog.statsOf(root, 8)("b2")("k").box.contains((100.0, 199.0)))
    // stats for a batch the commit does not add are refused
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, 8, added = Seq("y"), stats = box("z", 0, 1))
    }
  }

  test("replay dedupes a double-listed name from a pre-check log") {
    // logs written before commit() rejected duplicates may carry a
    // re-add; replay must not double-list (tryCommit is the raw
    // manifest publish — no snapshot check, like the old commit path)
    val root = freshRoot("dedupe")
    assert(CommitLog.tryCommit(root, 1, added = Seq("b1"), removed = Nil))
    assert(CommitLog.tryCommit(root, 2, added = Seq("b1", "b2"), removed = Nil))
    assert(CommitLog.files(root, 2) == Seq("b1", "b2"),
      s"duplicate add must replay once: ${CommitLog.files(root, 2)}")
  }
}
