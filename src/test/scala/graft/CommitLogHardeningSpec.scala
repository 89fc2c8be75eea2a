package graft

import graft.sources.{CommitLog, CommitLogCdf, CommitLogDml, CommitLogMerge, CommitLogOptimize, CommitLogWrite}
import org.apache.spark.sql.functions._

/** Review-pass hardening: type-drift rejection on MERGE/UPDATE, CHECK
  * enforcement on MERGE, DROP CONSTRAINT lifecycle, unanalyzable
  * constraints rejected at declaration, CDF across schema evolution,
  * the rewrite-commit DV guard, and restore carrying pruning
  * metadata. */
class CommitLogHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("harden").toString

  private def baseTable(root: String): Unit =
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()

  test("type-drifted MERGE source and UPDATE assignment are rejected") {
    val root = freshRoot()
    baseTable(root)
    val e1 = intercept[IllegalArgumentException] {
      CommitLogMerge.merge(spark, root,
        Seq((1L, "oops", "U")).toDF("k", "v", "_op"), keyCols = Seq("k"))
    }
    assert(e1.getMessage.contains("cast explicitly"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      CommitLogDml.update(spark, root, "k = 1",
        Seq("v" -> "concat('x', v)"))
    }
    assert(e2.getMessage.contains("cast explicitly"), e2.getMessage)
    // nothing committed by either rejection
    assert(CommitLog.latestVersion(root) == 1)
  }

  test("MERGE enforces the CHECKs in force on every written row") {
    val root = freshRoot()
    baseTable(root)
    CommitLogWrite.addConstraint(spark, root, "v_pos", "v > 0")
    val v0 = CommitLog.latestVersion(root)
    // an insert (unmatched U) violating the CHECK
    val e = intercept[CommitLog.ConstraintViolationException] {
      CommitLogMerge.merge(spark, root,
        Seq((999L, -5L, "U")).toDF("k", "v", "_op"), keyCols = Seq("k"))
    }
    assert(e.name == "v_pos" && e.violations == 1)
    assert(CommitLog.latestVersion(root) == v0, "nothing may commit")
    // a postimage (matched U) violating it
    intercept[CommitLog.ConstraintViolationException] {
      CommitLogMerge.merge(spark, root,
        Seq((1L, 0L, "U")).toDF("k", "v", "_op"), keyCols = Seq("k"))
    }
    // deletes never violate
    val ok = CommitLogMerge.merge(spark, root,
      Seq((1L, 10L, "D")).toDF("k", "v", "_op"), keyCols = Seq("k"))
    assert(ok.deleted == 1)
  }

  test("DROP CONSTRAINT retracts; the registry survives checkpoints") {
    val root = freshRoot()
    baseTable(root)
    CommitLogWrite.addConstraint(spark, root, "v_pos", "v > 0")
    intercept[CommitLog.ConstraintViolationException] {
      Seq((60L, -1L)).toDF("k", "v").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val c = CommitLog.dropConstraint(root, "v_pos")
    assert(CommitLog.constraintsOf(root, c.version).isEmpty)
    assert(CommitLog.history(root).last.operation.contains("DROP CONSTRAINT"))
    // the previously-violating write now lands
    Seq((60L, -1L)).toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    // the drop makes rename guidance actionable
    CommitLogWrite.addConstraint(spark, root, "k_pos", "k > 0")
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "k", "key")
    }
    CommitLog.dropConstraint(root, "k_pos")
    CommitLog.renameColumn(root, "k", "key")
    // roll past the checkpoint interval and vacuum: resolved set stays
    (1 to 8).foreach { i =>
      Seq((1000L + i, i.toLong)).toDF("key", "v").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLog.constraintsOf(
      root, CommitLog.latestVersion(root)).isEmpty)
    intercept[IllegalArgumentException] {
      CommitLog.dropConstraint(root, "nope")
    }
  }

  test("unparsable or unknown-column constraints are rejected upfront") {
    val root = freshRoot()
    baseTable(root)
    intercept[IllegalArgumentException] {
      CommitLogWrite.addConstraint(spark, root, "bad", "v >")
    }
    intercept[IllegalArgumentException] {
      CommitLogWrite.addConstraint(spark, root, "ghost", "no_such_col > 0")
    }
    // the sink still works — nothing unanalyzable entered force
    Seq((60L, 600L)).toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
  }

  test("CDF across an additive schema evolution null-fills, not crashes") {
    val root = freshRoot()
    (1 to 5).map(i => (i.toLong, i * 10L)).toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    (6 to 8).map(i => (i.toLong, i * 10L, s"n$i")).toDF("k", "v", "note")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val feed = CommitLogCdf.changeFeed(spark, root, 0, 2, keyCols = Seq("k"))
    assert(feed.count() == 8)
    assert(feed.filter(col("note").isNull).count() == 5,
      "pre-evolution rows must null-fill the evolved column")
  }

  test("an evolving append from a NOT-NULL plan records the new column nullable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nul").toString
    spark.conf.set("spark.sql.catalog.nul", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nul.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nul.db")
    spark.sql("CREATE TABLE nul.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO nul.db.t SELECT id, id * 10 FROM range(1, 6)")
    // an evolving append whose PLAN types the new column NOT NULL (a
    // projection of literals): the log must record it NULLABLE — every
    // pre-evolution file null-fills it on read, and later inserts may
    // omit it
    val root = s"$wh/db/t"
    (6 to 8).map(i => (i.toLong, i * 10L, s"n$i")).toDF("k", "v", "note")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val recorded = org.apache.spark.sql.types.StructType.fromDDL(
      CommitLog.schemaOf(root, CommitLog.latestVersion(root)).get)
    assert(recorded("note").nullable,
      s"evolved column must land nullable, got ${recorded.toDDL}")
    // the analyzer null-fills an insert OMITTING the evolved column —
    // a leaked NOT NULL would refuse it
    spark.sql("INSERT INTO nul.db.t (k, v) VALUES (9, 90)")
    val all = spark.sql("SELECT * FROM nul.db.t")
    assert(all.count() == 9)
    assert(all.filter(col("note").isNull).count() == 6)
  }

  test("a rewrite commit aborts instead of rebasing past a DV commit") {
    val root = freshRoot()
    baseTable(root) // v1
    // stage a pack of the current (pre-DV) rows, as optimize would
    val smalls = CommitLog.files(root, 1)
    spark.read.format("commitlog").option("path", root).load()
      .coalesce(1).write.parquet(s"$root/packX")
    // a DV-leg delete lands FIRST
    val d = CommitLogDml.delete(spark, root, "k = 7")
    assert(d.leg == "dv")
    // the rewrite's commit loop must refuse to rebase past it
    intercept[java.util.ConcurrentModificationException] {
      CommitLogOptimize.commitRewrite(root, readVersion = 1,
        added = Seq("packX"), removed = smalls,
        stats = Map.empty, blooms = Map.empty, op = "OPTIMIZE")
    }
    // and the deleted row stayed deleted
    assert(!CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap.contains(7L))
  }

  test("chaos: appends, DML verbs and an optimizer converge to the serial-order state") {
    // one table, three actors: an appender landing 12 disjoint batches
    // (rebasing appends always win), a DML loop firing DELETE/UPDATE
    // at the latest version (serializable — losing a race throws and
    // the loop retries against the new snapshot), and an optimizer
    // whose layout rewrites must abort rather than rebase past DV
    // commits. Every SUCCESSFUL op records its committed version and
    // its semantic effect; because appends are state-independent and
    // DML only ever commits at readVersion+1, replaying the effects in
    // version order is an EXACT oracle for the final table.
    val root = freshRoot()
    (0 until 10).map(i => (i.toLong, 0L)).toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val ops = new java.util.concurrent.ConcurrentHashMap[
      Int, Map[Long, Long] => Map[Long, Long]]()
    ops.put(1, _ ++ (0L until 10L).map(_ -> 0L).toMap)
    @volatile var writerDone = false
    @volatile var dmlWins = 0
    @volatile var dmlLost = 0
    @volatile var optimizeLost = 0

    val writer = new Thread(() => {
      (1 until 12).foreach { b =>
        val rows = (b * 10 until b * 10 + 10).map(i => (i.toLong, 0L))
        val batch = f"app$b%03d"
        rows.toDF("k", "v").repartition(1).write.parquet(s"$root/$batch")
        val c = CommitLog.commit(root, CommitLog.latestVersion(root),
          added = Seq(batch))
        ops.put(c.version, _ ++ rows.toMap)
        Thread.sleep(8)
      }
      writerDone = true
    }, "chaos-appender")

    val dml = new Thread(() => {
      var i = 0
      // keep firing until a few verbs LAND (each verb takes seconds on
      // a cold table — the writer may finish first), bounded by a
      // deadline so a livelock can't hang the suite
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while ((!writerDone || dmlWins < 3) && System.nanoTime() < deadline) {
        i += 1
        try {
          if (i % 2 == 0) {
            val r = i % 7
            val st = CommitLogDml.delete(spark, root, s"k % 7 = $r")
            if (st.leg != "noop") {
              ops.put(st.version, _.filter { case (k, _) => k % 7 != r })
              dmlWins += 1
            }
          } else {
            val j = i % 5
            val st = CommitLogDml.update(spark, root, s"k % 5 = $j",
              Seq("v" -> "v + 10"))
            if (st.leg != "noop") {
              ops.put(st.version, _.map { case (k, v) =>
                if (k % 5 == j) (k, v + 10L) else (k, v) })
              dmlWins += 1
            }
          }
        } catch {
          case _: java.util.ConcurrentModificationException => dmlLost += 1
        }
        Thread.sleep(5)
      }
    }, "chaos-dml")

    val optimizer = new Thread(() => {
      while (!writerDone) {
        try CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
        catch {
          case _: java.util.ConcurrentModificationException => optimizeLost += 1
          case _: IllegalStateException => optimizeLost += 1
        }
        Thread.sleep(25)
      }
    }, "chaos-optimizer")

    writer.start(); dml.start(); optimizer.start()
    writer.join(60000); dml.join(60000); optimizer.join(60000)

    import scala.jdk.CollectionConverters._
    val expected = ops.asScala.toSeq.sortBy(_._1)
      .foldLeft(Map.empty[Long, Long]) { case (m, (_, f)) => f(m) }
    val got = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(got == expected,
      s"serial-order replay mismatch: got ${got.size} rows, expected " +
        s"${expected.size} (dml wins=$dmlWins lost=$dmlLost " +
        s"optimize lost=$optimizeLost)")
    assert(dmlWins > 0, "the DML loop must have landed at least one verb")
    // retention over the raced history: latest stays exact
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap == expected)
  }

  test("vacuum dry run predicts the real sweep and deletes nothing") {
    val root = freshRoot()
    baseTable(root) // v1: one sink batch
    val b1 = CommitLog.files(root, 1).head
    CommitLog.commit(root, 1, added = Nil, removed = Seq(b1)) // v2: b1 dead
    val dry = CommitLog.vacuumDryRun(root, keepLast = 1, minAgeMs = 0L)
    assert(dry.sweptBatches == Seq(b1) && dry.retainedFrom == 2, dry)
    // nothing was touched
    assert(CommitLog.files(root, 1) == Seq(b1),
      "dry run must not expire manifests")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, b1)))
    // the real run does exactly what the dry run predicted
    val real = CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L)
    assert(real.sweptBatches == dry.sweptBatches &&
      real.retainedFrom == dry.retainedFrom, (dry, real))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, b1)))
  }

  test("a commit aimed past latest+1 is rejected: no version holes") {
    val root = freshRoot()
    baseTable(root) // v1
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, readVersion = 5, added = Nil,
        removed = Seq(CommitLog.files(root, 1).head))
    }
    assert(CommitLog.latestVersion(root) == 1, "nothing may publish")
  }

  test("restore re-adds batches WITH their stats and blooms") {
    val root = freshRoot()
    (1 to 50).map(i => (i.toLong, i * 10L, s"t$i")).toDF("k", "v", "tag")
      .repartition(1)
      .write.format("commitlog").option("path", root)
      .option("bloomColumns", "tag").mode("append").save() // v1, stats+bloom
    val b1 = CommitLog.files(root, 1).head
    val statsAtV1 = CommitLog.statsOf(root, 1)(b1)
    assert(statsAtV1.nonEmpty && CommitLog.bloomsOf(root, 1).contains(b1))
    CommitLog.commit(root, 1, added = Nil, removed = Seq(b1)) // v2: drop it
    val c = CommitLog.restore(root, 1) // v3: bring it back
    assert(CommitLog.statsOf(root, c.version).get(b1).contains(statsAtV1),
      "restored batches must keep planning like they did")
    assert(CommitLog.bloomsOf(root, c.version).contains(b1))
  }
}
