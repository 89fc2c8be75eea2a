package graft

import org.scalatest.funsuite.AnyFunSuite

/** Memory-pressure hardening for the 100 TB shapes: the heavy
  * operators (SMJ, hash agg, window sort, the AllPairs n-gram join)
  * must SPILL, not OOM, when the execution pool is a fraction of their
  * working set. Runs [[ConstrainedMemoryMain]] in a forked 2g JVM whose
  * unified memory pool is squeezed to ~58 MB (spark.testing.memory) and
  * asserts completion + spillMetrics > 0 from the engine's own task
  * metrics. */
class ConstrainedMemorySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.1"

  test("heavy shapes complete under a ~58 MB pool and actually spill") {
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx2g", "-cp", sys.props("java.class.path")) ++
      addOpens ++ Seq(
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "graft.ConstrainedMemoryMain", sfDir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    val drainer = new Thread(() => {
      var line = reader.readLine()
      while (line != null) {
        out.synchronized(out.append(line).append('\n'))
        line = reader.readLine()
      }
    })
    drainer.start()
    val finished = proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    drainer.join(10000)
    val text = out.synchronized(out.toString)
    assert(finished, s"constrained run hung:\n${text.takeRight(2000)}")
    assert(proc.exitValue() == 0,
      s"constrained run failed (OOM instead of spill?):\n${text.takeRight(2000)}")

    def field(line: String, key: String): Option[Long] =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong)
    val perQuery = text.linesIterator
      .filter(_.startsWith("CONSTRAINED {"))
      .map { l =>
        val name = "\"query\":\"([a-z0-9_]+)\"".r
          .findFirstMatchIn(l).get.group(1)
        name -> (field(l, "rows"), field(l, "spilled"))
      }.toMap
    val expected = Set("j6_sortmerge", "a1_hashagg", "w1_ranking", "l2_ngram_jaccard")
    assert(perQuery.keySet == expected, s"missing queries: $perQuery\n$text")
    expected.foreach { q =>
      assert(perQuery(q)._1.exists(_ > 0L), s"$q produced no rows:\n$text")
    }
    val total = text.linesIterator
      .find(_.startsWith("CONSTRAINED_TOTAL"))
      .flatMap(l => field(l, "total_spilled"))
      .getOrElse(0L)
    assert(total > 0L,
      s"nothing spilled — the pool was not actually constrained:\n$text")
    // the two sort-dominated shapes must each have taken the spill path
    // themselves (a1's 6-group hash table legitimately never needs to)
    Seq("j6_sortmerge", "l2_ngram_jaccard").foreach { q =>
      assert(perQuery(q)._2.exists(_ > 0L),
        s"$q completed without spilling — pool too generous to prove anything:\n$text")
    }
  }
}
