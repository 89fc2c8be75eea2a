package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling main (optimization rounds): run named queries with a
  * stage-level listener and print, per query, total wall time plus the
  * top stages by duration with their shuffle/input volumes — the
  * empirical loop of the optimization guide §1 without a live UI.
  *
  *   runMain graft.Profile <dir> <name,name,...> [reps]
  *
  * The first run is the timed one by default (steady state comes from
  * Bench.warmup, shared here); reps > 1 re-runs and keeps per-run wall
  * times so one-time layout builds show up as run-1 vs run-2 deltas.
  */
object Profile {
  final case class StageRec(
      id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
      inputMB: Double, shufReadMB: Double, shufWriteMB: Double,
      spillMB: Double)

  class Listener extends SparkListener {
    val stages = mutable.ArrayBuffer[StageRec]()
    private val submitted = mutable.Map[Int, Long]()
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      submitted(s.stageInfo.stageId) = System.nanoTime()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val si = s.stageInfo
      val wall = submitted.get(si.stageId)
        .map(t0 => (System.nanoTime() - t0) / 1000000L).getOrElse(-1L)
      val m = si.taskMetrics
      stages += StageRec(
        si.stageId,
        si.name.linesIterator.next().take(100),
        si.numTasks, wall, m.executorRunTime,
        m.inputMetrics.bytesRead / 1e6,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = Engine.session("graft-profile")
    // optional conf overrides: "k=v;k=v" as 4th arg (A/B experiments)
    if (args.length > 3 && args(3).nonEmpty)
      args(3).split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    Bench.warmup(spark, dir)

    val dumpPlan = sys.env.get("PROF_PLAN").contains("1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to reps).map { rep =>
        val lst = new Listener
        spark.sparkContext.addSparkListener(lst)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        if (dumpPlan && rep == reps)
          println(s"==== $name executed plan ====\n" +
            df.queryExecution.executedPlan.toString.take(14000))
        // let the listener bus drain before reading
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(lst)
        if (rep == reps) { // report the LAST (warmest) run's stages
          println(f"\n===== $name run$rep: $wall%.3f s, ${lst.stages.size} stages =====")
          val top = lst.stages.sortBy(-_.wallMs).take(14)
          top.foreach { r =>
            println(f"  stage ${r.id}%4d wall=${r.wallMs}%6d ms task=${r.taskMs}%7d ms " +
              f"n=${r.tasks}%3d in=${r.inputMB}%8.1fMB sr=${r.shufReadMB}%7.1fMB " +
              f"sw=${r.shufWriteMB}%7.1fMB sp=${r.spillMB}%6.1fMB  ${r.name}")
          }
          val tot = lst.stages.map(_.wallMs).sum
          println(f"  [sum of stage walls: ${tot / 1000.0}%.3f s over ${lst.stages.size} stages]")
        }
        wall
      }
      println(f"$name walls: ${walls.map(w => f"$w%.3f").mkString(", ")}")
    }
    spark.stop()
  }
}
