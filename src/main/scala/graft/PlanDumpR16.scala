package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** r16 optimization-round artifact tool: dump `.explain("formatted")`
  * for the named queries to plans/r16/<name>_<tag>.txt — the judge
  * checks the round's plan claims against these files.
  *
  *   runMain graft.PlanDumpR16 <dir> <tag> <name,name,…>
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val spark = Engine.session("graft-plandump-r16")
    val out = Paths.get("plans/r16")
    Files.createDirectories(out)
    names.foreach { name =>
      try {
        val p = SparkEntry.queries(name)(spark, dir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(out.resolve(s"${name}_$tag.txt"),
          (s"== $name ($tag, $dir) ==\n" + p).getBytes("UTF-8"))
        println(s"[plandump-r16] wrote ${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump-r16] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
