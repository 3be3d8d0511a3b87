package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dump `.explain("formatted")` for catalog queries to files (the
  * plans deliverable). Usage: PlanDump <outDir> [queryName...]
  * (default: all queries). One <outDir>/<name>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/out")
    val subset = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(Paths.get(outDir))
    val spark = BenchExtra.newSession(cores)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.isEmpty || subset.contains(n))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$n.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plan] $n -> $outDir/$n.txt")
      } catch {
        case e: Exception =>
          System.err.println(s"[plan] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
