package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Query-only benchmark for the optimization loop (guide §1.4): times
  * every SparkEntry query through the noop sink in a session configured
  * IDENTICALLY to the frozen [[graft.Bench]] query leg (same master,
  * shuffle partitions, split sizes, tmpfs local dir), so its per-query
  * numbers are comparable with the driver bench's — without paying the
  * ~15 min crawl legs on every iteration.
  *
  * Usage: BenchExtra [repeats] [queryName...]
  *   repeats: timed repeats per query (default 3; min is reported —
  *            the noise-free estimator for a quiet host)
  *   queryName...: subset to run (default: all)
  * Prints one JSON line: {"queries": {name: minSec, ...}, "total": sum}
  */
object BenchExtra {
  private val shmOk = Files.isDirectory(Paths.get("/dev/shm"))

  def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", if (shmOk) "/dev/shm/graft-spark-local" else "/tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(3)
    val subset = (if (args.nonEmpty && scala.util.Try(args.head.toInt).isSuccess)
      args.tail else args).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = newSession(cores)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.isEmpty || subset.contains(n))
    val results = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(n)
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[bx] $n%-24s " +
        times.map(t => f"$t%.2f").mkString(" "))
      n -> times.min
    }
    spark.sparkContext.setJobDescription(null)
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"queries":$qs,"total":${f"$total%.3f"},"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
