package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual catalog queries (noop-materialized, same as Bench's
  * query leg) — the iterate-fast loop for query-level optimization.
  * Usage: QueryBench [queryName...]   (default: the sketch family)
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_minhash_pairs", "q_minhash_dedup", "q_fingerprint", "q_ann_ivf")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-querybench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      (1 to 2).foreach { r => // run 2 = warm (JIT + codegen cached)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[qbench] $n run$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
