package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Measurement choices:
  *   - results go to a `noop` sink, not `.count()` — count() lets the
  *     optimizer delete sorts/projections, so it under-measures;
  *   - one untimed warm-up run per query first: the reference's numbers
  *     (BASELINE.md) are steady-state on a warm cluster, and a cold JVM
  *     spends the first ~20 s JIT-compiling Spark itself, which says
  *     nothing about plan quality.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // dedup queries persist() staged signature tables; drop them so one
      // query's cache never skews the next timing (or accumulates memory)
      spark.catalog.clearCache()
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try exec(n)
      catch { case e: Throwable => System.err.println(s"[bench-warm] $n: ${e.getMessage}") }
    }
    // A failing query reports null (and an errors entry) — never its
    // time-to-failure as if it were a legitimate timing.
    val results: Seq[(String, Either[String, Double])] = names.map { name =>
      val t0 = System.nanoTime()
      try { exec(name); name -> Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        name -> Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map {
      case (k, Right(v)) => jstr(k) + ":" + v
      case (k, Left(_))  => jstr(k) + ":null"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2.isLeft)
    val total = results.collect { case (_, Right(v)) => v }.sum
    // Headline vs BASELINE.md: word count over the reference's own corpus
    // (file_chunks_130, ~13 MB, ~2.35 M tokens; reference best = 0.7 s on
    // 160 cores). Warm once, report best of 3.
    val corpus = "/root/reference/file_chunks_130/*.txt"
    val wcTimes =
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.core.WordCount.run(spark, Seq(corpus))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once(); (1 to 3).map(_ => once())
      } catch { case e: Throwable =>
        System.err.println(s"[bench] corpus wc failed: ${e.getMessage}"); Seq(-1.0)
      }
    val wcBest = wcTimes.min
    val tokPerSec = if (wcBest > 0) (2297140L / wcBest).toLong else -1L
    // Stop Spark BEFORE printing so shutdown chatter can't land after the
    // JSON — the driver parses the last clean stdout line.
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errors,"n_failed":$nFailed,""" +
      s""""wc_corpus_130_sec":$wcBest,"wc_corpus_tokens_per_sec":$tokPerSec,"sf":"$sfDir"}""")
  }
}
