package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.jdk.CollectionConverters._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run 4-at-a-time on a small thread pool: Spark's scheduler
  * interleaves their jobs across the executor threads, overlapping one
  * query's planning/IO stalls with another's compute (~3× faster gate
  * than serial on 43 queries).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(sf, out)         => (sf, out, None)
      case Array(sf, out, subset) => (sf, out, Some(subset.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // Failures are COUNTED and fail the process: a builder running this
    // locally must see the same red the driver's oracle compare would —
    // a caught-to-stderr-and-exit-0 gate is how broken queries ship.
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val runs = selected.toSeq.map { case (name, fn) =>
      Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed.add(name)
        }
      }
    }
    Await.result(Future.sequence(runs), Duration.Inf)
    pool.shutdown()
    if (!failed.isEmpty) {
      System.err.println(
        s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
        failed.asScala.toSeq.sorted.mkString(", "))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // exit AFTER oracle_sql.json lands so the successful queries stay
    // comparable; nonzero status is the loud signal
    if (!failed.isEmpty) sys.exit(1)
  }
}
