package graft

import org.apache.spark.sql.SparkSession

/** Scale-study driver for the RULE-RESOLVED embed-LSH configuration —
  * the measurement [[graft.queries.Dedup.embedLshPairs]] exists for.
  *
  * The oracled `dd_embed_lsh` keeps its fixed r=8/B=24 gate banding
  * (static oracle SQL can't depend on runtime n), and that fixed r has
  * a documented quadratic wall: expected chance collisions per band are
  * n²/2^r, fine at the gate scale, catastrophic two decades up (at
  * 200 k diverse vectors it built a 69 GB candidate shuffle and ran the
  * box out of disk). A production pipeline calls [[Dedup.lshRowsForN]]
  * with its corpus size; this main measures THAT path at whatever scale
  * directory it is pointed at, with Bench's timing discipline (warm-up
  * pass, N timed passes, caches cleared between passes, min reported).
  *
  * Usage: runMain graft.ScaleStudy <sfDir> [passes]
  * Prints one JSON line; never run concurrently with Bench.
  */
object ScaleStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.FanOut(graft.sources.Tables(spark, sfDir).embeddings)
    val n = emb.count()
    val r = graft.queries.Dedup.lshRowsForN(n)
    val bands = graft.queries.Dedup.LshBands
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.queries.Dedup.embedLshPairs(emb, r, bands)
        .write.format("noop").mode("overwrite").save()
      // capture elapsed BEFORE cache teardown — Bench's timing window
      // ends at the noop write too; clearCache is inter-pass hygiene,
      // not part of the measured plan cost
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      elapsed
    }
    once() // warm-up (JIT + scan cache), untimed — same discipline as Bench
    val samples = (1 to passes).map(_ => once())
    spark.stop()
    println(s"""{"metric":"dd_embed_lsh_rule","n":$n,"rows_per_band":$r,""" +
      s""""bands":$bands,"samples":[${samples.mkString(",")}],""" +
      s""""min":${samples.min},"sf":"$sfDir"}""")
  }
}
