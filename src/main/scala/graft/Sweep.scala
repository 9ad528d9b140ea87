package graft

import org.apache.spark.sql.SparkSession

/** Config-sweep harness — the role run_MapReduce.py plays for the
  * reference (sweeping READ/MAP/REDUCE thread counts,
  * `run_MapReduce.py:28-42`), re-expressed over the knobs that exist in
  * Spark: shuffle partitions (reduce parallelism) and input split size
  * (read/map parallelism). Prints one `#FINAL:`-style line per config,
  * mirroring the reference's reporting format (`mpi_mapreduce.c:791`).
  *
  * Usage: `runMain graft.Sweep [corpusGlob]`.
  */
object Sweep {
  def main(args: Array[String]): Unit = {
    // directory, not a glob — see the Bench corpus comment
    val corpus =
      if (args.nonEmpty) args(0) else "/root/reference/file_chunks_130"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.core.WordCount.run(spark, Seq(corpus))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm JVM + FS cache once
    for {
      shufflePartitions <- Seq(4, 8, 16, 32, 64)
      maxPartitionBytes <- Seq(1L << 20, 4L << 20, 16L << 20, 128L << 20)
    } {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      val secs = (1 to 3).map(_ => run()).min
      println(f"#FINAL: SHUFFLE_PARTITIONS: $shufflePartitions%d " +
        f"MAX_PARTITION_BYTES: ${maxPartitionBytes / (1 << 20)}%dMB " +
        f"CORES: $cpus%s TIME: $secs%.2fs")
    }
    spark.stop()
  }
}
