package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
object TimeLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def dot(x: Column, y: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.DotProduct(Bridge.expression(x), Bridge.expression(y)))
    }
    def hpWeight(bit: Int, dim: Int): Float = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp|$bit|$dim".getBytes("UTF-8"))
      if ((h(0) & 0xff) >= 0x80) 1f else -1f
    }
    val hyperplanes = (0 until 192).map(b => (0 until 64).map(d => hpWeight(b, d)))
    val e = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding"))
    val sigBits = (0 until 192).map(j =>
      when(dot(col("embedding"), typedlit(hyperplanes(j))) >= 0, "+").otherwise("-"))
    val sig = e.select(col("vec_id"), concat(sigBits: _*).as("sig"))
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(s"TIMING $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("sig_only") { sig.write.format("noop").mode("overwrite").save() }
    val bands = sig.select(col("vec_id"),
      explode(array((0 until 24).map(b =>
        struct(lit(b).as("band_idx"), substring(col("sig"), b*8+1, 8).as("band_val"))): _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx"), col("band.band_val")).hint("shuffle_hash")
    val cand = bands.as("x").join(bands.as("y"),
      col("x.band_idx") === col("y.band_idx") && col("x.band_val") === col("y.band_val") &&
      col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b")).distinct()
    time("cand") { cand.write.format("noop").mode("overwrite").save() }
    println("CAND COUNT: " + cand.count())
    spark.stop()
  }
}
