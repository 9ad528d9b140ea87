package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.core.WordCount

/** Text-sink parity (SURVEY §2.6: space-separated "word count" lines,
  * part-files merged by concatenation, unordered) and the injected
  * optimizer rule.
  */
class SinkAndRuleSpec extends SparkSpec {

  test("sink writes space-separated lines; concat-merge reproduces counts") {
    import spark.implicits._
    val counts = WordCount.count(Seq("a b a", "c ... a").toDF("value"))
    val out = graft.core.TempDirs.create("graft-sink") + "/wc"
    WordCount.sink(counts, out, partitions = 3)
    // the reference merges with `cat output_*` — reading the whole dir
    // as text is the same operation
    val merged = spark.read.text(out).collect()
      .map(_.getString(0).split(" ", 2))
      .map(a => a(0) -> a(1).toLong).toMap
    assert(merged == Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "..." -> 1L))
    // more than one part-file proves the merge-by-concat model is exercised
    val parts = new java.io.File(out).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 3)
  }

  test("byRefHash sink reproduces the reference's reducer file layout") {
    import spark.implicits._
    import graft.functions.RefHash
    // enough distinct words that buckets spread across files — all-alpha
    // so normalize keeps them distinct (digits would be end-stripped)
    val words = (0 until 200)
      .map(i => s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val counts = WordCount.count(Seq(words).toDF("value"))
    val out = graft.core.TempDirs.create("graft-sink-rh") + "/wc"
    val nParts = 4
    WordCount.sink(counts, out, partitions = nParts, byRefHash = true)
    // reference layout invariant (mpi_mapreduce.c:278-289): each word
    // lives in the file its hashFunc bucket maps to — so every bucket
    // appears in exactly ONE part-file
    val fileOfBucket = scala.collection.mutable.Map[Int, String]()
    val expected = counts
      .select(col("word"), RefHash.ref_hash_bytes(col("word")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val partFiles = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    // Spark writes a file per NON-EMPTY partition (the reference writes
    // empty reducer files; concat-merge makes that invisible) — the
    // layout property under test is bucket→file exclusivity below
    assert(partFiles.length >= 2 && partFiles.length <= nParts)
    for (f <- partFiles; line <- scala.io.Source.fromFile(f).getLines()) {
      val word = line.split(" ", 2)(0)
      val bucket = expected(word)
      fileOfBucket.get(bucket) match {
        case Some(prev) => assert(prev == f.getName,
          s"bucket $bucket split across $prev and ${f.getName}")
        case None => fileOfBucket(bucket) = f.getName
      }
    }
    val perFile = partFiles.map(f =>
      f.getName -> scala.io.Source.fromFile(f).getLines().size).toMap
    assert(fileOfBucket.values.toSet.size > 1,
      s"all buckets in one file — knob inert; per-file line counts: $perFile")
  }

  test("CollapseNormalizeWord removes nested normalize_word in the optimized plan") {
    // non-literal input: constant folding would otherwise evaluate a
    // literal through both calls before the plan is observable
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(
      WordCount.normalize(WordCount.normalize(col("lang"))).as("w"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("normalize_word".r.findAllIn(optimized).size == 1,
      s"nested normalize_word should collapse to one:\n$optimized")
    val single = docs.select(WordCount.normalize(col("lang")).as("w"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      single.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("the rule fires through SQL text too") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("rule_docs")
    val df = spark.sql(
      "SELECT normalize_word(normalize_word(lang)) AS w FROM rule_docs")
    assert("normalize_word".r.findAllIn(df.queryExecution.optimizedPlan.toString).size == 1)
    assert(df.collect().forall(r => r.getString(0).nonEmpty))
  }
}
