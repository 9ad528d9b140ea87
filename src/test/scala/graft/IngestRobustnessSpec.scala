package graft

import org.apache.spark.sql.functions._

/** Ingest robustness for the JSONL path `q34_jsonl_roundtrip` exercises:
  * at 100 TB a corpus WILL contain malformed lines, and the difference
  * between PERMISSIVE (quarantine the line, keep the scan alive) and
  * FAILFAST (kill a 10-hour job at byte 73 TB) is operational, not
  * cosmetic. Pins both behaviors on a mixed-good/bad file.
  */
class IngestRobustnessSpec extends SparkSpec {

  private def writeMixed(): String = {
    val dir = graft.core.TempDirs.path("graft_jsonl_bad")
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "good row"}""",
      """{"doc_id": 2, "lang": "de", "text": "also good"}""",
      """{"doc_id": "NOT A NUMBER", "lang": "fr", "text": "type clash"}""",
      """this is not json at all""")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  test("PERMISSIVE quarantines malformed lines into _corrupt_record, keeps good rows") {
    val dir = writeMixed()
    val df = spark.read
      .schema("doc_id BIGINT, lang STRING, text STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    val rows = df.cache()
    assert(rows.where(col("_corrupt_record").isNull).count() == 2,
      "both well-formed rows must parse")
    assert(rows.where(col("_corrupt_record").isNotNull).count() == 2,
      "the type clash AND the non-JSON line must be quarantined, not dropped")
    assert(rows.where(col("doc_id") === 2 && col("lang") === "de").count() == 1)
    rows.unpersist()
  }

  test("DROPMALFORMED row count DEPENDS on which columns the scan parses") {
    // the gotcha pinned here: under DROPMALFORMED, "malformed" is judged
    // against the fields the query actually reads. count() parses no
    // fields, so a syntactically-valid line with a type clash is KEPT
    // (3 rows); projecting the columns makes the doc_id cast fail and
    // the same line is DROPPED (2 rows). The same query disagrees with
    // its own count — at 100 TB that is a silent reconciliation bug.
    // PERMISSIVE + corrupt-column is the auditable mode; this test
    // documents why the engine's queries never use DROPMALFORMED.
    val dir = writeMixed()
    def reader = spark.read
      .schema("doc_id BIGINT, lang STRING, text STRING")
      .option("mode", "DROPMALFORMED")
    assert(reader.json(dir).count() == 3,
      "count-only scan: valid JSON syntax is enough to survive")
    assert(reader.json(dir).collect().length == 2,
      "materializing columns: the type-clash row is dropped")
  }

  test("FAILFAST raises on the first malformed line") {
    val dir = writeMixed()
    val e = intercept[Exception] {
      spark.read
        .schema("doc_id BIGINT, lang STRING, text STRING")
        .option("mode", "FAILFAST")
        .json(dir).count()
    }
    assert(e.getMessage != null)
  }

  test("q58: mergeSchema surfaces every row under the union schema, null-filled") {
    import org.apache.spark.sql.functions.col
    graft.queries.Relational.q58SchemaEvolution(spark, "/root/testdata/sf0.001")
      .collect() // stage + run the oracled query first
    val base = graft.queries.Relational.EvolutionStageDir
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.schema.fieldNames.toSet ===
      Set("doc_id", "text_len", "lang", "batch"))
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(merged.count() === total, "merged read lost rows")
    // every pre-evolution row is null-filled, every v2 row populated
    assert(merged.where(col("batch") === "v1" && col("lang").isNotNull).isEmpty)
    assert(merged.where(col("batch") === "v2" && col("lang").isNull).isEmpty)
  }
}
