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
    // Diagnostic knob (BENCH_NOTES.md): SPARK_GRAFT_KEEP_CACHE=1 re-creates
    // round 1's harness bug — caches persisted by a query's warm-up run
    // survive into its timed run, under-measuring every query that
    // persist()s. Default (unset) is the honest measurement.
    val keepCache = sys.env.get("SPARK_GRAFT_KEEP_CACHE").contains("1")
    // Focused runs (BENCH_NOTES scaling studies): SPARK_GRAFT_BENCH_ONLY
    // is a comma-separated query subset; the corpus word-count headline
    // is skipped for subset runs (it is a full-record metric).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def exec(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // dedup queries persist() staged signature tables; drop them so one
      // query's cache never skews the next timing (or accumulates memory)
      if (!keepCache) spark.catalog.clearCache()
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Headline vs BASELINE.md: word count over the reference's own corpus
    // (file_chunks_130, ~13 MB, ~2.35 M tokens; reference best = 0.7 s on
    // 160 cores). Measured FIRST, on a fresh heap, warmed only by its own
    // untimed run: round 3 moved it out of tail position because an aged
    // heap's sustained GC stall tainted every sample, and the round-8
    // surface made even "right after the warm-up sweep" an aged-heap
    // position (151 warm-up queries incl. streaming fixtures left the
    // headline 2× over a fresh-session cross-check on identical code).
    // The wc pipeline is one scan + one exchange — two untimed-plus-five
    // runs fully JIT it.
    // Directory, not a "*.txt" glob: all 130 chunk files are .txt, and a
    // glob makes DataFrameReader's FileStreamSink-metadata probe stat the
    // glob string itself, logging a benign FileNotFoundException stack
    // trace to stderr on every run — a clean record run must not print
    // exception traces.
    val corpus = "/root/reference/file_chunks_130"
    // Subset runs (and a failed headline) report null, never a numeric
    // sentinel — a -1.0 would silently win any min/best-of consumer.
    val wcBest: Option[Double] =
      if (only.isDefined) None
      else try {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.core.WordCount.run(spark, Seq(corpus))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once(); Some((1 to 5).map(_ => once()).min)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] corpus wc failed: ${e.getMessage}"); None
      }
    val tokPerSec: Option[Long] = wcBest.map(b => (2297140L / b).toLong)
    names.foreach { n =>
      try exec(n)
      catch { case e: Throwable => System.err.println(s"[bench-warm] $n: ${e.getMessage}") }
    }
    // Three timed passes, report the per-query MIN. Single runs proved
    // untrustworthy: BENCH_r01 vs r02 showed 2–6× swings on queries whose
    // code had not changed, and the slow cluster moves between runs
    // (transient host load / major GC) — see BENCH_NOTES.md. Timing noise
    // on a quiet plan is strictly additive, so min-of-3 is the best
    // estimate of plan cost; all samples ship in "queries_runs" so the
    // spread stays visible. Passes are interleaved (full sweep, repeat)
    // so one transient stall can't taint all samples of one query.
    // A failing query reports null (and an errors entry) — never its
    // time-to-failure as if it were a legitimate timing.
    val Passes = 3
    val samples: Seq[Seq[(String, Either[String, Double])]] =
      (1 to Passes).map { _ =>
        names.map { name =>
          val t0 = System.nanoTime()
          try { exec(name); name -> Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            name -> Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
        }
      }
    val results: Seq[(String, Either[String, Double])] = names.map { name =>
      val runs = samples.map(_.toMap.apply(name))
      val ok = runs.collect { case Right(v) => v }
      if (ok.nonEmpty) name -> Right(ok.min)
      else name -> runs.head
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
    val runsJson = names.map { name =>
      val rs = samples.map(_.toMap.apply(name)).map {
        case Right(v) => v.toString
        case Left(_)  => "null"
      }
      jstr(name) + ":[" + rs.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2.isLeft)
    val total = results.collect { case (_, Right(v)) => v }.sum
    // Surface lockstep: every registered query this record does NOT
    // time, by name. Non-empty only under SPARK_GRAFT_BENCH_ONLY — a
    // DEFINITIVE record must show "missing":[] or it is not definitive
    // (round 6's ta_classify landed after the record and the drift was
    // invisible; now it is one grep).
    val missing = SparkEntry.queries.keys.toSeq.sorted.filterNot(names.contains)
      .map(jstr).mkString("[", ",", "]")
    // Stop Spark BEFORE printing so shutdown chatter can't land after the
    // JSON — the driver parses the last clean stdout line.
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_runs":$runsJson,"errors":$errors,"n_failed":$nFailed,""" +
      s""""n_queries":${names.length},"missing":$missing,""" +
      s""""wc_corpus_130_sec":${wcBest.fold("null")(_.toString)},""" +
      s""""wc_corpus_tokens_per_sec":${tokPerSec.fold("null")(_.toString)},"sf":"$sfDir"}""")
  }
}
