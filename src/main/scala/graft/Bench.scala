package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the full `SparkEntry.queries` set N times
  * (default 3, override via SPARK_GRAFT_BENCH_RUNS) after a JVM warmup
  * pass, and reports the per-query MEDIAN wall time — single runs on a
  * shared host have shown 2-5x noise (see VERDICT r02), medians don't.
  * Session-level memos are reset between runs so every run pays the full
  * cost of shared intermediates.
  *
  * A query that throws is NOT silently timed as green: its median is
  * reported as -1 and the exception lands in the emitted "errors" array.
  *
  * Materialization: each query's ALREADY-OPTIMIZED physical plan is
  * executed via `queryExecution.toRdd.count()`, not `df.count()`. Wrapping
  * the query in a fresh count() lets Catalyst re-optimize — pruning every
  * column, deleting the final sort, and even eliminating joins (a
  * left join whose columns a count never reads is dropped whole, which
  * made q_contamination's bench entry a scan of `documents`). toRdd runs
  * the plan that Verify/consumers actually pay for, without collecting
  * rows to the driver.
  */
object Bench {
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged ~3 s of JIT.
    // Headline set only: audit queries (exact full-corpus ground-truth
    // passes, see SparkEntry.benchExclude) are correctness-gated at sf0.01
    // but not timed here.
    // Dev-only subset filter (comma-separated names): lets a builder time
    // one query's change without paying the full set. The driver never
    // sets it, so round benches always cover everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val benchQueries = SparkEntry.queries
      .filterNot { case (name, _) => SparkEntry.benchExclude.contains(name) }
      .filter { case (name, _) => only.isEmpty || only(name) }
    benchQueries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // perRun(i)(name) = seconds, or None if the query threw in that run.
    val perRun: Seq[Map[String, Option[Double]]] = (1 to runs).map { r =>
      SparkEntry.resetMemos(spark)
      benchQueries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch {
            case e: Throwable =>
              errors += s"$name (run $r): ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
              false
          }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }.toMap
    }
    val names = benchQueries.keys.toSeq
    val medians: Seq[(String, Double)] = names.map { name =>
      val samples = perRun.flatMap(_.get(name).flatten)
      // Any failed run marks the query failed — a throwing query must not
      // surface as a fast green entry.
      val med =
        if (samples.length < runs) -1.0
        else samples.sorted.apply((samples.length - 1) / 2)
      name -> med
    }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + jsonEscape(e) + "\"").mkString("[", ",", "]")
    val total = medians.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"cpus":$cpus,"errors":$errJson}"""
    println(json)
    // Also persist the full parsed record to a known path: the driver's
    // BENCH_r{N}.json artifacts were truncating the stdout tail and losing
    // the per-query map ("parsed": null in r5/r6) — a file survives verbatim.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
