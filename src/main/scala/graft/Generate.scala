package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.compile.{Bundle, CompilerOptions, PipelineCompiler}
import graft.spec.{SttmParser, SttmSpec, TableMatrix}
import graft.validate.SttmValidation

/** CLI twin of the reference generator (`sttm_to_flink_v22.py --sttm X
  * --out-dir Y [--fail-on-error]`): compile an STTM workbook/CSV into the
  * artifact bundle (00_all.sql, grouped sql, yaml, issues CSV, Catalyst
  * validation report) without executing it.
  *
  * Usage: runMain graft.Generate <sttm.(xlsx|csv)> <outDir>
  *          [--matrix matrix.csv] [--payload-col val] [--csv-delim ,]
  *          [--fail-on-error] [--no-spark]
  */
object Generate {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: Generate <sttm.(xlsx|csv)> <outDir> " +
        "[--matrix m.csv] [--payload-col val] [--csv-delim ,] [--fail-on-error] [--no-spark]")
      sys.exit(2)
    }
    val sttmPath = args(0)
    val outDir = args(1)
    val flags = args.drop(2)
    def flagValue(name: String): Option[String] = {
      val i = flags.indexOf(name)
      if (i >= 0 && i + 1 < flags.length) Some(flags(i + 1)) else None
    }

    val spec0 =
      if (sttmPath.toLowerCase.endsWith(".xlsx")) SttmParser.fromXlsx(sttmPath)
      else SttmSpec(
        SttmParser.mappingFromCsv(Files.readString(Paths.get(sttmPath))),
        TableMatrix.empty)
    val spec = flagValue("--matrix") match {
      case Some(m) => spec0.copy(matrix =
        SttmParser.matrixFromCsv(Files.readString(Paths.get(m))))
      case None => spec0
    }

    // precedence: CLI flag > workbook Config sheet > reference default
    val opts = CompilerOptions.fromConfig(spec.config,
      payloadOverride = flagValue("--payload-col"),
      delimOverride = flagValue("--csv-delim"))
    val pipeline = PipelineCompiler.compile(spec, opts)

    val spark =
      if (flags.contains("--no-spark")) None
      else Some(SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.foreach(_.sparkContext.setLogLevel("ERROR"))
    try {
      Bundle.artifacts(pipeline, spark).writeTo(outDir)
    } finally spark.foreach(_.stop())

    val errors = pipeline.issues.filter(_.level == SttmValidation.Error)
    val warns = pipeline.issues.filter(_.level == SttmValidation.Warn)
    if (errors.nonEmpty) {
      println("ERRORS:")
      errors.foreach(e => println(" - " + e.message))
    }
    if (warns.nonEmpty) {
      println("WARNINGS:")
      warns.foreach(w => println(" - " + w.message))
    }
    if (errors.isEmpty && warns.isEmpty) println("[done] OK (no validation issues).")
    else println(s"See $outDir/issues_v22.csv")
    if (errors.nonEmpty && flags.contains("--fail-on-error")) sys.exit(2)
  }
}
