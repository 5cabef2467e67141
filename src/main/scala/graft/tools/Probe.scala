package graft.tools

import org.apache.spark.sql.SparkSession
import graft.compile.{DemoSpecs, PipelineCompiler}
import graft.spec.{SttmParser, SttmSpec, TableMatrix}

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    // 1. exported artifact shape (00_all.sql)
    val p = PipelineCompiler.compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
    println("=== 00_all.sql (first 25 lines) ===")
    println(p.allSql.linesIterator.take(25).mkString("\n"))

    // 2. broken spec: XREF without matrix upsert + duplicate column
    val broken = SttmSpec(
      SttmParser.mappingFromCsv(
        "PipelineStage,TargetTable,TargetColumn,TargetDataType,IsTargetPK,TargetPK,MessageFormat,FieldSelector,SourcePrimaryTable,SourcePrimaryAlias,SourceField,ExprOverride,SourceTransformExpr,FilterPredicate,JoinTable,JoinAlias,JoinType,JoinCondition,Notes\n" +
        "XREF,XREF_B,C1,STRING,Y,,,,src,t,f,,,,,,,,\n" +
        "XREF,XREF_B,C1,STRING,N,,,,src,t,f,,,,,,,,\n"),
      TableMatrix.empty)
    val bp = PipelineCompiler.compile(broken)
    println("=== broken spec issues ===")
    bp.issues.foreach(i => println(s"${i.level.name}: ${i.message}"))
  }
}
