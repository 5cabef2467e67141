package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q_view_parse_wide's time go — payload synthesis
  * (concat) vs the fused parse vs export. FROZEN SNAPSHOT of the payload
  * builder as measured for BASELINE.md round 10; re-derive from SparkEntry
  * if the query's payload shape changes. */
object WideViewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    val q = graft.SparkEntry.queries("q_view_parse_wide")(spark, dir)
    timed("full query")(q.queryExecution.toRdd.count())
    // synthesis only
    val parts: Seq[org.apache.spark.sql.Column] =
      (lit("{\"typ\":\"") +: col("event_type") +: lit("\"") +:
        (0 until 32).flatMap(i => Seq(
          lit(s""","f$i":"""),
          (col("event_id") + lit(i)).cast("string")))) :+ lit("}")
    val synth = graft.Tables.events(spark, dir)
      .select(concat(parts: _*).as("payload"))
    timed("synthesis only")(synth.queryExecution.toRdd.count())
    // synthesis + single fused parse, no orderBy
    graft.plans.FuseJsonAccess.install(spark)
    val parsed = graft.Tables.events(spark, dir)
      .withColumn("payload", concat(parts: _*))
      .select(
        col("event_id") +:
        (0 until 32).map(i =>
          get_json_object(col("payload"), s"$$.f$i").cast("bigint").as(s"f$i")): _*)
    timed("synth+parse (no sort)")(parsed.queryExecution.toRdd.count())
    println(q.queryExecution.executedPlan.toString.linesIterator
      .take(12).mkString("\n"))
    spark.stop()
  }
}
