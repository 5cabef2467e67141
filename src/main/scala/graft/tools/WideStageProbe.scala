package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): stage decomposition of q_view_parse_wide — payload
  * synthesis vs fused JSON parse vs final orderBy. */
object WideStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WIDEPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    graft.plans.FuseJsonAccess.install(spark)
    val ev = graft.Tables.events(spark, dir)
    println(s"WIDEPROBE events rows=${ev.count()}")
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val payload = ev.withColumn("payload", graft.SparkEntry.widePayload)
      t("payload synth noop") {
        payload.select("event_id", "payload")
          .write.format("noop").mode("overwrite").save(); 0 }
      val parsed = payload.select(
        col("event_id") +:
        nullif(trim(get_json_object(col("payload"), "$.typ")), lit(""))
          .as("typ") +:
        (0 until 32).map(i =>
          get_json_object(col("payload"), s"$$.f$i")
            .cast("bigint").as(s"f$i")): _*)
      t("payload+parse noop") {
        parsed.write.format("noop").mode("overwrite").save(); 0 }
      t("full with orderBy (declared)") {
        parsed.orderBy("event_id").queryExecution.toRdd.count() }
      t("declared query via registry") {
        graft.SparkEntry.queries("q_view_parse_wide")(spark, dir)
          .queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
