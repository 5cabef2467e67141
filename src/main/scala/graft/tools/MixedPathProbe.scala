package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mixed-path wide view A/B (VERDICT r10 #7): FuseJsonAccess fuses only
  * simple `$.name` dot paths; bracket selectors (`$['name']` — the
  * reference's quoted-field escape, sttm_to_flink_v22.py:54-67) fall back
  * to one narrow get_json_object each. A realistic STTM mixing 30 simple +
  * 3 bracket paths therefore pays 1 wide parse + 3 narrow parses per row —
  * this probe measures whether that bracket tax is material at width 33
  * before any rule extension is considered.
  *
  * The measurement drove a rule extension: single-level brackets now fuse
  * as literal keys, so the variants below record the POST-extension space.
  *
  * Variants over the same synthesized 33-field payload (sf0.1 events):
  *   fused      — 33 simple dot paths   -> 1 JsonToStructs
  *   mixed-brkt — 30 simple + 3 bracket -> 1 JsonToStructs (was 1 + 3)
  *   mixed-nest — 30 simple + 3 nested  -> 1 JsonToStructs + 3 GetJsonObject
  *   unfused    — 33 nested dot paths   -> 33 GetJsonObject (the still-
  *                unfused class; each narrow parse rescans the payload even
  *                though the flat fixture yields null for every nested path)
  */
object MixedPathProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.FuseJsonAccess.install(spark)
    val dir = "/root/testdata/sf0.1"
    val base = graft.Tables.events(spark, dir)
      .withColumn("payload", graft.SparkEntry.widePayload)
      .localCheckpoint() // isolate parse cost from synthesis + scan

    def run(label: String, paths: Seq[String]): Unit = {
      val df = base.select(
        col("event_id") +:
        paths.zipWithIndex.map { case (p, i) =>
          // no cast: ANSI would throw on typ, and the probe measures parses
          get_json_object(col("payload"), p).as(s"c$i")
        }: _*)
      val parses = df.queryExecution.optimizedPlan.collect {
        case n => n.expressions.map(_.collect {
          case _: org.apache.spark.sql.catalyst.expressions.JsonToStructs => 1
          case _: org.apache.spark.sql.catalyst.expressions.GetJsonObject => 1
        }.sum).sum
      }.sum
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"MIXEDPATH $label%-10s parseNodes=$parses%3d " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    run("fused", (0 until 32).map(i => s"$$.f$i") :+ "$.typ")
    // post-extension: single-level brackets fuse as literal keys, so the
    // realistic mixed workbook is back to ONE parse (was 1 + 3 = 2.95 s
    // vs 1.75 s fused — the r10 #7 measurement that justified the rule)
    run("mixed-brkt", (0 until 29).map(i => s"$$.f$i") ++
      Seq("$.typ", "$['f29']", "$['f30']", "$['f31']"))
    // nested dot paths remain unfused (payload is flat -> null values, but
    // each access still pays a full narrow parse — the cost being measured)
    run("mixed-nest", (0 until 29).map(i => s"$$.f$i") ++
      Seq("$.typ", "$.g0.h", "$.g1.h", "$.g2.h"))
    run("unfused", (0 until 32).map(i => s"$$.f$i.x") :+ "$.typ.x")
    spark.stop()
  }
}
