package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Shared-scan A/B (VERDICT r10 #3): the engine's statement-set execution
  * runs one `foreachBatch` fanned out to N sinks PRECISELY because Spark
  * will not share scans across independent streaming queries — this probe
  * measures that claim instead of arguing it. Same source (sf0.1 events,
  * 5 micro-batches), same VIEW transform, same 3 parquet sink outputs:
  *
  *   A: one foreachBatch writing the shared view batch to 3 sinks
  *   B: three independent writeStream queries, each with its own
  *      checkpoint, re-scanning + re-transforming the source
  *
  * Reported: wall-clock per variant and total source rows READ (summed
  * `numInputRows` across all progress events — B pays 3x by construction).
  */
object StmtSetAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val work = Files.createTempDirectory("graft_stmtset_ab").toString
    graft.Tables.events(spark, dir)
      .withColumn("part", pmod(col("event_id"), lit(5)))
      .write.partitionBy("part").parquet(s"$work/in")
    val schema = spark.read.parquet(s"$work/in").schema

    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
    // the compiled-view shape: filter + JSON field extraction + casts
    def view(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id"), col("ts"),
        nullif(trim(get_json_object(col("props"), "$.k")), lit(""))
          .cast("int").as("k"),
        col("value"))

    // A: statement set — one scan, fan-out inside foreachBatch
    val tA = System.nanoTime()
    val qA = source().writeStream
      .option("checkpointLocation", s"$work/_cpA")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val v = view(b).localCheckpoint()
        (1 to 3).foreach(i => v.write.mode("overwrite")
          .parquet(s"$work/outA$i/batch=$id"))
      }.start()
    qA.awaitTermination()
    val wallA = (System.nanoTime() - tA) / 1e9
    val rowsA = qA.recentProgress.map(_.numInputRows).sum

    // A2: statement set with CONCURRENT sink writes (the StreamingPipeline
    // shape since r11) — still one scan, but the three actions overlap
    val tA2 = System.nanoTime()
    val qA2 = source().writeStream
      .option("checkpointLocation", s"$work/_cpA2")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val v = view(b).localCheckpoint()
        // spawned threads, not a shared pool — the shipped processBatch
        // shape (InheritableThreadLocals keep session + job group; join is
        // interruptible so stop() can still cancel)
        val ts = (1 to 3).map(i => new Thread(() => v.write.mode("overwrite")
          .parquet(s"$work/outA2_$i/batch=$id")))
        ts.foreach(_.start()); ts.foreach(_.join())
      }.start()
    qA2.awaitTermination()
    val wallA2 = (System.nanoTime() - tA2) / 1e9

    // B: three independent queries — three scans of the same source
    val tB = System.nanoTime()
    val qs = (1 to 3).map { i =>
      view(source()).writeStream
        .option("checkpointLocation", s"$work/_cpB$i")
        .option("path", s"$work/outB$i")
        .trigger(Trigger.AvailableNow())
        .format("parquet").start()
    }
    qs.foreach(_.awaitTermination())
    val wallB = (System.nanoTime() - tB) / 1e9
    val rowsB = qs.flatMap(_.recentProgress).map(_.numInputRows).sum

    val outRows = (1 to 3).map(i =>
      (spark.read.parquet(s"$work/outA$i").count(),
        spark.read.parquet(s"$work/outA2_$i").count(),
        spark.read.parquet(s"$work/outB$i").count()))
    println(f"STMTSET_AB shared: wall=$wallA%.2f s rowsScanned=$rowsA " +
      f"| sharedParallel: wall=$wallA2%.2f s " +
      f"| independent: wall=$wallB%.2f s rowsScanned=$rowsB " +
      f"| scanRatio=${rowsB.toDouble / rowsA}%.2f wallRatio=${wallB / wallA}%.2f " +
      f"| outRows=${outRows.mkString(",")}")
    spark.stop()
  }
}
