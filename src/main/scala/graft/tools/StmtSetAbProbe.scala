package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Shared-scan A/B (VERDICT r10 #3, extended to reference arity r11 #2):
  * the engine's statement-set execution runs one `foreachBatch` fanned out
  * to N sinks PRECISELY because Spark will not share scans across
  * independent streaming queries — this probe measures that claim instead
  * of arguing it. Same source (sf0.1 events, 5 micro-batches), same VIEW
  * transform, same parquet sink outputs, at N=3 (the original probe) and
  * N=8 (the reference's statement set runs ~8 INSERTs —
  * resources/output/final-output.sql:81-145):
  *
  *   A:  one foreachBatch writing the shared view batch to N sinks,
  *       sequentially (the pre-r11 shape, kept for continuity)
  *   A2: one foreachBatch, N CONCURRENT sink writes (the shipped shape)
  *   B:  N independent writeStream queries, each with its own checkpoint,
  *       re-scanning + re-transforming the source
  *
  * Reported per arity: wall-clock per variant, total source rows READ
  * (summed `numInputRows` across all progress events — B pays N× by
  * construction), and total TASK TIME (summed executorRunTime). Wall on an
  * idle local[32] box flatters the independent variant — N engines soak up
  * spare cores — but task time is what a busy production cluster bills:
  * the shared scan does the source read + JSON decode once instead of N
  * times, and that is the scale-limiting resource. */
object StmtSetAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val work = Files.createTempDirectory("graft_stmtset_ab").toString
    // total executor task time, drained per variant
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
      })
    def drainTaskMs(): Long = {
      Thread.sleep(1000) // listener bus is async; let the tail drain
      taskMs.getAndSet(0L)
    }
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

    // JVM/codegen warm-up leg (discarded): the first streaming variant
    // otherwise pays ~2-5 s of classloading the others don't
    locally {
      val q = source().writeStream
        .option("checkpointLocation", s"$work/_cpWarm")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          view(b).localCheckpoint().write.mode("overwrite")
            .parquet(s"$work/outWarm/batch=$id")
        }.start()
      q.awaitTermination()
    }

    def sharedSeq(n: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val q = source().writeStream
        .option("checkpointLocation", s"$work/_cpA$n")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          val v = view(b).localCheckpoint()
          (1 to n).foreach(i => v.write.mode("overwrite")
            .parquet(s"$work/outA${n}_$i/batch=$id"))
        }.start()
      q.awaitTermination()
      ((System.nanoTime() - t0) / 1e9, q.recentProgress.map(_.numInputRows).sum)
    }

    def sharedPar(n: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val q = source().writeStream
        .option("checkpointLocation", s"$work/_cpA2$n")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          val v = view(b).localCheckpoint()
          // spawned threads, not a shared pool — the shipped processSet
          // shape (InheritableThreadLocals keep session + job group; join
          // is interruptible so stop() can still cancel)
          val ts = (1 to n).map(i => new Thread(() => v.write.mode("overwrite")
            .parquet(s"$work/outA2${n}_$i/batch=$id")))
          ts.foreach(_.start()); ts.foreach(_.join())
        }.start()
      q.awaitTermination()
      ((System.nanoTime() - t0) / 1e9, q.recentProgress.map(_.numInputRows).sum)
    }

    def independent(n: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val qs = (1 to n).map { i =>
        view(source()).writeStream
          .option("checkpointLocation", s"$work/_cpB${n}_$i")
          .option("path", s"$work/outB${n}_$i")
          .trigger(Trigger.AvailableNow())
          .format("parquet").start()
      }
      qs.foreach(_.awaitTermination())
      ((System.nanoTime() - t0) / 1e9,
        qs.flatMap(_.recentProgress).map(_.numInputRows).sum)
    }

    Seq(3, 8).foreach { n =>
      drainTaskMs()
      val (wallA, rowsA) = sharedSeq(n)
      val cpuA = drainTaskMs()
      val (wallA2, rowsA2) = sharedPar(n)
      val cpuA2 = drainTaskMs()
      val (wallB, rowsB) = independent(n)
      val cpuB = drainTaskMs()
      val outOk = (1 to n).forall { i =>
        val a = spark.read.parquet(s"$work/outA${n}_$i").count()
        a == spark.read.parquet(s"$work/outA2${n}_$i").count() &&
          a == spark.read.parquet(s"$work/outB${n}_$i").count()
      }
      println(f"STMTSET_AB n=$n shared: wall=$wallA%.2f s rows=$rowsA cpu=${cpuA / 1000.0}%.1f s " +
        f"| sharedParallel: wall=$wallA2%.2f s rows=$rowsA2 cpu=${cpuA2 / 1000.0}%.1f s " +
        f"| independent: wall=$wallB%.2f s rows=$rowsB cpu=${cpuB / 1000.0}%.1f s " +
        f"| scanRatio=${rowsB.toDouble / rowsA2}%.2f " +
        f"cpuRatio=${cpuB.toDouble / cpuA2}%.2f " +
        f"wallRatioVsPar=${wallB / wallA2}%.2f outOk=$outOk")
    }
    spark.stop()
  }
}
