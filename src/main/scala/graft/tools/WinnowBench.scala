package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Dev tool: A/B the winnowing full-window filter forms at sf0.1. */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val (kgram, wWin) = (8, 4)

    def oldForm() = {
      val grams = docs.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), greatest(length(col("text")) - kgram, lit(0))),
            i => col("text").substr(i + 1, lit(kgram)))).as(Seq("pos", "g")))
        .select(col("doc_id"), col("pos"),
          (TextDedup.stableHash(col("g")) % TextDedup.P).as("h"))
      val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, wWin - 1)
      grams
        .withColumn("n_after", count(lit(1)).over(win))
        .withColumn("wmin", min(col("h")).over(win))
        .filter(col("n_after") === wWin)
        .select(col("doc_id"), col("wmin").as("fp"))
        .distinct()
    }

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warmup
    TextDedup.winnowingFingerprints(docs, "doc_id", "text").queryExecution.toRdd.count()
    for (_ <- 1 to 2) {
      time("new (length filter)")(
        TextDedup.winnowingFingerprints(docs, "doc_id", "text"))
      time("old (count window) ")(oldForm())
    }
    spark.stop()
  }
}
