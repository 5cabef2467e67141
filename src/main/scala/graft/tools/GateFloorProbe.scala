package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: distribution of nearest-stored-neighbor distances for
  * the vec_id % 20 == 0 batch against an index of the rest — picks the
  * q_ann_gate dupFloor so the verdict is non-vacuous at every sf. */
object GateFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = graft.Tables.embeddings(spark, sf)
      val dir = java.nio.file.Files.createTempDirectory("gatefloor").toString
      graft.operators.AnnIndexStore.build(e.filter(col("vec_id") % 20 =!= 0),
        "vec_id", "embedding", dir, dim = 64)
      val batch = e.filter(col("vec_id") % 20 === 0)
      val v = graft.operators.AnnIndexStore.matchBatchVectors(
        batch, "vec_id", "embedding", dir, dupFloor = Long.MaxValue)
      val d = v.select("dist").collect().map(_.getLong(0)).sorted
      println(s"PROBE sf=$sf n=${d.length} min=${d.head} p10=${d(d.length/10)} " +
        s"p25=${d(d.length/4)} p50=${d(d.length/2)} p75=${d(3*d.length/4)} max=${d.last}")
      val nTrue = graft.operators.AnnIndexStore.matchBatchVectorsExact(
          batch, "vec_id", "embedding",
          e.filter(col("vec_id") % 20 =!= 0), 1350000L)
        .filter(col("is_dup")).count()
      for (np <- Seq(2, 4, 6, 8); rf <- Seq(30, 100)) {
        val found = graft.operators.AnnIndexStore.matchBatchVectors(
            batch, "vec_id", "embedding", dir, dupFloor = 1350000L,
            nProbe = np, refine = rf)
          .filter(col("is_dup")).count()
        println(s"PROBE sf=$sf nProbe=$np refine=$rf recall=$found/$nTrue")
      }
    }
    spark.stop()
  }
}
