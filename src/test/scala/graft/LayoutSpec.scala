package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("zValue: interleaves bits exactly (closed-form cases, both engines' arithmetic)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // (u, v, expected morton): v bits land on odd positions, u on even
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L),
      (1023L, 0L, 349525L),       // 0b0101...01 over 20 bits
      (0L, 1023L, 699050L),       // 0b1010...10
      (1023L, 1023L, 1048575L))   // all 20 bits set
    val df = cases.toDF("u", "v", "want")
      .withColumn("got", Layout.zValue(Seq(col("u"), col("v")), bits = 10))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    // reference scalar implementation agrees on a pseudo-random sweep
    def ref(u: Long, v: Long): Long =
      (0 until 10).map(i => (((u >> i) & 1L) << (2 * i)) | (((v >> i) & 1L) << (2 * i + 1))).sum
    val sweep = (0 until 200).map { i =>
      val u = (i * 2654435761L) % 1024; val v = (i * 40503L) % 1024
      (u, v, ref(u, v))
    }.toDF("u", "v", "want")
      .withColumn("got", Layout.zValue(Seq(col("u"), col("v")), bits = 10))
    assert(sweep.filter(col("got") =!= col("want")).count() == 0)
  }

  /** Count files a box predicate cannot skip, from per-file min/max — the
    * same decision parquet footer stats drive on a real lake. */
  private def candidateFiles(dir: String, box: Map[String, (Long, Long)]): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    files.count { f =>
      val stats = spark.read.parquet(f)
        .agg(min("u"), max("u"), min("v"), max("v")).head()
      val (umin, umax, vmin, vmax) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
      box.forall { case (c, (lo, hi)) =>
        if (c == "u") umin <= hi && umax >= lo else vmin <= hi && vmax >= lo
      }
    }
  }

  test("zorderWrite: box predicates on EITHER dimension skip files; 1-D sort only prunes its own") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0 until 4096).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024)
    }.toDF("u", "v")
    val zDir = "/tmp/layout_z"
    val linDir = "/tmp/layout_lin"
    Layout.zorderWrite(rows, Seq("u", "v"), zDir, nFiles = 16, bits = 10)
    rows.repartitionByRange(16, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(linDir)

    val uBox = Map("u" -> (0L, 127L))            // 1/8 of u-space
    val vBox = Map("v" -> (0L, 127L))            // 1/8 of v-space
    val uvBox = Map("u" -> (0L, 127L), "v" -> (0L, 127L)) // 1/64 of space

    // 1-D layout: perfect on its own column, zero pruning on the other
    assert(candidateFiles(linDir, uBox) <= 3)
    assert(candidateFiles(linDir, vBox) == 16, "1-D sort should not prune v")
    // z-order: meaningful pruning on BOTH dimensions, and multiplicative
    // pruning on the 2-D box (the case the layout exists for)
    assert(candidateFiles(zDir, uBox) <= 10)
    assert(candidateFiles(zDir, vBox) <= 10)
    assert(candidateFiles(zDir, uvBox) <= 4,
      s"2-D box should hit few z-files, got ${candidateFiles(zDir, uvBox)}")
    // layouts hold identical data
    assert(spark.read.parquet(zDir).orderBy("u", "v").collect().toSeq ==
      spark.read.parquet(linDir).orderBy("u", "v").collect().toSeq)
  }
}
