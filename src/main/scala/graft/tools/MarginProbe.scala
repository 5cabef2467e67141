package graft.tools

import org.apache.spark.sql.functions._

/** Margin distribution probe for Similarity.marginMine — run once per
  * corpus to size q_margin_mine's threshold so the filter is
  * non-vacuous (some pairs above, some below). */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, dir)
    val out = graft.operators.Similarity.marginMine(
      e.filter(col("vec_id") % 20 === 0), e.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", k = 4, minMargin = 0.0)
    val n = out.count()
    println(s"PAIRS $n")
    out.select(
        min("margin").as("mn"), expr("percentile(margin, 0.25)").as("p25"),
        expr("percentile(margin, 0.5)").as("p50"),
        expr("percentile(margin, 0.75)").as("p75"),
        expr("percentile(margin, 0.9)").as("p90"), max("margin").as("mx"))
      .collect().foreach(r => println(s"DIST $r"))
    Seq(1.0, 1.01, 1.02, 1.05, 1.1).foreach { t =>
      println(s"AT $t -> ${out.filter(col("margin") >= t).count()}")
    }
    // stored-index variant: id<10 batch against the full-corpus index
    val idxDir = java.nio.file.Files.createTempDirectory("margin_idx").toString
    graft.operators.AnnIndexStore.build(e, "vec_id", "embedding", idxDir,
      dim = 64)
    val st = graft.operators.AnnIndexStore.marginMine(
      e.filter(col("vec_id") < 10), "vec_id", "embedding", idxDir,
      k = 4, nProbe = 2, refine = 30, minMargin = 0.0)
    println(s"STORED PAIRS ${st.count()}")
    st.select(min("margin"), expr("percentile(margin, 0.5)"), max("margin"))
      .collect().foreach(r => println(s"STORED DIST $r"))
    Seq(1.0, 1.02, 1.05, 1.1, 1.15).foreach { t =>
      println(s"STORED AT $t -> ${st.filter(col("margin") >= t).count()}")
    }
    spark.stop()
  }
}
