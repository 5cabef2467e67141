package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r14 optimization): decompose q_bpe_train_prod's per-round
  * cost. trainBatched pays, per round: (a) the candidate agg + TakeOrdered
  * collect, (b) the dictionary re-materialization (localCheckpoint without
  * a checkpoint dir). This probe times both phases separately by running
  * an instrumented copy of the loop, plus the end-to-end call, at the
  * bench session shape (local[32], shuffle.partitions=32, AQE on).
  */
object BpeFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, dir)

    // end-to-end timing, twice (JIT warm)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Bpe.trainBatched(docs, "text", 256, 8).count()
      println(f"BPEFLOOR e2e run$i merges=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // instrumented loop: phase timings (mirror of trainBatched's body)
    val S = ""; val SS = S + S
    val SSre = java.util.regex.Pattern.quote(SS)
    var toks = docs.select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(S),
          array_join(regexp_extract_all(col("word"), lit("."), lit(0)), SS),
          lit(S)).as("tokstr"),
        col("cnt")).localCheckpoint()
    println(s"BPEFLOOR dict rows=${toks.count()} partitions=${toks.rdd.getNumPartitions}")
    var step = 0; var rounds = 0
    var tAgg = 0.0; var tCkpt = 0.0
    val nMerges = 256; val maxBatch = 8
    while (step < nMerges && rounds < 200) {
      rounds += 1
      val tok = split(trim(col("tokstr"), S), SSre)
      val horizon = math.max(maxBatch * 4, 16)
      val t0 = System.nanoTime()
      val cands = toks
        .select(col("cnt"),
          explode(zip_with(slice(tok, lit(1), size(tok) - 1),
            slice(tok, lit(2), size(tok) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(horizon).collect()
      tAgg += (System.nanoTime() - t0) / 1e9
      if (cands.isEmpty) step = nMerges
      else {
        val rows = cands.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val usedSyms = scala.collection.mutable.Set.empty[String]
        var m = 0
        while (m < rows.length && m < maxBatch && step + m < nMerges &&
            !usedSyms.contains(rows(m)._1) && !usedSyms.contains(rows(m)._2)) {
          usedSyms += rows(m)._1; usedSyms += rows(m)._2
          m += 1
        }
        val cut =
          if (m < rows.length) rows(m)._3
          else if (cands.length < horizon) 0L
          else rows.last._3
        val sel = rows.take(m).zipWithIndex
          .takeWhile { case ((_, _, c), i) => i == 0 || c > cut }
          .map(_._1)
        step += sel.length
        val next = sel.foldLeft(col("tokstr")) { case (acc, (l, r, _)) =>
          replace(acc, lit(S + l + SS + r + S), lit(S + l + r + S))
        }
        val t1 = System.nanoTime()
        toks = toks.withColumn("tokstr", next).localCheckpoint()
        tCkpt += (System.nanoTime() - t1) / 1e9
      }
    }
    println(f"BPEFLOOR phases rounds=$rounds agg+collect=$tAgg%.2f s ckpt=$tCkpt%.2f s " +
      f"perRound agg=${tAgg / rounds}%.3f ckpt=${tCkpt / rounds}%.3f")
    spark.stop()
  }
}
