package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): stage decomposition of q_fuzzy_resolve2 — which part
  * of the PassJoin pipeline carries the ~7 s bench median. */
object FuzzyStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("name"))
    val dirty = base
      .select(col("doc_id"),
        expr("concat(substring(name, 1, cast(doc_id % 32 as int)), " +
          "substring(name, cast(doc_id % 32 as int) + 2, 32))").as("s1"))
      .select(col("doc_id").as("did"),
        expr("concat(substring(s1, 1, cast((doc_id * 7) % 31 as int)), " +
          "substring(s1, cast((doc_id * 7) % 31 as int) + 2, 31))").as("dname"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FUZZPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    // inline copy of resolveByEditK's internals for sub-frame timing
    val maxDist = 2
    val m = maxDist + 1
    def segLen(lr: org.apache.spark.sql.Column, j: Int) =
      (lr / m).cast("int") + when(lit(j) < lr % m, 1).otherwise(0)
    def segStart(lr: org.apache.spark.sql.Column, j: Int) =
      (lit(j) * (lr / m).cast("int") + least(lit(j), lr % m)).cast("int")
    val (leftId, leftStr, rightId, rightStr) = ("did", "dname", "doc_id", "name")
    val (left, right) = (dirty, base)
    val rKeys = (0 until m).map { j =>
      val lr = length(col(rightStr))
      struct(lr.as("lr"), lit(j).as("j"),
        col(rightStr).substr(segStart(lr, j) + 1, segLen(lr, j)).as("seg"),
        (lr >= m).as("valid"))
    }
    val rb = right.select(col(rightId).as("r_id"), col(rightStr).as("r_s"),
        explode(filter(array(rKeys: _*), x => x.getField("valid"))).as("k"))
      .select(col("r_id"), col("r_s"), col("k.lr").as("lr"),
        col("k.j").as("j"), col("k.seg").as("seg"))
    val ls = length(col(leftStr))
    val lKeys = for {
      dl <- -maxDist to maxDist
      j <- 0 until m
      d <- -maxDist to maxDist
    } yield {
      val lr = ls + dl
      val p = segStart(lr, j) + d
      struct(lr.as("lr"), lit(j).as("j"),
        col(leftStr).substr(p + 1, segLen(lr, j)).as("seg"),
        (lr >= m && p >= 0 && (p + segLen(lr, j)) <= ls).as("valid"))
    }
    val lb = left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"),
        explode(array_distinct(
          filter(array(lKeys: _*), x => x.getField("valid")))).as("k"))
      .select(col("l_id"), col("l_s"), col("k.lr").as("lr"),
        col("k.j").as("j"), col("k.seg").as("seg"))
    val cand0 = lb.join(rb, Seq("lr", "j", "seg"))
      .select(col("l_id"), col("l_s"), col("r_id"), col("r_s"))
    val cand = cand0.distinct()
    // formulation B: plain explode + relational filter (no HOF)
    val lbB = left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"),
        explode(array(lKeys: _*)).as("k"))
      .filter(col("k.valid"))
      .select(col("l_id"), col("l_s"), col("k.lr").as("lr"),
        col("k.j").as("j"), col("k.seg").as("seg"))
    // formulation C: explode literal (dl, j, d) combos, compute seg per row
    val combos = (for {
      dl <- -maxDist to maxDist
      j <- 0 until m
      d <- -maxDist to maxDist
    } yield struct(lit(dl).as("dl"), lit(j).as("j"), lit(d).as("d")))
    val lbC = {
      val lsC = length(col("l_s"))
      val lrC = lsC + col("c.dl")
      val slC = (lrC / m).cast("int") +
        when(col("c.j") < lrC % m, 1).otherwise(0)
      val pC = (col("c.j") * (lrC / m).cast("int") +
        least(col("c.j"), lrC % m)).cast("int") + col("c.d")
      left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"),
          explode(array(combos: _*)).as("c"))
        .filter(lrC >= m && pC >= 0 && (pC + slC) <= lsC)
        .select(col("l_id"), col("l_s"), lrC.as("lr"),
          col("c.j").as("j"),
          col("l_s").substr(pC + 1, slC).as("seg"))
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      t("lb noop") { lb.write.format("noop").mode("overwrite").save(); 0 }
      t("lbB (explode+filter) noop") {
        lbB.write.format("noop").mode("overwrite").save(); 0 }
      t("lbB count") { lbB.count() }
      t("lbC (combo explode) noop") {
        lbC.write.format("noop").mode("overwrite").save(); 0 }
      t("lbC count") { lbC.count() }
      t("rb noop") { rb.write.format("noop").mode("overwrite").save(); 0 }
      t("cand0 (join, pre-distinct) noop") {
        cand0.write.format("noop").mode("overwrite").save(); 0 }
      t("cand0 count") { cand0.count() }
      t("cand (distinct) noop") {
        cand.write.format("noop").mode("overwrite").save(); 0 }
      t("cand + levenshtein noop") {
        cand.withColumn("dist", levenshtein(col("l_s"), col("r_s")))
          .filter(col("dist") <= maxDist)
          .write.format("noop").mode("overwrite").save(); 0 }
      val res = graft.operators.Fuzzy.resolveByEditK(
        dirty, "did", "dname", base, "doc_id", "name", maxDist = 2)
      t("resolveByEditK full noop") {
        res.write.format("noop").mode("overwrite").save(); 0
      }
    }
    spark.stop()
  }
}
