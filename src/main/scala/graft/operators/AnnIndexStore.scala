package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ ANN index — the trained similarity-search artifact,
  * applying [[DedupIndex]]'s maintained-artifact discipline to the ANN
  * surface: at 100 TB the coarse quantizer and PQ codebooks are TRAINED
  * ONCE (an offline index-build job over the corpus), and serving reads
  * the stored cells/codes tables — it never re-runs Lloyd's per query
  * batch, which is exactly what the inline [[Clustering.annTopKIvfPq]]
  * form pays every call (fine for one-shot jobs, wrong for a served
  * index; FAISS makes the same build/serve split).
  *
  * Parquet tables under one root (all append-friendly except the trained
  * codebooks, which are fixed at build time — the standard IVF-PQ
  * contract: new vectors are CODED with the existing codebooks and
  * appended to cells/codes/vectors, they do not retrain them):
  *
  *   `<dir>/coarse`   (j, q)          — nCells coarse centroids (quantized)
  *   `<dir>/pqcents`  (sub, j, q)     — m*k PQ subspace centroids
  *   `<dir>/cells`    (id, cell)      — corpus coarse assignment
  *   `<dir>/codes`    (sub, id, code) — corpus PQ codes (m rows per vector)
  *   `<dir>/vectors`  (id, q)         — flat quantized vectors (refine side)
  *   `<dir>/meta.json`                — dim/nCells/m/k/scale (serving reads
  *                                      these; callers only pick kNN/nProbe/
  *                                      refine)
  *
  * Training is the deterministic integer Lloyd's, so a stored index built
  * from a corpus and then queried yields BIT-IDENTICAL results to the
  * inline `annTopKIvfPq(refine = r)` call on the same corpus — asserted in
  * AnnIndexSpec and oracle-checked (q_ann_stored shares
  * q_ann_ivfpq_refined's DuckDB mirror).
  *
  * Serving scale shape: centroid reads are manifest-scale collects (k*dim
  * longs); the probe set and per-query LUTs are broadcast; candidate
  * restriction is ONE equi-join of the stored cells table against the
  * broadcast probes; scoring joins candidates to stored codes on id and
  * the broadcast LUTs on (qid, sub, code); refine fetches only the
  * top-pool rows from the flat-vector table by id. A cluster deployment
  * would bucketBy(cell) the cells table and bucketBy(id) codes/vectors so
  * the serving joins prune at file level.
  */
object AnnIndexStore {

  /** Train coarse + PQ codebooks on `corpus` and write the full index
    * under `dir` (overwrite). One quantization pass feeds the coarse
    * trainer, the m subspace trainers, the cell/code assignment, and the
    * stored flat vectors. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
            dim: Int, nCells: Int = 8, cIters: Int = 3, m: Int = 4,
            k: Int = 16, iters: Int = 2, scale: Int = 1000): Unit = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val pts = Clustering.quantized(corpus, idCol, vecCol, scale)
    pts.write.mode("overwrite").parquet(s"$dir/vectors")

    val coarse = Clustering.train(pts, nCells, cIters)
    coarse.map { case (j, c) => (j, c.toSeq) }.toDF("j", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/coarse")
    pts.select(col("id"),
        Clustering.nearest(coarse, col("q")).getField("j").as("cell"))
      .write.mode("overwrite").parquet(s"$dir/cells")

    val subParts = (0 until m).map { s =>
      val spts = pts.select(col("id"),
        slice(col("q"), s * subDim + 1, subDim).as("q"))
      val cents = Clustering.train(spts, k, iters)
      val codes = spts.select(lit(s).as("sub"), col("id"),
        Clustering.nearest(cents, col("q")).getField("j").as("code"))
      (cents.map { case (j, c) => (s, j, c.toSeq) }, codes)
    }
    subParts.flatMap(_._1).toDF("sub", "j", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pqcents")
    subParts.map(_._2).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/codes")

    Files.writeString(Paths.get(s"$dir/meta.json"),
      s"""{"dim":$dim,"nCells":$nCells,"m":$m,"k":$k,"scale":$scale}""")
  }

  /** Code an accepted batch with the STORED codebooks and append it to
    * cells/codes/vectors — the incremental-index contract: new ids must be
    * disjoint from the stored corpus; codebooks are never retrained. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             dir: String): Unit = {
    val spark = batch.sparkSession
    val mt = meta(dir)
    val subDim = mt.dim / mt.m
    val pts = Clustering.quantized(batch, idCol, vecCol, mt.scale)
    pts.write.mode("append").parquet(s"$dir/vectors")
    pts.select(col("id"),
        Clustering.nearest(coarseCents(spark, dir), col("q")).getField("j")
          .as("cell"))
      .write.mode("append").parquet(s"$dir/cells")
    val pq = pqCents(spark, dir)
    (0 until mt.m).map { s =>
      pts.select(lit(s).as("sub"), col("id"),
        Clustering.nearest(pq(s), slice(col("q"), s * subDim + 1, subDim))
          .getField("j").as("code"))
    }.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$dir/codes")
  }

  def exists(dir: String): Boolean =
    Seq("coarse", "pqcents", "cells", "codes", "vectors")
      .forall(t => Files.exists(Paths.get(s"$dir/$t/_SUCCESS"))) &&
      Files.exists(Paths.get(s"$dir/meta.json"))

  /** Compact the appendable tables (cells/codes/vectors) in place: every
    * [[append]] adds its own task files, so a frequently-fed index decays
    * into per-batch small files and serving's candidate/code/vector reads
    * pay per-file open cost — the same decay [[DedupIndex.compact]]
    * reverses for the dedup store, with the same crash discipline:
    * `meta.json` (the completion marker serving requires) is dropped
    * before any data move and restored only after all swaps, so a crash
    * mid-compaction reads as an absent index rather than a torn one.
    * Codebooks (coarse/pqcents) are single-file by construction and are
    * not touched; rows are preserved exactly, so served answers are
    * bit-identical before and after ([[graft.AnnIndexSpec]]). */
  def compact(spark: SparkSession, dir: String, filesPerTable: Int = 4): Unit = {
    require(exists(dir), s"no complete AnnIndexStore at $dir")
    val metaJson = Files.readString(Paths.get(s"$dir/meta.json"))
    val tables = Seq("cells", "codes", "vectors")
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t").repartition(filesPerTable)
        .write.mode("overwrite").parquet(s"$dir/${t}_tmp")
    }
    Files.deleteIfExists(Paths.get(s"$dir/meta.json")) // index reads absent
    tables.foreach { t =>
      val cur = Paths.get(s"$dir/$t"); val old = Paths.get(s"$dir/${t}_old")
      Files.move(cur, old)
      Files.move(Paths.get(s"$dir/${t}_tmp"), cur)
      val walk = Files.walk(old)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
    Files.writeString(Paths.get(s"$dir/meta.json"), metaJson)
  }

  /** Serve top-kNN neighbors for `queries` from the stored index: probe
    * the `nProbe` nearest coarse cells, ADC-score only those cells'
    * members from the stored codes, and (refine > 0, recommended — see
    * [[Clustering.annTopKIvfPq]]'s recall note) exactly re-rank the ADC
    * top-`refine` pool from the stored flat vectors. Self-matches
    * (qid == id, for queries drawn from the corpus) are excluded, matching
    * the inline form. Returns (qid, rank, nid, dist) exact when refined,
    * (qid, rank, nid, adist) ADC-approximate otherwise. */
  def query(queries: DataFrame, idCol: String, vecCol: String, dir: String,
            kNN: Int = 3, nProbe: Int = 2, refine: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val mt = meta(dir)
    val subDim = mt.dim / mt.m
    val coarse = coarseCents(spark, dir)
    val qpts = Clustering.quantized(queries, idCol, vecCol, mt.scale)
    val qcd = qpts.select(col("id").as("qid"),
        explode(array(coarse.map { case (j, c) =>
          struct(lit(j).as("cell"), Clustering.qdist(col("q"), c).as("d"))
        }: _*)).as("e"))
      .select(col("qid"), col("e.cell").as("cell"), col("e.d").as("d"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d"), col("cell"))
    val probes = qcd.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe).select(col("qid"), col("cell"))
    val cand = spark.read.parquet(s"$dir/cells")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
    val pq = pqCents(spark, dir)
    val luts = (0 until mt.m).map { s =>
      qpts.select(col("id").as("qid"),
          explode(array(pq(s).map { case (j, c) =>
            struct(lit(j).as("code"),
              Clustering.qdist(slice(col("q"), s * subDim + 1, subDim), c)
                .as("pd"))
          }: _*)).as("e"))
        .select(col("qid"), lit(s).as("sub"),
          col("e.code").as("code"), col("e.pd").as("pd"))
    }.reduce(_ unionByName _)
    val adc = Clustering.pqTopK(
      cand.join(spark.read.parquet(s"$dir/codes"), Seq("id"))
        .join(broadcast(luts), Seq("qid", "sub", "code")),
      if (refine > 0) refine else kNN)
    if (refine <= 0) adc
    else Clustering.refineTopKQuantized(adc,
      spark.read.parquet(s"$dir/vectors"), qpts, kNN)
  }

  private case class Meta(dim: Int, nCells: Int, m: Int, k: Int, scale: Int)

  private def meta(dir: String): Meta = {
    val txt = Files.readString(Paths.get(s"$dir/meta.json"))
    def f(key: String): Int =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"meta.json missing $key")).group(1).toInt
    Meta(f("dim"), f("nCells"), f("m"), f("k"), f("scale"))
  }

  private def coarseCents(spark: SparkSession, dir: String): Seq[(Int, Array[Long])] =
    spark.read.parquet(s"$dir/coarse").select("j", "q").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq

  private def pqCents(spark: SparkSession,
                      dir: String): Map[Int, Seq[(Int, Array[Long])]] =
    spark.read.parquet(s"$dir/pqcents").select("sub", "j", "q").collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) => s -> rows
        .map(r => (r.getInt(1), r.getSeq[Long](2).toArray))
        .sortBy(_._1).toSeq }
}
