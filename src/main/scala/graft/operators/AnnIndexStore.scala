package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  * Parquet tables under one generation directory (all append-friendly
  * except the trained codebooks, which are fixed at build time — the
  * standard IVF-PQ contract: new vectors are CODED with the existing
  * codebooks and appended, they do not retrain them):
  *
  *   `<dir>/meta.json`             — {"v":2, dim/nCells/m/k/scale, gen}
  *   `<dir>/g<g>/coarse`   (j, q)          — nCells coarse centroids
  *   `<dir>/g<g>/pqcents`  (sub, j, q)     — m*k PQ subspace centroids
  *   `<dir>/g<g>/cells`    (id, cell)      — corpus coarse assignment
  *   `<dir>/g<g>/codes`    (sub, id, code) — corpus PQ codes (m rows/vec)
  *   `<dir>/g<g>/vectors`  (id, q)         — flat quantized vectors
  *
  * GENERATIONS (serve-through-compact): `meta.json` names the live
  * generation and is swung ATOMICALLY (tmp + ATOMIC_MOVE) only after the
  * next generation is fully materialized; the replaced generation is
  * retained until the following compaction, so a reader racing
  * [[compact]] keeps serving the old generation and never observes an
  * absent or torn index (same discipline as [[DedupIndex]] /
  * [[graft.streaming.SnapshotStore]]). A crash mid-compaction leaves a
  * stale g<next> dir the next build/compact cleans; meta.json still
  * points at the intact current generation throughout. meta.json is
  * written AFTER the initial data lands, so it doubles as the
  * build-completion marker.
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

  private def metaFile(dir: String) = Paths.get(s"$dir/meta.json")

  private case class Meta(dim: Int, nCells: Int, m: Int, k: Int, scale: Int,
                          gen: Int)

  private def readMeta(dir: String): Option[Meta] = {
    val p = metaFile(dir)
    if (!Files.exists(p)) None
    else {
      val txt = Files.readString(p)
      def f(key: String): Option[Int] =
        s""""$key":(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      // v1 metas (no "v"/"gen" keys, flat table layout) read as absent —
      // the layout changed, the store must be rebuilt, not half-read.
      if (!f("v").contains(2)) None
      else for {
        dim <- f("dim"); nc <- f("nCells"); m <- f("m"); k <- f("k")
        sc <- f("scale"); g <- f("gen")
      } yield Meta(dim, nc, m, k, sc, g)
    }
  }

  private def writeMeta(dir: String, mt: Meta): Unit = {
    val tmp = Paths.get(s"$dir/meta.json.tmp")
    Files.writeString(tmp,
      s"""{"v":2,"dim":${mt.dim},"nCells":${mt.nCells},"m":${mt.m},""" +
        s""""k":${mt.k},"scale":${mt.scale},"gen":${mt.gen}}""")
    Files.move(tmp, metaFile(dir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** The live generation's data directory (exposed for specs/tools). */
  def currentGenDir(dir: String): String = {
    val mt = readMeta(dir).getOrElse(sys.error(s"no AnnIndexStore at $dir"))
    s"$dir/g${mt.gen}"
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
      finally walk.close()
    }

  private val LegacyDirs = {
    val ts = Seq("coarse", "pqcents", "cells", "codes", "vectors")
    (ts ++ ts.map(_ + "_old") ++ ts.map(_ + "_tmp")).toSet
  }

  private def pruneDirs(dir: String, keep: Set[Int]): Unit = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return
    val ls = Files.list(root)
    val entries = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.toList
    } finally ls.close()
    entries.foreach { p =>
      val name = p.getFileName.toString
      val genOf = """^g(\d+)$""".r.findFirstMatchIn(name).map(_.group(1).toInt)
      if (genOf.exists(g => !keep(g)) || LegacyDirs(name)) deleteRecursively(p)
    }
  }

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
    Files.createDirectories(Paths.get(dir))
    // rebuild window: drop the completion marker before touching data,
    // then clear stale generations / legacy v1 tables for a clean slate
    Files.deleteIfExists(metaFile(dir))
    pruneDirs(dir, keep = Set.empty)
    val g = s"$dir/g0"
    val pts = Clustering.quantized(corpus, idCol, vecCol, scale)
    pts.write.mode("overwrite").parquet(s"$g/vectors")

    val coarse = Clustering.train(pts, nCells, cIters)
    coarse.map { case (j, c) => (j, c.toSeq) }.toDF("j", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$g/coarse")
    pts.select(col("id"),
        Clustering.nearest(coarse, col("q")).getField("j").as("cell"))
      .write.mode("overwrite").parquet(s"$g/cells")

    val subParts = (0 until m).map { s =>
      val spts = pts.select(col("id"),
        slice(col("q"), s * subDim + 1, subDim).as("q"))
      val cents = Clustering.train(spts, k, iters)
      val codes = spts.select(lit(s).as("sub"), col("id"),
        Clustering.nearest(cents, col("q")).getField("j").as("code"))
      (cents.map { case (j, c) => (s, j, c.toSeq) }, codes)
    }
    subParts.flatMap(_._1).toDF("sub", "j", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$g/pqcents")
    subParts.map(_._2).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$g/codes")

    writeMeta(dir, Meta(dim, nCells, m, k, scale, gen = 0))
  }

  /** Code an accepted batch with the STORED codebooks and append it to
    * cells/codes/vectors — the incremental-index contract: new ids must be
    * disjoint from the stored corpus; codebooks are never retrained. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             dir: String): Unit = {
    val spark = batch.sparkSession
    val mt = readMeta(dir).getOrElse(sys.error(s"no AnnIndexStore at $dir"))
    val g = s"$dir/g${mt.gen}"
    val subDim = mt.dim / mt.m
    val pts = Clustering.quantized(batch, idCol, vecCol, mt.scale)
    pts.write.mode("append").parquet(s"$g/vectors")
    pts.select(col("id"),
        Clustering.nearest(coarseCents(spark, g), col("q")).getField("j")
          .as("cell"))
      .write.mode("append").parquet(s"$g/cells")
    val pq = pqCents(spark, g)
    (0 until mt.m).map { s =>
      pts.select(lit(s).as("sub"), col("id"),
        Clustering.nearest(pq(s), slice(col("q"), s * subDim + 1, subDim))
          .getField("j").as("code"))
    }.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$g/codes")
  }

  def exists(dir: String): Boolean =
    readMeta(dir).exists { mt =>
      Seq("coarse", "pqcents", "cells", "codes", "vectors")
        .forall(t => Files.exists(Paths.get(s"$dir/g${mt.gen}/$t/_SUCCESS")))
    }

  /** Compact the appendable tables (cells/codes/vectors) into the NEXT
    * generation: every [[append]] adds its own task files, so a
    * frequently-fed index decays into per-batch small files and serving's
    * candidate/code/vector reads pay per-file open cost. Codebooks
    * (coarse/pqcents) are single-file by construction and are copied
    * through; rows are preserved exactly, so served answers are
    * bit-identical before and after ([[graft.AnnIndexSpec]]). The
    * meta.json pointer swings atomically after the new generation is
    * fully materialized, and the replaced generation is retained for
    * in-flight readers until the following compaction (class doc). */
  def compact(spark: SparkSession, dir: String, filesPerTable: Int = 4): Unit = {
    val mt = readMeta(dir).getOrElse(sys.error(s"no complete AnnIndexStore at $dir"))
    require(exists(dir), s"no complete AnnIndexStore at $dir")
    val next = mt.gen + 1
    pruneDirs(dir, keep = Set(mt.gen, mt.gen - 1))
    Seq("cells", "codes", "vectors").foreach { t =>
      spark.read.parquet(s"$dir/g${mt.gen}/$t").repartition(filesPerTable)
        .write.mode("overwrite").parquet(s"$dir/g$next/$t")
    }
    Seq("coarse", "pqcents").foreach { t =>
      spark.read.parquet(s"$dir/g${mt.gen}/$t").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/g$next/$t")
    }
    writeMeta(dir, mt.copy(gen = next))
    pruneDirs(dir, keep = Set(mt.gen, next))
  }

  /** Serve top-kNN neighbors for `queries` from the stored index: probe
    * the `nProbe` nearest coarse cells, ADC-score only those cells'
    * members from the stored codes, and (refine > 0, recommended — see
    * [[Clustering.annTopKIvfPq]]'s recall note) exactly re-rank the ADC
    * top-`refine` pool from the stored flat vectors. Self-matches
    * (qid == id, for queries drawn from the corpus) are excluded, matching
    * the inline form. The live generation is pinned once at entry, so a
    * concurrent [[compact]] cannot tear the view. Returns
    * (qid, rank, nid, dist) exact when refined, (qid, rank, nid, adist)
    * ADC-approximate otherwise. */
  def query(queries: DataFrame, idCol: String, vecCol: String, dir: String,
            kNN: Int = 3, nProbe: Int = 2, refine: Int = 0): DataFrame = {
    val (adc, qpts, g) = adcPool(queries, idCol, vecCol, dir,
      if (refine > 0) refine else kNN, nProbe)
    if (refine <= 0) adc
    else Clustering.refineTopKQuantized(adc,
      queries.sparkSession.read.parquet(s"$g/vectors"), qpts, kNN)
  }

  /** Hard-negative mining served FROM THE STORED INDEX — the scale path
    * for [[Similarity.hardNegatives]]'s brute corpus scan (VERDICT r07
    * #5): per anchor, the `k` nearest stored vectors whose EXACT refined
    * distance is strictly ABOVE `negFloor`. Anything at or below the
    * floor is a near-duplicate of the anchor (use the same threshold as
    * the semantic-dedup pass) and would poison a contrastive batch as a
    * false negative; the nearest survivors above it carry the gradient.
    * Serving cost is the standard probe shape — nProbe cells' members
    * ADC-scored, top-`refine` pool exactly re-ranked — so per-anchor-batch
    * cost tracks probed-cell population, never the corpus. Candidates are
    * limited to the probed cells and ADC pool exactly as in [[query]]
    * (same recall knobs; with nProbe = nCells and refine >= corpus the
    * result is bit-identical to the brute band-filtered scan, asserted in
    * [[graft.AnnIndexSpec]]). Returns (qid, rank, nid, dist). */
  def hardNegatives(queries: DataFrame, idCol: String, vecCol: String,
                    dir: String, k: Int, negFloor: Long, nProbe: Int = 2,
                    refine: Int = 30): DataFrame = {
    require(refine > 0, "hardNegatives needs an exact refine pool (> 0): " +
      "the band boundary must be judged on exact distances")
    val (adc, qpts, g) = adcPool(queries, idCol, vecCol, dir, refine, nProbe)
    Clustering.refineTopKQuantized(adc,
      queries.sparkSession.read.parquet(s"$g/vectors"), qpts, k,
      minDist = negFloor)
  }

  /** Per-vector near-duplicate verdict against the stored index — the
    * embedding twin of [[DedupIndex.matchBatch]]: one row per incoming
    * vector, (new_id, match_id, dist, is_dup), where match_id/dist name
    * the NEAREST stored vector by exact quantized L2 (from the refined
    * pool) iff that distance is at or below `dupFloor` — the semantic-dup
    * radius — and null/-1/false otherwise. Incoming ids must be disjoint
    * from the stored corpus. Serving cost is the standard probe shape
    * (nProbe cells ADC-scored, top-`refine` exactly re-ranked), so the
    * per-batch cost tracks probed cells, never the corpus; recall of the
    * verdict inherits the probe/pool knobs exactly like [[query]].
    * [[graft.streaming.StreamingAnn.gateAndMaintainVectors]] is the
    * ingest-loop composition (gate + append survivors).
    *
    * DEFAULTS sized for recall, and measured (tools/GateFloorProbe,
    * shipped as the q_ann_gate_recall audit): at a radius set to the
    * MEDIAN nearest-neighbor distance — the adversarial regime, where
    * half the "dups" are barely distinguishable from non-dups — recall is
    * POOL-bound, not probe-bound (refine=30 caps at ~0.5 even probing all
    * cells; nProbe=6/refine=100 measures 0.875 at sf0.01). A production
    * semantic-dup radius sits well inside the NN distribution (true dups
    * are near-copies), where the ADC gap is easy; re-run the audit when
    * changing corpus or radius. */
  def matchBatchVectors(batch: DataFrame, idCol: String, vecCol: String,
                        dir: String, dupFloor: Long, nProbe: Int = 6,
                        refine: Int = 100): DataFrame = {
    require(refine > 0, "matchBatchVectors needs an exact refine pool (> 0)")
    val (adc, qpts, g) = adcPool(batch, idCol, vecCol, dir, refine, nProbe)
    val best = Clustering.refineTopKQuantized(adc,
        batch.sparkSession.read.parquet(s"$g/vectors"), qpts, kNN = 1)
      .filter(col("dist") <= dupFloor)
      .select(col("qid").as("new_id"), col("nid").as("match_id"),
        col("dist"))
    batch.select(col(idCol).cast("long").as("new_id"))
      .join(best, Seq("new_id"), "left")
      .select(col("new_id"), col("match_id"),
        coalesce(col("dist"), lit(-1L)).as("dist"),
        col("match_id").isNotNull.as("is_dup"))
  }

  /** EXACT brute-force twin of [[matchBatchVectors]] — the ground-truth
    * side of the gate's recall audit (q_ann_gate_recall): every incoming
    * vector scored against the FULL `corpus` frame (quantized L2, one
    * corpus scan x broadcast batch, min_by partial aggregation), same
    * verdict contract. A gate "dup" carries an exact distance <= floor,
    * so gate-found ⊆ exact-found and recall = found/true — the number to
    * check before trusting the probe/pool knobs at a new scale. */
  def matchBatchVectorsExact(batch: DataFrame, idCol: String, vecCol: String,
                             corpus: DataFrame, dupFloor: Long,
                             scale: Int = 1000): DataFrame = {
    val b = Clustering.quantized(batch, idCol, vecCol, scale)
      .select(col("id").as("qid"), col("q").as("qq"))
    val c = Clustering.quantized(corpus, idCol, vecCol, scale)
      .select(col("id").as("nid"), col("q").as("nq"))
    val best = c.crossJoin(broadcast(b))
      .withColumn("dist",
        aggregate(zip_with(col("qq"), col("nq"), (a, x) => (a - x) * (a - x)),
          lit(0L), (acc, x) => acc + x))
      .groupBy("qid")
      .agg(min_by(struct(col("nid").as("match_id"), col("dist")),
        struct(col("dist"), col("nid"))).as("m"))
      .select(col("qid").as("new_id"), col("m.match_id").as("match_id"),
        col("m.dist").as("dist"))
      .filter(col("dist") <= dupFloor)
    batch.select(col(idCol).cast("long").as("new_id"))
      .join(best, Seq("new_id"), "left")
      .select(col("new_id"), col("match_id"),
        coalesce(col("dist"), lit(-1L)).as("dist"),
        col("match_id").isNotNull.as("is_dup"))
  }

  /** Shared serving front half: probe the nProbe nearest coarse cells and
    * ADC-rank the probed cells' members to a `poolSize` candidate pool.
    * Returns (adc pool, quantized queries, pinned generation dir). */
  private def adcPool(queries: DataFrame, idCol: String, vecCol: String,
                      dir: String, poolSize: Int, nProbe: Int)
      : (DataFrame, DataFrame, String) = {
    val spark = queries.sparkSession
    val mt = readMeta(dir).getOrElse(sys.error(s"no AnnIndexStore at $dir"))
    val g = s"$dir/g${mt.gen}"
    val subDim = mt.dim / mt.m
    val coarse = coarseCents(spark, g)
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
    val cand = spark.read.parquet(s"$g/cells")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
    val pq = pqCents(spark, g)
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
      cand.join(spark.read.parquet(s"$g/codes"), Seq("id"))
        .join(broadcast(luts), Seq("qid", "sub", "code")),
      poolSize)
    (adc, qpts, g)
  }

  private def coarseCents(spark: SparkSession, g: String): Seq[(Int, Array[Long])] =
    spark.read.parquet(s"$g/coarse").select("j", "q").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq

  private def pqCents(spark: SparkSession,
                      g: String): Map[Int, Seq[(Int, Array[Long])]] =
    spark.read.parquet(s"$g/pqcents").select("sub", "j", "q").collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) => s -> rows
        .map(r => (r.getInt(1), r.getSeq[Long](2).toArray))
        .sortBy(_._1).toSeq }
}
