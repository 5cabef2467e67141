package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and chunking — the last mile of a training-data
  * pipeline: documents are concatenated into one token stream and sliced
  * into fixed-length context windows (packing), or split into overlapping
  * token windows (chunking, the RAG/long-doc shape).
  *
  * Packing needs a GLOBAL exclusive prefix sum of token counts in document
  * order. The naive form — one window over `ORDER BY doc_id` with no
  * partition key — funnels the entire corpus through a single reducer and
  * is exactly the kind of plan that dies at 100 TB. [[packTokenStream]]
  * instead runs the classic two-phase distributed scan:
  *
  *  1. range-partition by doc id (partition p holds a contiguous id range)
  *     and freeze the partitioning with a localCheckpoint — the range
  *     boundaries come from a nondeterministic sample, so both downstream
  *     actions must observe the SAME placement;
  *  2. aggregate one (partition, token-total) row per partition — a
  *     driver-side list bounded by the partition count, not the data —
  *     and turn it into per-partition start offsets;
  *  3. add the broadcast offset to a WITHIN-partition running sum.
  *
  * Every partition then computes its slice of the global prefix sum
  * independently; no single-reducer stage exists in the plan.
  */
object Packing {

  /** Exclusive prefix sum of `valCol` in ascending `idCol` order — the
    * two-phase distributed scan described above, reusable by anything that
    * needs a global running total (packing bins, weighted-sampling
    * intervals). Returns (doc_id, n, start) with `start` the sum of `n`
    * over all lower-id rows. No single-reducer stage in the plan. */
  def prefixSum(docs: DataFrame, idCol: String, valCol: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .select(col(idCol).as("doc_id"), valCol.cast("long").as("n"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // One row per partition: (pid, min doc_id, value total). Bounded by the
    // partition count — manifest-scale bookkeeping, not a data collect.
    // orderBy("lo") sorts with the id column's own type ordering, so int,
    // long, and string doc ids all work — a driver-side getAs[Long] sort
    // would ClassCastException on anything but long.
    val partRows = base.groupBy("_pid")
      .agg(min("doc_id").as("lo"), sum("n").as("tot"))
      .orderBy("lo")
      .collect()
    val offsets = partRows
      .scanLeft((-1, 0L)) { case ((_, acc), r) =>
        (r.getAs[Int]("_pid"), acc + r.getAs[Long]("tot"))
      }
    val offsetByPid = offsets.zip(offsets.tail)
      .map { case ((_, before), (pid, _)) => (pid, before) }
    val offsetDf = offsetByPid.toSeq.toDF("_pid", "_offset")
    val within = Window.partitionBy("_pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("start",
        coalesce(sum("n").over(within), lit(0L)) + col("_offset"))
      .select("doc_id", "n", "start")
  }

  /** Exclusive prefix sum of `nTokCol` in ascending `idCol` order, plus the
    * context-window assignment for `contextLen`-token bins of the
    * concatenated stream: first_bin/last_bin are the bins holding the
    * document's first/last token, n_bins the span. */
  def packTokenStream(docs: DataFrame, idCol: String, nTokCol: Column,
                      contextLen: Int): DataFrame = {
    prefixSum(docs, idCol, nTokCol)
      .select(col("doc_id"), col("n").as("n_tok"), col("start").as("start_tok"))
      .withColumn("first_bin", expr(s"start_tok div $contextLen"))
      .withColumn("last_bin",
        expr(s"(start_tok + n_tok - 1) div $contextLen"))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + lit(1L))
      .select("doc_id", "n_tok", "start_tok", "first_bin", "last_bin", "n_bins")
  }

  /** Pack manifest: one row per (context bin, document slice) — the table
    * a dataloader consumes to assemble each `contextLen`-token window from
    * document pieces. For every bin a document overlaps, emits the
    * DOC-RELATIVE token range [tok_from, tok_to) feeding that bin. Built
    * from [[packTokenStream]]'s offsets by a per-row explode over the
    * first_bin..last_bin span — no further shuffle beyond the prefix sum. */
  def packManifest(docs: DataFrame, idCol: String, nTokCol: Column,
                   contextLen: Int): DataFrame = {
    val packed = packTokenStream(docs, idCol, nTokCol, contextLen)
    val L = contextLen.toLong
    packed
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .select(col("bin"), col("doc_id"),
        greatest(col("bin") * L - col("start_tok"), lit(0L)).as("tok_from"),
        least((col("bin") + 1) * L - col("start_tok"), col("n_tok")).as("tok_to"))
  }

  /** Overlapping fixed-size token windows per document: chunks start at
    * token offsets 0, stride, 2*stride, ... and the last chunk is the
    * first one whose window reaches the end of the document (it may be
    * shorter than `chunkSize`; no fully-redundant tail windows are
    * emitted). Pure per-row explode — embarrassingly parallel, no
    * shuffle. Returns (id, chunk_idx, chunk_text). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "need 0 < stride <= chunkSize")
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    // 1 + ceil(max(0, n_tok - chunkSize) / stride), in integer arithmetic
    val extra = greatest(nTok - lit(chunkSize), lit(0))
    val nChunks = lit(1) +
      ((extra + lit(stride - 1)) / lit(stride)).cast("int")
    docs.select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))))
      .toDF(idCol, "chunk_idx", "chunk_text")
  }

  /** Length-bucketed batch assignment (dynamic batching for inference /
    * padded training): documents land in a token-length bucket
    * (n_tok div bucketTok) and get a dense (batch_idx, pos_in_batch)
    * within it, so every batch holds `batchSize` docs of similar length
    * and padding waste is bounded by bucketTok. Ordering within a bucket
    * is by id — deterministic across runs and engines.
    *
    * Scale shape: ONE hash exchange on the bucket key; each window
    * partition is a length bucket, not the corpus. Returns
    * (id, n_tok, bucket, batch_idx, pos_in_batch). */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    bucketTok: Int = 16, batchSize: Int = 32): DataFrame = {
    require(bucketTok > 0 && batchSize > 0, "need positive bucket/batch sizes")
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
    docs.select(col(idCol), size(split(col(textCol), " ")).as("n_tok"))
      // Spark's `div` yields LONG; cast back so the schema is int like the
      // inputs (and the SQL mirrors' explicit INT casts)
      .withColumn("bucket", expr(s"n_tok div $bucketTok").cast("int"))
      .withColumn("_rn", row_number().over(w) - 1)
      .withColumn("batch_idx", expr(s"_rn div $batchSize").cast("int"))
      .withColumn("pos_in_batch", expr(s"_rn % $batchSize"))
      .drop("_rn")
  }
}
