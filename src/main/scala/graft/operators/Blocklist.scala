package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-diff against a blocklist — "drop every document already seen":
  * previously crawled URLs, documents used by an earlier training run, a
  * contamination list of benchmark ids.
  *
  * 100-TB shape: the naive exact formulation is a `left_anti` join that
  * shuffles the ENTIRE corpus on the key. Here the corpus is prefiltered
  * with a Bloom filter built from the blocklist keys
  * (`org.apache.spark.util.sketch.BloomFilter` via `df.stat.bloomFilter` —
  * a distributed aggregation whose result is sketch-sized, bounded by
  * (expectedItems, fpp), NOT data-sized — then broadcast to executors).
  * Rows the filter rejects are DEFINITELY clean and pass through with zero
  * shuffle; only the "maybe" rows (true hits + the false-positive
  * fraction) enter the exact anti-join, which removes the false positives.
  * The RESULT is therefore EXACT — the bloom stage only routes rows — so
  * the operator is oracle-verifiable while the shuffled volume drops from
  * |corpus| to |hits| + fpp * |corpus|.
  *
  * Keys are BIGINT (doc ids, url hashes); hash string keys with xxhash64
  * first. The membership probe is a broadcast-variable UDF by necessity:
  * Spark's `might_contain` expression is internal to runtime filters and
  * has no public Column API — the probe is a bit-test, not a hot loop.
  */
object Blocklist {

  def bloomDiff(corpus: DataFrame, keyCol: String,
                blocklist: DataFrame, blockKeyCol: String,
                expectedItems: Long = 1000000L,
                fpp: Double = 0.01): DataFrame = {
    val bf = blocklist.stat.bloomFilter(blockKeyCol, expectedItems, fpp)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    // definitely-clean rows bypass the join entirely (no shuffle)
    val clean = corpus.filter(!mightContain(col(keyCol)))
    // maybe-rows: exact anti-join removes the bloom false positives
    val maybe = corpus.filter(mightContain(col(keyCol)))
      .join(blocklist.select(col(blockKeyCol).as(keyCol)), Seq(keyCol), "left_anti")
    clean.unionByName(maybe)
  }
}
