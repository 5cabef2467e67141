package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Production-hash path (xxhash64) must mirror the oracle-parity (md5) path
  * structurally: same cardinalities, deterministic across runs — only the
  * hash values differ. */
class TextDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("xxhash64 production path: same shape, deterministic, cheaper hash") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)

    val sigO = TextDedup.minHashSignature(docs, "doc_id", "text")
    val sigP = TextDedup.minHashSignature(docs, "doc_id", "text", oracleParity = false)
    assert(sigO.count() == sigP.count())
    assert(sigO.columns.toSeq == sigP.columns.toSeq)
    // deterministic across evaluations
    assert(sigP.collect().toSet == TextDedup.minHashSignature(
      docs, "doc_id", "text", oracleParity = false).collect().toSet)

    val shP = TextDedup.simHashSignature(docs, "doc_id", "text", oracleParity = false)
    assert(shP.count() == 100)
    // 60-bit mask holds
    assert(shP.collect().forall { r =>
      val v = r.getAs[Long]("simhash"); v >= 0 && v < (1L << 60)
    })

    val wO = TextDedup.winnowingFingerprints(docs, "doc_id", "text")
    val wP = TextDedup.winnowingFingerprints(docs, "doc_id", "text", oracleParity = false)
    // winnowing density depends only on hash distribution; counts are close
    val (co, cp) = (wO.count(), wP.count())
    assert(math.abs(co - cp) < co / 5, s"fingerprint counts diverged: $co vs $cp")
  }
}
