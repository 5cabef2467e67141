package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language identification,
  * quality scoring, token counting. Pure `Column` expressions (whole-stage
  * codegen, no UDFs) so they stay cheap at 100 TB: a single projection,
  * no shuffle at all.
  */
object TextAnalysis {

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. With the
    * synthetic corpus all text is English-like; real lexicons would be larger.
    * Deterministic argmax with alphabetical tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Predicted language: lexicon with the highest distinct-token overlap;
    * ties resolved to the alphabetically-first language; no overlap -> "und"
    * (undetermined). */
  def langId(textCol: Column): Column = {
    val toks = array_distinct(split(textCol, " "))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first (alphabetical) language achieving the max score
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(trim(textCol), "\\s+"))

  /** BPE-ish subword count: split on word boundaries/punct and count chunks
    * of <=4 chars (a cheap deterministic proxy for BPE token counts). */
  def subwordCount(textCol: Column): Column =
    aggregate(
      split(trim(textCol), "\\s+"),
      lit(0),
      (acc, w) => acc + ceil(length(w) / 4.0).cast("int"))

  /** Quality features as a struct: token count, stopword ratio, mean word
    * length, punctuation ratio (all floor-truncated to 4 decimals so SQL
    * mirrors match bit-for-bit). */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")): DataFrame = {
    val toks = split(col(textCol), " ")
    def trunc4(c: Column): Column = floor(c * 10000) / 10000.0
    df.withColumn("n_tok", size(toks))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords.map(lit): _*))))
      .withColumn("n_punct", length(col(textCol)) -
        length(regexp_replace(col(textCol), "[\\.,;:!\\?]", "")))
      .select(col(idCol), col("n_tok"), col("n_stop"), col("n_punct"),
        trunc4(col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
        trunc4((length(col(textCol)) - (col("n_tok") - 1)).cast("double") / col("n_tok"))
          .as("avg_wlen"),
        trunc4(col("n_punct").cast("double") / length(col(textCol))).as("punct_ratio"))
  }
}
