package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis surface for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. Everything is a
  * column-level composition of codegen'd primitives — no UDFs, so the
  * whole profile computes in one WholeStageCodegen pass over the corpus
  * and column pruning keeps the scan at exactly the text column.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: word pieces + isolated punctuation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  def langId(text: Column): Column = GeoFunctions.lang_id(text)

  def fingerprint(text: Column): Column = GeoFunctions.text_fingerprint(text)

  /** Heuristic quality score in [0, 1]: blends length band, mean word
    * length band, alpha ratio, and whitespace sanity — the standard cheap
    * pre-filter ahead of expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val nAlpha = length(regexp_replace(text, lit("[^A-Za-z]"), lit(""))).cast("double")
    val nSpaces = (length(text) - length(regexp_replace(text, lit(" "), lit("")))).cast("double")
    val meanWordLen = (nChars - nSpaces) / greatest(nTokens, lit(1.0))
    val lengthBand = when(nChars.between(50, 10000), 1.0)
      .when(nChars.between(20, 100000), 0.5).otherwise(0.0)
    val wordLenBand = when(meanWordLen.between(2.5, 12.0), 1.0).otherwise(0.3)
    val alphaRatio = nAlpha / greatest(nChars, lit(1.0))
    val spaceSanity = when((nSpaces / greatest(nChars, lit(1.0))).between(0.05, 0.4), 1.0)
      .otherwise(0.5)
    (lengthBand * 0.3 + wordLenBand * 0.2 + alphaRatio * 0.3 + spaceSanity * 0.2)
  }

  /** Full per-document profile in one pass. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      tokenCount(t).as("n_tokens"),
      bpeTokenCount(t).as("n_bpe"),
      length(t).as("n_chars"),
      langId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      fingerprint(t).as("fingerprint"))
  }
}
