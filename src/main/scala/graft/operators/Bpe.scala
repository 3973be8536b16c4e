package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning and tokenization at corpus
  * scale — the tokenizer-training step of an LLM data pipeline, run
  * without leaving the cluster.
  *
  * Training follows the standard two-stage shape (Sennrich et al. 2016;
  * the same decomposition production tokenizer trainers use): ONE
  * distributed pass reduces the corpus to its word-frequency table —
  * the only corpus-sized operation — and the merge loop then runs on
  * that vocabulary-bounded table on the driver (the Lloyd-step/centroid
  * pattern: the collected state is the vocabulary, never the corpus;
  * `maxWords` caps it deterministically for open vocabularies).
  *
  * THE MERGE-APPLICATION LAW (cross-engine contract): a word is
  * represented as its symbols joined AND bracketed by `\u0001`
  * ("\u0001h\u0001i\u0001"), and applying merge (a, b) is literal
  * single-pass leftmost non-overlapping string replacement of
  * "\u0001a\u0001b\u0001" with "\u0001ab\u0001" — exactly what
  * `replace()` does in Spark SQL, DuckDB, and `java.lang.String` alike,
  * so ANY engine replays training and tokenization bit-for-bit with
  * its built-in replace. DEVIATION from canonical BPE, documented: in
  * an immediate run of the same pair (x x x), the consumed shared
  * bracket makes replacement take alternate occurrences ([xx, x] where
  * canonical left-to-right also gives [xx, x], but [x x x x] gives
  * [xx, x, x] here vs canonical [xx, xx]) — a corner affecting only
  * immediate repeats, accepted to keep the law equal to `replace`.
  * Merge selection is max pair frequency, ties broken by the UTF-8
  * byte order of "l\u0001r" (binary collation — both engines' default
  * string comparison for the ASCII-range corpora this targets).
  *
  * Scale design (100 TB): stage 1 is one hash-agg with map-side
  * partials onto the distinct-word table; an optional deterministic
  * top-`maxWords` cap (count desc, word asc — TakeOrderedAndProject,
  * no full sort) bounds the driver state like a centroid codebook.
  * Each merge round on the driver is O(vocab · word length). Tokenize
  * is map-only: the learned merges fold into the plan as literal
  * `replace` calls inside whole-stage codegen — no UDF, no shuffle,
  * nothing per-row but string ops. */
object Bpe {

  val Sep = "\u0001"

  final case class Merge(rank: Int, left: String, right: String, count: Long) {
    def merged: String = left + right
    def pattern: String = Sep + left + Sep + right + Sep
    def replacement: String = Sep + left + right + Sep
  }

  /** Stage 1: the corpus's word-frequency table — (word, freq), one
    * shuffle, optionally capped to the `maxWords` most frequent words
    * (ties by word, a total order). */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int = 0): DataFrame = {
    val counts = df
      .select(explode(split(coalesce(col(textCol).cast("string"), lit("")), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    if (maxWords > 0) counts.orderBy(col("freq").desc, col("word").asc).limit(maxWords)
    else counts
  }

  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-side merge loop over a COLLECTED word-frequency table.
    * Exposed for tests; [[learn]] is the end-to-end entry. Returns
    * fewer than `numMerges` merges if the vocabulary exhausts. */
  def learnFromCounts(counts: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    // bracketed symbol strings, the law's representation; initial
    // symbols are CODE POINTS (matching the oracle's substr law and
    // tokenize's split-by-empty-pattern) — a UTF-16 code-unit split
    // would shear supplementary-plane characters (emoji, rare CJK)
    // into lone surrogates and emit invalid-UTF-8 tokens
    var words: Seq[(String, Long)] = counts.map { case (w, f) =>
      val syms = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      (Sep + syms.mkString(Sep) + Sep, f)
    }
    val out = Vector.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val pairs = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        val syms = s.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((l, rt), c) = pairs.minBy { case ((a, b), n) => (-n, a + Sep + b) }(
          Ordering.Tuple2(Ordering.Long, new Ordering[String] {
            def compare(a: String, b: String): Int =
              if (a == b) 0 else if (utf8Less(a, b)) -1 else 1
          }))
        val m = Merge(r, l, rt, c)
        words = words.map { case (s, f) => (s.replace(m.pattern, m.replacement), f) }
        out += m
        r += 1
      }
    }
    out.result()
  }

  /** End-to-end: word counts → collect the (capped) vocabulary →
    * driver merge loop. */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 0): Seq[Merge] =
    learnFromCounts(
      wordCounts(df, textCol, maxWords).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq,
      numMerges)

  /** Learned merges as a DataFrame — the persistable model artifact
    * (columns rank, lsym, rsym, merged, pair_count; `left`/`right` are
    * SQL keywords). */
  def mergesDF(df: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.merged, m.count))
      .toDF("rank", "lsym", "rsym", "merged", "pair_count")
  }

  /** Persist the learned merges as parquet — the tokenizer artifact a
    * pipeline trains once and applies to many corpora. */
  def saveMerges(df: DataFrame, merges: Seq[Merge], path: String): Unit =
    mergesDF(df, merges).repartition(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveMerges]] artifact back into rank order, failing
    * loudly on a gap or duplicate rank (a truncated artifact must not
    * silently tokenize with half a vocabulary). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    val rows = spark.read.parquet(path)
      .select("rank", "lsym", "rsym", "pair_count")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toIndexedSeq
    require(rows.map(_.rank) == (1 to rows.length),
      s"merge artifact at $path has gaps/duplicates: ranks ${rows.map(_.rank)}")
    rows
  }

  /** The bracketed symbol string of one word-column under `merges` —
    * char-split, joined by the separator, then the learned merges
    * folded in rank order as literal `replace` calls. */
  private def symbolized(word: Column, merges: Seq[Merge]): Column = {
    // Spark's split on the empty pattern yields the character array;
    // the defensive filter drops any empty edge element so the bracket
    // stays single on every engine's split convention
    val start = concat(lit(Sep),
      array_join(filter(split(word, ""), c => c =!= ""), Sep), lit(Sep))
    merges.foldLeft(start) { (s, m) =>
      call_function("replace", s, lit(m.pattern), lit(m.replacement))
    }
  }

  /** Map-only tokenization statistics: per document, the whitespace
    * word count and the BPE token count under `merges` — the number a
    * token-budget curation step needs ([[Curation]] packing, cost
    * estimates). Empty/NULL text scores 0. The merge fold runs inside
    * a `transform` lambda, so the whole thing is codegen'd column work:
    * no UDF, no shuffle, no driver participation after planning. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = filter(
      split(coalesce(col(textCol).cast("string"), lit("")), " "),
      w => w =!= "")
    // tokens per word = symbols in the bracketed string = separators − 1
    val perWord = transform(words, w => {
      val s = symbolized(w, merges)
      (length(s) - length(call_function("replace", s, lit(Sep), lit("")))) - lit(1)
    })
    df.select(col(idCol),
      size(words).as("n_words"),
      coalesce(aggregate(perWord, lit(0), (acc, t) => acc + t), lit(0))
        .as("n_bpe_tokens"))
  }

  /** Map-only full tokenization: one row per input row with the array
    * of BPE tokens (per word, flattened in order). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = filter(
      split(coalesce(col(textCol).cast("string"), lit("")), " "),
      w => w =!= "")
    val toks = flatten(transform(words, w =>
      filter(split(symbolized(w, merges), Sep), t => t =!= "")))
    df.select(col(idCol), toks.as("bpe_tokens"))
  }

  /** The vocabulary table implied by (corpus, merges): integer token
    * ids, assigned by the replayable law "single-character base symbols
    * of the corpus in binary string order get 0..B−1, then each merge's
    * merged symbol gets B + rank − 1" (a merged string produced twice —
    * e.g. (a,bc) and (ab,c) both yielding "abc" — keeps its LOWEST id).
    * Columns (token, token_id). Vocabulary-sized; the artifact to
    * persist next to [[saveMerges]]. */
  def vocab(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = wordCounts(df, textCol)
      .select(explode(filter(split(col("word"), ""), c => c =!= "")).as("token"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy("token")
    val basev = base
      .withColumn("token_id", (row_number().over(w) - 1).cast("int"))
    val nBase = broadcast(basev.groupBy().agg(count(lit(1)).cast("int").as("__n")))
    val mergedv = merges.map(m => (m.merged, m.rank)).toDF("token", "__rank")
      .crossJoin(nBase)
      .select(col("token"), (col("__n") + col("__rank") - 1).cast("int").as("token_id"))
    basev.unionByName(mergedv)
      .groupBy("token").agg(min("token_id").as("token_id"))
  }

  /** Tokenization to INTEGER ids: [[tokenize]] then a broadcast join
    * against [[vocab]] — one row per (doc, position) with the token
    * string and its id (NULL id = out-of-vocabulary, possible only when
    * tokenizing a corpus the vocabulary was not built from; emitted,
    * not dropped, so OOV is measurable). The join is broadcast
    * (vocabulary-sized build side); positions are 0-based over the
    * doc's flattened token sequence. */
  def tokenizeIds(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], vocabDF: DataFrame): DataFrame = {
    tokenize(df, idCol, textCol, merges)
      .select(col(idCol), posexplode(col("bpe_tokens")).as(Seq("pos", "token")))
      .join(broadcast(vocabDF), Seq("token"), "left")
      .select(col(idCol), col("pos").cast("int").as("pos"), col("token"),
        col("token_id"))
  }
}
