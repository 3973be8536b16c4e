package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training at corpus scale —
  * the EM alternative to [[Bpe]] (Kudo 2018, "Subword Regularization"):
  * candidate pieces are scored by log-probability, words are segmented by
  * VITERBI under those scores, piece usage counts re-estimate the scores,
  * and unused pieces are pruned.
  *
  * Same two-stage decomposition as BPE training: ONE distributed pass
  * reduces the corpus to its word-frequency table (the only corpus-sized
  * operation; `maxWords` caps open vocabularies deterministically), and
  * the EM loop then runs on that vocabulary-bounded table on the driver —
  * the collected state is the vocabulary, never the corpus.
  *
  * THE SEGMENTATION LAW (cross-engine contract, replayed in SQL by the
  * q224 oracle's unrolled DP):
  *  - candidate pieces = every codepoint-substring of length
  *    1..`maxPieceLen` of the corpus words, weighted by word freq ×
  *    occurrence count, capped to the `maxPieces` most frequent (ties by
  *    piece, binary order) PLUS all single codepoints (so every word
  *    always segments);
  *  - initial score s₀(p) = round6(ln(cnt(p) / Σ cnt)) over that set;
  *  - Viterbi: best[0] = 0.0; best[j] = max over i ∈ [j−maxPieceLen, j)
  *    with piece(i..j) in the model of best[i] + s(piece), ties broken
  *    by the SMALLEST i (prefer the longer last piece); plain double
  *    addition in fixed prefix order, no mid-DP rounding — both engines
  *    sum the identical 6dp doubles in the identical order, so the
  *    comparison is bit-exact;
  *  - E-step: walk the backpointers, crediting each used piece with the
  *    word's frequency; M-step: s(p) = round6(ln(cnt(p) / Σ cnt)) over
  *    pieces with cnt > 0; pieces with cnt = 0 are PRUNED except single
  *    codepoints, which survive with their previous score (segmentation
  *    closure). `iters` fixed iterations.
  *
  * Scale design (100 TB): identical to [[Bpe]] — the corpus pass is one
  * hash-agg with map-side partials; per EM iteration the driver does
  * O(vocab · maxWordLen · maxPieceLen) work; [[tokenizeIds]] explodes
  * words map-only and broadcast-joins a (word → pieces) table computed
  * driver-side for the tokenized frame's own (capped) vocabulary — no
  * per-row Viterbi on executors, no UDF, no corpus-sized shuffle beyond
  * the word explode. */
object Unigram {

  final case class Piece(piece: String, count: Long, logprob: Double)
  final case class Model(pieces: Seq[Piece], maxPieceLen: Int) {
    lazy val scores: Map[String, Double] =
      pieces.map(p => p.piece -> p.logprob).toMap
  }

  private def rz6(x: Double): Double = graft.util.Round6.rz6d(x)

  private def codepoints(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

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

  /** Candidate census over a COLLECTED word-frequency table: substring
    * counts (freq-weighted, per occurrence), capped to the `maxPieces`
    * most frequent (count desc, piece asc), plus all single
    * codepoints. */
  def candidatesFromCounts(counts: Seq[(String, Long)], maxPieceLen: Int,
      maxPieces: Int): Seq[(String, Long)] = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    val census = collection.mutable.HashMap.empty[String, Long]
    counts.foreach { case (w, f) =>
      val cps = codepoints(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= cps.length) {
          val p = cps.slice(i, i + l).mkString
          census(p) = census.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val all = census.toSeq
    val ord = new Ordering[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int =
        if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
        else if (a._1 == b._1) 0
        else if (utf8Less(a._1, b._1)) -1 else 1
    }
    val top =
      if (maxPieces > 0) all.sorted(ord).take(maxPieces) else all
    val singles = all.filter(p => codepoints(p._1).length == 1)
    (top ++ singles).groupBy(_._1).map { case (p, vs) => (p, vs.head._2) }
      .toSeq.sortBy(_._1)
  }

  /** Viterbi segmentation of one word under 6dp piece scores — the law
    * above. Throws if some codepoint of the word has no piece (cannot
    * happen for a corpus the model was trained on; callers tokenizing
    * FOREIGN corpora handle the miss, see [[tokenizeIds]]). */
  def segment(word: String, scores: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val cps = codepoints(word)
    val n = cps.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bp = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) != Double.NegativeInfinity) {
          scores.get(cps.slice(i, j).mkString) match {
            case Some(s) =>
              val sc = best(i) + s
              // ties -> smallest i; scanning i ascending with a STRICT
              // improvement test keeps the first (smallest) i on ties
              if (sc > best(j)) { best(j) = sc; bp(j) = i }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    require(bp(n) >= 0, s"word '$word' cannot be segmented under the model")
    val out = collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      out += cps.slice(bp(k), k).mkString
      k = bp(k)
    }
    out.reverse.toSeq
  }

  /** The driver-side EM loop over a collected word-frequency table.
    * Exposed for tests; [[learn]] is the end-to-end entry. */
  def learnFromCounts(counts: Seq[(String, Long)], iters: Int,
      maxPieceLen: Int = 4, maxPieces: Int = 0): Model = {
    require(iters >= 1, "iters must be >= 1")
    val cand = candidatesFromCounts(counts, maxPieceLen, maxPieces)
    val total0 = cand.map(_._2).sum
    var pieces: Seq[Piece] = cand.map { case (p, c) =>
      Piece(p, c, rz6(math.log(c.toDouble / total0)))
    }
    for (_ <- 1 to iters) {
      val scores = pieces.map(p => p.piece -> p.logprob).toMap
      val used = collection.mutable.HashMap.empty[String, Long]
      counts.foreach { case (w, f) =>
        segment(w, scores, maxPieceLen).foreach { p =>
          used(p) = used.getOrElse(p, 0L) + f
        }
      }
      val total = used.values.sum
      val survivors = used.toSeq.map { case (p, c) =>
        Piece(p, c, rz6(math.log(c.toDouble / total)))
      }
      // unused single codepoints survive with their previous score
      val keptSingles = pieces.filter(p =>
        codepoints(p.piece).length == 1 && !used.contains(p.piece))
        .map(p => Piece(p.piece, 0L, p.logprob))
      pieces = (survivors ++ keptSingles).sortBy(_.piece)
    }
    Model(pieces, maxPieceLen)
  }

  /** End-to-end: distributed word counts → collect the (capped)
    * vocabulary → driver EM loop. */
  def learn(df: DataFrame, textCol: String, iters: Int,
      maxPieceLen: Int = 4, maxPieces: Int = 0, maxWords: Int = 0): Model =
    learnFromCounts(
      Bpe.wordCounts(df, textCol, maxWords).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq,
      iters, maxPieceLen, maxPieces)

  /** The trained pieces as a DataFrame `(piece, cnt, logprob)` — the
    * persistable model artifact. */
  def piecesDF(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.map(p => (p.piece, p.count, p.logprob))
      .toDF("piece", "cnt", "logprob")
  }

  /** Integer ids by the replayable law shared with [[Bpe.vocab]]'s
    * spirit: single-codepoint pieces in binary order get 0..B−1, then
    * multi-codepoint pieces in binary order get B.. — so ids are a pure
    * function of the piece set. */
  def vocab(model: Model): Seq[(String, Int)] = {
    val ord = new Ordering[String] {
      def compare(a: String, b: String): Int =
        if (a == b) 0 else if (utf8Less(a, b)) -1 else 1
    }
    val (singles, multi) = model.pieces.map(_.piece)
      .partition(p => codepoints(p).length == 1)
    (singles.sorted(ord) ++ multi.sorted(ord)).zipWithIndex
  }

  /** Map-only tokenization statistics — [[Bpe.tokenCounts]]' output
    * contract for the unigram path: per document the whitespace word
    * count and the piece count under the model. Empty/NULL text scores
    * 0. Same broadcast (word → piece count) shape as [[tokenizeIds]]:
    * the Viterbi runs once per DISTINCT word on the driver, never
    * per row on executors. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(coalesce(col(textCol).cast("string"), lit("")), " ")).as("__w"))
      .where(col("__w") =!= "").distinct()
      .collect().map(_.getString(0))
    val npieces = words.map { w =>
      val n =
        try segment(w, model.scores, model.maxPieceLen).length
        catch { case _: IllegalArgumentException => codepoints(w).length }
      (w, n.toLong)
    }.toSeq.toDF("__w", "__np")
    val perDoc = df
      .select(col(idCol),
        explode(split(coalesce(col(textCol).cast("string"), lit("")), " ")).as("__w"))
      .where(col("__w") =!= "")
      .join(broadcast(npieces), Seq("__w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("__np").as("n_pieces"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** Tokenization to integer ids: one row per (doc, position) with the
    * piece string and its id — [[Bpe.tokenizeIds]]' output contract
    * (`pos` 0-based over the doc's flattened piece sequence, NULL id =
    * out-of-vocabulary). The frame's DISTINCT words are collected
    * (bounded like [[Bpe.learn]]'s vocabulary — cap upstream for open
    * vocabularies), segmented driver-side under the frozen model, and
    * the (word → pieces) table broadcast-joins the exploded corpus —
    * executors never run Viterbi. A word containing a codepoint the
    * model has never seen falls back to its single codepoints (each
    * emitted, OOV ones with NULL id, so OOV is measurable not
    * dropped). */
  def tokenizeIds(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(coalesce(col(textCol).cast("string"), lit("")), " ")).as("__w"))
      .where(col("__w") =!= "").distinct()
      .collect().map(_.getString(0))
    val segs = words.map { w =>
      val pieces =
        try segment(w, model.scores, model.maxPieceLen)
        catch { case _: IllegalArgumentException => codepoints(w).toSeq }
      (w, pieces)
    }.toSeq.toDF("__w", "__pieces")
    val ids = vocab(model).toDF("piece", "piece_id")
      .select(col("piece"), col("piece_id").cast("int").as("piece_id"))
    df.select(col(idCol),
        posexplode(filter(
          split(coalesce(col(textCol).cast("string"), lit("")), " "),
          w => w =!= "")).as(Seq("__wpos", "__w")))
      .join(broadcast(segs), Seq("__w"))
      .select(col(idCol), col("__wpos"), posexplode(col("__pieces")).as(Seq("__ppos", "piece")))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)
          .orderBy(col("__wpos"), col("__ppos"))) - 1)
      .join(broadcast(ids), Seq("piece"), "left")
      .select(col(idCol), col("pos").cast("int").as("pos"), col("piece"),
        col("piece_id"))
  }
}
