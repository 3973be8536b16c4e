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
  * O(vocab · maxWordLen · maxPieceLen) work. Tokenization
  * ([[tokenCounts]], [[tokenizeIds]]) is EXECUTOR-side: the model's
  * scores map (vocabulary-bounded) is broadcast and each partition
  * segments its own words under a per-partition memo — nothing
  * corpus-sized ever lands on the driver (the BPE twin's tokenize is
  * codegen'd column work, Bpe.scala's `symbolized` fold; Viterbi has no
  * column form, so mapPartitions + broadcast scores is its equivalent).
  * [[segment]] is a pure function of (word, scores, maxPieceLen) whose
  * DP sums fixed-order 6dp doubles, so executor-side segmentation is
  * bit-identical to the driver-side walk the q224 oracle replays. */
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

  /** Persist the trained model as parquet + a params sidecar — the
    * tokenizer artifact a pipeline trains once and applies to many
    * corpora ([[Bpe.saveMerges]]'s unigram twin; `maxPieceLen` rides in
    * `_unigram_params.json` because segmentation is not replayable
    * without it). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    piecesDF(spark, model).repartition(1)
      .write.mode("overwrite").parquet(s"$path/pieces")
    graft.util.FsIO.writeStringAtomic(spark,
      new org.apache.hadoop.fs.Path(path, "_unigram_params.json"),
      s"""{"maxPieceLen":${model.maxPieceLen}}""")
  }

  /** Load a [[saveModel]] artifact, failing loudly on a duplicate piece
    * or a broken segmentation closure (a piece whose single codepoints
    * are not all themselves pieces would make [[segment]] throw on the
    * very corpus the model was trained on) — the same
    * truncated-artifact loudness as [[Bpe.loadMerges]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val json = graft.util.FsIO.readString(spark,
        new org.apache.hadoop.fs.Path(path, "_unigram_params.json"))
      .getOrElse(throw new java.io.IOException(
        s"unigram model at $path has no readable _unigram_params.json sidecar"))
    val mpl = """"maxPieceLen":(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new java.io.IOException(
        s"unigram model sidecar at $path lacks maxPieceLen: $json"))
    val pieces = spark.read.parquet(s"$path/pieces")
      .select("piece", "cnt", "logprob")
      .collect()
      .map(r => Piece(r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_.piece).toIndexedSeq
    val dupes = pieces.groupBy(_.piece).collect { case (p, vs) if vs.length > 1 => p }
    require(dupes.isEmpty,
      s"unigram model at $path has duplicate pieces: ${dupes.take(5)}")
    val singles = pieces.map(_.piece).filter(p => codepoints(p).length == 1).toSet
    val broken = pieces.map(_.piece)
      .flatMap(p => codepoints(p)).distinct.filterNot(singles)
    require(broken.isEmpty,
      s"unigram model at $path is not segmentation-closed: codepoints ${broken.take(5)} have no single-codepoint piece")
    Model(pieces, mpl)
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

  /** [[segment]] with the foreign-corpus fallback: a word containing a
    * codepoint the model has never seen falls back to its single
    * codepoints, so tokenization never throws and OOV stays measurable
    * instead of dropped. Pure — executor-safe. */
  def segmentOrChars(word: String, scores: Map[String, Double],
      maxPieceLen: Int): Seq[String] =
    try segment(word, scores, maxPieceLen)
    catch { case _: IllegalArgumentException => codepoints(word).toSeq }

  // A partition's word→pieces memo stops growing once EITHER cap is hit
  // (further words just segment uncached): a pathological all-unique-word
  // partition must degrade to CPU, never to executor OOM. The entry cap
  // alone is not enough — 2^21 long-word → Seq[String] entries can
  // retain hundreds of MB per concurrent task (ADVICE r16) — so retained
  // bytes are APPROXIMATELY tracked (2 B/char + per-object overhead) and
  // capped too. Zipf corpora hit the cap's hot head long before either.
  private val MemoCap = 1 << 21
  private val MemoByteCap = 64L << 20 // ~64 MB retained per task memo

  /** A bounded word-keyed memo: caches until the entry OR approximate
    * byte cap is reached, then computes uncached — degrades to CPU,
    * never to memory. `weigh` estimates an entry's retained bytes. */
  private final class Memo[A](weigh: (String, A) => Long) {
    private val m = collection.mutable.HashMap.empty[String, A]
    private var bytes = 0L
    def apply(w: String)(compute: => A): A = m.get(w) match {
      case Some(v) => v
      case None =>
        val v = compute
        if (m.size < MemoCap && bytes < MemoByteCap) {
          m.update(w, v); bytes += weigh(w, v)
        }
        v
    }
  }
  private def countMemo() = new Memo[Long]((w, _) => 2L * w.length + 48L)
  private def piecesMemo() = new Memo[Seq[String]]((w, v) =>
    2L * w.length + 64L + v.iterator.map(p => 2L * p.length + 40L).sum)

  /** Map-only tokenization statistics — [[Bpe.tokenCounts]]' output
    * contract for the unigram path: per document the whitespace word
    * count and the piece count under the model. Empty/NULL text scores
    * 0. The Viterbi runs EXECUTOR-side under the broadcast
    * (vocabulary-bounded) scores map, memoized per partition — one
    * word-keyed pass, one doc-keyed hash aggregate, no driver
    * participation after planning and nothing corpus-sized collected. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    val bScores = spark.sparkContext.broadcast(model.scores)
    val mpl = model.maxPieceLen
    val words = df
      .select(col(idCol),
        explode(split(coalesce(col(textCol).cast("string"), lit("")), " ")).as("__w"))
      .where(col("__w") =!= "")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      words.schema.fields(0),
      org.apache.spark.sql.types.StructField("__np",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val perWord = words.mapPartitions { it =>
      val memo = countMemo()
      val scores = bScores.value
      it.map { r =>
        val w = r.getString(1)
        val np = memo(w)(segmentOrChars(w, scores, mpl).length.toLong)
        org.apache.spark.sql.Row(r.get(0), np)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val perDoc = perWord
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("__np").as("n_pieces"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** Map-only full tokenization — [[Bpe.tokenize]]'s output contract
    * for the unigram path: one row per input row with the array of
    * pieces (per whitespace word, flattened in order; empty/NULL text
    * gives an empty array). Entirely shuffle-free: each partition
    * splits, segments (broadcast scores, per-partition memo,
    * [[segmentOrChars]] fallback), and flattens its own rows. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    val bScores = spark.sparkContext.broadcast(model.scores)
    val mpl = model.maxPieceLen
    val in = df.select(col(idCol),
      coalesce(col(textCol).cast("string"), lit("")).as("__text"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0),
      org.apache.spark.sql.types.StructField("pieces",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false),
        nullable = false)))
    in.mapPartitions { it =>
      val memo = piecesMemo()
      val scores = bScores.value
      it.map { r =>
        val pieces = r.getString(1).split(" ").iterator
          .filter(_.nonEmpty)
          .flatMap(w => memo(w)(segmentOrChars(w, scores, mpl)))
          .toSeq
        org.apache.spark.sql.Row(r.get(0), pieces)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Tokenization to integer ids: one row per (doc, position) with the
    * piece string and its id — [[Bpe.tokenizeIds]]' output contract
    * (`pos` 0-based over the doc's flattened piece sequence, NULL id =
    * out-of-vocabulary). Segmentation runs EXECUTOR-side under the
    * broadcast scores map (per-partition memo; [[segmentOrChars]]'s
    * codepoint fallback keeps foreign corpora total), positions come
    * from a doc-keyed window, and ids broadcast-join from the
    * model-sized [[vocab]] table — nothing corpus-sized is ever
    * collected or broadcast. */
  def tokenizeIds(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bScores = spark.sparkContext.broadcast(model.scores)
    val mpl = model.maxPieceLen
    val ids = vocab(model).toDF("piece", "piece_id")
      .select(col("piece"), col("piece_id").cast("int").as("piece_id"))
    val exploded = df.select(col(idCol),
      posexplode(filter(
        split(coalesce(col(textCol).cast("string"), lit("")), " "),
        w => w =!= "")).as(Seq("__wpos", "__w")))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      exploded.schema.fields(0),
      exploded.schema.fields(1),
      org.apache.spark.sql.types.StructField("__ppos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("piece",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val segmented = exploded.mapPartitions { it =>
      val memo = piecesMemo()
      val scores = bScores.value
      it.flatMap { r =>
        val w = r.getString(2)
        val pieces = memo(w)(segmentOrChars(w, scores, mpl))
        pieces.iterator.zipWithIndex.map { case (p, ppos) =>
          org.apache.spark.sql.Row(r.get(0), r.getInt(1), ppos, p)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    segmented
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)
          .orderBy(col("__wpos"), col("__ppos"))) - 1)
      .join(broadcast(ids), Seq("piece"), "left")
      .select(col(idCol), col("pos").cast("int").as("pos"), col("piece"),
        col("piece_id"))
  }
}
