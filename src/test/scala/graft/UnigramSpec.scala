package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM trainer (operators.Unigram): the EM/Viterbi law, pruning,
  * and the tokenizeIds output-contract parity with the BPE path. */
class UnigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.operators.Unigram

  test("viterbi prefers high-probability long pieces; ties take the longer last piece") {
    // scores: 'ab' strongly preferred over 'a'+'b'
    val scores = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "ba" -> -5.0)
    assert(Unigram.segment("abab", scores, 2) == Seq("ab", "ab"))
    // tie case: 'aa' = -2.0 equals 'a'+'a' = -2.0; smallest split start
    // wins -> the single longer piece
    val tie = Map("a" -> -1.0, "aa" -> -2.0)
    assert(Unigram.segment("aa", tie, 2) == Seq("aa"))
    // reconstruction invariant
    val words = Seq("customer", "window", "stream", "a")
    val m = Unigram.learnFromCounts(words.map(_ -> 5L), iters = 2,
      maxPieceLen = 4, maxPieces = 30)
    words.foreach { w =>
      assert(Unigram.segment(w, m.scores, m.maxPieceLen).mkString == w)
    }
  }

  test("EM prunes unused multi-codepoint pieces, keeps all single codepoints") {
    val counts = Seq(("abab", 100L), ("abac", 50L), ("zz", 1L))
    val m = Unigram.learnFromCounts(counts, iters = 2, maxPieceLen = 3,
      maxPieces = 0)
    val pieces = m.pieces.map(_.piece).toSet
    // every codepoint of the corpus survives
    assert(Set("a", "b", "c", "z").subsetOf(pieces))
    // dominant bigram survives with positive usage
    val ab = m.pieces.find(_.piece == "ab")
    assert(ab.exists(_.count > 0L), s"expected 'ab' used: ${m.pieces}")
    // pruned pieces are really gone: everything remaining is a single
    // codepoint or was used in the final E-step
    assert(m.pieces.forall(p => p.count > 0L || p.piece.length == 1),
      s"unused multi-char piece survived: ${m.pieces.filter(p => p.count == 0L && p.piece.length > 1)}")
  }

  test("tokenizeIds: BPE output contract parity on a shared single-char vocab") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "ab ba"), (2L, "aa"), (3L, "")).toDF("doc_id", "text")
    // BPE with ZERO merges tokenizes to single chars with ids assigned
    // in binary order from 0 — exactly a unigram model whose pieces are
    // the single chars; the two paths must emit IDENTICAL rows
    val bpeVocab = graft.operators.Bpe.vocab(docs, "text", Seq.empty)
    val bpe = graft.operators.Bpe.tokenizeIds(docs, "doc_id", "text",
        Seq.empty, bpeVocab)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).toSet
    val m = Unigram.learnFromCounts(
      Seq(("ab", 2L), ("ba", 1L), ("aa", 1L)), iters = 1,
      maxPieceLen = 1, maxPieces = 0)
    val uni = Unigram.tokenizeIds(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).toSet
    assert(uni == bpe, s"paths diverge: ${uni.diff(bpe)} / ${bpe.diff(uni)}")
  }

  test("tokenizeIds: positions are contiguous per doc, OOV chars get null ids") {
    val sp = spark
    import sp.implicits._
    val train = Seq((1L, "hash join hash")).toDF("doc_id", "text")
    val m = Unigram.learn(train, "text", iters = 2, maxPieceLen = 4)
    // 'Q' and 'x' were never seen: the word falls back to single
    // codepoints and the unseen ones carry NULL ids
    val docs = Seq((7L, "hash Qx join")).toDF("doc_id", "text")
    val rows = Unigram.tokenizeIds(docs, "doc_id", "text", m)
      .orderBy("pos").collect()
    assert(rows.map(_.getInt(1)).toSeq == rows.indices.toSeq,
      "positions must be 0-based and contiguous")
    val oov = rows.filter(_.isNullAt(3)).map(_.getString(2)).toSet
    assert(oov == Set("Q", "x"), s"expected exactly the unseen chars OOV: $oov")
    // reconstruction across the whole doc
    assert(rows.map(_.getString(2)).mkString == "hashQxjoin")
  }
}
