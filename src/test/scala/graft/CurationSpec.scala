package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Curation operator edge cases: chunking degenerate documents and
  * stride/window extremes, the packSequences numeric-id guard, capPerKey
  * determinism under repartitioning, and the decontaminate broadcast
  * plan shape. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("chunkDocuments: stride > window skips tokens between chunks") {
    import spark.implicits._
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("id", "text")
    // window 2 every 4 tokens: chunks start at 0, 4, 8 — tokens 2-3 and
    // 6-7 are never emitted (a sampling chunker, still deterministic)
    val got = Curation.chunkDocuments(df, "id", "text", window = 2, stride = 4)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk"),
        r.getAs[Int]("n_toks")))
    assert(got.toSeq == Seq((0, "t0 t1", 2), (1, "t4 t5", 2), (2, "t8 t9", 2)))
  }

  test("chunkDocuments: single-token and empty docs") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "")).toDF("id", "text")
    val got = Curation.chunkDocuments(df, "id", "text", window = 3, stride = 2)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Int]("chunk_idx"),
        r.getAs[String]("chunk"), r.getAs[Int]("n_toks"))).toSet
    // Spark's split("", " ") yields [""], so an empty document is a
    // single empty token — one chunk, not zero rows; callers that want
    // empty docs gone filter length(text) > 0 upstream
    assert(got == Set((1L, 0, "solo", 1), (2L, 0, "", 1)))
    // a window larger than the doc emits exactly one (short) chunk
    val one = Curation.chunkDocuments(
      Seq((1L, "a b")).toDF("id", "text"), "id", "text", window = 10, stride = 10)
      .collect()
    assert(one.length == 1 && one.head.getAs[Int]("n_toks") == 2)
  }

  test("chunkDocuments / packSequences reject non-positive parameters") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(df, "id", "text", window = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(df, "id", "text", seqLen = 0, nShards = 1)
    }
  }

  test("packSequences: numeric-id require fires on string ids") {
    import spark.implicits._
    // string % int casts to null in non-ANSI mode — the guard turns that
    // silent every-shard-null into an immediate error
    val strIds = Seq(("a", "x y z")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.packSequences(strIds, "id", "text", seqLen = 4, nShards = 2)
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("packSequences: offsets, pack ids and positions are exact and replayable") {
    import spark.implicits._
    // one shard so the whole layout is a single hand-checkable timeline:
    // doc 1 (3 toks) | doc 2 (4 toks) | doc 3 (2 toks), seqLen 4
    val df = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i")).toDF("id", "text")
    val got = Curation.packSequences(df, "id", "text", seqLen = 4, nShards = 1)
      .orderBy("doc")
      .select("doc", "n_toks", "offset", "pack_id", "pack_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),   // fills pack 0 positions 0-2
      (2L, 4L, 3L, 0L, 3L),   // starts at pack 0 pos 3, spans into pack 1
      (3L, 2L, 7L, 1L, 3L)))  // starts at pack 1 pos 3
    // replayable: a different input partitioning yields byte-identical
    // layout (shard + idCol order fully determine it)
    val shuffled = Curation.packSequences(
        df.repartition(7, col("text")), "id", "text", seqLen = 4, nShards = 1)
      .select("doc", "n_toks", "offset", "pack_id", "pack_pos")
      .collect().map(_.toSeq).toSet
    assert(shuffled == got.map(t => Seq(t._1, t._2, t._3, t._4, t._5)).toSet)
  }

  test("capPerKey: deterministic lowest-orderCol winners under any partitioning") {
    import spark.implicits._
    val rows = (0 until 200).map(i => ((i % 7).toString, i.toLong))
    val df = rows.toDF("k", "ord")
    def run(d: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      Curation.capPerKey(d, "k", "ord", maxRows = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = rows.groupBy(_._1).values
      .flatMap(_.sortBy(_._2).take(5)).toSet
    assert(run(df) == expected)
    // same winners regardless of how the input arrives
    assert(run(df.repartition(13, col("ord"))) == expected)
    assert(run(df.orderBy(desc("ord"))) == expected)
  }

  test("decontaminate finds planted contamination and broadcasts the bench side") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
      (2L, "completely unrelated document about weather patterns in spring"),
      (3L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val hits = Curation.decontaminate(corpus, bench, "id", "text", n = 8)
    val got = hits.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 contain 8-gram spans of the benchmark; doc 2 is clean
    assert(got.keySet == Set(1L, 3L) && got.values.forall(_ >= 1L))
    // the 100 TB contract: the benchmark gram set must be the BROADCAST
    // side so the corpus never shuffles for the join
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // and with the hint off, the operator still returns the same rows
    val unhinted = Curation.decontaminate(corpus, bench, "id", "text", n = 8,
        broadcastBench = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unhinted == got)
  }

  test("sampleToTokenBudget: greedy prefix per source, budgets nest, zero drops") {
    import spark.implicits._
    // docs of 3 tokens each, ids ordered within source
    val docs = (1L to 10L).map(i =>
      (i, if (i <= 5) "a" else "b", "tok tok tok")).toDF("id", "src", "text")
    def keep(budgetA: Long): Set[Long] =
      Curation.sampleToTokenBudget(docs, "src", "id", "text",
          budgets = Map("a" -> budgetA), defaultBudget = 6L)
        .collect().map(_.getLong(0)).toSet
    // budget 7 tokens → docs 1,2 (6 tokens) fit, doc 3 would reach 9 → cut
    assert(keep(7L) == Set(1L, 2L, 6L, 7L))
    // raising the budget only appends (samples nest)
    assert(keep(7L).subsetOf(keep(12L)))
    assert(keep(12L) == Set(1L, 2L, 3L, 4L, 6L, 7L))
    // zero budget drops the source entirely
    assert(Curation.sampleToTokenBudget(docs, "src", "id", "text",
        budgets = Map("a" -> 0L), defaultBudget = 0L)
      .count() == 0)
  }

  test("removeBoilerplate: frequent lines die everywhere, order survives, empty docs remain") {
    import spark.implicits._
    val df = Seq(
      (1L, "nav\nunique one\nfooter"),
      (2L, "nav\nunique two\nfooter"),
      (3L, "nav\nfooter"),
      (4L, "alone")).toDF("id", "text")
    val got = Curation.removeBoilerplate(df, "id", "text", minDocs = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    // 'nav' and 'footer' appear in 3 docs; 'unique *' and 'alone' don't
    assert(got.toSeq == Seq(
      (1L, "unique one", 1, 2),
      (2L, "unique two", 1, 2),
      (3L, "", 0, 2),
      (4L, "alone", 1, 0)))
  }

  test("removeBoilerplate: distinct-doc counting — repeats inside one doc don't qualify a line") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam\nspam\nspam\nkeep"),
      (2L, "other")).toDF("id", "text")
    // 'spam' has 3 occurrences but only 1 distinct doc: below minDocs=2
    val got = Curation.removeBoilerplate(df, "id", "text", minDocs = 2)
      .orderBy("id").collect()
    assert(got(0).getString(1) == "spam\nspam\nspam\nkeep")
    assert(got(0).getInt(3) == 0)
    // and a custom separator round-trips (regex-quoted literal)
    val df2 = Seq((1L, "a|b"), (2L, "a|c")).toDF("id", "text")
    val got2 = Curation.removeBoilerplate(df2, "id", "text", minDocs = 2, sep = "|")
      .orderBy("id").collect()
    assert(got2.map(_.getString(1)).toSeq == Seq("b", "c"))
    // NULL text reads as empty text — the doc still appears in the output
    val df3 = Seq((1L, null.asInstanceOf[String]), (2L, "x"), (3L, "x"),
      (4L, "x")).toDF("id", "text")
    val got3 = Curation.removeBoilerplate(df3, "id", "text", minDocs = 3)
      .orderBy("id").collect()
    assert(got3.length == 4 && got3(0).getString(1) == "")
  }

  test("decontaminateBloom never misses an exactly-contaminated doc") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = (1L to 40L).map { i =>
      if (i % 5 == 0)
        (i, s"doc $i contains the quick brown fox jumps over the lazy dog span")
      else (i, s"doc $i is clean filler content number $i with nothing shared at all")
    }.toDF("id", "text")
    val exact = Curation.decontaminate(corpus, bench, "id", "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    val bloom = Curation.decontaminateBloom(corpus, bench, "id", "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    // no false negatives: bloom-flagged ⊇ exact-flagged
    assert(exact.subsetOf(bloom), s"missed: ${exact -- bloom}")
  }

  test("decontaminateBloom defeats Spark's silent bloom-size clamp and restores confs") {
    import spark.implicits._
    import org.apache.spark.sql.graft.Shims
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // simulate the saturation regime cheaply: caps far below the request
    spark.conf.set(itemsKey, "32")
    spark.conf.set(bitsKey, "64")
    try {
      val grams = (1 to 500).map(i => s"gram$i").toDF("gram")
      def build(): Array[Byte] = grams.select(Shims.column(Shims.bloomAgg(
        Shims.expression(col("gram")), 500L, 5000L)).as("bf"))
        .head().getAs[Array[Byte]](0)
      // Spark clamps with Math.min, no error: the 5000-bit request comes
      // back as a 64-bit filter
      val clamped = build()
      // withMinConf (the decontaminateBloom build path) gets the real size
      val raised = Curation.withMinConf(spark,
        itemsKey -> 500L, bitsKey -> 5000L)(build())
      assert(clamped.length < raised.length && raised.length >= 5000 / 8,
        s"clamped=${clamped.length}B raised=${raised.length}B")
      // and the caller's (deliberately tiny) caps are restored
      assert(spark.conf.get(itemsKey) == "32" && spark.conf.get(bitsKey) == "64")
    } finally {
      spark.conf.unset(itemsKey)
      spark.conf.unset(bitsKey)
    }
  }

  test("c4Clean: each rule fires independently; every doc keeps a row") {
    import spark.implicits._
    val docs = Seq(
      // five clean sentences -> kept as-is, c4_keep true
      (0L, "one fine sentence right here.\nand a second one follows now.\n" +
        "third sentence is also good.\nfourth sentence stays put too.\n" +
        "fifth sentence closes it out."),
      (1L, "too few.\nwords"),                        // short line + no punct -> all dropped
      (2L, "please enable javascript to continue.\n" + // javascript line dropped
        "but this other sentence is fine."),
      (3L, "lorem ipsum dolor sit amet consectetur.\n" + // page flag, line kept
        "normal sentence over here though."),
      (4L, "function f() { return 1; } is code."),    // brace page flag
      (5L, "this awful content right here."),         // badword page flag
      (6L, null.asInstanceOf[String]))                // null text -> empty row
      .toDF("doc_id", "text")
    val out = Curation.c4Clean(docs, "doc_id", "text",
      badwords = Seq("awful"), minSentences = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    val d0 = out(0L)
    assert(d0._2 == 5 && d0._3 == 5 && d0._7, s"clean doc mishandled: $d0")
    assert(out(1L)._2 == 0 && !out(1L)._7)
    // javascript line removed, the other survives
    assert(out(2L)._1 == "but this other sentence is fine.")
    assert(out(3L)._4 && !out(3L)._7, "lorem page not flagged")
    assert(out(4L)._5 && !out(4L)._7, "brace page not flagged")
    assert(out(5L)._6 && !out(5L)._7, "badword page not flagged")
    assert(out(6L)._1 == "" && out(6L)._2 == 0 && !out(6L)._7)
    // default badwords = none: doc 5 is then only sentence-limited
    val noBad = Curation.c4Clean(docs, "doc_id", "text", minSentences = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(noBad(5L), "empty badwords list must not flag anything")
  }

  test("contaminationReport: verbatim leak dominates; threshold prunes grazes") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma delta epsilon y"), // verbatim inclusion: 3 shared 3-grams
      (2L, "alpha beta gamma nothing else here"), // 1 shared gram -> pruned at minShared=2
      (3L, "totally disjoint text right here")).toDF("doc_id", "text")
    val r = Curation.contaminationReport(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 100L)
    assert(row.getLong(1) == 1L)       // only the verbatim doc qualifies
    assert(row.getLong(3) == 3L)       // all 3 bench grams shared with it
    // at minShared=1 the grazing doc appears too
    val loose = Curation.contaminationReport(corpus, bench, "doc_id", "text",
      n = 3, minShared = 1).head()
    assert(loose.getLong(1) == 2L && loose.getLong(2) == 4L)
  }

  test("mixturePlan: normalizes weights, prescribes repeats/rates, zero-weights the rest") {
    import spark.implicits._
    // web has 10 tokens, books 2, code 4, junk 3; weights 2:1:1 over
    // three domains (sum 4, NOT 1 — must normalize), budget 40 tokens
    val df = Seq(
      ("web", "a b c d e f g h i j"),
      ("books", "k l"),
      ("code", "m n o p"),
      ("junk", "q r s")).toDF("domain", "text")
    val plan = Curation.mixturePlan(df, "domain", "text",
      Map("web" -> 2.0, "books" -> 1.0, "code" -> 1.0), budgetTokens = 40L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
    // web: weight .5, target 20, avail 10 -> epochs 2.0, rate 1, repeats 2
    assert(plan("web") == ((10L, 0.5, 20L, 2.0, 1.0, 2L)))
    // books: weight .25, target 10, avail 2 -> epochs 5.0 (heavy
    // repeat), sample_rate clamps at 1
    assert(plan("books") == ((2L, 0.25, 10L, 5.0, 1.0, 5L)))
    // code: weight .25, target 10, avail 4 -> epochs 2.5
    assert(plan("code")._4 == 2.5 && plan("code")._6 == 3L)
    // junk: not in weights -> weight 0, nothing sampled
    assert(plan("junk") == ((3L, 0.0, 0L, 0.0, 0.0, 0L)))
  }

  test("extractUrls: per-match rows, host lowering, ports and paths") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see HTTP is not a url but http://A.com/Path?q=1 is, also https://b.co"),
      (2L, "two http://x.com/1 http://x.com/2 on one line"),
      (3L, "port http://h.net:8080/x and bare http://h.net tail"),
      (4L, "no links at all"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = graft.operators.Curation.extractUrls(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "http://A.com/Path?q=1", "a.com"),
      (1L, "https://b.co", "b.co"),
      (2L, "http://x.com/1", "x.com"),
      (2L, "http://x.com/2", "x.com"),
      (3L, "http://h.net:8080/x", "h.net"),
      (3L, "http://h.net", "h.net")), s"got $got")
  }

  test("piiProfile/redactPii: pattern edges, staged counts, idempotence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "mail a.b+tag@sub.example.co.uk now"),          // email with +tag, multi-label host
      (2L, "ip 255.255.255.255 and 256.1.1.1 here"),       // 256 octet must NOT match whole
      (3L, "ssn 123-45-6789 end"),                          // ssn is ALSO a phone-shaped run
      (4L, "call (415) 555-0142 or +44 20 7946 0958 x"),    // two phones, parens + intl
      (5L, "clean text with numbers 12 and 3.14 only"),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val p = graft.operators.Curation.piiProfile(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))).toMap
    assert(p(1L) == ((1, 0, 0, 0, true)))
    // "256.1.1.1" yields NO match: the \b anchor forbids starting
    // mid-number, so an over-255 octet kills the whole quad — 1 hit total
    assert(p(2L) == ((0, 0, 1, 0, true)), s"got ${p(2L)}")
    assert(p(3L) == ((0, 1, 0, 1, true)), "ssn counts under both censuses")
    assert(p(4L)._2 == 2 && p(4L)._5, s"got ${p(4L)}")
    assert(p(5L) == ((0, 0, 0, 0, false)))
    assert(p(6L) == ((0, 0, 0, 0, false)), "null text is empty, not a crash")
    val r = graft.operators.Curation.redactPii(docs, "id", "text")
      .select(col("id"), col("text"), col("n_redacted"))
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getInt(2)))).toMap
    assert(r(1L) == (("mail <EMAIL> now", 1)))
    // staged chain: the SSN is redacted FIRST, so the phone census at
    // its stage sees the tag and n_redacted counts one replacement
    assert(r(3L) == (("ssn <SSN> end", 1)), s"got ${r(3L)}")
    // the pattern anchors on the first DIGIT, so a leading '(' survives
    assert(r(4L)._1 == "call (<PHONE> or <PHONE> x" && r(4L)._2 == 2)
    assert(r(5L)._1 == "clean text with numbers 12 and 3.14 only" && r(5L)._2 == 0)
    // idempotent: redacting redacted text changes nothing
    val again = graft.operators.Curation.redactPii(
        r.toSeq.map { case (k, (t, _)) => (k, t) }.toDF("id", "text"),
        "id", "text")
      .collect().map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(again.values.forall(_ == 0), s"re-redaction fired: $again")
  }

  test("canonicalUrl: each normalization rule, and what must be preserved") {
    import spark.implicits._
    val cases = Seq(
      // fragment + www + port + utm + trailing slash, all at once
      ("HTTP://WWW.Example.com:80/A/B/?utm_source=x#frag", "http://example.com/A/B"),
      // https default port; path CASE preserved
      ("https://Site.ORG:443/Path", "https://site.org/Path"),
      // non-default port preserved
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      // tracked param in the middle: separators tidied, real params kept
      ("http://a.com/p?id=1&utm_campaign=c&q=2", "http://a.com/p?id=1&q=2"),
      // tracked param first
      ("http://a.com/p?fbclid=z&id=1", "http://a.com/p?id=1"),
      // only tracked params -> bare path, no dangling '?'
      ("http://a.com/p?gclid=g", "http://a.com/p"),
      // bare host with trailing slash
      ("http://WWW.A.com/", "http://a.com"),
      // www in the PATH is not a host prefix
      ("http://b.com/www.decoy", "http://b.com/www.decoy"),
      // a param NAME merely ending in a tracking name is NOT tracking:
      // the anchored match must leave it whole (unanchored would eat it)
      ("http://a.com/p?xgclid=5", "http://a.com/p?xgclid=5"),
      ("http://a.com/p?myutm_source=1&id=2", "http://a.com/p?myutm_source=1&id=2"),
      // CONSECUTIVE tracking params all stripped in one pass
      ("http://a.com/p?utm_a=1&utm_b=2&x=3", "http://a.com/p?x=3"),
      ("http://a.com/p?id=1&utm_a=x&gclid=g", "http://a.com/p?id=1"),
      ("http://a.com/p?utm_a=1&gclid=2&fbclid=3", "http://a.com/p"))
    val got = Curation.canonicalUrl(col("u"))
    val out = cases.map(_._1).toDF("u").select(got.as("c"))
      .collect().map(_.getString(0)).toSeq
    cases.zip(out).foreach { case ((in, want), actual) =>
      assert(actual == want, s"$in -> $actual, want $want")
    }
    // election: the three spellings of one page collapse to min id
    val dd = Curation.urlDedup(Seq(
        (7L, "http://x.com/a"), (3L, "HTTP://WWW.X.com:80/a/"),
        (9L, "http://x.com/a?utm_source=s"), (5L, "http://x.com/b"))
      .toDF("id", "url"), "id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dd == Map("http://x.com/a" -> ((3L, 3L)), "http://x.com/b" -> ((5L, 1L))))
  }
}
