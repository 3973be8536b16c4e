package graft

import graft.functions.GeoFunctions
import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The README's "SQL-only pipeline recipes" are a contract: each recipe
  * must produce the SAME rows as the Scala operator it re-spells, so a
  * SQL-only user (JDBC, notebook, Thrift server) can run the curation
  * pipeline without touching the Scala API. These specs pin the two
  * spellings together on corpora with known structure. */
class SqlRecipesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GeoFunctions.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** 100 docs: 50 sliding-window bases (neighbors share 9 of 12 tokens,
    * Jaccard 0.6 — LSH candidates that the refine must reject at 0.8)
    * plus one jittered copy each (Jaccard 12/13 ≈ 0.92 — true pairs). */
  private def corpus() = {
    import spark.implicits._
    val docs = (0 until 50).flatMap { i =>
      val base = (0 until 12).map(j => s"w${(3 * i + j) % 200}").mkString(" ")
      Seq((i * 2L, base), (i * 2L + 1, base + s" x$i"))
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs")
    docs
  }

  test("minhash near-dup dedup driven purely through SQL matches the Scala operator") {
    val docs = corpus()
    // README recipe, verbatim shape: scatter → capped buckets → in-bucket
    // pairs → exact token-Jaccard refine, all in one spark.sql call
    val sqlPairs = spark.sql("""
      WITH sigs AS (
        SELECT doc_id AS doc, minhash_sig(text, 64) AS sig FROM docs),
      buckets AS (
        SELECT doc, band, bucket FROM sigs
        LATERAL VIEW posexplode(transform(sequence(0, 15),
          b -> xxhash64(slice(sig, b * 4 + 1, 4)))) t AS band, bucket),
      grouped AS (
        SELECT ds FROM (SELECT sort_array(collect_list(doc)) AS ds
                        FROM buckets GROUP BY band, bucket)
        WHERE size(ds) BETWEEN 2 AND 10000),
      cands AS (
        SELECT DISTINCT p.ida, p.idb FROM grouped
        LATERAL VIEW explode(flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds)),
                    y -> struct(x AS ida, y AS idb))))) t AS p),
      toks AS (SELECT doc_id AS doc, array_distinct(split(text, ' ')) AS ts FROM docs)
      SELECT ida, idb FROM cands
      JOIN toks a ON ida = a.doc JOIN toks b ON idb = b.doc
      WHERE size(array_intersect(a.ts, b.ts)) /
            (size(a.ts) + size(b.ts) - size(array_intersect(a.ts, b.ts))) >= 0.8""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scalaPairs = Dedup
      .minhashNearDups(docs, "doc_id", "text", threshold = 0.8,
        numHashes = 64, bands = 16)
      .select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sqlPairs == scalaPairs)
    // and the corpus structure is actually exercised: every jittered
    // copy pairs with its base (50 true pairs), no 0.6-Jaccard neighbor
    // survives the refine
    assert(scalaPairs == (0 until 50).map(i => (i * 2L, i * 2L + 1)).toSet)
  }

  test("simhash near-dup pairs driven purely through SQL match the Scala operator") {
    import spark.implicits._
    // exact duplicates (hamming 0) guarantee hits; near-variants exercise
    // the radius filter; the sliding bases supply non-pairs
    val docs = ((0 until 30).map { i =>
      val base = (0 until 12).map(j => s"w${(5 * i + j) % 300}").mkString(" ")
      (i.toLong, base)
    } ++ Seq((100L, (0 until 12).map(j => s"w${j % 300}").mkString(" ")),
             (101L, (0 until 12).map(j => s"w${(5 + j) % 300}").mkString(" "))))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs")
    // README recipe: 4 x 16-bit bands (pigeonhole-complete for radius 3)
    val viaSql = spark.sql("""
      WITH sh AS (SELECT doc_id AS doc, simhash64(text) AS s FROM docs),
      bands AS (
        SELECT doc, s, band, bucket FROM sh
        LATERAL VIEW posexplode(transform(sequence(0, 3),
          b -> shiftrightunsigned(s, b * 16) & 65535)) t AS band, bucket),
      grouped AS (SELECT ds FROM (
          SELECT sort_array(collect_list(struct(doc, s))) AS ds
          FROM bands GROUP BY band, bucket)
        WHERE size(ds) BETWEEN 2 AND 10000),
      cands AS (SELECT DISTINCT p.x.doc AS ida, p.x.s AS sa,
                                p.y.doc AS idb, p.y.s AS sb
        FROM grouped
        LATERAL VIEW explode(flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds)),
                    y -> struct(x AS x, y AS y))))) t AS p)
      SELECT ida, idb, hamming64(sa, sb) AS hamming
      FROM cands WHERE hamming64(sa, sb) <= 3""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaScala = Dedup.simhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaSql == viaScala)
    // the planted exact duplicates (0,100) and (1,101) must surface at 0
    assert(viaSql.contains((0L, 100L, 0)) && viaSql.contains((1L, 101L, 0)))
  }

  test("exact keep-first dedup through SQL matches Dedup.exactKeepFirst") {
    import spark.implicits._
    val docs = Seq((5L, "same"), (1L, "same"), (3L, "same"),
      (2L, "other"), (9L, "third")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs")
    val viaSql = spark.sql("""
      SELECT doc_id, text FROM (SELECT *, row_number() OVER
          (PARTITION BY md5(cast(text AS binary)) ORDER BY doc_id) AS rn
        FROM docs) WHERE rn = 1""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaScala = Dedup.exactKeepFirst(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql == viaScala && viaSql == Set((1L, "same"), (2L, "other"), (9L, "third")))
  }

  test("n-gram decontamination through SQL matches Curation.decontaminate") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = (1L to 20L).map { i =>
      if (i % 4 == 0)
        (i, s"doc $i has the quick brown fox jumps over the lazy dog inside")
      else (i, s"doc $i is clean filler with its own words only number $i")
    }.toDF("doc_id", "text")
    bench.createOrReplaceTempView("bench")
    corpus.createOrReplaceTempView("corpus")
    val viaSql = spark.sql("""
      WITH bg AS (SELECT DISTINCT g FROM bench
        LATERAL VIEW explode(transform(sequence(0, size(split(text, ' ')) - 8),
          i -> array_join(slice(split(text, ' '), i + 1, 8), ' '))) t AS g
        WHERE size(split(text, ' ')) >= 8),
      cg AS (SELECT doc_id, g FROM corpus
        LATERAL VIEW explode(transform(sequence(0, size(split(text, ' ')) - 8),
          i -> array_join(slice(split(text, ' '), i + 1, 8), ' '))) t AS g
        WHERE size(split(text, ' ')) >= 8)
      SELECT doc_id, cast(count(DISTINCT g) AS bigint) AS n_shared
      FROM cg JOIN bg USING (g) GROUP BY doc_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaScala = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    assert(viaSql.map(_._1) == (1L to 20L).filter(_ % 4 == 0).toSet)
  }

  test("paragraph dedup through SQL matches Dedup.dedupParagraphs") {
    import spark.implicits._
    val docs = (0L until 30L).map { i =>
      (i, s"hdr\npara ${i % 7}\npara ${i % 3}")
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("pdocs")
    val viaSql = spark.sql("""
      WITH p AS (
        SELECT doc_id, pos, para
        FROM pdocs LATERAL VIEW posexplode(split(text, '\n')) t AS pos, para
        WHERE length(para) > 0),
      r AS (
        SELECT doc_id, pos, para, row_number() OVER
            (PARTITION BY para ORDER BY doc_id, pos) AS rk
        FROM p)
      SELECT doc_id,
             concat_ws('\n', transform(array_sort(collect_list(
               CASE WHEN rk = 1 THEN struct(pos, para) END)), s -> s.para)) AS text,
             CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
             CAST(sum(CASE WHEN rk != 1 THEN 1 ELSE 0 END) AS INT) AS n_dropped
      FROM r GROUP BY doc_id""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val viaScala = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // doc 0 keeps everything (minus its own within-doc dup), doc 21 keeps nothing
    assert(viaSql.contains((0L, "hdr\npara 0", 2, 1)))
    assert(viaSql.exists(t => t._1 > 6 && t._2 == "" && t._3 == 0))
  }

  test("boilerplate line removal through SQL matches Curation.removeBoilerplate") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, s"nav\ngrp ${i % 4}\nunique $i")
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("bdocs")
    val viaSql = spark.sql("""
      WITH l AS (
        SELECT doc_id, pos, line
        FROM bdocs LATERAL VIEW posexplode(split(text, '\n')) t AS pos, line),
      f AS (
        SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
      j AS (
        SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS bp
        FROM l LEFT JOIN f ON l.line = f.line)
      SELECT doc_id,
             concat_ws('\n', transform(array_sort(collect_list(
               CASE WHEN NOT bp THEN struct(pos, line) END)), s -> s.line)) AS text,
             CAST(sum(CASE WHEN NOT bp THEN 1 ELSE 0 END) AS INT) AS n_kept,
             CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS INT) AS n_dropped
      FROM j GROUP BY doc_id""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val viaScala = Curation.removeBoilerplate(docs, "doc_id", "text", minDocs = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // 'nav' (40 docs) and 'grp k' (10 docs each) die; uniques survive
    assert(viaSql.contains((7L, "unique 7", 1, 2)))
  }

  test("substring-span dedup through SQL matches Dedup.dedupSpans") {
    import spark.implicits._
    val docs = (0L until 30L).map { i =>
      (i, s"u$i c0 c1 c2 c3 g${i % 4}x g${i % 4}y g${i % 4}z")
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("sdocs")
    val viaSql = spark.sql("""
      WITH t AS (SELECT doc_id, split(text, ' ') AS ts FROM sdocs),
      tok AS (
        SELECT doc_id, pos, tok,
               CASE WHEN pos <= size(ts) - 3
                    THEN substring(md5(CAST(concat_ws(' ',
                           slice(ts, pos + 1, 3)) AS BINARY)), 1, 16)
               END AS gk
        FROM t LATERAL VIEW posexplode(ts) x AS pos, tok),
      c AS (SELECT gk, min(doc_id) AS keeper FROM tok WHERE gk IS NOT NULL
            GROUP BY gk HAVING count(DISTINCT doc_id) >= 2),
      m AS (SELECT tok.doc_id, tok.pos, tok.tok,
                   CASE WHEN c.keeper IS NOT NULL AND tok.doc_id != c.keeper
                        THEN 1 ELSE 0 END AS dup
            FROM tok LEFT JOIN c ON tok.gk = c.gk),
      f AS (SELECT doc_id, pos, tok,
                   max(dup) OVER (PARTITION BY doc_id ORDER BY pos
                                  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS cov
            FROM m)
      SELECT doc_id,
             concat_ws(' ', transform(array_sort(collect_list(
               CASE WHEN cov = 0 THEN struct(pos, tok) END)), s -> s.tok)) AS text,
             CAST(sum(CASE WHEN cov = 0 THEN 1 ELSE 0 END) AS INT) AS n_kept,
             CAST(sum(CASE WHEN cov = 1 THEN 1 ELSE 0 END) AS INT) AS n_dropped
      FROM f GROUP BY doc_id""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val viaScala = Dedup.dedupSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // doc 0 keeps all; docs 1-3 keep their unique head + group tail;
    // everyone else is cut to the unique first token
    assert(viaSql.contains((0L, "u0 c0 c1 c2 c3 g0x g0y g0z", 8, 0)))
    assert(viaSql.contains((1L, "u1 g1x g1y g1z", 4, 4)))
    assert(viaSql.contains((5L, "u5", 1, 7)))
  }

  test("temperature remix through SQL matches Sampling.temperatureResample") {
    import spark.implicits._
    // skewed: source a = 60 docs, b = 15
    val docs = ((0L until 60L).map(i => (i, "a")) ++
      (100L until 115L).map(i => (i, "b"))).toDF("doc_id", "source")
    docs.createOrReplaceTempView("tdocs")
    val viaSql = spark.sql("""
      WITH c AS (SELECT source, count(*) AS n FROM tdocs GROUP BY source),
      r AS (SELECT source,
                   pow(CAST(min(n) OVER () AS DOUBLE) / n, 1.0 - 0.7) AS rate
            FROM c)
      SELECT d.doc_id, d.source FROM tdocs d JOIN r ON d.source = r.source
      WHERE CAST(conv(substring(md5(CAST(CAST(d.doc_id AS STRING) AS BINARY)), 1, 12),
                      16, 10) AS BIGINT) < r.rate * 281474976710656""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaScala = graft.operators.Sampling
      .temperatureResample(docs, "source", "doc_id", alpha = 0.7)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // the smallest source is kept whole
    assert(viaSql.count(_._2 == "b") == 15)
  }

  test("C4 cleaning through SQL matches Curation.c4Clean") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one fine sentence right here.\nand a second one follows now.\n" +
        "third sentence is also good.\nfourth sentence stays put too.\n" +
        "fifth sentence closes it out."),
      (1L, "too few.\nwords"),
      (2L, "please enable javascript to continue.\nbut this other sentence is fine."),
      (3L, "lorem ipsum dolor sit amet consectetur.\nnormal sentence over here though."),
      (4L, "function f() { return 1; } is code."),
      (5L, "this awful content right here.")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("c4docs")
    // README recipe, verbatim shape: HOF line filter + page flags
    val viaSql = spark.sql("""
      WITH m AS (
        SELECT doc_id, text,
               split(text, '\n') AS alll,
               filter(split(text, '\n'), l ->
                 (endswith(l, '.') OR endswith(l, '!') OR
                  endswith(l, '?') OR endswith(l, '"'))
                 AND size(filter(split(l, ' '), w -> w != '')) >= 3
                 AND NOT contains(lower(l), 'javascript')) AS kept
        FROM c4docs),
      c AS (SELECT doc_id, text, alll, kept,
                   array_join(kept, '\n') AS clean,
                   length(regexp_replace(array_join(kept, '\n'), '[^.!?]', '')) AS ns
            FROM m)
      SELECT doc_id, clean AS text,
             size(kept) AS n_lines_kept,
             size(alll) - size(kept) AS n_lines_dropped,
             ns AS n_sentences,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             contains(text, '{') AS has_brace,
             exists(split(lower(text), ' '),
                    w -> array_contains(array('awful'), w)) AS has_badword,
             NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
               AND NOT exists(split(lower(text), ' '),
                              w -> array_contains(array('awful'), w))
               AND ns >= 5 AS c4_keep
      FROM c""")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaScala = Curation.c4Clean(docs, "doc_id", "text",
      badwords = Seq("awful"), minSentences = 5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSql == viaScala && viaSql.size == 6)
  }

  test("feature-hashed embeddings through SQL match TextAnalysis.hashedEmbedding") {
    val docs = corpus()
    val viaSql = spark.sql("""
      WITH t AS (SELECT doc_id, explode(split(coalesce(text, ''), ' ')) AS tok
                 FROM docs),
           h AS (SELECT doc_id,
                        CAST(conv(substring(md5(CAST(tok AS BINARY)), 1, 12), 16, 10)
                             AS BIGINT) AS h
                 FROM t WHERE tok <> ''),
           s AS (SELECT doc_id, pmod(h, 32) AS b,
                        CASE WHEN pmod(CAST((h - pmod(h, 32)) / 32.0 AS BIGINT), 2) = 0
                             THEN 1L ELSE -1L END AS sg
                 FROM h),
           v AS (SELECT doc_id, b, sum(sg) AS v
                 FROM s GROUP BY doc_id, b HAVING sum(sg) <> 0),
           n AS (SELECT doc_id, b, v,
                        signum(x) * floor(abs(x) * 1e6 + 0.5) / 1e6 AS nrm
                 FROM (SELECT doc_id, b, v,
                              sqrt(sum(v * v) OVER (PARTITION BY doc_id)) AS x
                       FROM v))
      SELECT doc_id, CAST(b AS INT) AS vec_dim,
             signum(v / nrm) * floor(abs(v / nrm) * 1e6 + 0.5) / 1e6 AS val
      FROM n ORDER BY doc_id, vec_dim""")
      .collect().map(_.toSeq).toSeq
    val viaScala = graft.operators.TextAnalysis
      .hashedEmbedding(docs, "doc_id", "text", dim = 32)
      .orderBy("doc_id", "vec_dim").collect().map(_.toSeq).toSeq
    assert(viaSql == viaScala && viaSql.nonEmpty)
  }

  test("weighted sampling through SQL matches Sampling.weightedSamplePerGroup") {
    val docs = corpus()
    spark.sql("""SELECT doc_id, CAST(doc_id % 5 AS STRING) AS grp,
                        CAST(length(text) AS DOUBLE) AS w
                 FROM docs""").createOrReplaceTempView("weighted")
    val viaSql = spark.sql("""
      WITH k AS (SELECT doc_id, grp, w,
                        signum(r) * floor(abs(r) * 1e6 + 0.5) / 1e6 AS r6
                 FROM (SELECT *,
                         -ln((CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)),
                                        1, 12), 16, 10) AS BIGINT) + 1L)
                             / CAST(281474976710656 AS DOUBLE)) / w AS r
                       FROM weighted)),
           rk AS (SELECT doc_id, grp, w,
                         CAST(row_number() OVER (PARTITION BY grp
                           ORDER BY r6 ASC, doc_id ASC) AS INT) AS sample_rank
                  FROM k)
      SELECT doc_id, grp, w, sample_rank FROM rk WHERE sample_rank <= 3
      ORDER BY grp, sample_rank""")
      .collect().map(_.toSeq).toSeq
    val viaScala = graft.operators.Sampling
      .weightedSamplePerGroup(spark.table("weighted"), "grp", "doc_id", "w", 3)
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    assert(viaSql == viaScala && viaSql.size == 15)
  }
}
