package graft

import graft.operators.{Ann, Bpe, Curation, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The operators are built to COMPOSE into the standard curation
  * pipeline; this spec runs the whole chain end-to-end on the real
  * documents table and checks the invariants each stage owes the next:
  * no stage invents or silently drops rows outside its contract, stage
  * outputs carry the columns the next stage consumes, and the final
  * artifacts (survivor set, mixture plan, token ids) are consistent
  * with each other. Inter-operator schema drift — the failure class
  * unit specs can't see — fails here. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("normalize -> filter -> score -> dedup -> elect -> mix -> sample -> tokenize") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n0 = docs.count()

    // 1. normalize; run the c4 rules as an AUDIT (the synthetic corpus
    // has no sentence punctuation, so c4's line rewrite would empty it —
    // flags flow, text continues normalized)
    val normalized = docs.selectExpr("doc_id", "source", "lang",
      "text_normalize(text, 'nfc') AS text")
    val c4 = Curation.c4Clean(normalized.select("doc_id", "text"),
      "doc_id", "text", badwords = Seq("zzzz"), minSentences = 0)
    assert(c4.count() == n0, "c4Clean must keep every row")
    val cleaned = normalized

    // 2. quality flags + in-engine classifier score (labels: lang == en)
    val flagged = TextAnalysis.gopherFlags(cleaned, "doc_id", "text")
    assert(flagged.count() == n0)
    val labeled = cleaned
      .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
    val (w, b) = TextAnalysis.trainQualityLr(labeled, "doc_id", "text", "y",
      buckets = 128, iters = 2, eta = 1.0)
    val scored = TextAnalysis.scoreQualityLr(cleaned, "doc_id", "text", w, b)
    assert(scored.count() == n0, "scoring must not lose docs")

    // 3. near-dup clustering over model-free hashed embeddings, then
    // quality-elected survivors
    val withVecs = TextAnalysis
      .hashedEmbeddingVec(cleaned, "doc_id", "text", dim = 32)
      .where(col("embedding").isNotNull)
      .withColumnRenamed("doc_id", "vec_id")
    val edges = Ann.cosineEdges(withVecs, threshold = 0.95, nlist = 4, nProbe = 4)
    val scoredDocs = cleaned.select(col("doc_id"))
      .join(scored.select(col("doc_id"), col("lr_prob")), Seq("doc_id"))
    val elected = Dedup.clusterKeepBest(scoredDocs, "doc_id", "lr_prob",
      edges, "a", "b")
    assert(elected.count() == n0, "every doc gets an election row")
    val survivors = elected.where(col("keep"))
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv <= n0)
    // exactly one keeper per component
    assert(elected.select("component").distinct().count() == nSurv)

    // 4. mixture plan over the survivor corpus, then weighted sampling
    // inside each source (weight = classifier probability)
    val corpus = cleaned.join(survivors.select(col("id").as("doc_id")), Seq("doc_id"))
      .join(scored.select(col("doc_id"), col("lr_prob")), Seq("doc_id"))
    val plan = Curation.mixturePlan(corpus, "source", "text",
      Map("src0" -> 0.6, "src1" -> 0.4), budgetTokens = 5000L)
    val planRows = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(3))).toMap
    assert(planRows.values.map(_._2).sum <= 5000L,
      "targets must not exceed the budget")
    val sampled = Sampling.weightedSamplePerGroup(
      corpus.where(col("source").isin("src0", "src1")),
      "source", "doc_id", "lr_prob", k = 10)
    assert(sampled.count() <= 20)
    assert(sampled.columns.contains("text"), "sampling must pass payload through")

    // 5. tokenizer trained on the SURVIVOR corpus, applied to the sample
    val merges = Bpe.learn(corpus, "text", numMerges = 8)
    assert(merges.length == 8)
    val voc = Bpe.vocab(corpus, "text", merges)
    val ids = Bpe.tokenizeIds(sampled, "doc_id", "text", merges, voc)
    assert(ids.count() > 0)
    // zero OOV: the sample is a subset of the corpus the vocab saw
    assert(ids.where(col("token_id").isNull).count() == 0,
      "in-corpus tokenization must have no OOV")
    // token counts agree between the id path and the counting path
    val viaIds = ids.groupBy("doc_id").count()
    val viaCounts = Bpe.tokenCounts(sampled, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_bpe_tokens").cast("long").as("count"))
    assert(viaIds.join(viaCounts, Seq("doc_id"))
      .where(viaIds("count") =!= viaCounts("count")).count() == 0)
  }
}
