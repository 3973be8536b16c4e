package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining data pipeline runs between
  * dedup and tokenization: chunking documents into model-window pieces,
  * packing documents into fixed-length training sequences, benchmark
  * decontamination, and per-source caps.
  *
  * Everything is built from codegen'd primitives (split / slice /
  * sequence / windows / hash joins) — no UDFs — and every operator is
  * deterministic so results are replayable across runs, partitionings,
  * and engines (the same property [[Sampling]] provides for selection).
  */
object Curation {

  /** THE tokenizer of the curation family — one definition shared by
    * chunking, packing, n-grams, and budget accounting, so the four can
    * never silently disagree about what a token is. Whitespace-greedy
    * single-space split, matching the corpus-stats/profile convention. */
  private def toks(text: Column): Column = split(text, " ")

  /** Split each document into overlapping token windows of `window`
    * tokens every `stride` tokens (stride < window ⇒ overlap). Output:
    * (`doc`, `chunk_idx`, `chunk`, `n_toks`); the final chunk may be
    * short. The standard pre-embedding step for long documents.
    *
    * Scale: map-only — one pass, no shuffle; each document's chunks are
    * produced where the document lives. The token array is materialized
    * as a column BEFORE the per-chunk lambda (SQL lambda bodies
    * re-evaluate captured expressions per element — an inline split()
    * here would re-tokenize the document once per chunk).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    df.select(col(idCol).as("doc"), toks(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc"), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc"), col("chunk_idx"),
        array_join(slice(col("__toks"), col("start") + 1, lit(window)), " ").as("chunk"),
        least(lit(window), size(col("__toks")) - col("start")).as("n_toks"))
  }

  /** Concat-and-split sequence packing: documents are laid end-to-end in
    * `idCol` order within `nShards` deterministic shards, and each token
    * gets a position in a fixed `seqLen` training sequence. Output per
    * document: (`doc`, `shard`, `n_toks`, `offset` — cumulative tokens
    * before it in its shard, `pack_id` = offset / seqLen, `pack_pos` =
    * offset % seqLen). A document may span packs — that is exactly what
    * LLM concat-packing does.
    *
    * Scale: ONE shuffle, keyed by shard. The running offset is a window
    * cumsum per shard, so shard count is the parallelism lever — at
    * 100 TB use O(cluster cores) shards; order within a shard stays
    * deterministic (idCol), so the packing is replayable regardless of
    * input partitioning. Sharding by `id % nShards` (not hash) keeps the
    * layout reproducible by any engine. REPLAYABILITY REQUIRES `idCol`
    * UNIQUE: duplicate ids tie in the window order, making offsets for
    * the tied rows partitioning-dependent.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    // pmod on a non-numeric id would silently null every shard (string %
    // int casts to null in non-ANSI mode) — demand a numeric id up front;
    // callers with string ids should shard on xxhash64(id) themselves
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric (got ${df.schema(idCol).dataType}); " +
        "hash string ids to a numeric column first")
    val w = Window.partitionBy("shard").orderBy("doc")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc"),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        size(toks(col(textCol))).cast("long").as("n_toks"))
      .withColumn("offset", coalesce(sum("n_toks").over(w), lit(0L)))
      // backticks: OFFSET is reserved under ANSI + enforceReservedKeywords
      .withColumn("pack_id", expr(s"`offset` div $seqLen"))
      .withColumn("pack_pos", col("offset") % seqLen)
  }

  /** Token n-grams of each document: (`doc`, `gram`). Documents shorter
    * than `n` tokens produce no rows. Map-only (explode). */
  def tokenNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    df.select(col(idCol).as("doc"), toks(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col("doc"), explode(transform(
        sequence(lit(0), size(col("__toks")) - n, lit(1)),
        i => array_join(slice(col("__toks"), i + 1, lit(n)), " "))).as("gram"))
  }

  /** Benchmark decontamination: which corpus documents share at least one
    * token `n`-gram with the benchmark set? Returns (`doc`,
    * `n_shared` — distinct shared grams), contaminated docs only.
    * Training corpora are scrubbed of eval-set n-grams this way
    * (typically n in 8–13); benchmark documents present in the corpus
    * flag themselves.
    *
    * Scale: the benchmark is small by definition (an eval suite, not a
    * corpus), so its distinct gram set is broadcast — the corpus side
    * then never shuffles: explode grams, broadcast-hash semi-match,
    * partial count per doc. `broadcastBench = false` drops the hint for
    * an unusually large benchmark and lets AQE decide from the actual
    * post-shuffle size.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastBench: Boolean = true): DataFrame = {
    val bg = tokenNgrams(bench, idCol, textCol, n).select("gram").distinct()
    val bgSide = if (broadcastBench) broadcast(bg) else bg
    tokenNgrams(corpus, idCol, textCol, n)
      .join(bgSide, "gram")
      .groupBy("doc").agg(count_distinct(col("gram")).as("n_shared"))
  }

  /** The auditing companion to [[decontaminate]]: instead of scrubbing
    * the corpus, report contamination PER BENCHMARK DOCUMENT — the
    * artifact an eval-integrity review wants ("which tasks leak, how
    * badly, concentrated in how few corpus docs"). Per benchmark doc
    * with any overlap at all:
    *  - `n_corpus_docs`      corpus docs sharing ≥ `minShared` distinct
    *                         grams with it
    *  - `n_shared_grams`     distinct (corpus doc, gram) overlap pairs,
    *                         counted over qualifying docs
    *  - `max_shared_one_doc` the worst single corpus doc's distinct
    *                         shared grams (near `benchmark length - n`
    *                         ⇒ verbatim inclusion)
    *
    * Scale: the benchmark gram set broadcasts (eval suites are small);
    * the corpus explodes grams ONCE, semi-matches against the broadcast
    * — so the only shuffle is the (bench_id, corpus doc) aggregate over
    * MATCHED grams, which is overlap-sized, not corpus-sized. */
  def contaminationReport(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val bg = broadcast(
      tokenNgrams(bench, idCol, textCol, n)
        .select(col("doc").as("__bench"), col("gram")).distinct())
    val pairShared = tokenNgrams(corpus, idCol, textCol, n)
      .dropDuplicates("doc", "gram")
      .join(bg, "gram")
      .groupBy(col("__bench"), col("doc"))
      .agg(count(lit(1)).as("__shared"))
      .where(col("__shared") >= minShared)
    pairShared.groupBy(col("__bench").as("bench_id"))
      .agg(count(lit(1)).as("n_corpus_docs"),
        sum("__shared").as("n_shared_grams"),
        max("__shared").as("max_shared_one_doc"))
  }

  /** Deterministic per-source token-budget sampling — the data-mixing
    * primitive stated in TOKENS instead of rates: keep each source's
    * documents in `keyCol` order while the running token total stays
    * within the source's budget (greedy prefix; the first overflowing
    * doc and everything after it is dropped). Sources absent from
    * `budgets` get `defaultBudget` (0 = drop — the safe default).
    *
    * Determinism: membership depends only on (source, key order, token
    * counts) — rerunning on any partitioning or engine keeps the same
    * prefix, and raising a budget only APPENDS documents (samples nest,
    * like [[Sampling.stratifiedSample]]'s rate property). REQUIRES
    * `keyCol` UNIQUE within each source: duplicate keys tie in the
    * window order, and which of the tied docs crosses the budget
    * boundary becomes partitioning-dependent.
    *
    * Scale: one shuffle keyed by source + a running-sum window. The sort
    * is per-source; a corpus with few giant sources serializes inside
    * each source — acceptable because budget enforcement is inherently
    * sequential in the keep order (if that is a bottleneck, pre-filter
    * with a rate-based [[Sampling.stratifiedSample]] first and apply the
    * budget to the survivors). */
  def sampleToTokenBudget(df: DataFrame, sourceCol: String, keyCol: String,
      textCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    df.withColumn("__cum",
        sum(size(toks(col(textCol))).cast("long")).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Mixture plan: given target domain weights and a total token
    * budget, the per-domain sampling/upsampling prescription a mixture
    * training run needs (the LLaMA/Pile-style epochs table) — computed
    * FROM the corpus's actual token inventory, so the plan and the data
    * can never drift apart.
    *
    * Per domain present in `weights` (missing domains report weight 0):
    *  - `avail_tokens`  corpus inventory (whitespace tokens)
    *  - `weight`        normalized target share (input weights need not
    *                    sum to 1; they are normalized — rz6'd)
    *  - `target_tokens` floor(budget · weight)
    *  - `epochs`        rz6(target / avail): < 1 downsample, > 1 repeat
    *  - `sample_rate`   min(1, epochs) — feed to [[Sampling]]'s
    *                    deterministic selection
    *  - `repeats`       ceil(epochs) — integer passes over the domain
    *
    * Scale: ONE count aggregate over (domain) — map-side combine onto
    * #domains rows; everything after is arithmetic on that tiny frame.
    * The corpus never shuffles and nothing is collected. */
  def mixturePlan(df: DataFrame, domainCol: String, textCol: String,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "weights must be non-negative and sum > 0")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val rz6 = graft.util.Round6.rz6 _
    val wSum = weights.values.sum
    val wExpr = weights.foldLeft(lit(0.0)) { case (acc, (d, w)) =>
      when(col("domain") === d, lit(w / wSum)).otherwise(acc)
    }
    val avail = df
      .groupBy(col(domainCol).as("domain"))
      .agg(sum(size(filter(toks(coalesce(col(textCol).cast("string"), lit(""))),
        t => t =!= "")).cast("long")).as("avail_tokens"))
    avail
      .withColumn("weight", rz6(wExpr))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * col("weight")).cast("long"))
      .withColumn("epochs",
        rz6(col("target_tokens").cast("double") / col("avail_tokens")))
      .withColumn("sample_rate", least(lit(1.0), col("epochs")))
      .withColumn("repeats", ceil(col("epochs")).cast("long"))
  }

  /** Bloom-filter variant of [[decontaminate]] for when the benchmark
    * side is itself large: the distinct gram set is compressed into one
    * Bloom filter (~`bitsPerGram` bits per gram vs ~50+ bytes per row in
    * a broadcast hash relation — a 100M-gram eval suite fits in ~120 MB
    * of filter instead of gigabytes of relation), shipped as a folded
    * binary literal into a codegen'd probe on the corpus scan. The probe
    * uses Spark's own runtime-filter machinery (BloomFilterAggregate /
    * BloomFilterMightContain via [[org.apache.spark.sql.graft.Shims]]),
    * not a UDF.
    *
    * Sizing: Spark SILENTLY clamps `BloomFilterAggregate` at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (4M items / 64M bits ≈ 8 MB by default) — a `Math.min`, not an
    * error — and a saturated filter keeps recall = 1 but its
    * false-positive rate explodes, over-flagging clean documents at
    * exactly the corpus scale this operator exists for. So the build
    * raises both caps to the requested sizing for the duration of the
    * aggregate and restores the caller's values after; the 100M-gram
    * case genuinely gets its ~120 MB filter.
    *
    * Asymmetry of errors: a Bloom filter has NO false negatives, so every
    * truly contaminated doc is flagged (recall of contamination = 1);
    * false positives can only over-flag clean docs at the configured
    * rate, which is the safe direction for decontamination. Returns
    * (`doc`, `n_flagged` — distinct grams that hit the filter). */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, bitsPerGram: Long = 10L): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    // persisted: the distinct gram set (a full explode + shuffle over the
    // LARGE benchmark this variant exists for) feeds two actions — the
    // sizing count and the bloom aggregate — and would otherwise be
    // recomputed from scratch for each
    val bg = tokenNgrams(bench, idCol, textCol, n).select("gram").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = math.max(bg.count(), 1L)
    // one bounded scalar to the driver: the serialized filter, built
    // with the clamping confs raised to the requested sizing
    val bloomBytes =
      try withMinConf(bench.sparkSession,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> est,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> est * bitsPerGram) {
        bg.select(Shims.column(Shims.bloomAgg(
            Shims.expression(col("gram")), est, est * bitsPerGram)).as("bf"))
          .head().getAs[Array[Byte]](0)
      } finally bg.unpersist()
    val hit = Shims.column(Shims.bloomMightContain(
      Shims.expression(lit(bloomBytes)), Shims.expression(col("gram"))))
    tokenNgrams(corpus, idCol, textCol, n)
      .where(hit)
      .groupBy("doc").agg(count_distinct(col("gram")).as("n_flagged"))
  }

  /** Run `body` with each long-valued conf raised to AT LEAST `needed`,
    * restoring the caller's settings afterwards (session-conf mutation
    * is scoped to the enclosed action, never leaked). */
  private[graft] def withMinConf[T](spark: org.apache.spark.sql.SparkSession,
      entries: (String, Long)*)(body: => T): T = {
    val saved = entries.map { case (k, _) => k -> spark.conf.getOption(k) }
    entries.foreach { case (k, needed) =>
      if (spark.conf.getOption(k).forall(_.toLong < needed))
        spark.conf.set(k, needed.toString)
    }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Keep at most `maxRows` rows per `keyCol`, chosen in `orderCol` order
    * — the per-domain / per-source cap that stops one crawl host from
    * dominating the mix. Deterministic given a unique orderCol.
    *
    * Scale: one shuffle keyed by `keyCol`; rank-within-group is streamed
    * (WindowExec sorts within partitions, no buffering of the full
    * group beyond the sort spill path). A single pathological key is the
    * skew unit — cap it upstream with a count filter if a key can exceed
    * executor spill capacity.
    */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String,
      maxRows: Int): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxRows).drop("__rn")
  }

  /** Cross-document boilerplate removal (the C4/CCNet line filter):
    * delete every occurrence of any line that appears in at least
    * `minDocs` DISTINCT documents — navigation bars, cookie banners,
    * license footers — and reassemble each document from its surviving
    * lines in original order. Output per input document (all documents
    * survive, possibly with empty text): (`idCol`, `textCol` cleaned,
    * `n_kept`, `n_dropped`).
    *
    * Matching is EXACT on the raw line (no trim/casefold) so the
    * operation is deterministic and engine-replayable; normalize
    * upstream if fuzzy matching is wanted. `sep` is a literal separator
    * (regex-quoted), split/join round-trips it.
    *
    * Scale: (1) the frequent-line census — count DISTINCT docs per
    * line — shuffles (line, doc) pairs once with map-side dedup; at a
    * boilerplate-grade `minDocs` its output is a vanishing fraction of
    * distinct lines and AQE turns the mark join into a broadcast from
    * its REAL size (no forced hint — at `minDocs` near 2 the
    * qualifying set is every duplicated line, which a web corpus makes
    * arbitrarily large, so a hard broadcast would be an OOM trap).
    * (2) Reassembly groups the exploded lines by document — text
    * crosses exactly one exchange, the same budget as [[Dedup]]'s
    * paragraph dedup. NULL text is treated as empty text: every input
    * document appears in the output.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    // NULL text reads as empty text (one empty line) so the document
    // still reaches the output — posexplode of a NULL split emits no
    // rows and would silently delete the row otherwise
    val lines = df.select(col(idCol).as("__doc"),
      posexplode(split(coalesce(col(textCol).cast("string"), lit("")),
        java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val frequent = lines.groupBy("__line")
      .agg(count_distinct(col("__doc")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__line"), lit(true).as("__bp"))
    // no broadcast hint: at minDocs near 2 the qualifying set is every
    // duplicated line, which a web corpus can make arbitrarily large —
    // AQE picks broadcast from the census's REAL size when it is small
    lines.join(frequent, Seq("__line"), "left")
      .groupBy(col("__doc"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__bp").isNull,
            struct(col("__pos"), col("__line"))))),
          s => s.getField("__line")), sep).as(textCol),
        count(when(col("__bp").isNull, 1)).cast("int").as("n_kept"),
        count(col("__bp")).cast("int").as("n_dropped"))
      .withColumnRenamed("__doc", idCol)
  }

  /** The C4 cleaning rules (Raffel et al. 2020 §2.2) — the line-level
    * companion to [[TextAnalysis.gopherFlags]]'s document-level rules:
    *
    *  - keep only lines ending in a terminal punctuation mark
    *    (`.` `!` `?` `"`) with at least `minLineWords` words and no
    *    "javascript" mention;
    *  - flag (for page drop) documents containing "lorem ipsum", a
    *    curly brace `{`, or any `badwords` token;
    *  - flag documents whose CLEANED text has fewer than `minSentences`
    *    sentences (terminal-punctuation count).
    *
    * Like [[TextAnalysis.gopherFlags]], each rule is an explicit output
    * column plus the conjunction (`c4_keep`), so pipelines can audit
    * which rule fired instead of getting a bare boolean; the row for
    * every input document survives (NULL text reads as empty) — C4's
    * span dedup step is [[graft.operators.Dedup.dedupSpans]].
    *
    * Scale design (100 TB): map-only — one WholeStageCodegen pass of
    * higher-order array functions over the text column, no shuffle, no
    * UDF; `badwords` folds into the plan as literals (the published
    * blocklist is a few hundred words — constant work per token). */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      badwords: Seq[String] = Nil, minSentences: Int = 5,
      minLineWords: Int = 3): DataFrame = {
    val keepLine: Column => Column = l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(filter(split(l, " "), w => w =!= "")) >= minLineWords &&
        !contains(lower(l), lit("javascript"))
    val base = df
      .select(col(idCol),
        coalesce(col(textCol).cast("string"), lit("")).as("__txt"))
      .withColumn("__lines", split(col("__txt"), "\n"))
      .withColumn("__kept", filter(col("__lines"), keepLine))
      .withColumn("__clean", array_join(col("__kept"), "\n"))
    val badFlag =
      if (badwords.isEmpty) lit(false)
      else badwords.map(b => array_contains(split(lower(col("__txt")), " "), b))
        .reduce(_ || _)
    base.select(col(idCol),
        col("__clean").as(textCol),
        size(col("__kept")).as("n_lines_kept"),
        (size(col("__lines")) - size(col("__kept"))).as("n_lines_dropped"),
        length(regexp_replace(col("__clean"), "[^.!?]", "")).as("n_sentences"),
        contains(lower(col("__txt")), lit("lorem ipsum")).as("has_lorem"),
        contains(col("__txt"), lit("{")).as("has_brace"),
        badFlag.as("has_badword"))
      .withColumn("c4_keep",
        !col("has_lorem") && !col("has_brace") && !col("has_badword") &&
          col("n_sentences") >= minSentences)
  }

  /** Canonical URL for dedup keys — the C4/Common-Crawl-style
    * normalization under which `HTTP://WWW.Site.com:80/a/?utm_source=x#f`
    * and `http://site.com/a` are the SAME page: drop the fragment,
    * lowercase scheme+host, strip default ports (http:80 / https:443)
    * and a leading `www.`, remove tracking query params
    * (`utm_*`/`gclid`/`fbclid`) with separator tidy-up, and drop a
    * trailing slash. A fixed chain of codegen'd `regexp_replace` /
    * `regexp_extract` steps — map-only, engine-replayable (the oracle
    * runs the same chain in RE2), no UDF. Path case is preserved
    * (paths ARE case-sensitive; hosts are not). */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val prefix = lower(regexp_extract(noFrag, "^([a-zA-Z]+://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]*(.*)", 1)
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // anchored at a separator so a param whose NAME merely ends in a
    // tracking name ('?xgclid=5') is never eaten; the run form strips
    // consecutive tracking params in one pass (replacement text is not
    // rescanned, so an unanchored single-param pattern would need the
    // separator of the NEXT match that the previous match consumed)
    val noTrack = regexp_replace(rest,
      "([?&])((utm_[a-zA-Z]+|gclid|fbclid)=[^&#]*&)*" +
        "(utm_[a-zA-Z]+|gclid|fbclid)=[^&#]*&?", "$1")
    val tidied =
      regexp_replace(regexp_replace(noTrack, "\\?&", "?"), "[?&]$", "")
    regexp_replace(concat(noWww, tidied), "/$", "")
  }

  /** URL-keyed exact dedup election: one row per [[canonicalUrl
    * canonical URL]] with the smallest id as the keeper and the
    * duplicate count — the cheapest high-precision dedup pass a web
    * corpus runs BEFORE any content hashing (C4 deduplicated by URL
    * first). One hash aggregation with map-side partials; no sort, no
    * window, no content movement. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.where(col(urlCol).isNotNull)
      .groupBy(canonicalUrl(col(urlCol)).as("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** URL extraction from free text — the edge producer for link-graph
    * curation (feed the hosts into [[graft.operators.Graph.kCore]] /
    * PageRank for link-quality priors, or [[urlDedup]] for citation
    * dedup): one row per `http(s)://` match with the lowercased host.
    * One row per MATCH — documents without URLs produce no rows.
    * Map-only codegen'd `regexp_extract_all` + explode; the pattern is
    * Java/RE2-portable like the [[PiiEmail]] family. Sentence-final
    * punctuation is excluded structurally: the host must START and END
    * alphanumeric (so 'see http://example.com. next' extracts
    * 'example.com', not 'example.com.'), and a path must end in a
    * URL-body character ('/a5.)' extracts '/a5' — the trailing '.'
    * and ')' stay in the prose). */
  def extractUrls(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val urlPat = "https?://[A-Za-z0-9]([A-Za-z0-9.-]*[A-Za-z0-9])?" +
      "(:[0-9]+)?(/[^ ]*[A-Za-z0-9/_=&%#-]|/)?"
    df.select(col(idCol),
        explode(regexp_extract_all(t, lit(urlPat), lit(0))).as("url"))
      .withColumn("host",
        lower(regexp_extract(col("url"), "^https?://([^/:]+)", 1)))
  }

  // ---- PII detection + redaction ---------------------------------------

  /** PII patterns, shared verbatim between the Spark side and the
    * DuckDB oracles — every construct is portable across Java regex and
    * RE2 with identical match semantics (no lookaround, no `\s` — Java
    * includes U+000B where RE2 does not — and alternations ordered so
    * leftmost-first agrees): email addresses, phone-like digit runs,
    * dotted-quad IPv4 addresses, and US-SSN-shaped triples. Pattern
    * counts are INDEPENDENT non-overlapping scans per pattern — an SSN
    * is also a phone-shaped digit run and counts under both, the
    * documented semantics (a doc is flagged if ANY pattern fires; the
    * per-type counts are pattern censuses, not a partition). */
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiPhone = "\\+?[0-9][0-9()\\- ]{7,14}[0-9]"
  private[graft] val PiiIpv4 =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b"
  private[graft] val PiiSsn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Per-document PII census: non-overlapping match counts of the four
    * [[PiiEmail]]-family patterns plus the any-hit flag — the filter
    * signal a training-data pipeline gates on before release. Map-only
    * codegen'd `regexp_extract_all` counts (no UDF, no shuffle);
    * deterministic and engine-replayable by construction. */
  def piiProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    def n(p: String): Column = size(regexp_extract_all(t, lit(p), lit(0)))
    df.select(col(idCol),
      n(PiiEmail).as("n_email"),
      n(PiiPhone).as("n_phone"),
      n(PiiIpv4).as("n_ipv4"),
      n(PiiSsn).as("n_ssn"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ipv4") + col("n_ssn") > 0)
  }

  /** PII redaction: replace each match with a type tag, in the fixed
    * chain order email → SSN → IPv4 → phone (earlier redactions insert
    * non-matching tags, so a digit run inside an already-redacted SSN
    * can never double-fire the phone pattern — order is part of the
    * contract and the oracle replays the same chain). Returns every
    * input column with `textCol` rewritten plus `n_redacted`. Map-only
    * codegen'd regexp chain; text never shuffles. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    def n(s: Column, p: String): Column =
      size(regexp_extract_all(s, lit(p), lit(0)))
    // counts are taken AT EACH STAGE of the chain, so n_redacted is the
    // number of replacements actually made — an SSN redacted at stage 2
    // is a tag by the time the phone pattern scans, and must not count
    // again (counting all patterns on the raw text would double-book it)
    val s1 = regexp_replace(t, PiiEmail, "<EMAIL>")
    val s2 = regexp_replace(s1, PiiSsn, "<SSN>")
    val s3 = regexp_replace(s2, PiiIpv4, "<IP>")
    val s4 = regexp_replace(s3, PiiPhone, "<PHONE>")
    df.withColumn("__n",
        n(t, PiiEmail) + n(s1, PiiSsn) + n(s2, PiiIpv4) + n(s3, PiiPhone))
      .withColumn(textCol, s4)
      .withColumn("n_redacted", col("__n")).drop("__n")
  }
}
