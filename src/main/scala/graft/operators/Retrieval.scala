package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine several ranked candidate lists
  * (BM25 text ranks, ANN embedding ranks, ...) into one ranking —
  * the standard RAG retrieval stack, where lexical and semantic
  * retrievers each miss what the other catches.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): each list
    * contributes `1 / (kRrf + rank)` for the items it ranked, summed
    * across lists; ties break by ascending item id. Items missing from
    * a list contribute 0 from it (the full-outer-join semantics), so a
    * document only one retriever found still surfaces, discounted.
    *
    * Every input frame must be (qidCol, idCol, rankCol) with integer
    * 1-based ranks and at most one row per (query, item).
    *
    * Determinism: the fused score is a FIXED-ORDER sum — lists fold
    * left-to-right through full-outer joins, one row per (query, item),
    * so the double addition order is the caller's list order, never the
    * partitioning's. Integer ranks → each term is the same double on
    * any engine; the DuckDB oracle replays the identical expression
    * (q184 ships the raw doubles, no rounding law needed).
    *
    * Scale design (100 TB): candidate lists are top-k per query — k·|Q|
    * rows each, already reduced by their retrievers — so the fusion
    * joins are hash joins on (query, item) over small frames; the final
    * per-query top-k is a rank-pushdown window keyed by query. Nothing
    * here touches the corpus: fusion cost is O(lists · k · |Q|)
    * regardless of corpus size. */
  def rrfFuse(lists: Seq[DataFrame], qidCol: String, idCol: String,
      rankCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.size >= 2, s"need >= 2 lists to fuse (got ${lists.size})")
    require(k > 0 && kRrf >= 0, s"need k > 0, kRrf >= 0 (got $k/$kRrf)")
    val prepped = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(qidCol).as("__q"), col(idCol).as("__i"),
        col(rankCol).cast("int").as(s"__r$i"))
    }
    val joined = prepped.reduce((a, b) => a.join(b, Seq("__q", "__i"), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    val nLists = lists.indices
      .map(i => when(col(s"__r$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val w = Window.partitionBy("__q").orderBy(col("__rrf").desc, col("__i").asc)
    joined
      .withColumn("__rrf", score)
      .withColumn("__n", nLists)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("__q").as(qidCol), col("__i").as(idCol),
        col("__n").cast("int").as("n_lists"), col("__rrf").as("rrf"),
        col("rnk").cast("int").as("rnk"))
  }
}
