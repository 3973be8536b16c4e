package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) reporting over token streams — "what
  * are the top terms per source/shard/day" without shuffling one row
  * per distinct (group, term).
  *
  * Scale design: the exact recipe — `groupBy(group, term).count` then
  * a per-group top-k window — exchanges the full per-group vocabulary
  * (at 100 TB, the vocabulary IS corpus-sized: URLs, hashes, ids).
  * [[org.apache.spark.sql.graft.MgTopK]] replaces that with a regular
  * partial→final aggregate whose shuffle payload is a HARD
  * `capacity`-entry summary per (task, group), with the Misra–Gries
  * guarantee: every term of relative frequency above
  * `1/(capacity+1)` survives, and reported counts undercount by at
  * most `N_group/(capacity+1)`. Pick `capacity >>` the k you report
  * (e.g. 100× k) and the top-k set/order is exact for any realistic
  * skew; with `capacity >=` distinct terms the whole summary is
  * exact (the oracle regime). */
object Freq {

  /** Top-`k` tokens of `textCol` (whitespace-split) per `groupCol`,
    * via a capacity-bounded Misra–Gries summary: one row per
    * (group, rank) with the term and its estimated count. */
  def heavyHitterTokens(df: DataFrame, groupCol: String, textCol: String,
      capacity: Int, k: Int): DataFrame = {
    require(k > 0 && k <= capacity, s"need 0 < k <= capacity (got k=$k cap=$capacity)")
    df.select(col(groupCol), explode(split(col(textCol), " ")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .groupBy(col(groupCol))
      .agg(GeoFunctions.mg_topk(col("__tok"), lit(capacity)).as("__hh"))
      .select(col(groupCol), posexplode(slice(col("__hh"), 1, k)))
      .select(col(groupCol), (col("pos") + 1).as("rnk"),
        col("col.item").as("term"), col("col.est").as("est"))
  }
}
