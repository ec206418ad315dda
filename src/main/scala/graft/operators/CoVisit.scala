package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

import graft.functions.PairCombinations

/** Session-scoped co-visitation mining ("viewed-together") — the
  * market-basket statistic over behavioral sessions: which item pairs
  * co-occur in one user session more often than their independent
  * frequencies predict. Feeds recommendation candidates, bundle
  * detection, and (in a corpus pipeline) co-access-based document
  * affinity.
  *
  * Lift uses the X97 collocations determinism trick: rank by the RATIO
  * `n_ab·n_sessions / (n_a·n_b)` — two exact long products and ONE
  * double division, identical in both engines — rather than log-PMI
  * (libm drift).
  *
  * Scale shape: session tagging is the X19 keyed window (state = one
  * user's events per partition); the per-session item set is bounded by
  * the session (collect_set), pair expansion is the X33 zero-allocation
  * [[PairCombinations]] generator bounded by set size squared — sessions
  * are short by construction (the gap bound), so the quadratic is per
  * session, never global; pair counting is one map-side-combinable agg
  * keyed by (a, b). */
object CoVisit {

  /** Mine co-visited `itemCol` pairs from `events` sessionized per
    * `keyCol` with `gapSeconds`. Returns (item_a, item_b, n_ab, n_a,
    * n_b, n_sessions, lift) for pairs with support ≥ `minSupport`. */
  def pairs(events: DataFrame, keyCol: String, tsCol: String,
      itemCol: String, gapSeconds: Long, minSupport: Long): DataFrame = {
    val tagged = Sessionize.tagSessions(events, keyCol, tsCol, gapSeconds)
      .select(col(keyCol).as("__k"), col("session_seq").as("__s"),
        col(itemCol).as("__i"))
    val sets = tagged.groupBy("__k", "__s")
      .agg(sort_array(collect_set(col("__i"))).as("items"))
      .persist() // three readers below: pairs, item counts, session count
    val pairCounts = sets
      .select(exprColumn(PairCombinations(columnExpr(col("items"))))
        .as(Seq("item_a", "item_b")))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val itemCounts = sets
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_i"))
    val nSessions = sets.select(count(lit(1)).as("n_sessions"))
    val out = pairCounts
      .join(broadcast(itemCounts.select(col("item").as("item_a"),
        col("n_i").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("item").as("item_b"),
        col("n_i").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nSessions))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_sessions"),
        ((col("n_ab") * col("n_sessions")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      // materialize while `sets` is cached, then release the cache —
      // pairs() owns its persist lifetime (no leaked blocks across
      // repeated invocations); the checkpointed blocks are reclaimed by
      // the ContextCleaner once the returned frame is unreferenced
      .localCheckpoint(true)
    sets.unpersist()
    out
  }
}
