package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

/** Explicit Bloom-filter probe-side pruning for semi joins.
  *
  * Catalyst injects runtime bloom filters on its own
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when a selective
  * build side sits under a shuffle join — but only for equi-joins it can
  * see through, and the sizing is heuristic. This operator is the same
  * trick as an explicit, composable step for the 100 TB ingest shape:
  * the probe side is the full corpus, the build side is a filtered
  * dimension too large to broadcast raw, and the win is discarding
  * probe rows BEFORE the probe-side shuffle of the verify join.
  *
  * Exactness: a Bloom filter admits false positives only, and the final
  * left-semi join re-checks every survivor — the result equals the plain
  * semi join bit-for-bit; the filter only changes how many rows reach
  * the exchange. (This is why the oracle for the demo query is the
  * plain `WHERE EXISTS`.)
  *
  * Plan shape: one aggregate over the build side folds it into a single
  * bloom blob (partial-aggregatable: each map task builds a local filter,
  * merge ORs the bitsets); the blob rides a broadcast nested-loop join of
  * a 1-row relation (control-plane bytes, not data); `might_contain`
  * evaluates inside the probe scan stage, so the pruned rows never leave
  * the mapper; the verify join then shuffles only survivors.
  */
object BloomPrune {

  /** `probe LEFT SEMI JOIN build ON probeKey = buildKey`, with the probe
    * side pre-filtered by a bloom filter built over `buildKey`.
    *
    * @param expectedItems sizing hint for the filter (bits scale with it;
    *                      Spark's default false-positive rate is 3%). */
  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(columnExpr(col(buildKey)))),
      expectedItems)
    // might_contain demands a constant or scalar-subquery bloom side: the
    // 1-row aggregate rides in as an uncorrelated scalar subquery —
    // executed once, its bytes become a literal in the probe-side filter
    // (the same control-plane shape Catalyst's own runtime filters use)
    val blobPlan = build
      .agg(exprColumn(bloomAgg.toAggregateExpression()).as("__bloom"))
      .queryExecution.analyzed
    val pruned = probe.where(exprColumn(BloomFilterMightContain(
      ScalarSubquery(blobPlan),
      new XxHash64(Seq(columnExpr(col(probeKey)))))))
    pruned.join(build, col(probeKey) === col(buildKey), "left_semi")
  }
}
