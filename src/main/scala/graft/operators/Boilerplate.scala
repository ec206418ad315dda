package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source boilerplate removal — the within-host sibling of corpus-wide
  * [[ChunkDedup]].
  *
  * Web-crawl curation pipelines (CCNet / RefinedWeb style) strip the
  * header/footer/nav text that a single HOST repeats across most of its
  * pages. The criterion is NOT global frequency (a chunk repeated across
  * many hosts may be legitimate quotation) but the within-source
  * document-frequency RATIO: a chunk that appears in ≥ `ratioPct`% of one
  * source's documents is that source's boilerplate and is excised from
  * every document of that source, keepers included — unlike keep-first
  * chunk dedup, boilerplate has no keeper.
  *
  * Plan shape (reference behavior: the transform DAGs dedup at document
  * grain only — spotify_etl.py:42 — this is the finer-grain curation op a
  * 100 TB crawl needs):
  *   1. chunking is the same fused expression as ChunkDedup
  *      ([[ChunkDedup.chunkArray]]): no explode until one `posexplode`;
  *   2. per-(source, chunk) doc-frequency is ONE hash aggregate keyed by
  *      (source, chunk) — `count_distinct(id)` partial-aggregates, and the
  *      key includes `source`, so a 1000-executor run partitions by host
  *      slice, never concentrating a hot global chunk on one reducer;
  *   3. per-source doc counts are a tiny broadcast (|sources| rows);
  *   4. the boilerplate set joins back to the chunk stream ON (source,
  *      chunk) — the key the aggregate just exchanged by, so the physical
  *      plan reuses that exchange; reassembly is one groupBy(id) bounded
  *      by document length.
  *
  * All O(total chunks) with map-side combine — the exact cost envelope of
  * chunk dedup, independent of corpus size per partition.
  */
object Boilerplate {

  /** Strip per-source boilerplate chunks.
    *
    * A chunk of `size` tokens is boilerplate for a source when its
    * within-source doc-frequency is ≥ max(`minDf`, ceil(ratioPct% of the
    * source's documents)). Output: one row per input document —
    * (id, source, n_chunks, n_boiler, new_text) with `new_text` the
    * surviving chunks re-joined in order (NULL when the whole document
    * was boilerplate). */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, size: Int = 2, ratioPct: Int = 10,
      minDf: Int = 2): DataFrame = {
    require(size > 0 && ratioPct > 0 && minDf > 1,
      s"need size>0, ratioPct>0, minDf>1; got ($size, $ratioPct, $minDf)")

    val chunked = df.select(
      col(idCol).cast("long").as("id"), col(sourceCol).as("src"),
      posexplode(ChunkDedup.chunkArray(textCol, size)).as(Seq("idx", "chunk")))

    // integer threshold: ceil(ratioPct% of n_docs) as (n*r + 99) div 100
    // — exact, no float compare to drift against the SQL twin
    val nDocs = df.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    val boiler = chunked
      .groupBy("src", "chunk")
      .agg(count_distinct(col("id")).as("df"))
      .join(broadcast(nDocs), Seq("src"))
      .where(col("df") >= greatest(lit(minDf.toLong),
        expr(s"(n_docs * $ratioPct + 99) div 100")))
      .select(col("src"), col("chunk"), lit(true).as("is_boiler"))

    chunked
      .join(boiler, Seq("src", "chunk"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        first(col("src")).as(sourceCol),
        count(lit(1)).as("n_chunks"),
        count(when(col("is_boiler"), 1)).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull, struct(col("idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("new_text"))
      // empty-after-strip docs: blank string → NULL, matching ChunkDedup
      .withColumn("new_text",
        when(length(col("new_text")) === 0, lit(null)).otherwise(col("new_text")))
  }
}
