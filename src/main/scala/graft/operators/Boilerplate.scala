package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

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
  *   4. the strip is a per-row higher-order filter of each document's
  *      chunk array against its source's broadcast boilerplate set —
  *      no chunk-stream join, no per-document reassembly exchange.
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

    // chunk ONCE: both consumers (the doc-frequency agg below and the
    // strip projection at the end) read this cached projection, so the
    // tokenize+slide expression runs one time per document — at
    // cluster scale this is the staged scratch table between the two
    // passes (recompute would be the chunkArray expression again)
    val docsChunks = graft.Caching.tracked(df.select(
        col(idCol).cast("long").as("id"), col(sourceCol).as("src"),
        ChunkDedup.chunkArray(textCol, size).as("__chunks"))
      .where(F.size(col("__chunks")) > 0)) // posexplode drops chunkless docs
    // per-doc array_distinct makes each (doc, chunk) pair unique
    // LOCALLY, so the doc-frequency is a plain one-phase count — the
    // count_distinct(id) it replaces paid a two-phase dedup agg keyed
    // (src, chunk, id) for the same number
    val chunked = docsChunks.select(col("src"),
      explode(array_distinct(col("__chunks"))).as("chunk"))

    // integer threshold: ceil(ratioPct% of n_docs) as (n*r + 99) div 100
    // — exact, no float compare to drift against the SQL twin
    val nDocs = df.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    val boiler = chunked
      .groupBy("src", "chunk")
      .agg(count(lit(1)).as("df"))
      .join(broadcast(nDocs), Seq("src"))
      .where(col("df") >= greatest(lit(minDf.toLong),
        expr(s"(n_docs * $ratioPct + 99) div 100")))

    // The strip itself needs no chunk-stream join and no per-document
    // reassembly exchange (round-6 shape: left-join every chunk row,
    // then groupBy(id) re-collected every document — two exchanges of
    // the full chunk stream): the boilerplate SET per source is small
    // by construction (a host's repeated templates, not its content),
    // so it broadcasts as one array per source and the strip is a
    // per-row higher-order filter over the doc's chunk array — order
    // preserved by the array itself, nothing exchanged. At web scale
    // with millions of hosts the broadcast bound is Σ|per-host sets|;
    // if that outgrows a broadcast, swap the broadcast() below for a
    // plain equi-join on src (same semantics, one shuffle of docs).
    val boilerSets = boiler.groupBy("src")
      .agg(collect_set(col("chunk")).as("__bset"))
    val isBoiler = (c: org.apache.spark.sql.Column) =>
      array_contains(col("__bs"), c)
    docsChunks
      .join(broadcast(boilerSets), Seq("src"), "left")
      .withColumn("__bs",
        coalesce(col("__bset"), array().cast("array<string>")))
      // ONE filter pass per document (round 13): the survivors array is
      // materialized once and read twice — n_boiler is total − kept, so
      // the O(|chunks|·|bset|) membership scan and its array allocation
      // aren't paid a second time just to count the complement (q143 was
      // the suite's top allocator, ~6 GB/pass, half of it this)
      .withColumn("__kept", filter(col("__chunks"), c => !isBoiler(c)))
      .select(
        col("id").as(idCol),
        col("src").as(sourceCol),
        F.size(col("__chunks")).cast("long").as("n_chunks"),
        (F.size(col("__chunks")) - F.size(col("__kept"))).cast("long")
          .as("n_boiler"),
        array_join(col("__kept"), " ").as("new_text"))
      // empty-after-strip docs: blank string → NULL, matching ChunkDedup
      .withColumn("new_text",
        when(length(col("new_text")) === 0, lit(null)).otherwise(col("new_text")))
  }
}
