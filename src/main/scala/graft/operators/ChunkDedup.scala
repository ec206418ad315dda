package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document (chunk-level) exact deduplication.
  *
  * Document-level dedup (Dedup.exactGroups) misses boilerplate: headers,
  * navigation bars, license blocks repeated across millions of otherwise
  * distinct pages. The standard counter is to dedup at a finer grain —
  * split every document into fixed-size token chunks ("paragraphs" when
  * the corpus has them), keep the FIRST occurrence of each distinct chunk
  * corpus-wide, and reassemble documents from their surviving chunks.
  *
  * Plan shape (all relational, nothing driver-side):
  *   1. chunk construction is pure expression work fused into the scan —
  *      `transform(sequence(...))` slices the token array, so no explode
  *      until the one `posexplode` that emits (doc, chunk_idx, chunk);
  *   2. the keeper per distinct chunk is a `min(struct(doc_id, idx))`
  *      HASH AGGREGATE — partial-aggregatable, so each map task folds its
  *      chunks before the exchange and the shuffle carries |distinct
  *      chunks| rows, never a sort;
  *   3. the keeper set joins back to the chunk stream ON THE SAME KEY the
  *      aggregate just partitioned by, so the join reuses that exchange
  *      (one effective shuffle for steps 2+3);
  *   4. reassembly is one groupBy(doc_id) — `sort_array(collect_list)` is
  *      per-document state, bounded by document length, never corpus-wide.
  *
  * At 100 TB the two exchanges are O(total chunks) with map-side
  * reduction — the same cost envelope as exact dedup, no quadratic term.
  */
object ChunkDedup {

  /** Chunk `textCol` into `size`-token chunks and keep each distinct
    * chunk's first occurrence under (idCol, chunk_idx) order.
    *
    * Output: one row per input document —
    * (id, n_chunks, n_kept, new_text), where `new_text` re-joins the
    * surviving chunks in original order and is NULL when every chunk of
    * the document already appeared earlier in the corpus. */
  def dedupChunks(df: DataFrame, idCol: String, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    val chunks = chunkArray(textCol, size)

    val chunked = df
      .select(col(idCol).cast("long").as("id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))

    // keeper per distinct chunk: lexicographically smallest (id, idx)
    val keepers = chunked
      .groupBy("chunk")
      .agg(min(struct(col("id"), col("chunk_idx"))).as("keeper"))

    chunked
      .join(keepers, "chunk") // co-partitioned with the aggregate above
      .withColumn("kept",
        struct(col("id"), col("chunk_idx")) === col("keeper"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("kept"), 1)).as("n_kept"),
        nullif(
          array_join(
            transform(
              sort_array(filter(
                collect_list(when(col("kept"), struct(col("chunk_idx"), col("chunk")))),
                s => s.isNotNull)),
              s => s.getField("chunk")),
            " "),
          lit("")).as("new_text"))
  }

  /** Corpus-level boilerplate report: the chunks repeated in at least
    * `minDocs` distinct documents, with occurrence counts. Same single
    * hash-agg shuffle as exact dedup. */
  def boilerplate(df: DataFrame, idCol: String, textCol: String,
      size: Int, minDocs: Int): DataFrame = {
    df.select(col(idCol).cast("long").as("id"), explode(chunkArray(textCol, size)).as("chunk"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("id")).as("n_docs"),
        min("id").as("first_id"))
      .where(col("n_docs") >= minDocs)
  }

  /** `ceil(n_tokens / size)` fixed-size chunks of the token stream as a
    * pure expression — fuses into the scan stage, no explode needed to
    * build the chunks themselves. `floor` over the double quotient is
    * exact here (token counts are far below 2^53). */
  private def chunkArray(textCol: String, size: Int): Column = {
    val toks = split(col(textCol), " ")
    val nChunks =
      floor((org.apache.spark.sql.functions.size(toks) + lit(size - 1)) / lit(size)).cast("int")
    transform(
      sequence(lit(0), nChunks - lit(1)),
      i => array_join(slice(toks, i * lit(size) + lit(1), lit(size)), " "))
  }
}
