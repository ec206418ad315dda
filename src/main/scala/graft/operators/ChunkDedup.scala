package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

import graft.functions.RollingGramHash

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

  /** Duplicate-SPAN excision — the sliding-window counterpart of
    * `dedupChunks`. Chunk dedup removes whole fixed-grid chunks; a
    * duplicated passage that straddles a chunk boundary survives it. Here
    * every `win`-token window at `stride`-token steps is fingerprinted,
    * a window whose fingerprint occurs at least `minCount` times
    * corpus-wide is flagged, and each document's flagged windows are
    * merged into maximal spans whose token positions are excised — the
    * standard exact-substring dedup treatment for training corpora
    * (fixed-length window fingerprints stand in for the suffix-array
    * match step, which has no bounded-memory distributed form).
    *
    * Plan shape: window construction is expression work (one explode of
    * (start, fp) pairs — the window TEXT never leaves the map stage, only
    * its md5); the duplicate set is one hash agg on fp; flagging joins on
    * the fp key the agg just partitioned by; per-doc flagged starts
    * aggregate to a sorted array (bounded by doc length); the single join
    * that touches document text again is on the doc key, and the excision
    * itself is a pure `filter` HOF over the token array. At 100 TB every
    * shuffle carries fingerprints or start offsets except the final
    * doc-keyed join, which carries the corpus once — the same envelope as
    * any rewrite-the-text dedup pass.
    *
    * Only FULL windows are flaggable (a short document tail would match
    * other tails trivially); documents shorter than `win` pass through
    * unchanged. Output per input document: original token count, flagged
    * window count, merged span count, tokens removed, and the md5 of the
    * cleaned (space-rejoined) text. */
  def exciseDupSpans(df: DataFrame, idCol: String, textCol: String,
      win: Int, stride: Int, minCount: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(win > 0 && stride > 0, s"win=$win stride=$stride must be positive")
    require(minCount >= 2, s"minCount=$minCount must be >= 2")

    val base = df.select(col(idCol).cast("long").as("id"),
      split(col(textCol), " ").as("w"))

    // window fingerprints ride the O(n) rolling-gram pass
    // ([[graft.functions.RollingGramHash]]) — the strided selection
    // just picks every `stride`-th entry of the stride-1 hash array
    val wins = base
      .where(size(col("w")) >= win)
      .withColumn("gh",
        exprColumn(RollingGramHash(columnExpr(col("w")), win)))
      .select(col("id"), explode(expr(
        s"""transform(sequence(0, size(w) - $win, $stride),
              s -> struct(CAST(s AS BIGINT) AS start,
                          element_at(gh, CAST(s + 1 AS INT)) AS fp))"""))
        .as("c"))
      .select(col("id"), col("c.start").as("start"), col("c.fp").as("fp"))

    val dup = wins.groupBy("fp").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount).select("fp")
    val flagged = wins.join(dup, "fp").select("id", "start")

    // merged-span count: starts are ascending per doc, so a new span opens
    // exactly when this window starts past the previous window's end
    val byDoc = Window.partitionBy("id").orderBy("start")
    val perDoc = flagged
      .withColumn("ni", when(
        col("start") > coalesce(lag(col("start"), 1).over(byDoc) + lit(win.toLong),
          lit(-1L)), lit(1L)).otherwise(lit(0L)))
      .groupBy("id").agg(
        sort_array(collect_list(col("start"))).as("starts"),
        count(lit(1)).as("n_flagged"),
        sum("ni").as("n_spans"))

    base.join(perDoc, Seq("id"), "left")
      .withColumn("starts_c",
        coalesce(col("starts"), expr("CAST(array() AS ARRAY<BIGINT>)")))
      .withColumn("cw",
        expr(s"filter(w, (t, i) -> NOT exists(starts_c, s -> i >= s AND i < s + $win))"))
      .select(col("id").as(idCol),
        size(col("w")).cast("long").as("n_tok"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (size(col("w")) - size(col("cw"))).cast("long").as("n_removed"),
        md5(array_join(col("cw"), " ")).as("clean_fp"))
  }

  /** EXACT duplicate-substring excision (the Lee et al. 2022 semantics
    * [[exciseDupSpans]] approximates): excise every position that lies
    * inside a duplicated substring of ANY length ≥ `minLen`, keeping
    * each duplicate's corpus-first occurrence.
    *
    * Exactness without a suffix array, from one containment fact: a
    * substring of length ≥ L occurs twice iff each of its L-token
    * windows occurs twice at the aligned offsets — so the set of
    * positions inside SOME duplicated ≥L-substring is EXACTLY the
    * union of positions covered by duplicated L-grams at stride 1.
    * [[exciseDupSpans]]'s strided fixed windows miss spans shorter
    * than `win` by construction; this operator's only length floor is
    * `minLen` itself. Retention is the house keep-first rule (D1):
    * per distinct L-gram the lexicographically smallest (doc, start)
    * occurrence survives, every other occurrence's coverage is
    * excised — for a long span duplicated wholesale, that keeps the
    * first copy intact and removes the others in full.
    *
    * Plan shape (the suffix-ranking the literature reaches for has no
    * bounded-memory distributed form; this does): gram fingerprints
    * are expression work in the scan (text never leaves the map
    * stage); keeper+count is ONE partial-aggregatable hash agg on fp;
    * flagging joins back on the fp key that agg just partitioned by;
    * span merge is a per-doc window over start offsets; the one join
    * that touches text again is doc-keyed. Every exchange carries
    * md5 fingerprints and start offsets only — at 100 TB the shuffled
    * bytes are ~24/gram regardless of document size. Stride 1 costs
    * L× the strided variant's gram count on the map side; that is the
    * price of exactness and it is scan-local, not shuffled. */
  def exciseDupSpansExact(df: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minLen > 0, s"minLen=$minLen must be positive")

    val base = df.select(col(idCol).cast("long").as("id"),
      split(col(textCol), " ").as("w"))

    val grams = base
      .where(size(col("w")) >= minLen)
      .select(col("id"), posexplode(
          exprColumn(RollingGramHash(columnExpr(col("w")), minLen)))
        .as(Seq("start", "fp")))
      .select(col("id"), col("start").cast("long").as("start"), col("fp"))

    val dupFp = grams.groupBy("fp")
      .agg(min(struct(col("id"), col("start"))).as("keeper"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2)
    val dupOcc = grams.join(dupFp, "fp") // co-partitioned with the agg
      .where(struct(col("id"), col("start")) =!= col("keeper"))
      .select("id", "start")

    // stride-1 intervals all have length minLen, so ends are ordered
    // like starts and the previous interval IS the running max — a new
    // island opens exactly when this gram starts past the previous end
    val byDoc = Window.partitionBy("id").orderBy("start")
    val perDoc = dupOcc
      .withColumn("ni", when(
        col("start") > coalesce(lag(col("start"), 1).over(byDoc) + lit(minLen.toLong),
          lit(-1L)), lit(1L)).otherwise(lit(0L)))
      .groupBy("id").agg(
        sort_array(collect_list(col("start"))).as("starts"),
        count(lit(1)).as("n_dup_grams"),
        sum("ni").as("n_spans"))

    base.join(perDoc, Seq("id"), "left")
      .withColumn("starts_c",
        coalesce(col("starts"), expr("CAST(array() AS ARRAY<BIGINT>)")))
      .withColumn("cw",
        expr(s"filter(w, (t, i) -> NOT exists(starts_c, s -> i >= s AND i < s + $minLen))"))
      .select(col("id").as(idCol),
        size(col("w")).cast("long").as("n_tok"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (size(col("w")) - size(col("cw"))).cast("long").as("n_removed"),
        md5(array_join(col("cw"), " ")).as("clean_fp"))
  }

  /** `ceil(n_tokens / size)` fixed-size chunks of the token stream as a
    * pure expression — fuses into the scan stage, no explode needed to
    * build the chunks themselves. `floor` over the double quotient is
    * exact here (token counts are far below 2^53). */
  def chunkArray(textCol: String, size: Int): Column = {
    val toks = split(col(textCol), " ")
    val nChunks =
      floor((org.apache.spark.sql.functions.size(toks) + lit(size - 1)) / lit(size)).cast("int")
    transform(
      sequence(lit(0), nChunks - lit(1)),
      i => array_join(slice(toks, i * lit(size) + lit(1), lit(size)), " "))
  }
}
