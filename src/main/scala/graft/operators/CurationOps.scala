package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.storage.StorageLevel

/** The shared dedup artifact stage of a curation run.
  *
  * A production curation pass over a 100 TB corpus computes the near-dup
  * pair table and its connected components ONCE, then feeds keeper
  * selection, source-overlap diagnostics, dedup reweighting, and the
  * dedup itself from that materialized artifact — re-deriving the
  * pair-generation pipeline per consumer multiplies the most expensive
  * stage of the whole run by the number of consumers. This object is
  * that artifact stage for a single JVM/session: the first consumer
  * derives pairs ([[NearDup.ngramJaccardPairs]]) and components
  * ([[NearDup.dupGroups]]), persists them, and every later consumer with
  * the same (corpus, shingle-n, threshold) key reads the persisted
  * tables. On a cluster the same role is played by writing the pair and
  * component tables to storage between pipeline stages; the in-session
  * memo is the local-engine equivalent.
  *
  * Consumers: q29 (pairs), q50 (components), q105 canonical keeper,
  * q109 source overlap, q119 dedup reweighting, q121 containment (the
  * threshold-independent counts core). Each remains independently
  * runnable — a cold call simply derives the artifact itself.
  *
  * Results are identical to per-query derivation by construction (the
  * memo caches the OUTPUT of the very pipeline each query ran before);
  * the oracle gates for all five consumers are unchanged.
  */
object CurationOps {

  /** The unfiltered pair-common-counts table
    * (doc_a, doc_b, size_a, size_b, n_common), the Jaccard-filtered
    * near-dup pair table (doc_a, doc_b, jaccard) and its transitive
    * components (doc_id, group_id), all persisted. `common` is the
    * threshold-independent core: Jaccard (q29 family) and containment
    * (q121) are pure projections over it. */
  final case class DupArtifact(common: DataFrame, pairs: DataFrame,
      groups: DataFrame)

  /** A trained BPE tokenizer: the merge table (driver-side scalars — the
    * learned model) and the localCheckpoint-pinned word-type table with
    * all merges applied. */
  final case class BpeModel(merges: Seq[BpeTrain.Merge], words: DataFrame)

  private final case class Key(appId: String, corpus: String, n: Int, threshold: Double)
  private final case class BpeKey(appId: String, corpus: String,
      textCol: String, rounds: Int, byteLevel: Boolean)
  private final case class KnnKey(appId: String, corpus: String, k: Int)

  private final case class Entry(artifact: DupArtifact,
      sc: org.apache.spark.SparkContext, rddIds: Set[Int])
  private final case class BpeEntry(model: BpeModel,
      sc: org.apache.spark.SparkContext, rddIds: Set[Int])
  private final case class KnnEntry(graph: DataFrame,
      sc: org.apache.spark.SparkContext, rddIds: Set[Int])

  private val memo = scala.collection.mutable.HashMap.empty[Key, Entry]
  private val bpeMemo = scala.collection.mutable.HashMap.empty[BpeKey, BpeEntry]
  private val knnMemo = scala.collection.mutable.HashMap.empty[KnnKey, KnnEntry]
  private val nDerivations = new java.util.concurrent.atomic.AtomicLong(0)
  private val nBpeDerivations = new java.util.concurrent.atomic.AtomicLong(0)
  private val nKnnDerivations = new java.util.concurrent.atomic.AtomicLong(0)
  private val nonceGen = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var pinned: Set[Int] = Set.empty

  /** How many times the pair pipeline actually ran (spec hook: N
    * consumers over one corpus must leave this at 1). */
  def derivationCount: Long = nDerivations.get

  /** How many times BPE training actually ran (spec hook, as above). */
  def bpeDerivationCount: Long = nBpeDerivations.get

  /** How many times the mutual-kNN graph was actually derived (spec
    * hook: the q123/q131/q139 family over one corpus must leave 1). */
  def knnDerivationCount: Long = nKnnDerivations.get

  /** RDD ids backing memoized artifacts — benchmark harnesses that sweep
    * query-local persisted state between queries must exempt these (the
    * artifact is cross-query state by design, like a staged table). */
  def pinnedRddIds: Set[Int] = pinned

  /** Register RDDs backing an EXTERNALLY memoized cross-query artifact
    * (e.g. the ANN exact-ranking eval fixture in CorpusQueries) with the
    * same sweep exemption as this object's own memos. */
  private[graft] def registerPinnedRdds(ids: Set[Int]): Unit =
    synchronized { pinned = pinned ++ ids }

  /** The shared pair/component artifact for `docs` (keyed by `corpusKey`
    * — the table path — plus shingle/threshold params). First call
    * derives and persists; subsequent calls in the same Spark app return
    * the resident tables. Derivation is serialized per JVM: concurrent
    * consumers (throughput benches run query streams in parallel) block
    * on the first deriver instead of racing N copies of the most
    * expensive pipeline in the engine. */
  def dupArtifact(docs: DataFrame, corpusKey: String, idCol: String,
      textCol: String, n: Int, threshold: Double): DupArtifact = {
    val sc = docs.sparkSession.sparkContext
    val key = Key(sc.applicationId, corpusKey, n, threshold)
    memo.synchronized {
      memo.getOrElseUpdate(key, {
        nDerivations.incrementAndGet()
        val before = sc.getPersistentRDDs.keySet.toSet
        // Ownership tag: a per-derivation nonce filter (optimizer folds it
        // to nothing AFTER cache lookup, so it costs zero at runtime) makes
        // the artifact's analyzed plan — and every plan derived from it
        // inside dupGroups — unique. Without it, CacheManager's
        // plan-equality dedup can alias the artifact onto a cache entry some
        // UNRELATED query left behind (same corpus, same params): the whole
        // derivation then short-circuits into third-party cached data the
        // memo doesn't own and clear() can't release — and which that
        // query's owner may unpersist underneath a live artifact.
        val nonce = nonceGen.incrementAndGet()
        // the artifact's core is the THRESHOLD-INDEPENDENT counts table;
        // Jaccard pairs and containment are projections — one
        // pair-generation pipeline feeds every similarity reading
        val common = NearDup.pairCommonCounts(
            NearDup.hashedShingles(docs, idCol, textCol, n), Int.MaxValue)
          .where(lit(nonce) === lit(nonce))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val pairs = NearDup.jaccardFromCounts(common, threshold)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // dupGroups materializes eagerly (its convergence loop runs
        // actions), which also populates the persisted pair and counts
        // blocks — the returned labels are themselves persisted by the
        // loop
        val groups = NearDup.dupGroups(pairs)
        groups.count() // settle: artifact fully resident before memoizing
        val ids = sc.getPersistentRDDs.keySet.toSet -- before
        pinned = pinned ++ ids
        Entry(DupArtifact(common, pairs, groups), sc, ids)
      }).artifact
    }
  }

  /** The shared trained-BPE artifact for `docs` — the train-once
    * counterpart of [[dupArtifact]] for the tokenizer family: training
    * (q103) runs ~3 driver-synced jobs per merge round, and tokenization
    * (q104) plus fertility reporting (q111) only need the resulting
    * merge table and word-type lookup, exactly how a production pipeline
    * trains a tokenizer once and ships the merge table to every
    * downstream tokenize pass. The word-type table is already
    * localCheckpoint-pinned by the trainer (plan-unique RDDs, so there
    * is no CacheManager plan-aliasing to defend against — contrast the
    * nonce in [[dupArtifact]]); results are identical to per-query
    * training by construction. */
  def bpeModel(docs: DataFrame, corpusKey: String, textCol: String,
      rounds: Int, byteLevel: Boolean = false): BpeModel = {
    val sc = docs.sparkSession.sparkContext
    val key = BpeKey(sc.applicationId, corpusKey, textCol, rounds, byteLevel)
    bpeMemo.synchronized {
      bpeMemo.getOrElseUpdate(key, {
        nBpeDerivations.incrementAndGet()
        val before = sc.getPersistentRDDs.keySet.toSet
        val (merges, words) =
          if (byteLevel) BpeTrain.trainBytes(docs, textCol, rounds)
          else BpeTrain.train(docs, textCol, rounds)
        val ids = sc.getPersistentRDDs.keySet.toSet -- before
        pinned = pinned ++ ids
        BpeEntry(BpeModel(merges, words), sc, ids)
      }).model
    }
  }

  /** The session-shared exact mutual-kNN graph for an embedding corpus
    * — the graph-artifact counterpart of [[dupArtifact]]: the block-grid
    * pair pass is the expensive stage, and its consumers (the edge
    * listing itself, label-propagation communities, triangle/cohesion
    * diagnostics) are cheap reads over it. Keyed by (corpus path, k);
    * the nonce tag defends against CacheManager plan-aliasing exactly as
    * in [[dupArtifact]]. */
  def knnGraph(emb: DataFrame, corpusKey: String, k: Int): DataFrame = {
    val sc = emb.sparkSession.sparkContext
    val key = KnnKey(sc.applicationId, corpusKey, k)
    knnMemo.synchronized {
      knnMemo.getOrElseUpdate(key, {
        nKnnDerivations.incrementAndGet()
        val before = sc.getPersistentRDDs.keySet.toSet
        val nonce = nonceGen.incrementAndGet()
        val g = AnnSearch.mutualKnnGraph(emb, k)
          .where(lit(nonce) === lit(nonce))
          .persist(StorageLevel.MEMORY_AND_DISK)
        g.count() // fully resident before memoizing
        val ids = sc.getPersistentRDDs.keySet.toSet -- before
        pinned = pinned ++ ids
        KnnEntry(g, sc, ids)
      }).graph
    }
  }

  /** Drop every memoized artifact and unpersist its tables (test/loop
    * hygiene — the session-long memo is the intended production shape).
    * Cache entries are removed by a CASCADING uncache from the pairs
    * plan: the components table is backed by a persist inside the
    * dupGroups loop whose entry a projection-level `DataFrame.unpersist`
    * would not reach, but its plan CONTAINS the (nonce-tagged) pairs
    * plan, so the cascade removes it — entry and storage both, leaving
    * CacheManager clean for the next derivation. The RDD-id sweep stays
    * as a backstop for loop-internal persists that are plain RDD caches
    * rather than CacheManager entries. */
  def clear(): Unit = memo.synchronized {
    memo.values.foreach { e =>
      if (!e.sc.isStopped) {
        val pairs = e.artifact.pairs
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        pairs.sparkSession.sharedState.cacheManager
          .uncacheQuery(pairs, cascade = true, blocking = false)
        e.sc.getPersistentRDDs
          .filter { case (id, _) => e.rddIds(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
    }
    memo.clear()
    bpeMemo.synchronized {
      bpeMemo.values.foreach { e =>
        if (!e.sc.isStopped)
          e.sc.getPersistentRDDs // localCheckpoint RDDs: id sweep IS the release
            .filter { case (id, _) => e.rddIds(id) }
            .values.foreach(_.unpersist(blocking = false))
      }
      bpeMemo.clear()
    }
    knnMemo.synchronized {
      knnMemo.values.foreach { e =>
        if (!e.sc.isStopped) {
          val g = e.graph.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          g.sparkSession.sharedState.cacheManager
            .uncacheQuery(g, cascade = true, blocking = false)
          e.sc.getPersistentRDDs
            .filter { case (id, _) => e.rddIds(id) }
            .values.foreach(_.unpersist(blocking = false))
        }
      }
      knnMemo.clear()
    }
    pinned = Set.empty
  }
}
