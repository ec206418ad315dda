package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.{AnnSearch, AsOfJoin, BpeTrain, ChunkDedup, Communities, Coreset, Decay, Dedup, Winnow, ImportanceWeights, KMeansExact, Manifest, NearDup, PageRank, Percentiles, PowerIteration, Skyline, QualityRules, RangeJoin, Sampling, Sessionize, Sketches, Skew, Temporal}
import graft.sources.Sinks

/** Fluent entry point: `import graft.syntax._` puts the engine's operator
  * suite on every DataFrame, so user code reads as one pipeline:
  *
  * {{{
  *   import graft.syntax._
  *   docs.minhashLshPairs("doc_id", "text")        // near-dup candidates
  *   docs.dupGroupsFrom(pairs)                     // transitive groups
  *   events.sessions("user_id", "ts", 1800)        // gaps-and-islands
  *   corpus.shardedTo("/out", "doc_id", 1024)      // deterministic shards
  * }}}
  *
  * Thin forwarding only — semantics, scale notes and oracle coverage live
  * with the operators.
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ---- dedup ----
    def keepFirst(keys: Seq[String], order: Seq[Column]): DataFrame =
      Dedup.keepFirst(df, keys, order)

    def exactDupGroups(idCol: String, textCol: String): DataFrame =
      Dedup.exactGroups(df, idCol, textCol)

    def ngramJaccardPairs(idCol: String, textCol: String, n: Int = 3,
        threshold: Double = 0.8, dfCap: Int = Int.MaxValue): DataFrame =
      NearDup.ngramJaccardPairs(df, idCol, textCol, n, threshold, dfCap)

    def minhashLshPairs(idCol: String, textCol: String, n: Int = 3,
        numHashes: Int = 63, numBands: Int = 21,
        threshold: Double = 0.8): DataFrame =
      NearDup.minhashLshPairs(df, idCol, textCol, n, numHashes, numBands, threshold)

    def simhashPairs(idCol: String, textCol: String, maxHamming: Int = 3,
        bits: Int = 32): DataFrame =
      NearDup.simhashPairs(df, idCol, textCol, maxHamming, bits)

    /** Pigeonhole-banded hamming-≤d pairs over any (id, fingerprint)
      * table — text SimHash, image perceptual dHash, or any 64-bit
      * sketch column. `bits` has NO default on purpose: the generic
      * facade cannot know the fingerprint width, and overstating it
      * (e.g. 56 over a 32-bit simhash) makes the high pigeonhole
      * blocks all-zero — every row collides there and candidate
      * generation silently degenerates toward all-pairs (results stay
      * correct; the cliff is performance). State the width of the
      * column you pass: 56 for [[imagePerceptualHashes]] output, 32
      * for [[simhashPairs]]-family fingerprints. */
    def hammingPairs(idCol: String, fpCol: String, maxHamming: Int,
        bits: Int): DataFrame =
      NearDup.hammingPairs(df, idCol, fpCol, maxHamming, bits)

    /** aHash/dHash perceptual hashes from a (doc_id, blob) image table —
      * the decode stage of image near-dup; pair the `dhash` column with
      * [[hammingPairs]] (bits = 56). */
    def imagePerceptualHashes(batchSize: Int = 64): DataFrame =
      graft.operators.Multimodal.decodeImageHashes(df, batchSize).toDF()

    /** 56-bit acoustic fingerprints from a (doc_id, blob) PCM-16 WAV
      * table — the decode stage of audio near-dup; pair the `afp`
      * column with [[hammingPairs]] (bits = 56). */
    def audioFingerprints(batchSize: Int = 64): DataFrame =
      graft.operators.Multimodal.decodeAudioFingerprints(df, batchSize).toDF()

    /** Per-frame perceptual hashes from a (doc_id, blob) multi-frame
      * container table — the decode stage of video near-dup; encode
      * (doc_id, frame_no) into one id and pair `dhash` with
      * [[hammingPairs]] (bits = 56). */
    def frameHashes(batchSize: Int = 64): DataFrame =
      graft.operators.Multimodal.extractFrameHashes(df, batchSize).toDF()

    /** Connected components over a (doc_a, doc_b) pair table built from
      * this or any pair source. */
    def dupGroupsFrom(pairs: DataFrame, maxIters: Int = 20): DataFrame =
      NearDup.dupGroups(pairs, maxIters)

    def dedupChunks(idCol: String, textCol: String, size: Int): DataFrame =
      ChunkDedup.dedupChunks(df, idCol, textCol, size)

    /** Excise corpus-repeated spans (strided-window approximation). */
    def exciseDupSpans(idCol: String, textCol: String, win: Int = 20,
        stride: Int = 10, minCount: Int = 2): DataFrame =
      ChunkDedup.exciseDupSpans(df, idCol, textCol, win, stride, minCount)

    /** EXACT duplicate-substring excision: every position inside a
      * duplicated substring of ANY length ≥ minLen, keep-first. */
    def exciseDupSpansExact(idCol: String, textCol: String,
        minLen: Int = 8): DataFrame =
      ChunkDedup.exciseDupSpansExact(df, idCol, textCol, minLen)

    /** Idf-weighted Jaccard near-dup pairs (boilerplate discounted). */
    def weightedJaccardPairs(idCol: String, textCol: String, n: Int = 3,
        threshold: Double = 0.5, scale: Long = 1000000L,
        dfCap: Int = Int.MaxValue): DataFrame =
      NearDup.weightedJaccardPairs(df, idCol, textCol, n, threshold, scale, dfCap)

    /** Byte-level BPE training (UTF-8-byte hex symbols). */
    def trainBpeBytes(textCol: String, rounds: Int)
        : (Seq[BpeTrain.Merge], DataFrame) =
      BpeTrain.trainBytes(df, textCol, rounds)

    /** JSONL export with a per-shard Merkle line manifest; at scale cap
      * data files (`maxLinesPerFile`) and compress (`"gzip"`/`"zstd"`) —
      * shard = verification granularity, file = I/O granularity. */
    def exportJsonlTo(outDir: String, idCol: String, numShards: Int,
        maxLinesPerFile: Long = 0L,
        compression: Option[String] = None): DataFrame =
      Sinks.exportJsonl(df, outDir, idCol, numShards,
        maxLinesPerFile = maxLinesPerFile, compression = compression)

    /** Dedup threshold calibration curve (pairs/docs surviving per τ). */
    def dedupThresholdCurve(idCol: String, textCol: String, n: Int,
        thresholds: Seq[Double]): DataFrame =
      NearDup.thresholdCurve(df, idCol, textCol, n, thresholds)

    /** Winnowed fingerprints (Schleimer '03 rightmost-min selection). */
    def winnowFingerprints(idCol: String, textCol: String, k: Int = 4,
        w: Int = 4): DataFrame =
      Winnow.fingerprints(df, idCol, textCol, k, w)

    /** Doc pairs sharing ≥ minShared winnowed fingerprints (local
      * shared-run detector). */
    def winnowOverlapPairs(idCol: String, textCol: String, k: Int = 4,
        w: Int = 4, minShared: Long = 2,
        dfCap: Int = Int.MaxValue): DataFrame =
      Winnow.overlapPairs(df, idCol, textCol, k, w, minShared, dfCap)

    /** DSIR-style hashed importance scores for the non-target slice. */
    def importanceScores(isTarget: Column, idCol: String, textCol: String,
        buckets: Int = 4096): DataFrame =
      ImportanceWeights.hashedRatioScores(df, isTarget, idCol, textCol, buckets)

    /** Merkle-style corpus integrity manifest (per-shard + root). */
    def corpusManifest(idCol: String, textCol: String,
        shards: Int = 64): DataFrame =
      Manifest.corpusManifest(df, idCol, textCol, shards)

    /** Shard-level manifest diff vs another corpus copy. */
    def manifestDiff(other: DataFrame, idCol: String, textCol: String,
        shards: Int = 64): DataFrame =
      Manifest.manifestDiff(df, other, idCol, textCol, shards)

    /** C4/Gopher rule-filter report (per-rule verdicts + keep). */
    def qualityRuleReport(idCol: String, textCol: String): DataFrame =
      QualityRules.report(df, idCol, textCol)

    /** Learn `rounds` BPE merges from this corpus's `textCol`. */
    def bpeTrain(textCol: String, rounds: Int): (Seq[BpeTrain.Merge], DataFrame) =
      BpeTrain.train(df, textCol, rounds)

    // ---- similarity search (this = corpus with vec_id/embedding) ----
    def cosineNearDupPairs(threshold: Double): DataFrame =
      AnnSearch.cosineNearDupPairs(df, threshold)

    def bruteForceTopK(queries: DataFrame, k: Int): DataFrame =
      AnnSearch.bruteForceTopK(queries, df, k)

    def ivfTopK(queries: DataFrame, k: Int, numCentroids: Int,
        nProbe: Int): DataFrame =
      AnnSearch.ivfTopK(queries, df, k, numCentroids, nProbe)

    def lshTopK(queries: DataFrame, k: Int, numTables: Int = 8,
        planesPerTable: Int = 8, dim: Int = -1): DataFrame =
      AnnSearch.lshTopK(queries, df, k, numTables, planesPerTable, dim)

    /** SemDeDup keeper verdicts (cluster-then-compare semantic dedup). */
    def semDedup(numClusters: Int, threshold: Double): DataFrame =
      AnnSearch.semDedupVerdicts(df, numClusters, threshold)

    /** Exact mutual-kNN graph over this embedding corpus. */
    def mutualKnnGraph(k: Int, blocks: Int = 16): DataFrame =
      AnnSearch.mutualKnnGraph(df, k, blocks)

    /** Deterministic (oracle-exact) Lloyd k-means codebook training. */
    def kmeansAssign(k: Int, iters: Int): DataFrame =
      KMeansExact.lloyd(df, k, iters)

    /** Deterministic k-center greedy coreset (farthest-point picks +
      * nearest-center coverage). */
    def kCenterCoreset(k: Int): DataFrame =
      Coreset.kCenterGreedy(df, k)

    /** Label-propagation communities over this corpus's mutual-kNN
      * graph (synchronous frequency-vote rounds, min-label ties). */
    def knnCommunities(k: Int, rounds: Int): DataFrame =
      Communities.labelPropagation(df.select("vec_id"),
        AnnSearch.mutualKnnGraph(df, k).select("vec_a", "vec_b"), rounds)

    /** Projection onto the corpus's top principal direction
      * (power-iteration, engine-exact). */
    def pc1Projection(dim: Int = 64, iters: Int = 8): DataFrame =
      PowerIteration.pc1Projection(df, dim, iters)

    /** Per-label bottom-k cosine outliers (mislabeled-data sweep);
      * this = labeled embedding corpus. */
    def labelOutliers(k: Int): DataFrame =
      AnnSearch.labelOutliers(df, k)

    /** Prototypicality pruning verdicts (drop the easiest
      * 1/dropDenom of each semantic cluster). */
    def prototypicality(numClusters: Int, dropDenom: Int = 5): DataFrame =
      AnnSearch.prototypicality(df, numClusters, dropDenom)

    /** Top-k most similar DIFFERENT-label vectors per query
      * (contrastive hard negatives); this = labeled corpus. */
    def hardNegatives(queries: DataFrame, k: Int): DataFrame =
      AnnSearch.hardNegatives(queries, df, k)

    /** Ingest-time near-dup verdicts for this NEW batch against an
      * indexed corpus (no self-join, no history rescan). */
    def incrementalNearDupAgainst(index: DataFrame, idCol: String,
        textCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame =
      NearDup.incrementalDedupVerdicts(df, index, idCol, textCol, n, threshold)

    // ---- time series ----
    def asOfJoinLeft(right: DataFrame, key: String, leftTs: String,
        rightTs: String, payload: Seq[String], tieBreak: String): DataFrame =
      AsOfJoin.asOfLeft(df, right, key, leftTs, rightTs, payload, tieBreak)

    def priorWindowJoin(right: DataFrame, key: String, leftTs: String,
        rightTs: String, windowSeconds: Long, payload: Seq[String]): DataFrame =
      RangeJoin.priorWindowJoin(df, right, key, leftTs, rightTs, windowSeconds, payload)

    /** Banded interval-overlap join (closed intervals, exactly-once). */
    def intervalOverlapJoin(right: DataFrame, key: String, lStart: String,
        lEnd: String, rStart: String, rEnd: String, bandSeconds: Long,
        payload: Seq[String]): DataFrame =
      RangeJoin.intervalOverlapJoin(df, right, key, lStart, lEnd, rStart,
        rEnd, bandSeconds, payload)

    def sessions(userCol: String, tsCol: String, gapSeconds: Long): DataFrame =
      Sessionize.sessions(df, userCol, tsCol, gapSeconds)

    /** 2-D Pareto frontier (maximize xCol, minimize yCol). */
    def paretoFrontier(xCol: String, yCol: String): DataFrame =
      Skyline.paretoFrontier(df, xCol, yCol)

    /** Grid-cell-banded radius self-join over non-negative integer
      * 2-D points (exact L2; each pair emits exactly once). */
    def radiusSelfJoin(id: String, x: String, y: String,
        radius: Long): DataFrame =
      operators.Spatial.radiusSelfJoin(df, id, x, y, radius)

    /** First-order Markov transition matrix (ordered per-key lag;
      * exact-ratio p_ppm). */
    def markovTransitions(key: String, typeCol: String,
        orderCols: Seq[Column]): DataFrame =
      operators.Markov.transitions(df, key, typeCol, orderCols)

    // ---- aggregation helpers ----
    def exactPercentiles(key: String, value: String,
        ps: Seq[(String, Double)]): DataFrame =
      Percentiles.exact(df, key, value, ps)

    def saltedCollectSet(key: String, value: String, salts: Int): DataFrame =
      Skew.saltedCollectSet(df, key, value, salts)

    /** this = skewed fact side; `dim` replicated `salts` ways. */
    def saltedJoin(dim: DataFrame, key: String, salts: Int): DataFrame =
      Skew.saltedJoin(df, dim, key, salts)

    /** Half-life-decayed counts per key (engine-exact 2^-h weights). */
    def decayedCounts(key: String, tsCol: String,
        halfLifeDays: Int = 7): DataFrame =
      Decay.decayedCounts(df, key, tsCol, halfLifeDays)

    /** KMV sketch join preflight vs `other` (cardinalities, overlap). */
    def joinPreflight(other: DataFrame, thisKey: String, otherKey: String,
        k: Int = 256): DataFrame =
      Sketches.joinPreflight(df, thisKey, other, otherKey, k)

    // ---- deterministic sampling ----
    def deterministicSample(idCol: String, rate: Double): DataFrame =
      Sampling.deterministicSample(df, idCol, rate)

    def stratifiedSample(stratumCol: String, idCol: String,
        rates: Map[String, Double], defaultRate: Double): DataFrame =
      Sampling.stratifiedSample(df, stratumCol, idCol, rates, defaultRate)

    def approxDistinct(key: String, value: String): DataFrame =
      Sketches.approxDistinct(df, key, value)

    def exactWeightedPercentiles(key: String, value: String, cnt: String,
        ps: Seq[(String, Double)]): DataFrame =
      Percentiles.exactWeighted(df, key, value, cnt, ps)

    def kmvDistinctChecked(key: String, hashCol: String, k: Int = 64,
        tol: Double = 0.35): DataFrame =
      Sketches.kmvDistinctChecked(df, key, hashCol, k, tol)

    // ---- versioning / graph ----
    /** this = older snapshot; classifies every id vs `newer`. */
    def snapshotDiffAgainst(newer: DataFrame, idCol: String,
        contentCol: String): DataFrame =
      Temporal.snapshotDiff(df, newer, idCol, contentCol)

    /** this = weighted edge list (src, dst, w). */
    def pageRank(iters: Int = 10, damping: Int = 85): DataFrame =
      PageRank.weighted(df, iters, damping)

    /** this = undirected edge list (vec_a, vec_b): fixed-round k-truss
      * peel — (edge, removed_round, final_support). */
    def ktrussPeel(k: Int, rounds: Int): DataFrame =
      operators.Truss.peel(df, k, rounds)

    // ---- layout sinks ----
    def shardedTo(outDir: String, idCol: String, numShards: Int): Unit =
      Sinks.writeSharded(df, outDir, idCol, numShards)

    def clusteredTo(outDir: String, clusterCols: Seq[String],
        numFiles: Int): Unit =
      Sinks.writeClustered(df, outDir, clusterCols, numFiles)
  }
}
