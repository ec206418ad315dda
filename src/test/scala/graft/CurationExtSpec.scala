package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnSearch, Communities, Coreset, ImportanceWeights, KMeansExact, NearDup, QualityRules, Winnow}
import graft.queries.CorpusQueries

/** Fixture specs for the round-6 curation extensions (X107–X110):
  * semantic properties the DuckDB hash gate replays but cannot explain —
  * mutuality actually dropping hub edges, importance scores ordering
  * target-like above junk, each quality rule firing on its own
  * violation, the threshold curve staying dense and monotone. */
class CurationExtSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("weighted Jaccard: boilerplate overlap discounts, rare overlap scores high") {
    // docs 0/1 share a RARE 3-shingle run; docs 2/3 share only the
    // BOILERPLATE run that appears in every document — plain Jaccard
    // scores both pairs equally, the idf weighting must separate them
    val boiler = "copyright acme corp all rights reserved"
    val rare = "quantum flux capacitor alignment notes"
    val docs = Seq(
      (0L, s"$boiler $rare alpha beta"),
      (1L, s"$boiler $rare gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta iota"),
      (3L, s"$boiler kappa lambda mu nu xi")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.NearDup.weightedJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) > pairs((2L, 3L)) * 2,
      s"rare-content overlap must outscore boilerplate overlap: $pairs")
    // unweighted Jaccard cannot separate them (same shared/total counts)
    val plain = graft.operators.NearDup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(plain((0L, 1L)) - 2 * plain((2L, 3L))) < 0.35,
      s"plain Jaccard sees similar overlap ratios: $plain")
    // symmetry of the score construction: weights are per-shingle, so
    // wjaccard is order-independent of which doc is a vs b
    assert(pairs.keys.forall { case (a, b) => a < b })
  }

  test("mutual-kNN: one-sided hub edges are dropped, mutual pairs kept") {
    // k=1 neighborhoods: A↔B are each other's nearest (mutual edge);
    // C's nearest is B and D's nearest is C, but neither is reciprocated
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // A
      (1L, Array(1.0f, 0.1f)),   // B
      (2L, Array(1.0f, 1.0f)),   // C
      (3L, Array(0.0f, 1.0f))    // D
    ).toDF("vec_id", "embedding")
    val edges = AnnSearch.mutualKnnGraph(vecs, k = 1, blocks = 2).collect()
    assert(edges.length == 1)
    val e = edges.head
    assert(e.getAs[Long]("vec_a") == 0L && e.getAs[Long]("vec_b") == 1L)
    assert(e.getAs[Long]("rnk_ab") == 1L && e.getAs[Long]("rnk_ba") == 1L)
    assert(e.getAs[Double]("sim") > 0.99)
    // at k=2 the (B,C) edge becomes mutual too: C ranks B first and B
    // ranks C second; (A,D) stays absent (orthogonal)
    val k2 = AnnSearch.mutualKnnGraph(vecs, k = 2, blocks = 2)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k2.contains((1L, 2L)) && !k2.contains((0L, 3L)))
  }

  test("importance weights: target-vocabulary raw docs outscore junk") {
    // targets establish the 'good' vocabulary; raw doc 10 reuses it,
    // raw doc 11 is disjoint junk — its buckets carry ct=0
    val docs = Seq(
      (0L, "alpha beta gamma delta alpha beta"),
      (1L, "alpha gamma epsilon beta delta"),
      (10L, "alpha beta gamma delta epsilon alpha"),
      (11L, "junk1 junk2 junk3 junk4 junk5 junk6")
    ).toDF("doc_id", "text")
    val out = ImportanceWeights.hashedRatioScores(
      docs, col("doc_id") < 10L, "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    // only the raw slice is scored
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L))
    val Array(good, junk) = out
    assert(good.getAs[Long]("n_tokens") == 6L)
    assert(good.getAs[Double]("avg_ratio") > junk.getAs[Double]("avg_ratio"),
      "target-like doc must outscore disjoint-vocab doc")
    // deterministic: identical score on recompute
    val again = ImportanceWeights.hashedRatioScores(
      docs, col("doc_id") < 10L, "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("quality rules: each rule fires on its own violation") {
    val okWords = (1 to 60).map(i => s"word$i")
    val good = (okWords ++ QualityRules.gopherStopwords).mkString(" ") + " end."
    def doc(id: Long, text: String) = (id, text)
    val docs = Seq(
      doc(0L, good),
      doc(1L, "too few words."),                                    // word count
      doc(2L, good.replace(" end.", " end")),                       // terminal punct
      doc(3L, good + " {"),                                         // brace (also punct)
      doc(4L, good.replace("word1 ", "Lorem ipsum ")),              // lorem
      doc(5L, (okWords.map(_ => "a b") ++ Seq("the", "of")).mkString(" ") + " c."), // mean wl < 3
      doc(6L, (okWords.map(w => s"#$w") ++ QualityRules.gopherStopwords).mkString(" ") + " end."), // symbols
      doc(7L, okWords.mkString(" ") + " end.")                      // no stopwords
    ).toDF("doc_id", "text")
    val r = QualityRules.report(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def f(i: Int, c: String): Long = r(i).getAs[Long](c)
    assert(f(0, "keep") == 1L, "clean doc passes all rules")
    assert(f(1, "r_word_count") == 0L && f(1, "keep") == 0L)
    assert(f(2, "r_end_punct") == 0L && f(2, "keep") == 0L)
    assert(f(3, "r_no_brace") == 0L)
    assert(f(4, "r_no_lorem") == 0L)
    assert(f(5, "r_mean_wl") == 0L)
    assert(f(6, "r_symbol") == 0L)
    assert(f(7, "r_stopwords") == 0L)
  }

  test("deterministic k-means: separable clusters converge from bad seeds") {
    // two tight clusters around (1,0) and (0,1); the k=2 lowest-id seeds
    // both sit in cluster A, so iteration must MOVE a centroid across —
    // after 2 Lloyd rounds every vector is assigned with csim ≈ 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.00f)), (1L, Array(1.0f, 0.05f)),
      (2L, Array(1.0f, 0.10f)), (3L, Array(0.05f, 1.0f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.10f, 1.0f))
    ).toDF("vec_id", "embedding")
    val asg = KMeansExact.lloyd(vecs, k = 2, iters = 2)
      .orderBy("vec_id").collect()
    val byCluster = asg.groupBy(_.getAs[Long]("centroid_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byCluster.values.toSet == Set(Set(0L, 1L, 2L), Set(3L, 4L, 5L)),
      s"clusters should separate: $byCluster")
    assert(asg.forall(_.getAs[Double]("csim") > 0.99),
      "converged centroids sit inside their tight clusters")
    // zero iterations = pure seed assignment (both seeds in cluster A):
    // the A/B split cannot exist yet
    val seedOnly = KMeansExact.lloyd(vecs, k = 2, iters = 0).collect()
      .groupBy(_.getAs[Long]("centroid_id")).keySet
    assert(seedOnly == Set(0L, 1L))
  }

  test("groupwise split: no near-dup pair straddles a split boundary") {
    val split = CorpusQueries.groupwiseSplit(spark, sf)
    val pairs = NearDup.ngramJaccardPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text",
      n = 3, threshold = 0.5)
    val straddling = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(pairs.count() > 0, "fixture should contain near-dup pairs")
    assert(straddling.count() == 0,
      "near-duplicate documents must land in the same split")
    // and the split is total: one row per document
    assert(split.count() == Tables.load(spark, sf, "documents").count())
  }

  test("label outliers: a planted mislabeled vector ranks first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 7), (1L, Array(1.0f, 0.1f), 7),
      (2L, Array(1.0f, 0.05f), 7), (3L, Array(0.0f, 1.0f), 7), // mislabeled
      (10L, Array(0.0f, 1.0f), 9), (11L, Array(0.1f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val out = AnnSearch.labelOutliers(vecs, k = 2)
      .filter(col("label") === 7 && col("rnk") === 1L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vec_id") == 3L,
      "the off-cluster member must be the top outlier of its label")
  }

  test("threshold curve: dense rows, monotone, zero-survivor kept as 0") {
    // docs 1/3 share 10 of 18 shingles (jaccard 10/26 ≈ 0.385);
    // doc 5 unrelated — so τ=0.9 survives NOTHING and must still emit
    val a = (1 to 20).map(i => s"s$i").mkString(" ")
    val b = (1 to 12).map(i => s"s$i").mkString(" ") + " " +
      (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, a), (3L, b),
      (5L, (1 to 20).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val curve = NearDup.thresholdCurve(docs, "doc_id", "text", n = 3,
        thresholds = Seq(0.3, 0.35, 0.9))
      .orderBy("threshold").collect()
    assert(curve.length == 3, "one row per threshold, always dense")
    val pairs = curve.map(_.getAs[Long]("n_pairs"))
    val docsN = curve.map(_.getAs[Long]("n_docs"))
    assert(pairs.toSeq == Seq(1L, 1L, 0L))
    assert(docsN.toSeq == Seq(2L, 2L, 0L))
    // cross-check against the direct pair operator at the low threshold
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.3).count()
    assert(pairs(0) == exact)
  }

  test("label propagation: a bridge edge does not merge communities") {
    // two triangles joined by one bridge (2–10): CC would fuse them into
    // one component, but the frequency vote keeps them apart; node 99 is
    // isolated and must keep its own label
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L).toDF("vec_id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("vec_a", "vec_b")
    val out = Communities.labelPropagation(nodes, edges, rounds = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("community"), r.getAs[Long]("n_members"))).toMap
    val comA = Set(0L, 1L, 2L).map(out(_)._1)
    val comB = Set(10L, 11L, 12L).map(out(_)._1)
    assert(comA.size == 1 && comB.size == 1, "each triangle is uniform")
    assert(comA.head != comB.head, "the bridge must not merge them")
    assert(Set(0L, 1L, 2L, 10L, 11L, 12L).forall(out(_)._2 == 3L))
    assert(out(99L) == (99L, 1L), "isolated node keeps its own label")
  }

  test("winnowing: a shared w+k-1 run is caught, gaps <= w, cap works") {
    // docs 1/2 share EXACTLY a 7-token run (= w+k-1 at k=4,w=4) inside
    // different surroundings — the paper's guarantee says at least one
    // selected fingerprint must be common; doc 3 is unrelated
    val shared = "s1 s2 s3 s4 s5 s6 s7"
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5 a6"),
      (2L, s"b1 b2 $shared b3 b4 b5 b6"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_a") == 1L &&
      pairs.head.getAs[Long]("doc_b") == 2L)
    // density guarantee: consecutive selected positions differ by <= w
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .orderBy("doc_id", "pos").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    fps.values.foreach { rows =>
      val ps = rows.map(_.getAs[Int]("pos"))
      ps.sliding(2).foreach { case Array(a, b) => assert(b - a <= 4)
                              case _ => () }
    }
    // df cap: dropping every fingerprint shared by >1 doc kills the pair
    assert(Winnow.overlapPairs(docs, "doc_id", "text", k = 4, w = 4,
      minShared = 1, dfCap = 1).count() == 0)
  }

  test("curriculum schedule: dense positions, source interleave, quality decay") {
    val sched = CorpusQueries.curriculumSchedule(spark, sf).collect()
    val n = sched.length
    assert(sched.map(_.getAs[Long]("position")).toSet == (0L until n).toSet,
      "positions are dense 0..n-1")
    // the first |sources| positions are exactly the rank-1 docs, one per
    // source — every training window starts with the full mix
    val sources = sched.map(_.getAs[String]("source")).distinct.sorted
    val head = sched.sortBy(_.getAs[Long]("position")).take(sources.length)
    assert(head.map(_.getAs[String]("source")).toSeq == sources.toSeq)
    assert(head.forall(_.getAs[Long]("rnk") == 1L))
    // within each source the schedule follows ascending rank (quality ↓)
    sched.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val byPos = rows.sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("rnk"))
      assert(byPos.toSeq == byPos.sorted.toSeq)
    }
  }

  test("cluster-balanced sample: skewed clusters contribute evenly") {
    // cluster A: 12 tight vectors near (1,0); cluster B: 3 near (0,1) —
    // a uniform sample would be ~80% A; the balanced sample takes
    // min(5, size) per cluster
    val vecs = ((0L until 12L).map(i => (i, Array(1.0f, i * 0.01f))) ++
      Seq((100L, Array(0.0f, 1.0f)), (101L, Array(0.01f, 1.0f)),
        (102L, Array(0.02f, 1.0f)))).toDF("vec_id", "embedding")
    import org.apache.spark.sql.expressions.Window
    val asg = KMeansExact.lloyd(vecs, k = 2, iters = 2)
    val sample = asg.select(col("centroid_id"), col("vec_id"),
        graft.functions.TextFunctions.md5Hash56(col("vec_id").cast("string")).as("h"))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("centroid_id").orderBy("h", "vec_id")))
      .where(col("rnk") <= 5)
    val bySize = sample.groupBy("centroid_id").count().collect()
      .map(_.getLong(1)).sorted
    assert(bySize.toSeq == Seq(3L, 5L),
      "capped at 5 for the big cluster, everything for the small one")
  }

  test("manifest: layout-invariant, a single edit localizes to one shard") {
    import graft.operators.Manifest
    val docs = (0L until 200L).map(i => (i, s"doc body number $i with words"))
      .toDF("doc_id", "text")
    val m1 = Manifest.corpusManifest(docs, "doc_id", "text", shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // identical corpus, different physical layout → identical manifest
    val m2 = Manifest.corpusManifest(
        docs.repartition(7).sortWithinPartitions(desc("text")),
        "doc_id", "text", shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(m1 == m2)
    assert(m1.keySet == (-1L until 8L).toSet)
    assert(m1(-1L)._1 == 200L)
    // mutate one document: exactly its shard and the root change
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7L, lit("TAMPERED")).otherwise(col("text")))
    val m3 = Manifest.corpusManifest(edited, "doc_id", "text", shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val changed = m1.keySet.filter(k => m1(k) != m3(k))
    assert(changed.size == 2 && changed.contains(-1L),
      s"one shard + root must differ, got $changed")
    // shard-level diff names exactly those shards; dropping every doc
    // of one shard yields only_a
    val diff = Manifest.manifestDiff(docs, edited, "doc_id", "text", shards = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff.count(_._2 == "changed") == 2 && diff(-1L) == "changed")
    assert(diff.count(_._2 == "same") == 7)
    val shardOf7 = Manifest.corpusManifest(
        docs.filter(col("doc_id") === 7L), "doc_id", "text", shards = 8)
      .filter(col("shard") >= 0).collect().head.getLong(0)
    val dropped = Manifest.manifestDiff(docs,
        docs.filter(pmod(graft.functions.TextFunctions.md5Hash56(
          col("doc_id").cast("string")), lit(8L)) =!= shardOf7),
        "doc_id", "text", shards = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dropped(shardOf7) == "only_a")
  }

  test("join preflight: estimates track exact overlap across regimes") {
    import graft.operators.Sketches
    val a = (0L until 10000L).toDF("k")
    val bHalf = (5000L until 15000L).toDF("k")   // 5000-key overlap
    val half = Sketches.joinPreflight(a, "k", bHalf, "k", k = 256).head()
    assert(half.getAs[Long]("nd_intersect") == 5000L)
    assert(half.getAs[Boolean]("est_ok"),
      s"half-overlap estimate off: ${half.getAs[Double]("est_intersect")}")
    // disjoint sets: the clamped estimate must stay a small fraction of
    // either side (KMV noise ~1/sqrt(k) of the union)
    val bFar = (20000L until 30000L).toDF("k")
    val disj = Sketches.joinPreflight(a, "k", bFar, "k", k = 256).head()
    assert(disj.getAs[Long]("nd_intersect") == 0L)
    assert(disj.getAs[Double]("est_intersect") <
      0.25 * disj.getAs[Long]("nd_a"),
      s"disjoint estimate too large: ${disj.getAs[Double]("est_intersect")}")
    // sub-k sides are exact: the sketch IS the distinct set
    val small = Sketches.joinPreflight(
      (0L until 100L).toDF("k"), "k", (50L until 150L).toDF("k"), "k",
      k = 256).head()
    assert(small.getAs[Double]("est_intersect") == 50.0)
  }

  test("decayed counts: exact 2^-h weights, >52-half-life buckets truncate") {
    import graft.operators.Decay
    val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(daysAgo: Int) =
      new java.sql.Timestamp(base.getTime - daysAgo.toLong * 86400000L)
    val events = (Seq.fill(4)(("A", ts(0))) ++ Seq.fill(2)(("A", ts(1))) ++
      Seq(("A", ts(2))) ++ Seq(("B", ts(0))) ++ Seq.fill(5)(("B", ts(60))))
      .toDF("event_type", "ts")
    val out = Decay.decayedCounts(events, "event_type", "ts", halfLifeDays = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))).toMap
    // EXACT doubles: 4 + 2/2 + 1/4; B's 60-half-life bucket is cut
    assert(out("A") == ((7L, 5.25)))
    assert(out("B") == ((6L, 1.0)))
  }

  test("triangles: K4, shared-edge triangle and pendant count exactly") {
    import graft.operators.Triangles
    // K3 {0,1,2} with pendant 3 on node 2, plus a disjoint K4 {10..13}
    val edges = (Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)) ++
      (for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)))
      .toDF("vec_a", "vec_b")
    val out = Triangles.clusteringCoefficients(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coeff")))).toMap
    assert(out(0L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((1L, 0L, 0.0)), "pendant closes nothing")
    (10L to 13L).foreach(v => assert(out(v) == ((3L, 3L, 1.0)),
      s"K4 node $v must sit in 3 triangles at coeff 1"))
  }

  test("pareto frontier: planted dominance, ties kept, layout-invariant") {
    import graft.operators.Skyline
    // a true trade-off frontier (better quality costs more tokens):
    // (10,9) (8,5) (5,2); dominated: (7,6) by (8,5), (5,3) by (5,2);
    // the exact duplicate of (8,5) must ALSO survive (ties kept)
    val rows = Seq(
      (1L, 10.0, 9L), (2L, 8.0, 5L), (3L, 5.0, 2L),
      (4L, 7.0, 6L), (5L, 5.0, 3L), (6L, 8.0, 5L)
    ).toDF("doc_id", "quality", "n_tokens")
    val f1 = Skyline.paretoFrontier(rows, "quality", "n_tokens")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(f1 == Set(1L, 2L, 3L, 6L))
    // pure function of the set: any partitioning gives the same frontier
    val f2 = Skyline.paretoFrontier(
        rows.repartition(5).sortWithinPartitions(desc("n_tokens")),
        "quality", "n_tokens")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(f2 == f1)
    // cross-check against the quadratic definition on real data
    val docs = CorpusQueries.textStats(spark, sf)
      .select(col("doc_id"), col("n_tokens"),
        col("mean_tok_len").as("quality"))
    val fast = Skyline.paretoFrontier(docs, "quality", "n_tokens")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val naive = docs.as("a").join(docs.as("b"),
        col("b.quality") >= col("a.quality") &&
        col("b.n_tokens") <= col("a.n_tokens") &&
        (col("b.quality") > col("a.quality") ||
         col("b.n_tokens") < col("a.n_tokens")), "left_anti")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("power iteration: planted dominant direction is recovered") {
    // 20 vectors spread along (3,1,0,0)/sqrt(10) with small noise in the
    // 3rd axis: pc1 must align with the planted direction, so the
    // projection ranking must follow the planted coefficient exactly
    val dir0 = Array(3.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(10.0))
    val vecs = (0 until 20).map { i =>
      val a = (i - 10).toDouble               // planted coefficient
      val noise = 0.01 * (i % 3 - 1)
      (i.toLong, Array(
        (a * dir0(0)).toFloat, (a * dir0(1)).toFloat,
        noise.toFloat, 0.0f))
    }.toDF("vec_id", "embedding")
    val out = graft.operators.PowerIteration.pc1Projection(vecs, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("pc1_score"))
      .toMap
    // alignment: scores are (anti)monotone in the planted coefficient
    val scores = (0 until 20).map(i => out(i.toLong))
    val diffs = scores.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0),
      "projections must be monotone in the planted coefficient")
    // magnitude: the extreme vectors project ~|a|·1, the middle ~0
    assert(math.abs(out(10L)) < 0.1)
    assert(math.abs(math.abs(out(0L)) - 10.0) < 0.1)
    // deterministic: recompute bit-identically
    val again = graft.operators.PowerIteration.pc1Projection(vecs, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("pc1_score"))
      .toMap
    assert((0 until 20).forall(i => again(i.toLong) == out(i.toLong)))
  }

  test("k-center greedy: picks span the clusters, coverage is local") {
    // three tight clusters on orthogonal axes; seed is the lowest id
    // (cluster A), so picks 2 and 3 must each open a NEW cluster —
    // farthest-point traversal spreads, unlike density-seeking k-means
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f)), (1L, Array(1.0f, 0.0f, 0.05f)),
      (2L, Array(0.98f, 0.02f, 0.02f)),                          // A
      (10L, Array(0.0f, 1.0f, 0.05f)), (11L, Array(0.05f, 1.0f, 0.0f)),
      (20L, Array(0.05f, 0.0f, 1.0f)), (21L, Array(0.0f, 0.05f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Coreset.kCenterGreedy(vecs, k = 3).collect()
    assert(out.length == 7)
    val centers = out.filter(!_.isNullAt(3))
      .map(r => r.getAs[Long]("sel_rank") -> r.getAs[Long]("vec_id")).toMap
    assert(centers(1L) == 0L, "seed = lowest vec_id")
    val cluster = (id: Long) => id / 10
    assert(Set(centers(1L), centers(2L), centers(3L)).map(cluster).size == 3,
      "each greedy pick opens a new cluster")
    // coverage: every vector lands on its own cluster's center
    out.foreach { r =>
      assert(cluster(r.getAs[Long]("center_id")) ==
        cluster(r.getAs[Long]("vec_id")))
      assert(r.getAs[Double]("csim") > 0.9)
    }
  }
}
