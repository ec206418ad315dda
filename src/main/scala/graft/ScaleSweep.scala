package graft
import org.apache.spark.sql.SparkSession

/** Scaling-exponent probe: run the data-dominated queries at every
  * local SF (sf0.001 / sf0.01 / sf0.1 — 100× data spread) and report
  * the fitted per-decade growth, `slope = log10(t_hi/t_lo)` between
  * adjacent SFs.
  *
  * Reading the slope at local scale:
  *  - ~0.0  — job-floor-bound: wall-clock is scheduling, not data; the
  *    query says nothing about scaling yet (most of the suite at
  *    sf≤0.01 — and why the sequential suite total is a floor count,
  *    not a throughput measure, BASELINE.md).
  *  - ~0.3-1.0 at the largest step — work grows at most linearly in
  *    input; the partition-parallel design point.
  *  - >1.3 sustained at the largest step — superlinear growth a 100×
  *    scale-up would amplify; a quadratic candidate-gen stage would
  *    show ~2.0 here. Anything in this band is a design bug to fix,
  *    not a constant to tune.
  *
  * The probe measures the 0.01→0.1 slope where data first dominates
  * the floor; the 0.001→0.01 column is reported for completeness but
  * is floor-noise for most queries. min-of-2 per point (same
  * scheduling-lottery argument as Bench's min-of-3, at probe cost).
  *
  * Round 12 adds an SF1 RUNG for the top-slope rows: a 10×-replicated
  * sf0.1 corpus ([[Tables.stageScaled]] — structure-preserving, staged
  * once under target/) extends the spread to 1000×, and those rows'
  * slopes are normalized by OUTPUT ROWS (slope_tpo = slope_t −
  * slope_out, the per-decade growth of time per output row), so
  * "output-bound" is a computed verdict. Disable with
  * SPARK_GRAFT_SWEEP_SF1=0, or pass a comma list to override the set.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // data-dominated subset: every query whose r4/r5 bench cost is not
    // pure job floor — dedup pair-gen, ANN, sketches, rank machinery,
    // iterative graph, streaming ingest, curation composition
    val defaults = Seq(
      "q25_text_stats", "q29_ngram_jaccard", "q30_minhash_lsh",
      "q32_simhash_pairs", "q33_embed_neardup", "q35_ann_ivf_topk",
      "q47_percentiles", "q48_tfidf", "q49_ann_lsh_topk", "q50_dup_groups",
      "q57_decontaminate", "q67_chunk_dedup", "q78_setsim_join",
      "q80_quantile_sketch", "q82_curate", "q84_bigram_lm",
      "q91_equidepth_hist", "q93_quantize_int8", "q94_token_pagerank",
      "q101_pq_ann", "q102_span_excise", "q106_semdedup",
      "q107_incremental_neardup", "q121_containment", "q123_mutual_knn",
      "q124_dsir_weights", "q127_kmeans",
      // round-6 late additions with data-dominated stages
      "q130_kcenter_coreset", "q131_knn_communities", "q132_winnow_overlap",
      "q136_pc1_projection", "q138_pareto", "q139_knn_triangles",
      // round-6 session-2 additions: chunk/df aggs, HITS rounds,
      // blocked fuzzy candidates, grid CDFs, k-core rounds
      "q143_boilerplate", "q145_token_hits", "q150_fuzzy_linkage",
      "q154_ks_drift", "q162_kcore",
      // round-7 additions: exact substring excision, weighted Jaccard,
      // 6-table star join, byte-BPE budget, equi-width histogram
      "q181_substring_dedup", "q186_equiwidth_hist",
      "q189_weighted_jaccard", "q190_star_join", "q191_bpe_budget",
      // round-8 closure of the >1 s non-sweep gap (VERDICT r7 item 7):
      // every bench entry above ~0.9 s now has a sweep row — the
      // rank-riding winsorized clamp, the JSONL export+manifest sink,
      // multi-probe ANN, int8 calibration, vocab growth, and the
      // streaming near-dup drain (swept as its bench face: per-SF cost
      // is dominated by the micro-batch data volume; stream startup is
      // the same fixed cost at every SF so the slope still reads data
      // growth)
      "q120_streaming_neardup", "q158_clipped_quantize",
      "q161_winsorized", "q168_vocab_growth", "q169_ann_multiprobe",
      "q178_nest_export",
      // round-8 additions: Q21-shape single-scan rewrite, two-fact-path
      // pre-agg join, audio codec gate
      "q192_audio_features", "q193_waiting_supplier", "q194_two_fact_paths",
      // round-8 session-2: the six canonical subquery shapes (Q2, Q18,
      // Q22, Q11, Q15, Q20 rewrites) — each is a fact agg + scalar/semi
      // machinery whose slope proves the decorrelated plan carries the
      // data growth, not the correlation
      "q195_small_qty_revenue", "q196_min_cost_supplier",
      "q197_large_qty_orders", "q198_dormant_customers",
      "q199_value_share", "q200_top_revenue_supplier", "q201_excess_stock",
      "q202_cube_aggs", "q203_order_count_hist", "q204_volume_shipping",
      // round-9: image perceptual-hash near-dup (per-doc PNG synth +
      // raster decode + banding — the heaviest per-row stage in the
      // suite) and the NULL-semantics census joins
      "q205_image_phash", "q206_image_neardup",
      "q207_notin_null_census", "q208_nullsafe_join",
      "q209_frame_sample", "q211_supplier_count_by_part",
      "q212_banded_revenue",
      // round-10: the real resize (decode+decimate+re-encode+re-decode
      // — was the one bench row absent from the sweep), the fused
      // two-hash near-dup (double banding pass), and the probe-side
      // NOT-IN census join
      "q210_blob_resize", "q213_notin_probe_null",
      "q214_image_neardup_fused", "q215_audio_neardup",
      "q216_spatial_radius", "q217_markov_transitions", "q218_ktruss",
      "q219_privacy_census",
      // round-11 growth toward the full data-dominated surface: every
      // remaining bench row whose floor-adjusted excess exceeded 0.3 s
      // in the committed r11 artifact (BENCH_LOCAL_r11_tpAB_scoped) —
      // the mechanical inclusion criterion; what stays out is listed,
      // with the reason, in the artifact's `excluded` map
      "q01_pricing_summary", "q06_window_lag", "q07_dedup_keepfirst",
      "q21_join_agg_time", "q27_quality_score", "q40_asof_join",
      "q42_sessionize", "q44_approx_distinct", "q55_salted_join",
      "q58_repetition", "q62_spotify_q1", "q66_rank_topk", "q68_scd2",
      "q70_bloom_semi", "q76_funnel", "q81_inverted_index",
      "q83_bm25_topk", "q86_gram_matrix", "q89_mad_outliers",
      "q92_novelty", "q96_corpus_profile", "q98_distribution_drift",
      "q111_tokenizer_fertility", "q113_collocations",
      "q115_cluster_purity", "q117_vocab_coverage", "q118_temperature_mix",
      "q122_standardize", "q125_rule_filter", "q126_dedup_sweep",
      "q135_curriculum", "q144_heavy_hitters", "q147_silhouette",
      "q155_consistent_hash", "q157_pseudonymize", "q159_kfold",
      "q170_span_corruption", "q175_attribution", "q176_als_alternation",
      "q177_rolling_range", "q179_topk_other", "q182_rollup",
      "q184_json_props",
      // round-11 new surface: the schema-drift merged read (staging is
      // memoized per (app, dir) — the warmup pays it, the timed reps
      // measure the footer-union read itself)
      "q220_schema_drift",
      // round-12 new surface: the widened (single declared-schema scan)
      // read, the deliberate SortMergeJoin regime — the one join row
      // whose exchanges carry both sides, exactly what must scale
      // linearly — and the epoch-pruned read (slope reads the PRUNED
      // slice's growth; pruning itself is planning-time metadata)
      "q221_widened_drift", "q222_bigdim_join", "q223_drift_prune",
      // round-13 new surface: the nested and drop drift faces (merged
      // reads like q220 — the slope reads the footer-union + scan
      // growth) and the skewed hot-key join (3/4 of the fact on one
      // key at every SF — the slope proves the hot key's growth stays
      // linear through the broadcast join + partial agg)
      "q224_nested_drift", "q225_drop_drift", "q226_skewed_bigdim")
    val names = if (args.nonEmpty) args.toSeq else defaults
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Query-local cached state is swept between runs, but the
    // session-shared CurationOps artifacts (near-dup pairs, BPE model,
    // kNN graph) are memoized with localCheckpoint-pinned RDDs whose
    // memo entries survive the sweep — destroying their blocks while
    // the memo still points at them turns every later reuse into
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (the r8 sweep's q191/q120
    // aborts). Same exemption contract as Bench.sweep: anything
    // persisted BEFORE the timing loop plus CurationOps.pinnedRddIds
    // (read per sweep — the memo grows as queries first touch it).
    val preloopPinned = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def sweep(): Unit = {
      val keep = preloopPinned ++ graft.operators.CurationOps.pinnedRddIds
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
    }

    def timeOne(name: String, dir: String): (Double, Boolean) = {
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        // A failed run must NOT masquerade as a fast run: record the
        // failure and surface it in the row + summary line. (Runs stay
        // independent — one bad query doesn't kill the sweep.)
        val failed =
          try {
            SparkEntry.queries(name)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            false
          } catch { case e: Throwable =>
            println(s"[sweep] FAIL $name @ $dir: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(200))
            true
          }
        sweep()
        ((System.nanoTime() - t0) / 1e9, failed)
      }
      val w = once() // warmup (JIT + codegen cache for this plan shape)
      val a = once(); val b = once()
      (math.min(a._1, b._1), w._2 || a._2 || b._2)
    }

    val rows = names.map { n =>
      val timed = sfs.map(timeOne(n, _))
      val ts = timed.map(_._1)
      val anyFail = timed.exists(_._2)
      val slopes = ts.sliding(2).map { case Seq(a, b) =>
        math.log10(math.max(b, 1e-3) / math.max(a, 1e-3))
      }.toSeq
      println(f"[sweep] $n%-28s ${ts.map(t => f"$t%7.2f").mkString(" ")}  " +
        f"slope001_01=${slopes.head}%5.2f  slope01_1=${slopes(1)}%5.2f" +
        (if (anyFail) "  **FAILED**" else ""))
      (n, ts, slopes, anyFail)
    }
    // THE SF1 RUNG (round 12, VERDICT r11 item 5): a 1000× spread
    // separates output growth from compute growth where 100× can't.
    // The top-slope rows also run at a 10×-replicated sf0.1 corpus
    // (Tables.stageScaled — structure-preserving replication, staged
    // once under target/, memoized on disk), and their slope is
    // NORMALIZED BY OUTPUT ROWS: slope_tpo = slope_t − slope_out is
    // the per-decade growth of time PER OUTPUT ROW, so "output-bound"
    // becomes a computed verdict instead of a scaladoc claim. The flag
    // for this rung is superlinear-in-time-per-output:
    // slope_t > 1.3 AND slope_tpo > 0.3.
    val sf1Defaults = Seq(
      "q01_pricing_summary", "q07_dedup_keepfirst", "q21_join_agg_time",
      "q30_minhash_lsh", "q32_simhash_pairs", "q33_embed_neardup",
      "q42_sessionize", "q55_salted_join", "q66_rank_topk", "q68_scd2",
      "q80_quantile_sketch", "q177_rolling_range", "q178_nest_export",
      "q184_json_props", "q202_cube_aggs", "q222_bigdim_join",
      // round-13 (VERDICT r12 item 2): the iterative-graph family —
      // rounds×joins behavior is exactly what 100× scale stresses
      // (per-round exchange growth, lineage-cut cost, fixed job floors
      // amortizing over growing edge volume), so each fixed-point /
      // peeling operator gets its own sf1 row with an output-normalized
      // verdict instead of a scaladoc claim
      "q94_token_pagerank", "q145_token_hits", "q162_kcore",
      "q218_ktruss", "q130_kcenter_coreset", "q131_knn_communities",
      // round-14 (VERDICT r13 item 6): the recall-gated ANN rows —
      // recall is DENSITY-dependent (bucket occupancy and probe
      // coverage change with corpus size), so the 0.01→0.1 verdict
      // doesn't transfer to 10×; each row re-runs its built-in
      // recall@5 gate at sf1 and the verdict lands in the artifact
      "q35_ann_ivf_topk", "q49_ann_lsh_topk", "q169_ann_multiprobe",
      // round-14: the prefix-sum admission rows (q69 = the bare device,
      // q82 = the device at the end of the curation chain) — the
      // two-phase rewrite's claim is exactly a scale claim, so it gets
      // a 1000×-spread row instead of a scaladoc argument (q191 rides
      // the same device over q82's BPE-joined stream; rung kept lean)
      "q69_token_budget", "q82_curate",
      // round-13: the skewed hot-key join at 1000× spread — the planted
      // hot key carries 3/4 of the fact at every SF, so a linear slope
      // here is the hot-key story holding at scale
      "q226_skewed_bigdim")
    val sf1Conf = sys.env.getOrElse("SPARK_GRAFT_SWEEP_SF1", "")
    val sf1Names: Seq[String] =
      if (sf1Conf == "0") Nil
      else if (sf1Conf.nonEmpty)
        sf1Conf.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      // under an explicit CLI query list, the rung follows the list (an
      // iteration run shouldn't pay the default 16-row sf1 pass)
      else if (args.nonEmpty) sf1Defaults.filter(names.contains)
      else sf1Defaults
    final case class Sf1Row(t: Double, outs: Seq[Long], slopeT: Double,
      slopeOut: Double, fail: Boolean,
      recall: Option[(Long, Long, Boolean)] = None)
    val sf1Rows: Seq[(String, Sf1Row)] = if (sf1Names.isEmpty) Nil else {
      val sf1Dir = new java.io.File("target/sweep-sf1").getAbsolutePath
      println(s"[sweep] staging 10x sf0.1 corpus under $sf1Dir (memoized)")
      Tables.stageScaled(spark, sfs.last, sf1Dir, factor = 10)
      // denominator timings come only from CLEAN main-sweep rows: a
      // failed sf0.1 run's wall-clock is a fast abort, and using it as
      // the slope denominator would inflate slope_t — the same
      // masquerade the main sweep excludes failed rows for. Rows
      // without a clean point are re-timed below, with the re-time's
      // own fail flag propagated into the rung row.
      val t01ByName = rows.filter(!_._4).map(r => r._1 -> r._2.last).toMap
      sf1Names.map { n =>
        val (t1, fail0) = timeOne(n, sf1Dir)
        // a rung query outside the main sweep (explicit
        // SPARK_GRAFT_SWEEP_SF1 list) has no sf0.1 point — TIME it
        // rather than let a NaN slope silently suppress the flag this
        // rung exists to raise
        // output rows at each rung (untimed): count() executes the full
        // aggregation/join plan; only the final ordering can be elided,
        // which doesn't change the row count being measured
        val outs = (sfs.drop(1) :+ sf1Dir).map { d =>
          try SparkEntry.queries(n)(spark, d).count()
          catch { case _: Throwable => -1L }
        }
        sweep()
        val (t01, t01Fail) = t01ByName.get(n) match {
          case Some(t) => (t, false)
          case None    => timeOne(n, sfs.last)
        }
        val fail = fail0 || t01Fail
        val slopeT = math.log10(math.max(t1, 1e-3) / math.max(t01, 1e-3))
        // slope_out at the SAME 0.1→1 step as slopeT (outs carries the
        // 0.01 rung too, for the artifact's record)
        val slopeOut =
          if (outs.forall(_ > 0))
            math.log10(outs(2).toDouble / outs(1).toDouble)
          else Double.NaN
        // recall-gated rows (q35/q49/q169) carry their own verdict
        // columns (n_queries, k, recall_ok — the gate deliberately does
        // NOT expose the float mean, CorpusQueries.recallGate): re-read
        // the verdict at the sf1 rung — recall is density-dependent
        // (bucket occupancy, probe coverage), so the 0.01→0.1 verdict
        // doesn't transfer. A capture failure here must be LOUD: a
        // swallowed exception would report "0 recall rows failing"
        // while checking nothing.
        val (recall, recallErr): (Option[(Long, Long, Boolean)], Boolean) =
          scala.util.Try {
            val res = SparkEntry.queries(n)(spark, sf1Dir)
            if (!res.columns.contains("recall_ok")) None
            else {
              val r = res.collect().head
              sweep()
              Some((r.getAs[Long]("n_queries"), r.getAs[Long]("k"),
                r.getAs[Boolean]("recall_ok")))
            }
          } match {
            case scala.util.Success(v) => (v, false)
            case scala.util.Failure(e) =>
              println(s"[sweep] RECALL CAPTURE FAILED $n: " +
                s"${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).take(200))
              (None, true)
          }
        val failAll = fail || recallErr
        println(f"[sweep] $n%-28s sf1=$t1%7.2f  slope01_1=$slopeT%5.2f  " +
          f"out=${outs.mkString("/")}  slope_out=$slopeOut%5.2f" +
          recall.fold("") { case (nq, k, ok) =>
            s"  recall@$k over $nq queries: ${if (ok) "OK" else "**RECALL FAIL**"}" } +
          (if (failAll) "  **FAILED**" else ""))
        n -> Sf1Row(t1, outs, slopeT, slopeOut, failAll, recall)
      }
    }
    // a failed run's wall-clock is garbage (a fast abort at sf0.1 would
    // fake a NEGATIVE slope and suppress the very flag it should raise),
    // so failed rows are EXCLUDED from the slope gate and reported as
    // their own category — the artifact row keeps err:true
    val risky = rows.filter(r => !r._4 && r._3.last > 1.3)
    val failed = rows.filter(_._4)
    println("[sweep] per-decade slope at the 0.01->0.1 step; " +
      s"${risky.size} queries above the 1.3 superlinear flag" +
      (if (risky.nonEmpty) ": " + risky.map(_._1).mkString(", ") else "") +
      s"; ${failed.size} queries with failed runs (excluded from the slope gate)" +
      (if (failed.nonEmpty) ": " + failed.map(_._1).mkString(", ") else ""))
    val risky1 = sf1Rows.filter { case (_, r) =>
      !r.fail && r.slopeT > 1.3 &&
        (r.slopeOut.isNaN || r.slopeT - r.slopeOut > 0.3)
    }
    val recallFail = sf1Rows.filter(_._2.recall.exists(!_._3))
    if (sf1Rows.nonEmpty)
      println(s"[sweep] sf1 rung (${sf1Rows.size} rows at the 0.1->1 step, " +
        "output-normalized): " +
        s"${risky1.size} above the superlinear-in-time-per-output flag" +
        (if (risky1.nonEmpty) ": " + risky1.map(_._1).mkString(", ") else "") +
        s"; ${recallFail.size} recall-gated rows failing their gate at sf1" +
        (if (recallFail.nonEmpty) ": " + recallFail.map(_._1).mkString(", ")
         else ""))
    val qs = rows.map { case (n, ts, sl, fail) =>
      "\"" + n.takeWhile(_ != '_') + "\":{\"t\":[" +
        ts.map(t => f"$t%.3f").mkString(",") + "],\"slope\":" +
        f"${sl.last}%.3f" + (if (fail) ",\"err\":true" else "") + "}"
    }.mkString("{", ",", "}")
    // What ISN'T swept, and why — explicit in the artifact so "zero
    // flags" can never silently mean "didn't look". The inclusion
    // criterion is mechanical: a row joins the sweep once its
    // floor-adjusted excess (t − nJobs·floor, BENCHING.md) exceeds
    // 0.3 s in a committed bench artifact; below that, wall-clock IS
    // the per-job scheduling floor and a slope would read the
    // scheduler, not the data (the ~0.0-slope band documented above).
    val exReasons = Map(
      "q00_counts" -> ("the floor canary itself: ~11 no-work jobs by " +
        "construction, BENCHING.md"))
    // ASCII only: the artifact line passes through the JVM's default
    // console charset, which mangles non-ASCII punctuation
    val floorReason = "floor-bound at local SF: floor-adjusted excess " +
      "<= 0.3 s in the committed bench artifact (BENCH_LOCAL_r12_*); " +
      "wall-clock is per-job scheduling floor, a slope would read the " +
      "scheduler, not data growth"
    // provenance honesty (round-11 ADVICE): when the query list came
    // from explicit CLI args, absence means "not requested", not
    // "floor-bound" — the floor claim is only true for the default set
    val excluded = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(names.contains)
      .map(n => "\"" + n + "\":\"" + (
        if (args.nonEmpty) "not requested (explicit query list)"
        else exReasons.getOrElse(n, floorReason)) + "\"")
      .mkString("{", ",", "}")
    def jd(v: Double): String =
      if (v.isNaN || v.isInfinite) "null" else f"$v%.3f"
    val sf1Json = sf1Rows.map { case (n, r) =>
      val tpo = r.slopeT - r.slopeOut
      "\"" + n.takeWhile(_ != '_') + "\":{\"t\":" + jd(r.t) +
        ",\"out\":[" + r.outs.mkString(",") + "]" +
        ",\"slope_t\":" + jd(r.slopeT) +
        ",\"slope_out\":" + jd(r.slopeOut) +
        ",\"slope_tpo\":" + jd(tpo) +
        // output_bound means "the TIME growth is explained by OUTPUT
        // growth": requires real time growth (floor-bound rows with
        // growing output are floor-bound, not output-bound) and a
        // time-per-output slope inside floor noise — by construction
        // mutually exclusive with the superlinear-in-time-per-output
        // flag (which requires tpo > 0.3)
        ",\"output_bound\":" +
          (!r.slopeOut.isNaN && r.slopeT >= 0.3 &&
            r.slopeT - r.slopeOut <= 0.3) +
        r.recall.fold("") { case (nq, k, ok) =>
          ",\"n_queries\":" + nq + ",\"recall_k\":" + k +
            ",\"recall_ok\":" + ok } +
        (if (r.fail) ",\"err\":true" else "") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_sweep","sfs":["0.001","0.01","0.1"],""" +
      s""""queries":$qs,"sf1_factor":10,"sf1":$sf1Json,""" +
      s""""excluded":$excluded}""")
    spark.stop()
  }
}
