package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Casts, Dedup, Multimodal, Sessionize}

/** Property-based specs (SURVEY §5.2 item 4). Spark-backed properties run
  * a reduced case count — each case is a Spark job. */
class GraftPropertiesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, s"$name: $res")
  }

  test("lenient date parse: total over YYYY / YYYY-MM / YYYY-MM-DD, null on garbage") {
    val genDate = for {
      y <- Gen.choose(1900, 2099); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      prec <- Gen.choose(0, 2)
    } yield (y, m, d, prec)
    check("lenientDate", Prop.forAll(Gen.listOfN(20, genDate)) { specs =>
      val rows = specs.map { case (y, m, d, prec) =>
        val s = prec match {
          case 0 => f"$y%04d"
          case 1 => f"$y%04d-$m%02d"
          case _ => f"$y%04d-$m%02d-$d%02d"
        }
        val expected = prec match {
          case 0 => f"$y%04d-01-01"
          case 1 => f"$y%04d-$m%02d-01"
          case _ => f"$y%04d-$m%02d-$d%02d"
        }
        (s, expected)
      } :+ (("not-a-date", null: String))
      val out = rows.toDF("raw", "expected")
        .select(Casts.lenientDate(col("raw")).cast("string").as("got"), col("expected"))
        .collect()
      out.forall(r => r.getString(0) == r.getString(1))
    }, cases = 5)
  }

  test("keep-first dedup: deterministic, idempotent, independent of input order") {
    val genRow = for {
      k <- Gen.choose(0L, 5L); ord <- Gen.choose(0L, 100L); v <- Gen.choose(0, 999)
    } yield (k, ord, v)
    check("keepFirst", Prop.forAll(Gen.listOfN(40, genRow)) { rows =>
      val df = rows.toDF("k", "ord", "v")
      val shuffled = scala.util.Random.shuffle(rows).toDF("k", "ord", "v")
      val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("v")))
        .orderBy("k").collect().map(_.toString).toSeq
      val twiceIn = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("v")))
      val twice = Dedup.keepFirst(twiceIn, Seq("k"), Seq(col("ord"), col("v")))
        .orderBy("k").collect().map(_.toString).toSeq
      val reordered = Dedup.keepFirst(shuffled, Seq("k"), Seq(col("ord"), col("v")))
        .orderBy("k").collect().map(_.toString).toSeq
      once == twice && once == reordered
    }, cases = 8)
  }

  test("sessionization partitions events: counts conserve, gaps only between sessions") {
    val genEv = for {
      u <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 500L)
    } yield (u, t)
    check("sessions", Prop.forAll(Gen.listOfN(60, genEv)) { evs0 =>
      val evs = evs0.distinct
      val df = evs.map { case (u, t) => (u, new Timestamp(t * 1000L)) }
        .toDF("user_id", "ts")
      val gap = 30L
      val sess = Sessionize.sessions(df, "user_id", "ts", gap).collect()
      val totalEvents = sess.map(_.getAs[Long]("n_events")).sum
      val byUser = sess.groupBy(_.getAs[Long]("user_id"))
      val ordered = byUser.values.forall { ss =>
        val sorted = ss.sortBy(_.getAs[Timestamp]("session_start").getTime).toSeq
        // consecutive sessions of one user are separated by more than gap
        sorted.sliding(2).forall {
          case Seq(a, b) =>
            (b.getAs[Timestamp]("session_start").getTime -
              a.getAs[Timestamp]("session_end").getTime) > gap * 1000L
          case _ => true
        }
      }
      totalEvents == evs.size && ordered
    }, cases = 8)
  }

  test("multimodal stub decode: pure function agrees with md5 reference") {
    check("fakeDecode", Prop.forAll(Gen.listOfN(50, Gen.alphaNumStr)) { texts =>
      texts.forall { t =>
        val f = Multimodal.fakeDecode(1L, t.getBytes("UTF-8"))
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        f.checksum == hex && f.n_bytes == t.getBytes("UTF-8").length &&
          f.width >= 64 && f.width < 704 && f.height >= 64 && f.height < 544 &&
          f.n_frames >= 1 && f.n_frames <= 30
      }
    }, cases = 20)
  }

  test("Md5Hash56 kernel equals the conv(substring(md5)) formulation") {
    val genStr = Gen.listOfN(30,
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const("")))
    check("md5hash56", Prop.forAll(genStr) { strs =>
      val df = strs.toDF("s")
      val both = df.select(
        graft.functions.TextFunctions.md5Hash56(col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("ref"))
        .collect()
      both.forall(r => r.getLong(0) == r.getLong(1))
    }, cases = 5)
  }

  test("VectorAvgAgg equals per-dimension avg") {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    val genVec = Gen.listOfN(4, Gen.choose(-100.0, 100.0))
    check("vectorAvg", Prop.forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), genVec))) { rows =>
      val df = rows.map { case (k, v) => (k, v.toArray) }.toDF("k", "v")
      val fast = df.groupBy("k")
        .agg(exprColumn(graft.functions.VectorAvgAgg(
          columnExpr(col("v"))).toAggregateExpression()).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      val ref = rows.groupBy(_._1).map { case (k, vs) =>
        k -> (0 until 4).map(i => vs.map(_._2(i)).sum / vs.size)
      }
      fast.keySet == ref.keySet && fast.forall { case (k, m) =>
        m.zip(ref(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 }
      }
    }, cases = 5)
  }

  test("vec_dot is registered in SQL via extension function descriptions") {
    org.apache.spark.sql.graftsql.registerGraftFunctions(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
    // float arrays coerce through the injected casts
    val f = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(f == 3.0)
  }

  test("full kernel set is callable from SQL (scalars and aggregates)") {
    org.apache.spark.sql.graftsql.registerGraftFunctions(spark)
    // scalar kernels
    val h = spark.sql("SELECT md5_hash56('abc') AS h").head().getLong(0)
    val hRef = spark.range(1).select(
      conv(substring(md5(lit("abc")), 1, 14), 16, 10).cast("long")).head().getLong(0)
    assert(h == hRef)
    val sh = spark.sql("SELECT ngram_shingles('a b c d', 3) AS s")
      .head().getSeq[String](0)
    assert(sh.toSet == Set("a b c", "b c d"))
    // aggregate kernels resolve through the analyzer's aggregate wrapping
    spark.sql("SELECT explode(sequence(1L, 100L)) AS h").createOrReplaceTempView("hs")
    val sig = spark.sql("SELECT minhash_agg(h, 8) AS sig FROM hs").head().getSeq[Long](0)
    assert(sig.length == 8 && sig.forall(_ >= 0))
    val fp = spark.sql("SELECT simhash_agg(h, 16) AS fp FROM hs").head().getLong(0)
    assert(fp >= 0 && fp < (1L << 16))
    val avg = spark.sql(
      "SELECT vector_avg(v) AS m FROM (SELECT array(1.0D, 3.0D) AS v UNION ALL SELECT array(3.0D, 5.0D))")
      .head().getSeq[Double](0)
    assert(avg == Seq(2.0, 4.0))
    val med = spark.sql(
      "SELECT qdigest_quantile(qdigest_agg(h, 16, 64), 0.5, 16) AS med FROM hs")
      .head().getLong(0)
    // rank bound bits·n/σ = 16·100/64 = 25
    assert(math.abs(med - 50L) <= 25L, s"qdigest median of 1..100 out of bound: $med")
    // KMV bottom-k: 1..100 distinct with k=16 keeps exactly 1..16
    val kmv = spark.sql("SELECT kmv_agg(h, 16) AS sk FROM hs").head().getSeq[Long](0)
    assert(kmv == (1L to 16L))
    val vs = spark.sql(
      "SELECT vec_sum_long(v) AS s FROM (SELECT array(1L, 10L) AS v UNION ALL SELECT array(2L, 20L))")
      .head().getSeq[Long](0)
    assert(vs == Seq(3L, 30L))
    // weighted q-digest: 50 copies of 1 and 50 of 100 → median at the cut
    val wmed = spark.sql(
      """SELECT qdigest_quantile(qdigest_weighted_agg(v, c, 16, 64), 0.5, 16) AS med
         FROM (SELECT 1L AS v, 50L AS c UNION ALL SELECT 100L, 50L)""")
      .head().getLong(0)
    assert(math.abs(wmed - 1L) <= 25L || math.abs(wmed - 100L) <= 25L)
    val mm = spark.sql(
      "SELECT vec_minmax(v) AS m FROM (SELECT array(1.0D, 5.0D) AS v UNION ALL SELECT array(3.0D, 2.0D))")
      .head().getSeq[Double](0)
    assert(mm == Seq(1.0, 2.0, 3.0, 5.0), s"minmax layout [mn..,mx..]: $mm")
    // Misra–Gries: k=2 over a 2/3-heavy stream keeps the heavy item
    val mg = spark.sql(
      """SELECT misra_gries_agg(x, 2) AS cand FROM (
           SELECT CASE WHEN h % 3 < 2 THEN 'heavy' ELSE concat('t', h) END AS x
           FROM hs)""").head().getSeq[String](0)
    assert(mg.contains("heavy") && mg.length <= 2, s"mg candidates: $mg")
  }

  test("KMV buffer property: k smallest distinct values on any layout") {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    val gen = for {
      vals <- Gen.listOfN(120, Gen.choose(0L, 60L)) // dense dups
      k <- Gen.choose(2, 40)
      parts <- Gen.choose(1, 9)
    } yield (vals, k, parts)
    check("kmv", Prop.forAll(gen) { case (vals, k, parts) =>
      val got = spark.createDataset(vals).toDF("v").repartition(parts)
        .agg(exprColumn(
          graft.functions.KmvAgg(columnExpr(col("v")), k).toAggregateExpression())
          .as("sk"))
        .head().getSeq[Long](0)
      got == vals.distinct.sorted.take(k)
    })
  }

  test("SemDeDup verdicts == imperative reference on random vector corpora") {
    // reference: nearest seed centroid by cosine (ties -> lowest
    // centroid), then b is a dup iff some same-cluster a < b has
    // cos(a,b) >= threshold; dup_of = min such a
    def refSem(vecs: Seq[(Long, Array[Float])], k: Int, thr: Double)
        : Map[Long, (Long, Boolean, Long, Long)] = {
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      def cos(a: Array[Float], b: Array[Float]): Double =
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      val cents = vecs.sortBy(_._1).take(k)
      val asg = vecs.map { case (id, v) =>
        val best = cents.map { case (cid, cv) => (cos(cv, v), -cid) }.zip(cents)
          .maxBy(_._1)._2._1
        id -> best
      }.toMap
      vecs.map { case (id, v) =>
        val doms = vecs.filter { case (a, av) =>
          a < id && asg(a) == asg(id) && cos(av, v) >= thr
        }.map(_._1)
        id -> (asg(id), doms.nonEmpty,
          if (doms.isEmpty) -1L else doms.min, doms.size.toLong)
      }.toMap
    }
    val genVec = Gen.listOfN(4, Gen.choose(-5, 5)).map(_.map(_.toFloat).toArray)
      .suchThat(v => v.exists(_ != 0f))
    val genCorpus = Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, genVec))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    check("semDedup", Prop.forAll(genCorpus) { vecs =>
      val df = vecs.toDF("vec_id", "embedding")
      val got = graft.operators.AnnSearch.semDedupVerdicts(df, 3, 0.9)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toMap
      spark.sharedState.cacheManager.clearCache()
      got == refSem(vecs, 3, 0.9)
    }, cases = 6)
  }

  test("BPE training == imperative reference on random corpora") {
    // Reference implementation: per-position pair counts weighted by
    // wordcount, argmax (count desc, pair asc), greedy left-to-right
    // non-overlapping merge application — the textbook algorithm.
    def refBpe(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
      val wc = scala.collection.mutable.Map.empty[String, Long]
      texts.flatMap(_.split(' ')).filter(_.nonEmpty)
        .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
      var words: Map[String, (List[String], Long)] =
        wc.toMap.map { case (w, c) => w -> (w.toList.map(_.toString), c) }
      val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
      var r = 1
      var stop = false
      while (r <= rounds && !stop) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        words.values.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
        }
        if (pc.isEmpty) stop = true
        else {
          val ((l, rt), n) = pc.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((r, l, rt, n))
          words = words.map { case (w, (syms, c)) =>
            val merged = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
                merged += (l + rt); i += 2
              } else { merged += syms(i); i += 1 }
            }
            w -> (merged.toList, c)
          }
          r += 1
        }
      }
      out.toList
    }
    val genWord = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genCorpus = Gen.listOfN(8, Gen.listOfN(4, genWord).map(_.mkString(" ")))
    check("bpe", Prop.forAll(genCorpus) { texts =>
      val got = graft.operators.BpeTrain.train(texts.toDF("text"), "text", 3)
        ._1.map(m => (m.round, m.left, m.right, m.weight))
      got == refBpe(texts, 3)
    }, cases = 8)
  }
}
