package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Contamination, Packing, RowIds}

/** Specs for the round-3 pipeline operators: decontamination, sequence
  * packing, contiguous row ids, repetition filters, domain mix — the
  * properties the hash oracle can't express (brute-force equivalence,
  * sequential-replay equality, stability under repartitioning). */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private def isEval = pmod(TextFunctions.md5Hash56(col("doc_id").cast("string")), lit(20L)) === 0L

  test("decontamination: flagged set equals brute-force string 4-gram overlap") {
    val corpus = docs.filter(!isEval)
    val eval = docs.filter(isEval)
    assert(eval.count() > 0, "fixture should have a non-empty eval slice")
    val flagged = Contamination.overlapReport(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute force on shingle STRINGS (independent of the hash path)
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(TextFunctions.ngramArray(col("text"), 4)).as("g"))
      .filter(length(col("g")) > 0)
    val evalGrams = grams(eval).select("g").distinct()
    val expected = grams(corpus).join(evalGrams, Seq("g"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flagged === expected)
  }

  test("decontaminate returns exactly the unflagged corpus rows") {
    val corpus = docs.filter(!isEval)
    val eval = docs.filter(isEval)
    val flagged = Contamination.overlapReport(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Contamination.decontaminate(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (all -- flagged))
  }

  test("packing: distributed assignment equals sequential replay per shard") {
    val packed = Packing.pack(docs, "doc_id", TextFunctions.tokenCount(col("text")),
        budget = 256, shards = 4)
      .select("doc_id", "n_tok", "shard", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc assigned exactly once
    assert(packed.map(_._1).distinct.length == packed.length)
    assert(packed.length == docs.count())
    // sequential replay: same order (h, id) within shard, running sum
    val h = docs.select(col("doc_id"),
        TextFunctions.md5Hash56(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = packed.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      var prefix = 0L
      rows.toSeq.sortBy(t => (h(t._1), t._1)).map { case (id, nTok, shard, _) =>
        val bin = prefix / 256
        prefix += nTok
        (id, shard, bin)
      }
    }.toSet
    assert(packed.map(t => (t._1, t._3, t._4)).toSet === expected)
  }

  test("packing: bins are dense per shard and start within budget of schedule") {
    val packed = Packing.pack(docs, "doc_id", TextFunctions.tokenCount(col("text")),
        budget = 256, shards = 4)
    val bins = packed.groupBy("shard", "bin").agg(sum("n_tok").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    bins.groupBy(_._1).foreach { case (_, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids === (0L until ids.length).toArray, "bins must be dense from 0")
    }
  }

  test("row ids: dense 0..n-1 in sort order, stable under repartitioning") {
    val base = docs.select(col("doc_id"),
      TextFunctions.md5Hash56(col("doc_id").cast("string")).as("h"))
    val ids = RowIds.contiguousIds(base, Seq(col("h"), col("doc_id")))
      .select("doc_id", "h", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ids.map(_._3).sorted.toSeq == (0L until ids.length).toSeq)
    // seq order == (h, doc_id) order
    assert(ids.sortBy(_._3).map(t => (t._2, t._1)).toSeq ==
      ids.map(t => (t._2, t._1)).sortBy(identity).toSeq)
    // layout-independent: a different partitioning yields identical ids
    val reparted = RowIds.contiguousIds(base.repartition(7), Seq(col("h"), col("doc_id")))
      .select("doc_id", "seq").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reparted === ids.map(t => (t._1, t._3)).toSet)
  }

  test("repetition metrics on handcrafted docs") {
    val out = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "x")).toDF("doc_id", "text")
    val tcnt = out.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), max("c").as("mx"))
    val big = out.select(col("doc_id"),
      size(filter(TextFunctions.ngramArray(col("text"), 2), x => length(x) > 0))
        .cast("long").as("nbd"),
      (greatest(TextFunctions.tokenCount(col("text")) - 2, lit(0L)) + 1).as("nbt"))
    val m = tcnt.join(big, Seq("doc_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) == ((4L, 4L, 1L, 3L))) // "a a a a": 1 distinct bigram of 3
    assert(m(2L) == ((4L, 1L, 3L, 3L))) // "a b c d": all bigrams distinct
    assert(m(3L) == ((1L, 1L, 1L, 1L))) // single token: whole list is the shingle
  }

  test("domain mix weights flatten a skewed two-source corpus") {
    val df = Seq.tabulate(40)(i => (i.toLong, if (i < 30) "big" else "small", "t t t t"))
      .toDF("doc_id", "source", "text")
    val perSrc = df.groupBy("source").agg(
      sum(TextFunctions.tokenCount(col("text"))).as("tok_sum"))
    val tot = perSrc.agg(sum("tok_sum").as("tt"), count(lit(1)).as("ns"))
    val out = perSrc.crossJoin(broadcast(tot))
      .withColumn("share", col("tok_sum").cast("double") / col("tt").cast("double"))
      .withColumn("w", least(lit(1.0), (lit(1.0) / col("ns").cast("double")) / col("share")))
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("share"), r.getAs[Double]("w"))).toMap
    assert(out("big")._1 == 0.75 && out("small")._1 == 0.25)
    assert(out("big")._2 == (0.5 / 0.75) && out("small")._2 == 1.0)
  }
}
