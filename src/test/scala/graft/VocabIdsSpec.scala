package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X160 stable vocab ids: the append-only catalog
  * invariants — ids are dense and unique, existing terms occupy the
  * prefix, new terms extend strictly past max existing id. */
class VocabIdsSpec extends AnyFunSuite {
  import TestSpark._

  test("ids dense+unique; existing prefix stable; new strictly append") {
    val rows = CorpusQueries.vocabStableIds(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val ids = rows.map(_._2).sorted
    assert(ids.toSeq == (1L to rows.length))
    val maxExisting = rows.filter(!_._3).map(_._2).max
    assert(rows.filter(_._3).forall(_._2 > maxExisting))
    // existing ids are exactly the dense rank of their sorted terms —
    // re-running with the SAME existing set must reproduce them
    val existingSorted = rows.filter(!_._3).sortBy(_._1).map(_._2)
    assert(existingSorted.toSeq == (1L to existingSorted.length))
  }
}
