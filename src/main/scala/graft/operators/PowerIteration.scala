package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

import graft.functions.{LongVecSumAgg, Vectors}

/** Top principal direction of the embedding corpus by power iteration,
  * and the per-vector projection onto it — the "all-but-the-top"
  * anisotropy diagnostic (Mu & Viswanath '18): contextual embedding
  * spaces concentrate mass on one dominant direction, and retrieval
  * pipelines project it out before indexing.
  *
  * Split exactly along the control-plane/data-plane line:
  *   - ONE distributed pass builds the 64×64 Gram matrix as
  *     fixed-point long sums (`round(vᵢ·vⱼ·1e9)` per row, summed
  *     associatively by [[graft.functions.LongVecSumAgg]] — the X68
  *     shape: 2080 upper-triangle cells never shuffle row-wise, and the
  *     result is layout-independent, hence engine-exact);
  *   - power iteration runs on the DRIVER over that 64×64 matrix (k×k
  *     doubles — control plane, like MLlib's RowMatrix.computeSVD
  *     Gramian path), every step in fixed evaluation order: u = G·v as
  *     ascending-j left folds, norm as an ascending-i fold, one
  *     correctly-rounded sqrt and division — bit-reproducible, and
  *     replayed verbatim by the DuckDB oracle's ordered `list_sum`
  *     folds;
  *   - one distributed projection maps every embedding onto the
  *     resulting direction (the shared [[Vectors.dot]] fold kernel).
  *
  * At 100 TB nothing changes: the Gram pass is one partial-aggregated
  * scan, the driver work is O(iters·dim²) independent of rows, and the
  * projection is a map. */
object PowerIteration {

  /** (vec_id, pc1_score): projection of each embedding onto the top
    * principal direction after `iters` power-iteration rounds from the
    * uniform start vector. `corpus`: (vec_id, embedding[dim]). */
  def pc1Projection(corpus: DataFrame, dim: Int = 64,
      iters: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    // upper-triangle fixed-point products, one fixed-width agg
    val tri = expr(s"""flatten(transform(sequence(0, ${dim - 1}), i ->
        transform(sequence(i, ${dim - 1}), j ->
          cast(round(element_at(v, i + 1) * element_at(v, j + 1)
            * 1000000000.0) AS bigint))))""")
    val gRow = e.select(exprColumn(LongVecSumAgg(columnExpr(tri))
        .toAggregateExpression()).as("g"))
      .head()
    val flat = gRow.getSeq[Long](0)
    val g = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        g(i)(j) = flat(idx).toDouble
        g(j)(i) = flat(idx).toDouble
        idx += 1; j += 1
      }
      i += 1
    }
    // fixed-order power iteration (matches the oracle's list_sum folds)
    var v = Array.fill(dim)(0.125)
    (0 until iters).foreach { _ =>
      val u = new Array[Double](dim)
      var a = 0
      while (a < dim) {
        var acc = 0.0
        var b = 0
        while (b < dim) { acc += g(a)(b) * v(b); b += 1 }
        u(a) = acc; a += 1
      }
      var n2 = 0.0
      var c = 0
      while (c < dim) { n2 += u(c) * u(c); c += 1 }
      val nrm = math.sqrt(n2)
      v = u.map(_ / nrm)
    }
    val vLit = array(v.map(lit).toIndexedSeq: _*)
    e.select(col("vec_id"),
        Vectors.dot(col("v"), vLit).as("pc1_score"))
  }
}
