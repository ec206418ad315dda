package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotProduct, DoubleVecMinMaxAgg, KmvAgg, LongVecSumAgg, Md5Hash56, MinHashAgg, MisraGriesAgg, NGramShingles, QDigest, QDigestAgg, QDigestWeightedAgg, SimHashAgg, VectorAvgAgg}

/** Session extension wiring: makes graft's native expressions available
  * from SQL text — the full corpus-pipeline kernel set, e.g.
  * {{{
  *   SELECT vec_dot(a, b)                          -- codegen'd dot product
  *   SELECT md5_hash56(s)                          -- portable 56-bit hash
  *   SELECT ngram_shingles(text, 3)                -- word n-gram set
  *   SELECT minhash_agg(h, 64), simhash_agg(h, 32) -- signature aggregates
  *   SELECT vector_avg(embedding)                  -- elementwise mean
  * }}}
  *
  * Install at session build time:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or imperatively on a live session via
  * `org.apache.spark.sql.graftsql.registerGraftFunctions(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator top-k-per-key: optimizer rewrite of the
    // row_number()-then-filter idiom + the strategy that plans it
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** (name, info, builder) descriptions for every injected function.
    * Vector inputs are wrapped in casts to the kernel's native
    * array<double>, so SQL callers can pass float or double arrays.
    * Aggregate functions return the bare `AggregateFunction`; the
    * analyzer wraps it into an AggregateExpression during resolution. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("vec_dot", classOf[DotProduct]) { c =>
      DotProduct(
        Cast(c(0), ArrayType(DoubleType)), Cast(c(1), ArrayType(DoubleType)))
    },
    fn("md5_hash56", classOf[Md5Hash56])(c => Md5Hash56(c(0))),
    fn("ngram_shingles", classOf[NGramShingles]) { c =>
      NGramShingles(c(0), intArg(c(1), "ngram_shingles"))
    },
    fn("minhash_agg", classOf[MinHashAgg]) { c =>
      MinHashAgg(c(0), intArg(c(1), "minhash_agg"))
    },
    fn("simhash_agg", classOf[SimHashAgg]) { c =>
      SimHashAgg(c(0), intArg(c(1), "simhash_agg"))
    },
    fn("vector_avg", classOf[VectorAvgAgg]) { c =>
      VectorAvgAgg(Cast(c(0), ArrayType(DoubleType)))
    },
    fn("qdigest_agg", classOf[QDigestAgg]) { c =>
      QDigestAgg(c(0), intArg(c(1), "qdigest_agg"), intArg(c(2), "qdigest_agg"))
    },
    fn("qdigest_quantile", classOf[QDigest.Quantile]) { c =>
      QDigest.Quantile(c(0), Cast(c(1), DoubleType), intArg(c(2), "qdigest_quantile"))
    },
    fn("kmv_agg", classOf[KmvAgg]) { c =>
      KmvAgg(Cast(c(0), org.apache.spark.sql.types.LongType),
        intArg(c(1), "kmv_agg"))
    },
    fn("vec_sum_long", classOf[LongVecSumAgg]) { c =>
      LongVecSumAgg(Cast(c(0), ArrayType(org.apache.spark.sql.types.LongType)))
    },
    fn("qdigest_weighted_agg", classOf[QDigestWeightedAgg]) { c =>
      QDigestWeightedAgg(c(0), Cast(c(1), org.apache.spark.sql.types.LongType),
        intArg(c(2), "qdigest_weighted_agg"), intArg(c(3), "qdigest_weighted_agg"))
    },
    fn("vec_minmax", classOf[DoubleVecMinMaxAgg]) { c =>
      DoubleVecMinMaxAgg(Cast(c(0), ArrayType(DoubleType)))
    },
    // misra_gries_agg(item, k): ≤k frequent-item candidates (superset
    // of every item with count > n/k); see Sketches.heavyHitters for
    // the exact-recount composition
    fn("misra_gries_agg", classOf[MisraGriesAgg]) { c =>
      MisraGriesAgg(Cast(c(0), org.apache.spark.sql.types.StringType),
        intArg(c(1), "misra_gries_agg"))
    })
}
