package graft

import graft.filters.{FilterCompiler, FilterParser}
import graft.functions.{JsonStrictLong, JsonStrictString, LongArrayDot, LongArrayL2Sq, LongVectorSum, MinHashSig, NearestCentroid, NearestCentroidExcluding, OrderedPairs, RollingHash, SimHash32}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType

/** SQL-surface registration for the engine's function library, so the
  * filter mini-language and the native kernels are usable from
  * `spark.sql(...)`:
  *
  *   evt_filter(json, 'k<=50')       -- compiled filter predicate
  *   evt_filter_all(json, 'f1', ...) -- AND of several filters
  *   json_int_strict(json, 'a.b')    -- strict-typed probes
  *   json_string_strict(json, 'a.b')
  *   vec_dot(a, b) / vec_l2sq(a, b)  -- integer-vector kernels
  *   vec_sum(v)                      -- element-wise array-sum AGGREGATE
  *   nearest_centroid(v, cents[, x]) -- broadcast-argmin (opt. exclude)
  *   rolling_hash(s)                 -- Rabin-Karp polynomial hash
  *   simhash32(tokens)               -- one-pass 32-bit simhash
  *   minhash_sig(shingles, k)        -- k minwise md5 signatures
  *   misra_gries(item, k)            -- heavy-hitters summary AGGREGATE
  *   kmv_sketch(hash, k)             -- k-minimum-values distinct AGGREGATE
  *   bitmap_distinct(key[, maxKeys]) -- exact bitmap distinct AGGREGATE
  *   bitmap_agg(key[, maxKeys])      -- bitmap-as-value AGGREGATE (binary)
  *   bitmap_or(bm) / bitmap_count(bm)-- bitmap rollup AGGREGATE / popcount
  *   ordered_pairs(ids)              -- a<b pair expansion of a list
  *
  * Filter strings must be literals: they compile at plan time into the
  * same Catalyst predicate trees the DataFrame path uses (the
  * reference's compile-at-subscribe, evtstrd/http_server.py:150).
  * Available either per session ([[register]]) or globally through
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {

  private def literalString(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ =>
      throw new IllegalArgumentException(
        s"$what must be a literal string, got: $e")
  }

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be a literal int, got: $e")
  }

  private def pathOf(e: Expression): Seq[String] =
    // limit -1 keeps trailing empty segments: 'a.' probes ["a",""]
    // exactly like the filter language (FilterParser splits the same
    // way), instead of silently collapsing to ["a"]
    literalString(e, "json path").split("\\.", -1).toSeq

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "evt_filter" -> { args =>
      require(args.length == 2, "evt_filter(json, 'filter')")
      ColumnBridge.eagerExpression(
        FilterCompiler.compile(
          FilterParser.parse(literalString(args(1), "filter string")),
          ColumnBridge.column(args(0))))
    },
    "evt_filter_all" -> { args =>
      require(args.length >= 1, "evt_filter_all(json, 'f1', 'f2', ...)")
      ColumnBridge.eagerExpression(
        FilterCompiler.compileAll(
          args.tail.map(literalString(_, "filter string")),
          ColumnBridge.column(args.head)))
    },
    "json_int_strict" -> { args =>
      require(args.length == 2, "json_int_strict(json, 'a.b')")
      JsonStrictLong(args(0), pathOf(args(1)))
    },
    "json_string_strict" -> { args =>
      require(args.length == 2, "json_string_strict(json, 'a.b')")
      JsonStrictString(args(0), pathOf(args(1)))
    },
    "vec_dot" -> { args =>
      require(args.length == 2, "vec_dot(a, b)")
      LongArrayDot(args(0), args(1))
    },
    "vec_l2sq" -> { args =>
      require(args.length == 2, "vec_l2sq(a, b)")
      LongArrayL2Sq(args(0), args(1))
    },
    "rolling_hash" -> { args =>
      require(args.length == 1, "rolling_hash(s)")
      RollingHash(args(0))
    },
    "simhash32" -> { args =>
      require(args.length == 1, "simhash32(tokens)")
      SimHash32(args(0))
    },
    "minhash_sig" -> { args =>
      require(args.length == 2, "minhash_sig(shingles, numHashes)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case e => throw new IllegalArgumentException(
          s"numHashes must be a literal int, got: $e")
      }
      MinHashSig(args(0), k)
    },
    "nearest_centroid" -> { args =>
      require(
        args.length == 2 || args.length == 3,
        "nearest_centroid(v, cents[, excludeId])")
      if (args.length == 2) NearestCentroid(args(0), args(1))
      else NearestCentroidExcluding(args(0), args(1), args(2))
    },
    "vec_sum" -> { args =>
      require(args.length == 1, "vec_sum(v)")
      LongVectorSum(args(0)).toAggregateExpression()
    },
    "misra_gries" -> { args =>
      require(args.length == 2, "misra_gries(item, k)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case e => throw new IllegalArgumentException(
          s"k must be a literal int, got: $e")
      }
      graft.functions.MisraGries(args(0), k).toAggregateExpression()
    },
    "kmv_sketch" -> { args =>
      require(args.length == 2, "kmv_sketch(hash, k)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case e => throw new IllegalArgumentException(
          s"k must be a literal int, got: $e")
      }
      graft.functions.KmvSketch(args(0), k).toAggregateExpression()
    },
    "bitmap_distinct" -> { args =>
      require(
        args.length == 1 || args.length == 2,
        "bitmap_distinct(key[, maxKeys])")
      val cap =
        if (args.length == 2) literalInt(args(1), "maxKeys").toLong
        else graft.functions.BitmapFunctions.DefaultMaxKeys
      graft.functions.BitmapDistinct(args(0), cap).toAggregateExpression()
    },
    "bitmap_agg" -> { args =>
      require(
        args.length == 1 || args.length == 2, "bitmap_agg(key[, maxKeys])")
      val cap =
        if (args.length == 2) literalInt(args(1), "maxKeys").toLong
        else graft.functions.BitmapFunctions.DefaultMaxKeys
      graft.functions.BitmapValueAgg(args(0), cap).toAggregateExpression()
    },
    "bitmap_or" -> { args =>
      require(args.length == 1, "bitmap_or(bitmap)")
      graft.functions.BitmapOrAgg(args(0)).toAggregateExpression()
    },
    "bitmap_count" -> { args =>
      require(args.length == 1, "bitmap_count(bitmap)")
      graft.functions.BitmapCount(args(0))
    },
    "bitmap_and" -> { args =>
      require(args.length == 2, "bitmap_and(bitmap, bitmap)")
      graft.functions.BitmapAnd(args(0), args(1))
    },
    "bitmap_andnot" -> { args =>
      require(args.length == 2, "bitmap_andnot(bitmap, bitmap)")
      graft.functions.BitmapAndNot(args(0), args(1))
    },
    "ordered_pairs" -> { args =>
      require(
        args.length == 1 || args.length == 2,
        "ordered_pairs(ids[, maxPairs])")
      if (args.length == 1) OrderedPairs(args(0))
      else {
        val cap = args(1) match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case e => throw new IllegalArgumentException(
            s"maxPairs must be a literal integer, got: $e")
        }
        OrderedPairs(args(0), cap)
      }
    })

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** `spark.sql.extensions`-compatible entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.GraftFunctions", name),
          b))
    }
    // whole-operator nodes (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
