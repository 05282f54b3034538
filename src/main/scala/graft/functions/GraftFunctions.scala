package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.IntegerType

/** The engine's native expressions exposed on the SQL surface, so the
  * declarative entry point (SURVEY.md §3.3) covers the extension
  * operators too: a SQL user writes `graft_simhash64(text)` or
  * `graft_jaccard(a, b)` and gets the same codegen'd expression the
  * Column API builds — one implementation, two surfaces.
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] on a live session (used by
  *    GraftSession, tests, notebooks);
  *  - [[graft.GraftSparkExtensions]] for builder-time injection via
  *    `spark.sql.extensions` config — the idiomatic deployment path on
  *    a cluster (`--conf spark.sql.extensions=graft.GraftSparkExtensions`).
  *
  * Expressions whose construction needs a driver-side reference object
  * (hyperplane matrices, trained centroid sets) stay Column-API-only —
  * a SQL literal can't carry the object, and a literal-tree encoding is
  * exactly the Janino bomb the reference objects exist to avoid.
  */
object GraftFunctions {

  private def constInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** name → builder for every SQL-expressible native expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", 1, args); SimHash64(args.head)
    },
    "graft_shingles" -> { args =>
      arity("graft_shingles", 2, args)
      WordShingles(args.head, constInt(args(1), "graft_shingles", "n"))
    },
    "graft_jaccard" -> { args =>
      arity("graft_jaccard", 2, args); JaccardSimilarity(args.head, args(1))
    },
    // array<double> × array<double> left-fold dot product (cast float
    // embeddings first, once per vector — see VectorOps.dotPrecast)
    "graft_dot" -> { args =>
      arity("graft_dot", 2, args); DotProduct(args.head, args(1))
    },
    "graft_minhash" -> { args =>
      arity("graft_minhash", 2, args)
      MinhashSignature(args.head, constInt(args(1), "graft_minhash", "k"))
    },
    "graft_rolling_fp" -> { args =>
      arity("graft_rolling_fp", 1, args); RollingFp(args.head)
    },
    "graft_minhash_bands" -> { args =>
      arity("graft_minhash_bands", 3, args)
      MinhashBands(args.head,
        constInt(args(1), "graft_minhash_bands", "bands"),
        constInt(args(2), "graft_minhash_bands", "rows"))
    }
  )

  /** Register every function on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      bridge.registerFunction(spark, name, builder)
    }

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
