package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL-text surface for the codegen kernels: registers `graft_*`
  * functions in the session's `FunctionRegistry` so plain
  * `spark.sql("SELECT graft_dot(a, b) ...")` — and therefore every
  * [[graft.session.GraftSession]] query — can use them without
  * touching the Column API. Each registration delegates to the same
  * Expression builder the Column wrapper uses, so SQL calls and Column
  * calls plan the identical `StaticInvoke` (one kernel, two surfaces).
  *
  * Functions with a structural parameter (shingle width, signature
  * length) require that argument to be an INTEGER LITERAL — it shapes
  * the generated plan, exactly like the Column API's `Int` parameter.
  */
object SqlKernels {

  private def litInt(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INTEGER literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$fn expects $n argument(s), got ${args.length}")

  private type Builder = Seq[Expression] => Expression

  /** Name → builder for every graft kernel function. */
  private val specs: Seq[(String, Builder)] = Seq(
    "graft_dot" -> { args =>
      arity("graft_dot", args, 2); VecOps.dotExpr(args(0), args(1))
    },
    "graft_dot_lenient" -> { args =>
      arity("graft_dot_lenient", args, 2)
      VecOps.dotOrNullExpr(args(0), args(1))
    },
    "graft_normalize" -> { args =>
      arity("graft_normalize", args, 1); VecOps.normalizeExpr(args(0))
    },
    "graft_cosine" -> { args =>
      arity("graft_cosine", args, 2)
      VecOps.dotExpr(VecOps.normalizeExpr(args(0)), VecOps.normalizeExpr(args(1)))
    },
    "graft_jaccard" -> { args =>
      arity("graft_jaccard", args, 2)
      Jaccard.jaccardExpr(args(0), args(1))
    },
    "graft_simhash" -> { args =>
      arity("graft_simhash", args, 1); SimHash.simhash64Expr(args(0))
    },
    "graft_shingles" -> { args =>
      arity("graft_shingles", args, 2)
      TextShingles.textShinglesExpr(args(0),
        litInt(args(1), "graft_shingles", 1))
    },
    "graft_minhash_sig" -> { args =>
      arity("graft_minhash_sig", args, 2)
      MinHash.signatureExpr(args(0), litInt(args(1), "graft_minhash_sig", 1))
    })

  /** Register every graft kernel as a `graft_*` SQL function on this
    * session, permanently. Idempotent (createOrReplace). */
  def registerAll(spark: SparkSession): Unit =
    specs.foreach { case (n, b) =>
      ColumnBridge.registerTempFunction(spark, n, b)
    }

  /** Scoped registration for an embedding host (the
    * [[graft.session.GraftSession]] path): registers every kernel and
    * returns a restore thunk that puts each name back to its
    * pre-registration state — dropped if absent before, or the saved
    * builder re-registered if the host had its own `graft_*` function.
    * Like the session timezone pin, restore is guarded: a name whose
    * builder was replaced again after us (another registrar, or a
    * concurrently-open GraftSession) is left untouched — the later
    * owner restores its own save. */
  def registerScoped(spark: SparkSession): () => Unit = {
    val saved = specs.map { case (n, b) =>
      val prev = ColumnBridge.lookupTempFunction(spark, n)
      ColumnBridge.registerTempFunction(spark, n, b)
      (n, b, prev)
    }
    () => saved.foreach { case (n, mine, prev) =>
      if (ColumnBridge.lookupTempFunction(spark, n).exists(_ eq mine)) {
        prev match {
          case Some(p) => ColumnBridge.registerTempFunction(spark, n, p)
          case None => ColumnBridge.dropTempFunction(spark, n)
        }
      }
    }
  }
}
