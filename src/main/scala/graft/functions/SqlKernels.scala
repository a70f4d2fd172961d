package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, Concat, Conv, Expression, LessThan, Literal, Md5, Pmod, Substring}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Fractional SQL literals parse as DECIMAL (`0.8`) unless suffixed
    * (`0.8D`) — accept both, the parameter shapes the plan either way. */
  private def litFraction(e: Expression, fn: String, pos: Int): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a numeric literal, got $other")
  }

  private def litString(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a STRING literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$fn expects $n argument(s), got ${args.length}")

  private def deep(c: org.apache.spark.sql.Column): Expression =
    ColumnBridge.expressionDeep(c)

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
    },
    "graft_nfc" -> { args =>
      arity("graft_nfc", args, 1); UnicodeNorm.nfcExpr(args(0))
    },
    "graft_nfkc" -> { args =>
      arity("graft_nfkc", args, 1); UnicodeNorm.nfkcExpr(args(0))
    },
    // deterministic-sampling tier for SQL-only users: the builders
    // construct the SAME md5-threshold expression tree Sampling plans
    // (thresholds from the shared hexThresholdLex/splitArms helpers),
    // so a SQL `WHERE graft_keep(id, 0.1)` is the identical codegen
    // filter as bernoulliByHash — partitioning-invariant, resumable,
    // recomputable by an external engine
    "graft_keep" -> { args =>
      arity("graft_keep", args, 2)
      val f = litFraction(args(1), "graft_keep", 1)
      require(f >= 0.0 && f <= 1.0, s"graft_keep: fraction $f not in [0,1]")
      LessThan(hashPrefix(args(0)),
        Literal.create(graft.ops.Sampling.hexThresholdLex(f)))
    },
    // sketch-tier hashes for SQL-only users: the portable 60-bit
    // md5-fold value hash and the salted count-min/bloom bucket — the
    // SAME trees Sketch.valueHash60/cmBucket plan, so a SQL-built KMV
    // rank or CM counter matrix matches the Column-API sketches (and
    // the DuckDB replay) bit for bit
    "graft_hash60" -> { args =>
      arity("graft_hash60", args, 1); hash60Expr(args(0))
    },
    "graft_cm_bucket" -> { args =>
      arity("graft_cm_bucket", args, 3)
      val row = litInt(args(1), "graft_cm_bucket", 1)
      val width = litInt(args(2), "graft_cm_bucket", 2)
      require(row >= 0, s"graft_cm_bucket: row $row must be >= 0")
      require(width >= 1, s"graft_cm_bucket: width $width must be >= 1")
      Pmod(hash60Expr(Concat(Seq(
        Literal.create(row.toString), Literal.create("#"),
        Cast(args(0), StringType)))), Literal(width.toLong))
    },
    "graft_hist_bucket" -> { args =>
      arity("graft_hist_bucket", args, 2)
      val subBits = litInt(args(1), "graft_hist_bucket", 1)
      require(subBits >= 1 && subBits <= 20,
        s"graft_hist_bucket: subBits $subBits not in [1,20]")
      histBucketExpr(args(0), subBits)
    },
    // web/text prep tier for SQL-only users: each builder composes the
    // SAME Column-API chain (shared pattern constants — the chains
    // cannot drift from the Column surface because they ARE it),
    // deep-converted to a raw Catalyst tree via
    // ColumnBridge.expressionDeep (the lazy `expression` wrapper does
    // not resolve inside a FunctionRegistry builder — round-5 lesson)
    // JL sign projection for SQL-only users — the SAME StaticInvoke
    // tree randomProject plans (SRHT sign matrix, round(x·scale)→long
    // inputs); dims are literal ints, scale the default 1e6
    "graft_jl_project" -> { args =>
      arity("graft_jl_project", args, 3)
      val dim = litInt(args(1), "graft_jl_project", 1)
      val outDim = litInt(args(2), "graft_jl_project", 2)
      require(dim >= 1 && outDim >= 1,
        s"graft_jl_project: dims must be >= 1, got ($dim, $outDim)")
      VecOps.jlProjectExpr(args(0), dim, outDim, 1e6)
    },
    // confusable/zero-width fold for SQL-only users — the SAME literal
    // chain foldConfusables plans (shared constants, cannot drift)
    "graft_fold_confusables" -> { args =>
      arity("graft_fold_confusables", args, 1)
      deep(graft.ops.TextAnalysis.foldConfusables(ColumnBridge.column(args(0))))
    },
    "graft_extract_text" -> { args =>
      arity("graft_extract_text", args, 1)
      deep(graft.ops.TextAnalysis.extractText(ColumnBridge.column(args(0))))
    },
    "graft_normalize_url" -> { args =>
      arity("graft_normalize_url", args, 1)
      deep(graft.ops.Web.normalizeUrl(ColumnBridge.column(args(0))))
    },
    "graft_host" -> { args =>
      arity("graft_host", args, 1)
      deep(graft.ops.Web.hostOf(ColumnBridge.column(args(0))))
    },
    "graft_domain" -> { args =>
      arity("graft_domain", args, 1)
      deep(graft.ops.Web.registrableDomain(ColumnBridge.column(args(0))))
    },
    // media tier for SQL-only users: the perceptual image hash
    // (decoded luma for PNGs AND baseline JPEGs, bytes-as-luma
    // otherwise) and the audio kernels (PCM WAV decode + features,
    // DC-invariant fingerprint) — raw StaticInvoke trees, identical
    // to the Column surface's
    "graft_phash" -> { args =>
      arity("graft_phash", args, 1); PngDecode.dhashDecodedExpr(args(0))
    },
    "graft_audio_fingerprint" -> { args =>
      arity("graft_audio_fingerprint", args, 1); WavDecode.afpExpr(args(0))
    },
    // graft_audio_stats(payload, silenceAbsMax) -> array<bigint> in
    // WavDecodeImpl.StatNames order (null for non-WAV payloads)
    "graft_audio_stats" -> { args =>
      arity("graft_audio_stats", args, 2)
      WavDecode.statsExpr(args(0),
        Cast(args(1), org.apache.spark.sql.types.LongType))
    },
    // graft_split(key, name1, w1, name2, w2, ...) — weights must sum
    // to 1 (same contract as splitByHash); returns the split label
    "graft_split" -> { args =>
      require(args.length >= 3 && args.length % 2 == 1,
        s"graft_split expects (key, name, weight, ...), got ${args.length} argument(s)")
      val splits = args.drop(1).grouped(2).zipWithIndex.map { case (Seq(n, w), i) =>
        (litString(n, "graft_split", 1 + 2 * i),
          litFraction(w, "graft_split", 2 + 2 * i))
      }.toSeq
      val (arms, last) = graft.ops.Sampling.splitArms(splits)
      val h = hashPrefix(args(0))
      CaseWhen(
        arms.map { case (nm, thr) =>
          (LessThan(h, Literal.create(thr)), Literal.create(nm)) },
        Some(Literal.create(last)))
    })

  /** `substring(md5(cast(key as string)), 1, 12)` as raw Catalyst nodes
    * — the identical tree [[graft.ops.Sampling.keepPredicate]] and
    * `splitLabel` build through the Column API. */
  private def hashPrefix(key: Expression): Expression =
    Substring(
      Md5(Cast(Cast(key, StringType), org.apache.spark.sql.types.BinaryType)),
      Literal(1), Literal(12))

  /** `conv(substring(md5(cast(v as string)), 1, 15), 16, 10)` cast to
    * BIGINT — the identical tree [[graft.ops.Sketch.valueHash60]]
    * builds through the Column API. */
  private def hash60Expr(v: Expression): Expression =
    Cast(Conv(
      Substring(
        Md5(Cast(Cast(v, StringType), org.apache.spark.sql.types.BinaryType)),
        Literal(1), Literal(15)),
      Literal(16), Literal(10)), org.apache.spark.sql.types.LongType)

  /** The log-linear histogram bucket id as raw Catalyst nodes — the
    * identical tree [[graft.ops.Sketch.histBucket]] builds through the
    * Column API (CaseWhen arms in the same order, same left-assoc
    * arithmetic, same −1 − bucket⁺(−(v+1)) negative mirror), so
    * SQL-built histograms match the Column sketches and the DuckDB
    * replay bit for bit. */
  private def histBucketExpr(v: Expression, subBits: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Bin, Length, Multiply, ShiftRight, Subtract, UnaryMinus}
    import org.apache.spark.sql.types.LongType
    val cap = 1L << subBits
    val vl = Cast(v, LongType)
    def pos(u: Expression): Expression = {
      val e = Cast(Subtract(Length(Bin(u)), Literal(1)), IntegerType)
      val high = Subtract(
        Add(
          Multiply(Cast(Subtract(e, Literal(subBits - 1)), LongType), Literal(cap)),
          ShiftRight(u, Subtract(e, Literal(subBits)))),
        Literal(cap))
      CaseWhen(Seq((LessThan(u, Literal(cap)), u)), Some(high))
    }
    CaseWhen(Seq(
      (LessThan(vl, Literal(0L)),
        Subtract(Literal(-1L), pos(UnaryMinus(Add(vl, Literal(1L))))))),
      Some(pos(vl)))
  }

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
