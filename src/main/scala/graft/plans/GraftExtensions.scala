package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.VectorExpressions._
import graft.plans.{WordShingles => WordShinglesExpr}

/** SparkSessionExtensions hook registering the engine's native Catalyst
  * expressions in the SQL function registry, so `spark.sql("SELECT
  * vector_cosine(a.embedding, b.embedding) ...")` works exactly like the
  * Column API (`VectorExpressions.vector_cosine`). Activated via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (core/SparkSessionFactory sets it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def register(ext: SparkSessionExtensions, name: String, usage: String)(builder: FunctionBuilder): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  private def literalInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def literalString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    e.eval().toString
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "vector_dot",
      "vector_dot(a, b) - dot product of two array<float|double> vectors in double precision") {
      case Seq(a, b) => VectorDot(a, b)
      case other => throw new IllegalArgumentException(s"vector_dot expects 2 arguments, got ${other.length}")
    }
    register(ext, "vector_cosine",
      "vector_cosine(a, b) - cosine similarity of two array<float|double> vectors") {
      case Seq(a, b) => VectorCosine(a, b)
      case other => throw new IllegalArgumentException(s"vector_cosine expects 2 arguments, got ${other.length}")
    }
    register(ext, "vector_normalize",
      "vector_normalize(a) - unit-normalize an array<float|double> vector") {
      case Seq(a) => VectorNormalize(a)
      case other => throw new IllegalArgumentException(s"vector_normalize expects 1 argument, got ${other.length}")
    }
    register(ext, "word_shingles",
      "word_shingles(text, n) - distinct word n-gram shingles (single-space tokenizer)") {
      case Seq(t, n) => WordShinglesExpr(t, literalInt(n, "word_shingles width"))
      case other => throw new IllegalArgumentException(s"word_shingles expects 2 arguments, got ${other.length}")
    }
    register(ext, "word_shingles_all",
      "word_shingles_all(text, n) - every word n-gram occurrence, no dedup (repetition stats)") {
      case Seq(t, n) => WordShinglesExpr(t, literalInt(n, "word_shingles_all width"), distinct = false)
      case other => throw new IllegalArgumentException(s"word_shingles_all expects 2 arguments, got ${other.length}")
    }
    register(ext, "top_repeated_gram",
      "top_repeated_gram(text, n) - struct(cnt, g) of the most frequent word n-gram (Gopher repetition rules); null below n tokens") {
      case Seq(t, n) => TopRepeatedGram(t, literalInt(n, "top_repeated_gram width"))
      case other => throw new IllegalArgumentException(s"top_repeated_gram expects 2 arguments, got ${other.length}")
    }
    register(ext, "top_repeated_gram_pair",
      "top_repeated_gram_pair(text, n1, n2) - struct(a, b) of top_repeated_gram at both widths from one tokenization") {
      case Seq(t, n1, n2) => TopRepeatedGramPair(t,
        literalInt(n1, "top_repeated_gram_pair width"), literalInt(n2, "top_repeated_gram_pair width"))
      case other => throw new IllegalArgumentException(s"top_repeated_gram_pair expects 3 arguments, got ${other.length}")
    }
    register(ext, "normalize_text",
      "normalize_text(text[, form[, lowercase[, collapse_ws]]]) - Unicode canonicalization (NFC/NFD/NFKC/NFKD + lower + whitespace collapse)") {
      case Seq(t) => NormalizeText(t, "NFKC", lowercase = true, collapseWs = true)
      case Seq(t, f) => NormalizeText(t, literalString(f, "normalize_text form"), lowercase = true, collapseWs = true)
      case Seq(t, f, lc) => NormalizeText(t, literalString(f, "normalize_text form"),
        literalString(lc, "normalize_text lowercase").toBoolean, collapseWs = true)
      case Seq(t, f, lc, ws) => NormalizeText(t, literalString(f, "normalize_text form"),
        literalString(lc, "normalize_text lowercase").toBoolean,
        literalString(ws, "normalize_text collapse_ws").toBoolean)
      case other => throw new IllegalArgumentException(s"normalize_text expects 1-4 arguments, got ${other.length}")
    }
    register(ext, "rolling_fingerprint",
      "rolling_fingerprint(text, window) - Rabin-Karp rolling document fingerprint over UTF-8 bytes") {
      case Seq(t, w) => RollingFingerprint(t, literalInt(w, "rolling_fingerprint window"))
      case other => throw new IllegalArgumentException(s"rolling_fingerprint expects 2 arguments, got ${other.length}")
    }
    register(ext, "deflate_size",
      "deflate_size(text[, level]) - deflate-compressed byte count (compression-ratio quality signal)") {
      case Seq(t) => DeflateSize(t, 6)
      case Seq(t, l) => DeflateSize(t, literalInt(l, "deflate_size level"))
      case other => throw new IllegalArgumentException(s"deflate_size expects 1-2 arguments, got ${other.length}")
    }
  }
}
