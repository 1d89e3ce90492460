package graft.plans

import java.util.LinkedHashSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word-shingle extraction — the inner loop
  * of every dedup/similarity operator (n-gram Jaccard, MinHash, LSH over
  * shingles).
  *
  * Semantically identical to the HOF formulation
  * `array_distinct(transform(sequence(0, greatest(size(split(text," ",-1))
  * - n, 0)), i => concat_ws(" ", slice(split(text," ",-1), i+1, n))))` but:
  *
  *   - O(bytes): one scan finds token boundaries; each shingle is a byte
  *     slice of the original string (tokens are separated by exactly one
  *     0x20 by construction of the boundaries), so nothing is re-split or
  *     re-joined per position. The HOF form re-evaluates `split(text)`
  *     inside the lambda — O(tokens²) per document — and, being a
  *     higher-order function, can never enter whole-stage codegen: Spark
  *     evaluates it on the interpreted `Expression.eval` path, whose
  *     megamorphic dispatch is 50-100× slower than compiled code whenever
  *     the JIT hasn't (or can't — code-cache pressure) compiled it.
  *   - Codegen-able: `doGenCode` emits a single static call into
  *     [[WordShingles.compute]], so the Generate/explode above it compiles
  *     into the enclosing whole-stage-codegen stage and the loop itself is
  *     one small monomorphic JIT-friendly method.
  *
  * Duplicate shingles are dropped preserving first occurrence, matching
  * `array_distinct`.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    if (distinct) WordShingles.compute(v.asInstanceOf[UTF8String], n)
    else WordShingles.computeAll(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (distinct) "compute" else "computeAll"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.plans.WordShingles.$method($s, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object WordShingles {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  def word_shingles(text: Column, n: Int): Column = toCol(WordShingles(toExpr(text), n))

  /** All shingle OCCURRENCES (no dedup) — for repetition statistics, where
    * how often an n-gram repeats IS the signal `array_distinct` would erase. */
  def word_shingles_all(text: Column, n: Int): Column =
    toCol(WordShingles(toExpr(text), n, distinct = false))

  /** Distinct word shingles of `text` (single-space tokenizer, `split(text,
    * " ", -1)` semantics incl. empty tokens from leading/trailing/double
    * spaces). Each shingle is a byte-range slice of the input, so the
    * result is bit-identical to joining the token slice with " ". */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes // copy only when the string is offset into a shared buffer
    val len = bytes.length
    // token start offsets: 0 and every position after a 0x20 byte (UTF-8
    // multibyte sequences never contain 0x20, so a raw byte scan is exact)
    var numToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numToks += 1; i += 1 }
    val starts = new Array[Int](numToks + 1) // sentinel: starts(numToks) = len + 1
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(numToks) = len + 1

    val count = math.max(numToks - n, 0) + 1
    val seen = new LinkedHashSet[UTF8String](count * 2)
    i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(math.min(i + n, numToks)) - 1 // end of token i+n-1
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Every shingle occurrence in order (no dedup) — same single boundary
    * scan + byte-range slices as [[compute]]. */
  def computeAll(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var numToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numToks += 1; i += 1 }
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(numToks) = len + 1

    val count = math.max(numToks - n, 0) + 1
    val out = new Array[AnyRef](count)
    i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(math.min(i + n, numToks)) - 1
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Most-repeated word n-gram of a document — the inner loop of the Gopher
  * repetition rules (Rae et al. 2021 §A1.1 Table A1: drop when the single
  * most frequent word 2-/3-gram covers too many of the document's
  * characters). Returns `struct(cnt BIGINT, g STRING)` — occurrence count
  * and the gram itself, ties broken by the LARGEST gram under binary
  * (UTF8) string order, i.e. exactly `max(struct(cnt, g))` over the
  * exploded gram multiset — or NULL when the document has fewer than `n`
  * tokens (matching the oracle's `WHERE len(w) >= n` guard).
  *
  * This expression exists to make the repetition filter a ZERO-SHUFFLE
  * map. The exploded formulation (word_shingles_all → explode → two keyed
  * aggregations → join back) is linear too, but it pushes ~2 rows per
  * corpus word through a wide (doc_id, n, gram) exchange — at 100 TB that
  * shuffle IS the query. Per-document gram counting needs no cross-row
  * state at all: one boundary scan (same byte-slice trick as
  * [[WordShingles.compute]] — UTF-8 multibyte sequences never contain
  * 0x20), one open-addressed count pass over byte-range slices, one max
  * scan. O(bytes) per document, codegen'd dispatch, perfectly parallel.
  */
case class TopRepeatedGram(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

  // null for < n-token documents even when the input is non-null
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("g", StringType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_repeated_gram expects a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TopRepeatedGram.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.plans.TopRepeatedGram.compute($s, $n);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object TopRepeatedGram {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  def top_repeated_gram(text: Column, n: Int): Column =
    toCol(TopRepeatedGram(toExpr(text), n))

  def top_repeated_gram_pair(text: Column, n1: Int, n2: Int): Column =
    toCol(TopRepeatedGramPair(toExpr(text), n1, n2))

  private[plans] val resultType: StructType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("g", StringType, nullable = false)))

  /** Token start offsets (0 and every position after a 0x20 byte) plus
    * the token count — ONE boundary scan shared by every gram width. */
  private def tokenStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    val len = bytes.length
    var numToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numToks += 1; i += 1 }
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(numToks) = len + 1 // sentinel: end of token numToks-1 is len
    (starts, numToks)
  }

  private def topOf(bytes: Array[Byte], starts: Array[Int], numToks: Int,
      n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (numToks < n) return null
    val count = numToks - n + 1
    val counts = new java.util.HashMap[UTF8String, java.lang.Integer](count * 2)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(i + n) - 1 // end of token i+n-1
      val g = UTF8String.fromBytes(bytes, from, until - from)
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var bestCnt = 0
    var bestG: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestG) > 0)) {
        bestCnt = c
        bestG = e.getKey
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCnt.toLong, bestG))
  }

  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val (starts, numToks) = tokenStarts(bytes)
    topOf(bytes, starts, numToks, n)
  }

  /** Both gram widths from ONE tokenization (the t18 shape: the boundary
    * scan and starts allocation are byte-identical across the 2-gram and
    * 3-gram calls, so fusing them saves a full extra pass per document). */
  def computePair(text: UTF8String, n1: Int, n2: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val (starts, numToks) = tokenStarts(bytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topOf(bytes, starts, numToks, n1), topOf(bytes, starts, numToks, n2)))
  }
}

/** [[TopRepeatedGram]] for TWO gram widths in one pass — returns
  * `struct(a struct(cnt, g), b struct(cnt, g))` with per-field null below
  * the respective width's token count. Exists because the Gopher
  * repetition rules always need the 2-gram AND 3-gram top in the same
  * projection, and two independent expressions each redo the full
  * token-boundary scan over the same text. */
case class TopRepeatedGramPair(child: Expression, n1: Int, n2: Int) extends UnaryExpression {
  require(n1 >= 1 && n2 >= 1, "gram widths must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("a", TopRepeatedGram.resultType, nullable = true),
    StructField("b", TopRepeatedGram.resultType, nullable = true)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_repeated_gram_pair expects a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TopRepeatedGram.computePair(v.asInstanceOf[UTF8String], n1, n2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TopRepeatedGram.computePair($s, $n1, $n2);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Unicode text canonicalization — the first pass of every training-corpus
  * cleanup (mirrors the reference's normalize-before-fingerprint step,
  * ops/data_ingestion_ops.py:180-200, widened to real Unicode): a
  * configurable composition of
  *
  *   1. Unicode normalization (`form`: NFC/NFD/NFKC/NFKD via
  *      `java.text.Normalizer` — NFKC folds ligatures/fullwidth/compat
  *      chars, the form LLM pipelines use),
  *   2. root-locale lowercasing,
  *   3. whitespace canonicalization (any `Character.isWhitespace` run →
  *      one 0x20, ends trimmed; one scan).
  *
  * A native codegen'd expression (not a UDF), so it runs inside
  * whole-stage codegen like the rest of the scalar surface. The NFC+lower+
  * collapse configuration is exactly replayable in ANSI engines with
  * `nfc_normalize`/`lower`/`regexp_replace` — the t12 oracle does. */
case class NormalizeText(
    child: Expression,
    form: String,
    lowercase: Boolean,
    collapseWs: Boolean
) extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form), s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NormalizeText.compute(v.asInstanceOf[UTF8String], form, lowercase, collapseWs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.plans.NormalizeText.compute($s, "$form", $lowercase, $collapseWs);""")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object NormalizeText {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  def normalize_text(text: Column, form: String = "NFKC",
      lowercase: Boolean = true, collapseWs: Boolean = true): Column =
    toCol(NormalizeText(toExpr(text), form, lowercase, collapseWs))

  def compute(text: UTF8String, form: String, lowercase: Boolean, collapseWs: Boolean): UTF8String = {
    var s = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.valueOf(form))
    if (lowercase) s = s.toLowerCase(java.util.Locale.ROOT)
    if (collapseWs) {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      var pendingSpace = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c)) pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
        }
        i += 1
      }
      s = sb.toString
    }
    UTF8String.fromString(s)
  }
}

/** Deflate-compressed size of the UTF-8 text — the compression-ratio
  * quality signal modern corpus curation uses as a model-free
  * redundancy/boilerplate detector (highly repetitive or templated text
  * compresses far below natural prose; near-random noise barely
  * compresses at all). Emits the COMPRESSED BYTE COUNT (integer-exact;
  * the ratio is a downstream column op against the raw length) from one
  * pass of `java.util.zip.Deflater` at a fixed level with `nowrap`, so
  * the value is deterministic for (text, level). Native codegen'd
  * expression — the deflate call dominates, but dispatch stays inside
  * whole-stage codegen with zero boxing. No SQL-engine equivalent →
  * driver query is rows-only; ordering/determinism are spec-asserted. */
case class DeflateSize(child: Expression, level: Int) extends UnaryExpression {
  require(level >= 1 && level <= 9, "deflate level must be in [1, 9]")

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    DeflateSize.compute(v.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.DeflateSize.compute($s, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object DeflateSize {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  def deflate_size(text: Column, level: Int = 6): Column =
    toCol(DeflateSize(toExpr(text), level))

  def compute(text: UTF8String, level: Int): Int = {
    val in = text.getBytes
    val d = new java.util.zip.Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
