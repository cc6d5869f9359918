package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar paths — full
  * whole-stage-codegen implementations (higher-order-function
  * equivalents evaluate their lambdas interpreted, row by row).
  */
object GraftExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  def rollingHash(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))

  def murmur2(c: Column): Column =
    ExpressionUtils.column(Murmur2Expr(ExpressionUtils.expression(c)))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(tokens)))

  def argMaxCell(vec: Column, norm: Column, codebook: CellCodebook): Column =
    ExpressionUtils.column(ArgMaxCellExpr(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(norm), codebook))

  def wordNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(WordNgramsExpr(ExpressionUtils.expression(text), n))

  def charClassCounts(text: Column): Column =
    ExpressionUtils.column(CharClassCountsExpr(ExpressionUtils.expression(text)))

  def doubleToDecimal18(c: Column, scale: Int): Column =
    ExpressionUtils.column(DoubleToDecimal18Expr(ExpressionUtils.expression(c), scale))

  def decimalProd18(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalProd18Expr(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}

/** Char-class census in ONE byte pass — the counts text_code_detect
  * needs (total chars, symbols = anything outside [A-Za-z0-9 ],
  * digits, code punctuation), each previously a separate
  * regexp_replace length-difference: three java.util.regex NFA walks
  * over every document (the dominant cost of a routing scan — 6.3 s
  * at the 10× corpus). Semantics are EXACTLY the regex formulation's
  * for any UTF-8 input: the kept classes are single-byte ASCII, so
  * continuation bytes never miscount, and a non-ASCII char counts as
  * a symbol (as `[^A-Za-z0-9 ]` matches it) via
  * n_symbols = numChars − kept-bytes. */
case class CharClassCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_char_class_counts expects string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("n_code", LongType, nullable = false)))
  override def prettyName: String = "graft_char_class_counts"

  override def nullSafeEval(input: Any): Any =
    CharClassCountsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = CharClassCountsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $g.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharClassCountsExpr {
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var kept = 0L; var digits = 0L; var code = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      val isDigit = b >= '0' && b <= '9'
      if (isDigit || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || b == ' ')
        kept += 1
      if (isDigit) digits += 1
      if (b == '{' || b == '}' || b == '(' || b == ')' || b == '[' ||
        b == ']' || b == ';' || b == '=' || b == '<' || b == '>') code += 1
      i += 1
    }
    val nChars = s.numChars().toLong
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nChars - kept, digits, code))
  }
}

/** All word n-grams of a space-split string, in order, duplicates
  * kept — one pass, map-side, codegen. Token semantics are identical
  * to `split(text, " ")` (single-space regex, trailing empties kept)
  * + `concat_ws(" ", ...)`, which is what the posexplode+lead
  * formulation it replaces used — but with NO shuffle: gram
  * generation needed a window (shuffle by doc) only to stitch
  * neighbors back together after explode. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_word_ngrams expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = WordNgramsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $g.grams($c, $n);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNgramsExpr {
  private val Space = UTF8String.fromString(" ")

  def grams(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.split(Space, -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var g = toks(i)
      var k = 1
      while (k < n) { g = UTF8String.concat(g, Space, toks(i + k)); k += 1 }
      out(i) = g
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** A coarse-quantizer codebook in columnar form: cell ids, centroid
  * vectors, and their precomputed L2 norms (sorted by cell id). */
case class CellCodebook(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double])

/** Codebook persistence: train once, assign forever. Doubles are
  * stored as raw IEEE-754 bits (hex longs), so a loaded codebook is
  * BIT-IDENTICAL to the trained one — assignments cannot drift across
  * save/load, JVMs, or locales (a decimal round-trip could). */
object CellCodebook {
  def save(cb: CellCodebook, path: String): Unit = {
    def bits(d: Double) = java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
    val cells = cb.ids.indices.map { i =>
      s"""{"id":${cb.ids(i)},"norm":"${bits(cb.norms(i))}",""" +
        s""""vec":[${cb.vecs(i).map(d => "\"" + bits(d) + "\"").mkString(",")}]}"""
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, cells.mkString("[", ",\n", "]"))
  }

  def load(path: String): CellCodebook = {
    def un(h: String) = java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(h, 16))
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val cell = ("\\{\"id\":(\\d+),\"norm\":\"([0-9a-f]+)\"," +
      "\"vec\":\\[([^\\]]*)\\]\\}").r
    val parsed = cell.findAllMatchIn(s).map { m =>
      val vec = "\"([0-9a-f]+)\"".r.findAllMatchIn(m.group(3))
        .map(v => un(v.group(1))).toArray
      (m.group(1).toLong, vec, un(m.group(2)))
    }.toArray
    CellCodebook(parsed.map(_._1), parsed.map(_._2), parsed.map(_._3))
  }
}

/** Nearest-codebook-cell assignment:
  * argmax_j round(dot(v, c_j) / (|v|·|c_j|), 6), ties to the smallest
  * cell id (iteration order is ascending ids + strict improvement).
  * One tight loop over the broadcast codebook — constant generated-
  * code size in the number of cells, unlike C inlined dot-product
  * expressions whose codegen compile time grows with the codebook. */
case class ArgMaxCellExpr(vec: Expression, norm: Expression,
    codebook: CellCodebook) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, norm.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_cell expects (array<double>, double), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_argmax_cell"

  override def nullSafeEval(v: Any, n: Any): Any =
    ArgMaxCellExpr.compute(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook,
      classOf[CellCodebook].getName)
    val am = ArgMaxCellExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, n) => s"${ev.value} = $am.compute($v, $n, $cb);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, norm = r)
}

object ArgMaxCellExpr {
  /** Same arithmetic as the relational formulation the oracle mirrors:
    * sequential left-fold dot, sim = round(dot/(n·cn), 6) with
    * HALF_UP (identical to Spark's round), max sim / min cell. */
  def compute(v: ArrayData, n: Double, cb: CellCodebook): Long = {
    var best = -1L
    var bestSim = Double.NegativeInfinity
    var j = 0
    while (j < cb.ids.length) {
      val cv = cb.vecs(j)
      var s = 0.0
      var d = 0
      val len = math.min(v.numElements(), cv.length)
      while (d < len) { s += v.getDouble(d) * cv(d); d += 1 }
      val sim = new java.math.BigDecimal(s / (n * cb.norms(j)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (sim > bestSim) { bestSim = sim; best = cb.ids(j) }
      j += 1
    }
    best
  }
}

/** Sequential-left-fold dot product over two double arrays.
  * Exactly the fold the DuckDB oracles use (list_reduce with a
  * prepended 0.0), so results stay bit-identical with the
  * zip_with+aggregate formulation it replaces. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** O(n) polynomial rolling hash over the string's bytes:
  * h_i = (h_{i-1} * 31 + byte_i) mod 1e9+7. For ASCII input this is
  * byte-for-byte the same recurrence as the builtin-composed
  * TextFunctions.fingerprint (ascii(char) == byte there), without the
  * O(n²) substring walk or interpreted fold. */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rolling_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xFF)) % 1000000007L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xFF)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Murmur2 over the string/binary bytes, as specified by the public
  * Kafka protocol for its DefaultPartitioner (seed 0x9747b28c) — so a
  * graft topic partitioned with this routes keys to the same
  * partitions a Kafka producer would (ref: the reference broker
  * speaks this wire protocol, pkg/kafka/kafka_api.go). */
case class Murmur2Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_murmur2 expects string or binary, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_murmur2"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Murmur2Expr.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m2 = Murmur2Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val isStr = child.dataType == StringType
      val bytesExpr = if (isStr) s"$c.getBytes()" else c
      s"${ev.value} = $m2.hash($bytesExpr);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array: per token, xxhash64 (seed 42 —
  * identical to the builtin xxhash64 expression); per bit, a ±1
  * majority vote across tokens. Runs entirely map-side: no explode,
  * no 64-way aggregation, no shuffle — at 100 TB the per-doc simhash
  * becomes a pure scan projection. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash64 expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sh = SimHash64Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $sh.hash($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64Expr {
  def hash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i),
          StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }
}

object Murmur2Expr {
  /** murmur2, per the public Kafka protocol specification. */
  def hash(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val rem = length % 4
    if (rem >= 3) h ^= (data((length & ~3) + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data((length & ~3) + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(length & ~3) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}

/** Bit-exact fast `cast(double AS decimal(18, s))` — the dsum family's
  * per-row tax (SURVEY §5 exact-decimal discipline). Spark's Cast runs
  * `BigDecimal.valueOf(Double.toString(d))` + `setScale(s, HALF_UP)` +
  * a precision check per row: a string parse, two java.math.BigDecimal
  * allocations, a scala wrapper and a Decimal.set. The DIGITS of
  * `Double.toString` are the semantics (the shortest-repr decimal this
  * JVM prints — an own Ryū/Schubfach could differ from JDK 17's
  * FloatingDecimal in last-digit cases, so toString stays); everything
  * after the string is replayed in long arithmetic: parse the ≤17
  * significant digits into one long, shift/divide by powers of ten
  * with HALF_UP at the target scale, and hand Spark a compact
  * `Decimal.createUnsafe(long)` — no BigDecimal anywhere, and the
  * downstream sum stays on Decimal's compact-long add fast path.
  * Error semantics replay Cast's ANSI contract (Spark 4 session
  * default, what every dsum query ran under) — pinned empirically by
  * DoubleToDecimalSpec: NaN/±Inf → NULL (that's what the ANSI Cast
  * returns), precision overflow (>18 digits at scale s) FAILS LOUDLY
  * with an ArithmeticException. The spec also pins bit-equality on
  * planted last-ulp/tie values and randomized sweeps. */
case class DoubleToDecimal18Expr(child: Expression, scaleOut: Int)
    extends UnaryExpression {
  require(scaleOut >= 0 && scaleOut <= 18, "scale must be in [0, 18]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_d2dec expects double, got $t")
  }
  override def dataType: DataType = DecimalType(18, scaleOut)
  override def nullable: Boolean = true // NaN/±Inf → null, like the ANSI Cast
  override def prettyName: String = "graft_d2dec"

  override def nullSafeEval(input: Any): Any =
    DoubleToDecimal18Expr.compute(input.asInstanceOf[Double], scaleOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = DoubleToDecimal18Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $g.compute($c, $scaleOut);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DoubleToDecimal18Expr {
  private val POW10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }
  private val MAX18 = 999999999999999999L // 18 nines: decimal(18, s) bound

  /** Unscaled value of round_half_up(toString-decimal(d) × 10^s), or
    * Long.MinValue when the value overflows decimal(18, s). d finite. */
  def unscaled(d: Double, s: Int): Long = {
    val str = java.lang.Double.toString(d)
    val len = str.length
    var i = 0
    var neg = false
    if (str.charAt(0) == '-') { neg = true; i = 1 }
    var digits = 0L
    var ndig = 0
    var pointPos = -1
    var exp = 0
    var loop = true
    while (loop && i < len) {
      val c = str.charAt(i)
      if (c == '.') pointPos = ndig
      else if (c == 'E') { exp = java.lang.Integer.parseInt(str.substring(i + 1)); loop = false }
      else { digits = digits * 10L + (c - '0'); ndig += 1 }
      i += 1
    }
    if (digits == 0L) return 0L
    // toString value = digits × 10^(exp + pointPos − ndig)
    val t = exp + pointPos - ndig + s
    val u =
      if (t >= 0) {
        if (t > 18 || digits > MAX18 / POW10(t)) return Long.MinValue
        digits * POW10(t)
      } else {
        val k = -t
        if (k >= 19) 0L // digits < 1e18 ⇒ 2·digits < 10^19 ⇒ rounds to 0
        else {
          val q = digits / POW10(k)
          val r = digits % POW10(k)
          if (2L * r >= POW10(k)) q + 1L else q
        }
      }
    if (u > MAX18) return Long.MinValue
    if (neg) -u else u
  }

  def compute(d: Double, s: Int): org.apache.spark.sql.types.Decimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      return null // the ANSI Cast returns NULL for NaN/±Inf (spec-pinned)
    val u = unscaled(d, s)
    if (u == Long.MinValue)
      throw new ArithmeticException(
        s"graft_d2dec: $d cannot be represented as Decimal(18, $s)")
    org.apache.spark.sql.types.Decimal.createUnsafe(u, 18, s)
  }
}

/** Bit-exact fast `cast(a AS decimal(18,6)) * cast(b AS decimal(18,6))`
  * — dsumProd's per-row tax. Spark's path parses TWO toString strings
  * into BigDecimals and multiplies them under MathContext(38): the
  * product of two ≤18-digit scale-6 values is ≤36 digits at scale 12,
  * so no rounding ever happens and the result is exactly
  * unscaled(a,6) × unscaled(b,6) at scale 12. Replay that in longs:
  * when the 128-bit product fits a long (every realistic magnitude —
  * prices × fractions), emit a compact Decimal and the downstream sum
  * stays on the long add fast path; otherwise one BigInteger multiply
  * of two longs (no string parse). Error semantics follow the ANSI
  * casts it replaces (spec-pinned): a NaN/±Inf factor → NULL (the
  * ANSI Cast's NaN result, which Multiply propagates), a factor
  * overflowing decimal(18,6) throws. */
case class DecimalProd18Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dprod expects (double, double), got ($l, $r)")
  }
  override def dataType: DataType = DecimalType(37, 12)
  override def nullable: Boolean = true // NaN/±Inf factor → null
  override def prettyName: String = "graft_dprod"

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalProd18Expr.compute(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = DecimalProd18Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = $g.compute($a, $b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DecimalProd18Expr {
  private val NAN_FACTOR = Long.MinValue + 1 // sentinel: ANSI cast gives NULL

  private def factor(d: Double): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      return NAN_FACTOR
    val u = DoubleToDecimal18Expr.unscaled(d, 6)
    if (u == Long.MinValue)
      throw new ArithmeticException(
        s"graft_dprod: $d cannot be represented as Decimal(18, 6)")
    u
  }

  def compute(a: Double, b: Double): org.apache.spark.sql.types.Decimal = {
    val ua = factor(a)
    if (ua == NAN_FACTOR) return null
    val ub = factor(b)
    if (ub == NAN_FACTOR) return null
    val lo = ua * ub
    val hi = Math.multiplyHigh(ua, ub)
    if (hi == (lo >> 63)) // signed 128-bit product fits in one long
      org.apache.spark.sql.types.Decimal.createUnsafe(lo, 37, 12)
    else
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(ua).multiply(java.math.BigInteger.valueOf(ub)),
        12), 37, 12)
  }
}
