package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native fused hash kernels for the dedup operators.
  *
  * The composable formulations — `transform(sequence(...), i ->
  * conv(substr(md5(concat_ws(' ', ...)), 1, 8), 16, 10))` for MinHash
  * shingle hashing, `explode` + `groupBy(doc_id)` with 32 conditional
  * sums for SimHash — evaluate a Catalyst higher-order lambda per
  * array element (interpreted, not codegen'd) and materialize a hex
  * string + two intermediate strings per shingle. These expressions
  * run the whole per-document computation as one compiled loop over
  * the token `ArrayData`: the md5 is fed word bytes + separator
  * incrementally (no shingle string is ever built), and SimHash needs
  * no explode and no shuffle at all.
  *
  * Hash VALUES are bit-identical to the SQL formulation (first 4 md5
  * bytes read big-endian unsigned == `conv(substr(md5_hex, 1, 8), 16,
  * 10)`), so the DuckDB oracles are unchanged — that equivalence is
  * asserted per-operator by the correctness gate and directly by
  * TextHashesSpec.
  */
object TextHashes {

  /** Same constants as the SQL formulation (see
    * [[graft.queries.DedupOps]] — the oracle SQL embeds them). */
  val HashPrime = 4294967311L // smallest prime > 2^32
  val NumHashes = 12

  /** Universal-hash family over one base md5: H_k(x) = (a_k·h32(x) +
    * b_k) mod P. Constants are md5-seeded so both engines embed
    * identical literals; a < 2^30 keeps a·h < 2^62 (h < P ≈ 2^32). */
  lazy val hashParams: IndexedSeq[(Long, Long)] = {
    val md = MessageDigest.getInstance("MD5")
    def gen(tag: String): Long = java.lang.Long.parseLong(
      md.digest(tag.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    (0 until NumHashes).map(k => ((gen(s"a$k") % 1073741823L) | 1L,
      gen(s"b$k") % HashPrime))
  }
  private lazy val hashA: Array[Long] = hashParams.map(_._1).toArray
  private lazy val hashB: Array[Long] = hashParams.map(_._2).toArray

  private val tlMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Space = Array(' '.toByte)

  /** First 4 digest bytes, big-endian unsigned — identical to
    * `conv(substr(md5_hex, 1, 8), 16, 10)`. */
  private def take32(md: MessageDigest): Long = {
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** 12 MinHash mins over the doc's 3-word shingles; null if < 3
    * words. Null elements contribute neither text nor separator —
    * exactly `concat_ws`'s null-skipping, so the kernel stays
    * bit-identical to the SQL formulation on ANY array<string>, not
    * just split() output (KernelPropertySpec generates null tokens).
    * Called from codegen — one invocation per document. */
  def minhashSig(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return null
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      bytes(i) = if (w == null) null else w.getBytes
      i += 1
    }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val md = tlMd.get()
    i = 0
    while (i <= n - 3) {
      md.reset()
      var first = true
      var j = i
      while (j < i + 3) {
        if (bytes(j) != null) {
          if (!first) md.update(Space)
          md.update(bytes(j))
          first = false
        }
        j += 1
      }
      val h = take32(md)
      var k = 0
      while (k < NumHashes) {
        val v = (hashA(k) * h + hashB(k)) % HashPrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 32-bit term-frequency SimHash over the doc's tokens (per
    * occurrence, like the explode it replaces); 0 for an empty array.
    * Null tokens are skipped entirely (the same null discipline as
    * [[minhashSig]]: a null is not a token). */
  def simhashFp(tokens: ArrayData): Long = {
    val sums = new Array[Int](32)
    val md = tlMd.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        md.reset()
        md.update(t.getBytes)
        val h = take32(md)
        var b = 0
        while (b < 32) {
          sums(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Distinct xxhash64 keys of the doc's `ng`-word grams (first-
    * occurrence order, matching `array_distinct`); null below `ng`
    * words. Bit-identical to `xxhash64(words[i], …, words[i+ng-1])` —
    * the same seed-42 left fold over the strings Spark's built-in
    * computes ([[org.apache.spark.sql.catalyst.expressions.XxHash64Function]]). */
  def xxNgrams(words: ArrayData, ng: Int): ArrayData = {
    val n = words.numElements()
    if (n < ng) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long](Math.max(16, n * 2))
    var i = 0
    while (i <= n - ng) {
      var h = 42L
      var j = i
      while (j < i + ng) {
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(words.getUTF8String(j), StringType, h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** 3-gram special case kept for t6's registered name. */
  def xxShingles(words: ArrayData): ArrayData = xxNgrams(words, 3)

  private def checkStringArray(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<string>, got ${other.simpleString}")
    }

  val minhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => MinHashSig(children.head))

  val simhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_fp"),
    new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
    (children: Seq[Expression]) => SimHashFp(children.head))

  val xxShinglesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("xx_shingles"),
    new ExpressionInfo(classOf[XxShingles].getName, "xx_shingles"),
    (children: Seq[Expression]) => XxShingles(children.head))

  private[functions] def buildXxNgrams(children: Seq[Expression]): XxNgrams = {
    require(children.length == 2, "xx_ngrams(words, n) takes exactly 2 arguments")
    require(children(1).foldable, "xx_ngrams(words, n) needs a literal n")
    val ng = children(1).eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        "xx_ngrams: n must be an INT literal, got " +
          s"${children(1).dataType.simpleString} ($other)")
    }
    require(ng >= 1, s"xx_ngrams: n must be >= 1, got $ng")
    XxNgrams(children.head, ng)
  }

  val xxNgramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("xx_ngrams"),
    new ExpressionInfo(classOf[XxNgrams].getName, "xx_ngrams"),
    (children: Seq[Expression]) => buildXxNgrams(children))

  /** Idempotent per-session registration (same pattern as
    * [[VectorDotProduct.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("minhash_sig")))
      reg.createOrReplaceTempFunction(
        "minhash_sig", children => MinHashSig(children.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("simhash_fp")))
      reg.createOrReplaceTempFunction(
        "simhash_fp", children => SimHashFp(children.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("xx_shingles")))
      reg.createOrReplaceTempFunction(
        "xx_shingles", children => XxShingles(children.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("xx_ngrams")))
      reg.createOrReplaceTempFunction(
        "xx_ngrams", buildXxNgrams, "built-in")
  }

  private[functions] def checkMinhash(child: Expression): TypeCheckResult =
    checkStringArray("minhash_sig", child)
  private[functions] def checkSimhash(child: Expression): TypeCheckResult =
    checkStringArray("simhash_fp", child)
  private[functions] def checkXxShingles(child: Expression): TypeCheckResult =
    checkStringArray("xx_shingles", child)
  private[functions] def checkXxNgrams(child: Expression): TypeCheckResult =
    checkStringArray("xx_ngrams", child)
}

/** `minhash_sig(array<string>) → array<long>` — the 12-element MinHash
  * signature of a document's word array (3-word shingles); null below
  * 3 words. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkMinhash(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // the kernel itself returns null below the gram width, even for a
  // non-null input array
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHashes.minhashSig($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `xx_shingles(array<string>) → array<long>` — distinct xxhash64 keys
  * of a document's 3-word shingles (first-occurrence order); null
  * below 3 words. */
case class XxShingles(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkXxShingles(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // the kernel itself returns null below the gram width, even for a
  // non-null input array
  override def nullable: Boolean = true
  override def prettyName: String = "xx_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.xxShingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHashes.xxShingles($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XxShingles =
    copy(child = newChild)
}

/** `xx_ngrams(array<string>, n) → array<long>` — distinct xxhash64
  * keys of a document's n-word grams (first-occurrence order); null
  * below n words. `n` must be a literal. */
case class XxNgrams(child: Expression, ng: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkXxNgrams(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // the kernel itself returns null below the gram width, even for a
  // non-null input array
  override def nullable: Boolean = true
  override def prettyName: String = "xx_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.xxNgrams(input.asInstanceOf[ArrayData], ng)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ng")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHashes.xxNgrams($c, $ng);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XxNgrams =
    copy(child = newChild)
}

/** `simhash_fp(array<string>) → bigint` — 32-bit term-frequency
  * SimHash fingerprint of a document's token array. */
case class SimHashFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkSimhash(child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhashFp(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhashFp($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}
