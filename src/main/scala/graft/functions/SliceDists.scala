package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Shared row-level scoring loops, factored so the expressions can
  * CODEGEN into whole-stage spans: interpreted `eval` and generated
  * Java both call the same static method (top-level objects compile
  * with static forwarders), so there is exactly one copy of each
  * kernel's semantics — the doGenCode path cannot drift from the
  * interpreted one the specs pin. Boxed returns carry the null
  * verdicts (SQL SUM-of-empty / poison rules documented per
  * expression).
  */
object SliceDistsKernels {

  /** [[DotFold]]: null on length mismatch or any null element. */
  def dot(av: ArrayData, bv: ArrayData): java.lang.Double = {
    val n = av.numElements()
    if (bv.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      acc += av.getDouble(i) * bv.getDouble(i)
      i += 1
    }
    acc
  }

  /** [[L2Fold]]: same contract as [[dot]]. */
  def l2(av: ArrayData, bv: ArrayData): java.lang.Double = {
    val n = av.numElements()
    if (bv.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val d = av.getDouble(i) - bv.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** [[SubVec]]: zip_with-parity element-wise a − b, null-padded. */
  def sub(av: ArrayData, bv: ArrayData): ArrayData = {
    val an = av.numElements()
    val bn = bv.numElements()
    val n = math.max(an, bn)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (i >= an || i >= bn || av.isNullAt(i) || bv.isNullAt(i)) null
        else java.lang.Double.valueOf(av.getDouble(i) - bv.getDouble(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[SignPack]]: null poison on a null element. */
  def signPack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      if (arr.getDouble(i) > 0.0)
        out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** [[HammingFold]]: loud on width mismatch. */
  def hamming(x: Array[Byte], y: Array[Byte]): Int = {
    require(x.length == y.length,
      s"hamming_fold: blob widths differ (${x.length} vs ${y.length} bytes) " +
        "— code table and query packed from different-dim vectors")
    var acc = 0
    var i = 0
    while (i < x.length) {
      acc += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xff)
      i += 1
    }
    acc
  }

  /** [[CodeDotQ]] over the persisted blob layout. */
  def codeDotBlob(blob: Array[Byte], ws: ArrayData): java.lang.Long = {
    val n = math.min(blob.length, ws.numElements())
    var acc = 0L
    var saw = false
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        acc += math.floor(ws.getDouble(i) * (blob(i) & 0xff) * 1e6).toLong
        saw = true
      }
      i += 1
    }
    if (saw) java.lang.Long.valueOf(acc) else null
  }

  /** [[CodeDotQ]] over the inline array<int> layout. */
  def codeDotArr(codes: ArrayData, ws: ArrayData): java.lang.Long = {
    val n = math.min(codes.numElements(), ws.numElements())
    var acc = 0L
    var saw = false
    var i = 0
    while (i < n) {
      if (!codes.isNullAt(i) && !ws.isNullAt(i)) {
        acc += math.floor(ws.getDouble(i) * codes.getInt(i) * 1e6).toLong
        saw = true
      }
      i += 1
    }
    if (saw) java.lang.Long.valueOf(acc) else null
  }

  /** [[AdcDist]]: loud on books/codes disagreement, null poison on a
    * null LUT slot or empty blob.
    */
  def adc(codes: Array[Byte], lut: ArrayData): java.lang.Long = {
    val slices = codes.length
    if (slices == 0) return null
    val m = lut.numElements()
    require(m % slices == 0,
      s"adc_dist: LUT length $m is not a multiple of the $slices-byte blob")
    val k = m / slices
    var acc = 0L
    var s = 0
    while (s < slices) {
      val code = codes(s) & 0xff
      require(code < k,
        s"adc_dist: code $code at subspace $s exceeds the $k-entry book")
      val i = s * k + code
      if (lut.isNullAt(i)) return null
      acc += lut.getLong(i)
      s += 1
    }
    acc
  }
}

/** Native per-subspace squared-L2 — the product-quantization inner
  * loop (encode argmin and ADC LUT build both start from it). One
  * row-level pass replaces a `slices`-wide array of interpreted
  * higher-order chains (`aggregate(zip_with(slice…, slice…))` per
  * subspace): per (vector, centroid) row the HOF form allocates 3
  * intermediate arrays per subspace and evaluates every lambda
  * through the interpreter, which dominates the PQ queries' profile
  * exactly as the gram chains dominated the text queries' before
  * round 5's CharGrams/WordGrams (same displacement, same reasoning
  * — SURVEY.md §4.3 expression-over-UDF order).
  *
  * BIT-EXACT by construction: each subspace distance is the same
  * sequential left-fold `((0+d0)+d1)+…` over the same index order the
  * HOF chain (and the DuckDB oracle's list_reduce) evaluates, so the
  * oracle rows cannot move. GramsSpec-style parity is pinned in
  * SliceDistsSpec. Scope: the drop-in claim holds for fixed-dim
  * corpora (>= slices*subDim elements). For undersized vectors the
  * HOF chain silently yielded d=0.0 (empty slice → empty zip_with →
  * fold identity); this expression instead fails loudly by design —
  * an intentional divergence, pinned by SliceDistsSpec's
  * "fail loudly" case.
  *
  * Codegen'd via the reference-object kernel pattern: the
  * per-subspace loop still runs as one call, but the surrounding
  * operators stay inside their whole-stage span.
  */
case class SliceL2Dists(
    left: Expression, right: Expression, slices: Int, subDim: Int)
    extends BinaryExpression {
  require(slices >= 1 && subDim >= 1,
    s"slices/subDim must be positive: $slices/$subDim")

  /** Public face of nullSafeEval for generated code (the
    * KernelCodegen pattern, binary-arity form: params and the
    * per-subspace loop live on the instance, referenced from the
    * compiled span so the surrounding operators stay compiled).
    */
  def kernel(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("sliceL2Expr", this)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.kernel($a, $b);"
    })

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      // d IS nullable: a null element anywhere in a subspace nulls
      // that subspace's distance, exactly as the HOF chain's
      // zip_with → aggregate propagated it
      StructField("d", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "slice_l2_dists"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> columns, got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val need = slices * subDim
    require(av.numElements() >= need && bv.numElements() >= need,
      s"$prettyName: vectors must hold at least $need elements " +
        s"(got ${av.numElements()}, ${bv.numElements()})")
    val out = new Array[Any](slices)
    var s = 0
    while (s < slices) {
      var acc = 0.0
      var sawNull = false
      var i = s * subDim
      val end = i + subDim
      while (i < end) {
        if (av.isNullAt(i) || bv.isNullAt(i)) sawNull = true
        else {
          val d = av.getDouble(i) - bv.getDouble(i)
          acc += d * d
        }
        i += 1
      }
      out(s) =
        if (sawNull) InternalRow(s, null) // HOF parity: null poisons the slice
        else InternalRow(s, acc)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SliceL2Dists =
    copy(left = newLeft, right = newRight)
}

/** Native sequential left-fold dot product — the cosine family's
  * inner loop (brute-force top-k, IVF assignment, semantic dedup,
  * embedding near-dup, k-means, LSH projections all start from it).
  * Same displacement as [[SliceL2Dists]]: the HOF chain
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an
  * intermediate product array and interprets two lambdas per element.
  *
  * BIT-EXACT: `((0+p0)+p1)+…` in index order, matching both the HOF
  * form and the DuckDB oracle's list_reduce. NULL-faithful to the HOF
  * chain: any null element — including zip_with's padding when the
  * arrays' lengths differ — nulls the whole sum.
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> columns, got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SliceDistsKernels.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // codegen'd into the whole-stage span: the generated Java calls the
  // SAME static kernel the interpreted eval uses, so the two paths
  // cannot drift — what the spec pins interpreted holds compiled
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotr")
      s"""java.lang.Double $r = graft.functions.SliceDistsKernels.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Native whole-array squared-L2 fold — [[DotFold]]'s sibling for the
  * store-side PQ paths (subvector encode argmin, codebook training,
  * ADC LUT build), whose arrays arrive already sliced. Same order,
  * same null semantics as `aggregate(zip_with(a, b, (x,y) =>
  * (x-y)*(x-y)), 0.0, _+_)`.
  */
case class L2Fold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_fold"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> columns, got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SliceDistsKernels.l2(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("l2r")
      s"""java.lang.Double $r = graft.functions.SliceDistsKernels.l2($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Fold =
    copy(left = newLeft, right = newRight)
}

/** Native element-wise vector subtraction — the residual step of the
  * IVF/IVF+PQ paths (`r = e − centroid[cell]`), displacing the last
  * interpreted `zip_with(a, b, (x, y) => x - y)` in the ANN family.
  * Array-producing sibling of [[DotFold]]/[[L2Fold]]: one row-level
  * pass, no lambda interpretation, no closure allocation per element.
  *
  * BIT-EXACT drop-in for the zip_with form, padding included: the
  * output has max(|a|, |b|) elements, an element is null wherever
  * either input is null OR past its array's end (zip_with pads the
  * shorter array with nulls, and x − null = null), and each non-null
  * element is the same single IEEE-754 subtraction — element-wise, so
  * there is no fold order to preserve.
  */
case class SubVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "sub_vec"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> columns, got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SliceDistsKernels.sub(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SliceDistsKernels.sub($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubVec =
    copy(left = newLeft, right = newRight)
}

/** Pack SQ8 codes (array<int>, each in [0, 255]) into a BinaryType
  * blob, one unsigned byte per dimension — the FAISS uint8 layout.
  * An int array spends 4 bytes per element in Tungsten rows and
  * columnar batches; the blob is the real 4×-vs-float32 density the
  * SQ8 story claims, in memory and on the wire, not just after
  * parquet bit-packing. Null elements (impossible from the encode
  * aggregate, possible after out-of-band edits) poison the blob to
  * NULL rather than fabricating a code.
  */
case class PackCodes(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String = "byte[]"

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pack_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<int>, got $t")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = (arr.getInt(i) & 0xff).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): PackCodes = copy(child = newChild)
}

/** Native quantized weighted-dot over SQ8 codes — the scoring
  * kernel of the [[graft.store.Sq]]/[[graft.store.IvfSq]] search paths:
  *
  *   Σ_d floor(w_d · code_d · 1e6)  as long
  *
  * The code side is either the persisted BinaryType blob (one
  * unsigned byte per dimension, the [[PackCodes]] layout) or an
  * array<int> (the inline oracle queries, whose codes never leave the
  * plan) — same math either way.
  *
  * Replaces the posexplode → equi-join-on-pos → groupBy(query, cand)
  * formulation: that shape is correct and partial-agg-bounded, but it
  * materializes d× intermediate rows per (query, candidate) and pays
  * an aggregate exchange keyed on the pair. As one row-level fold the
  * scan side stays map-only — codes stream past a broadcast of
  * per-query weight arrays, and the only remaining exchange is the
  * top-k window's.
  *
  * BIT-EXACT vs the aggregate form: each per-dim term is the same
  * `floor(w·code·1e6)` long, and long addition is associative and
  * commutative, so the fold equals the partial-agg sum for any
  * partitioning — oracle rows cannot move. Null semantics mirror
  * SQL SUM over the joined per-dim rows: null elements are SKIPPED,
  * and a fold with zero contributing terms yields NULL (SUM of an
  * empty group). Positions beyond the shorter array contribute
  * nothing, exactly as the pos equi-join dropped them.
  */
case class CodeDotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "code_dot_q"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => true
      case (BinaryType, ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int> | binary codes, array<double> " +
        s"weights), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ws = b.asInstanceOf[ArrayData]
    a match {
      case blob: Array[Byte] => SliceDistsKernels.codeDotBlob(blob, ws)
      case codes: ArrayData => SliceDistsKernels.codeDotArr(codes, ws)
    }
  }

  // the code layout is known at PLAN time (left.dataType), so the
  // generated Java calls the right kernel directly — no per-row
  // instanceof, and the fold sits inside the whole-stage span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val kernel =
        if (left.dataType == BinaryType) "codeDotBlob" else "codeDotArr"
      val r = ctx.freshName("cdq")
      s"""java.lang.Long $r = graft.functions.SliceDistsKernels.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodeDotQ =
    copy(left = newLeft, right = newRight)
}

/** Native ADC distance over packed PQ codes — the product-quantization
  * scoring kernel: with the per-query LUT flattened row-major by
  * (subspace, codeword) into an array<long> of `slices × k` quantized
  * distances,
  *
  *   adist = Σ_s lut[s·k + code_s]
  *
  * as one row-level fold of the candidate's code blob. Replaces the
  * explode → equi-join-on-(s, code) → groupBy(query, cand) shape: same
  * longs, long addition commutes, so distances are bit-identical to
  * the aggregate form — but the scan side is map-only, no per-slice
  * row blowup, no aggregate exchange keyed on the pair.
  *
  * The codeword count k is inferred as `lut.length / codes.length`
  * (the blob length IS the subspace count); a LUT that doesn't divide
  * evenly, or a code beyond k, fails loudly — that is Doctor's
  * books-and-codes-disagree corruption, not a scoring input. A NULL
  * result (empty blob or a null LUT slot) marks a row the aggregate
  * form would simply not have produced; callers filter it, preserving
  * "corrupt candidates are absent, not ranked".
  */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary codes, array<bigint> lut), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SliceDistsKernels.adc(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("adcr")
      s"""java.lang.Long $r = graft.functions.SliceDistsKernels.adc($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

/** Native sign-bit binarization — the 1-bit/dim rung of the
  * quantization ladder (float32 32× → SQ8 4× → PQ → THIS), the FAISS
  * binary-index recipe (`IndexBinaryFlat`'s storage side): bit d is
  * set iff x_d > 0. For zero-centered embedding dims the sign bits
  * preserve angular locality (Charikar's hyperplane-LSH argument with
  * the standard basis as the hyperplanes), which is why
  * hamming-then-rerank works as a serving shortlist.
  *
  * Layout: byte i carries dims 8i..8i+7, dim 8i at the LEAST
  * significant bit; ceil(n/8) bytes, trailing pad bits zero. The
  * convention is pinned by SliceDistsSpec and assumed by
  * [[HammingFold]] (pad bits equal on both sides → never contribute).
  * Null elements poison the blob to NULL, the [[PackCodes]] rule —
  * a fabricated 0-bit would silently rank the row. NaN codes to 0
  * (Java NaN comparisons are all false); the DuckDB oracle spells
  * this explicitly (`AND NOT isnan`) because DuckDB sorts NaN ABOVE
  * every value, where `NaN > 0` would otherwise be true.
  */
case class SignPack(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "sign_pack"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    SliceDistsKernels.signPack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("spr")
      s"""byte[] $r = graft.functions.SliceDistsKernels.signPack($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignPack = copy(child = newChild)
}

/** Native Hamming distance between two [[SignPack]] blobs: popcount
  * of the bytewise XOR — the binary-index scoring kernel. One integer
  * per (candidate, query) from a map-only scan; candidates stream
  * past a broadcast of packed query rows and the only exchange left
  * is the top-k window's (the [[CodeDotQ]] shape at 1 bit/dim).
  *
  * Length mismatch fails loudly: two blobs of different widths mean
  * the code table and the query were packed from different-dim
  * vectors — that is Doctor's corruption class, not a distance.
  */
case class HammingFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_fold"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary, binary), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SliceDistsKernels.hamming(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  // the binary scan's entire per-row cost IS this call — codegen'd so
  // the popcount loop sits inside the whole-stage span instead of
  // behind an interpreted-eval virtual dispatch per candidate row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SliceDistsKernels.hamming($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingFold =
    copy(left = newLeft, right = newRight)
}

object SliceDists {
  /** Registry/extension builder for slice_l2_dists: literal
    * slices/subDim args.
    */
  val sliceL2Builder: Seq[Expression] => Expression = exprs => {
    val n = exprs(2).eval()
    val m = exprs(3).eval()
    require(n != null && m != null,
      "slice_l2_dists: slices/subDim must be non-null literals")
    SliceL2Dists(exprs(0), exprs(1),
      n.asInstanceOf[Number].intValue, m.asInstanceOf[Number].intValue)
  }

  def register(spark: SparkSession): Unit = {
    // idempotent on the hot path (the BloomFns guard pattern)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("slice_l2_dists")))
      reg.createOrReplaceTempFunction(
        "slice_l2_dists", sliceL2Builder, "scala_udf")
  }

  /** Array of (s, d) structs: per-subspace squared L2 of `a` vs `b`. */
  def sliceL2(
      spark: SparkSession, a: Column, b: Column,
      slices: Int, subDim: Int): Column = {
    register(spark)
    call_function("slice_l2_dists", a, b, lit(slices), lit(subDim))
  }

  def registerDot(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("dot_fold")))
      reg.createOrReplaceTempFunction(
        "dot_fold", exprs => DotFold(exprs(0), exprs(1)), "scala_udf")
  }

  /** Sequential left-fold dot product of two array<double> columns. */
  def dotFold(spark: SparkSession, a: Column, b: Column): Column = {
    registerDot(spark)
    call_function("dot_fold", a, b)
  }

  def registerL2(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("l2_fold")))
      reg.createOrReplaceTempFunction(
        "l2_fold", exprs => L2Fold(exprs(0), exprs(1)), "scala_udf")
  }

  /** Sequential left-fold squared L2 of two array<double> columns. */
  def l2Fold(spark: SparkSession, a: Column, b: Column): Column = {
    registerL2(spark)
    call_function("l2_fold", a, b)
  }

  def registerSub(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("sub_vec")))
      reg.createOrReplaceTempFunction(
        "sub_vec", exprs => SubVec(exprs(0), exprs(1)), "scala_udf")
  }

  /** Element-wise a − b of two array<double> columns (zip_with parity). */
  def subVec(spark: SparkSession, a: Column, b: Column): Column = {
    registerSub(spark)
    call_function("sub_vec", a, b)
  }

  def registerCodeDot(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("code_dot_q")))
      reg.createOrReplaceTempFunction(
        "code_dot_q", exprs => CodeDotQ(exprs(0), exprs(1)), "scala_udf")
  }

  /** Σ floor(w_d·code_d·1e6) as long over (array<int> | binary codes,
    * array<double> weights).
    */
  def codeDotQ(spark: SparkSession, codes: Column, weights: Column): Column = {
    registerCodeDot(spark)
    call_function("code_dot_q", codes, weights)
  }

  def registerPack(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("pack_codes")))
      reg.createOrReplaceTempFunction(
        "pack_codes", exprs => PackCodes(exprs(0)), "scala_udf")
  }

  /** array<int> codes in [0, 255] → one-unsigned-byte-per-dim binary. */
  def packCodes(spark: SparkSession, codes: Column): Column = {
    registerPack(spark)
    call_function("pack_codes", codes)
  }

  def registerAdc(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("adc_dist")))
      reg.createOrReplaceTempFunction(
        "adc_dist", exprs => AdcDist(exprs(0), exprs(1)), "scala_udf")
  }

  /** Σ_s lut[s·k + code_s] over (binary codes, flattened array<long>
    * LUT); k inferred as lut.length / codes.length.
    */
  def adcDist(spark: SparkSession, codes: Column, lut: Column): Column = {
    registerAdc(spark)
    call_function("adc_dist", codes, lut)
  }

  def registerSignPack(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("sign_pack")))
      reg.createOrReplaceTempFunction(
        "sign_pack", exprs => SignPack(exprs(0)), "scala_udf")
  }

  /** array<double> → sign-bit blob (bit d set iff x_d > 0, LSB-first,
    * ceil(n/8) bytes).
    */
  def signPack(spark: SparkSession, vec: Column): Column = {
    registerSignPack(spark)
    call_function("sign_pack", vec)
  }

  def registerHamming(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_fold")))
      reg.createOrReplaceTempFunction(
        "hamming_fold", exprs => HammingFold(exprs(0), exprs(1)), "scala_udf")
  }

  /** Popcount of the bytewise XOR of two equal-width [[SignPack]]
    * blobs.
    */
  def hammingFold(spark: SparkSession, a: Column, b: Column): Column = {
    registerHamming(spark)
    call_function("hamming_fold", a, b)
  }
}
