package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Whole-stage-codegen adapter for the one-argument text/hash kernels
  * (grams, MinHash, SimHash, winnowing, CDC chunking, trigram stats).
  *
  * These expressions were CodegenFallback: correct, but every row in
  * the dedup/text scans paid the interpreted-eval dispatch AND broke
  * the surrounding WholeStageCodegen span (the operators around the
  * call fell out of compiled code too). The per-row bodies are big
  * (regex splits, MD5, string building) so the dispatch itself is
  * minor — the span break is the real cost this removes.
  *
  * The generated Java calls the expression instance's OWN row kernel
  * — the exact nullSafeEval body every parity spec pins — through a
  * plan-reference object: one direct call per row, no interpreted
  * wrapper, and the compiled path cannot drift from the interpreted
  * one because there is only one body. (The [[SliceDistsKernels]]
  * static-object route buys the same guarantee for the vector
  * kernels; here the kernels carry per-expression parameters and
  * lazy regex/digest state, so the instance IS the natural kernel
  * carrier.)
  */
private[functions] trait KernelCodegen extends UnaryExpression {

  /** Public face of nullSafeEval for generated code. */
  final def kernel(input: Any): Any = nullSafeEval(input)

  /** Boxed Java type of the non-null kernel result (the generated
    * cast target).
    */
  protected def kernelJavaType: String

  /** Unbox applied to the cast result — identity for reference
    * types, `.longValue()` etc. for primitives.
    */
  protected def kernelUnbox(cast: String): String = cast

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("kernelExpr", this)
      val r = ctx.freshName("kr")
      // when the child is non-nullable, Catalyst folds ev.isNull to
      // the literal `false` — assigning to it is invalid Java (janino
      // rejected the whole stage and every row paid the interpreted
      // fallback). A non-nullable slot must never see null anyway, so
      // that branch throws instead of assigning.
      val onNull =
        if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(" +
          s""""${prettyName}: null kernel result in a non-nullable slot");"""
      s"""Object $r = $ref.kernel($a);
         |if ($r == null) { $onNull }
         |else { ${ev.value} = ${kernelUnbox(s"(($kernelJavaType) $r)")}; }
         |""".stripMargin
    })
}

/** N-ary sibling of [[KernelCodegen]] for kernels over several child
  * expressions (the FtsMark highlight/snippet family — text + terms +
  * marker arguments). The children evaluate inside the generated code
  * (so a `terms` ARRAY literal or a per-row column both work), their
  * null-or-value results box into one Object[], and the expression
  * instance's own [[kernel]] — the SAME body interpreted eval runs —
  * produces the result: one compiled call per row, no interpreted
  * dispatch, no WholeStageCodegen span break, and the two paths
  * cannot drift because there is only one body.
  *
  * Null contract: the kernel sees every child's value with nulls AS
  * nulls and decides the result itself (highlight treats a null
  * marker as ""; a null text is a null result) — the expression is
  * therefore declared nullable and never uses Catalyst's null-safe
  * shortcut.
  */
private[functions] trait NaryKernelCodegen extends Expression {

  /** Row kernel over the children's evaluated values (null-aware:
    * argument i is null iff child i evaluated to null; a null return
    * is a null result). Interpreted eval and generated code both call
    * exactly this.
    */
  def kernel(args: Array[Any]): Any

  override def eval(input: InternalRow): Any =
    kernel(children.map(_.eval(input)).toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("kernelExpr", this,
      classOf[NaryKernelCodegen].getName)
    // (Object) applies Java's boxing conversion to primitive children
    val args = evals
      .map(e => s"${e.isNull} ? null : (Object) ${e.value}").mkString(", ")
    val r = ctx.freshName("nkr")
    val jt = CodeGenerator.javaType(dataType)
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code = childCode +
      code"""
        |Object $r = $ref.kernel(new Object[] {$args});
        |boolean ${ev.isNull} = ($r == null);
        |$jt ${ev.value} = ${ev.isNull} ?
        |  ${CodeGenerator.defaultValue(dataType)} : (($jt) $r);
        |""".stripMargin)
  }
}
