package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

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
      s"""Object $r = $ref.kernel($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${kernelUnbox(s"(($kernelJavaType) $r)")}; }
         |""".stripMargin
    })
}
