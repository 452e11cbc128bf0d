package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode-normalization kernels for string columns.
  *
  * The reference pipeline need: canonicalize text BEFORE hashing/shingling
  * (dedup keys, BPE pre-tokenization, language-ID features) so that
  * byte-distinct but visually/canonically identical strings collapse. Java
  * ships ICU-grade normalization in `java.text.Normalizer`; these
  * expressions wrap it as codegen'd Catalyst expressions so normalization
  * stays inside whole-stage codegen instead of a boxed Scala UDF (the same
  * rationale as [[VecKernel]]).
  *
  * Fast path: [[TextKernel]] probes `Normalizer.isNormalized` first —
  * ASCII and already-normalized strings (the overwhelming majority of a web
  * corpus) return the INPUT UTF8String with zero allocation; only strings
  * that actually carry marks/compatibility characters pay the
  * decompose/recompose pass.
  */
object TextKernel {
  private val MarksPattern = java.util.regex.Pattern.compile("\\p{M}+")

  /** NFD-decompose, drop all combining marks (Unicode category M), then
    * NFC-recompose: "café" → "cafe", "Ünïted" → "United". Matches the
    * utf8proc-based `strip_accents` of DuckDB/PostgreSQL on Latin input. */
  def foldAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // cheap probe: a string with no char above U+00BF has nothing to fold
    var i = 0
    var ascii = true
    while (ascii && i < str.length) { ascii = str.charAt(i) < 0xC0; i += 1 }
    if (ascii) return s
    val folded = MarksPattern.matcher(Normalizer.normalize(str, Normalizer.Form.NFD))
      .replaceAll("")
    UTF8String.fromString(Normalizer.normalize(folded, Normalizer.Form.NFC))
  }

  /** NFKC compatibility normalization: ﬁ → fi, ² → 2, full-width → ASCII.
    * The standard pre-tokenization canonicalization (GPT-2/SentencePiece
    * lineage). */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }
}

abstract class TextNormExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $t")
  }
  protected def kernelMethod: String
  override protected def nullSafeEval(s: Any): Any = this match {
    case _: FoldAccents => TextKernel.foldAccents(s.asInstanceOf[UTF8String])
    case _: Nfkc        => TextKernel.nfkc(s.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expr.TextKernel.$kernelMethod($s);")
}

case class FoldAccents(child: Expression) extends TextNormExpression {
  override def prettyName: String = "fold_accents"
  override protected def kernelMethod: String = "foldAccents"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class Nfkc(child: Expression) extends TextNormExpression {
  override def prettyName: String = "nfkc"
  override protected def kernelMethod: String = "nfkc"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
