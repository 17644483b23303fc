package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece-style
  * "maximal munch" BPE-apply rule) against a broadcast-small trained
  * vocabulary: the text splits on single spaces; within each word,
  * the longest vocabulary entry prefixing the remaining characters is
  * emitted, falling back to the single character when nothing matches.
  *
  * The vocabulary ships as a plan reference (a trained merge table is
  * tens of thousands of entries — well under broadcast size) and is
  * probed via a HashSet from the longest candidate down, so each
  * position costs at most `maxTokenLen` probes — one linear scan per
  * word, no explode, no shuffle, evaluated inside codegen.
  */
case class GreedyMatchTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty && vocab.forall(v => v.nonEmpty && !v.contains(' ')),
    "vocab entries must be non-empty and contain no spaces")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_match_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }

  @transient private lazy val maxLen: Int = vocab.map(_.length).max

  /** Shared by interpreted eval and the generated code. */
  def encode(text: String): Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = text.split(" ", -1)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var i = 0
      while (i < w.length) {
        var len = math.min(maxLen, w.length - i)
        var tok: String = null
        while (len > 0 && tok == null) {
          val cand = w.substring(i, i + len)
          if (vocabSet.contains(cand)) tok = cand else len -= 1
        }
        if (tok == null) { tok = w.substring(i, i + 1); len = 1 }
        out += UTF8String.fromString(tok)
        i += len
      }
      wi += 1
    }
    out.toArray
  }

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(encode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("greedyTokens", this,
        classOf[GreedyMatchTokens].getName)
      val arrData = classOf[ArrayData].getName
      s"${ev.value} = $arrData.toArrayData($self.encode($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for tokenization expressions. */
object TokenizeFunctions {
  /** Greedy longest-match subword tokens under a fixed vocabulary. */
  def greedyMatchTokens(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.toColumn(GreedyMatchTokens(ColumnBridge.toExpr(text), vocab))
}
