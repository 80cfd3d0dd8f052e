package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge, GraftImplicitCasts}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the per-row text hot path (r18) — the same
  * discipline as [[HashExpressions]]: the HOF formulations
  * (`transform`/`filter`/`aggregate`) are CodegenFallback, so every
  * enclosing projection evaluates them interpreted per row; one native
  * loop per kernel produces identical values and stays codegen'd.
  */

/** k-token shingles joined with a single space — the native form of
  * `transform(sequence(1, n-k+1), i -> array_join(slice(toks, i, k), ' '))`
  * with the `size < k  => empty` guard folded in. Null elements are
  * skipped exactly like array_join (UTF8String.concatWs). NULL array in,
  * NULL out.
  */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with GraftImplicitCasts {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def prettyName: String = "graft_word_shingles"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements() - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val win = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        win(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val win = ctx.freshName("win")
      s"""
         |final int $m = $a.numElements() - ${k - 1};
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  final Object[] $out = new Object[$m];
         |  final UTF8String[] $win = new UTF8String[$k];
         |  for (int $i = 0; $i < $m; $i++) {
         |    for (int $j = 0; $j < $k; $j++) {
         |      $win[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |    }
         |    $out[$i] = UTF8String.concatWs($sepRef, $win);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of elements contained in a small word set — the native form of
  * `size(filter(toks, t -> t.isInCollection(words)))`: null elements do
  * not count (isInCollection yields NULL, filter drops it). NULL array
  * in, NULL out.
  */
case class StopwordHitsExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with GraftImplicitCasts {
  override def prettyName: String = "graft_stopword_hits"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("words", set, classOf[java.util.HashSet[_]].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
         |final int $n = $a.numElements();
         |int $hits = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Left-fold sum of per-hash bucket weights — the native form of
  * `aggregate(transform(hs, h -> weights[h mod B + 1]), 0.0, (a,x) -> a+x)`
  * in the SAME ascending-element accumulation order, so the double is
  * bit-identical to the HOF fold (and the oracle's ordered list_sum).
  * NULL array in, NULL out; a NULL element yields NULL (element_at of a
  * non-null literal array never returns NULL for valid indexes, and hs
  * arrays are containsNull=false upstream — the guard is for safety).
  */
case class ClassifierScoreExpr(child: Expression, weights: Array[Double])
    extends UnaryExpression with GraftImplicitCasts {
  override def prettyName: String = "graft_classifier_score"
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val b = weights.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += weights(((a.getLong(i) % b) + b).toInt % b)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("weights", weights, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      s"""
         |final int $n = $a.numElements();
         |final int $b = $wRef.length;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $wRef[(int) ((($a.getLong($i) % $b) + $b) % $b)];
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernelExpressions {
  def wordShinglesNative(toks: Column, k: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(toks), k))

  def stopwordHitsNative(toks: Column, words: Seq[String]): Column =
    Bridge.column(StopwordHitsExpr(Bridge.expression(toks), words))

  def classifierScoreNative(hs: Column, weights: Array[Double]): Column =
    Bridge.column(ClassifierScoreExpr(Bridge.expression(hs), weights))
}
