package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge, GraftImplicitCasts}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}

/** Native kernels for the MinHash/SimHash hot path.
  *
  * The HOF formulations iterate the hash array inside per-seed / per-bit
  * lambdas; besides interpreted-lambda overhead, Catalyst Columns are
  * trees (not DAGs), so the optimizer's CollapseProject can inline the
  * md5 hashing pass into a lambda that then re-evaluates it once per seed
  * (16x) or per bit (32x) per row. A single native loop computes the
  * whole signature in one pass, is bit-exact with the DuckDB oracle
  * (pure int64 arithmetic), and stays inside whole-stage codegen.
  *
  * Null semantics: NULL input or any NULL element yields NULL.
  */

/** MinHash signature from an array<long> of element hashes: for seed i in
  * [0, numHashes), min over h of ((i+1)*h + i) mod 1e9+7. Exact in int64:
  * h < 2^32, i+1 <= numHashes (small). Empty input yields NULL (callers
  * filter empty shingle sets out first).
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with GraftImplicitCasts {
  override def prettyName: String = "graft_minhash"
  // SQL registry path: coerce (array<int>) or reject instead of getLong
  // misreading whatever ArrayData arrives
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val res = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val h = a.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = ((j + 1) * h + j) % 1000000007L
        if (v < res(j)) res(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val res = ctx.freshName("res")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $res = new long[$numHashes];
         |  java.util.Arrays.fill($res, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $v = (($j + 1) * $h + $j) % 1000000007L;
         |      if ($v < $res[$j]) $res[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash from an array<long> of element hashes: bit i of the
  * result is set iff sum over elements of (+1 if bit i of h else -1) > 0.
  * Empty input yields 0 (matches the fold-from-zero HOF semantics).
  */
case class SimHashFromHashes(child: Expression, bits: Int = 32)
    extends UnaryExpression with GraftImplicitCasts {
  require(bits >= 1 && bits <= 63, s"simhash bits must be in [1, 63], got $bits")
  override def prettyName: String = "graft_simhash"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val h = a.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($counts[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** h32 of every element of an array<string>: the first 4 md5 bytes as an
  * unsigned big-endian long — identical to
  * `conv(substring(md5(s), 1, 8), 16, 10)` (TextFunctions.h32) and to the
  * oracle's `CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)`, but one native
  * loop instead of a per-element expression tree (md5 -> hex string ->
  * substring -> base-16 parse).
  */
/** First `bits` bits of each element's md5 as a non-negative long —
  * computed as the big-endian 64-bit read of digest bytes 0..7 shifted
  * right unsigned by (64 - bits). For bits divisible by 4 this equals
  * the oracle's `CAST('0x' || substr(md5(s), 1, bits/4) AS BIGINT)`
  * (bits = 32 → the historic h32; bits = 60 → the wide-fingerprint
  * variant that stays < 2^60, safely positive in a signed BIGINT on
  * both engines).
  */
case class ArrayH32(child: Expression, bits: Int = 32)
    extends UnaryExpression with GraftImplicitCasts {
  require(bits >= 4 && bits <= 60, s"hash bits must be in [4, 60], got $bits")
  override def prettyName: String = "graft_h32_array"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def be64(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val res = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = md.digest(a.getUTF8String(i).getBytes)
      res(i) = be64(d) >>> (64 - bits)
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val res = ctx.freshName("res")
      val md = ctx.freshName("md")
      s"""
         |final int $n = $a.numElements();
         |final long[] $res = new long[$n];
         |java.security.MessageDigest $md;
         |try { $md = java.security.MessageDigest.getInstance("MD5"); }
         |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final byte[] $d = $md.digest($a.getUTF8String($i).getBytes());
         |  $res[$i] = (((($d[0] & 0xffL) << 56) | (($d[1] & 0xffL) << 48) |
         |    (($d[2] & 0xffL) << 40) | (($d[3] & 0xffL) << 32) |
         |    (($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) |
         |    (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL)) >>> ${64 - bits});
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rabin–Karp rolling polynomial hash over a byte payload: element p of
  * the result is Σ_j bytes(p+j)·base^(window−1−j) mod `mod` for every
  * window position p in [0, n−window] — computed INCREMENTALLY, O(1) per
  * position after the first window (subtract the outgoing byte's
  * base^(w−1) term, multiply by base, add the incoming byte), where the
  * naive per-window sum is O(window) per position. The true "rolling"
  * fingerprint primitive behind Karp–Rabin matching, CDC chunking, and
  * pre-winnowing fingerprint sampling. Empty result for payloads shorter
  * than the window. mod ≤ 2^30ish keeps every intermediate in a long.
  */
case class RollingPolyHash(child: Expression, window: Int, base: Long, mod: Long)
    extends UnaryExpression with GraftImplicitCasts {
  // base is bounded too: the incremental step computes h*base and
  // byte*topPow on raw longs, so (mod-1)*base (and 255*topPow ≤ 255*(mod-1))
  // must stay under 2^63 — with mod ≤ 2^31 any base ≤ 2^31 is safe, and an
  // oversized base must fail construction rather than silently overflow
  // the intermediates into wrong (not erroring) hashes.
  require(window >= 1 && base > 0 && base <= (1L << 31) &&
      mod > 1 && mod <= (1L << 31),
    s"bad rolling-hash params: window=$window base=$base mod=$mod")
  override def prettyName: String = "graft_rolling_hash"
  override def graftInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** base^(window-1) mod `mod` — the outgoing byte's coefficient. */
  private lazy val topPow: Long = {
    var r = 1L; var i = 0
    while (i < window - 1) { r = r * base % mod; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * base + (b(i) & 0xffL)) % mod; i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - window) {
      h = ((h - (b(p - 1) & 0xffL) * topPow % mod + mod * 256L) % mod * base +
        (b(p + window - 1) & 0xffL)) % mod
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |final int $n = $a.length;
         |final long[] $out = new long[$n < $window ? 0 : $n - $window + 1];
         |if ($n >= $window) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $window; $i++) {
         |    $h = ($h * ${base}L + ($a[$i] & 0xffL)) % ${mod}L;
         |  }
         |  $out[0] = $h;
         |  for (int $p = 1; $p <= $n - $window; $p++) {
         |    $h = (($h - ($a[$p - 1] & 0xffL) * ${topPow}L % ${mod}L + ${mod}L * 256L)
         |      % ${mod}L * ${base}L + ($a[$p + $window - 1] & 0xffL)) % ${mod}L;
         |    $out[$p] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  def minhashNative(hs: Column, numHashes: Int): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hs), numHashes))

  def simhashNative(hs: Column, bits: Int = 32): Column =
    Bridge.column(SimHashFromHashes(Bridge.expression(hs), bits))

  def h32ArrayNative(strs: Column, bits: Int = 32): Column =
    Bridge.column(ArrayH32(Bridge.expression(strs), bits))

  def rollingHashNative(bytes: Column, window: Int, base: Long, mod: Long): Column =
    Bridge.column(RollingPolyHash(Bridge.expression(bytes), window, base, mod))
}
