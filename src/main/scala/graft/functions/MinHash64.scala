package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.graftbridge.Bridge

/** Shingle + MinHash kernels as native Catalyst `Expression`s.
  *
  * Why not higher-order functions: Catalyst lambdas are INTERPRETED and the
  * lambda body's subtrees are re-evaluated per element — a k=32 signature
  * written as `transform(0..k, j -> array_min(transform(shingles(text), …)))`
  * re-runs the whole regex/shingle pipeline k times per row (measured 131 s
  * for 5 000 tiny docs at sf0.1). These expressions make one pass over the
  * token array, hash each n-gram shingle once (FNV + splitmix64, the same
  * mix as [[SimHash64]]), and derive the k permutations with two arithmetic
  * mixes per (shingle, j) — ~10 µs/doc instead of ~26 ms.
  */
private[functions] object ShingleKernel {
  /** Hash of the n-gram starting at `i`: FNV over the tokens' UTF-8 bytes
    * joined by a single space (identical string semantics to
    * `array_join(slice(toks, i+1, n), " ")`), splitmix-finalized. No joined
    * string is materialized.
    */
  def gramHash(arr: ArrayData, i: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = 0
    while (t < n) {
      if (t > 0) h = (h ^ 0x20L) * 0x100000001b3L // the joining space
      if (!arr.isNullAt(i + t)) {
        val bytes = arr.getUTF8String(i + t).getBytes
        var b = 0
        while (b < bytes.length) { h = (h ^ (bytes(b) & 0xffL)) * 0x100000001b3L; b += 1 }
      }
      t += 1
    }
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Distinct hashed n-gram shingles (whole-array fallback below n tokens) —
    * the long-domain image of `Dedup.shingles`; set semantics preserved, so
    * Jaccard over these arrays equals Jaccard over the string shingles
    * (64-bit collisions are negligible at document shingle counts).
    */
  def shingleHashes(arr: ArrayData, n: Int): GenericArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array(gramHash(arr, 0, cnt)))
    val out = new Array[Long](cnt - n + 1)
    var i = 0
    while (i <= cnt - n) { out(i) = gramHash(arr, i, n); i += 1 }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) { // in-place dedupe of the sorted hashes
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** k-permutation MinHash signature over the n-gram hashes: permutation j
    * is a splitmix64 remix of (gram hash ^ seed(j)). Duplicates cannot
    * change a min, so no dedupe pass is needed.
    */
  def signature(arr: ArrayData, n: Int, k: Int): GenericArrayData = {
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { // splitmix64 stream of per-permutation seeds
      var z = (j + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      seeds(j) = z ^ (z >>> 31)
      j += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    val cnt = arr.numElements()
    val grams = if (cnt < n) 1 else cnt - n + 1
    val width = if (cnt < n) cnt else n
    var i = 0
    while (i < grams) {
      val h = gramHash(arr, i, width)
      var p = 0
      while (p < k) {
        var z = h ^ seeds(p)
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL // murmur3 fmix-style remix
        z ^= (z >>> 33)
        if (z < mins(p)) mins(p) = z
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

abstract class ShingleExpr extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got $other")
  }
}

/** shingle_hashes64(tokens, n) → array<long> (distinct, sorted). */
case class ShingleHashes64(child: Expression, n: Int) extends ShingleExpr {
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = ShingleKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"($cls.shingleHashes($c, $n))"
    })
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes64 =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes64"
}

/** minhash_sig64(tokens, n, k) → array<long> of length k. */
case class MinHashSig64(child: Expression, n: Int, k: Int) extends ShingleExpr {
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.signature(input.asInstanceOf[ArrayData], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = ShingleKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"($cls.signature($c, $n, $k))"
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSig64 =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig64"
}

object MinHash64 {
  /** Column API: distinct hashed shingles of a token array. */
  def shingleHashes(tokens: Column, n: Int = 3): Column =
    Bridge.column(ShingleHashes64(Bridge.expression(tokens), n))

  /** Column API: k-permutation minhash signature of a token array. */
  def signature(tokens: Column, n: Int = 3, k: Int = 32): Column =
    Bridge.column(MinHashSig64(Bridge.expression(tokens), n, k))
}
