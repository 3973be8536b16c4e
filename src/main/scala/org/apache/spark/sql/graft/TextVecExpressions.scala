package org.apache.spark.sql.graft

import graft.functions.{TextKernels, VecKernels}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expressions for the training-data-pipeline surface:
  * MinHash / SimHash / language-ID / fingerprint over text, cosine and
  * LSH signatures over float32 embedding vectors. All deterministic,
  * null-intolerant, and kept inside WholeStageCodegen.
  */

object TextVecExpr {
  val TK = "graft.functions.TextKernels"
  val VK = "graft.functions.VecKernels"
  val floatArray: AbstractDataType = ArrayType(FloatType)
}

/** simhash64(text) → 64-bit SimHash of 3-word shingles. */
case class TextSimhash(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.simhash64(t.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"${TextVecExpr.TK}.simhash64($t.toString())")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** minhash_sig(text, numHashes) → array<bigint> MinHash signature. */
case class TextMinhash(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    new GenericArrayData(
      TextKernels.minhashSig(t.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ${TextVecExpr.TK}.minhashSig($t.toString(), $n));""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** jaro_sim(a, b) → Jaro similarity over UTF-8 bytes (DuckDB-exact;
  * semantics pinned in [[graft.functions.TextKernels.jaroBytes]]). */
case class JaroSim(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroBytes(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${TextVecExpr.TK}.jaroBytes($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** jaro_winkler(a, b) → Jaro–Winkler similarity over UTF-8 bytes
  * (DuckDB-exact: boost only above 0.7, 4-byte prefix cap, scale 0.1;
  * see [[graft.functions.TextKernels.jaroWinklerBytes]]). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinklerBytes(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${TextVecExpr.TK}.jaroWinklerBytes($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** damerau_levenshtein(a, b) → unrestricted Damerau–Levenshtein edit
  * distance over UTF-8 bytes (DuckDB-exact; see
  * [[graft.functions.TextKernels.damerauLevenshteinBytes]]). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshteinBytes(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${TextVecExpr.TK}.damerauLevenshteinBytes($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** jaccard_ch(a, b) → byte-set Jaccard similarity (DuckDB `jaccard`
  * semantics: sets not multisets, byte-level, empty input rejected). */
case class JaccardCh(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_ch"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardBytes(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${TextVecExpr.TK}.jaccardBytes($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** hamming_str(a, b) → byte Hamming distance; throws on unequal
  * lengths exactly like DuckDB's `hamming`. (The 64-bit fingerprint
  * popcount is the separate `hamming64`.) */
case class HammingStr(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_str"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.hammingBytes(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${TextVecExpr.TK}.hammingBytes($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** lang_id(text) → heuristic language code (en/de/fr/es/zh/und). */
case class TextLangId(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(t: Any): Any =
    UTF8String.fromString(TextKernels.langId(t.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"UTF8String.fromString(${TextVecExpr.TK}.langId($t.toString()))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** script_counts(text) → array<int> of codepoint counts for
  * [Latin, Cyrillic, Han, Arabic, ASCII digit] in ONE pass — the fused
  * form of five `length(regexp_replace(..))` script probes (identical
  * counts AND int type, ~5x less string scanning; semantics pinned in
  * [[graft.functions.TextKernels.scriptCounts]]). */
case class ScriptCounts(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "script_counts"
  override protected def nullSafeEval(t: Any): Any =
    new GenericArrayData(
      TextKernels.scriptCounts(t.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ${TextVecExpr.TK}.scriptCounts($t.toString()));""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** text_fingerprint(text) → 64-bit whitespace-normalized rolling hash. */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "text_fingerprint"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.fingerprint64(t.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"${TextVecExpr.TK}.fingerprint64($t.toString())")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** hamming64(a, b) → bit distance between two 64-bit hashes. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.hammingDistance64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_cosine(a, b) → cosine similarity of two float32 vectors. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray, TextVecExpr.floatArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${TextVecExpr.VK}.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_dot(a, b) → dot product of two float32 vectors. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray, TextVecExpr.floatArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${TextVecExpr.VK}.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_norm(a) → L2 norm of a float32 vector. */
case class VecNorm(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.normF(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${TextVecExpr.VK}.normF($a)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** vec_normalize(v) → unit-L2 float32 vector (zero vectors unchanged). */
case class VecNormalize(child: Expression)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_normalize"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.normalizeF(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${TextVecExpr.VK}.normalizeF($a)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** vec_truncate(v, dim) → Matryoshka prefix, re-normalized to unit L2. */
case class VecTruncate(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray, IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_truncate"
  override protected def nullSafeEval(a: Any, d: Any): Any =
    VecKernels.truncateF(a.asInstanceOf[ArrayData], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, d) => s"${TextVecExpr.VK}.truncateF($a, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_nearest_centroid(v, centroids) → index of the best-cosine centroid
  * (IVF coarse assignment; centroids arrive as a folded literal). */
case class VecNearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TextVecExpr.floatArray, ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest_centroid"
  override protected def nullSafeEval(v: Any, c: Any): Any =
    VecKernels.nearestCentroid(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"${TextVecExpr.VK}.nearestCentroid($v, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_nearest_centroid over a BROADCAST codebook: the (centroids,
  * per-centroid norms) payload is computed ONCE on the driver and ships
  * once per executor through the torrent broadcast (never inside task
  * binaries or the plan) — norms ride inside the broadcast value, so no
  * per-task recomputation (an expression instance is deserialized per
  * task; anything lazily derived on it reruns per task, not per
  * executor). Same exact argmax as [[VecNearestCentroid]] —
  * [[VecKernels.nearestCentroidDirect]] preserves cosineF's
  * accumulation order, so results are bit-identical to the literal
  * path. CodegenFallback is deliberate: the k·dim scan inside the
  * kernel dwarfs the one virtual call per row, and the broadcast handle
  * cannot ride through codegen'd literals anyway. */
case class VecNearestCentroidBcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Float]], Array[Double])])
    extends UnaryExpression with GeoExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest_centroid_bcast"
  // a broadcast handle is never foldable, whatever the child says
  override def foldable: Boolean = false
  override protected def nullSafeEval(v: Any): Any =
    VecKernels.nearestCentroidDirect(v.asInstanceOf[ArrayData], bc.value._1, bc.value._2)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Top-`nProbe` centroid indices by cosine over a BROADCAST codebook,
  * best-first, score ties to the higher index — the probe-selection
  * companion of [[VecNearestCentroidBcast]] for IVF search at
  * production nlist, where the literal array-of-structs scorer would
  * fold the whole codebook into every task binary. Same broadcast
  * payload layout (centroids, per-centroid norms), same
  * CodegenFallback rationale: the nlist·dim scan dwarfs one virtual
  * call per row. */
case class VecTopCentroidsBcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Float]], Array[Double])],
    nProbe: Int)
    extends UnaryExpression with GeoExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_top_centroids_bcast"
  override def foldable: Boolean = false
  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecKernels.topCentroidsDirect(v.asInstanceOf[ArrayData],
        bc.value._1, bc.value._2, nProbe))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** vec_lsh_probes(a, nPlanes, seed, nProbe) → margin-aware multi-probe
  * bucket sequence (exact bucket + nProbe lowest-margin flips), ordered by
  * collision probability. Query-side companion of [[VecLshSig]]. */
case class VecLshProbes(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TextVecExpr.floatArray, IntegerType, LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "vec_lsh_probes"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else new GenericArrayData(VecKernels.hyperplaneProbes(
      vs(0).asInstanceOf[ArrayData], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Int]))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ${TextVecExpr.VK}.hyperplaneProbes(${evs(0).value}, ${evs(1).value},
            ${evs(2).value}, ${evs(3).value}));
      }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** vec_lsh_sig(a, nPlanes, seed) → random-hyperplane sign bits (LSH bucket). */
case class VecLshSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TextVecExpr.floatArray, IntegerType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_lsh_sig"
  override protected def nullSafeEval(a: Any, n: Any, s: Any): Any =
    VecKernels.hyperplaneSig(a.asInstanceOf[ArrayData], n.asInstanceOf[Int], s.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n, s) => s"${TextVecExpr.VK}.hyperplaneSig($a, $n, $s)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** PQ-encode over a BROADCAST codebook: each corpus vector becomes m
  * one-byte sub-centroid codes (the 16-32x-compressed inverted-list
  * payload of IVF-PQ). The (flat codebook, m, ksub) payload ships once
  * per executor via torrent broadcast — never inside task binaries or
  * the plan (the D*ksub-float codebook is exactly the payload size
  * [[VecNearestCentroidBcast]] exists to keep out of them). Same
  * CodegenFallback rationale: the m*ksub*dsub distance scan inside the
  * kernel dwarfs one virtual call per row. */
case class PqEncodeBcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Float], Int, Int)])
    extends UnaryExpression with GeoExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TextVecExpr.floatArray)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode_bcast"
  // a broadcast handle is never foldable, whatever the child says
  override def foldable: Boolean = false
  override protected def nullSafeEval(v: Any): Any =
    VecKernels.pqEncode(v.asInstanceOf[ArrayData],
      bc.value._1, bc.value._2, bc.value._3)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_adc(lut, codes, ksub) → asymmetric-distance score: the approximate
  * inner product of the query behind `lut` with the PQ reconstruction of
  * `codes`. The per-(query, candidate) hot path of IVF-PQ search — m
  * table lookups, fully codegen'd; the LUT rides the broadcast query
  * side, computed once per query. */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TextVecExpr.floatArray, BinaryType, IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(l: Any, c: Any, k: Any): Any =
    VecKernels.pqAdc(l.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c, k) => s"${TextVecExpr.VK}.pqAdc($l, $c, $k)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** By-residual PQ encode over a broadcast payload of (flat codebook, m,
  * ksub, unit-normalized coarse centroids): row (vec, list) encodes the
  * residual vec − cents(list). Same broadcast/CodegenFallback rationale
  * as [[PqEncodeBcast]]; the residual subtraction is one dim-length
  * pass before the m*ksub*dsub scan that dominates. */
case class PqEncodeResidualBcast(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Float], Int, Int, Array[Array[Float]])])
    extends BinaryExpression with GeoExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TextVecExpr.floatArray, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode_residual_bcast"
  override def foldable: Boolean = false
  override protected def nullSafeEval(v: Any, list: Any): Any = {
    val (flat, m, ksub, cents) = bc.value
    VecKernels.pqEncodeResidual(v.asInstanceOf[ArrayData],
      cents(list.asInstanceOf[Int]), flat, m, ksub)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** text_normalize(text, mode) → Unicode-normalized text
  * (nfc | nfkc | strip_accents — see TextKernels.normalizeText). */
/** deflate_len(text, level) → compressed UTF-8 byte length, the
  * compressibility quality signal. Gate orderings/bounds only — the
  * absolute count is zlib-implementation-specific. */
case class TextDeflateLen(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"
  override protected def nullSafeEval(t: Any, l: Any): Any =
    TextKernels.deflateLen(t.asInstanceOf[UTF8String].toString, l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l) => s"${TextVecExpr.TK}.deflateLen($t.toString(), $l)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class TextNormalize(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"
  override protected def nullSafeEval(t: Any, m: Any): Any =
    UTF8String.fromString(TextKernels.normalizeText(
      t.asInstanceOf[UTF8String].toString, m.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        ${TextVecExpr.TK}.normalizeText($t.toString(), $m.toString()));""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}
