package graft.functions.vector

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Native integer-vector kernels for the quantized ANN read/write paths.
  *
  * The PQ pipeline's hot loops (coarse-cell argmin, subspace code
  * assignment, ADC scoring) were originally Spark SQL higher-order
  * functions — semantically right, but HOF lambdas are interpreted per
  * ELEMENT, so a 200k-vector encode walks ~10^9 interpreted expression
  * nodes (measured: 447 s to build the sf10 index, 119 s to search).
  * These expressions compute the identical integer arithmetic — same
  * sums, same (d, cid) lexicographic tie-breaks, same loud failure on
  * ragged input — as tight JVM loops. Every result is bit-equal to the
  * HOF/SQL formulation (spec-pinned), so the DuckDB oracles don't move.
  *
  * Error contract: malformed geometry (length mismatch, NULL element,
  * missing subspace/LUT entry) RAISES with a named message rather than
  * returning NULL — under an `asc` argmin a silent NULL would win rank 1.
  */
object IntVecKernels {
  /** Σ (a[aOff+i] - b[i])², exact int64. */
  def sqDist(a: ArrayData, aOff: Int, b: ArrayData, n: Int, op: String): Long = {
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(aOff + i) || b.isNullAt(i))
        throw new IllegalStateException(s"$op: NULL vector element")
      val d = a.getLong(aOff + i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def fail(op: String, msg: String): Nothing =
    throw new IllegalStateException(s"$op: $msg")
}

/** `graft_sqdist(a, b)` — exact int64 squared Euclidean distance between
  * two BIGINT arrays. Codegen'd (stays inside WholeStageCodegen). NULL
  * input array → NULL; length mismatch or NULL element → error (see
  * [[IntVecKernels]] error contract).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist"
  // typed inputs: ARRAY<INT> etc. get an implicit element cast; anything
  // non-numeric is an ANALYSIS error instead of getLong misreading the
  // unsafe array slots at runtime
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      IntVecKernels.fail(prettyName,
        s"ragged arrays — length mismatch ${a.numElements()} vs ${b.numElements()}")
    IntVecKernels.sqDist(a, 0, b, b.numElements(), prettyName)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  graft.functions.vector.IntVecKernels.fail("graft_sqdist",
         |    "ragged arrays — length mismatch " + $n + " vs " + $b.numElements());
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    graft.functions.vector.IntVecKernels.fail("graft_sqdist", "NULL vector element");
         |  }
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistLong =
    copy(left = l, right = r)
}

/** `graft_cell(qe, seeds)` — coarse-quantizer argmin: the `cid` of the
  * seed with minimal [[IntVecKernels.sqDist]] to `qe`, ties → lowest
  * cid. `seeds` is ARRAY<STRUCT<cid: BIGINT, ce: ARRAY<BIGINT>>> (the
  * collapsed one-row broadcast centroid set). Bit-equal to
  * `array_min(transform(seeds, s -> struct(sqdist, cid))).cid`.
  */
case class ArgMinCell(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cell"
  // exact expected shapes (names included): a mis-typed argument fails
  // analysis with the expected signature instead of producing garbage
  // from getLong on the wrong physical layout
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(LongType),
    ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("ce", ArrayType(LongType))))))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val qe = l.asInstanceOf[ArrayData]
    val seeds = r.asInstanceOf[ArrayData]
    val n = qe.numElements()
    if (seeds.numElements() == 0) IntVecKernels.fail(prettyName, "empty seed set")
    var bd = Long.MaxValue
    var bc = Long.MaxValue
    var s = 0
    while (s < seeds.numElements()) {
      val row = seeds.getStruct(s, 2)
      val cid = row.getLong(0)
      val ce = row.getArray(1)
      if (ce.numElements() != n)
        IntVecKernels.fail(prettyName,
          s"length mismatch ${n} vs centroid ${ce.numElements()}")
      val d = IntVecKernels.sqDist(qe, 0, ce, n, prettyName)
      if (d < bd || (d == bd && cid < bc)) { bd = d; bc = cid }
      s += 1
    }
    bc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgMinCell =
    copy(left = l, right = r)
}

/** `graft_pq_encode(qe, cb)` — PQ subspace assignment: for each subspace
  * `s` of the collapsed codebook (ARRAY<STRUCT<sub: INT, cid: BIGINT,
  * ce: ARRAY<BIGINT>>>), the codebook entry with minimal
  * [[IntVecKernels.sqDist]] between `qe`'s s-th slice and `ce`, ties →
  * lowest cid. The subdim is read off the codebook (uniform, or error);
  * the subspace count is `qe.length / sd`. Returns
  * ARRAY<STRUCT<d: BIGINT, cid: BIGINT>> in subspace order — the exact
  * shape AND values of the HOF `transform(sequence(0, m-1), s ->
  * array_min(transform(filter(cb, c -> c.sub = s), c -> struct(dist,
  * cid))))` it replaces, including the legacy edge semantics: a
  * subspace with NO codebook entries yields a NULL element (array_min
  * of an empty array), which downstream ADC rejects loudly; entries
  * whose `sub` is outside [0, m) are ignored (the sequence never
  * visits them). A non-uniform subdim or a `qe` length that isn't a
  * multiple of it raises.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(LongType),
    ArrayType(StructType(Seq(
      StructField("sub", IntegerType),
      StructField("cid", LongType),
      StructField("ce", ArrayType(LongType))))))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", LongType, nullable = false),
      StructField("cid", LongType, nullable = false))), containsNull = true)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val qe = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    val nEntries = cb.numElements()
    if (nEntries == 0) IntVecKernels.fail(prettyName, "empty codebook")
    // uniform subdim from the codebook itself
    var sd = -1
    var e = 0
    while (e < nEntries) {
      val ceN = cb.getStruct(e, 3).getArray(2).numElements()
      if (sd == -1) sd = ceN
      else if (sd != ceN)
        IntVecKernels.fail(prettyName, s"non-uniform subdim $ceN vs $sd")
      e += 1
    }
    if (sd == 0 || qe.numElements() % sd != 0)
      IntVecKernels.fail(prettyName,
        s"expected a multiple of subdim $sd dims, got ${qe.numElements()}")
    val m = qe.numElements() / sd
    val bestD = Array.fill(m)(Long.MaxValue)
    val bestC = Array.fill(m)(Long.MaxValue)
    val seen = new Array[Boolean](m)
    e = 0
    while (e < nEntries) {
      val row = cb.getStruct(e, 3)
      val sub = row.getInt(0)
      if (sub >= 0 && sub < m) {
        val cid = row.getLong(1)
        val ce = row.getArray(2)
        val d = IntVecKernels.sqDist(qe, sub * sd, ce, sd, prettyName)
        if (d < bestD(sub) || (d == bestD(sub) && cid < bestC(sub))) {
          bestD(sub) = d; bestC(sub) = cid
        }
        seen(sub) = true
      }
      e += 1
    }
    new GenericArrayData(Array.tabulate[Any](m)(i =>
      if (seen(i)) new GenericInternalRow(Array[Any](bestD(i), bestC(i)))
      else null))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** `graft_adc(codes, lut)` — asymmetric-distance sum: for each subspace
  * `s`, add the `d` of the LUT entry (ARRAY<STRUCT<sub: INT, cid:
  * BIGINT, d: BIGINT>>) matching (s, codes[s]). Exactly one match per
  * subspace is required — a code with no LUT entry (foreign codebook,
  * NULL code) raises, same as the HOF `aggregate(sequence(...))` +
  * double-filter formulation it replaces, in ONE pass over the LUT.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc"
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(LongType),
    ArrayType(StructType(Seq(
      StructField("sub", IntegerType),
      StructField("cid", LongType),
      StructField("d", LongType)))))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s))
        IntVecKernels.fail(prettyName, s"no codebook entry for subspace $s, code NULL")
      s += 1
    }
    var acc = 0L
    val matched = new Array[Int](m)
    var e = 0
    while (e < lut.numElements()) {
      val row = lut.getStruct(e, 3)
      val sub = row.getInt(0)
      if (sub >= 0 && sub < m && codes.getLong(sub) == row.getLong(1)) {
        // a NULL distance (ragged LUT build — e.g. an m/dims mismatch
        // padding the zip) must not unbox to 0 and silently win rank 1
        if (row.isNullAt(2))
          IntVecKernels.fail(prettyName, s"NULL LUT distance for subspace $sub")
        acc += row.getLong(2)
        matched(sub) += 1
      }
      e += 1
    }
    s = 0
    while (s < m) {
      if (matched(s) != 1)
        IntVecKernels.fail(prettyName,
          s"no codebook entry for subspace $s, code ${codes.getLong(s)}")
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcSum =
    copy(left = l, right = r)
}
