package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §2.9 —
  * the one place compose-from-builtins is NOT good enough).
  *
  * The built-in formulation `aggregate(zip_with(a, b, *), ...)` is a
  * higher-order function: lambdas are interpreted per element outside
  * WholeStageCodegen, allocating a zipped intermediate array per row.
  * For kNN over N corpus × Q query vectors that's the inner loop of
  * the whole job. These expressions generate a tight primitive loop
  * (`doGenCode`), keep the surrounding projection inside
  * WholeStageCodegen, and accumulate in the same sequential order as
  * the built-in fold — bit-identical doubles, just faster.
  */
object VectorExpressions {

  /** dot(a, b) over two double arrays. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Fused single-pass cosine(a, b): dot and both norms in one loop. */
  def cosineFused(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayCosine(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Σ (a_i - b_i)² in one pass — the PQ/k-means inner loop. */
  def squaredL2(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySquaredL2(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Whole-vector PQ code assignment in one scan-side pass — see
    * [[PqAssignExpression]]. `book(m)(k)` = centroid k of subspace m. */
  def pqAssign(v: Column, book: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAssignExpression(ColumnBridge.expression(v), book))

  /** Scan-side cell assignment: id of the cosine-argmax centroid — see
    * [[ArgMaxCosineExpression]]. `cells` = (cell_id, centroid) pairs. */
  def argMaxCosine(v: Column, cells: Seq[(Long, Seq[Double])]): Column =
    ColumnBridge.column(ArgMaxCosineExpression(ColumnBridge.expression(v), cells))

  /** Scan-side SECOND-best cell: id of the cosine rank-2 centroid
    * (ties resolve to the lower cell id, matching
    * `ROW_NUMBER() OVER (ORDER BY cos DESC, cell_id ASC) = 2`) — the
    * multi-probe companion of [[argMaxCosine]]; see
    * [[ArgMax2CosineExpression]]. */
  def argMax2Cosine(v: Column, cells: Seq[(Long, Seq[Double])]): Column =
    ColumnBridge.column(ArgMax2CosineExpression(ColumnBridge.expression(v), cells))

  private[functions] def checkDoubleArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult = {
    if (isVecArray(left) && isVecArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<double|float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** These kernels accept `array<double>` OR `array<float>` per side
    * (element types only — containsNull varies by producer): a float
    * element is widened IN-REGISTER exactly where the former plan cast
    * the whole array up front, and float→double widening is EXACT
    * (every float32 is representable), so results are bit-identical to
    * the cast-then-compute plan. What changes is the physical cost:
    * no per-row 64-element double-array allocation at the scan, and
    * every checkpoint/exchange that carries the vector payload moves
    * 4 bytes per element instead of 8 — the guide's "narrower types /
    * shuffle fewer bytes" lever applied to the ANN/dedup hot path. */
  private[functions] def isVecArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Interpreted-path element read, widened to double. */
  @inline private[functions] def elem(a: ArrayData, i: Int,
                                      float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  /** Codegen element read, widened to double. */
  private[functions] def elemCode(arr: String, i: String,
                                  float: Boolean): String =
    if (float) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
}

case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions.{elem, elemCode, isFloatArray}

  @transient private lazy val lF = isFloatArray(left)
  @transient private lazy val rF = isFloatArray(right)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += elem(x, i, lF) * elem(y, i, rF); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ${elemCode(a, i, lF)} * ${elemCode(b, i, rF)};
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

case class ArraySquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions.{elem, elemCode, isFloatArray}

  @transient private lazy val lF = isFloatArray(left)
  @transient private lazy val rF = isFloatArray(right)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    // same sequential fold as aggregate(zip_with(a,b,(p,q)=>(p-q)*(p-q)))
    // — bit-identical doubles, no per-row intermediate array
    while (i < n) { val d = elem(x, i, lF) - elem(y, i, rF); acc += d * d; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${elemCode(a, i, lF)} - ${elemCode(b, i, rF)};
         |  ${ev.value} += $d * $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySquaredL2 =
    copy(left = newLeft, right = newRight)
}

case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions.{elem, elemCode, isFloatArray}

  @transient private lazy val lF = isFloatArray(left)
  @transient private lazy val rF = isFloatArray(right)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = elem(x, i, lF); val yv = elem(y, i, rF)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${elemCode(a, i, lF)};
         |  double $yv = ${elemCode(b, i, rF)};
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}

/** PQ code assignment for a whole vector in one pass: for each of the
  * book's M subspaces, the argmin squared-L2 centroid over its K
  * entries (strict `<` scanning codes in ascending order = lowest-code
  * tie-break), reading subspace m as elements [m·subDim, (m+1)·subDim)
  * of the input. Output: `array<struct<d: double, k: int>>`, one entry
  * per subspace in subspace order.
  *
  * The codebook rides along as a PLAN CONSTANT (`addReferenceObj`),
  * not a join side: after driver-side training the book is ~16 KB of
  * driver data, and each vector's codes depend on that row alone — the
  * former broadcast-join + per-(vec, m) argmin aggregate re-shuffled
  * corpus × M rows through an exchange to compute a value a scan
  * projection can produce. Per-element semantics are pinned to the
  * join form by spec: the distance is [[ArraySquaredL2]]'s ascending-
  * index fold (bit-identical doubles) and the (d, k) pair equals
  * `min_by(struct(k, d), struct(d, k))` over the exploded form.
  *
  * `book` is a Seq (not Array) so case-class equality stays structural
  * — plan canonicalization must see two identical assignments as the
  * same expression. */
case class PqAssignExpression(child: Expression, book: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  @transient private lazy val flat: Array[Array[Array[Double]]] =
    book.map(_.map(_.toArray).toArray).toArray
  private def subDim: Int = book.head.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", DoubleType, nullable = false),
      StructField("k", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sd = subDim
    val out = new Array[Any](flat.length)
    var m = 0
    while (m < flat.length) {
      val cb = flat(m)
      val off = m * sd
      var bestK = 0
      var bestD = 0.0
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var acc = 0.0
        var i = 0
        while (i < sd) { val d = v.getDouble(off + i) - c(i); acc += d * d; i += 1 }
        if (k == 0 || acc < bestD) { bestD = acc; bestK = k }
        k += 1
      }
      out(m) = new GenericInternalRow(Array[Any](bestD, bestK))
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bookRef = ctx.addReferenceObj("pqBook", flat, "double[][][]")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val cb = ctx.freshName("cb")
      val off = ctx.freshName("off")
      val bestK = ctx.freshName("bestK")
      val bestD = ctx.freshName("bestD")
      val kk = ctx.freshName("k")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |Object[] $out = new Object[${flat.length}];
         |for (int $m = 0; $m < ${flat.length}; $m++) {
         |  double[][] $cb = $bookRef[$m];
         |  int $off = $m * $subDim;
         |  int $bestK = 0; double $bestD = 0.0;
         |  for (int $kk = 0; $kk < $cb.length; $kk++) {
         |    double[] $c = $cb[$kk];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = $a.getDouble($off + $i) - $c[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($kk == 0 || $acc < $bestD) { $bestD = $acc; $bestK = $kk; }
         |  }
         |  $out[$m] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ java.lang.Double.valueOf($bestD), java.lang.Integer.valueOf($bestK) });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAssignExpression =
    copy(child = newChild)
}

/** Cosine-argmax cell assignment against a bounded centroid list that
  * rides as a PLAN CONSTANT — the IVF sibling of [[PqAssignExpression]].
  * For each input vector the winning `cell_id` is that of the centroid
  * with the highest `dot(v, c) / (|v| · |c|)`; strict `>` scanning
  * cells in ascending cell_id order = lowest-id tie-break, identical
  * to `max_by(cell_id, struct(cos, -cell_id))` over the exploded
  * broadcast-join form (spec-pinned). Centroid norms are precomputed
  * once on the driver with the same ascending dot fold + sqrt as
  * [[ArrayDot]]/l2Norm, so every cosine is the bit-identical double
  * the join form produced.
  *
  * The former shape broadcast-joined the centroids and re-grouped
  * corpus × cells rows through a groupBy(vec_id) exchange — a full
  * corpus shuffle (vec_id is unique, so map-side partials reduce
  * nothing) to compute a value that depends on one row alone.
  *
  * `cells` is the structural-equality constructor param; sorted
  * internally so callers need not pre-sort. NaN cosines (zero-norm
  * vectors) never win under strict `>` unless every candidate is NaN —
  * the corpus contract (nonzero vectors) makes this unreachable. */
case class ArgMaxCosineExpression(child: Expression, cells: Seq[(Long, Seq[Double])])
    extends UnaryExpression {
  import VectorExpressions.{elem, elemCode, isFloatArray}

  @transient private lazy val cF = isFloatArray(child)
  @transient private lazy val sorted = cells.sortBy(_._1)
  @transient private lazy val ids: Array[Long] = sorted.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] =
    sorted.map(_._2.toArray).toArray
  @transient private lazy val norms: Array[Double] = vecs.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double|float> argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_cosine"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < vn) { val x = elem(v, i, cF); acc += x * x; i += 1 }
    val nv = math.sqrt(acc)
    var bestK = 0
    var bestC = 0.0
    var k = 0
    while (k < vecs.length) {
      val c = vecs(k)
      val n = math.min(vn, c.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += elem(v, i, cF) * c(i); i += 1 }
      val cos = dot / (nv * norms(k))
      if (k == 0 || cos > bestC) { bestC = cos; bestK = k }
      k += 1
    }
    ids(bestK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
      val vecsRef = ctx.addReferenceObj("cellVecs", vecs, "double[][]")
      val normsRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
      val vn = ctx.freshName("vn")
      val nv = ctx.freshName("nv")
      val acc = ctx.freshName("acc")
      val bestK = ctx.freshName("bestK")
      val bestC = ctx.freshName("bestC")
      val kk = ctx.freshName("k")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $vn = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $vn; $i++) {
         |  double $x = ${elemCode(a, i, cF)}; $acc += $x * $x;
         |}
         |double $nv = java.lang.Math.sqrt($acc);
         |int $bestK = 0; double $bestC = 0.0;
         |for (int $kk = 0; $kk < $vecsRef.length; $kk++) {
         |  double[] $c = $vecsRef[$kk];
         |  int $n = java.lang.Math.min($vn, $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $dot += ${elemCode(a, i, cF)} * $c[$i]; }
         |  double $cos = $dot / ($nv * $normsRef[$kk]);
         |  if ($kk == 0 || $cos > $bestC) { $bestC = $cos; $bestK = $kk; }
         |}
         |${ev.value} = $idsRef[$bestK];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgMaxCosineExpression =
    copy(child = newChild)
}

/** Cell id of the SECOND-highest-cosine centroid — the multi-probe
  * companion of [[ArgMaxCosineExpression]] (same single-pass scan-side
  * shape: plan-constant centroid matrix, zero joins). Iterating cells
  * in ascending id with strict `>` updates reproduces
  * `ROW_NUMBER() OVER (ORDER BY cos DESC, cell_id ASC) = 2` exactly:
  * a tie never displaces an earlier (lower-id) holder. NaN cosines
  * never pass `>`; the constructor REQUIRES nonzero-norm centroids, so
  * the only way fewer than two finite cosines can exist is a zero-norm
  * INPUT vector — then every cosine is NaN and the lowest-id fallback
  * reproduces the oracle's `ROW_NUMBER() OVER (ORDER BY cos DESC,
  * cell_id ASC) = 2` order exactly (DuckDB sorts all-NaN ties by the
  * cell_id tiebreak). With the norm requirement enforced here rather
  * than assumed of the corpus, no input can reach a state where the
  * fallback and the oracle rank-2 disagree. */
case class ArgMax2CosineExpression(child: Expression, cells: Seq[(Long, Seq[Double])])
    extends UnaryExpression {

  require(cells.size >= 2, "argmax2_cosine needs at least two cells")
  require(cells.forall(_._2.exists(_ != 0.0)),
    "argmax2_cosine needs nonzero-norm centroids: a zero-norm centroid " +
      "yields a NaN cosine for every input, and the degenerate " +
      "fallback would diverge from the SQL rank-2 order")

  import VectorExpressions.{elem, elemCode, isFloatArray}

  @transient private lazy val cF = isFloatArray(child)
  @transient private lazy val sorted = cells.sortBy(_._1)
  @transient private lazy val ids: Array[Long] = sorted.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] =
    sorted.map(_._2.toArray).toArray
  @transient private lazy val norms: Array[Double] = vecs.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double|float> argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax2_cosine"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < vn) { val x = elem(v, i, cF); acc += x * x; i += 1 }
    val nv = math.sqrt(acc)
    var bestK = -1; var bestC = Double.NegativeInfinity
    var secK = -1; var secC = Double.NegativeInfinity
    var k = 0
    while (k < vecs.length) {
      val c = vecs(k)
      val n = math.min(vn, c.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += elem(v, i, cF) * c(i); i += 1 }
      val cos = dot / (nv * norms(k))
      if (cos > bestC) { secC = bestC; secK = bestK; bestC = cos; bestK = k }
      else if (cos > secC) { secC = cos; secK = k }
      k += 1
    }
    if (secK < 0) secK = if (bestK == 0 || bestK < 0) 1 else 0
    ids(secK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
      val vecsRef = ctx.addReferenceObj("cellVecs", vecs, "double[][]")
      val normsRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
      val vn = ctx.freshName("vn")
      val nv = ctx.freshName("nv")
      val acc = ctx.freshName("acc")
      val bestK = ctx.freshName("bestK")
      val bestC = ctx.freshName("bestC")
      val secK = ctx.freshName("secK")
      val secC = ctx.freshName("secC")
      val kk = ctx.freshName("k")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $vn = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $vn; $i++) {
         |  double $x = ${elemCode(a, i, cF)}; $acc += $x * $x;
         |}
         |double $nv = java.lang.Math.sqrt($acc);
         |int $bestK = -1; double $bestC = Double.NEGATIVE_INFINITY;
         |int $secK = -1; double $secC = Double.NEGATIVE_INFINITY;
         |for (int $kk = 0; $kk < $vecsRef.length; $kk++) {
         |  double[] $c = $vecsRef[$kk];
         |  int $n = java.lang.Math.min($vn, $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $dot += ${elemCode(a, i, cF)} * $c[$i]; }
         |  double $cos = $dot / ($nv * $normsRef[$kk]);
         |  if ($cos > $bestC) {
         |    $secC = $bestC; $secK = $bestK; $bestC = $cos; $bestK = $kk;
         |  } else if ($cos > $secC) { $secC = $cos; $secK = $kk; }
         |}
         |if ($secK < 0) { $secK = ($bestK == 0 || $bestK < 0) ? 1 : 0; }
         |${ev.value} = $idsRef[$secK];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgMax2CosineExpression =
    copy(child = newChild)
}
