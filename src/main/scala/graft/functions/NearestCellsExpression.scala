package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nprobe` nearest coarse-quantizer cells of an `array<float>`
  * embedding, by squared L2 against a BROADCAST flat centroid matrix —
  * the IVF assignment/probe kernel.
  *
  * Exists because the per-row Scala-UDF formulation deserializes the
  * vector to boxed `Seq[Float]` and re-allocates a (cell, dist) pair list
  * per row: invisible at nlist=16, the dominant cost of the assignment
  * pass at a production nlist (4k-64k). Here the centroids ship once per
  * executor as a primitive `double[]` (row-major, nlist x d) and each row
  * runs one codegen'd flat scan with a bounded `nprobe`-selection — the
  * same kernel discipline as bruteKnn's block scan.
  *
  * Determinism (oracle-critical): distances accumulate sequentially in
  * index order in double with the float element widened per step, ties
  * break to the LOWER cell id — bit-identical to the driver-side training
  * loop and the DuckDB oracle's unrolled assignment.
  *
  * Returns `array<int>` of the nprobe cell ids, nearest first. Assignment
  * is `.getItem(0)` of the nprobe=1 call.
  */
case class NearestCellsFloat(child: Expression,
                             bc: Broadcast[Array[Double]],
                             d: Int, nlist: Int, nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(d >= 1 && nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
    s"bad quantizer shape: d=$d nlist=$nlist nprobe=$nprobe")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toFloatArray()
    if (v.length != d)
      throw new IllegalArgumentException(
        s"NearestCellsFloat: quantizer expects dimensionality $d, got a " +
          s"vector of length ${v.length}")
    val cents = bc.value
    val topDist = new Array[Double](nprobe)
    val topCell = new Array[Int](nprobe)
    var filled = 0
    var c = 0
    while (c < nlist) {
      var dist = 0.0
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = v(i).toDouble - cents(base + i)
        dist += diff * diff
        i += 1
      }
      // bounded insertion: (dist asc, cell asc); a tie never displaces an
      // earlier (lower) cell, matching the strict `<` of the training loop
      if (filled < nprobe || dist < topDist(filled - 1)) {
        var pos = if (filled < nprobe) filled else nprobe - 1
        while (pos > 0 && topDist(pos - 1) > dist) {
          topDist(pos) = topDist(pos - 1); topCell(pos) = topCell(pos - 1); pos -= 1
        }
        topDist(pos) = dist; topCell(pos) = c
        if (filled < nprobe) filled += 1
      }
      c += 1
    }
    new GenericArrayData(topCell.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcCentroids", bc,
      classOf[Broadcast[Array[Double]]].getName)
    val cents = ctx.addMutableState("double[]", "graftCents",
      v => s"$v = (double[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, vec => {
      val v = ctx.freshName("v")
      val topDist = ctx.freshName("topDist"); val topCell = ctx.freshName("topCell")
      val filled = ctx.freshName("filled"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val base = ctx.freshName("base")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      val pos = ctx.freshName("pos")
      s"""
        float[] $v = $vec.toFloatArray();
        if ($v.length != $d) {
          throw new IllegalArgumentException(
            "NearestCellsFloat: quantizer expects dimensionality $d, got a vector of length " + $v.length);
        }
        double[] $topDist = new double[$nprobe];
        int[] $topCell = new int[$nprobe];
        int $filled = 0;
        for (int $c = 0; $c < $nlist; $c++) {
          double $dist = 0.0;
          int $base = $c * $d;
          for (int $i = 0; $i < $d; $i++) {
            double $diff = (double) $v[$i] - $cents[$base + $i];
            $dist += $diff * $diff;
          }
          if ($filled < $nprobe || $dist < $topDist[$filled - 1]) {
            int $pos = ($filled < $nprobe) ? $filled : $nprobe - 1;
            while ($pos > 0 && $topDist[$pos - 1] > $dist) {
              $topDist[$pos] = $topDist[$pos - 1];
              $topCell[$pos] = $topCell[$pos - 1];
              $pos--;
            }
            $topDist[$pos] = $dist;
            $topCell[$pos] = $c;
            if ($filled < $nprobe) $filled++;
          }
        }
        int[] ${c}_out = new int[$filled];
        System.arraycopy($topCell, 0, ${c}_out, 0, $filled);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${c}_out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellsFloat {
  /** A trained coarse quantizer: the flat centroid matrix broadcast ONCE,
    * from which any number of assign/probe kernel Columns can be built. */
  final class Quantizer(bc: Broadcast[Array[Double]], d: Int, nlist: Int) {
    def nearestCells(vec: Column, nprobe: Int): Column =
      GraftBridge.column(
        NearestCellsFloat(GraftBridge.expression(vec), bc, d, nlist, nprobe))
    /** Assignment: the single nearest cell id. */
    def assign(vec: Column): Column = nearestCells(vec, 1).getItem(0)
  }

  /** Broadcast `centroids` (nlist vectors of length d) as one flat
    * primitive matrix. */
  def quantizer(spark: SparkSession, centroids: Seq[Array[Double]]): Quantizer = {
    val nlist = centroids.length
    val d = centroids.head.length
    val flat = new Array[Double](nlist * d)
    var c = 0
    while (c < nlist) {
      System.arraycopy(centroids(c), 0, flat, c * d, d)
      c += 1
    }
    new Quantizer(spark.sparkContext.broadcast(flat), d, nlist)
  }
}
