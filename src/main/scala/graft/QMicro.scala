package graft
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
object QMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val arrs = Array.fill(20000) {
      new GenericArrayData(Array.fill[Any](64)(java.lang.Float.valueOf(rnd.nextFloat() * 2 - 1)))
        .asInstanceOf[ArrayData]
    }
    // native core
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0; var s = 0L
      while (i < arrs.length) { s += graft.expressions.QuantizeMilliCore.quant(arrs(i), false).numElements(); i += 1 }
      println(f"native rep$rep ${(System.nanoTime()-t0)/1e9}%6.3f s ($s)")
    }
    // scala-BigDecimal variant (what Spark's Round actually calls)
    def scalaRound(d: Double): Long =
      scala.math.BigDecimal(d).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble.toLong
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0; var s = 0L
      while (i < arrs.length) {
        val a = arrs(i); val n = a.numElements(); var j = 0
        while (j < n) { s += scalaRound(a.getFloat(j).toDouble * 1000.0); j += 1 }
        i += 1
      }
      println(f"scalaBD rep$rep ${(System.nanoTime()-t0)/1e9}%6.3f s ($s)")
    }
    // plain floor variant (no BigDecimal)
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0; var s = 0L
      while (i < arrs.length) {
        val a = arrs(i); val n = a.numElements(); var j = 0
        while (j < n) {
          val d = a.getFloat(j).toDouble * 1000.0
          s += (if (d >= 0) math.floor(d + 0.5) else -math.floor(-d + 0.5)).toLong
          j += 1
        }
        i += 1
      }
      println(f"floor   rep$rep ${(System.nanoTime()-t0)/1e9}%6.3f s ($s)")
    }
  }
}
