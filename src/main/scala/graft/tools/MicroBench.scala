package graft.tools

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side micro-benchmark harness for the native kernels —
  * isolates kernel cost from Spark plan overhead when a bench query
  * regresses. Run: `sbt "runMain graft.tools.MicroBench"`. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val wordsArr = (0 until 55).map(i => s"word$i")
    val arr = new GenericArrayData(wordsArr.map(s => UTF8String.fromString(s)).toArray[Any])
    (1 to 200).foreach(_ => graft.functions.MinHashBandsKernel.bands(arr, 4, 16, 4))
    var t0 = System.nanoTime()
    (1 to 5000).foreach(_ => graft.functions.MinHashBandsKernel.bands(arr, 4, 16, 4))
    println(f"minhash-bands 5000 docs x ~51 shingles single-thread: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val words = (0 until 200).map(i => s"w$i")
    val warr = new GenericArrayData(words.map(s => UTF8String.fromString(s)).toArray[Any])
    (1 to 200).foreach(_ => graft.functions.SimHashKernel.simhash60(warr))
    t0 = System.nanoTime()
    (1 to 5000).foreach(_ => graft.functions.SimHashKernel.simhash60(warr))
    println(f"simhash 5000 docs x 200 words single-thread: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
