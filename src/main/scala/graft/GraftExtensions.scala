package graft

import graft.functions.{ArrayCosine, ArrayDot, MinHashBands, MinHashSig, NormWords, SimHash60, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions registering the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT array_cosine(a, b) ...")`
  * works anywhere the library is on the classpath:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot takes exactly 2 arguments")
        ArrayDot(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_cosine takes exactly 2 arguments")
        ArrayCosine(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60 takes exactly 1 argument")
        SimHash60(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "minhash_sig(words, shingleSize, numHashes) takes exactly 3 arguments")
        MinHashSig(args(0), intLit(args(1), "shingleSize"), intLit(args(2), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("norm_words"),
      new ExpressionInfo(classOf[NormWords].getName, "norm_words"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "norm_words takes exactly 1 argument")
        NormWords(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "word_shingles(words, n[, distinct]) takes 2 or 3 arguments")
        val distinct = if (args.length == 3) boolLit(args(2), "distinct") else false
        WordShingles(args(0), intLit(args(1), "n"), distinct)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "minhash_bands(words, shingleSize, numHashes, numBands) takes exactly 4 arguments")
        MinHashBands(args(0), intLit(args(1), "shingleSize"),
          intLit(args(2), "numHashes"), intLit(args(3), "numBands"))
      }))
  }

  // sketch parameters shape the kernel itself, so they must be literals
  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other =>
      throw new IllegalArgumentException(s"$name must be a boolean literal, got $other")
  }
}
