package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{TextHashes, TokenStats, VectorDotProduct}

/** Session extensions for the engine's native functions — install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(VectorDotProduct.descriptor)
    extensions.injectFunction(TextHashes.minhashDescriptor)
    extensions.injectFunction(TextHashes.simhashDescriptor)
    extensions.injectFunction(TextHashes.xxShinglesDescriptor)
    extensions.injectFunction(TextHashes.xxNgramsDescriptor)
    extensions.injectFunction(TokenStats.descriptor)
  }
}
