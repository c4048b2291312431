package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for the engine's Bloom-filter surface — the
  * sketch a 100 TB decontamination pass ships instead of an exact
  * broadcast set.
  *
  * Spark has both halves as native codegen-path Catalyst expressions
  * (`BloomFilterAggregate` builds the sketch distributively with
  * per-partition merge; `BloomFilterMightContain` probes it), but only
  * wires them internally for runtime join filters — neither is in the
  * public `FunctionRegistry`. Registering them as session temp
  * functions (the same idiom as [[TextHashes.register]]) exposes the
  * native implementations to our plans without any UDF: the aggregate
  * runs as a normal partial/final aggregate, and the probe is a plain
  * predicate the optimizer pushes like any other filter.
  *
  * - `bloom_agg(hash, est_items, num_bits)` → BINARY sketch of a
  *   LongType column (we feed it xxhash64 n-gram keys). Bits sizing:
  *   fpp ≈ 0.5^(num_bits/items · ln2); 8 bits/item ≈ 2 %.
  * - `bloom_might_contain(sketch, hash)` → BOOLEAN; `sketch` must be
  *   foldable (we inline the collected sketch as a binary literal —
  *   the broadcast-equivalent for a plan-carried constant). NO false
  *   negatives, so filtering with it before an exact confirm join
  *   never changes the result — only the probe-side volume.
  */
object BloomFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_agg")))
      reg.createOrReplaceTempFunction("bloom_agg",
        ch => new BloomFilterAggregate(ch(0), ch(1), ch(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("bloom_might_contain")))
      reg.createOrReplaceTempFunction("bloom_might_contain",
        ch => BloomFilterMightContain(ch(0), ch(1)), "built-in")
  }
}
