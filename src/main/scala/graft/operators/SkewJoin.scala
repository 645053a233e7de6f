package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4.2 / prompt: "salting for
  * skew"): when a few hot keys dominate, a plain shuffle join puts each
  * hot key on one task. Salting spreads each left row across
  * `saltFactor` sub-keys and replicates the right side once per salt,
  * so a hot key fans out over saltFactor tasks. AQE's skew-join handles
  * sort-merge cases adaptively; this operator is the explicit form for
  * when the skew is known (or AQE is unavailable, e.g. inside
  * streaming micro-batches).
  */
object SkewJoin {

  /** Inner equi-join of left and right on `key`, salted. `leftUnique`
    * is any per-row column used to spread rows deterministically.
    */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
                  leftUnique: Column, saltFactor: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(leftUnique), lit(saltFactor)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
