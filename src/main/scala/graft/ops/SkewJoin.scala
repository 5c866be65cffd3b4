package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §4: the reference's
  * `len(word) % R` partitioning is the cautionary tale — ~20 effective
  * partitions regardless of R).
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Engine); explicit
  * salting remains the tool when one side must be replicated anyway
  * (e.g. a medium dimension joined on a power-law key). Mechanics: the
  * skewed (large) side gets a uniform random salt in [0, buckets); the
  * other side is replicated `buckets`× via explode; the join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers.
  *
  * Results are identical to the plain join (property-tested in
  * PlanSpec); the salt column never escapes.
  */
object SkewJoin {

  def salted(large: DataFrame, small: DataFrame, key: String,
             buckets: Int = 16): DataFrame = {
    // deterministic salt (hash of the whole large row modulo buckets
    // would also work; monotonically_increasing_id keeps it cheap and
    // uniform per partition)
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
