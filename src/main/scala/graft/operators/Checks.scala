package graft.operators

import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared argument validation for operators that carry ids through
  * long-typed kernels (top-k heaps, union-find, join-side casts): a
  * string id would cast to null downstream — silent nulls or opaque
  * NPEs — instead of one actionable error here. */
private[operators] object Checks {
  def requireIntegralId(op: String, colName: String, dt: DataType): Unit = dt match {
    case ByteType | ShortType | IntegerType | LongType => ()
    case other => throw new IllegalArgumentException(
      s"$op requires integral id columns, got $colName: $other (pre-map ids to long)")
  }
}
