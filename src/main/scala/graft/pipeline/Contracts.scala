package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Shared argument-contract checks for the pipeline operators. */
private[pipeline] object Contracts {

  /** The column must be an integral type — a silent cast would nullify
    * string values or truncate fractionals; float sums are additionally
    * order-dependent where the caller needs exact aggregation. */
  def requireIntegral(df: DataFrame, c: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$op: column '$c' must be integral, got $other — convert " +
          "explicitly at the call site")
    }
  }
}
