package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared operator input validation. */
private[operators] object Guards {

  /** Columns that an operator will `cast("long")` (ids, graph nodes,
    * sample keys) must already be integral: casting a string/decimal id
    * silently NULLS, and the null rows then filter or hash away — an
    * empty "result" instead of an error. One loud require, shared by
    * every id-consuming operator. */
  def requireIntegralColumns(df: DataFrame, cols: Seq[String], op: String): Unit =
    cols.foreach { c =>
      val t = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"$op needs integral id column $c; found $t " +
          "(cast('long') of other types silently nulls — hash or map ids " +
          "to a long key first, e.g. xxhash64)")
    }
}
