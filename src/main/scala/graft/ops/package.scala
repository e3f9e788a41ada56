package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object ops {
  /** `$"name"` column sugar usable without a SparkSession-bound
    * `spark.implicits._` import (ops are session-agnostic builders). */
  implicit class ColumnInterp(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
